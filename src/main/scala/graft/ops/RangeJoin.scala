package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — the second operator named alongside as-of in
  * the custom-operator brief. Naive `a JOIN b ON a.k = b.k AND b.t BETWEEN
  * a.lo AND a.hi` plans as a broadcast-nested-loop / cartesian per key at
  * scale. The scalable form bins time into fixed-width buckets: intervals
  * are exploded over the buckets they cover, points hash to one bucket,
  * and the join becomes an equi-join on (key, bucket) followed by the
  * exact range filter — work proportional to true overlap, partitioned by
  * (key, bucket), AQE/skew-aware.
  */
object RangeJoin {

  /** Join point rows to interval rows: each `points` row (key, t) matches
    * `intervals` rows (key, lo, hi) with lo <= t <= hi.
    *
    * @param bucketWidth bucket size in the time columns' units — pick ~the
    *   typical interval length: too small explodes interval replication,
    *   too large degrades to per-bucket cartesian. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, key: String,
      tCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", floor(col(tCol) / bucketWidth))
    val iv = intervals
      .withColumn("_bucket", explode(sequence(
        floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth))))
    p.join(iv, Seq(key, "_bucket"))
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("_bucket")
  }
}
