package graft.expr

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CentroidAggregatorSpec extends SparkSpecBase {
  import spark.implicits._

  private val data = Seq(
    (0, Array(1.0f, 2.0f, 3.0f)),
    (0, Array(3.0f, 4.0f, 5.0f)),
    (1, Array(10.0f, 0.0f, -10.0f)))

  test("typed groupByKey + mapValues centroid") {
    val ds = data.toDS()
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new CentroidAggregator(3).toColumn.name("centroid"))
      .collect().toMap
    assert(got(0).toSeq == Seq(2.0f, 3.0f, 4.0f))
    assert(got(1).toSeq == Seq(10.0f, 0.0f, -10.0f))
  }

  test("untyped udaf centroid matches hand computation and the q25 shape") {
    val centroid = udaf(new CentroidAggregator(3))
    val got = data.toDF("label", "embedding")
      .groupBy($"label")
      .agg(centroid($"embedding").as("centroid"))
      .collect().map(r => r.getInt(0) ->
        r.getAs[scala.collection.Seq[Float]]("centroid")).toMap
    assert(got(0) == Seq(2.0f, 3.0f, 4.0f))
    assert(got(1) == Seq(10.0f, 0.0f, -10.0f))
  }

  test("merge across many partitions is exact") {
    val centroid = udaf(new CentroidAggregator(2))
    val big = (1 to 1000).map(i => (0, Array(i.toFloat, 1.0f)))
    val got = big.toDF("label", "embedding").repartition(13)
      .groupBy($"label").agg(centroid($"embedding").as("c"))
      .head().getAs[scala.collection.Seq[Float]]("c")
    assert(got == Seq(500.5f, 1.0f))
  }

  test("empty group yields zero vector, not NaN") {
    val agg = new CentroidAggregator(3)
    assert(agg.finish(agg.zero).toSeq == Seq(0.0f, 0.0f, 0.0f))
  }
}
