package graft.ops

import graft.expr.VectorExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star extension).
  *
  * Two tiers, per the build brief:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline,
  *    a broadcast cross join + per-group top-k window. O(|Q|·N) but fully
  *    distributed and codegen'd; right for small query batches.
  *  - [[lshBucketTopK]]: the scale path — sign-random-projection (SRP)
  *    bucketing: 'planes' deterministic hyperplanes hash every vector to a
  *    b-bit bucket; candidates are vectors sharing the query's bucket (or
  *    any bucket within Hamming distance 1 when 'multiProbe'), so the
  *    pairwise work drops from N to N / 2^b per query on average. Exact
  *    cosine re-ranks the candidates. Build is one pass (batch index
  *    build, not online serving — BASELINE.json north star).
  */
object Similarity {

  /** Exact cosine top-k of `candidates` for every row of `queries`.
    * Schemas: queries (q_id, qv: array<float>), candidates (n_id,
    * nv: array<float>). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    candidates.crossJoin(broadcast(queries))
      .withColumn("sim", VectorExprs.cosine(col("nv"), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rnk"))
  }

  /** Deterministic SRP hyperplanes as small integers in [-1000, 1000]
    * (splitmix64 of (seed, plane, dim)). Integer weights — together with
    * [[microQuantized]] vectors — make every bucket bit an exact integer
    * comparison, identical on any engine: no float-summation-order
    * dependence at a bucket boundary. Recall is unaffected (a random
    * integer direction is as good as a random float one). */
  private[graft] def planesInt(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Long]] =
    Array.tabulate(numPlanes, dim) { (p, d) =>
      var x = seed + p.toLong * 7919L + d.toLong * 104729L + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      java.lang.Math.floorMod(x ^ (x >>> 31), 2001L) - 1000L
    }

  /** Micro-quantized copy of a float vector: round(x · 10⁶) as long —
    * exact and engine-portable (float→double widening and the single
    * double multiply are IEEE-deterministic; ties round away from zero in
    * both Spark and DuckDB). */
  private def microQuantized(vecCol: String): org.apache.spark.sql.Column =
    expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")

  /** Add an SRP `bucket` column (b-bit integer) to a vector DataFrame,
    * for one hash table (`seed` selects the table's plane set). Bit i =
    * sign of the integer dot product ⟨round(v·10⁶), plane_i⟩. */
  def withBucket(df: DataFrame, vecCol: String, numPlanes: Int = 12,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planesInt(numPlanes, dim, seed)
    // temp column name chosen to not collide with caller columns (and
    // restored semantics either way: only `bucket` is added to the output)
    val tmp = "_graft_vm_srp"
    require(!df.columns.contains(tmp), s"input must not carry a $tmp column")
    val bucket = ps.zipWithIndex.map { case (p, i) =>
      val idot = expr(
        s"aggregate(zip_with($tmp, array(${p.mkString(",")}), (x, w) -> x * w), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)")
      when(idot > 0L, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))
    df.withColumn(tmp, microQuantized(vecCol))
      .withColumn("bucket", bucket)
      .drop(tmp)
  }

  /** Multi-table SRP index rows: one (table, bucket) per input row per
    * hash table — the standard L-tables LSH layout. Candidate storage is
    * ×L (an index, built in batch); recall compounds as 1-(1-p)^L. */
  def withBuckets(df: DataFrame, vecCol: String, numPlanes: Int,
      dim: Int, numTables: Int, seed: Long = 42L): DataFrame =
    (0 until numTables).map { t =>
      withBucket(df, vecCol, numPlanes, dim, seed + 1000L * t)
        .withColumn("table", lit(t))
    }.reduce(_ unionByName _)

  /** Approximate top-k: candidates restricted to the query's SRP bucket in
    * any of `numTables` independent hash tables (plus all Hamming-
    * distance-1 buckets per table when multiProbe), re-ranked by exact
    * cosine. The join is an equi-join on (table, bucket) — shuffle-
    * partitioned, never a cross join. */
  def lshBucketTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      numPlanes: Int = 12, dim: Int = 64, numTables: Int = 4,
      multiProbe: Boolean = true): DataFrame = {
    val cb = withBuckets(candidates, "nv", numPlanes, dim, numTables)
    val qb0 = withBuckets(queries, "qv", numPlanes, dim, numTables)
    val qb =
      if (!multiProbe) qb0
      else qb0.withColumn("bucket", explode(expr(
        s"array_union(array(bucket), transform(sequence(0, ${numPlanes - 1}), " +
          "i -> cast(bucket as bigint) ^ shiftleft(1L, i)))")))
    // rank on the 6-dp-rounded cosine (ties → n_id): float-sum order at
    // full precision is engine- and partitioning-dependent, so the rounded
    // key is what makes the top-k cross-engine reproducible (oracle q35)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("sim"), 6).desc, col("n_id"))
    cb.join(qb, Seq("table", "bucket"))
      .select(col("q_id"), col("n_id"), col("nv"), col("qv"))
      .distinct()
      .withColumn("sim", VectorExprs.cosine(col("nv"), col("qv")))
      .select(col("q_id"), col("n_id"), col("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Exact all-pairs cosine ≥ threshold (the embedding near-dup check).
    * O(N²) by construction — at 100 TB, call it on LSH buckets instead:
    * `withBucket(...).groupBy(bucket)` bounds each quadratic block. */
  def nearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col(idCol).as("a_id"), col(vecCol).as("av"))
    val b = embeddings.select(col(idCol).as("b_id"), col(vecCol).as("bv"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim", VectorExprs.cosine(col("av"), col("bv")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
  }
}
