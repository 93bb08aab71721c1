package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COUNT–MIN SKETCH (Cormode & Muthukrishnan 2005) as a DataFrame-shaped
  * aggregate — the mergeable fixed-size frequency summary next to
  * [[graft.expr.KmvDistinct]]'s cardinality sketch and the exact
  * [[HeavyHitters]]: d hash rows × w counters bound the memory at d·w
  * longs per group REGARDLESS of corpus size, estimates never
  * UNDER-count (est ≥ true, overshoot ≤ εN with probability 1−δ for
  * w = ⌈e∕ε⌉, d = ⌈ln 1∕δ⌉), and two sketches merge by cell-wise
  * addition — the streaming/partitioned shape a 100 TB token-frequency
  * monitor needs when the exact vocabulary no longer fits.
  *
  * Determinism/portability: item codes are the repo's polynomial
  * code-point fold ([[Dedup.polyHashCol]]); row j's bucket is
  * ((a_j·code + b_j) mod P) mod w with the shared
  * [[graft.expr.DedupKernel.perm]] (a_j, b_j) pairs — all exact integer
  * arithmetic, so the oracle rebuilds the sketch bit-for-bit (unlike
  * engine-private HLL/CMS registers).
  */
object CountMin {

  private val P = graft.expr.DedupKernel.P

  /** Bucket column of hash row `j` for an already-coded item. */
  private def bucketOf(code: Column, j: Int, w: Int): Column = {
    val (a, b) = graft.expr.DedupKernel.perm(j)
    pmod(pmod(code * lit(a) + lit(b), lit(P)), lit(w.toLong))
  }

  /** Build the sketch over `items` (one row per occurrence): the d×w
    * counter TABLE (j, bucket, cnt) — at most d·w rows after ONE
    * map-side-combined groupBy; `codeCol` must be a deterministic
    * integer item code (e.g. [[Dedup.polyHashCol]] of the token).
    * Sketches of two corpora union+re-aggregate to the sketch of the
    * union corpus (cell-wise addition — spec-proven). */
  def build(items: DataFrame, codeCol: Column, d: Int = 4,
      w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 16, s"need 1 <= d <= 16 hash rows, got $d")
    require(w >= 2, s"need w >= 2 buckets, got $w")
    items
      .select(codeCol.as("_code"))
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucketOf(col("_code"), j, w).as("bucket"))
      ): _*)).as("_jb"))
      .groupBy(col("_jb.j").as("j"), col("_jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the counts of `probes` (one row per DISTINCT item,
    * same `codeCol` expression) against a built `sketch`: est = min
    * over rows j of the counter at (j, h_j(code)) — the classic CMS
    * upper-biased estimate. Returns the probes frame + `cms_est`.
    * Probes whose buckets were never touched read 0 (empty-cell
    * semantics via the left join). */
  def estimate(probes: DataFrame, codeCol: Column, sketch: DataFrame,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val withCode = probes.withColumn("_code", codeCol)
    val exploded = withCode
      .select(col("_code"), explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucketOf(col("_code"), j, w).as("bucket"))
      ): _*)).as("_jb"))
      .select(col("_code"), col("_jb.j").as("j"),
        col("_jb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("_code"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    withCode.join(exploded, Seq("_code")).drop("_code")
  }
}
