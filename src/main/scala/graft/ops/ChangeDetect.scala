package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential change detection over a time-bucketed metric — the
  * monitoring layer between q106's per-hour z-score (memoryless: each
  * hour judged alone) and q203's two-cohort KS (needs the drift
  * boundary known in advance): a CUSUM accumulates SMALL persistent
  * shifts across buckets until they cross an alarm threshold, catching
  * the slow quality rot a per-bucket outlier test never sees
  * (Page 1954).
  *
  * The textbook recursion S⁺_t = max(0, S⁺_{t−1} + (x̄_t − μ₀ − k))
  * looks inherently sequential, but it is exactly the running DRAWUP of
  * the prefix sums — S⁺_t = P_t − min(0, P₁, …, P_t) with
  * P_t = Σ_{i≤t} d_i — so the whole statistic is two windows over the
  * BUCKETS-sized grid: one prefix sum, one running min. Nothing here is
  * corpus-sized after the per-bucket aggregate, and nothing sorts data
  * rows (reference behavior context: valentinus has no monitoring
  * surface at all — lib.rs:1-40 exposes only collection CRUD + query —
  * so this extends the engine the way SURVEY §2.3's streaming/monitor
  * rows do). */
object ChangeDetect {

  /** Two-sided tabular CUSUM on per-bucket means. Per bucket:
    * (bucket, n, mean, cusum_hi, cusum_lo, alarm) where
    * cusum_hi accumulates upward drift (x̄ − target − slack)⁺,
    * cusum_lo downward drift (target − x̄ − slack)⁺, and
    * alarm = 1 when either side exceeds `threshold` at that bucket.
    *
    * Determinism: per-row values micro-quantize to exact integers; the
    * per-bucket mean is ONE fixed-order double divide of exact DECIMAL
    * sums, micro-quantized back; deviations, prefix sums and running
    * minima are pure long arithmetic — bit-replayable. NULL buckets or
    * values fail typed.
    *
    * Plan: one map-side-combined corpus groupBy to the buckets-sized
    * grid, two bounded-grid windows (prefix + running min per side),
    * one projection. The single-partition windows run over BUCKETS
    * (hours/days), never rows.
    *
    * @param target    in-control mean μ₀ of the metric
    * @param slack     allowance k ≥ 0 — drift smaller than k per bucket
    *                  is absorbed, not accumulated
    * @param threshold alarm level h > 0 on the accumulated drift */
  def cusum(df: DataFrame, bucketCol: String, valueCol: String,
      target: Double, slack: Double, threshold: Double): DataFrame = {
    val bad = df.filter(col(bucketCol).isNull || col(valueCol).isNull)
      .limit(1).count()
    require(bad == 0L,
      s"cusum needs non-NULL '$bucketCol' buckets and '$valueCol' values")
    cusumFromPartials(partialGrid(df, bucketCol, valueCol),
      target, slack, threshold)
  }

  /** Per-bucket PARTIAL aggregate `(bucket, n, _sm)` — the mergeable
    * state [[cusumFromPartials]] folds: partials from any number of
    * micro-batches (or one full batch) re-aggregate per key to the
    * identical grid, which is what makes the streaming monitor
    * ([[graft.streaming.CusumMonitor]]) ≡ this batch op by
    * construction. */
  private[graft] def partialGrid(df: DataFrame, bucketCol: String,
      valueCol: String): DataFrame =
    df.select(col(bucketCol).as("bucket"),
        round(col(valueCol).cast("double") * 1e6d).cast("decimal(38,0)")
          .as("_vm"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_vm")).as("_sm"))

  /** The CUSUM statistic over a (possibly partial-per-bucket) grid:
    * re-aggregates per bucket first — a no-op on a final grid, the
    * cross-batch merge on stacked partials — then runs the drawup
    * windows. Output and determinism exactly as [[cusum]]. */
  private[graft] def cusumFromPartials(grid: DataFrame,
      target: Double, slack: Double, threshold: Double): DataFrame = {
    require(slack >= 0.0d, s"slack must be >= 0, got $slack")
    require(threshold > 0.0d, s"threshold must be > 0, got $threshold")
    val tq = math.round(target * 1e6d)
    val kq = math.round(slack * 1e6d)
    val hq = math.round(threshold * 1e6d)
    val perBucket = grid
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n"),
        sum(col("_sm").cast("decimal(38,0)")).as("_sm"))
      .withColumn("_mean",
        round(col("_sm").cast("double") / col("n").cast("double"))
          .cast("long"))
      .withColumn("_dhi", col("_mean") - tq - kq)
      .withColumn("_dlo", lit(tq) - col("_mean") - kq)
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = perBucket
      .withColumn("_phi", sum(col("_dhi")).over(wCum))
      .withColumn("_plo", sum(col("_dlo")).over(wCum))
      .withColumn("_shi",
        col("_phi") - least(min(col("_phi")).over(wCum), lit(0L)))
      .withColumn("_slo",
        col("_plo") - least(min(col("_plo")).over(wCum), lit(0L)))
    cum.select(col("bucket"), col("n"),
      round(col("_mean").cast("double") / 1e6d, 6).as("mean"),
      round(col("_shi").cast("double") / 1e6d, 6).as("cusum_hi"),
      round(col("_slo").cast("double") / 1e6d, 6).as("cusum_lo"),
      when(col("_shi") > hq || col("_slo") > hq, 1L).otherwise(0L)
        .as("alarm"))
  }
}
