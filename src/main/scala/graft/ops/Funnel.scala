package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — the conversion query of
  * product analytics (view → click → purchase): for each user, the
  * earliest chain of stage completions where stage i counts only when it
  * happens strictly AFTER the user's stage-(i−1) completion time.
  *
  * Plan: stage 0 is one filtered groupBy(user) min; each later stage is a
  * conditional min over the (user-keyed) join of the per-user frontier
  * with that stage's filtered events. Every input to a join is already
  * aggregated to ≤ one row per user, so at 100 TB each step is an
  * equi-shuffle of user-cardinality rows — never event-cardinality — and
  * the event scan is filtered to one stage's type before it moves.
  * Stages are sequential by definition (t_i depends on t_{i-1}), so the
  * chain length — typically 3-5 — bounds the number of shuffles, not the
  * data volume.
  */
object Funnel {

  /** Per-user stage-completion times: columns t0..t{n-1} (null = stage
    * not reached). Row set = users who completed stage 0. */
  def stageTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct == stages, s"stages must be distinct: $stages")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val e = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("_ts"))
      val keep = col(userCol) +: (0 until i).map(j => col(s"t$j"))
      acc.join(e, Seq(userCol), "left")
        .groupBy(keep: _*)
        // null t{i-1} (stage not reached) nulls the comparison, so the
        // min is null too: unreachable stages stay unreachable
        .agg(min(when(col("_ts") > col(s"t${i - 1}"), col("_ts"))).as(s"t$i"))
    }
  }

  /** Cohort retention: users bucketed by their FIRST-activity period
    * (cohort), then counted per (cohort, periods-since-cohort) of later
    * activity — the product-analytics retention triangle.
    *
    * Plan: one groupBy(user) min for cohort assignment, one distinct on
    * (user, period), one user-keyed equi-join of those two user-
    * cardinality sides, one final groupBy — event rows collapse to
    * (user, period) pairs before anything shuffles twice. `periodSec`
    * buckets epoch seconds with exact integer division (engine-portable;
    * calendar weeks would drag in locale rules). */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      periodSec: Long = 7L * 24 * 3600): DataFrame = {
    require(periodSec >= 1, s"period must be >= 1s, got $periodSec")
    val activity = events
      .select(col(userCol), periodOf(tsCol, periodSec).as("period")).distinct()
    val cohorts = activity.groupBy(col(userCol))
      .agg(min(col("period")).as("cohort"))
    activity.join(cohorts, Seq(userCol))
      // "period_offset", not "offset" — OFFSET is reserved in ANSI/DuckDB
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("period_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Epoch-seconds FLOOR division into periods — exact integers, and
    * floor (not truncate-toward-zero, which is what both Spark's `div`
    * AND DuckDB's `//` do) so pre-1970 timestamps bucket
    * calendar-consistently: 1969-12-31 is day −1, not day 0. pmod's
    * non-negative remainder makes (x − pmod(x, p)) exactly divisible;
    * the oracles replay the same identity with ((s % p) + p) % p. */
  private def periodOf(tsCol: String, periodSec: Long) = expr(
    s"(unix_timestamp(`$tsCol`) - pmod(unix_timestamp(`$tsCol`), ${periodSec}L)) div ${periodSec}L")

  /** Rolling distinct actives (e.g. 7-day DAU→WAU): for each period, the
    * count of distinct users active in the trailing `windowPeriods`
    * periods. Sliding DISTINCT is inexpressible as a window function
    * (frames aggregate values, not sets); the scalable shape is
    * explode-into-affected-windows: dedup to (user, period) FIRST, then
    * each pair votes in the `windowPeriods` windows it belongs to, and a
    * groupBy counts distinct users per window. Shuffled rows =
    * actives × windowPeriods — independent of raw event volume. Windows
    * beyond the last activity are not emitted. */
  def rollingActives(events: DataFrame, userCol: String, tsCol: String,
      periodSec: Long = 24L * 3600, windowPeriods: Int = 7): DataFrame = {
    require(periodSec >= 1 && windowPeriods >= 1,
      s"need period >= 1s and window >= 1, got $periodSec/$windowPeriods")
    val activity = events
      .select(col(userCol), periodOf(tsCol, periodSec).as("period")).distinct()
    val lastP = activity.agg(max(col("period")).as("max_period"))
    activity.crossJoin(broadcast(lastP))
      .select(col(userCol), explode(sequence(col("period"),
        least(col("period") + lit(windowPeriods - 1), col("max_period"))))
        .as("window_period"))
      .groupBy(col("window_period"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** Funnel summary: one row per stage with the count of users whose
    * ordered chain reaches it. */
  def summary(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    val times = stageTimes(events, userCol, tsCol, typeCol, stages)
    val counts = times.agg(
      count(col("t0")).as("c0"),
      (1 until stages.length).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    counts.select(explode(array(stages.zipWithIndex.map { case (st, i) =>
      F.struct(lit(i.toLong).as("stage_idx"), lit(st).as("stage"),
        col(s"c$i").as("n_users"))
    }: _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.n_users"))
  }

  /** KAPLAN–MEIER user-lifetime survival with right-censoring — the
    * statistically honest upgrade of [[retention]]'s raw triangle: a
    * user whose last activity falls in the final observed period is
    * CENSORED (still alive as far as the data can say), not counted as
    * churned, so the survival curve is not biased down by the
    * observation window's edge. Convention: a user churns when their
    * last activity period precedes the global horizon (the max period
    * in the data); the event/censor time is the active lifespan
    * `last − first` in periods.
    *
    * One row per distinct churn time t (KM steps at event times only):
    * (t_period, n_risk, n_events, hazard, survival) with
    * n_risk = #{lifespan ≥ t}, hazard = d∕n and
    * S(t) = Π_{tᵢ ≤ t}(1 − dᵢ∕nᵢ).
    *
    * ALL-CENSORED contract (explicit, spec-pinned): when every user's
    * last activity falls in the horizon period — single-period data, or
    * a cohort with no churn — there are NO event times, so the curve
    * has no steps and the output is an EMPTY frame. That reads as "no
    * churn observed anywhere in the window" (S(t) = 1 throughout), not
    * "no data": downstream consumers that need an explicit S = 1 row
    * should treat zero rows as the flat unit curve. KM steps exist only
    * at event times by definition; minting a synthetic t = 0 row would
    * put a non-step into every NON-degenerate curve consumer's join
    * keys too.
    *
    * Determinism: all counts are exact integers; each survival factor's
    * ln((n−d)∕n) nano-quantizes to a long, the running product is a
    * bounded-grid prefix SUM of those longs, and S floats once through
    * exp — bit-replayable (the exp/ln parity every classifier oracle
    * already relies on). A step where d = n drives S to exactly 0.0
    * from that time on (ln 0 is handled by a flag, not −∞ arithmetic).
    *
    * Plan: events collapse to per-user (first, last) in one groupBy;
    * everything after lives on the ≤ #periods-sized duration grid (two
    * bounded-grid windows: reverse-cumulative at-risk counts, forward
    * log-survival prefix). The 1-row horizon broadcasts. */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      periodSec: Long = 24L * 3600): DataFrame = {
    require(periodSec >= 1, s"period must be >= 1s, got $periodSec")
    val bad = events.filter(col(userCol).isNull || col(tsCol).isNull)
      .limit(1).count()
    require(bad == 0L,
      s"kaplanMeier needs non-NULL '$userCol' and '$tsCol'")
    val per = events
      .select(col(userCol).as("_u"), periodOf(tsCol, periodSec).as("_p"))
      .groupBy(col("_u"))
      .agg(min(col("_p")).as("_first"), max(col("_p")).as("_last"))
    val hor = per.agg(max(col("_last")).as("_h"))
    val byT = per.crossJoin(broadcast(hor))
      .select((col("_last") - col("_first")).as("t"),
        (col("_last") < col("_h")).cast("long").as("_death"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_death")).as("_d"))
    val wDesc = org.apache.spark.sql.expressions.Window.orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val risk = byT.withColumn("n_risk", sum(col("_cnt")).over(wDesc))
      .filter(col("_d") > 0L)
    val wAsc = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    risk
      .withColumn("_ln", when(col("_d") === col("n_risk"), lit(null))
        .otherwise(round(log((col("n_risk") - col("_d")).cast("double") /
          col("n_risk").cast("double")) * 1e9d).cast("long")))
      .withColumn("_hitZero",
        max(when(col("_ln").isNull, lit(1L)).otherwise(lit(0L))).over(wAsc))
      .withColumn("_cl", sum(coalesce(col("_ln"), lit(0L))).over(wAsc))
      .select(col("t").as("t_period"), col("n_risk"),
        col("_d").as("n_events"),
        round(col("_d").cast("double") / col("n_risk").cast("double"), 6)
          .as("hazard"),
        when(col("_hitZero") === 1L, lit(0.0d))
          .otherwise(round(exp(col("_cl").cast("double") / 1e9d), 6))
          .as("survival"))
      .orderBy(col("t_period"))
  }
}
