package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming extension over the `events` table schema
  * (event_id, ts, user_id, event_type, value, props — TESTDATA.md).
  *
  * The reference is strictly batch (SURVEY.md §2.3 "Streaming: Absent");
  * this module adds the planned streaming surface: watermarked tumbling /
  * sliding / session windows and custom per-key state via
  * flatMapGroupsWithState. Each transform takes any events-shaped
  * DataFrame — batch or streaming — so the logic is testable with
  * MemoryStream and runnable as `readStream` in production. Streaming
  * ingest appends to collections (batch-first engine; see
  * graft.core.Collection).
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window counts/sums per event type. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window aggregate (overlapping windows). */
  def slidingAvg(events: DataFrame, windowLen: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(avg(col("value")).as("avg_value"), count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("avg_value"), col("n"))

  /** Session windows per user (gap-based). */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)
  final case class UserRunningState(n: Long, total: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state: running per-user totals via
    * flatMapGroupsWithState (the reference has no stateful ops at all). */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserRunningState]) => {
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0.0))
          var n = prev.n; var total = prev.total
          rows.foreach { r => n += 1; total += r.value }
          state.update(UserRunningState(n, total))
          Iterator(UserRunning(uid, n, total))
        })
      .toDF()
  }

  final case class FunnelState(times: Seq[Long])
  final case class FunnelProgress(user_id: Long, stage_idx: Int,
      stage: String, stage_ts: java.sql.Timestamp)

  /** Stateful streaming funnel (the live twin of ops.Funnel.stageTimes):
    * per user, track the earliest strictly-ordered stage-completion
    * chain across micro-batches and EMIT each stage the moment its
    * completion becomes known. State = one epoch-millis long per stage,
    * held ONLY for users who have completed at least stage 0 — bounded
    * by stage count × funnel participants, never by event volume or
    * total user count. Events inside a batch are time-sorted before the
    * fold, so in-batch disorder is handled; cross-batch late events are
    * subject to the source's delivery order (add a watermark + timeout
    * upstream to bound lateness, same trade as any stateful op).
    *
    * Greedy is exact here, as in the batch op: an earlier stage-(i−1)
    * time can only ever help stage i, so folding events in time order
    * yields the minimal chain. */
  def funnelProgress(spark: SparkSession, events: DataFrame,
      stages: Seq[String]): DataFrame = {
    import spark.implicits._
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct: $stages")
    val n = stages.length
    val stageIdx = stages.zipWithIndex.toMap
    events.as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) => {
          val times = state.getOption
            .map(_.times.toArray).getOrElse(Array.fill(n)(Long.MinValue))
          val out = Seq.newBuilder[FunnelProgress]
          var changed = false
          rows.toSeq
            .filter(r => stageIdx.contains(r.event_type))
            .sortBy(r => (r.ts.getTime, r.event_id))
            .foreach { r =>
              val i = stageIdx(r.event_type)
              val prevDone = i == 0 || times(i - 1) != Long.MinValue
              val prevT = if (i == 0) Long.MinValue else times(i - 1)
              if (times(i) == Long.MinValue && prevDone && r.ts.getTime > prevT) {
                times(i) = r.ts.getTime
                changed = true
                out += FunnelProgress(uid, i, stages(i), r.ts)
              }
            }
          // write state only on progress: users who never enter the
          // funnel hold NO state (bounding the store to participants),
          // and unchanged state isn't re-serialized every batch
          if (changed) state.update(FunnelState(times.toSeq))
          out.result().iterator
        })
      .toDF()
  }

  final case class AttrState(channel: String)
  final case class AttrEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double,
      chan: Option[String])
  final case class AttributedPurchase(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, channel: String, value: Double)

  /** Stateful streaming last-touch attribution — the live twin of
    * RelationalQueries.lastTouchAttribution (q101): per user, carry the
    * channel of the most recent click seen so far; each purchase is
    * EMITTED attributed to that channel the moment it arrives ('organic'
    * when no click preceded it). State = ONE channel string per user who
    * has ever clicked — bounded by user count, never by event volume.
    * The channel is extracted with the IDENTICAL Catalyst expression as
    * the batch twin (`get_json_object(props, '$$.k')` + long cast, so
    * quoted values like `"k":"3"` parse the same) on the micro-batch
    * BEFORE the stateful fold — the per-row state code never touches raw
    * JSON, so batch and stream can't diverge on extraction. Events
    * inside a batch are (ts, event_id)-sorted before the fold (in-batch
    * disorder handled); cross-batch late clicks are subject to delivery
    * order, the standard stateful-op trade. */
  def lastTouchAttribution(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val withChan = events.select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"),
      when(col("event_type") === "click",
        concat(lit("ch"),
          (get_json_object(col("props"), "$.k").cast("long") % 4)
            .cast("string"))).as("chan"))
    withChan.as[AttrEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[AttrState]) => {
          var channel = state.getOption.map(_.channel).orNull
          val out = Seq.newBuilder[AttributedPurchase]
          rows.toSeq
            .filter(r => r.event_type == "click" || r.event_type == "purchase")
            .sortBy(r => (r.ts.getTime, r.event_id))
            .foreach { r =>
              if (r.event_type == "click") {
                r.chan.foreach(c => channel = c)
              } else {
                out += AttributedPurchase(uid, r.event_id, r.ts,
                  if (channel == null) "organic" else channel, r.value)
              }
            }
          if (channel != null) state.update(AttrState(channel))
          out.result().iterator
        })
      .toDF()
  }

  final case class HourCents(event_type: String, hour_epoch: Long, cents: Long)
  final case class TypeHoursState(hours: Map[Long, Long])
  final case class HourlyAnomaly(event_type: String, hour_epoch: Long,
      hr_value: Double, z: Double)

  /** Streaming twin of RelationalQueries.hourlyAnomalies (q106): per
    * event type, hourly value totals more than 2 population-σ from the
    * type's mean — re-evaluated live as events arrive. The per-type
    * moments are kept as EXACT integer cent sums (hour_epoch → Σcents),
    * which merge associatively across micro-batches; every emission
    * recomputes the type's CURRENT full anomaly set from those exact
    * sums via the identical arithmetic as the batch query (decimal cents
    * → double μ/σ² in the same operation order, 6-dp HALF_UP z), so once
    * all events have arrived the final emission per type equals the
    * batch result row-for-row (spec-proven). Cent extraction happens
    * with Catalyst expressions on the micro-batch BEFORE the stateful
    * fold (the q101 parity device) — state code never re-parses values.
    *
    * Update-mode semantics by construction: a new hour shifts μ/σ², so
    * past hours can enter or leave the anomaly set — the operator
    * re-emits the full set for the updated type (anomaly monitoring is
    * a replace-per-type readout, not an append log). State is one long
    * per (type, active hour): bounded by types × elapsed hours, growing
    * one entry per type per hour. `retainHours = Some(h)` caps that
    * horizon: after each merge the fold drops hours more than h-1 hours
    * behind the type's newest hour, so state is O(types × h) no matter
    * how long the stream runs (anomalies are then judged against the
    * retained window's moments — the sliding-baseline monitoring mode).
    * Default `None` keeps every hour = exact batch parity.
    *
    * Degenerate moments: a type with a single retained hour, or with
    * all-equal hourly totals, has population variance 0 — there is no
    * scale to measure deviation against, and the batch twin's
    * `abs(round(NaN,6)) > 2.0` drops every such row. The fold emits
    * nothing for the type until variance is positive (previously it fed
    * NaN to `BigDecimal.valueOf`, throwing NumberFormatException inside
    * the stateful fold and killing the query).
    *
    * CONSUMER CONTRACT (replace-per-type readout): because this is
    * update mode, "the type emitted nothing this batch" and "the type's
    * anomaly set became empty" are indistinguishable on the wire — a
    * type that previously emitted anomalies and then goes degenerate
    * (all-equal totals after a `retainHours` window shift) produces NO
    * retraction rows, so a consumer that materializes "current anomalies
    * per type" from emissions alone would keep the stale set forever.
    * Downstream sinks must therefore treat each emission as the type's
    * full replacement set AND expire a type's materialized rows
    * themselves — e.g. key the sink table by event_type and overwrite
    * per type on every emission that contains the type, with a TTL (or
    * a periodic batch-twin reconciliation, which is exact) clearing
    * types that stop emitting. An in-band empty/tombstone marker row is
    * deliberately NOT emitted: it would break row-schema parity with
    * the batch twin (q106), which simply has no rows for such types. */
  def hourlyAnomaliesStream(spark: SparkSession, events: DataFrame,
      retainHours: Option[Int] = None): DataFrame = {
    retainHours.foreach(h => require(h > 0, s"retainHours must be positive: $h"))
    import spark.implicits._
    val perRow = events.select(
      col("event_type"),
      (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("hour_epoch"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    perRow.as[HourCents]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (typ: String, rows: Iterator[HourCents], state: GroupState[TypeHoursState]) => {
          val hours = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(s => hours ++= s.hours)
          rows.foreach { r =>
            hours(r.hour_epoch) = hours.getOrElse(r.hour_epoch, 0L) + r.cents
          }
          retainHours.foreach { rh =>
            if (hours.nonEmpty) {
              val cutoff = hours.keysIterator.max - (rh.toLong - 1L) * 3600L
              hours.filterInPlace((h, _) => h >= cutoff)
            }
          }
          state.update(TypeHoursState(hours.toMap))
          // exact decimal moments, then the batch query's double algebra
          // in the same operation order
          import java.math.{BigDecimal => JBD, BigInteger => JBI, RoundingMode}
          val n = hours.size.toLong
          var s = JBI.ZERO
          var q = JBI.ZERO
          hours.values.foreach { c =>
            val cb = JBI.valueOf(c)
            s = s.add(cb)
            q = q.add(cb.multiply(cb))
          }
          val sDbl = new JBD(s, 2).doubleValue   // Σ v_d  (DECIMAL 18,2)
          val qDbl = new JBD(q, 4).doubleValue   // Σ v_d² (DECIMAL 37,4)
          val mu = sDbl / n
          val variance = (qDbl - sDbl * sDbl / n) / n
          if (!(variance > 0)) Iterator.empty  // zero/degenerate variance:
          // batch's abs(round(NaN,6)) > 2.0 is false — emit nothing
          else hours.toSeq.sorted.iterator.flatMap { case (h, c) =>
            val v = new JBD(JBI.valueOf(c), 2).doubleValue
            val z = JBD.valueOf((v - mu) / math.sqrt(variance))
              .setScale(6, RoundingMode.HALF_UP).doubleValue
            if (math.abs(z) > 2.0) Some(HourlyAnomaly(typ, h, v, z)) else None
          }
        })
      .toDF()
  }

  final case class ItemRow(item: Long)
  final case class HitterState(n: Long)
  final case class HeavyHitter(item: Long, n: Long)

  /** Streaming twin of the batch heavy-hitters report (q113,
    * [[graft.ops.HeavyHitters]]): emit (item, n) whenever an item's
    * running EXACT count reaches/extends past `minCount` — the live
    * "this key is getting hot" signal (update semantics: the latest
    * emission per item is its current count; a consumer materializes
    * max-per-item). Once all events have arrived, the latest emission
    * per item equals the batch result exactly (spec-proven).
    *
    * State here is ONE long per distinct item — keyed state sharded by
    * item across executors, the same bound as any streaming per-key
    * count (NOT the batch path's answer-sized driver state; a stream
    * can't retro-count items that only later become candidates, so the
    * CMS prefilter trick does not transfer — the sketch alternatives
    * (Space-Saving) are arrival-order-dependent, which would break
    * batch parity and cross-run determinism). `input` must be a single
    * long `item` column. */
  def heavyHittersStream(spark: SparkSession, input: DataFrame,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    import spark.implicits._
    input.as[ItemRow]
      .groupByKey(_.item)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (item: Long, rows: Iterator[ItemRow], state: GroupState[HitterState]) => {
          val prev = state.getOption.map(_.n).getOrElse(0L)
          var n = prev
          rows.foreach(_ => n += 1)
          state.update(HitterState(n))
          if (n >= minCount) Iterator(HeavyHitter(item, n)) else Iterator.empty
        })
      .toDF()
  }

  /** Streaming exact dedup: drop events whose `idCols` were already seen
    * within the watermark horizon (`dropDuplicatesWithinWatermark` — state
    * is evicted once the watermark passes, so memory is bounded by the
    * duplicate-arrival horizon, not the stream length). This is the
    * streaming twin of Dedup.dropExactDuplicates: at-least-once sources
    * (e.g. CollectionIngest replays) become effectively exactly-once for
    * any downstream aggregate as long as duplicates arrive within the
    * horizon. */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes",
      idCols: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming value-distribution sketch: per (tumbling window,
    * event_type, bin) counts over a FIXED-bound histogram — the
    * streamable half of [[graft.ops.HistogramQuantile]] (a stream
    * cannot run the two-pass extent, so [lo, hi) is part of the
    * operator contract; out-of-range values clamp into the edge bins,
    * degrading tail accuracy but never correctness or determinism).
    * Watermarked grouped counts → append-safe; state per open window is
    * ≤ types × bins longs. The operational-percentile building block:
    * persist this and ask for p50/p95 later via [[windowedQuantiles]].
    * Works unchanged on batch frames (the q161 twin). */
  def windowedValueHistogram(events: DataFrame, lo: Double, hi: Double,
      bins: Int = 128, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(bins >= 2, s"need >= 2 bins, got $bins")
    events
      .withWatermark("ts", watermark)
      .withColumn("_bin", least(greatest(
        floor((col("value") - lo) / (hi - lo) * bins), lit(0L)),
        lit(bins - 1L)))
      .groupBy(window(col("ts"), windowLen), col("event_type"), col("_bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("_bin").as("bin"), col("n"))
  }

  /** Quantiles from a [[windowedValueHistogram]] sketch (batch
    * finalize — run it over the streamed sink or any batch-built
    * histogram): for each requested q, the bucket where the cumulative
    * count crosses rank ceil(q·n), linearly interpolated — the
    * HistogramQuantile math with the fixed [lo, hi) width. The windows
    * run over (window × type × bins) rows, never events. */
  def windowedQuantiles(binCounts: DataFrame, lo: Double, hi: Double,
      bins: Int, qs: Seq[Double]): DataFrame = {
    require(hi > lo && bins >= 2, s"bad histogram config [$lo, $hi) x $bins")
    require(qs.nonEmpty && qs.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col("window_start"), col("event_type"))
    val cumW = byKey.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    binCounts
      .withColumn("_cumBefore", coalesce(sum(col("n")).over(cumW), lit(0L)))
      .withColumn("_n", sum(col("n")).over(byKey))
      .select(col("*"), explode(array(qs.map(lit): _*)).as("p"))
      .withColumn("_needed", ceil(col("p") * col("_n")).cast("long"))
      .filter(col("_cumBefore") < col("_needed") &&
        col("_needed") <= col("_cumBefore") + col("n"))
      .withColumn("est", round(lit(lo) + lit((hi - lo) / bins) *
        (col("bin") + (col("_needed") - col("_cumBefore")).cast("double") /
          col("n")), 6))
      .select(col("window_start"), col("event_type"), col("p"), col("est"),
        col("_n").as("n"))
  }

  /** Stream-stream interval join (click → purchase attribution): each
    * purchase joined to the same user's clicks in the preceding
    * `withinMinutes`. Both sides carry watermarks and the join predicate
    * bounds event-time range, which is exactly what lets Spark BOUND the
    * buffered join state: click rows are dropped once older than
    * watermark + interval, purchases once older than watermark — the
    * canonical watermarked stream-stream join, state O(traffic in the
    * horizon), not O(stream). Inner join → append mode. Works unchanged
    * on batch frames; the q53 range join is the bucketed batch twin of
    * the same interval semantics. */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int = 30, watermark: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id").as("click_user"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c, expr(
      s"""click_user = user_id AND
         |click_ts >= purchase_ts - INTERVAL $withinMinutes MINUTES AND
         |click_ts <= purchase_ts""".stripMargin))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("value"), col("click_id"), col("click_ts"))
  }

  /** Production entry: tail a parquet/json/kafka-style source directory as
    * a stream and maintain the tumbling aggregate. */
  def streamFromDirectory(spark: SparkSession, path: String,
      format: String = "parquet"): DataFrame =
    tumblingCounts(
      spark.readStream.schema(eventSchema).format(format).load(path))
}
