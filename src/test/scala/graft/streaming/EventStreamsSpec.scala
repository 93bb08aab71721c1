package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpecBase {
  import spark.implicits._
  import EventStreams.EventRow

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  /** Timestamp at hour offset `h` from 10:00 (minute 1). */
  private def tsh(h: Int) =
    Timestamp.valueOf(f"2024-01-01 ${10 + h}%02d:01:00")

  private val sampleEvents = Seq(
    EventRow(0L, ts(1), 1L, "click", 1.0, "{}"),
    EventRow(1L, ts(5), 1L, "click", 2.0, "{}"),
    EventRow(2L, ts(7), 2L, "view", 3.0, "{}"),
    EventRow(3L, ts(61), 1L, "click", 4.0, "{}"),
    EventRow(4L, ts(62), 2L, "view", 5.0, "{}"))

  test("tumblingCounts over a MemoryStream matches the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.tumblingCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      mem.addData(sampleEvents: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = EventStreams.tumblingCounts(sampleEvents.toDF(), "1 hour")
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.0)))
      assert(streamed.contains((Timestamp.valueOf("2024-01-01 11:00:00"), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowed histogram sketch: stream == batch, quantiles hand-checked") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.windowedValueHistogram(mem.toDF(), 0.0, 10.0, bins = 10)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hist_out").start()
    try {
      mem.addData(sampleEvents: _*)
      q.processAllAvailable()
      val streamed = spark.table("hist_out")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      val batch = EventStreams.windowedValueHistogram(
          sampleEvents.toDF(), 0.0, 10.0, bins = 10)
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(streamed == batch, s"stream/batch sketch drift: $streamed vs $batch")
      // finalize: hour-10 clicks have values 1.0, 2.0 → bins 1, 2.
      // p50 → rank 1 → bin 1: est = 0 + 1·(1 + 1/1) = 2.0 (bin width 1)
      val quants = EventStreams.windowedQuantiles(
          spark.table("hist_out"), 0.0, 10.0, 10, Seq(0.5))
        .filter($"event_type" === "click" &&
          $"window_start" === Timestamp.valueOf("2024-01-01 10:00:00"))
        .as[(Timestamp, String, Double, Double, Long)].collect().toSeq
      assert(quants.map(r => (r._4, r._5)) == Seq((2.0, 2L)), s"p50 wrong: $quants")
    } finally q.stop()
  }

  test("windowed histogram sketches MERGE: hist(A ∪ B) = per-bin sum of hist(A), hist(B)") {
    // the property that makes the fixed-bound sketch shard-safe: two
    // independently built histograms combine by adding bin counts —
    // no re-scan of either input
    val all = sampleEvents.toDF()
    val partA = sampleEvents.take(2).toDF()
    val partB = sampleEvents.drop(2).toDF()
    def hist(df: org.apache.spark.sql.DataFrame) =
      EventStreams.windowedValueHistogram(df, 0.0, 10.0, 10)
        .as[(Timestamp, String, Long, Long)].collect()
        .groupBy(t => (t._1, t._2, t._3)).view.mapValues(_.map(_._4).sum).toMap
    val whole = hist(all)
    val merged = (hist(partA).toSeq ++ hist(partB).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == whole, s"sketches must merge by addition: $merged vs $whole")
  }

  test("windowed histogram clamps out-of-range values into edge bins") {
    val rows = Seq(
      EventRow(0L, ts(1), 1L, "click", -5.0, "{}"),   // below lo → bin 0
      EventRow(1L, ts(2), 1L, "click", 99.0, "{}"))   // above hi → last bin
    val got = EventStreams.windowedValueHistogram(rows.toDF(), 0.0, 10.0, 10)
      .select($"bin", $"n").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (9L, 1L)), s"clamping wrong: $got")
  }

  test("session windows group by gap") {
    // gap 30m: user 1 events at 10:01,10:05 are one session; 11:01 another
    val got = EventStreams.userSessions(sampleEvents.toDF(), "30 minutes")
      .filter($"user_id" === 1L)
      .select("n_events").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("runningUserTotals maintains state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.runningUserTotals(spark, mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("running_out").start()
    try {
      mem.addData(sampleEvents.take(3): _*)
      q.processAllAvailable()
      mem.addData(sampleEvents.drop(3): _*)
      q.processAllAvailable()
      val rows = spark.table("running_out")
        .as[(Long, Long, Double)].collect()
      // last emission for user 1 must reflect all 3 events (1+2+4)
      val u1 = rows.filter(_._1 == 1L).maxBy(_._2)
      assert(u1 == ((1L, 3L, 7.0)))
      val u2 = rows.filter(_._1 == 2L).maxBy(_._2)
      assert(u2 == ((2L, 2L, 8.0)))
    } finally q.stop()
  }

  test("slidingAvg emits overlapping windows") {
    val got = EventStreams.slidingAvg(sampleEvents.toDF(), "10 minutes", "5 minutes")
      .filter($"event_type" === "click")
      .select("window_start", "n").as[(Timestamp, Long)].collect().toMap
    // event at 10:05 appears in the 10:00 and 10:05 windows
    assert(got(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L)
    assert(got(Timestamp.valueOf("2024-01-01 10:05:00")) == 1L)
  }

  test("attributedPurchases: stream-stream interval join across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val q = EventStreams.attributedPurchases(
        clicks.toDF(), purchases.toDF(), withinMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      clicks.addData(
        EventRow(10L, ts(1), 1L, "click", 0, "{}"),
        EventRow(11L, ts(5), 1L, "click", 0, "{}"),
        EventRow(12L, ts(7), 2L, "click", 0, "{}"))
      q.processAllAvailable()
      // purchases arrive in a LATER micro-batch — the join must replay
      // buffered click state, not just the current batch
      purchases.addData(
        EventRow(20L, ts(20), 1L, "purchase", 9.99, "{}"), // clicks 10, 11
        EventRow(21L, ts(45), 2L, "purchase", 5.00, "{}")) // click 12 too old
      q.processAllAvailable()
      clicks.addData(EventRow(13L, ts(58), 1L, "click", 0, "{}"))
      purchases.addData(
        EventRow(22L, ts(59), 1L, "purchase", 1.00, "{}")) // click 13 only
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("purchase_id", "click_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((20L, 10L), (20L, 11L), (22L, 13L)), got.toString)
    } finally q.stop()
  }

  test("attributedPurchases on batch frames equals the naive interval join") {
    val ev = sampleEvents ++ Seq(
      EventRow(30L, ts(25), 1L, "purchase", 9.99, "{}"),
      EventRow(31L, ts(62, 30), 2L, "purchase", 5.00, "{}"))
    val df = ev.toDF()
    val got = EventStreams.attributedPurchases(
        df.filter($"event_type" === "click"),
        df.filter($"event_type" === "purchase"), withinMinutes = 30)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    // purchase 30 @10:25 (user 1): clicks 0 @10:01, 1 @10:05 within 30m
    // purchase 31 @11:02:30 (user 2): user 2 has no clicks at all
    assert(got == Set((30L, 0L), (30L, 1L)))
  }

  test("funnelProgress: stateful streaming funnel matches the batch op") {
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click", "purchase")
    val funnelEvents = Seq(
      // user 1 completes across micro-batches; user 2's click precedes
      // its view (must not count); user 3 stalls at view
      EventRow(0L, ts(1), 1L, "view", 0, "{}"),
      EventRow(1L, ts(2), 2L, "click", 0, "{}"),
      EventRow(2L, ts(3), 2L, "view", 0, "{}"),
      EventRow(3L, ts(4), 3L, "view", 0, "{}"),
      // batch 2
      EventRow(4L, ts(5), 1L, "click", 0, "{}"),
      EventRow(5L, ts(6), 1L, "purchase", 0, "{}"),
      EventRow(6L, ts(7), 2L, "click", 0, "{}"))
    val mem = MemoryStream[EventRow]
    val q = EventStreams.funnelProgress(spark, mem.toDF(), stages)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      mem.addData(funnelEvents.take(4): _*)
      q.processAllAvailable()
      val afterB1 = spark.table("funnel_out")
        .select("user_id", "stage_idx").as[(Long, Int)].collect().toSet
      assert(afterB1 == Set((1L, 0), (2L, 0), (3L, 0)),
        s"batch 1: only views complete (user 2's early click ignored): $afterB1")
      mem.addData(funnelEvents.drop(4): _*)
      q.processAllAvailable()
      val streamed = spark.table("funnel_out")
        .select("user_id", "stage_idx", "stage_ts")
        .as[(Long, Int, Timestamp)].collect().toSet
      // the batch op over the same events must agree stage-for-stage
      val batch = graft.ops.Funnel.stageTimes(funnelEvents.toDF(),
          "user_id", "ts", "event_type", stages)
        .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])]
        .collect().flatMap { case (u, t0, t1, t2) =>
          Seq(Some(t0), t1, t2).zipWithIndex.collect {
            case (Some(t), i) => (u, i, t)
          }
        }.toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("dedupedEvents drops within-watermark duplicate event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.dedupedEvents(mem.toDF(), "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      // a replayed micro-batch: event 0 and 1 arrive twice (same id)
      mem.addData(sampleEvents.take(3): _*)
      q.processAllAvailable()
      mem.addData(sampleEvents(0), sampleEvents(1), sampleEvents(3))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(0L, 1L, 2L, 3L), s"duplicates must be dropped, got $ids")
    } finally q.stop()
  }

  test("lastTouchAttribution: state carries the channel across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      // user 1: purchase BEFORE any click → organic; then click ch1,
      // purchase → ch1 (click in an EARLIER batch than the purchase)
      EventRow(0L, ts(1), 1L, "purchase", 10.0, "{}"),
      EventRow(1L, ts(2), 1L, "click", 0, """{"k": 5}"""),
      // user 2: two clicks — the LATER one (ch2) wins for the purchase
      EventRow(2L, ts(1), 2L, "click", 0, """{"k": 1}"""),
      EventRow(3L, ts(2), 2L, "click", 0, """{"k": 6}"""),
      // batch 2
      EventRow(4L, ts(3), 1L, "purchase", 20.0, "{}"),
      EventRow(5L, ts(3), 2L, "purchase", 30.0, "{}"))
    val mem = MemoryStream[EventRow]
    val q = EventStreams.lastTouchAttribution(spark, mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      mem.addData(evs.take(4): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(4): _*)
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("event_id", "channel", "value")
        .as[(Long, String, Double)].collect().toSet
      assert(got == Set(
        (0L, "organic", 10.0), // no prior click
        (4L, "ch1", 20.0),     // click from batch 1 carried in state
        (5L, "ch2", 30.0)),    // later click wins
        s"got $got")
    } finally q.stop()
  }

  private val anomalyCols = Seq("event_type", "hour_epoch", "hr_value", "z")

  test("hourlyAnomaliesStream in batch mode == batch q106 on real events") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val streamed = EventStreams.hourlyAnomaliesStream(spark, events)
      .select(anomalyCols.head, anomalyCols.tail: _*)
      .as[(String, Long, Double, Double)].collect().toSet
    val batch = graft.RelationalQueries.hourlyAnomalies(spark, "/root/testdata/sf0.001")
      .select(anomalyCols.head, anomalyCols.tail: _*)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(batch.nonEmpty, "q106 must flag anomalies at sf0.001")
    assert(streamed == batch,
      s"missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("hourlyAnomaliesStream survives zero-variance state (single-hour / all-equal types)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.hourlyAnomaliesStream(spark, mem.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("anom_zerovar").start()
    try {
      // "solo": one hour only (n=1) and "flat": two hours with equal
      // totals — both give population variance 0. Before the guard the
      // fold computed z = NaN and BigDecimal.valueOf(NaN) threw
      // NumberFormatException, killing the whole streaming query here.
      mem.addData(
        EventRow(0L, ts(1), 1L, "solo", 7.0, "{}"),
        EventRow(1L, ts(2), 1L, "flat", 5.0, "{}"),
        EventRow(2L, ts(61), 2L, "flat", 5.0, "{}"))
      q.processAllAvailable() // must not throw
      assert(spark.table("anom_zerovar").count() == 0,
        "zero-variance types must emit no anomalies (batch NaN semantics)")
      // once a type gains positive variance it flows again: five equal
      // hours + one outlier ⇒ outlier z = sqrt(5) ≈ 2.236 > 2
      mem.addData(
        (2 to 4).map(h => EventRow(10L + h, tsh(h), 1L, "flat", 5.0, "{}")) :+
        EventRow(20L, tsh(5), 1L, "flat", 50.0, "{}"): _*)
      q.processAllAvailable()
      val got = spark.table("anom_zerovar")
        .select("event_type", "z").as[(String, Double)].collect().toSet
      assert(got == Set(("flat", 2.236068)), s"got $got")
    } finally q.stop()
  }

  test("hourlyAnomaliesStream retention cap bounds state to the newest hours") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    // 7 active hours, retain 6: the oldest hour must drop from state, so
    // the outlier's z is computed over n=6 (z=sqrt(5)=2.236068), not n=7
    // (z=sqrt(6)=2.449490) — the z value itself proves the drop happened
    val q = EventStreams.hourlyAnomaliesStream(spark, mem.toDF(),
        retainHours = Some(6))
      .writeStream.outputMode("update")
      .format("memory").queryName("anom_retain").start()
    try {
      mem.addData((0 to 5).map(h =>
        EventRow(h.toLong, tsh(h), 1L, "r", 5.0, "{}")): _*)
      q.processAllAvailable()
      mem.addData(EventRow(6L, Timestamp.valueOf("2024-01-01 16:01:00"), 1L, "r", 50.0, "{}"))
      q.processAllAvailable()
      val lastZ = spark.table("anom_retain")
        .select("event_type", "hour_epoch", "z")
        .as[(String, Long, Double)].collect().toSet
      val outlierHour = Timestamp.valueOf("2024-01-01 16:00:00").getTime / 1000
      assert(lastZ == Set(("r", outlierHour, 2.236068)), s"got $lastZ")
    } finally q.stop()
  }

  test("hourlyAnomaliesStream: final per-type emission over micro-batches == batch q106") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .as[EventRow].collect().sortBy(_.event_id)
    val mem = MemoryStream[EventRow]
    // update-mode readout: each emission replaces the type's full anomaly
    // set, so "current state" = latest emission per type
    val latest = scala.collection.concurrent.TrieMap
      .empty[String, Set[(String, Long, Double, Double)]]
    val q = EventStreams.hourlyAnomaliesStream(spark, mem.toDF())
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
          .groupBy(_._1)
          .foreach { case (t, rows) => latest(t) = rows.toSet }
        ()
      }.start()
    try {
      val (b1, b2) = events.splitAt(events.length / 2)
      mem.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = latest.values.flatten.toSet
    val batch = graft.RelationalQueries.hourlyAnomalies(spark, "/root/testdata/sf0.001")
      .select(anomalyCols.head, anomalyCols.tail: _*)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(streamed == batch,
      s"missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("heavyHittersStream: latest emission per item over micro-batches == batch q113 path") {
    implicit val sqlCtx = spark.sqlContext
    val items = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id").as[Long].collect().sorted
    val minCount = 70L
    val mem = MemoryStream[EventStreams.ItemRow]
    // update-mode readout: keep the max (= latest, counts only grow)
    // emission per item
    val latest = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q = EventStreams.heavyHittersStream(spark, mem.toDF(), minCount)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach { r =>
          val (item, n) = (r.getLong(0), r.getLong(1))
          latest.updateWith(item) {
            case Some(p) => Some(math.max(p, n))
            case None => Some(n)
          }
        }
        ()
      }.start()
    try {
      val (b1, b2) = items.splitAt(items.length / 2)
      mem.addData(b1.toIndexedSeq.map(EventStreams.ItemRow(_)): _*)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq.map(EventStreams.ItemRow(_)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = graft.ops.HeavyHitters.heavyHitters(
        graft.Tables.events(spark, "/root/testdata/sf0.001").select($"user_id"),
        "user_id", minCount)
      .as[(Long, Long)].collect().toMap
    assert(latest.toMap == batch,
      s"missing=${batch.toSet -- latest.toSet} extra=${latest.toSet -- batch.toSet}")
    // an item that crossed the bar mid-stream must have emitted early too
    assert(batch.nonEmpty, "test needs at least one heavy hitter at this threshold")
  }

  test("stateful stream state survives a checkpointed query restart") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.ItemRow]
    val ckpt = java.nio.file.Files.createTempDirectory("hh_ckpt").toString
    // memory sink can't recover from a checkpoint; foreachBatch can —
    // collect emissions into a driver-side set across both runs
    val emitted = scala.collection.concurrent.TrieMap.empty[(Long, Long), Unit]
    def start() = EventStreams.heavyHittersStream(spark, mem.toDF(), minCount = 3L)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r => emitted.put((r.getLong(0), r.getLong(1)), ()))
        ()
      }.start()
    // run 1: two occurrences of item 7 — below the bar, state = 2
    val q1 = start()
    try {
      mem.addData(EventStreams.ItemRow(7L), EventStreams.ItemRow(7L))
      q1.processAllAvailable()
      assert(emitted.isEmpty, "below bar: no emission")
    } finally q1.stop()
    // run 2 from the same checkpoint: ONE more occurrence must emit
    // (7, 3) — only possible if the keyed state store recovered n=2
    val q2 = start()
    try {
      mem.addData(EventStreams.ItemRow(7L))
      q2.processAllAvailable()
      assert(emitted.contains((7L, 3L)),
        s"restarted query must resume from recovered state: ${emitted.keySet}")
    } finally q2.stop()
  }
}
