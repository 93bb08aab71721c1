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
}
