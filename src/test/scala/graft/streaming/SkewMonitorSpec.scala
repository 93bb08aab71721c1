package graft.streaming

import graft.SparkSpecBase
import graft.ops.Skew
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SkewMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .as[(String, Long, Long, Long, Double, Double, Long)].collect().toSeq

  test("stream == batch across micro-batch boundaries, replay, extension") {
    implicit val sqlCtx = spark.sqlContext
    // hot key "a" split across batches; NULL key arrives late
    val batch1: Seq[Option[String]] =
      Seq(Some("a"), Some("a"), Some("a"), Some("b"))
    val batch2: Seq[Option[String]] =
      Seq(Some("a"), Some("a"), Some("a"), Some("b"), Some("c"), None)
    val base = java.nio.file.Files.createTempDirectory("skewm_").toString
    val (st, ck) = (s"$base/state", s"$base/ckpt")

    val mem = MemoryStream[Option[String]]
    mem.addData(batch1: _*)
    val q1 = SkewMonitor.skewMonitor(mem.toDF().toDF("k"), st, "k", ck)
    try q1.processAllAvailable() finally q1.stop()
    mem.addData(batch2: _*)
    val q2 = SkewMonitor.skewMonitor(mem.toDF().toDF("k"), st, "k", ck)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = rows(SkewMonitor.skewState(spark, st, partitions = 4))
    val twin = rows(Skew.skewReport((batch1 ++ batch2).toDF("k"), "k",
      partitions = 4))
    assert(streamed == twin, s"streamed $streamed vs twin $twin")
    // the hot key pooled across batches: a -> 6 of 10, skew 2.4x, salt 3
    assert(streamed.head == (("a", 6L, 10L, 4L, 0.6d, 2.4d, 3L)),
      streamed.toString)

    // crash-replay rewrites the identical partial
    SkewMonitor.observeBatch(batch2.toDF("k"), 1L, st, "k")
    assert(rows(SkewMonitor.skewState(spark, st, 4)) == streamed)

    // a third batch shifts the report: the union is always served
    SkewMonitor.observeBatch(
      Seq.fill(10)(Some("d")).toDF("k"), 2L, st, "k")
    val ext = rows(SkewMonitor.skewState(spark, st, 4))
    val extTwin = rows(Skew.skewReport(
      (batch1 ++ batch2 ++ Seq.fill(10)(Option("d"))).toDF("k"), "k", 4))
    assert(ext == extTwin, s"ext $ext vs twin $extTwin")
    assert(ext.head._1 == "d", ext.toString)

    intercept[IllegalArgumentException](
      SkewMonitor.skewState(spark, s"$base/never", 4))
  }
}
