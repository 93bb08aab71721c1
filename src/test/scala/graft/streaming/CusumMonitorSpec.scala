package graft.streaming

import graft.SparkSpecBase
import graft.ops.ChangeDetect
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CusumMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .orderBy($"bucket")
    .as[(Long, Long, Double, Double, Double, Long)].collect().toSeq

  test("stream == batch across micro-batch boundaries, out-of-order buckets, replay") {
    implicit val sqlCtx = spark.sqlContext
    // batch boundaries deliberately split buckets AND arrive out of
    // order: bucket 2's mass is split across both micro-batches, and
    // batch 2 back-fills bucket 1 (late data) after bucket 3 opened
    val batch1 = Seq((1L, 12.0), (2L, 14.0), (3L, 9.0))
    val batch2 = Seq((2L, 12.0), (1L, 10.0), (4L, 8.0), (5L, 16.0))
    val base = java.nio.file.Files.createTempDirectory("cusum_").toString
    val (grid, ck) = (s"$base/grid", s"$base/ckpt")

    val mem = MemoryStream[(Long, Double)]
    mem.addData(batch1: _*)
    val q1 = CusumMonitor.cusumMonitor(mem.toDF().toDF("b", "v"),
      grid, "b", "v", ck)
    try q1.processAllAvailable() finally q1.stop()
    mem.addData(batch2: _*)
    val q2 = CusumMonitor.cusumMonitor(mem.toDF().toDF("b", "v"),
      grid, "b", "v", ck)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = rows(CusumMonitor.cusumState(spark, grid,
      target = 10.0, slack = 1.0, threshold = 3.0))
    val twin = rows(ChangeDetect.cusum((batch1 ++ batch2).toDF("b", "v"),
      "b", "v", target = 10.0, slack = 1.0, threshold = 3.0))
    assert(streamed == twin, s"streamed $streamed vs twin $twin")
    // the split bucket pooled across batches: bucket 2 mean = 13, n = 2
    assert(streamed.find(_._1 == 2L).get._2 == 2L &&
      streamed.find(_._1 == 2L).get._3 == 13.0d, streamed.toString)

    // crash-replay of a micro-batch rewrites identical partials
    CusumMonitor.observeBatch(batch2.toDF("b", "v"), 1L, grid, "b", "v")
    val replayed = rows(CusumMonitor.cusumState(spark, grid,
      10.0, 1.0, 3.0))
    assert(replayed == streamed)

    // a third batch extends the trajectory: the statistic REMEMBERS
    // (drift accumulated before this batch still counts toward alarms)
    CusumMonitor.observeBatch(Seq((6L, 14.0)).toDF("b", "v"), 2L,
      grid, "b", "v")
    val ext = rows(CusumMonitor.cusumState(spark, grid, 10.0, 1.0, 3.0))
    val extTwin = rows(ChangeDetect.cusum(
      (batch1 ++ batch2 :+ ((6L, 14.0))).toDF("b", "v"),
      "b", "v", 10.0, 1.0, 3.0))
    assert(ext == extTwin)

    intercept[IllegalArgumentException](
      CusumMonitor.cusumState(spark, s"$base/never", 10.0, 1.0, 3.0))
    intercept[IllegalArgumentException](CusumMonitor.observeBatch(
      Seq((1L, Option.empty[Double])).toDF("b", "v"), 9L, grid, "b", "v"))
  }

  test("changePoint and seasonal probes serve stream == batch from the same grid") {
    // one persisted state, three detectors: build the monitor grid from
    // two batches that SPLIT a bucket and back-fill late data, then
    // every probe must match its batch twin on the union
    val batch1 = Seq((0L, 10.0), (1L, 10.0), (2L, 10.0), (3L, 28.0))
    val batch2 = Seq((3L, 32.0), (4L, 30.0), (5L, 30.0), (1L, 10.0))
    val base = java.nio.file.Files.createTempDirectory("cusum_probes_").toString
    val grid = s"$base/grid"
    CusumMonitor.observeBatch(batch1.toDF("b", "v"), 0L, grid, "b", "v")
    CusumMonitor.observeBatch(batch2.toDF("b", "v"), 1L, grid, "b", "v")
    val union = (batch1 ++ batch2).toDF("b", "v")

    val cpStream = CusumMonitor.changePointState(spark, grid)
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    val cpBatch = ChangeDetect.changePoint(union, "b", "v")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(cpStream == cpBatch, s"$cpStream vs $cpBatch")
    // the planted step (10 -> 30, split bucket 3 pooled to mean 30)
    assert(cpStream._2 == 2L && cpStream._7 == 20.0d, cpStream.toString)

    val seasStream = CusumMonitor.seasonalState(spark, grid, period = 2)
      .as[(Long, Long, Double)].collect().toSeq
    val seasBatch = ChangeDetect.seasonalDecompose(union, "b", "v", period = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(seasStream == seasBatch, s"$seasStream vs $seasBatch")

    intercept[IllegalArgumentException](
      CusumMonitor.changePointState(spark, s"$base/never"))

    // the Page-Hinkley probe rides the SAME grid: stream == batch
    // bit-for-bit, and the planted 10 -> 30 step alarms at lambda = 5
    val phStream = CusumMonitor.pageHinkleyState(spark, grid,
        delta = 0.0d, lambda = 5.0d)
      .as[(Long, Double, Double, Long)].collect().toSeq
    val phBatch = ChangeDetect.pageHinkley(union, "b", "v",
        delta = 0.0d, lambda = 5.0d)
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(phStream == phBatch, s"$phStream vs $phBatch")
    assert(phStream.exists(_._4 == 1L), phStream.toString)
  }

  test("sprt probe serves stream == batch from the same grid; non-binary grid fails typed") {
    // 0/1 outcome stream split across batches, bucket 2 split too
    val batch1 = Seq((1L, 1.0), (2L, 1.0), (2L, 0.0))
    val batch2 = Seq((2L, 1.0), (3L, 1.0), (4L, 1.0))
    val base = java.nio.file.Files.createTempDirectory("sprtm_").toString
    val grid = s"$base/grid"
    CusumMonitor.observeBatch(batch1.toDF("b", "v"), 0L, grid, "b", "v")
    CusumMonitor.observeBatch(batch2.toDF("b", "v"), 1L, grid, "b", "v")

    val streamed = CusumMonitor.sprtState(spark, grid, 0.2d, 0.8d)
      .as[(Long, Long, Long, Long, Long, Double, String, Option[Long])]
      .collect().toSeq
    val twin = ChangeDetect.sprt(
      (batch1 ++ batch2).toDF("b", "v")
        .selectExpr("b", "cast(v as long) as y"),
      "b", "y", p0 = 0.2d, p1 = 0.8d)
      .as[(Long, Long, Long, Long, Long, Double, String, Option[Long])]
      .collect().toSeq
    assert(streamed == twin, s"streamed $streamed vs twin $twin")
    // bucket 2 pooled across batches: 3 obs, 2 successes
    assert(streamed.find(_._1 == 2L).get._2 == 3L &&
      streamed.find(_._1 == 2L).get._3 == 2L, streamed.toString)

    // a non-binary monitored value cannot serve the SPRT probe
    val grid2 = s"$base/grid2"
    CusumMonitor.observeBatch(Seq((1L, 0.5)).toDF("b", "v"), 0L,
      grid2, "b", "v")
    val e = intercept[IllegalArgumentException](
      CusumMonitor.sprtState(spark, grid2, 0.2d, 0.8d))
    assert(e.getMessage.contains("0/1"), e.getMessage)
  }
}
