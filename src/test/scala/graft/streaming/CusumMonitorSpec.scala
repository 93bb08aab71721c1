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
}
