package graft.streaming

import graft.SparkSpecBase
import graft.ops.Spectral
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class IsotropyMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) = df
    .as[(Long, Long, Double, Double)].collect().toSeq

  test("stream == batch across micro-batch boundaries, replay, extension") {
    implicit val sqlCtx = spark.sqlContext
    // the orthogonal-cross corpus split across two micro-batches
    val batch1 = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
    val batch2 = Seq((3L, Array(-1f, 0f)), (4L, Array(0f, -1f)))
    val base = java.nio.file.Files.createTempDirectory("iso_").toString
    val (st, ck) = (s"$base/state", s"$base/ckpt")

    val mem = MemoryStream[(Long, Array[Float])]
    mem.addData(batch1: _*)
    val q1 = IsotropyMonitor.isotropyMonitor(
      mem.toDF().toDF("id", "embedding"), st, "embedding", ck)
    try q1.processAllAvailable() finally q1.stop()
    mem.addData(batch2: _*)
    val q2 = IsotropyMonitor.isotropyMonitor(
      mem.toDF().toDF("id", "embedding"), st, "embedding", ck)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = row(IsotropyMonitor.isotropyState(spark, st))
    val twin = row(Spectral.isotropy(
      (batch1 ++ batch2).toDF("id", "embedding"), "embedding"))
    assert(streamed == twin, s"streamed $streamed vs twin $twin")
    assert(streamed == Seq((4L, 2L, 1.0d, -0.333333d)), streamed.toString)

    // crash-replay of a micro-batch rewrites the identical partial
    IsotropyMonitor.observeBatch(batch2.toDF("id", "embedding"), 1L,
      st, "embedding")
    assert(row(IsotropyMonitor.isotropyState(spark, st)) == streamed)

    // a third batch of clones pulls the mean cosine up — the monitor
    // tracks the union exactly
    val batch3 = Seq((5L, Array(1f, 0f)), (6L, Array(1f, 0f)))
    IsotropyMonitor.observeBatch(batch3.toDF("id", "embedding"), 2L,
      st, "embedding")
    val ext = row(IsotropyMonitor.isotropyState(spark, st))
    val extTwin = row(Spectral.isotropy(
      (batch1 ++ batch2 ++ batch3).toDF("id", "embedding"), "embedding"))
    assert(ext == extTwin, s"ext $ext vs twin $extTwin")

    intercept[IllegalArgumentException](
      IsotropyMonitor.isotropyState(spark, s"$base/never"))
  }

  test("ragged vector lengths across batches fail typed at probe") {
    val base = java.nio.file.Files.createTempDirectory("iso_rag_").toString
    val st = s"$base/state"
    IsotropyMonitor.observeBatch(
      Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
        .toDF("id", "embedding"), 0L, st, "embedding")
    IsotropyMonitor.observeBatch(
      Seq((3L, Array(1f, 0f, 0f))).toDF("id", "embedding"),
      1L, st, "embedding")
    val e = intercept[IllegalArgumentException](
      IsotropyMonitor.isotropyState(spark, st))
    assert(e.getMessage.contains("ragged"), e.getMessage)
    // zero-vector batches are rejected BEFORE persisting
    intercept[IllegalArgumentException](IsotropyMonitor.observeBatch(
      Seq((9L, Array(0f, 0f))).toDF("id", "embedding"), 2L,
      st, "embedding"))
  }
}
