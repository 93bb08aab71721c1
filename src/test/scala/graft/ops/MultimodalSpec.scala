package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", Multimodal.mediaMetaType)))

  private def mediaDf() = {
    val rows = Seq(
      Row(0L, Array.tabulate(256)(_.toByte), Row("image", "image/png", 16, 16, null)),
      Row(1L, Array.fill[Byte](64)(0), Row("audio", "audio/wav", null, null, 1000L)),
      Row(2L, Array.empty[Byte], Row("video", "video/mp4", 8, 8, 42L)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("withFeatures adds a 16-bin histogram per payload") {
    val got = Multimodal.withFeatures(mediaDf(), "payload").collect()
      .map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Float]]("features")).toMap
    assert(got.values.forall(_.length == 16))
    // uniform byte coverage → uniform histogram
    assert(got(0L).forall(v => math.abs(v - 1f / 16) < 1e-6))
    // all-zero payload → all mass in bin 0
    assert(got(1L).head == 1f && got(1L).tail.forall(_ == 0f))
    // empty payload → zero vector (no NaN)
    assert(got(2L).forall(_ == 0f))
  }

  test("sampleChunks takes every stride-th chunk") {
    val payload = Array.tabulate(100)(_.toByte)
    val chunks = Multimodal.sampleChunks(payload, chunkSize = 10, stride = 3)
    assert(chunks.length == 4) // chunks 0,3,6,9
    assert(chunks.head.sameElements(payload.slice(0, 10)))
    assert(chunks(1).sameElements(payload.slice(30, 40)))
  }

  test("layout columns: modality + log2 size bucket") {
    val got = Multimodal.withLayoutColumns(mediaDf(), "payload", "meta")
      .select("media_id", "modality", "size_bucket")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((0L, "image", 8), (1L, "audio", 6), (2L, "video", 0)))
  }

  test("withFrameFeatures explodes sampled chunks with original frame indices") {
    import spark.implicits._
    val payload = Array.tabulate(100)(_.toByte)
    val df = Seq((7L, payload)).toDF("media_id", "payload")
    val frames = Multimodal.withFrameFeatures(df, "payload",
        chunkSize = 10, stride = 3)
      .select($"media_id", $"frame_idx", $"frame_features")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    // 10 chunks, stride 3 → frames 0, 3, 6, 9
    assert(frames.map(_._2).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_._1 == 7L))
    // each frame's features equal the stub decode of exactly that chunk
    frames.foreach { case (_, i, feats) =>
      val expect = Multimodal.decodeStub(payload.slice(i * 10, (i + 1) * 10))
      assert(feats == expect.toSeq, s"frame $i")
    }
    // null payloads produce no frames
    val withNull = Seq((8L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    assert(Multimodal.withFrameFeatures(withNull, "payload").count() == 0L)
  }
}
