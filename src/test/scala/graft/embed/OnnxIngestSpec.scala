package graft.embed

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Collection
import org.apache.spark.sql.functions._

/** End-to-end ONNX ingest: the FULL Collection.create path (embed via
  * mapPartitions → parquet persist → catalog) running [[OnnxEmbedder]]
  * under an injected fake [[OnnxSession]] factory — so the per-partition
  * lifecycle (closure serialization, executor-side session create-once,
  * batch padding) is exercised by REAL task execution, not just the unit
  * surface of embedBatch. Only the `new OrtSession(...)` line of a live
  * build is absent; everything else is this code path. */
class OnnxIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (s"id$i", s"document number $i with shared words", Seq.empty[String]))
      .toDF("id", "document", "metadata")

  test("Collection.create ingests through OnnxEmbedder: one session per JVM, correct vectors") {
    val wh = Files.createTempDirectory("graft_onnx_wh_").toString
    val dim = 8
    // unique modelDir isolates this spec's cache slot from other specs
    val modelDir = s"/fake/ingest-${java.util.UUID.randomUUID()}"
    val emb = OnnxEmbedder(modelDir, dim = dim, factory = new FakeOnnx.Factory(dim))

    val created0 = FakeOnnx.created.get()
    val runs0 = FakeOnnx.runs.get()

    // 8 partitions force 8 task closures; the JVM-wide cache must still
    // create exactly ONE session (local[n] = one executor JVM; on a real
    // cluster this is one per executor, by the same mechanism)
    val coll = Collection.create(spark, wh, "onnx_ingest",
      docs(40).repartition(8), emb, modelType = "onnx")
    val persisted = spark.read.parquet(coll.info.path)
    assert(persisted.count() == 40)
    assert(FakeOnnx.created.get() - created0 == 1L,
      "exactly one session for 8 partitions of tasks")
    assert(FakeOnnx.runs.get() - runs0 >= 8L,
      "every non-empty partition must have run at least one batch")

    // vectors are the real tokenize -> pad -> run -> normalize output:
    // replay driver-side (batchSize 100 >> rows/partition, and every doc
    // here tokenizes to the same length, so padding never distorts)
    val got = persisted.select($"id", $"embedding")
      .as[(String, Array[Float])].collect().toMap
    docs(40).as[(String, String, Seq[String])].collect().foreach { case (id, text, _) =>
      val want = OnnxEmbedder.l2Normalize(
        FakeOnnx.vector(OnnxEmbedder.tokenize(text), dim))
      assert(got(id).toSeq == want.toSeq, s"vector mismatch for $id")
    }

    // the query path reuses the SAME cached session (no new create):
    // driver-side embedBatch for the probe + distributed cosine
    val res = coll.cosineQuery("document number 3", emb, 5)
    assert(res.count() == 5)
    assert(FakeOnnx.created.get() - created0 == 1L,
      "query-time embedding must reuse the cached session")
  }

  test("ragged partitions pad per batch; empty partitions create no session work") {
    val dim = 8
    val modelDir = s"/fake/ragged-${java.util.UUID.randomUUID()}"
    val emb = OnnxEmbedder(modelDir, dim = dim, factory = new FakeOnnx.Factory(dim))
    // texts of very different token lengths in ONE partition -> one
    // rectangular padded batch; replay must use the batch max length
    val texts = Seq("a", "one two three four five six", "mid size text")
    val df = texts.zipWithIndex.map { case (t, i) => (s"d$i", t) }
      .toDF("id", "document").coalesce(1)
    val out = graft.embed.Embed.withEmbedding(df, "document", "embedding", emb)
      .select($"id", $"embedding").as[(String, Array[Float])].collect().toMap
    val ids = texts.map(OnnxEmbedder.tokenize)
    val maxLen = ids.map(_.length).max
    texts.zipWithIndex.foreach { case (_, i) =>
      val want = OnnxEmbedder.l2Normalize(
        FakeOnnx.vector(java.util.Arrays.copyOf(ids(i), maxLen), dim))
      assert(out(s"d$i").toSeq == want.toSeq, s"padded replay mismatch for d$i")
    }
  }
}
