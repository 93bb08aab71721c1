package graft.streaming

import graft.SparkSpecBase
import graft.ops.LmIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class LmGateSpec extends SparkSpecBase {
  import spark.implicits._

  case class Doc(doc_id: Long, text: String)

  // in-domain prose the model trains on vs token-salad it never saw
  private val domain = Seq.fill(6)("the quick brown fox jumps over the lazy dog")
  private val inDom = "the quick brown fox jumps"
  private val junk = "zx qq vv kk pp ww"

  private def trainedModel(): String = {
    val dir = java.nio.file.Files.createTempDirectory("lmgate_model_").toString
    LmIndex.build(domain.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), "text", dir)
    dir
  }

  test("streamed gate keeps in-domain docs, drops junk and unscorable shorts; scores match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val model = trainedModel()
    val base = java.nio.file.Files.createTempDirectory("lmgate_").toString
    val mem = MemoryStream[Doc]
    mem.addData(
      Doc(10L, inDom),  // seen trigrams → high avg_logprob → passes
      Doc(11L, junk),   // all-backoff unigram floor → far below gate
      Doc(12L, "ab"))   // < 3 tokens: no trigram evidence → cannot pass
    val q = LmGate.gatedAppend(mem.toDF(), "doc_id", "text", model,
      s"$base/out", s"$base/ckpt", minAvgLogprob = -3.0)
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$base/out")
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(10L), s"gate survivors wrong: $out")
    // the streamed score IS the batch serving score (twin proof)
    val batchScore = LmIndex.score(spark, model,
        Seq((10L, inDom)).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].head()
    assert(out(10L) == batchScore._2, s"stream ${out(10L)} != batch $batchScore")
    // and the junk doc really scored below the gate, not NaN/missing
    val junkScore = LmIndex.score(spark, model,
        Seq((11L, junk)).toDF("doc_id", "text"), "doc_id", "text")
      .select($"avg_logprob").as[Double].head()
    assert(junkScore < -3.0, s"junk must score below the gate: $junkScore")
  }

  test("a replayed micro-batch rewrites identical output (exactly-once)") {
    val model = trainedModel()
    val base = java.nio.file.Files.createTempDirectory("lmgate_rp_").toString
    val batch = Seq((1L, inDom), (2L, junk)).toDF("doc_id", "text")
    LmGate.processBatch(batch, 7L, "doc_id", "text", model,
      s"$base/out", minAvgLogprob = -3.0)
    val first = spark.read.parquet(s"$base/out/batch=7")
      .orderBy($"doc_id").collect().toSeq
    LmGate.processBatch(batch, 7L, "doc_id", "text", model,
      s"$base/out", minAvgLogprob = -3.0)
    val second = spark.read.parquet(s"$base/out/batch=7")
      .orderBy($"doc_id").collect().toSeq
    assert(first == second && first.map(_.getLong(0)) == Seq(1L))
  }
}
