package graft.streaming

import graft.SparkSpecBase
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental dedup in streaming form: arriving micro-batches are checked
  * against a STATIC prebuilt corpus index (stream-static join — the shape
  * that scales: the corpus index is loaded once and never recomputed per
  * batch). Exact-match path here; the sketch path's batch form is
  * oracle-checked as q65. */
class IncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("stream-static anti-join drops docs whose fingerprint exists in the corpus") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_incdedup_ck_").toString
    // existing corpus: fingerprints of already-ingested documents
    val corpusFps = Seq("the quick brown fox", "hello world")
      .toDF("text").select(Dedup.fingerprint($"text").as("fp"))
    val mem = MemoryStream[(Long, String)]
    val fresh = mem.toDF().toDF("id", "text")
      .withColumn("fp", Dedup.fingerprint($"text"))
      .join(corpusFps, Seq("fp"), "left_anti") // stream-static: corpus never recomputed
    val q = fresh.writeStream.format("memory").queryName("inc_dedup")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    mem.addData(
      (1L, "Hello   WORLD"), // normalizes to a corpus duplicate — dropped
      (2L, "a genuinely new document"),
      (3L, "THE QUICK  brown fox"), // corpus duplicate — dropped
      (4L, "another new one"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("inc_dedup").select("id").as[Long].collect().toSet
    assert(out == Set(2L, 4L), s"expected only the new docs, got $out")
  }

  test("batch near-dup anti-join: dedupBatchAgainstCorpus keeps only novel docs") {
    val corpus = Seq(
      (10L, "spark shuffles data between executors during wide transformations"),
      (11L, "broadcast joins avoid shuffling the small side entirely"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of 10 (same shingles, one word changed at the end)
      (20L, "spark shuffles data between executors during wide operations"),
      (21L, "columnar formats enable vectorized reads and predicate pushdown"))
      .toDF("doc_id", "text")
    val corpusIdx = Dedup.bandedSignatures(corpus, "doc_id", "text", w = 2)
    val kept = Dedup.dedupBatchAgainstCorpus(batch, "doc_id", "text",
        corpusIdx, w = 2, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(21L), s"near-dup of corpus doc must be dropped, got $kept")
  }
}
