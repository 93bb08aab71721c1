package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CurationIngestSpec extends SparkSpecBase {
  import spark.implicits._

  case class Doc(doc_id: Long, text: String)

  // passes the (minWords = 5) gopher gate: 6 words, sane lengths, stopword
  private val good = "the quick brown fox jumps with"
  private val goodB = "the other valid document text with words"

  private def dirs() = {
    val base = java.nio.file.Files.createTempDirectory("curation_").toString
    (s"$base/index", s"$base/out", s"$base/ckpt")
  }

  test("curation ingest: quality gate, PII redaction, cross-batch dedup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val (ix, out, ck) = dirs()
    def start() = CurationIngest.curatedAppend(
      mem.toDF(), "doc_id", "text", ix, out, ck)

    // AvailableNow snapshots offsets at start — enqueue BEFORE starting
    mem.addData(
      Doc(1L, good),
      Doc(2L, "short junk"),                       // fails word-count rule
      Doc(3L, good),                               // within-batch dup of 1
      Doc(4L, s"$goodB mail bob@example.com here")) // PII → redacted
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val round1 = spark.read.parquet(out)
      .select($"doc_id", $"redacted", $"n_redacted")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(round1.map(_._1).toSeq == Seq(1L, 4L), s"survivors wrong: ${round1.toSeq}")
    assert(round1(1)._2.contains("<EMAIL>") && round1(1)._3 == 1L,
      s"PII must be redacted: ${round1(1)}")

    // second batch on a RESTARTED query: doc 5 duplicates doc 1's text —
    // the persisted fingerprint index must drop it; doc 6 is new
    mem.addData(Doc(5L, good), Doc(6L, goodB))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = spark.read.parquet(out).select($"doc_id").as[Long].collect().sorted
    assert(all.toSeq == Seq(1L, 4L, 6L),
      s"cross-batch dup must be dropped, new doc kept: ${all.toSeq}")
    // the index carries exactly the distinct fingerprints
    assert(spark.read.parquet(ix).distinct().count() == 3L)
  }

  test("a replayed micro-batch reproduces its output (crash between index write and checkpoint commit)") {
    // the partial-failure window: the batch's fingerprints land in
    // indexDir/batch=<id>, THEN the job dies before the streaming
    // checkpoint commits — Structured Streaming re-runs the same batch
    // id with the same data. The index read must exclude the batch's
    // own partition, or the replay sees its own fingerprints, drops
    // every doc, and overwrites the output partition as empty (docs
    // permanently lost, never re-admittable).
    val (ix, out, _) = dirs()
    val b0 = Seq((1L, good), (2L, goodB)).toDF("doc_id", "text")
    CurationIngest.processBatch(b0, 0L, "doc_id", "text", ix, out)
    val first = spark.read.parquet(s"$out/batch=0")
      .select($"doc_id").as[Long].collect().sorted
    assert(first.toSeq == Seq(1L, 2L))
    // replay of the SAME batch id
    CurationIngest.processBatch(b0, 0L, "doc_id", "text", ix, out)
    val replay = spark.read.parquet(s"$out/batch=0")
      .select($"doc_id").as[Long].collect().sorted
    assert(replay.toSeq == Seq(1L, 2L),
      s"replay must reproduce the original batch, got ${replay.toSeq}")
    // a LATER batch still dedups against batch 0's fingerprints
    val b1 = Seq((3L, good), (4L, s"$goodB indeed")).toDF("doc_id", "text")
    CurationIngest.processBatch(b1, 1L, "doc_id", "text", ix, out)
    val second = spark.read.parquet(s"$out/batch=1")
      .select($"doc_id").as[Long].collect().sorted
    assert(second.toSeq == Seq(4L),
      s"cross-batch dedup must still hold after replay: ${second.toSeq}")
  }

  test("curation ingest works on an empty first index (no prior state)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val (ix, out, ck) = dirs()
    mem.addData(Doc(9L, good))
    val q = CurationIngest.curatedAppend(mem.toDF(), "doc_id", "text", ix, out, ck)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).count() == 1L)
  }
}
