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

  test("near-dup ingest: a restarted stream routes a NEAR-duplicate (not byte-equal) doc to its existing cluster") {
    implicit val sqlCtx = spark.sqlContext
    val textA = "the quick brown fox jumps over the lazy dog today"
    val textB = "a completely different second document with other words here"
    val textA2 = "the quick brown fox jumps over the lazy dog tonight" // near-dup of A
    val textC = "the third novel document talks about spark shuffles at scale"
    val textC2 = "the third novel document talks about spark shuffles at night" // near-dup of C
    val mem = MemoryStream[Doc]
    val (ix, out, ck) = dirs()
    def start() = CurationIngest.nearDupAppend(
      mem.toDF(), "doc_id", "text", ix, out, ck)

    mem.addData(Doc(1L, textA), Doc(2L, textB))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).select($"doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L))

    // RESTARTED stream: 10 is a near-dup of admitted 1 (one word differs —
    // the exact-fingerprint tier cannot catch it); 11 is novel; 12 is a
    // within-batch near-dup of 11
    mem.addData(Doc(10L, textA2), Doc(11L, textC), Doc(12L, textC2))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = spark.read.parquet(out).select($"doc_id").as[Long].collect().sorted
    assert(all.toSeq == Seq(1L, 2L, 11L),
      s"near-dups must be rejected, one rep per novel cluster kept: ${all.toSeq}")

    // cluster ROUTING: the rejected near-dup is labeled with its corpus
    // twin's cluster, the within-batch loser with its kept rep's
    val wLatest = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"batch".desc)
    val labels = spark.read.parquet(s"$ix/labels")
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(wLatest))
      .filter($"_rn" === 1)
      .select($"id".as[Long], $"component".as[Long]).collect().toMap
    assert(labels(10L) == labels(1L),
      s"near-dup 10 must land in doc 1's cluster: $labels")
    assert(labels(12L) == labels(11L),
      s"within-batch near-dup 12 must land in doc 11's cluster: $labels")
    assert(labels(2L) != labels(1L))

    // batch twin: the incremental two-batch labeling equals a ONE-SHOT
    // from-scratch candidates+components solve over the union corpus
    // (the oracle-gated q65/q172 kernels with identical parameters)
    val union = Seq((1L, textA), (2L, textB), (10L, textA2), (11L, textC),
      (12L, textC2)).toDF("doc_id", "text")
    val bbU = graft.ops.Dedup.bandedSignatures(union, "doc_id", "text")
    val pairsU = graft.ops.Dedup.incrementalCandidates(bbU, bbU, "doc_id")
      .filter($"batch_id" < $"corpus_id")
      .select($"batch_id".as("a_id"), $"corpus_id".as("b_id"))
    val ccU = graft.ops.Components.connectedComponents(pairsU)
      .select($"id".as[Long], $"component".as[Long]).collect().toMap
    val scratch = Seq(1L, 2L, 10L, 11L, 12L)
      .map(i => i -> ccU.getOrElse(i, i)).toMap
    assert(labels == scratch,
      s"incremental labeling diverged from from-scratch: $labels vs $scratch")
  }

  test("near-dup ingest: a replayed micro-batch reproduces its output and labels byte-for-byte") {
    val textA = "the quick brown fox jumps over the lazy dog today"
    val textA2 = "the quick brown fox jumps over the lazy dog tonight"
    val textB = "a completely different second document with other words here"
    val (ix, out, _) = dirs()
    val b0 = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    CurationIngest.processBatchNearDup(b0, 0L, "doc_id", "text", ix, out)
    val b1 = Seq((10L, textA2)).toDF("doc_id", "text")
    CurationIngest.processBatchNearDup(b1, 1L, "doc_id", "text", ix, out)
    def state() = (
      spark.read.parquet(out).select($"doc_id").as[Long].collect().sorted.toSeq,
      spark.read.parquet(s"$ix/labels").select($"id", $"component", $"batch")
        .as[(Long, Long, Long)].collect().sorted.toSeq,
      spark.read.parquet(s"$ix/sigs").select($"doc_id", $"batch")
        .as[(Long, Long)].collect().sorted.toSeq)
    val before = state()
    assert(before._1 == Seq(1L, 2L), s"near-dup 10 must be rejected: $before")
    // crash-replay of the LAST batch (the only batch Structured
    // Streaming ever re-runs: crash between state writes and checkpoint
    // commit) — every read excludes batch 1's own partitions, so the
    // replay reproduces identical files
    CurationIngest.processBatchNearDup(b1, 1L, "doc_id", "text", ix, out)
    assert(state() == before,
      s"replay must be idempotent:\n${state()}\nvs\n$before")
  }

  test("streaming funnel monitor: per-batch stats sum EXACTLY to the batch funnel; replay idempotent") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val rows1 = Seq((1L, true, true), (2L, false, true), (3L, true, false))
    val rows2 = Seq((4L, false, false), (5L, true, true))
    val gates = Seq("ga" -> col("a"), "gb" -> col("b"))
    val base = java.nio.file.Files.createTempDirectory("funnel_").toString
    val (stats, ck) = (s"$base/stats", s"$base/ckpt")
    val mem = MemoryStream[(Long, Boolean, Boolean)]
    mem.addData(rows1: _*)
    def sig() = mem.toDF().toDF("id", "a", "b")
    val q1 = CurationIngest.funnelMonitor(sig(), gates, stats, ck)
    try q1.processAllAvailable() finally q1.stop()
    mem.addData(rows2: _*)
    val q2 = CurationIngest.funnelMonitor(sig(), gates, stats, ck)
    try q2.processAllAvailable() finally q2.stop()
    def totals() = CurationIngest.funnelTotals(spark, stats)
      .orderBy("stage")
      .select("stage", "gate", "n_in", "n_rejected", "n_out", "reject_share")
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
    // the whole-corpus funnel over the union — attribution is row-local,
    // so the per-batch sums must reproduce it EXACTLY
    val batch = graft.ops.Curation.filterFunnel(
        (rows1 ++ rows2).toDF("id", "a", "b"), gates)
      .orderBy("stage")
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
      // reject_share differs: the batch twin divides once over the union,
      // totals recompute from summed counts — same counts, same shares
    assert(totals().map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      batch.map(t => (t._1, t._2, t._3, t._4, t._5)),
      s"streamed ${totals()} vs batch $batch")
    assert(totals().map(_._6) == batch.map(_._6))
    // crash-replay of the last micro-batch rewrites identical rows
    val before = totals()
    CurationIngest.funnelStatsBatch(rows2.toDF("id", "a", "b"), 1L, gates, stats)
    assert(totals() == before, "replayed funnel batch must be idempotent")
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
