package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark join shuffle makes the query fast"),
    (1L, "a vector index scan beats a full scan"),
    (2L, "the shuffle partition key drives the join"),
    (3L, "window agg over a stream batch"),
    (4L, "completely unrelated prose about gardening roses")
  ).toDF("doc_id", "text")

  private val queries = Seq(
    (0L, "spark join shuffle"),
    (1L, "vector index scan"))

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ti_spec").toFile
    d.deleteOnExit(); d.toString
  }

  test("index-backed BM25 equals the from-scratch computation exactly") {
    val path = tmp()
    TextIndex.writeIndex(docs, "doc_id", "text", path, buckets = 8)
    val served = TextIndex.probeIndex(spark, path, "doc_id", queries, buckets = 8)
      .select($"q_id", $"doc_id", $"sum_micro", $"bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    val qdf = queries.toDF("q_id", "qtext")
      .select($"q_id", explode(split(Dedup.normText($"qtext"), " ")).as("token"))
    val scratch = TextAnalysis.bm25(docs, "doc_id", "text", qdf)
      .select($"q_id", $"doc_id", $"sum_micro", $"bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(served == scratch, s"served=$served\nscratch=$scratch")
    assert(served.nonEmpty)
  }

  test("driver-side termBucket matches the Column twin for every corpus token") {
    val toks = docs.select(explode(TextAnalysis.tokens($"text")).as("t"))
      .filter(length($"t") > 0)
      .withColumn("b", TextIndex.termBucketCol($"t", 8))
      .as[(String, Long)].collect()
    toks.foreach { case (t, b) =>
      assert(TextIndex.termBucket(t, 8) == b, s"token '$t'")
    }
  }

  test("probe scan reads only the probe terms' bucket partitions") {
    val path = tmp()
    TextIndex.writeIndex(docs, "doc_id", "text", path, buckets = 8)
    val plan = TextIndex.probeIndex(spark, path, "doc_id",
        Seq((0L, "spark")), buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"bucket literals must reach the scan as partition filters:\n$plan")
  }

  test("build + append serves identically to a one-shot full build") {
    val split = tmp(); val full = tmp()
    TextIndex.writeIndex(docs.filter($"doc_id" < 3), "doc_id", "text",
      split, buckets = 8)
    TextIndex.appendToIndex(docs.filter($"doc_id" >= 3), "doc_id", "text",
      split, buckets = 8)
    TextIndex.writeIndex(docs, "doc_id", "text", full, buckets = 8)
    def serve(p: String) =
      TextIndex.probeIndex(spark, p, "doc_id", queries, buckets = 8)
        .select($"q_id", $"doc_id", $"sum_micro", $"bm25")
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(serve(split) == serve(full))
    assert(serve(split).nonEmpty)
  }

  test("compact merges the delta stack to ONE delta; serving is identical") {
    val path = tmp()
    TextIndex.writeIndex(docs.filter($"doc_id" < 2), "doc_id", "text",
      path, buckets = 8)
    TextIndex.appendToIndex(docs.filter($"doc_id" === 2), "doc_id", "text",
      path, buckets = 8)
    TextIndex.appendToIndex(docs.filter($"doc_id" >= 3), "doc_id", "text",
      path, buckets = 8)
    assert(Manifest.livePaths(spark, path).size == 3)
    def serve() =
      TextIndex.probeIndex(spark, path, "doc_id", queries, buckets = 8)
        .select($"q_id", $"doc_id", $"sum_micro", $"bm25")
        .as[(Long, Long, Long, Double)].collect().toSet
    val stacked = serve()
    TextIndex.compact(spark, path, "doc_id", buckets = 8)
    assert(Manifest.livePaths(spark, path).size == 1,
      "compaction must leave exactly one live delta")
    assert(serve() == stacked, "compacted serving diverged from the stack")
    // and the compacted index still equals the from-scratch computation
    val qdf = queries.toDF("q_id", "qtext")
      .select($"q_id", explode(split(Dedup.normText($"qtext"), " ")).as("token"))
    val scratch = TextAnalysis.bm25(docs, "doc_id", "text", qdf)
      .select($"q_id", $"doc_id", $"sum_micro", $"bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(serve() == scratch)
  }

  test("time travel: probeIndexAt(pre-append version) ≡ an index that never saw the append") {
    val split = tmp(); val historic = tmp()
    TextIndex.writeIndex(docs.filter($"doc_id" < 3), "doc_id", "text",
      split, buckets = 8)                                           // v1
    TextIndex.appendToIndex(docs.filter($"doc_id" >= 3), "doc_id", "text",
      split, buckets = 8)                                           // v2
    TextIndex.writeIndex(docs.filter($"doc_id" < 3), "doc_id", "text",
      historic, buckets = 8)
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select($"q_id", $"doc_id", $"sum_micro", $"bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    val atV1 = collect(TextIndex.probeIndexAt(spark, split, 1L, "doc_id",
      queries, buckets = 8))
    val fresh = collect(TextIndex.probeIndex(spark, historic, "doc_id",
      queries, buckets = 8))
    assert(atV1 == fresh, "v1 snapshot diverged from the historic rebuild")
    val atV2 = collect(TextIndex.probeIndexAt(spark, split, 2L, "doc_id",
      queries, buckets = 8))
    val current = collect(TextIndex.probeIndex(spark, split, "doc_id",
      queries, buckets = 8))
    assert(atV2 == current)
    assert(atV1 != atV2, "the append must change df/dl stats and scores")
    intercept[IllegalArgumentException] {
      TextIndex.probeIndexAt(spark, split, 7L, "doc_id", queries, buckets = 8)
    }
  }

  test("versionDiff: the appended batch reads back as 'added'; unchanged docs as 'same'") {
    val path = tmp()
    TextIndex.writeIndex(docs.filter($"doc_id" < 3), "doc_id", "text",
      path, buckets = 8)                                           // v1
    TextIndex.appendToIndex(docs.filter($"doc_id" >= 3), "doc_id", "text",
      path, buckets = 8)                                           // v2
    val diff = TextIndex.versionDiff(spark, path, 1L, 2L, "doc_id")
      .as[(Long, Long, String)].collect().toSet
    val added = diff.filter(_._3 == "added").map(_._1)
    assert(added == Set(3L, 4L), diff.toString)
    assert(diff.filter(_._3 == "same").map(_._1) == Set(0L, 1L, 2L))
    assert(!diff.exists(d => d._3 == "removed" || d._3 == "changed"))
    // reversed direction: the same docs read as removed
    val rev = TextIndex.versionDiff(spark, path, 2L, 1L, "doc_id")
      .as[(Long, Long, String)].collect().toSet
    assert(rev.filter(_._3 == "removed").map(_._1) == Set(3L, 4L))
    intercept[IllegalArgumentException] {
      TextIndex.versionDiff(spark, path, 1L, 9L, "doc_id").collect()
    }
  }

  test("probeIndex rejects queries with no tokens") {
    intercept[IllegalArgumentException] {
      TextIndex.probeIndex(spark, "/nonexistent", "doc_id", Seq((0L, "   ")))
    }
  }
}
