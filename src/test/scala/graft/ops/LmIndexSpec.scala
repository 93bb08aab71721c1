package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LmIndexSpec extends SparkSpecBase {
  import spark.implicits._

  test("persisted-model scoring equals the live train/held-out computation") {
    val docs = (Seq.fill(2)((1L, "a b c")) ++ Seq(
      (2L, "b c d"), (3L, "c d a b"),
      (10L, "a b c d x"), (11L, "x b c y"))).toDF("doc_id", "text")
    val live = TextAnalysis.stupidBackoffTrigram(docs, "doc_id", "text",
        col("doc_id") >= 10L)
      .collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("lmix_").toString
    LmIndex.build(docs.filter($"doc_id" < 10L), "text", dir)
    val served = LmIndex.score(spark, dir,
        docs.filter($"doc_id" >= 10L), "doc_id", "text")
      .collect().toSet
    assert(served == live,
      s"persisted != live: missing=${live -- served} extra=${served -- live}")
    // the model tables round-trip through parquet with exact counts
    val live0 = Manifest.livePaths(spark, dir)
    assert(live0.size == 1, s"build commits exactly one delta, got $live0")
    val tri = spark.read.parquet(s"${live0.head}/tri")
      .as[(String, String, String, Long)].collect()
      .map(t => ((t._1, t._2, t._3), t._4)).toMap
    assert(tri(("a", "b", "c")) == 2L, s"$tri")

    // append ≡ one-shot build over the union: counts are additive parts
    val dir2 = java.nio.file.Files.createTempDirectory("lmix2_").toString
    LmIndex.build(docs.filter($"doc_id" < 3L), "text", dir2)
    LmIndex.append(docs.filter($"doc_id" === 3L), "text", dir2)
    val appended = LmIndex.score(spark, dir2,
        docs.filter($"doc_id" >= 10L), "doc_id", "text")
      .collect().toSet
    assert(appended == live,
      s"append != one-shot: missing=${live -- appended} extra=${appended -- live}")
  }

  test("an uncommitted (staged) delta is invisible — a failed append leaves the model unchanged") {
    val docs = Seq((1L, "a b c"), (2L, "b c d"), (10L, "a b c d"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lmix3_").toString
    LmIndex.build(docs.filter($"doc_id" < 10L), "text", dir)
    val before = LmIndex.score(spark, dir,
      docs.filter($"doc_id" >= 10L), "doc_id", "text").collect().toSet
    // simulate a writer that crashed before its atomic promote: a fully
    // written staging directory that never became m_<uuid>
    val (tri, bi, uni) = TextAnalysis.trigramModel(
      docs.filter($"doc_id" >= 10L), "text")
    tri.write.parquet(s"$dir/tmp_dead/tri")
    bi.write.parquet(s"$dir/tmp_dead/bi")
    uni.write.parquet(s"$dir/tmp_dead/uni")
    val after = LmIndex.score(spark, dir,
      docs.filter($"doc_id" >= 10L), "doc_id", "text").collect().toSet
    assert(after == before, "staged tmp_ delta leaked into the served model")
    // …and the same counts promoted properly DO change the model
    LmIndex.append(docs.filter($"doc_id" >= 10L), "text", dir)
    val appended = LmIndex.score(spark, dir,
      docs.filter($"doc_id" >= 10L), "doc_id", "text").collect().toSet
    assert(appended != before)
  }

  test("compact: delta stack merges to ONE delta, serving hash-identical; rebuild is atomic") {
    val docs = (Seq.fill(2)((1L, "a b c")) ++ Seq(
      (2L, "b c d"), (3L, "c d a b"),
      (10L, "a b c d x"), (11L, "x b c y"))).toDF("doc_id", "text")
    val probe = docs.filter($"doc_id" >= 10L)
    val dir = java.nio.file.Files.createTempDirectory("lmix4_").toString
    LmIndex.build(docs.filter($"doc_id" === 1L), "text", dir)
    LmIndex.append(docs.filter($"doc_id" === 2L), "text", dir)
    LmIndex.append(docs.filter($"doc_id" === 3L), "text", dir)
    assert(Manifest.livePaths(spark, dir).size == 3)
    val stacked = LmIndex.score(spark, dir, probe, "doc_id", "text")
      .collect().toSet
    LmIndex.compact(spark, dir)
    val liveAfter = Manifest.livePaths(spark, dir)
    assert(liveAfter.size == 1,
      s"compaction must leave exactly one live delta, got $liveAfter")
    val compacted = LmIndex.score(spark, dir, probe, "doc_id", "text")
      .collect().toSet
    assert(compacted == stacked, "compacted serving diverged from the stack")
    // compact again: no-op on a single delta (same manifest version)
    val v = Manifest.current(spark, dir).version
    LmIndex.compact(spark, dir)
    assert(Manifest.current(spark, dir).version == v)

    // atomic REBUILD: build() over new data replaces the list in one
    // pointer flip; the dropped deltas are still on disk (age-gated gc),
    // so a reader holding the old snapshot keeps working
    val oldPaths = liveAfter
    LmIndex.build(docs.filter($"doc_id" < 10L), "text", dir)
    assert(Manifest.livePaths(spark, dir).size == 1)
    assert(oldPaths.forall(p =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "just-unreferenced delta must survive until age-gated gc")
  }

  test("time travel: scoreAt(pre-append version) ≡ a model that never saw the append") {
    val docs = (Seq.fill(2)((1L, "a b c")) ++ Seq(
      (2L, "b c d"), (3L, "c d a b"),
      (10L, "a b c d x"), (11L, "x b c y"))).toDF("doc_id", "text")
    val probe = docs.filter($"doc_id" >= 10L)
    val dir = java.nio.file.Files.createTempDirectory("lmix5_").toString
    LmIndex.build(docs.filter($"doc_id" < 3L), "text", dir)    // v1
    val preAppend = LmIndex.score(spark, dir, probe, "doc_id", "text")
      .collect().toSet
    LmIndex.append(docs.filter($"doc_id" === 3L), "text", dir) // v2
    // AS OF v1: identical to the pre-append serving; AS OF v2 ≡ current
    val atV1 = LmIndex.scoreAt(spark, dir, 1L, probe, "doc_id", "text")
      .collect().toSet
    assert(atV1 == preAppend, "time-travel read diverged from the v1 model")
    val atV2 = LmIndex.scoreAt(spark, dir, 2L, probe, "doc_id", "text")
      .collect().toSet
    val current = LmIndex.score(spark, dir, probe, "doc_id", "text")
      .collect().toSet
    assert(atV2 == current)
    assert(atV1 != atV2, "the append must change the served scores")
    intercept[IllegalArgumentException] {
      LmIndex.scoreAt(spark, dir, 9L, probe, "doc_id", "text")
    }
  }
}
