package graft.ops

import graft.SparkSpecBase

class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("chains collapse transitively to the min id") {
    // components: {1,2,3,4} via chain, {10,11}, singleton edges none
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val got = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("star and cycle shapes converge") {
    val pairs = Seq((5L, 1L), (5L, 2L), (5L, 3L), // star centered at 5
      (20L, 21L), (21L, 22L), (22L, 20L))          // cycle
      .toDF("a_id", "b_id")
    val got = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got(5L) == 1L && got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(20L) == 20L && got(21L) == 20L && got(22L) == 20L)
  }

  test("dropNearDuplicates keeps one representative per cluster") {
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val kept = Components.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L)) // 2,3 fold into 1; 6 into 5; 4 untouched
  }

  test("end-to-end: minhash candidates -> components -> dedup") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
      (2L, "the quick brown fox jumps over the lazy dog today"),   // near dup
      (3L, "completely different text about spark and parquet files"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidates(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id")
    val kept = Components.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(3L))
    assert(kept.contains(0L))
    assert(!kept.contains(1L)) // exact dup folded
  }
}
