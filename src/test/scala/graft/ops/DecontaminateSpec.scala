package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  private val evalDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight"),
    (101L, "pack my box with five dozen liquor jugs right now ok"))

  test("contamination counts overlapping n-grams exactly") {
    // train doc 1 embeds eval doc 100's text verbatim (fully contaminated
    // span); doc 2 shares nothing; doc 3 is shorter than n tokens
    val train = Seq(
      (1L, "prefix words " + evalDocs.head._2 + " suffix words"),
      (2L, "completely different content about spark partitions and shuffles ok"),
      (3L, "too short")).toDF("id", "text")
    val eval = evalDocs.toDF("id", "text")
    val got = Decontaminate.contamination(train, eval, "id", "text", n = 5)
      .orderBy($"id")
      .as[(Long, Long, Long, Double)].collect()

    // doc 1: tokens = 2 + 10 + 2 = 14 -> 10 distinct 5-grams; the eval doc's
    // 10 tokens give 6 5-grams, all of which appear among doc 1's (positions
    // 3..8 of doc 1's grid)
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    val (_, n1, h1, f1) = got(0)
    assert(n1 == 10L && h1 == 6L && f1 == 0.6d)
    val (_, n2, h2, f2) = got(1)
    assert(n2 == 5L && h2 == 0L && f2 == 0.0d) // 9 tokens -> 5 distinct 5-grams
  }

  test("contaminationSources attributes each train doc to its top-overlap eval doc, ties to smallest id") {
    // train doc 1 embeds eval 100 verbatim (6 shared 5-grams) and also a
    // 5-token span of eval 101 (1 shared 5-gram) -> attributed to 100;
    // train doc 2 shares exactly one 5-gram with EACH eval doc -> tie on
    // n_shared=1, must attribute to the smaller id 100; doc 3 no overlap
    val train = Seq(
      (1L, "prefix words " + evalDocs.head._2 + " then pack my box with five ok"),
      (2L, "quick brown fox jumps over nothing and box with five dozen liquor maybe"),
      (3L, "completely different content about spark partitions and shuffles ok")
    ).toDF("id", "text")
    val eval = evalDocs.toDF("id", "text")
    val got = Decontaminate.contaminationSources(train, eval, "id", "text", n = 5)
      .orderBy($"id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L), s"doc 3 must not appear: $got")
    val byId = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L)._1 == 100L && byId(1L)._2 >= 6L, s"doc 1: $got")
    assert(byId(2L) == ((100L, 1L)), s"tie must break to eval 100: $got")
  }

  test("identical train and eval text is 100% contaminated") {
    val d = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("id", "text")
    val got = Decontaminate.contamination(d, d, "id", "text", n = 3)
      .as[(Long, Long, Long, Double)].head()
    assert(got._2 == got._3 && got._4 == 1.0d)
  }

  test("streamGate drops contaminated docs on ingest, batch-equivalently") {
    implicit val sqlCtx = spark.sqlContext
    val eval = evalDocs.toDF("id", "text")
    val grams = Decontaminate.evalGramSet(eval, "text", n = 5)
    assert(grams.n == 5)
    assert(grams.grams.nonEmpty && grams.grams == grams.grams.sorted)
    assert(grams == Decontaminate.EvalGrams(5, grams.grams.toVector),
      "EvalGrams must compare structurally")

    val incoming = Seq(
      (1L, "prefix words " + evalDocs.head._2 + " suffix words"), // leaks
      (2L, "completely different content about spark partitions and shuffles ok"),
      (3L, "also clean text that goes through the gate without any overlap"))

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val gated = Decontaminate.streamGate(
      mem.toDF().toDF("id", "text"), "text", grams)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val survived = spark.table("gate_out").select("id")
        .as[Long].collect().toSet
      assert(survived == Set(2L, 3L), "only the leaking doc is dropped")
    } finally q.stop()

    // batch twin: the gate keeps exactly the docs contamination() scores clean
    val viaBatch = Decontaminate.contamination(
        incoming.toDF("id", "text"), eval, "id", "text", n = 5)
      .filter($"n_hits" === 0).select("id").as[Long].collect().toSet
    assert(viaBatch == Set(2L, 3L))
  }

  test("eval n-gram side is broadcast — the corpus never shuffles for the probe join") {
    val train = (1L to 200L).map(i => (i, s"document number $i has words $i and more words $i here")).toDF("id", "text")
    val eval = Seq((0L, "document number 7 has words 7 and more")).toDF("id", "text")
    val plan = Decontaminate.contamination(train, eval, "id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval grams must broadcast:\n$plan")
  }

  test("broadcast ceiling guard throws the typed error with both counts") {
    val train = Seq((1L, "some training document words here")).toDF("id", "text")
    val eval = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta"),
      (1L, "one two three four five six seven eight nine")).toDF("id", "text")
    val err = intercept[Decontaminate.EvalGramSetTooLarge] {
      Decontaminate.contamination(train, eval, "id", "text", n = 5,
        maxBroadcastGrams = 3L)
    }
    assert(err.limit == 3L && err.count > 3L)
    assert(err.getMessage.contains("contaminationBloom"))
    // at the default ceiling the same call succeeds unchanged
    assert(Decontaminate.contamination(train, eval, "id", "text", n = 5)
      .count() == 1L)
  }

  test("semanticFlags: flags close vectors with closest-eval attribution, ignores distant ones") {
    def v(xs: Float*) = xs.toArray.padTo(8, 0f)
    val evals = Seq(
      (100L, v(1f, 0f)),        // eval A
      (101L, v(0f, 1f)))        // eval B
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, v(1f, 0.1f)),        // near eval A (cos ≈ 0.995)
      (2L, v(0.1f, 1f)),        // near eval B
      (3L, v(1f, 1f)),          // cos ≈ 0.707 to both → closest tie → smaller id
      (4L, v(-1f, 0f)))         // opposite → never flagged
      .toDF("vec_id", "embedding")
    val got = Decontaminate.semanticFlags(corpus, evals, "vec_id", "embedding",
        threshold = 0.7)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 100L), (2L, 101L), (3L, 100L)),
      s"flag set or attribution wrong: $got")
    assert(got.forall(_._3 >= 0.7))
    // the eval ceiling is a typed error, not an executor OOM
    val e = intercept[IllegalArgumentException](
      Decontaminate.semanticFlags(corpus, evals, "vec_id", "embedding",
        threshold = 0.7, maxEvalVectors = 1))
    assert(e.getMessage.contains("maxEvalVectors"), e.getMessage)
  }

  test("contaminationBloom reports are identical to the broadcast path on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    // eval = a slice of the corpus itself -> real overlaps at several
    // hit fractions, plus untouched documents
    val eval = docs.filter($"doc_id" % 7 === 0).select($"text")
    val viaBroadcast = Decontaminate.contamination(
        docs, eval, "doc_id", "text", n = 8)
      .select($"doc_id", $"n_ngrams", $"n_hits", $"hit_frac")
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaBloom = Decontaminate.contaminationBloom(
        docs, eval, "doc_id", "text", n = 8)
      .select($"doc_id", $"n_ngrams", $"n_hits", $"hit_frac")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaBroadcast.nonEmpty)
    assert(viaBloom == viaBroadcast,
      s"missing=${viaBroadcast -- viaBloom} extra=${viaBloom -- viaBroadcast}")
    // the bloom prefilter must appear in the plan (map-side drop), and
    // the bloom path must not broadcast the gram set itself
    val p = Decontaminate.contaminationBloom(docs, eval, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain"),
      s"corpus grams must be bloom-prefiltered map-side:\n$p")
  }

  test("contaminationRuns: verbatim spans coalesce, scattered hits don't") {
    def words(pfx: String, a: Int, b: Int) =
      (a to b).map(i => f"$pfx$i%02d").mkString(" ")
    // doc 1 holds a verbatim 12-token quote of eval tokens t05..t16:
    // 5 consecutive matched 8-gram positions -> one run, span 5+7 = 12
    // doc 2 holds the same 8-token eval phrase TWICE, far apart:
    // two runs of 1, span 8
    // doc 3 shares nothing -> absent from the report
    val train = Seq(
      (1L, words("t", 1, 20)),
      (2L, words("e", 1, 8) + " " + words("x", 1, 10) + " " + words("e", 1, 8)),
      (3L, words("z", 1, 12))).toDF("doc_id", "text")
    val eval = Seq((100L, words("t", 5, 16)), (101L, words("e", 1, 8)))
      .toDF("doc_id", "text")
    val got = Decontaminate.contaminationRuns(train, eval,
        "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 5L, 12L),
      (2L, 2L, 2L, 1L, 8L)), got.toString)
    // partition invariance
    val rep = Decontaminate.contaminationRuns(train.repartition(3), eval,
        "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rep == got)
    // the broadcast ceiling fails typed, not OOM
    intercept[Decontaminate.EvalGramSetTooLarge](
      Decontaminate.contaminationRuns(train, eval, "doc_id", "text",
        n = 8, maxBroadcastGrams = 2L))
  }
}
