package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("token count on normalized text") {
    val df = Seq((0L, "  a  b   c "), (1L, "single"), (2L, "x y")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 3, 1L -> 1, 2L -> 2))
  }

  test("subword count heuristic splits long words and digits") {
    val df = Seq((0L, "internationalization 12345 ok!")).toDF("doc_id", "text")
    // internationalization (20 chars) → 3 chunks of ≤8; 12345 → 2 chunks of ≤3; ok → 1; ! → 1
    val got = df.select(TextAnalysis.subwordCount($"text")).as[Int].head()
    assert(got == 7)
  }

  test("quality metrics: ratios and buckets") {
    val good = ("g" * 0) + Seq.fill(60)("spark data").mkString(" ") // 120 tokens, vowels present
    val df = Seq((0L, good), (1L, "short doc here now ok yes no maybe so forth ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
      (2L, "tiny")).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityMetrics(df, "doc_id", "text")
      .select("doc_id", "quality").as[(Long, String)].collect().toMap
    assert(rows(0L) == "good")
    assert(rows(1L) == "fair")
    assert(rows(2L) == "short")
  }

  test("langid heuristic: marker words vote; und when no markers") {
    val df = Seq(
      (0L, "the cat sat on the mat and looked to the sky"),
      (1L, "der hund und die katze ist ein freund"),
      (2L, "le chat et la souris est une histoire"),
      (3L, "qwerty zxcvb asdfgh")).toDF("doc_id", "text")
    val got = TextAnalysis.langIdScores(df, "text")
      .select($"doc_id", $"predicted").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "und"))
  }

  test("fingerprints: md5 of normalized text, stable under whitespace") {
    val df = Seq((0L, "Hello   World"), (1L, "hello world")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df, "doc_id", "text")
      .select("fp").as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0).matches("[0-9a-f]{32}"))
  }

  test("winnow kernel matches the portable expression pipeline exactly") {
    // seeded random ASCII-ish docs + hand-picked edge cases (empty, too
    // short, boundary length k+t-1 = 11, repeated chars → duplicate mins,
    // non-ASCII code points, whitespace runs collapsed by normText)
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghij klmnop  qrstuvwxyz0189 é漢"
    val gen = (1 to 60).map { i =>
      val len = rnd.nextInt(120)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val edge = Seq(
      (1000L, ""), (1001L, "ab"), (1002L, "abcdefghij"), // < 11 chars
      (1003L, "abcdefghijk"),                            // exactly 11
      (1004L, "aaaaaaaaaaaaaaaaaaaaaa"),                 // all-equal hashes
      (1005L, "the quick brown fox jumps over the lazy dog"))
    val docs = (gen ++ edge).toDF("doc_id", "text")
    val fast = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .groupBy("doc_id").agg(collect_list("winnow_fp").as("fps"))
    val slow = TextAnalysis.winnowFingerprintsPortable(docs, "doc_id", "text")
      .groupBy("doc_id").agg(collect_list("winnow_fp").as("fps"))
    val f = fast.as[(Long, Seq[Long])].collect().toMap
    val s = slow.as[(Long, Seq[Long])].collect().toMap
    assert(f.keySet == s.keySet)
    // same multiset per doc AND same first-occurrence order (array_distinct
    // and the kernel's HashSet both preserve it)
    f.keySet.foreach { id => assert(f(id) == s(id), s"doc $id") }
    // boundary doc produces exactly one window; short docs absent
    assert(f.contains(1003L) && f(1003L).length == 1)
    assert(!f.contains(1000L) && !f.contains(1001L) && !f.contains(1002L))
    assert(f(1004L).length == 1) // all windows share one min hash
  }

  test("repetitionStats: duplicate-bigram fraction, hand-checked") {
    val docs = Seq(
      (1L, "a b a b a"),            // bigrams: ab ba ab ba -> 4 total, 2 distinct
      (2L, "all words are unique"), // 3 bigrams, all distinct
      (3L, "one"),                  // fewer than 2 tokens -> filtered out
      (4L, "x x x x"))              // 3 bigrams, 1 distinct
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, 4L, 2L, 0.5),
      (2L, 3L, 3L, 0.0),
      (4L, 3L, 1L, 2.0 / 3.0)))
  }

  test("tfIdf: corpus weighting, hand-checked") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "cherry cherry cherry"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // N = 3; apple df=2, banana df=1, cherry df=2
    def s(tf: Long, df: Long) =
      BigDecimal(tf * math.log(4.0 / (df + 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, "apple")) == ((2L, 2L, s(2, 2))))
    assert(got((1L, "banana")) == ((1L, 1L, s(1, 1))))
    assert(got((3L, "cherry")) == ((3L, 2L, s(3, 2))))
    // ubiquitous term (df = N) still gets a small POSITIVE smoothed score
    assert(got((2L, "apple"))._3 > 0.0)
  }

  test("ngram kernel matches the portable HOF pipeline exactly") {
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "the quick brown fox the quick brown fox jumps"),
      (3L, "one two"),
      (4L, "solo"),                 // 1 token: kernel null, portable empty
      (5L, "x y x z x y x z x y"),
      (6L, "Ünïcödé tökens Ünïcödé tökens wörk töö")) // multi-byte UTF-8
      .toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val kernel = TextAnalysis.repetitionStats(docs, "doc_id", "text", n)
        .select("doc_id", "n_ngrams", "n_distinct")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val portable = docs
        .select($"doc_id", TextAnalysis.ngramCodes($"text", n).as("ng"))
        .filter(size($"ng") > 0)
        .select($"doc_id", size($"ng").cast("long"),
          size(array_distinct($"ng")).cast("long"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(kernel == portable, s"n=$n")
    }
  }

  test("repetitionStats trigrams and whitespace normalization") {
    val docs = Seq((1L, "  The   the THE the  ")).toDF("doc_id", "text")
    // normalized: "the the the the" -> trigrams: 2 total, 1 distinct
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((1L, 2L, 1L, 0.5)))
  }

  test("unigramLogProb: hand-computed corpus MLE, exact micro-nat sums") {
    // corpus: 6 tokens total; counts: the=3, cat=2, sat=1
    val docs = Seq((1L, "the cat sat"), (2L, "the cat the")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect()
    def micro(c: Long) = math.round(math.log(c.toDouble / 6.0d) * 1e6d)
    val d1 = micro(3) + micro(2) + micro(1)
    val d2 = micro(3) + micro(2) + micro(3)
    val exp1 = java.math.BigDecimal.valueOf(d1.toDouble / 3.0e6)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(got(0) == ((1L, 3L, d1, exp1)))
    assert(got(1)._3 == d2)
    // doc 2 repeats the commonest token -> higher (less negative) score
    assert(got(1)._4 > got(0)._4)
  }

  test("unigramLogProb is partition-independent (exact integer sums)") {
    val docs = (1L to 100L)
      .map(i => (i, s"token$i the and word${i % 7} common tail"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      TextAnalysis.unigramLogProb(docs.repartition(parts), "doc_id", "text")
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("bm25 matches a naive in-memory implementation") {
    val corpus = Seq(
      (1L, "spark shuffle join partition spark"),
      (2L, "spark streaming watermark state"),
      (3L, "duck pond water"),
      (4L, "join join join shuffle"))
    val queries = Seq((0L, "spark join"), (1L, "water"))
    val (k1, b) = (1.2d, 0.75d)

    // naive reference
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val nDocs = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / nDocs.toDouble
    def score(qTokens: Seq[String], id: Long): Long = {
      val dl = toks(id).size
      qTokens.distinct.flatMap { t =>
        val tf = toks(id).count(_ == t)
        if (tf == 0) None
        else {
          val df = corpus.count(_._2.split(" ").contains(t))
          val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
          val v = idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * dl.toDouble / avgdl))
          Some(math.round(v * 1e6d))
        }
      }.sum
    }

    val qdf = queries.toDF("q_id", "qtext")
      .select($"q_id", explode(split($"qtext", " ")).as("token"))
    val got = TextAnalysis.bm25(corpus.toDF("id", "text"), "id", "text", qdf)
      .select($"q_id", $"id", $"sum_micro")
      .as[(Long, Long, Long)].collect()
      .map { case (q, d, m) => (q, d) -> m }.toMap
    val want = (for {
      (q, qt) <- queries
      (id, _) <- corpus
      s = score(qt.split(" ").toSeq, id) if s != 0L
    } yield (q, id) -> s).toMap
    assert(got == want)
  }

  test("bigramLogProb: add-one smoothing, hand-checked") {
    // corpus: doc 1 "a b a b", doc 2 "b a", doc 3 "c" (no bigrams)
    // bigrams: d1: (a,b),(b,a),(a,b); d2: (b,a)
    // c(a,b)=2 c(b,a)=2; c(a·)=2 c(b·)=2; V=3 (a,b,c)
    // P(b|a)=(2+1)/(2+3)=0.6; P(a|b)=(2+1)/(2+3)=0.6
    val docs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"avg_logprob")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val lp = math.round(math.log(0.6) * 1e6).toDouble / 1e6
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 3L, r6(lp)), (2L, 1L, r6(lp))),
      s"got $got") // doc 3 has no bigrams and no row
  }

  test("containmentPairs: quote inside a long doc scores ~1 one way, low the other") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val page = s"intro words here $quote trailing content words follow now " +
      "more unrelated filler sentences about other topics entirely today"
    val docs = Seq((1L, quote), (2L, page),
      (3L, "totally disjoint text with nothing shared at all")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        threshold = 0.9, maxDf = 20)
      .select($"a_id", $"b_id", $"containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 2L)),
      s"only quote→page clears 0.9: $got")
    assert(got.head._3 == 1.0, "all quote shingles appear in the page")
  }

  test("winnow fps array form: per-doc stats without explode") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val row = docs.select(TextAnalysis.winnowFps($"text").as("fps"))
      .select(size($"fps").as("n"), array_min($"fps").as("mn"), array_max($"fps").as("mx"))
      .as[(Int, Long, Long)].head()
    val exploded = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .agg(count(lit(1)), min($"winnow_fp"), max($"winnow_fp"))
      .as[(Long, Long, Long)].head()
    assert((row._1.toLong, row._2, row._3) == exploded)
  }

  test("tokenDrift: hand-computed PSI contributions with add-one smoothing") {
    // snapshot A: "x x y"  (x:2, y:1, N_a=3); snapshot B: "x z z z"
    // (x:1, z:3, N_b=4); union vocab V=3 -> p = (n_a+1)/6, q = (n_b+1)/7
    val a = Seq((1L, "x x y")).toDF("id", "text")
    val b = Seq((2L, "x z z z")).toDF("id", "text")
    val got = TextAnalysis.tokenDrift(a, b, "text")
      .orderBy($"token")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    def nano(nA: Long, nB: Long): Long = {
      val p = (nA + 1).toDouble / 6d
      val q = (nB + 1).toDouble / 7d
      math.round((p - q) * math.log(p / q) * 1e9d)
    }
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq(("x", 2L, 1L), ("y", 1L, 0L), ("z", 0L, 3L)))
    got.foreach { case (tok, nA, nB, psiNano, psi) =>
      assert(psiNano == nano(nA, nB), s"token $tok")
      assert(psi == psiNano.toDouble / 1e9d, s"token $tok contrib")
    }
    // identical snapshots drift nowhere: every contribution is exactly 0
    val same = TextAnalysis.tokenDrift(a, a, "text")
      .agg(sum(abs($"psi_nano"))).as[Long].head()
    assert(same == 0L)
  }

  test("tokenDrift is partition-layout-independent") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    val x = TextAnalysis.tokenDrift(a, b, "text")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    val y = TextAnalysis.tokenDrift(a.repartition(13), b.repartition(7), "text")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(x == y)
  }

  test("importanceLogRatio scores target-like documents above off-target ones") {
    // target subcorpus talks about models; raw background about sports.
    // A fresh doc made of target-frequent tokens must outscore a fresh
    // doc of background-frequent tokens — the DSIR selection signal.
    val docs = Seq(
      (0L, "model training data loss gradient model", true),
      (1L, "model data tokens gradient descent", true),
      (2L, "football match score goal referee", false),
      (3L, "match goal season league score", false),
      (4L, "model gradient data", false),   // target-like, in raw pool
      (5L, "football score goal", false)    // background-like
    ).toDF("doc_id", "text", "is_tgt")
    val got = TextAnalysis.importanceLogRatio(docs, "doc_id", "text", $"is_tgt")
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(4L)._1 == 3L && got(5L)._1 == 3L)
    assert(got(4L)._2 > got(5L)._2,
      s"target-like doc must outscore background-like: $got")
    // and the target docs themselves score highest of all
    assert(Seq(0L, 1L).map(got(_)._2).min > got(5L)._2)
  }

  test("importanceLogRatio is invariant to input partitioning") {
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 3} tok${i % 11} filler$i", i % 5 == 0))
      .toDF("doc_id", "text", "is_tgt")
    val a = TextAnalysis.importanceLogRatio(docs, "doc_id", "text", $"is_tgt")
      .as[(Long, Long, Double)].collect().toSet
    val b = TextAnalysis.importanceLogRatio(docs.repartition(17), "doc_id",
        "text", $"is_tgt")
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("zipfSlope: a perfect Zipf corpus fits slope ≈ -1, uniform fits ≈ 0") {
    // freq(rank r) = 60/r for tokens w1..w6 → exact power law, slope -1
    val zipf = (1 to 6).flatMap(r => Seq.fill(60 / r)(s"w$r")).mkString(" ")
    // six tokens, equal frequency → flat, slope 0
    val flat = (1 to 6).flatMap(r => Seq.fill(10)(s"u$r")).mkString(" ")
    val df = Seq(("zipf", zipf), ("flat", flat)).toDF("lang", "text")
    val got = TextAnalysis.zipfSlope(df, "lang", "text")
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got("zipf")._1 == 6L)
    assert(math.abs(got("zipf")._2 + 1.0) < 0.05, s"expected ≈ -1: $got")
    assert(math.abs(got("flat")._2) < 1e-6, s"expected ≈ 0: $got")
  }

  test("zipfSlope is invariant to input partitioning") {
    val docs = (0L until 50L).map(i =>
      ("l" + (i % 3), s"tok${i % 13} tok${i % 5} tok${i % 7} x$i"))
      .toDF("lang", "text")
    val a = TextAnalysis.zipfSlope(docs, "lang", "text").collect().toSet
    val b = TextAnalysis.zipfSlope(docs.repartition(11), "lang", "text")
      .collect().toSet
    assert(a == b)
  }

  test("vocabOverlap: identical vocabularies estimate full overlap, disjoint estimate none") {
    val shared = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"oth$i").mkString(" ")
    val df = Seq(("a", shared), ("b", shared), ("c", other))
      .toDF("source", "text")
    val got = TextAnalysis.vocabOverlap(df, "source", "text", k = 64)
      .select($"group_a", $"group_b", $"est_a", $"est_union", $"est_inter", $"jacc_est")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    // a and b share every token: union == each, jaccard 1, inter == union
    val ab = got(("a", "b"))
    assert(ab._6 == 1.0 && ab._4 == ab._3 && ab._5 == ab._4)
    // a and c are disjoint: zero intersection estimate
    val ac = got(("a", "c"))
    assert(ac._6 == 0.0 && ac._5 == 0L)
    // 40 distinct tokens < k = 64 ⇒ the sketch IS the vocab: exact count
    // (modulo hash collisions, vanishingly rare at 40/2³¹)
    assert(ab._3 == 40L)
  }

  test("vocabOverlap estimates survive repartitioning bit-for-bit") {
    val df = (0L until 60L).map(i =>
      ("s" + (i % 4), s"w${i % 17} w${i % 23} w${i % 9} z$i"))
      .toDF("source", "text")
    val a = TextAnalysis.vocabOverlap(df, "source", "text").collect().toSet
    val b = TextAnalysis.vocabOverlap(df.repartition(13), "source", "text")
      .collect().toSet
    assert(a == b)
  }

  test("pmiCollocations: a glued pair outscores independent fillers") {
    // "alpha beta" always co-occur; fillers are shuffled independently
    val docs = (0 until 30).map { i =>
      val fill = (0 until 6).map(j => s"f${(i * 7 + j * 3) % 5}").mkString(" ")
      (s"alpha beta $fill")
    }.toDF("text")
    val got = TextAnalysis.pmiCollocations(docs, "text", topK = 5, minCount = 5)
      .as[(String, Long, Double)].collect()
    assert(got.head._1 == "alpha beta", s"glued pair must rank first: ${got.toSeq}")
    assert(got.head._3 > got.last._3)
  }

  test("bpeMerges: hand-checked merge trajectory on a tiny corpus") {
    // corpus: "abab abab cd" ×3 → words: abab (freq 6), cd (freq 3)
    // round 1 pairs: (a b)=12, (b a)=6, (c d)=3 → merge "a b"→ab
    // round 2: words "ab ab"(6), "c d"(3) → pairs (ab ab)=6 → merge
    // round 3: only "c d"(3) remains pairable → merge
    val df = Seq.fill(3)("abab abab cd").toDF("text")
    val got = TextAnalysis.bpeMerges(df, "text", iters = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a b", "ab", 12L),
      (2L, "ab ab", "abab", 6L),
      (3L, "c d", "cd", 3L)), s"trajectory wrong: $got")
  }

  test("bpeMerges is partition-independent and stops when no pairs remain") {
    val df = Seq.fill(4)("xy xy z").toDF("text")
    // after merging "x y", nothing 2-symbol remains except nothing: z is
    // 1 char, xy merged → no pair → loop yields just 1 row even for iters=4
    val got = TextAnalysis.bpeMerges(df, "text", iters = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "x y", "xy", 8L)), s"$got")
    val big = (0 until 40).map(i => s"tok${i % 7} data${i % 3}").toDF("text")
    val a = TextAnalysis.bpeMerges(big, "text", iters = 3).collect().toSeq
    val b = TextAnalysis.bpeMerges(big.repartition(9), "text", iters = 3).collect().toSeq
    assert(a == b)
  }

  test("bpeMerges never matches a pair across symbol boundaries") {
    // crafted so the round-2 best pair "b c" occurs INSIDE the round-1
    // symbol "ab" followed by "c": word "abc" is ["ab", "c"] after
    // round 1, and a naive string replace of "b c" on "ab c" would mint
    // the bogus symbol "abc" (the symbol ladder must instead keep
    // "ab c" intact and merge only the true ["b", "c"] adjacency)
    val df = (Seq.fill(2)("abc") ++ Seq.fill(3)("xbc") ++ Seq.fill(10)("ab"))
      .toDF("text")
    val got = TextAnalysis.bpeMerges(df, "text", iters = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    // r1: (a b) 2+10=12 → ab; r2: (b c) 3 from xbc ONLY? no — "a b c"
    // became "ab c" for abc(2) and "x b c"(3) kept b,c adjacent: (b c)
    // counts 2+3=5 BEFORE r1; after r1 words are "ab c"(2), "x b c"(3),
    // "ab"(10) → pairs (ab c)=2, (b c)=3, (x b)=3 → tie broken pair-asc
    // to "b c" (3). Boundary-safe application touches ONLY "x b c".
    assert(got.take(2) == Seq(
      (1L, "a b", "ab", 12L),
      (2L, "b c", "bc", 3L)), s"trajectory wrong: $got")
    // r3 proves "ab c" survived un-merged: its (ab c) pair is still
    // countable (2) against (x bc) (3) → best is (x bc)
    assert(got(2) == ((3L, "x bc", "xbc", 3L)),
      s"round 3 shows the boundary bug if (ab c) vanished: $got")
    // and the encoder replays the same boundary-safe fold: abc → 2
    // subwords (ab|c), xbc → 1 (xbc), ab → 1 → 2·2 + 3·1 + 10·1 = 17
    val fert = TextAnalysis.bpeFertility(
      df.select(lit("g").as("lang"), col("text")), "lang", "text", iters = 3)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(fert.head._3 == 17L, s"n_subwords wrong (boundary leak): $fert")
  }

  test("bpeEncode: ids reconstruct the corpus losslessly and the scheme is deterministic") {
    val df = Seq((1L, "abc abc ab"), (2L, "xbc ab cd"), (3L, "Abc  xbc"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(df, "text", iters = 3)
      .orderBy($"iter").select($"pair", $"merged")
      .as[(String, String)].collect().toSeq
    val enc = TextAnalysis.bpeEncode(df, "doc_id", "text", merges)
      .select($"doc_id", $"token_ids", $"n_tokens")
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    assert(enc.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(enc.forall { case (_, ids, n) => ids.size == n })
    // rebuild the id → subword map exactly as the encoder mints it:
    // sorted corpus alphabet gets 0..A-1, merge i mints A+i-1
    val alphabet = df.select(explode(split(Dedup.normText($"text"), "")).as("c"))
      .filter(length($"c") > 0).distinct().orderBy($"c").as[String].collect()
      .filter(_ != " ")
    val vocab = (alphabet.zipWithIndex.map { case (c, i) => i.toLong -> c } ++
      merges.map(_._2).zipWithIndex.map { case (m, i) =>
        (alphabet.length + i).toLong -> m }).toMap
    // decode: concatenated subwords == the normalized text without spaces
    val norm = df.select($"doc_id", Dedup.normText($"text").as("t"))
      .as[(Long, String)].collect().toMap
    enc.foreach { case (id, ids, _) =>
      assert(ids.map(vocab).mkString == norm(id).replace(" ", ""),
        s"doc $id decode mismatch: ids=$ids")
    }
    // deterministic under repartitioning
    val enc2 = TextAnalysis.bpeEncode(df.repartition(7), "doc_id", "text", merges)
      .select($"doc_id", $"token_ids", $"n_tokens")
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    assert(enc2.toSeq == enc.toSeq)
    // an internally inconsistent merge list (merged output that still
    // contains a separator, minting symbols outside the vocab) fails typed
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncode(df, "doc_id", "text", Seq(("a b", "Z Z")))
    }
  }

  test("bpeDecode inverts bpeEncode through the exposed vocab; unknown ids fail typed") {
    val df = Seq((1L, "abc abc ab"), (2L, "xbc ab cd"), (3L, "Abc  xbc"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(df, "text", iters = 3)
      .orderBy($"iter").select($"pair", $"merged")
      .as[(String, String)].collect().toSeq
    val enc = TextAnalysis.bpeEncode(df, "doc_id", "text", merges)
    val vocab = TextAnalysis.bpeVocab(df, "text", merges)
    val dec = TextAnalysis.bpeDecode(enc, "doc_id", "token_ids", vocab)
      .as[(Long, String)].collect().toMap
    val ref = df.select($"doc_id", Dedup.normText($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(dec.keySet == ref.keySet)
    dec.foreach { case (id, d) =>
      assert(d == ref(id).replace(" ", ""),
        s"doc $id: decoded '$d' != spaceless norm '${ref(id)}'")
    }
    // an id minted under a DIFFERENT merge list does not resolve — typed
    val alien = enc.withColumn("token_ids",
      array_union($"token_ids", array(lit(99999L))))
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeDecode(alien, "doc_id", "token_ids", vocab)
    }
  }

  test("vocabCoverage: hand-checked crossing ranks, OOV rates, typed threshold guards") {
    // counts: a=5, b=3, c=1, d=1 → total 10; ranked a(5,cum5) b(3,cum8)
    // c(1,cum9) d(1,cum10); 50% → rank1, 80% → rank2, 90% → rank3, 100% → rank4
    val df = Seq("a a a a a", "b b b c", "d").toDF("text")
    val got = TextAnalysis.vocabCoverage(df, "text",
        thresholdsMicro = Seq(500000L, 800000L, 900000L, 1000000L))
      .orderBy("threshold")
      .as[(Double, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0.5d, 1L, 5L, 10L, 0.5d),
      (0.8d, 2L, 8L, 10L, 0.2d),
      (0.9d, 3L, 9L, 10L, 0.1d),
      (1.0d, 4L, 10L, 10L, 0.0d)), got.toString)
    // partition independence
    val rep = TextAnalysis.vocabCoverage(df.repartition(4), "text",
        thresholdsMicro = Seq(500000L, 800000L, 900000L, 1000000L))
      .orderBy("threshold")
      .as[(Double, Long, Long, Long, Double)].collect().toSeq
    assert(rep == got)
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(df, "text", thresholdsMicro = Seq(0L))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(df, "text", thresholdsMicro = Nil)
    }
  }

  test("bpeMerges rejects out-of-regime iteration counts") {
    val df = Seq("ab").toDF("text")
    intercept[IllegalArgumentException](TextAnalysis.bpeMerges(df, "text", iters = 257))
  }

  test("bpeMergesBatched with R=1 replays the sequential bpeMerges trajectory") {
    val big = (0 until 40).map(i => s"tok${i % 7} data${i % 3}").toDF("text")
    val seqTraj = TextAnalysis.bpeMerges(big, "text", iters = 6)
      .as[(Long, String, String, Long)].collect().toSeq
    val batTraj = TextAnalysis.bpeMergesBatched(big, "text", merges = 6, batchR = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(batTraj == seqTraj, s"R=1 diverged:\n$batTraj\nvs\n$seqTraj")
  }

  test("bpeMergesBatched defers interacting runners-up within a round") {
    // round-1 ranked pairs: (a b)=10, (b c)=8, (x y)=6 — (b c) shares
    // symbol b with the accepted (a b), so R=2 must skip it and accept
    // the disjoint (x y); (b c) then wins round 2 on refreshed counts
    val df = (Seq.fill(10)("ab") ++ Seq.fill(8)("bc") ++ Seq.fill(6)("xy"))
      .toDF("text")
    val got = TextAnalysis.bpeMergesBatched(df, "text", merges = 4, batchR = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a b", "ab", 10L),
      (2L, "x y", "xy", 6L),
      (3L, "b c", "bc", 8L)), s"batched trajectory wrong: $got")
    // same merge SET as sequential training, just a different order —
    // the deferred pair's count is invariant (it shares no symbol)
    val seqTraj = TextAnalysis.bpeMerges(df, "text", iters = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(seqTraj.map(t => (t._2, t._4)).toSet ==
      got.map(t => (t._2, t._4)).toSet)
  }

  test("bpeMergesBatched is partition-invariant and bounds driver rounds") {
    val big = (0 until 60).map(i => s"w${i % 11} v${i % 5}").toDF("text")
    val a = TextAnalysis.bpeMergesBatched(big, "text", 8, 3).collect().toSeq
    val b = TextAnalysis.bpeMergesBatched(big.repartition(9), "text", 8, 3)
      .collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException](
      TextAnalysis.bpeMergesBatched(big, "text", merges = 70000, batchR = 64))
    intercept[IllegalArgumentException](
      // 2048 merges one-at-a-time = 2048 driver rounds — over the cap
      TextAnalysis.bpeMergesBatched(big, "text", merges = 2048, batchR = 1))
    intercept[IllegalArgumentException](
      TextAnalysis.bpeMergesBatched(big, "text", merges = 4, batchR = 2,
        lookahead = 1))
  }

  test("bpeFertility: merges shrink subword counts, hand-checked") {
    // corpus "abab cd" ×4: merges (a b)→ab (8), then (ab ab)→abab (4),
    // then (c d)→cd (4... tie with nothing else) — after 3 merges both
    // words are single symbols → fertility 1.0
    val df = Seq.fill(4)(("g1", "abab cd")).toDF("lang", "text")
    val got = TextAnalysis.bpeFertility(df, "lang", "text", iters = 3)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("g1", 8L, 8L, 1.0, 3.0)), s"$got")
    // with zero merges applied... 1 iter merges only "a b":
    val one = TextAnalysis.bpeFertility(df, "lang", "text", iters = 1)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // abab → "ab ab" (2 syms), cd → "c d" (2 syms): 8 words, 16 subwords
    assert(one == Seq(("g1", 8L, 16L, 2.0, 1.5)), s"$one")
  }

  test("charEntropy: hand-computed entropy, repetition scores low, uniformity high") {
    // "aaaa" → one symbol → H = 0; "abcd" → uniform over 4 → H = ln 4
    val df = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "aabb"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 4L, 0.0)), s"constant text must have H=0: $got")
    assert(math.abs(got(1)._3 - math.log(4)) < 1e-6, s"uniform 4-char: $got")
    assert(math.abs(got(2)._3 - math.log(2)) < 1e-6, s"two-symbol: $got")
    // normText collapses whitespace: the space is one more symbol
    val sp = TextAnalysis.charEntropy(
      Seq((9L, "ab   ab")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].head()
    assert(sp._2 == 5L, s"normalized 'ab ab' has 5 chars: $sp")
  }

  test("blocklistFilter: hit counts and keep verdicts; literal-list cap enforced") {
    val df = Seq(
      (1L, "clean words only here"),
      (2L, "one bad word here"),
      (3L, "bad bad words")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistFilter(df, "doc_id", "text", Seq("bad"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L, 0L, 1L), (2L, 4L, 1L, 0L), (3L, 3L, 2L, 0L)),
      s"hit counting wrong: $got")
    intercept[IllegalArgumentException](
      TextAnalysis.blocklistFilter(df, "doc_id", "text", Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.blocklistFilter(df, "doc_id", "text",
        (1 to 10001).map("w" + _)))
  }

  test("stupidBackoffTrigram: each backoff tier fires and is hand-replayable") {
    // train: "a b c" ×2, "b c d" — test doc exercises all three tiers:
    //   (a b c): seen trigram → c123/c12 = 2/2 = 1.0
    //   (b c a): unseen trigram, seen bigram (c a)? no — (c a) unseen;
    //            bigram tier needs c(w2 w3) = c(c, a) — absent → unigram
    //   pick test "a b c d x": trigrams (a b c) seen,
    //   (b c d) seen (1/ c(b c)=3) → 1/3,
    //   (c d x): tri unseen, bigram (d x) unseen → unigram floor on x
    //            (x unseen: (0+1)/(N+V)), α² applied
    val docs = (Seq.fill(2)((1L, "a b c")) :+ ((2L, "b c d")) :+
      ((10L, "a b c d x")) :+ ((11L, "x b c y"))).toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffTrigram(docs, "doc_id", "text",
        col("doc_id") >= 10L)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((10L, 3L), (11L, 2L)), s"$got")
    def micro(p: Double): Long =
      BigDecimal(math.log(p) * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // train counts: c(a b c)=2, c(b c d)=1; c(a b)=2, c(b c)=3, c(c d)=1;
    // unigrams: a=2, b=3, c=3, d=1 → N=9, V=4
    val exp10 = micro(2.0 / 2.0) + micro(1.0 / 3.0) +
      micro(0.4 * 0.4 * (1.0 / 13.0))          // seen, seen, unigram floor
    val exp11 = micro(0.4 * (3.0 / 3.0)) +
      micro(0.4 * 0.4 * (1.0 / 13.0))          // bigram tier, unigram floor
    assert(got(0)._3 == exp10, s"doc 10 micro sum: ${got(0)._3} vs $exp10")
    assert(got(1)._3 == exp11, s"doc 11 micro sum (bigram backoff tier): ${got(1)._3} vs $exp11")
    intercept[IllegalArgumentException](
      TextAnalysis.stupidBackoffTrigram(docs, "doc_id", "text",
        col("doc_id") === 10L, alpha = 1.5))
  }

  test("knBigramLogProb: hand-derived Kneser-Ney probabilities, exact micro-nat sums") {
    // corpus: "a b" and "a b a c"
    // pair counts: (a,b)=2, (b,a)=1, (a,c)=1 → B = 3 bigram types
    // contexts: a: cp=3, n1p=2; b: cp=1, n1p=1
    // continuations: ·b: 1, ·a: 1, ·c: 1
    val df = Seq((1L, "a b"), (2L, "a b a c")).toDF("doc_id", "text")
    val d = 0.75
    def pkn(cpc: Long, cp: Long, n1p: Long, n1m: Long, b: Long): Double =
      (math.max(cpc.toDouble - d, 0.0) + d * n1p * (n1m.toDouble / b)) / cp
    def micro(p: Double): Long = // Spark round() is HALF_UP (away from zero)
      BigDecimal(math.log(p) * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val mAB = micro(pkn(2, 3, 2, 1, 3)) // P(b|a) = (1.25 + 0.5)/3
    val mBA = micro(pkn(1, 1, 1, 1, 3)) // P(a|b) = (0.25 + 0.25)/1
    val mAC = micro(pkn(1, 3, 2, 1, 3)) // P(c|a) = (0.25 + 0.5)/3
    val got = TextAnalysis.knBigramLogProb(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 1L), (2L, 3L)))
    assert(got(0)._3 == mAB, s"doc1 micro sum: ${got(0)} vs $mAB")
    assert(got(1)._3 == mAB + mBA + mAC, s"doc2 micro sum: ${got(1)}")
    assert(got(1)._4 ==
      BigDecimal((mAB + mBA + mAC).toDouble / 3e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the discounted mass is interpolated, never negative: P(a|b) has
    // cpc = 1 < 1/D so its discounted term is small but positive
    assert(mBA == micro(0.5))
    intercept[IllegalArgumentException](
      TextAnalysis.knBigramLogProb(df, "doc_id", "text", discount = 1.5))
  }

  test("degenerate groups: bigram-less sources still report, one-type zipf is NULL") {
    // source "solo": only single-token docs → NO bigrams anywhere; it
    // must appear with n_bigrams = 0 and distinct2 NULL, not vanish
    val df = Seq(("solo", "x"), ("solo", "y"), ("pair", "a b a b"))
      .toDF("source", "text")
    val ld = TextAnalysis.lexicalDiversity(df, "source", "text")
      .as[(String, Long, Long, Double, Long, Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(ld.map(_._1) == Seq("pair", "solo"), s"group vanished: $ld")
    val solo = ld(1)
    assert(solo._5 == 0L && solo._6 == 0L && solo._7.isEmpty,
      s"bigram-less group must report 0/0/NULL: $solo")
    // one token type → zipf denominator 0 → NULL slope, never NaN
    val zs = TextAnalysis.zipfSlope(
      Seq(("mono", "aaa aaa aaa"), ("multi", "a a a b b c"))
        .toDF("lang", "text"), "lang", "text")
      .as[(String, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(zs.head._1 == "mono" && zs.head._2 == 1L && zs.head._3.isEmpty,
      s"one-type group must yield NULL slope: $zs")
    assert(zs(1)._3.exists(v => !v.isNaN), s"multi-type slope must be real: $zs")
  }

  test("lexicalDiversity: hand-checked token and bigram counts") {
    val df = Seq(
      ("a", "x y x y"),   // tokens 4, types 2; bigrams: "x y","y x","x y" → 3, distinct 2
      ("a", "z"),         // 1 token, no bigram
      ("b", "p p p"))     // tokens 3, types 1; bigrams "p p" ×2 → distinct 1
      .toDF("source", "text")
    val got = TextAnalysis.lexicalDiversity(df, "source", "text")
      .as[(String, Long, Long, Double, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(got("a")._2 == 5L && got("a")._3 == 3L)      // x,y,z
    assert(got("a")._5 == 3L && got("a")._6 == 2L)
    assert(got("b") == (("b", 3L, 1L, 0.333333, 2L, 1L, 0.5)))
  }

  test("sourceJsd: hand-checked pairwise JSD, zero on identical groups, typed group guard") {
    val docs = Seq(
      ("g1", "a a b"), ("g2", "a b b"), ("g3", "a a b")).toDF("src", "text")
    val got = TextAnalysis.sourceJsd(docs, "src", "text")
      .orderBy($"group_a", $"group_b")
      .as[(String, String, Long, Double)].collect().toSeq
    // g1: a=2,b=1 (t=3); g2: a=1,b=2; V=2; p(a)=.6 q(a)=.4 and the
    // mirrored term for b -> per-token nano term 10067757, jsd = .020136
    val p = 0.6d; val q = 0.4d
    val tok = math.round((0.5d * p * math.log(2.0d * p / (p + q)) +
      0.5d * q * math.log(2.0d * q / (p + q))) * 1e9d)
    val jsd12 = math.round(2L * tok / 1e9d * 1e6d) / 1e6d
    assert(got == Seq(
      ("g1", "g2", 2L, jsd12),
      ("g1", "g3", 2L, 0.0d),
      ("g2", "g3", 2L, jsd12)), got.toString)
    // partition invariance
    val rep = TextAnalysis.sourceJsd(docs.repartition(7), "src", "text")
      .orderBy($"group_a", $"group_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(rep == got)
    intercept[IllegalArgumentException] {
      TextAnalysis.sourceJsd(Seq(("g1", "a")).toDF("src", "text"),
        "src", "text")
    }
  }


  test("tokenGini: zero on equal lengths, hand-checked skew, partition invariance") {
    // equal masses -> 0
    val eq = TextAnalysis.tokenGini(
        Seq(("g", "a b"), ("g", "c d")).toDF("src", "text"), "src", "text")
      .as[(String, Long, Long, Double)].head()
    assert(eq == (("g", 2L, 4L, 0.0d)))
    // lengths 1,1,2: 2*(1+2+6)=18, (n+1)*tot=16, n*tot=12 -> 1/6
    val skew = TextAnalysis.tokenGini(
        Seq(("g", "a"), ("g", "b"), ("g", "c d")).toDF("src", "text"),
        "src", "text")
      .as[(String, Long, Long, Double)].head()
    assert(skew == (("g", 3L, 4L, 0.166667d)), skew.toString)
    // one giant doc: lengths 1, 99 -> (2*199 - 3*100)/(2*100) = 0.49
    val giant = TextAnalysis.tokenGini(
        Seq(("g", "a"), ("g", Seq.fill(99)("w").mkString(" ")))
          .toDF("src", "text"), "src", "text")
      .as[(String, Long, Long, Double)].head()
    assert(giant == (("g", 2L, 100L, 0.49d)), giant.toString)
    // two groups, partition invariance
    val docs = Seq(("g1", "a"), ("g1", "b c d"), ("g2", "x y"),
      ("g2", "z w")).toDF("src", "text")
    val base = TextAnalysis.tokenGini(docs, "src", "text")
      .orderBy($"group").as[(String, Long, Long, Double)].collect().toSeq
    val rep = TextAnalysis.tokenGini(docs.repartition(5), "src", "text")
      .orderBy($"group").as[(String, Long, Long, Double)].collect().toSeq
    assert(base == rep)
    assert(base.find(_._1 == "g2").get._4 == 0.0d)
  }

  test("vocabGrowth: first-group attribution and running totals hand-checked") {
    val docs = Seq(("a", "x y x"), ("b", "y z")).toDF("src", "text")
    val got = TextAnalysis.vocabGrowth(docs, "src", "text")
      .orderBy($"group")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // x,y credit to a; z to b; cum_tokens 3 -> 5; cum_vocab 2 -> 3
    assert(got == Seq(("a", 3L, 2L, 3L, 2L), ("b", 2L, 1L, 5L, 3L)),
      got.toString)
    // a group adding zero new words still rides the curve
    val rep = TextAnalysis.vocabGrowth(
        (docs.union(Seq(("c", "x y z")).toDF("src", "text"))).repartition(4),
        "src", "text")
      .orderBy($"group")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rep.last == (("c", 3L, 0L, 8L, 3L)), rep.toString)
  }

  test("heapsFit: exact power law recovered, r2 = 1, typed guards") {
    // V = 2 * N^0.5 exactly at three points
    val curve = Seq((100L, 20L), (10000L, 200L), (1000000L, 2000L))
      .toDF("cum_tokens", "cum_vocab")
    val got = TextAnalysis.heapsFit(curve, "cum_tokens", "cum_vocab")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(got == ((3L, 0.5d, 0.693147d, 2.0d, 1.0d)), got.toString)
    // fewer than 2 distinct token totals is undefined
    intercept[IllegalArgumentException](TextAnalysis.heapsFit(
      Seq((100L, 20L)).toDF("cum_tokens", "cum_vocab"),
      "cum_tokens", "cum_vocab"))
    intercept[IllegalArgumentException](TextAnalysis.heapsFit(
      Seq((100L, 20L), (100L, 30L)).toDF("cum_tokens", "cum_vocab"),
      "cum_tokens", "cum_vocab"))
    // zero vocabulary on a point is undefined in log space
    intercept[IllegalArgumentException](TextAnalysis.heapsFit(
      Seq((100L, 0L), (200L, 10L)).toDF("cum_tokens", "cum_vocab"),
      "cum_tokens", "cum_vocab"))
  }

  test("heapsFit: a FLAT curve reads beta = canonical +0.0, never -0.0") {
    // constant vocabulary across growing token totals — cov is an
    // infinitesimal NEGATIVE (the q208 signed-zero replay hole): the
    // readout must canonicalize to +0.0 so byte-hash replay against an
    // engine that preserves ROUND's sign bit (DuckDB) still matches
    val flat = Seq((100L, 31L), (250L, 31L), (700L, 31L), (1300L, 31L))
      .toDF("cum_tokens", "cum_vocab")
    val got = TextAnalysis.heapsFit(flat, "cum_tokens", "cum_vocab")
      .select($"beta", $"ln_k").as[(Double, Double)].head()
    assert(got._1 == 0.0d, got.toString)
    assert(java.lang.Double.doubleToRawLongBits(got._1) == 0L,
      s"beta must be +0.0 bit-for-bit, got raw bits " +
        java.lang.Double.doubleToRawLongBits(got._1))
    // intercept is the (rounded) mean of the constant ln V
    assert(got._2 == 3.433987d, got.toString)
  }

  test("theilDecomposition: decomposition identity, equal-mass zeros") {
    // two sources: a = docs of 2 and 6 tokens, b = docs of 4 and 4
    val docs = Seq(
      (1L, "w w", "a"), (2L, "w w w w w w", "a"),
      (3L, "w w w w", "b"), (4L, "w w w w", "b")).toDF("doc_id", "text", "src")
    val got = TextAnalysis.theilDecomposition(docs, "src", "text")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    val a = got.find(_._1 == "a").get
    val b = got.find(_._1 == "b").get
    assert(a._2 == 2L && a._3 == 8L && a._4 == 0.5d)
    assert(b._3 == 8L && b._4 == 0.5d)
    // b is perfectly equal inside: T_b(within) = 0; equal shares and
    // equal doc counts: between = 0; identity T = sum s_g T_g holds
    assert(b._5 == 0.0d && a._6 == 0.0d, got.toString)
    // a: x = (2, 6), mean 4: T_a = (2/8)ln(2/4) + (6/8)ln(6/4)
    val ta = 0.25d * math.log(0.5d) + 0.75d * math.log(1.5d)
    assert(math.abs(a._5 - ta) < 1e-5, s"${a._5} vs $ta")
    assert(math.abs(a._7 - 0.5d * ta) < 1e-5, s"total ${a._7}")
    // all-equal corpus: every index reads canonical 0.0 (never -0.0)
    val eq = TextAnalysis.theilDecomposition(
      Seq((1L, "w w", "a"), (2L, "w w", "a")).toDF("doc_id", "text", "src"),
      "src", "text")
      .select($"theil_within", $"theil_between", $"theil_total")
      .as[(Double, Double, Double)].head()
    assert(eq == ((0.0d, 0.0d, 0.0d)), eq.toString)
  }

  test("jmSweep: hand-traced interpolation, OOV drop, argmax flag") {
    // train "a b a b": bigrams (a,b)x2 (b,a)x1; c(a)=c(b)=2, N=4
    // held "a b": pbi = 2/2 = 1.0, puni(b) = 0.5 ->
    // score(l) = ln(l + (1-l)*0.5), maximized at the largest l
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val held = Seq((2L, "a b"), (3L, "a z")).toDF("doc_id", "text")
    val got = TextAnalysis.jmSweep(train, held, "doc_id", "text")
      .as[(Double, Long, Long, Double, Double, Long)].collect().toSeq
    assert(got.size == 9)
    // (a,z): z is OOV -> dropped and counted
    assert(got.forall(r => r._2 == 1L && r._3 == 1L), got.toString)
    val best = got.filter(_._6 == 1L)
    assert(best.size == 1 && best.head._1 == 0.9d, got.toString)
    // hand value at l = 0.5: ln(0.75) = -0.287682 -> ppl = exp(0.287682)
    val mid = got.find(_._1 == 0.5d).get
    assert(mid._4 == -0.287682d, mid.toString)
    assert(mid._5 == BigDecimal(math.exp(0.287682d))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, mid.toString)
    // avg_logprob strictly improves with lambda here (pbi > puni)
    val byL = got.sortBy(_._1).map(_._4)
    assert(byL.zip(byL.tail).forall { case (lo, hi) => lo < hi }, got.toString)
    intercept[IllegalArgumentException](TextAnalysis.jmSweep(
      train, held, "doc_id", "text", lambdas = Seq(0.0d)))
  }

  test("signed-zero convention: Spark round() normalizes -0.0 (SURVEY §7.4)") {
    // the repo's replay convention rests on this: Spark's BigDecimal
    // round can NEVER emit -0.0, so every rounded Spark readout is
    // already canonical and only the DuckDB oracle side (whose ROUND
    // preserves the sign bit) needs the `+ 0.0` normalization
    val r = spark.range(1).select(
      round(lit(-0.0d), 6).as("a"),
      round(lit(-1e-9d), 6).as("b"),
      round(lit(-4e-7d), 6).as("c")).head()
    Seq(r.getDouble(0), r.getDouble(1), r.getDouble(2)).foreach { v =>
      assert(java.lang.Double.doubleToRawLongBits(v) == 0L,
        s"expected canonical +0.0, got raw bits " +
          java.lang.Double.doubleToRawLongBits(v))
    }
  }

  test("goodTuring: hand-traced count-of-counts, r*, missing mass") {
    // corpus "a a a b b c": counts a=3 b=2 c=1 -> N=6, N1=N2=N3=1
    // r=1: r* = 2*N2/N1 = 2, p = 2/6; r=2: r* = 3*N3/N2 = 3, p = 3/6
    // r=3: no N4 donor -> 0.0; missing mass = N1/N = 1/6
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = TextAnalysis.goodTuring(df, "text", maxR = 10)
      .as[(Long, Long, Double, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2.0d, 0.333333d, 0.166667d, 6L),
      (2L, 1L, 3.0d, 0.5d, 0.166667d, 6L),
      (3L, 1L, 0.0d, 0.0d, 0.166667d, 6L)), got.toString)
    // maxR truncates the readout, not the totals
    val head = TextAnalysis.goodTuring(df, "text", maxR = 1)
      .as[(Long, Long, Double, Double, Double, Long)].collect().toSeq
    assert(head == Seq((1L, 1L, 2.0d, 0.333333d, 0.166667d, 6L)),
      head.toString)
    // partition invariance
    val many = (1L to 20L).map(i => (i, s"w$i common common")).toDF("doc_id", "text")
    val a = TextAnalysis.goodTuring(many, "text").orderBy($"r").collect().toSeq
    val b = TextAnalysis.goodTuring(many.repartition(7), "text")
      .orderBy($"r").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException](TextAnalysis.goodTuring(df, "text", 0))
  }

  test("tokenBurstiness: bursty token outranks scattered; uniform scores 0") {
    // x: [4,0,0,0] -> F = (4*16-16)/(4*4) = 3; u: [1,1,1,1] -> F = 0
    // (sub-Poisson regularity); y: [2,0,2,0] -> (4*8-16)/(4*4) = 1
    val df = Seq(
      (1L, "x x x x u y y"), (2L, "u"), (3L, "u y y"), (4L, "u"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenBurstiness(df, "doc_id", "text",
        topK = 10, minDf = 1L)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("x", "y", "u"), got.toString)
    assert(got.map(r => math.round(r._4 * 1e9d)) ==
      Seq(3000000000L, 1000000000L, 0L), got.toString)
    assert(got.head == (("x", 1L, 4L, 3.0d)), got.toString)
    // minDf cuts the rare token BEFORE the top-k order
    val cut = TextAnalysis.tokenBurstiness(df, "doc_id", "text",
        topK = 10, minDf = 2L)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(cut.map(_._1) == Seq("y", "u"), cut.toString)
    intercept[IllegalArgumentException](
      TextAnalysis.tokenBurstiness(df, "doc_id", "text", topK = 0))
  }

  test("textRankKeywords: hub token outranks leaves, leaf ties break on token") {
    // star graph via bigrams: hub-x, hub-y, hub-z
    val df = Seq((1L, "hub x"), (2L, "hub y"), (3L, "hub z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.textRankKeywords(df, "text", topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.head._1 == "hub" && got.head._3 == 3L, got.toString)
    assert(got.map(_._1) == Seq("hub", "x", "y", "z"), got.toString)
    // structurally identical leaves carry identical exact rank
    assert(got.drop(1).map(_._2).distinct.size == 1, got.toString)
    // topK cuts AFTER the deterministic (rank, token) order
    val top2 = TextAnalysis.textRankKeywords(df, "text", topK = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(top2.map(_._1) == Seq("hub", "x"), top2.toString)
  }

  test("textRankKeywords equals pageRankInt on the distinct bigram edges") {
    // repeats, a self-loop pair ("b b") and messy whitespace collapse to
    // the distinct edge set {(a,b), (a,c)}
    val df = Seq((1L, "a b  b a a"), (2L, "c a b")).toDF("doc_id", "text")
    val got = TextAnalysis.textRankKeywords(df, "text", topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    val direct = Components.pageRankInt(
        Seq(("a", "b"), ("c", "a")).toDF("a_id", "b_id"), iters = 3)
      .orderBy($"pr_micro".desc, $"id".asc)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == direct, s"$got vs $direct")
    // empty / single-token corpus has no edges
    assert(TextAnalysis.textRankKeywords(
      Seq((1L, ""), (2L, "solo")).toDF("doc_id", "text"), "text").isEmpty)
    intercept[IllegalArgumentException](
      TextAnalysis.textRankKeywords(df, "text", topK = 0))
  }

  test("tokenLabelMI: independent token scores 0, perfect predictor ln 2") {
    // d1 "x y" label 1, d2 "x z" label 0:
    // x: present in both -> MI 0; y: perfect predictor of label 1 ->
    // MI = .5 ln2 + .5 ln2 = ln 2 = 0.693147
    val df = Seq((1L, "x y", 1L), (2L, "x z", 0L)).toDF("doc_id", "text", "y")
    val got = TextAnalysis.tokenLabelMI(df, "doc_id", "text", "y",
        topK = 10, minDf = 1L)
      .as[(String, Long, Long, Double)].collect().toSeq
    val byTok = got.map(r => r._1 -> r).toMap
    assert(byTok("x") == (("x", 2L, 1L, 0.0d)), got.toString)
    assert(byTok("y") == (("y", 1L, 1L, 0.693147d)), got.toString)
    assert(byTok("z") == (("z", 1L, 0L, 0.693147d)), got.toString)
    // ordering: MI desc then token asc; x (MI 0) ranks last
    assert(got.map(_._1) == Seq("y", "z", "x"), got.toString)
    // minDf drops the singletons
    val cut = TextAnalysis.tokenLabelMI(df, "doc_id", "text", "y",
        topK = 10, minDf = 2L)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(cut.map(_._1) == Seq("x"), cut.toString)
    // repeated token in ONE doc counts once (presence, not frequency)
    val rep = Seq((1L, "x x x", 1L), (2L, "q", 0L)).toDF("doc_id", "text", "y")
    val r = TextAnalysis.tokenLabelMI(rep, "doc_id", "text", "y",
        topK = 10, minDf = 1L)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r.find(_._1 == "x").get._2 == 1L, r.toString)
    intercept[IllegalArgumentException](TextAnalysis.tokenLabelMI(
      Seq((1L, "x", 2L)).toDF("doc_id", "text", "y"),
      "doc_id", "text", "y"))
  }

  test("readability: hand-traced Flesch, no-vowel clamp, empty doc dropped") {
    // doc1: 5 words / 2 sentences / 5 syllables; doc2: 2 words /
    // 1 sentence / 2 syllables (vowel-less words clamp to 1)
    val df = Seq(("A", "The cat sat. It ran!"), ("A", "xyz 7"),
      ("A", "   ")).toDF("src", "text")
    val got = TextAnalysis.readability(df, "src", "text")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    // totals: 2 docs, 7 words, 3 sentences, 7 syllables ->
    // flesch = 206.835 - 1.015*(7/3) - 84.6*1 = 119.866667
    assert(got == Seq(("A", 2L, 7L, 3L, 7L, 2.333333d, 1.0d,
      119.866667d)), got.toString)
  }

  test("chao1Richness: hand-traced singleton/doubleton correction") {
    // A: tokens a a b c -> V=3, f1=2 (b,c), f2=1 (a)
    // chao1 = 3 + 2*1/(2*2) = 3.5; B: d d -> V=1, f1=0, f2=1 -> 1.0
    val df = Seq(("A", "a a b c"), ("B", "d d")).toDF("src", "text")
    val got = TextAnalysis.chao1Richness(df, "src", "text")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(("A", 3L, 2L, 1L, 3.5d), ("B", 1L, 0L, 1L, 1.0d)),
      got.toString)
    // empty-text group emits no row
    val e = TextAnalysis.chao1Richness(
      Seq(("A", "x"), ("B", "  ")).toDF("src", "text"), "src", "text")
      .select($"group").as[String].collect().toSeq
    assert(e == Seq("A"), e.toString)
  }

  test("keywordsLlr: hand-traced G2, overrepresentation gate, guards") {
    // A: x x y; B: y y z. A/x: a=2,b=0 -> g2 = 4 ln2 = 2.772589
    // A/y dropped (underrepresented); B/y: g2 = 2(2 ln(4/3)+ln(2/3))
    // = 0.339798; B/z: g2 = 2 ln2 = 1.386294
    val df = Seq(("A", "x x y"), ("B", "y y z")).toDF("src", "text")
    val got = TextAnalysis.keywordsLlr(df, "src", "text", topK = 5)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("A", "x", 2L, 0L, 2.772589d),
      ("B", "z", 1L, 0L, 1.386294d),
      ("B", "y", 2L, 1L, 0.339798d)), got.toString)
    // topK cuts per group by g2 desc
    val top1 = TextAnalysis.keywordsLlr(df, "src", "text", topK = 1)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(top1.map(r => (r._1, r._2)) == Set(("A", "x"), ("B", "z")),
      top1.toString)
    intercept[IllegalArgumentException](TextAnalysis.keywordsLlr(
      Seq(("A", "x")).toDF("src", "text"), "src", "text")) // 1 group
    intercept[IllegalArgumentException](TextAnalysis.keywordsLlr(
      df, "src", "text", topK = 0))
  }

  test("burrowsDelta: hand-traced three-source pair distances") {
    // A: x x x y (f: .75/.25), B: x y (.5/.5), C: y y (0/1)
    // both words share sigma = 0.311805 -> deltas 0.801784 /
    // 2.405351 / 1.603567
    val df = Seq(("A", "x x x y"), ("B", "x y"), ("C", "y y"))
      .toDF("src", "text")
    val got = TextAnalysis.burrowsDelta(df, "src", "text", topM = 2)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("A", "B", 2L, 0.801784d),
      ("A", "C", 2L, 2.405351d),
      ("B", "C", 2L, 1.603567d)), got.toString)
    // constant-rate words are dropped; all-constant fails typed
    intercept[IllegalArgumentException](TextAnalysis.burrowsDelta(
      Seq(("A", "x"), ("B", "x")).toDF("src", "text"), "src", "text"))
    intercept[IllegalArgumentException](TextAnalysis.burrowsDelta(
      Seq(("A", "x y")).toDF("src", "text"), "src", "text")) // 1 group
  }

  test("dispersionDp: exact integer numerators, hand-traced values") {
    // A: x x y (mass 3), B: x z (mass 2), N = 5
    // x: 0.5*(|10-9|+|5-6|)/15 = 0.066667; y: 0.5*(|5-3|+|0-2|)/5
    // = 0.4; z: 0.5*(|0-3|+|5-2|)/5 = 0.6
    val df = Seq(("A", "x x y"), ("B", "x z")).toDF("src", "text")
    val got = TextAnalysis.dispersionDp(df, "src", "text", topK = 3)
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("x", 3L, 0.066667d), ("y", 1L, 0.4d),
      ("z", 1L, 0.6d)), got.toString)
    // topK cuts by count desc then token asc
    val t1 = TextAnalysis.dispersionDp(df, "src", "text", topK = 1)
      .as[(String, Long, Double)].collect().toSeq
    assert(t1 == Seq(("x", 3L, 0.066667d)), t1.toString)
    intercept[IllegalArgumentException](TextAnalysis.dispersionDp(
      df, "src", "text", topK = 0))
  }

  test("ngramDiversity: per-order totals, distincts, NULL on no grams") {
    // A: a b a -> uni 3/2, bi {a b, b a} 2/2, tri {a b a} 1/1
    // B: c -> uni 1/1, bi 0 -> NULL ratio, tri 0 -> NULL
    val df = Seq(("A", "a b a"), ("B", "c")).toDF("src", "text")
    val got = TextAnalysis.ngramDiversity(df, "src", "text")
      .as[(String, Long, Long, Option[Double], Long, Long, Option[Double],
        Long, Long, Option[Double])].collect().toSet
    assert(got == Set(
      ("A", 3L, 2L, Some(0.666667d), 2L, 2L, Some(1.0d),
        1L, 1L, Some(1.0d)),
      ("B", 1L, 1L, Some(1.0d), 0L, 0L, None, 0L, 0L, None)),
      got.toString)
  }
}
