package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions.array_distinct

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "The quick  brown fox jumps over the lazy dog"), // exact dup after norm
    (2L, "the quick brown fox jumps over the lazy cat"),  // near dup (1 word)
    (3L, "completely different content about spark engines and parquet files"),
    (4L, "completely different content about spark engines and parquet files"), // exact dup
    (5L, "unrelated tiny doc")
  ).toDF("doc_id", "text")

  test("exact dedup groups by normalized fingerprint, keeps min id") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("keep_id"))).toSet
    assert(groups == Set((2L, 0L), (1L, 2L), (2L, 3L), (1L, 5L)))
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L, 5L))
  }

  test("shingles: w-gram sets of normalized text") {
    val sh = Dedup.shingles(Seq((0L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .select("shingle").as[String].collect().toSet
    assert(sh == Set("a b c", "b c d"))
  }

  test("jaccard pairs: exact overlap values") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", w = 3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("jaccard"))).toList.sortBy(p => (p._1, p._2))
    // docs 0/1 identical after norm → jaccard 1.0; 3/4 identical → 1.0
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    assert(pairs.exists(p => p._1 == 3L && p._2 == 4L && p._3 == 1.0))
    // docs 0/2 (9 words → 7 shingles each) share the 6 shingles not
    // touching the last word; union = 7+7-6 = 8 → jaccard 6/8 = 0.75
    val p02 = pairs.find(p => p._1 == 0L && p._2 == 2L).get
    assert(math.abs(p02._3 - 0.75) < 1e-12)
  }

  test("minhash LSH finds exact and near dups as candidates") {
    val cands = Dedup.minHashCandidates(docs, "doc_id", "text",
      numHashes = 32, bands = 8, w = 3, threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(cands.contains((0L, 1L))) // identical → all bands collide
    assert(cands.contains((3L, 4L)))
    // est_jaccard of identical docs is 1.0
    val est = Dedup.minHashCandidates(docs, "doc_id", "text")
      .filter($"a_id" === 0 && $"b_id" === 1)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("minhash rejects bands not dividing numHashes (mega-bucket guard)") {
    intercept[IllegalArgumentException](
      Dedup.minHashCandidates(docs, "doc_id", "text", numHashes = 8, bands = 16))
    intercept[IllegalArgumentException](
      Dedup.minHashCandidates(docs, "doc_id", "text", numHashes = 32, bands = 5))
  }

  test("simhash banding finds near-dup candidates within the hamming budget") {
    val cands = Dedup.simHashCandidates(docs, "doc_id", "text",
      maxHamming = 3, bands = 4)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("hamming"))).toList
    // exact dups (hamming 0) must be found
    assert(cands.exists(c => c._1 == 0L && c._2 == 1L && c._3 == 0L))
    assert(cands.exists(c => c._1 == 3L && c._2 == 4L && c._3 == 0L))
    // everything returned respects the budget
    assert(cands.forall(_._3 <= 3))
    // parameter validation
    intercept[IllegalArgumentException](
      Dedup.simHashCandidates(docs, "doc_id", "text", maxHamming = 4, bands = 4))
  }

  test("simhash: identical normalized texts share fingerprints; near dups are close") {
    val fps = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fps(0L) == fps(1L))
    assert(fps(3L) == fps(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(0L), fps(2L)) < hamming(fps(0L), fps(3L)))
  }

  // seeded random corpus shared by the two kernel-vs-portable tests:
  // messy whitespace, repeated words (tf > 1), docs below/at/above the
  // w=3 shingle threshold, multi-byte chars, empty and blank docs
  private def randomDocs(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("the", "quick", "brown", "fox", "fox", "über",
      "漢字", "data", "spark", "engine", "a", "b9", "🚀x", "naïve")
    (1 to 80).map { i =>
      val n = rnd.nextInt(12)
      val sep = if (rnd.nextBoolean()) " " else "   "
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(sep))
    }.toDF("doc_id", "text")
  }

  test("minhash kernel signatures are bit-identical to the portable pipeline") {
    val docs = randomDocs(7)
    val fast = Dedup.minHashSignatures(docs, "doc_id", "text", numHashes = 16, w = 3)
      .as[(Long, Seq[Long])].collect().toMap
    val slow = Dedup.minHashSignaturesPortable(docs, "doc_id", "text", numHashes = 16, w = 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fast.keySet == slow.keySet) // same docs survive the <w-words filter
    assert(fast.keySet.nonEmpty)
    fast.keySet.foreach { id => assert(fast(id) == slow(id), s"doc $id") }
  }

  test("distinct-ngram kernel is value-identical to the portable HOF pipeline") {
    // include the empty-text edge: for n=1 the HOF's split('') = ['']
    // yields the single code 0, which the kernel must reproduce
    val docs = randomDocs(13).union(Seq((9999L, "")).toDF("doc_id", "text"))
    for (n <- Seq(1, 2, 5, 8)) {
      val kernel = docs.select($"doc_id",
          Decontaminate.ngramSet($"text", n).as("ng"))
        .as[(Long, Seq[Long])].collect().toMap
      val portable = docs.select($"doc_id",
          array_distinct(TextAnalysis.ngramCodes($"text", n)).as("ng"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(kernel == portable, s"n=$n")
    }
  }

  test("positional-ngram kernel is value-identical to the HOF template") {
    // same identity as above but POSITIONAL (duplicates kept, index =
    // n-gram start) — the q225 contamination-runs fast path; includes
    // the empty-text edge (n=1 -> [0]) and a doc with repeated grams
    val docs = randomDocs(13)
      .union(Seq((9999L, ""), (9998L, "a b a b a b")).toDF("doc_id", "text"))
    for (n <- Seq(1, 2, 5, 8)) {
      val kernel = docs.select($"doc_id",
          graft.expr.DedupKernel.allNgramCodesCol(
            Dedup.normText($"text"), n).as("ng"))
        .as[(Long, Seq[Long])].collect().toMap
      val portable = docs.select($"doc_id",
          TextAnalysis.ngramCodes(Dedup.normText($"text"), n).as("ng"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(kernel == portable, s"n=$n")
    }
  }

  test("captureRecapture: hand-traced Chapman estimate; empty tiers degrade to zeros") {
    // n1=3, n2=2, overlap=1: est = 4*3/2 - 1 = 5, recalls 0.6 / 0.4
    val t1 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val t2 = Seq((2L, 1L), (4L, 5L), (4L, 5L), (5L, 5L)) // reversed + dup + self
      .toDF("a_id", "b_id")
    val got = Dedup.captureRecapture(t1, t2)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(got == ((3L, 2L, 1L, 5.0d, 0.6d, 0.4d)), got.toString)
    val empty = t1.filter($"a_id" < 0L)
    val zeros = Dedup.captureRecapture(empty, empty)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(zeros == ((0L, 0L, 0L, 0.0d, 0.0d, 0.0d)), zeros.toString)
    // one empty tier: est = 1*(n2+1)/1 - 1 = n2; tier2 "caught everything"
    val half = Dedup.captureRecapture(empty, t1)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(half == ((0L, 3L, 0L, 3.0d, 0.0d, 1.0d)), half.toString)
  }

  test("chunkDedupGroups finds duplicated windows with a deterministic survivor") {
    val boiler = (1 to 4).map(i => s"w$i").mkString(" ") // one 4-token window
    val docs = Seq(
      (3L, s"$boiler a3 b3 c3 d3"), // window 0 = boiler, window 1 unique
      (1L, s"$boiler a1 b1 c1 d1"),
      (2L, "entirely different text with other words here ok")).toDF("doc_id", "text")
    val got = Dedup.chunkDedupGroups(docs, "doc_id", "text", chunkTokens = 4)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 1)
    val (_, nCopies, nDocs, keepDoc, keepIdx) = got.head
    assert(nCopies == 2L && nDocs == 2L)
    assert(keepDoc == 1L && keepIdx == 0L, "survivor = lexicographic min (doc, idx)")
    // a doc repeating its own window counts as copies within one doc
    val selfDup = Seq((9L, s"$boiler $boiler")).toDF("doc_id", "text")
    val sd = Dedup.chunkDedupGroups(selfDup, "doc_id", "text", chunkTokens = 4)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(sd.size == 1 && sd.head._2 == 2L && sd.head._3 == 1L)
  }

  test("crossDocNgramStats counts n-grams shared across documents") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares its full 4-gram grid with doc 2
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six"),    // unique
      (4L, "tiny")).toDF("doc_id", "text")    // < n tokens: excluded
    val got = Dedup.crossDocNgramStats(docs, "doc_id", "text", n = 4)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1.0d), // 5 tokens -> 2 distinct 4-grams, both shared
      (2L, 2L, 2L, 1.0d),
      (3L, 3L, 0L, 0.0d)))
  }

  test("simhash kernel fingerprints are bit-identical to the portable pipeline") {
    val docs = randomDocs(11)
    val fast = Dedup.simHash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val slow = Dedup.simHashPortable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fast.keySet == slow.keySet) // same docs survive the empty filter
    assert(fast.keySet.nonEmpty)
    fast.keySet.foreach { id => assert(fast(id) == slow(id), s"doc $id") }
  }

  test("prefix-filtered jaccard join equals the all-pairs verifier (no false negatives)") {
    // differential over seeds AND thresholds: the candidates surviving
    // the prefix equi-join must contain every pair with J >= τ (the
    // theorem itself is ScalaCheck'd at 300 abstract cases in
    // PrefixFilterPropertySpec; this pins the Spark implementation)
    for ((seed, num, den) <- Seq((3, 1, 2), (11, 1, 2), (42, 1, 2),
        (7, 4, 5), (21, 1, 3))) {
      val docs = randomDocs(seed)
      val tau = num.toDouble / den
      val naive = Dedup.jaccardPairs(docs, "doc_id", "text", w = 2, threshold = tau)
        .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
      val pruned = Dedup.prefixJaccardJoin(docs, "doc_id", "text",
          tauNum = num, tauDen = den, w = 2)
        .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
      assert(pruned.keySet == naive.keySet, s"seed $seed τ=$num/$den: pair sets differ")
      naive.keySet.foreach { k =>
        assert(pruned(k) == naive(k), s"seed $seed τ=$num/$den: value differs at $k")
      }
    }
  }

  test("repeatedSpanRemoval deletes cross-doc spans, unions overlaps, ignores within-doc repeats") {
    val common = "c1 c2 c3 c4 c5 c6 c7 c8" // one shared 8-gram
    val corpus = Seq(
      (0L, common + " xa xb"),          // shared span at tokens 1-8
      (1L, "ya " + common + " yb"),     // same span at tokens 2-9
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"), // unique: untouched
      // within-doc repeat only — 8-gram repeated in ONE doc must not
      // count as duplicated (cross-doc means >= 2 distinct docs)
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpanRemoval(corpus, "doc_id", "text", n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))).toMap
    assert(got(0L) == ((10L, 1L, 8L, "xa xb")))
    assert(got(1L) == ((10L, 1L, 8L, "ya yb")))
    assert(got(2L) == ((9L, 0L, 0L,  "z1 z2 z3 z4 z5 z6 z7 z8 z9")))
    assert(got(3L)._2 == 0L, "within-doc repeat must not mark spans")
    assert(got(3L)._4.startsWith("w1 w2"))
  }

  test("repeatedSpanRemoval unions overlapping duplicated spans") {
    // docs 0 and 1 share TWO overlapping 8-grams (the 9-token run
    // s1..s9 duplicates both [s1..s8] and [s2..s9]); the union must
    // remove 9 tokens, not 16
    val run = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    val corpus = Seq(
      (0L, run + " xa"),
      (1L, "yb " + run)
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpanRemoval(corpus, "doc_id", "text", n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(got(0L) == ((2L, 9L, "xa")))
    assert(got(1L) == ((2L, 9L, "yb")))
  }

  test("maximalSpanRemoval coalesces runs into variable-length spans and thresholds on minLen") {
    // planted maximal-span cases (n = 8, minLen = 12):
    //  - A/B share a 20-token block → ONE maximal span of length 20
    //    (13 overlapping duplicated 8-grams coalesced), removed;
    //  - C/D share exactly one 8-gram → span length 8 < 12, SURVIVES;
    //  - G's two ADJACENT duplicated 8-grams (starts 1 and 9, gap = 8)
    //    coalesce into one 16-token span, removed — while H, sharing
    //    only the first block, keeps its lone short span.
    val s20 = (1 to 20).map(i => s"s$i").mkString(" ")
    val t8 = (1 to 8).map(i => s"t$i").mkString(" ")
    val x8 = (1 to 8).map(i => s"x$i").mkString(" ")
    val y8 = (1 to 8).map(i => s"y$i").mkString(" ")
    val corpus = Seq(
      (0L, s20 + " a1 a2 a3 a4"),                         // A: span [1,20]
      (1L, "b1 b2 b3 b4 b5 b6 " + s20 + " b7"),           // B: span [7,26]
      (2L, t8 + " c1 c2 c3 c4 c5"),                       // C: lone 8-gram
      (3L, "d1 d2 " + t8 + " d3 d4 d5"),                  // D: lone 8-gram
      (4L, x8 + " " + y8 + " g1 g2 g3"),                  // G: adjacent runs
      (5L, "h1 h2 h3 " + x8 + " h4 h5 h6 h7 h8 h9 h10"),  // H: x-block only
      (6L, "i1 i2 i3 i4 " + y8 + " i5 i6 i7 i8 i9 i10")   // I: y-block only
    ).toDF("doc_id", "text")
    val got = Dedup.maximalSpanRemoval(corpus, "doc_id", "text",
        n = 8, minLen = 12)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("max_span_len"),
          r.getAs[Long]("n_removed"), r.getAs[String]("spans_str"),
          r.getAs[String]("clean_text")))).toMap
    assert(got(0L) == ((1L, 20L, 20L, "1:20", "a1 a2 a3 a4")), s"${got(0L)}")
    assert(got(1L) == ((1L, 20L, 20L, "7:20", "b1 b2 b3 b4 b5 b6 b7")))
    // lone duplicated 8-gram survives the 12-token threshold verbatim
    assert(got(2L) == ((0L, 0L, 0L, "", t8 + " c1 c2 c3 c4 c5")))
    assert(got(3L) == ((0L, 0L, 0L, "", "d1 d2 " + t8 + " d3 d4 d5")))
    // adjacent duplicated 8-grams (gap exactly n) merge to one 16-span
    assert(got(4L) == ((1L, 16L, 16L, "1:16", "g1 g2 g3")), s"${got(4L)}")
    assert(got(5L)._1 == 0L, s"H's lone block must survive: ${got(5L)}")
    assert(got(6L)._1 == 0L, s"I's lone block must survive: ${got(6L)}")
    // minLen = n degrades to the q119 semantics on the lone-8-gram pair
    val loose = Dedup.maximalSpanRemoval(corpus, "doc_id", "text",
        n = 8, minLen = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_removed")).toMap
    assert(loose(2L) == 8L && loose(3L) == 8L)
    intercept[IllegalArgumentException] {
      Dedup.maximalSpanRemoval(corpus, "doc_id", "text", n = 8, minLen = 4)
    }
  }

  test("thresholdSweep: band histogram + cumulative merge curve, hand-checked") {
    val same = "the quick brown fox jumps over the lazy dog again and again"
    val near = same.replace("again and again", "again and often")
    val far = "completely unrelated text with different words throughout here"
    val docs = Seq((1L, same), (2L, same), (3L, near), (4L, far))
      .toDF("doc_id", "text")
    val got = Dedup.thresholdSweep(docs, "doc_id", "text")
      .as[(Double, Long, Long)].collect().sortBy(_._1).toSeq
    // identical pair (1,2) sits in the top band with est 1.0 → band 0.9
    assert(got.last._1 == 0.9, s"identical pair must land in band 0.9: $got")
    assert(got.last._2 >= 1L)
    // cum_pairs is the pair count at est >= band_lo: non-increasing in
    // band_lo, and the lowest band's cum equals the total pair count
    val cums = got.map(_._3)
    assert(cums == cums.sorted.reverse, s"cum must be non-increasing: $got")
    assert(got.head._3 == got.map(_._2).sum, s"lowest band cum = total: $got")
    // the sweep at open threshold contains every pair any positive
    // threshold would keep
    val at05 = Dedup.minHashCandidates(docs, "doc_id", "text", threshold = 0.5)
      .count()
    assert(got.filter(_._1 >= 0.5).map(_._2).sum == at05,
      s"bands >= 0.5 must sum to the 0.5-threshold candidate count: $got")
  }

  test("prefix jaccard rejects τ outside (0, 1]") {
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardJoin(docs, "doc_id", "text", tauNum = 0, tauDen = 5)
    }
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardJoin(docs, "doc_id", "text", tauNum = 6, tauDen = 5)
    }
  }

  test("cosineTfJoin: hand-traced quantized cosines at two thresholds") {
    // docs 1,2 identical (x y), doc 3 shares only x -> cos(1,3) = 0.5
    // on the micro grid (707107^2 overshoots 1 by ~6e-7, reported)
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"))
      .toDF("doc_id", "text")
    val hi = Dedup.cosineTfJoin(df, "doc_id", "text", threshold = 0.8d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(hi == Seq((1L, 2L, 1.000001d)), hi.toString)
    val lo = Dedup.cosineTfJoin(df, "doc_id", "text", threshold = 0.45d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(lo == Seq((1L, 2L, 1.000001d), (1L, 3L, 0.5d),
      (2L, 3L, 0.5d)), lo.toString)
    intercept[IllegalArgumentException](
      Dedup.cosineTfJoin(df, "doc_id", "text", threshold = 1.0d))
  }

  test("cosineTfJoin completeness: prefix filter equals brute force") {
    import org.apache.spark.sql.functions._
    // 24 docs over a 10-token vocabulary with repeated + shifted
    // emphasis — enough collisions that a broken prefix rule would
    // visibly drop pairs
    val vocab = "a b c d e f g h i j".split(" ")
    val docs = (0 until 24).map { i =>
      val words = (0 until 12).map(j => vocab((i * 7 + j * j + j) % 10))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.cosineTfJoin(docs, "doc_id", "text", threshold = 0.7d)
      .as[(Long, Long, Double)].collect().toSet
    // independent brute force on the same quantized grid
    val tok = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val f = tok.withColumn("nrm", sqrt(sum(col("c").cast("double") *
        col("c").cast("double")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")))))
      .withColumn("u",
        round(col("c").cast("double") * 1e6d / col("nrm")).cast("long"))
    val brute = f.as("a").join(f.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(sum(col("a.u").cast("decimal(38,0)") * col("b.u")).as("sim"))
      .filter(col("sim") >= lit(700000000000L).cast("decimal(38,0)"))
      .select(col("a_id"), col("b_id"),
        round(col("sim").cast("double") / 1e12d, 6).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "degenerate test corpus — no brute pairs")
    assert(got == brute,
      s"filter dropped ${brute -- got} / invented ${got -- brute}")
  }

  test("editNeighborJoin: hand-traced pairs, blocking ≡ brute force") {
    val names = Seq("cat", "cut", "cats", "dog", "ca", "c", "cat")
    val got = Dedup.editNeighborJoin(names.toDF("s"), "s")
      .as[(String, String, Long)].collect().toSet
    // "c" is under minLength; duplicate "cat" rows collapse
    assert(got == Set(("ca", "cat", 1L), ("cat", "cats", 1L),
      ("cat", "cut", 1L)), got.toString)
    // brute-force equivalence on a randomized small-alphabet corpus —
    // proves the deletion-neighborhood blocking COMPLETE for k = 1
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 120)
      .map(_ => (2 + rnd.nextInt(4)) match {
        case n => (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      })
    val blocked = Dedup.editNeighborJoin(corpus.toDF("s"), "s")
      .as[(String, String, Long)].collect().toSet
    val distinct = corpus.distinct.filter(_.length >= 2)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute2 = (for {
      a <- distinct; b <- distinct
      if a < b && lev(a, b) <= 1
    } yield (a, b, lev(a, b).toLong)).toSet
    assert(blocked == brute2,
      s"missed ${brute2 -- blocked} / invented ${blocked -- brute2}")
  }
}
