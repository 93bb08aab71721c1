package graft.ops

import graft.SparkSpecBase

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(seed: Int, dim: Int = 16): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextFloat() * 2 - 1)
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    d / (na * nb)
  }

  test("bruteForceTopK matches a naive scala computation") {
    val cands = (0 until 50).map(i => (i.toLong, vec(i))).toDF("n_id", "nv")
    val queries = Seq((100L, vec(1000)), (101L, vec(1001))).toDF("q_id", "qv")
    val got = Similarity.bruteForceTopK(queries, cands, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rnk")) ->
        r.getAs[Long]("n_id")).toMap
    for (qSeed <- Seq(1000, 1001)) {
      val qv = vec(qSeed)
      val expected = (0 until 50).map(i => i.toLong -> cos(vec(i), qv))
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      val qid = qSeed - 900L
      expected.zipWithIndex.foreach { case (nid, rank) =>
        assert(got((qid, rank + 1)) == nid, s"q$qid rank ${rank + 1}")
      }
    }
  }

  test("SRP bucketing: identical vectors share a bucket; buckets bounded by 2^planes") {
    val df = (0 until 20).map(i => (i.toLong, vec(i % 10))).toDF("n_id", "nv")
    val bucketed = Similarity.withBucket(df, "nv", numPlanes = 8, dim = 16)
    val buckets = bucketed.select("n_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert((0 until 10).forall(i => buckets(i.toLong) == buckets(i.toLong + 10)))
    assert(buckets.values.forall(b => b >= 0 && b < 256))
  }

  test("lshBucketTopK finds an identical vector (self-similarity 1.0)") {
    val cands = (0 until 200).map(i => (i.toLong, vec(i))).toDF("n_id", "nv")
    val queries = Seq((999L, vec(7))).toDF("q_id", "qv") // identical to candidate 7
    val got = Similarity.lshBucketTopK(queries, cands, k = 3,
      numPlanes = 10, dim = 16)
      .collect().map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("n_id")))
    assert(got.nonEmpty && got.minBy(_._1)._2 == 7L)
  }

  test("bucketedNearDupPairs: subset of exact pairs; full recall on planted dups") {
    val base = (0 until 60).map(i => (i.toLong, vec(i)))
    // three exact copies — true near-dups (θ=0) must ALWAYS be found
    val planted = base ++ Seq((100L, vec(3)), (101L, vec(17)), (102L, vec(42)))
    val df = planted.toDF("id", "embedding")
    val exact = Similarity.nearDupPairs(df, "id", "embedding", 0.2)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val bucketed = Similarity.bucketedNearDupPairs(df, "id", "embedding", 0.2,
      numPlanes = 5, dim = 16, numTables = 10)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(bucketed.subsetOf(exact), "bucketed candidates must verify exactly")
    assert(Set((3L, 100L), (17L, 101L), (42L, 102L)).subsetOf(bucketed),
      "identical vectors share every bucket — recall 1.0 for true dups")
  }

  test("bucketedNearDupPairs plans an equi-join — no cartesian, no nested loop") {
    val df = (0 until 40).map(i => (i.toLong, vec(i))).toDF("id", "embedding")
    val p = Similarity.bucketedNearDupPairs(df, "id", "embedding", 0.5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"bucketed near-dup must join on (table, bucket):\n$p")
  }

  test("nearDupPairs finds planted duplicates at high threshold") {
    val base = (0 until 30).map(i => (i.toLong, vec(i)))
    val planted = base :+ (100L, vec(3)) // exact copy of id 3
    val got = Similarity.nearDupPairs(
      planted.toDF("id", "embedding"), "id", "embedding", 0.99)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(got == Set((3L, 100L)))
  }

  test("marginKnn matches a naive per-pair reference computation") {
    val queries = Seq((0L, vec(500)), (1L, vec(501)), (2L, vec(502)))
      .toDF("q_id", "qv")
    val cands = (10 until 30).map(i => (i.toLong, vec(i))).toDF("n_id", "nv")
    val (kQ, kN) = (5, 2)
    // naive reference: same micro-quantization, exact long top-k sums
    // HALF_UP like Spark's round() — math.round floors negative halves
    def micro(a: Array[Float], b: Array[Float]): Long =
      BigDecimal(cos(a, b) * 1e6d)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val qv = Map(0L -> vec(500), 1L -> vec(501), 2L -> vec(502))
    val nv = (10 until 30).map(i => i.toLong -> vec(i)).toMap
    val sims = for (q <- qv.keys; n <- nv.keys) yield (q, n, micro(nv(n), qv(q)))
    val xs = qv.keys.map(q => q -> sims.filter(_._1 == q).toSeq
      .sortBy(t => (-t._3, t._2)).take(kQ).map(_._3).sum).toMap
    val ys = nv.keys.map(n => n -> sims.filter(_._2 == n).toSeq
      .sortBy(t => (-t._3, t._1)).take(kN).map(_._3).sum).toMap
    val expected = sims.map { case (q, n, sm) =>
      (q, n) -> BigDecimal(sm.toDouble * 2.0d /
          (xs(q).toDouble / kQ + ys(n).toDouble / kN))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Similarity.marginKnn(queries, cands, kQ, kN)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        r.getAs[Double]("margin")).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"pair $k") }
  }

  test("marginKnn demotes hub vectors relative to raw cosine") {
    // three orthogonal queries; a hub at their centroid (moderate cosine
    // to ALL queries) vs per-query partners (high cosine to ONE query).
    // margin must rank each partner further above the hub than raw
    // cosine does — the Artetxe & Schwenk hubness correction.
    val e = (i: Int) => Array.tabulate(4)(j => if (j == i) 1f else 0f)
    val queries = Seq((0L, e(0)), (1L, e(1)), (2L, e(2))).toDF("q_id", "qv")
    val hub = Array(0.577f, 0.577f, 0.577f, 0f)
    val partner = (i: Int) => Array.tabulate(4)(j =>
      if (j == i) 0.95f else if (j == 3) 0f else 0.2f)
    val cands = Seq((10L, partner(0)), (11L, partner(1)), (12L, partner(2)),
      (99L, hub)).toDF("n_id", "nv")
    val m = Similarity.marginKnn(queries, cands, kQ = 4, kN = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        (r.getAs[Double]("cos_sim"), r.getAs[Double]("margin"))).toMap
    for ((q, p) <- Seq((0L, 10L), (1L, 11L), (2L, 12L))) {
      val (cosP, marP) = m((q, p))
      val (cosH, marH) = m((q, 99L))
      assert(marP / marH > cosP / cosH,
        s"q$q: margin must widen partner-vs-hub beyond raw cosine " +
          s"(cos $cosP vs $cosH, margin $marP vs $marH)")
    }
  }

  test("mmrRerank demotes a near-duplicate of the top hit below a diverse one") {
    def at(xs: Float*) = xs.toArray.padTo(16, 0f)
    // 11 is a near-copy of top hit 10 (cosine ≈ 1, rel barely lower);
    // 13 is diverse with clearly lower rel — raw ranking puts 11 second,
    // MMR (λ=0.7) must put 13 second
    val cands = Seq(
      (10L, at(1f, 0.1f), 0.99),
      (11L, at(1f, 0.12f), 0.98),
      (13L, at(0.2f, 0.9f), 0.80))
      .toDF("vec_id", "embedding", "rel")
    val got = Similarity.mmrRerank(cands, "vec_id", "embedding", "rel", k = 3)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(10L, 13L, 11L), s"MMR order wrong: $got")
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    // first pick's score is λ·rel; scores are non-increasing here
    assert(got.head._4 == 0.693)
    assert(got.map(_._4) == got.map(_._4).sortBy(-(_: Double)))
  }

  test("mmrRerank fails loudly (typed, not OOM) on an over-sized candidate frame") {
    val df = (0L until 30L).map(i => (i, vec(i.toInt, 16), (100 - i).toDouble / 100))
      .toDF("vec_id", "embedding", "rel")
    val e = intercept[IllegalArgumentException](
      Similarity.mmrRerank(df, "vec_id", "embedding", "rel", k = 3,
        maxCandidates = 20))
    assert(e.getMessage.contains("maxCandidates"), e.getMessage)
    // within the ceiling the result is unchanged by the probe limit
    val ok = Similarity.mmrRerank(df, "vec_id", "embedding", "rel", k = 3,
      maxCandidates = 30)
    assert(ok.count() == 3L)
    intercept[IllegalArgumentException](
      Similarity.mmrRerank(df, "vec_id", "embedding", "rel", k = 5,
        maxCandidates = 4)) // maxCandidates < k is a caller bug
  }

  test("mmrRerank caps at the candidate count and is deterministic") {
    val df = (0L until 12L).map(i => (i, vec(i.toInt, 16), (100 - i).toDouble / 100))
      .toDF("vec_id", "embedding", "rel")
    val a = Similarity.mmrRerank(df, "vec_id", "embedding", "rel", k = 20)
      .collect().toSeq
    assert(a.size == 12)
    val b = Similarity.mmrRerank(df.repartition(5), "vec_id", "embedding", "rel", k = 20)
      .collect().toSeq
    assert(a == b)
  }

  test("kCenterGreedy picks the farthest point each round, hand-checked") {
    // 1-D geometry in a 16-dim carrier: positions 0, 1, 10, 11, 100
    def at(x: Float) = { val v = new Array[Float](16); v(0) = x; v }
    val df = Seq(
      (0L, at(0f)), (1L, at(1f)), (2L, at(10f)), (3L, at(11f)), (4L, at(100f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterGreedy(df, "vec_id", "embedding", k = 4)
      .as[(Long, Long, Double)].collect().toSeq
    // seed = id 0 at 0; farthest = 100 (id 4); then 11 (id 3: min dist to
    // {0,100} is 11 vs 10 for id 2); then ids 1 and 2 BOTH sit at min
    // dist 1 (1→0, 10→11) — the ascending-id tie-break picks id 1
    assert(got.map(_._2) == Seq(0L, 4L, 3L, 1L), s"order wrong: $got")
    assert(got.map(_._3) == Seq(0.0, 100.0, 11.0, 1.0), s"radii wrong: $got")
  }

  test("kCenterGreedy radii are non-increasing after the seed and partition-independent") {
    val df = (0L until 50L).map(i => (i, vec(i.toInt, 16))).toDF("vec_id", "embedding")
    val a = Similarity.kCenterGreedy(df, "vec_id", "embedding", k = 6)
      .as[(Long, Long, Double)].collect().toSeq
    val radii = a.drop(1).map(_._3)
    assert(radii == radii.sortBy(-_), s"coverage radius must not increase: $a")
    assert(a.map(_._2).distinct.size == 6)
    val b = Similarity.kCenterGreedy(df.repartition(7), "vec_id", "embedding", k = 6)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }
}
