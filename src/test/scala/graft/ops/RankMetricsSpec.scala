package graft.ops

import graft.SparkSpecBase

class RankMetricsSpec extends SparkSpecBase {
  import spark.implicits._

  private def disc(rank: Int): Long =
    math.round(1e6 / (math.log(rank + 1.0) / math.log(2.0)))

  test("hand-checked MRR / precision / recall / nDCG, including the degenerate tails") {
    // q1: one of two relevant docs retrieved at rank 2
    // q2: nothing relevant exists (all-zero row, no NaNs)
    // q3: perfect retrieval (every metric = 1)
    val ranked = Seq(
      (1L, 101L, 1L), (1L, 102L, 2L), (1L, 103L, 3L),
      (2L, 201L, 1L), (2L, 202L, 2L), (2L, 203L, 3L),
      (3L, 301L, 1L), (3L, 302L, 2L), (3L, 303L, 3L)
    ).toDF("q_id", "doc_id", "rnk")
    val labels = Seq(
      (1L, 102L), (1L, 999L),
      (3L, 301L), (3L, 302L), (3L, 303L)
    ).toDF("q_id", "doc_id")
    val got = RankMetrics.rankingMetrics(ranked, labels,
        "q_id", "doc_id", "rnk", k = 3)
      .orderBy($"q_id")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq

    val ndcg1 = BigDecimal(disc(2).toDouble / (disc(1) + disc(2)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (1L, 2L, 0.5, 0.333333, 0.5, ndcg1),
      (2L, 0L, 0.0, 0.0, 0.0, 0.0),
      (3L, 3L, 1.0, 1.0, 1.0, 1.0)), s"$got")
  }

  test("ranks beyond k are ignored; duplicate labels collapse") {
    val ranked = Seq((1L, 11L, 1L), (1L, 12L, 2L), (1L, 13L, 9L))
      .toDF("q_id", "doc_id", "rnk")
    val labels = Seq((1L, 13L), (1L, 13L), (1L, 12L))
      .toDF("q_id", "doc_id")
    val got = RankMetrics.rankingMetrics(ranked, labels,
        "q_id", "doc_id", "rnk", k = 2)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    // rank-9 hit is outside k=2; labels dedupe to {12, 13} → n_rel 2
    assert(got._2 == 2L)
    assert(got._3 == 0.5) // first relevant inside k is rank 2
    assert(got._4 == 0.5 && got._5 == 0.5)
    intercept[IllegalArgumentException](
      RankMetrics.rankingMetrics(ranked, labels, "q_id", "doc_id", "rnk", 0))
  }

  test("rankBiasedOverlap: identical rankings score ~1, disjoint 0, hand-checked partial") {
    val w = RankMetrics.rboWeightsMicro(3, 0.9)
    def rbo(rows: Seq[(Long, String, Long)], other: Seq[(Long, String, Long)]) =
      RankMetrics.rankBiasedOverlap(
        rows.toDF("q", "d", "r"), other.toDF("q", "d", "r"), "q", "d", "r",
        k = 3)
        .orderBy("q").as[(Long, Long, Double)].collect().toSeq
    val ident = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L))
    val identGot = rbo(ident, ident)
    // identical rankings: every item contributes W(its own rank); the
    // normalized weights sum to ~1e6 up to per-entry rounding
    val identExp = math.round(w.sum.toDouble) / 1e6d
    assert(identGot == Seq((1L, 3L, identExp)), identGot.toString)
    assert(math.abs(identExp - 1.0d) < 1e-5)
    // disjoint rankings still emit the query with rbo 0
    val disj = rbo(ident, Seq((1L, "x", 1L), (1L, "y", 2L), (1L, "z", 3L)))
    assert(disj == Seq((1L, 0L, 0.0d)))
    // partial: swap ranks 1/2 in B → both a and b first co-occur at
    // depth 2 (W(2) each), c at 3
    val swapped = Seq((1L, "b", 1L), (1L, "a", 2L), (1L, "c", 3L))
    val part = rbo(ident, swapped)
    val exp = math.round((2L * w(1) + w(2)).toDouble) / 1e6d
    assert(part == Seq((1L, 3L, exp)), part.toString)
    // a query present only in ONE ranking still emits an all-zero row
    val extra = rbo(ident :+ ((2L, "a", 1L)), ident)
    assert(extra.map(x => (x._1, x._2)) == Seq((1L, 3L), (2L, 0L)))
    intercept[IllegalArgumentException](
      RankMetrics.rankBiasedOverlap(ident.toDF("q", "d", "r"),
        ident.toDF("q", "d", "r"), "q", "d", "r", k = 3, p = 1.0))
  }

  test("rrfFuse: hand-checked fusion, competition-rank ties, topN cut, typed guards") {
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "sa")
    val b = Seq((1L, 0.1), (2L, 0.3), (3L, 0.2)).toDF("id", "sb")
    val got = RankMetrics.rrfFuse(a, b, "id", "sa", "sb", k0 = 60, topN = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // nano contributions: r1 -> 16393443, r2 -> 16129032, r3 -> 15873016
    assert(got == Seq(
      (2L, 2L, 1L, 32522475L, 0.032522d),
      (1L, 1L, 3L, 32266459L, 0.032266d),
      (3L, 3L, 2L, 32002048L, 0.032002d)), got.toString)
    // ties share the competition rank; the next rank skips
    val at = Seq((1L, 0.5), (2L, 0.5), (3L, 0.4)).toDF("id", "sa")
    val ranks = RankMetrics.rrfFuse(at, at.withColumnRenamed("sa", "sb"),
        "id", "sa", "sb", k0 = 60, topN = 3)
      .select($"id", $"rank_a").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(ranks == Seq((1L, 1L), (2L, 1L), (3L, 3L)), ranks.toString)
    // topN cut + id tie-break on equal fused scores
    val cut = RankMetrics.rrfFuse(at, at.withColumnRenamed("sa", "sb"),
        "id", "sa", "sb", k0 = 60, topN = 1)
      .select($"id").as[Long].collect().toSeq
    assert(cut == Seq(1L))
    intercept[IllegalArgumentException](
      RankMetrics.rrfFuse(Seq((1L, Option.empty[Double])).toDF("id", "sa"),
        b, "id", "sa", "sb"))
    intercept[IllegalArgumentException](
      RankMetrics.rrfFuse(a, b, "id", "sa", "sb", k0 = 0))
  }

  test("spearman: hand-checked tie case, perfect/reversed, constants, guards") {
    val a = Seq((1L, 0.1), (2L, 0.2), (3L, 0.3), (4L, 0.4)).toDF("id", "sa")
    // b has a tie at 0.5 -> fractional ranks (1.5, 1.5, 3, 4):
    // doubled ranks x=(2,4,6,8), y=(3,3,6,8) => rho = 72/sqrt(80*72)
    val b = Seq((1L, 0.5), (2L, 0.5), (3L, 0.7), (4L, 0.9)).toDF("id", "sb")
    val got = RankMetrics.spearman(a, b, "id", "sa", "sb")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((4L, 4L, 3L, 0.948683)), got.toString)

    // same ordering at a different scale is rho = 1; reversal is -1
    val b2 = a.select($"id", ($"sa" * 100.0 + 7.0).as("sb"))
    val one = RankMetrics.spearman(a, b2, "id", "sa", "sb")
      .select($"rho").as[Double].head()
    assert(one == 1.0)
    val b3 = a.select($"id", (-$"sa").as("sb"))
    val neg = RankMetrics.spearman(a, b3, "id", "sa", "sb")
      .select($"rho").as[Double].head()
    assert(neg == -1.0)

    // a constant signal has zero rank variance: documented rho = 0.0
    val const = Seq((1L, 0.5), (2L, 0.5), (3L, 0.5)).toDF("id", "sb")
    val z = RankMetrics.spearman(a.filter($"id" <= 3), const,
        "id", "sa", "sb")
      .select($"rho").as[Double].head()
    assert(z == 0.0)

    intercept[IllegalArgumentException](
      RankMetrics.spearman(Seq((1L, Option.empty[Double])).toDF("id", "sa"),
        b, "id", "sa", "sb").collect())
  }

  test("kendallTau: hand-traced pair classification with ties") {
    // x = (1,2,2,3), y = (1,2,3,1): pairs (1,2)C (1,3)C (1,4)tie_y
    // (2,3)tie_x (2,4)D (3,4)D -> C=2 D=2 tx=1 ty=1, tau = 0
    val g = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 2.0, 3.0),
      (4L, 3.0, 1.0)).toDF("k", "x", "y")
    val got = RankMetrics.kendallTau(g, "k", "x", "y")
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    assert(got == ((4L, 6L, 2L, 2L, 1L, 1L, 0.0d)), got.toString)
    // x = (1,2,2,3), y = (1,2,3,4): C=5, tx=1 ->
    // tau = 5 / sqrt(5*6) = 0.912871
    val g2 = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 2.0, 3.0),
      (4L, 3.0, 4.0)).toDF("k", "x", "y")
    val got2 = RankMetrics.kendallTau(g2, "k", "x", "y")
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    assert(got2 == ((4L, 6L, 5L, 0L, 1L, 0L, 0.912871d)), got2.toString)
  }

  test("kendallTau: perfect/reversed/constant, guards, partition invariance") {
    val mono = (1L to 8L).map(i => (i, i.toDouble, i * 2.0)).toDF("k", "x", "y")
    assert(RankMetrics.kendallTau(mono, "k", "x", "y")
      .select($"tau_b").as[Double].head() == 1.0d)
    val rev = (1L to 8L).map(i => (i, i.toDouble, -i * 2.0)).toDF("k", "x", "y")
    assert(RankMetrics.kendallTau(rev, "k", "x", "y")
      .select($"tau_b").as[Double].head() == -1.0d)
    // a constant side: zero comparable variance -> documented 0.0
    val const = (1L to 5L).map(i => (i, i.toDouble, 3.0)).toDF("k", "x", "y")
    assert(RankMetrics.kendallTau(const, "k", "x", "y")
      .select($"tau_b").as[Double].head() == 0.0d)
    val rep = RankMetrics.kendallTau(rev.repartition(4), "k", "x", "y")
      .select($"tau_b").as[Double].head()
    assert(rep == -1.0d)
    intercept[IllegalArgumentException](RankMetrics.kendallTau(
      Seq((1L, 1.0, Option.empty[Double])).toDF("k", "x", "y"),
      "k", "x", "y"))
    intercept[IllegalArgumentException](RankMetrics.kendallTau(
      Seq((1L, 1.0, 1.0), (1L, 2.0, 2.0)).toDF("k", "x", "y"),
      "k", "x", "y"))
  }
}
