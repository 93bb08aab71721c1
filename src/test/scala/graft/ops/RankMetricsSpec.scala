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
}
