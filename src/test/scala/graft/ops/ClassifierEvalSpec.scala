package graft.ops

import graft.SparkSpecBase

class ClassifierEvalSpec extends SparkSpecBase {
  import spark.implicits._

  test("cohenKappa matches the hand-computed identity on a known confusion") {
    // classic 2×2: a=20 both-yes, d=15 both-no, b=5, c=10 → N=50,
    // agree=35, po=0.7; marginals A: yes 25, no 25; B: yes 30, no 20 →
    // pe = (25·30 + 25·20)/2500 = 0.5 → kappa = 0.2/0.5 = 0.4
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = ClassifierEval.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.toSeq == Seq((50L, 35L, 0.7d, 0.5d, 0.4d)), out.toSeq.toString)
  }

  test("cohenKappa: chance-level agreement reports ~0; degenerate constant pair reports 1") {
    // independent marginals engineered so po == pe exactly → kappa = 0
    val rows =
      Seq.fill(9)(("y", "y")) ++ Seq.fill(21)(("y", "n")) ++
      Seq.fill(21)(("n", "y")) ++ Seq.fill(49)(("n", "n"))
    val k0 = ClassifierEval.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .select("kappa").as[Double].head()
    assert(k0 == 0.0d, s"po==pe must give kappa 0, got $k0")
    val k1 = ClassifierEval.cohenKappa(
      Seq.fill(7)(("x", "x")).toDF("a", "b"), "a", "b")
      .select("kappa").as[Double].head()
    assert(k1 == 1.0d, s"constant agreeing pair must report 1.0, got $k1")
  }

  test("cohenKappa and classificationReport fail typed on NULL labels") {
    val df = Seq(("y", Some("y")), ("n", None)).toDF("a", "b")
    val e1 = intercept[IllegalArgumentException] {
      ClassifierEval.cohenKappa(df, "a", "b").collect()
    }
    assert(e1.getMessage.contains("non-NULL"))
    intercept[IllegalArgumentException] {
      ClassifierEval.classificationReport(df, "a", "b").collect()
    }
  }

  test("fleissKappa matches the hand-computed identity; unanimous input reports 1; NULL fails typed") {
    // S2=28, N=4, n=3, Nn=12: p_bar=16/24, C=(6,6) -> c2=72, p_e=0.5,
    // kappa = (192-144)/(2*72) = 1/3
    val rows = Seq(
      (1L, "a", "a", "a"),
      (2L, "a", "a", "b"),
      (3L, "b", "b", "b"),
      (4L, "a", "b", "b")).toDF("item", "r1", "r2", "r3")
    val out = ClassifierEval.fleissKappa(rows, "item", Seq("r1", "r2", "r3"))
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out == ((4L, 3L, 0.666667d, 0.5d, 0.333333d)), out.toString)
    // partition-layout independence
    val rep = ClassifierEval.fleissKappa(rows.repartition(5), "item",
      Seq("r1", "r2", "r3")).as[(Long, Long, Double, Double, Double)].head()
    assert(rep == out)
    val unanimous = Seq((1L, "k", "k"), (2L, "k", "k")).toDF("item", "r1", "r2")
    val k1 = ClassifierEval.fleissKappa(unanimous, "item", Seq("r1", "r2"))
      .select("kappa").as[Double].head()
    assert(k1 == 1.0d)
    val withNull = Seq((1L, Some("a"), "a"), (2L, None, "b"))
      .toDF("item", "r1", "r2")
    intercept[IllegalArgumentException] {
      ClassifierEval.fleissKappa(withNull, "item", Seq("r1", "r2"))
    }
    intercept[IllegalArgumentException] {
      ClassifierEval.fleissKappa(rows, "item", Seq("r1"))
    }
  }

  test("classificationReport: per-class P/R/F1, zero rows for one-sided classes") {
    // gold: a×3, b×2, c×1; predicted: a hits 2/3, b never predicted,
    // d hallucinated twice
    val rows = Seq(
      ("a", "a"), ("a", "a"), ("a", "d"),
      ("b", "d"), ("b", "c"),
      ("c", "c"))
    val out = ClassifierEval.classificationReport(rows.toDF("g", "p"), "g", "p")
      .orderBy("class")
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    // tp: a=2, c=1 (gold c predicted c), d=0 (no gold d), b=0
    // f1: a = 4/(3+2)=0.8; b = 0; c = 2/(1+2)=0.666667; d = 0
    // macroF1 over 4 classes = (800000+0+666667+0)/(4·1e6)
    val macroF1 = math.round((800000L + 666667L) / 4.0d) / 1e6d // = 0.366667
    assert(out == Seq(
      ("a", 3L, 2L, 2L, 1.0d, 0.666667d, 0.8d, macroF1),
      ("b", 2L, 0L, 0L, 0.0d, 0.0d, 0.0d, macroF1),
      ("c", 1L, 2L, 1L, 0.5d, 1.0d, 0.666667d, macroF1),
      ("d", 0L, 2L, 0L, 0.0d, 0.0d, 0.0d, macroF1)), out.toString)
  }
}
