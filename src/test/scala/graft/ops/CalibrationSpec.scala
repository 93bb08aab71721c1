package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-checked reliability bins and ECE") {
    // bin 1 (conf .10-.19): confs .10/.12 → mean .11, labels 1,0 → acc .5
    // bin 9 (conf ≥ .9):    confs .95/1.0 → mean .975, labels 1,1 → acc 1
    val pred = Seq((1L, 0.10), (2L, 0.12), (3L, 0.95), (4L, 1.0))
      .toDF("id", "conf")
    val lab = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("id", "y")
    val got = Calibration.reliability(pred, lab, "id", "conf", "y", bins = 10)
      .orderBy($"bin")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    // gaps: |.11 − .5| = .39, |.975 − 1| = .025; ECE = (2·.39 + 2·.025)/4
    assert(got == Seq(
      (1L, 2L, 0.11, 0.5, 0.39, 0.2075),
      (9L, 2L, 0.975, 1.0, 0.025, 0.2075)), s"$got")
  }

  test("temperatureSweep: T = 1 reproduces reliability's ECE; argmin flagged once; typed guards") {
    val pred = Seq((1L, 2.0), (2L, -1.0), (3L, 0.2), (4L, -0.4))
      .toDF("id", "score")
    val lab = Seq((1L, 1L), (2L, 0L), (3L, 0L), (4L, 1L)).toDF("id", "y")
    val sweep = Calibration.temperatureSweep(pred, lab, "id", "score", "y",
        bins = 10, tGrid = Seq(0.5, 1.0, 2.0))
      .orderBy($"t")
      .as[(Double, Double, Long)].collect().toSeq
    assert(sweep.map(_._1) == Seq(0.5, 1.0, 2.0))
    assert(sweep.map(_._3).sum == 1L, s"exactly one argmin flag: $sweep")
    // T = 1 is plain sigmoid — its ECE must equal the reliability audit's
    val conf1 = pred.withColumn("conf",
      round(lit(1.0d) / (lit(1.0d) + exp(negate($"score"))), 6))
    val eceRel = Calibration.reliability(conf1, lab, "id", "conf", "y", 10)
      .select($"ece").as[Double].head()
    val eceT1 = sweep.find(_._1 == 1.0).get._2
    assert(eceT1 == eceRel, s"T=1 sweep $eceT1 != reliability $eceRel")
    intercept[IllegalArgumentException](
      Calibration.temperatureSweep(pred,
        Seq((1L, 5L)).toDF("id", "y"), "id", "score", "y"))
    intercept[IllegalArgumentException](
      Calibration.temperatureSweep(pred, lab, "id", "score", "y",
        tGrid = Seq(0.5, -1.0)))
    intercept[IllegalArgumentException](
      Calibration.temperatureSweep(pred, lab, "id", "score", "y",
        tGrid = Seq(0.5, 0.5)))
  }

  test("conf = 1.0 lands in the top bin; range violations fail typed") {
    val okPred = Seq((1L, 1.0)).toDF("id", "conf")
    val lab = Seq((1L, 1L)).toDF("id", "y")
    val top = Calibration.reliability(okPred, lab, "id", "conf", "y", 10)
      .select($"bin").as[Long].head()
    assert(top == 9L)
    val badPred = Seq((1L, 1.5)).toDF("id", "conf")
    val e = intercept[IllegalArgumentException](
      Calibration.reliability(badPred, lab, "id", "conf", "y", 10))
    assert(e.getMessage.contains("[0, 1]"), e.getMessage)
    val badLab = Seq((1L, 2L)).toDF("id", "y")
    intercept[IllegalArgumentException](
      Calibration.reliability(okPred, badLab, "id", "conf", "y", 10))
    intercept[IllegalArgumentException](
      Calibration.reliability(okPred, lab, "id", "conf", "y", bins = 1))
  }

  test("NULL confidences/labels fail typed instead of silently binning") {
    val lab = Seq((1L, 1L), (2L, 0L)).toDF("id", "y")
    val nullPred = Seq((1L, Some(0.5)), (2L, None)).toDF("id", "conf")
    intercept[IllegalArgumentException](
      Calibration.reliability(nullPred, lab, "id", "conf", "y", 10))
    intercept[IllegalArgumentException](
      Calibration.temperatureSweep(nullPred, lab, "id", "conf", "y"))
    val pred = Seq((1L, 0.5), (2L, 0.7)).toDF("id", "conf")
    val nullLab = Seq((1L, Some(1L)), (2L, None)).toDF("id", "y")
    intercept[IllegalArgumentException](
      Calibration.reliability(pred, nullLab, "id", "conf", "y", 10))
    intercept[IllegalArgumentException](
      Calibration.binaryAuc(pred, nullLab, "id", "conf", "y"))
  }

  test("binaryAuc: hand-checked rank-sum AUC with exact tie handling") {
    def auc(ps: Seq[(Long, Double)], ls: Seq[(Long, Long)]) =
      Calibration.binaryAuc(ps.toDF("id", "conf"), ls.toDF("id", "y"),
          "id", "conf", "y")
        .select($"n_pos", $"n_neg", $"auc")
        .as[(Long, Long, Double)].head()
    // perfect separation → 1.0; reversed → 0.0
    assert(auc(Seq(1L -> 0.9, 2L -> 0.8, 3L -> 0.3, 4L -> 0.1),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L)) == ((2L, 2L, 1.0)))
    assert(auc(Seq(1L -> 0.1, 2L -> 0.2, 3L -> 0.8, 4L -> 0.9),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L)) == ((2L, 2L, 0.0)))
    // mixed: pairs (0.8>0.6)✓ (0.8>0.2)✓ (0.4<0.6)✗ (0.4>0.2)✓ → 0.75
    assert(auc(Seq(1L -> 0.8, 2L -> 0.4, 3L -> 0.6, 4L -> 0.2),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L)) == ((2L, 2L, 0.75)))
    // exact tie counts half
    assert(auc(Seq(1L -> 0.5, 2L -> 0.5), Seq(1L -> 1L, 2L -> 0L))
      == ((1L, 1L, 0.5)))
    // one-class degenerate reports the chance value
    assert(auc(Seq(1L -> 0.9, 2L -> 0.8), Seq(1L -> 1L, 2L -> 1L))
      == ((2L, 0L, 0.5)))
  }

  test("averagePrecision: hand-checked step AP, prevalence baseline, degenerate zero-positive") {
    def ap(ps: Seq[(Long, Double)], ls: Seq[(Long, Long)]) =
      Calibration.averagePrecision(ps.toDF("id", "conf"), ls.toDF("id", "y"),
          "id", "conf", "y")
        .select($"n_pos", $"n_neg", $"n_thresholds", $"prevalence", $"ap")
        .as[(Long, Long, Long, Double, Double)].head()
    // perfect separation: every positive ranked above every negative
    assert(ap(Seq(1L -> 0.9, 2L -> 0.8, 3L -> 0.3, 4L -> 0.1),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
      == ((2L, 2L, 4L, 0.5, 1.0)))
    // thresholds desc: .9 P=1 (np=1), .8 P=1 (np=1), .7 P=2/3 (np=0),
    // .6 P=3/4 (np=1) -> tsum = 1e6 + 1e6 + 750000; AP = 2.75/3
    assert(ap(Seq(1L -> 0.9, 2L -> 0.8, 3L -> 0.7, 4L -> 0.6),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
      == ((3L, 1L, 4L, 0.75, 0.916667)))
    // exact tie: one grid row, P = 1/2
    assert(ap(Seq(1L -> 0.5, 2L -> 0.5), Seq(1L -> 1L, 2L -> 0L))
      == ((1L, 1L, 1L, 0.5, 0.5)))
    // zero positives: documented ap = 0.0, not NaN
    assert(ap(Seq(1L -> 0.9, 2L -> 0.1), Seq(1L -> 0L, 2L -> 0L))
      == ((0L, 2L, 2L, 0.0, 0.0)))
    // NULL labels fail typed
    intercept[IllegalArgumentException] {
      Calibration.averagePrecision(
        Seq((1L, 0.5)).toDF("id", "conf"),
        Seq((1L, Option.empty[Long])).toDF("id", "y"), "id", "conf", "y")
    }
  }

  test("brierDecomposition: Murphy identity hand-checked, residual, guards") {
    // perfect confident forecasts: brier = 0, rel = 0, res = unc, resid = 0
    val pred = Seq((1L, 1.0), (2L, 1.0), (3L, 0.0), (4L, 0.0))
      .toDF("id", "conf")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)).toDF("id", "y")
    val got = Calibration.brierDecomposition(pred, lab, "id", "conf", "y")
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    assert(got == ((4L, 2L, 0.0d, 0.0d, 0.25d, 0.25d, 0.0d)), got.toString)
    // forecasts varying WITHIN one bin: brier = 0.3141 exactly,
    // rel = (0.65-0.5)^2 = 0.0225, res = 0, unc = 0.25, resid = +0.0416
    val p2 = Seq((1L, 0.61), (2L, 0.69)).toDF("id", "conf")
    val l2 = Seq((1L, 1L), (2L, 0L)).toDF("id", "y")
    val g2 = Calibration.brierDecomposition(p2, l2, "id", "conf", "y")
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    assert(g2 == ((2L, 1L, 0.3141d, 0.0225d, 0.0d, 0.25d, 0.0416d)),
      g2.toString)
    // uninformative constant forecast at the base rate: rel = res = 0
    val p3 = Seq((1L, 0.5), (2L, 0.5)).toDF("id", "conf")
    val g3 = Calibration.brierDecomposition(p3, l2, "id", "conf", "y")
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    assert(g3 == ((2L, 1L, 0.25d, 0.0d, 0.0d, 0.25d, 0.0d)), g3.toString)
    intercept[IllegalArgumentException](Calibration.brierDecomposition(
      Seq((1L, 1.5)).toDF("id", "conf"), lab, "id", "conf", "y"))
    intercept[IllegalArgumentException](Calibration.brierDecomposition(
      pred, Seq((1L, 2L)).toDF("id", "y"), "id", "conf", "y"))
    intercept[IllegalArgumentException](Calibration.brierDecomposition(
      pred, lab, "id", "conf", "y", bins = 1))
  }

  test("isotonicCalibration: PAV pools the violating bins (hand minimax)") {
    // bins 0/1/2 (conf .05/.15/.25), 2 docs each, frac_pos (0, 1, 0.5):
    // PAV pools bins 1 and 2 -> fit (0, 0.75, 0.75)
    // ece_before = (2*.05 + 2*.85 + 2*.25)/6 = 0.383333
    // ece_after  = (0 + 2*.25 + 2*.25)/6     = 0.166667
    val pred = Seq((1L, 0.05), (2L, 0.05), (3L, 0.15), (4L, 0.15),
      (5L, 0.25), (6L, 0.25)).toDF("id", "conf")
    val lab = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
      (5L, 1L), (6L, 0L)).toDF("id", "y")
    val got = Calibration.isotonicCalibration(pred, lab, "id", "conf", "y")
      .orderBy($"bin")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      (0L, 2L, 0.05d, 0.0d, 0.0d, 0.383333d, 0.166667d),
      (1L, 2L, 0.15d, 1.0d, 0.75d, 0.383333d, 0.166667d),
      (2L, 2L, 0.25d, 0.5d, 0.75d, 0.383333d, 0.166667d)), got.toString)
  }

  test("isotonicCalibration: monotone input is a fixpoint; guards typed") {
    val pred = Seq((1L, 0.05), (2L, 0.15), (3L, 0.15), (4L, 0.25))
      .toDF("id", "conf")
    val lab = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("id", "y")
    val got = Calibration.isotonicCalibration(pred, lab, "id", "conf", "y")
      .orderBy($"bin")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    // already monotone (0, 0.5, 1): fit == frac_pos, ece_after == 0
    assert(got.forall(r => r._5 == r._4), got.toString)
    assert(got.forall(_._7 == 0.0d), got.toString)
    // partition invariance
    val rep = Calibration.isotonicCalibration(pred.repartition(3),
        lab.repartition(2), "id", "conf", "y")
      .orderBy($"bin")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(rep == got)
    intercept[IllegalArgumentException](Calibration.isotonicCalibration(
      Seq((1L, Option.empty[Double])).toDF("id", "conf"), lab,
      "id", "conf", "y"))
    intercept[IllegalArgumentException](Calibration.isotonicCalibration(
      pred, Seq((1L, 2L)).toDF("id", "y"), "id", "conf", "y"))
  }

  test("delongAucCi: hand-traced variance, perfect separation, guards") {
    // pos {0.3, 0.1}, neg {0.2, 0.0}: AUC = 0.75; V10 = {1, .5},
    // V01 = {.5, 1} -> S10 = S01 = 0.125 -> var = 0.125,
    // se = 0.353553, CI = 0.75 -/+ 1.959964*se
    val pred = Seq((1L, 0.3d), (2L, 0.1d), (3L, 0.2d), (4L, 0.0d))
      .toDF("id", "conf")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)).toDF("id", "y")
    val got = Calibration.delongAucCi(pred, lab, "id", "conf", "y")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq((2L, 2L, 0.75d, 0.353553d, 0.057048d, 1.442952d)),
      got.toString)
    // perfect separation: se = 0, degenerate interval at the AUC
    val perf = Calibration.delongAucCi(
      Seq((1L, 0.9d), (2L, 0.8d), (3L, 0.2d), (4L, 0.1d)).toDF("id", "conf"),
      lab, "id", "conf", "y")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(perf == Seq((2L, 2L, 1.0d, 0.0d, 1.0d, 1.0d)), perf.toString)
    intercept[IllegalArgumentException](Calibration.delongAucCi(
      pred, Seq((1L, 1L), (2L, 0L), (3L, 0L), (4L, 0L)).toDF("id", "y"),
      "id", "conf", "y")) // 1 positive
    intercept[IllegalArgumentException](Calibration.delongAucCi(
      pred, Seq((1L, 2L)).toDF("id", "y"), "id", "conf", "y"))
    intercept[IllegalArgumentException](Calibration.delongAucCi(
      pred, lab, "id", "conf", "y", zCrit = 0.0d))
  }

  test("gainCurve: hand-traced deciles, whole-score tie honesty, typed guards") {
    // distinct scores 0.1·i, positives at the top 3 and the bottom
    val pred = (1 to 10).map(i => (i.toLong, i / 10.0d)).toDF("id", "conf")
    val lab = (1 to 10).map(i =>
      (i.toLong, if (i >= 8 || i == 1) 1L else 0L)).toDF("id", "y")
    val got = Calibration.gainCurve(pred, lab, "id", "conf", "y")
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(got.size == 10)
    // bucket 1: top score only → 1 doc, 1 positive: gain 1/4, lift 2.5
    assert(got.head == ((1L, 1L, 1L, 1L, 0.25d, Some(2.5d))), got.toString)
    assert(got(2) == ((3L, 3L, 3L, 3L, 0.75d, Some(2.5d))), got.toString)
    // bucket 10: everything → gain 1, lift 1
    assert(got(9) == ((10L, 10L, 10L, 4L, 1.0d, Some(1.0d))), got.toString)
    // one giant tie: no whole-score prefix fits any partial cutoff
    val tied = (1 to 10).map(i => (i.toLong, 0.5d)).toDF("id", "conf")
    val t = Calibration.gainCurve(tied, lab, "id", "conf", "y")
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(t.take(9).forall(r => r._3 == 0L && r._5 == 0.0d && r._6.isEmpty),
      t.toString)
    assert(t(9) == ((10L, 10L, 10L, 4L, 1.0d, Some(1.0d))), t.toString)
    intercept[IllegalArgumentException](Calibration.gainCurve(
      pred, (1 to 10).map(i => (i.toLong, 0L)).toDF("id", "y"),
      "id", "conf", "y")) // zero positives
    intercept[IllegalArgumentException](Calibration.gainCurve(
      pred, Seq((1L, 2L)).toDF("id", "y"), "id", "conf", "y"))
    intercept[IllegalArgumentException](Calibration.gainCurve(
      Seq((1L, Option.empty[Double])).toDF("id", "conf"), lab,
      "id", "conf", "y"))
  }
}
