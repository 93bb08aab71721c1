package graft.ops

import graft.SparkSpecBase
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property coverage for [[ExactRank]] — the generators the adversary
  * would pick: all-equal multisets, power-law bodies with one extreme
  * outlier, values planted exactly on radix-slot edges, and negatives
  * across the sign fold. Every selected value is cross-checked against
  * a plain sorted scan (the ground truth any engine's sort returns).
  *
  * Split by cost: the radixSlot contract (monotone, bounded width,
  * sign-fold correct) runs as pure ScalaCheck over hundreds of cases
  * with no Spark jobs; the distributed paths ([[ExactRank
  * .valuesAtRanks]] and the q98/q109 driver-assembly kernels
  * [[ExactRank.radixHistogram]]/[[ExactRank.valueCounts]]) run the
  * SAME generator families batched as groups of ONE DataFrame, so a
  * whole family costs one selection call, not one per case. */
class ExactRankPropertySpec extends SparkSpecBase {
  import spark.implicits._

  // ---- generators ----------------------------------------------------

  /** All rows the same value — every rank must return that value; the
    * radix pass must finish in one round (slot min == max). */
  private val genAllEqual: Gen[List[Long]] =
    for {
      n <- Gen.chooseNum(1, 60)
      v <- Gen.oneOf(Gen.chooseNum(-1000000L, 1000000L),
        Gen.oneOf(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
          Long.MaxValue - 1, Long.MaxValue))
    } yield List.fill(n)(v)

  /** Power-law body (many small values, geometrically thinning tail)
    * plus ONE extreme outlier — the shape that breaks equal-width
    * histograms whose bounds the outlier stretches. */
  private val genPowerLaw: Gen[List[Long]] =
    for {
      body <- Gen.listOfN(80, Gen.frequency(
        8 -> Gen.chooseNum(0L, 9L),
        4 -> Gen.chooseNum(10L, 99L),
        2 -> Gen.chooseNum(100L, 9999L),
        1 -> Gen.chooseNum(10000L, 999999L)))
      out <- Gen.oneOf((1L << 60) + 7L, -(1L << 60) - 7L, Long.MaxValue - 3)
    } yield out :: body

  /** Values planted ON radix-slot edges: for bit length k > 10 the slot
    * width is 2^(k-11), so m = j·2^(k-11) ± {0,1} straddles an edge —
    * selection must narrow through the edge without off-by-one. Both
    * signs (the fold maps -m to slot -s-1). */
  private val genSlotEdges: Gen[List[Long]] =
    Gen.listOfN(40, for {
      k <- Gen.chooseNum(12, 52)
      j <- Gen.chooseNum(1L << 10, (1L << 11) - 1) // top-bits index in range
      d <- Gen.oneOf(-1L, 0L, 1L)
      sign <- Gen.oneOf(1L, -1L)
    } yield sign * ((j << (k - 11)) + d))

  /** Mixed-sign values hugging powers of two — dense around the fold. */
  private val genNegatives: Gen[List[Long]] =
    Gen.listOfN(50, for {
      k <- Gen.chooseNum(0, 62)
      d <- Gen.chooseNum(-2L, 2L)
      sign <- Gen.oneOf(1L, -1L)
    } yield sign * (1L << k) + d)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def sortedSelect(vals: Seq[Long], rank: Long): Long =
    vals.sorted.apply((rank - 1).toInt)

  // ---- pure radixSlot contract (no Spark, hundreds of cases) ---------

  test("radixSlot is monotone, slot-width-bounded, and sign-fold-correct on random longs") {
    val genLong = Gen.frequency(
      4 -> Gen.chooseNum(Long.MinValue, Long.MaxValue),
      2 -> Gen.chooseNum(-1000000L, 1000000L),
      1 -> Gen.oneOf(Long.MinValue, Long.MinValue + 1, -2L, -1L, 0L, 1L,
        Long.MaxValue - 1, Long.MaxValue))
    val prop = Prop.forAll(genLong, genLong) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val sLo = ExactRank.radixSlot(lo)
      val sHi = ExactRank.radixSlot(hi)
      val monotone = sLo <= sHi
      // same slot ⟹ the values are within one slot's max width
      val widthOk = sLo != sHi ||
        java.lang.Long.compareUnsigned(hi - lo, 1L << 52) <= 0
      // sign fold: negatives sit strictly below non-negatives
      val foldOk = !(lo < 0 && hi >= 0) || sLo < sHi
      monotone && widthOk && foldOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"radixSlot contract falsified: $res")
  }

  // ---- distributed selection vs sorted ground truth ------------------

  /** One DataFrame per generator family (each sampled case = one group),
    * one valuesAtRanks call per bucket setting — p05/median/p90 plus the
    * rank-1/rank-n extremes, all against the sorted scan. */
  private def checkFamily(name: String, gen: Gen[List[Long]],
      cases: Int, buckets: Int): Unit = {
    val groups: Map[String, List[Long]] =
      (0 until cases).map(i => s"g$i" -> sample(gen, 1000L * i + buckets)).toMap
    val df = groups.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
      .toDF("g", "c")
    val got = ExactRank.valuesAtRanks(spark, df, "g", "c",
        n => Seq("lo" -> 1L, "p05" -> (n + 19) / 20, "med" -> (n + 1) / 2,
          "p90" -> (n * 9 + 9) / 10, "hi" -> n),
        buckets = buckets)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    groups.foreach { case (g, vs) =>
      val n = vs.size.toLong
      val expect = (sortedSelect(vs, 1L), sortedSelect(vs, (n + 19) / 20),
        sortedSelect(vs, (n + 1) / 2), sortedSelect(vs, (n * 9 + 9) / 10),
        sortedSelect(vs, n))
      assert(got(g) == expect, s"$name/$g (n=$n, buckets=$buckets)")
    }
  }

  test("all-equal groups: every rank returns the constant (default + tiny buckets)") {
    checkFamily("allEqual", genAllEqual, cases = 8, buckets = 8192)
    checkFamily("allEqual", genAllEqual, cases = 8, buckets = 2)
  }

  test("power-law with one extreme outlier matches sorted selection") {
    checkFamily("powerLaw", genPowerLaw, cases = 8, buckets = 8192)
    checkFamily("powerLaw", genPowerLaw, cases = 8, buckets = 16)
  }

  test("values planted on radix-slot edges match sorted selection") {
    checkFamily("slotEdges", genSlotEdges, cases = 8, buckets = 8192)
    checkFamily("slotEdges", genSlotEdges, cases = 8, buckets = 16)
  }

  test("mixed-sign values across the fold match sorted selection") {
    checkFamily("negatives", genNegatives, cases = 8, buckets = 8192)
    checkFamily("negatives", genNegatives, cases = 8, buckets = 16)
  }

  test("EVERY rank of a boundary-heavy multiset is exact at buckets=4 (deep narrowing)") {
    // values straddle power-of-two slot edges, both signs, heavy ties —
    // then ask for ALL ranks 1..n in one call: every cumulative-count
    // boundary (slot AND bucket) is a requested rank somewhere
    val vs: List[Long] = List(
      Long.MinValue, -4398046511105L, -4398046511104L, -4398046511103L,
      -65537L, -65536L, -65535L, -2L, -1L, -1L, 0L, 0L, 0L, 1L, 1L, 2L,
      65535L, 65536L, 65536L, 65537L, 4398046511103L, 4398046511104L,
      4398046511105L, Long.MaxValue)
    val n = vs.size.toLong
    val df = vs.map(("b", _)).toDF("g", "c")
    val got = ExactRank.valuesAtRanks(spark, df, "g", "c",
        _ => (1L to n).map(r => s"r$r" -> r), buckets = 4)
      .collect().head
    val sorted = vs.sorted
    (1L to n).foreach { r =>
      assert(got.getAs[Long](s"r$r") == sorted((r - 1).toInt), s"rank $r")
    }
  }

  // ---- q98/q109 driver-assembly kernels ------------------------------

  test("DataFrame kernels == RDD kernels, and their median assembly == sorted (money domain)") {
    val genMoney: Gen[List[Long]] = for {
      n <- Gen.chooseNum(5, 120)
      vs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.chooseNum(0L, 10000000L),
        2 -> Gen.chooseNum(-10000000L, 0L),
        1 -> Gen.oneOf(0L, 1L, -1L, 9999999L)))
    } yield vs
    val groups = (0 until 10).map(i => s"m$i" -> sample(genMoney, 77L * i)).toMap
    val df = groups.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
      .toDF("g", "c")
    val rdd = df.as[(String, Long)].rdd
    val viaDf = ExactRank.radixHistogram(df)
    val viaRdd = ExactRank.radixHistogram(rdd)
    assert(viaDf.keySet == viaRdd.keySet)
    viaDf.foreach { case (g, slots) =>
      assert(slots.toSeq == viaRdd(g).toSeq, s"histogram of $g diverged")
    }
    // assemble each group's median exactly as q98/q109 do
    val ranges = viaDf.map { case (g, slots) =>
      val n = slots.iterator.map(_.cnt).sum
      val (iM, _) = ExactRank.slotAt(slots, (n + 1) / 2)
      g -> Array((slots(iM).mn, slots(iM).mx))
    }
    val vcDf = ExactRank.valueCounts(df, ranges)
    val vcRdd = ExactRank.valueCounts(rdd, ranges)
    assert(vcDf.keySet == vcRdd.keySet)
    vcDf.foreach { case (g, vc) =>
      assert(vc.toSeq == vcRdd(g).toSeq, s"valueCounts of $g diverged")
    }
    groups.foreach { case (g, vs) =>
      val slots = viaDf(g)
      val n = slots.iterator.map(_.cnt).sum
      val rMed = (n + 1) / 2
      val (iM, bM) = ExactRank.slotAt(slots, rMed)
      val med = ExactRank.valueAt(vcDf(g), slots(iM).mn, slots(iM).mx, bM, rMed)
      assert(med == sortedSelect(vs, rMed), s"assembled median of $g")
      // per-slot sums are exact: Σ slot.sum == Σ values
      assert(slots.iterator.map(_.sum).sum == vs.sum, s"slot sums of $g")
    }
  }

  test("valueCounts rejects data-proportional range widths instead of OOMing") {
    val df = Seq(("g", 1L)).toDF("g", "c")
    val wide = Map("g" -> Array((0L, ExactRank.maxValueCountWidth + 1L)))
    val e = intercept[IllegalArgumentException] {
      ExactRank.valueCounts(df, wide)
    }
    assert(e.getMessage.contains("radix-slot-narrow"))
  }
}
