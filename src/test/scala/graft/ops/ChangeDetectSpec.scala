package graft.ops

import graft.SparkSpecBase

class ChangeDetectSpec extends SparkSpecBase {
  import spark.implicits._

  test("cusum: drawup identity matches the textbook recursion hand-trace") {
    // target 10, slack 1, threshold 3; one observation per bucket.
    // dhi = x-11: (1, 2, -2, -3, 5)  => S+ = (1, 3, 1, 0, 5)
    // dlo = 9-x:  (-3, -4, 0, 1, -7) => S- = (0, 0, 0, 1, 0)
    // alarm only where a side EXCEEDS 3 (S+ = 3 at t2 is not an alarm)
    val obs = Seq((1L, 12.0), (2L, 13.0), (3L, 9.0), (4L, 8.0), (5L, 16.0))
      .toDF("b", "v")
    val got = ChangeDetect.cusum(obs, "b", "v",
        target = 10.0, slack = 1.0, threshold = 3.0)
      .orderBy($"bucket")
      .as[(Long, Long, Double, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 12.0d, 1.0d, 0.0d, 0L),
      (2L, 1L, 13.0d, 3.0d, 0.0d, 0L),
      (3L, 1L, 9.0d, 1.0d, 0.0d, 0L),
      (4L, 1L, 8.0d, 0.0d, 1.0d, 0L),
      (5L, 1L, 16.0d, 5.0d, 0.0d, 1L)), got.toString)
  }

  test("cusum: in-control stream never alarms; means pool within buckets") {
    val flat = (1L to 50L).flatMap(b => Seq((b, 9.9), (b, 10.1))).toDF("b", "v")
    val got = ChangeDetect.cusum(flat, "b", "v",
        target = 10.0, slack = 0.5, threshold = 2.0)
      .orderBy($"bucket")
      .as[(Long, Long, Double, Double, Double, Long)].collect().toSeq
    assert(got.forall(r => r._2 == 2L && r._3 == 10.0d &&
      r._4 == 0.0d && r._5 == 0.0d && r._6 == 0L), got.take(3).toString)
    // a persistent small shift BELOW the per-bucket slack still never
    // accumulates (that's what the allowance is for) ...
    val small = (1L to 50L).map(b => (b, 10.4)).toDF("b", "v")
    val s = ChangeDetect.cusum(small, "b", "v", 10.0, 0.5, 2.0)
      .agg(org.apache.spark.sql.functions.max($"cusum_hi")).as[Double].head()
    assert(s == 0.0d)
    // ... while the same shift ABOVE the slack alarms eventually
    val drift = (1L to 50L).map(b => (b, 10.6)).toDF("b", "v")
    val alarms = ChangeDetect.cusum(drift, "b", "v", 10.0, 0.5, 2.0)
      .filter($"alarm" === 1L).count()
    assert(alarms > 0L)
  }

  test("cusum: partition invariance and typed guards") {
    val obs = Seq((1L, 12.0), (2L, 13.0), (3L, 9.0), (4L, 8.0), (5L, 16.0))
      .toDF("b", "v")
    val base = ChangeDetect.cusum(obs, "b", "v", 10.0, 1.0, 3.0)
      .orderBy($"bucket").collect().toSeq
    val rep = ChangeDetect.cusum(obs.repartition(4), "b", "v", 10.0, 1.0, 3.0)
      .orderBy($"bucket").collect().toSeq
    assert(base == rep)
    intercept[IllegalArgumentException](ChangeDetect.cusum(
      Seq((1L, Option.empty[Double])).toDF("b", "v"), "b", "v", 10.0, 1.0, 3.0))
    intercept[IllegalArgumentException](ChangeDetect.cusum(
      obs, "b", "v", 10.0, -0.1, 3.0))
    intercept[IllegalArgumentException](ChangeDetect.cusum(
      obs, "b", "v", 10.0, 1.0, 0.0))
  }

  test("theilSen: hand-traced pairwise-slope medians") {
    // y = (1, 3, 2, 4) at t = 1..4: pairwise slopes
    // (1,2)=2, (1,3)=0.5, (1,4)=1, (2,3)=-1, (2,4)=0.5, (3,4)=2
    // sorted: -1, 0.5, 0.5, 1, 2, 2 -> median (0.5 + 1)/2 = 0.75
    // residuals y - 0.75 t = (0.25, 1.5, -0.25, 1.0) -> median
    // (0.25 + 1.0)/2 = 0.625
    val obs = Seq((1L, 1.0), (2L, 3.0), (3L, 2.0), (4L, 4.0)).toDF("b", "v")
    val got = ChangeDetect.theilSen(obs, "b", "v")
      .as[(Long, Long, Double, Double)].head()
    assert(got == ((4L, 6L, 0.75d, 0.625d)), got.toString)
  }

  test("theilSen: breakdown robustness and typed guards") {
    // a clean slope-1 line; corrupting ONE of 11 points by +1000 moves
    // the OLS slope wildly but the Theil-Sen slope not at all
    val clean = (1L to 11L).map(t => (t, t.toDouble)).toDF("b", "v")
    val cleanSlope = ChangeDetect.theilSen(clean, "b", "v")
      .select($"slope").as[Double].head()
    assert(cleanSlope == 1.0d)
    val dirty = (1L to 11L).map(t =>
      (t, if (t == 6L) t + 1000.0 else t.toDouble)).toDF("b", "v")
    val dirtySlope = ChangeDetect.theilSen(dirty, "b", "v")
      .select($"slope").as[Double].head()
    assert(dirtySlope == 1.0d, s"median slope moved: $dirtySlope")
    // partition invariance
    val rep = ChangeDetect.theilSen(dirty.repartition(4), "b", "v")
      .select($"slope").as[Double].head()
    assert(rep == dirtySlope)
    intercept[IllegalArgumentException](ChangeDetect.theilSen(
      Seq((1L, 1.0)).toDF("b", "v"), "b", "v"))
    intercept[IllegalArgumentException](ChangeDetect.theilSen(
      Seq((1L, Option.empty[Double]), (2L, Some(1.0))).toDF("b", "v"),
      "b", "v"))
  }

  test("acf: alternating series hand-trace, gaps drop pairs, zero variance") {
    // y = (1,2,1,2,1,2): mean 1.5, denom = 6 * 0.25 = 1.5
    // lag 1: 5 pairs, each (±.5)(∓.5) = -0.25 -> -1.25/1.5 = -0.833333
    // lag 2: 4 pairs, each +0.25 -> 1.0/1.5 = 0.666667
    val obs = (1L to 6L).map(t => (t, if (t % 2 == 1) 1.0 else 2.0))
      .toDF("b", "v")
    val got = ChangeDetect.acf(obs, "b", "v", maxLag = 3)
      .as[(Long, Long, Double)].collect().toSeq
    // lag 3: 3 pairs, each -0.25 -> -0.75/1.5 = -0.5
    assert(got == Seq((1L, 5L, -0.833333d), (2L, 4L, 0.666667d),
      (3L, 3L, -0.5d)), got.toString)
    // a gap at t=4 removes exactly the pairs touching it
    val gappy = obs.filter($"b" =!= 4L)
    val g = ChangeDetect.acf(gappy, "b", "v", maxLag = 1)
      .as[(Long, Long, Double)].head()
    assert(g._2 == 3L, g.toString) // (1,2) (2,3) (5,6) survive
    // constant series: zero variance -> documented 0.0, never NaN
    val const = (1L to 5L).map(t => (t, 7.0)).toDF("b", "v")
    val c = ChangeDetect.acf(const, "b", "v", maxLag = 2)
      .select($"acf").as[Double].collect().toSeq
    assert(c == Seq(0.0d, 0.0d))
    // a lag past the series length reports 0 pairs and acf 0.0
    val short = ChangeDetect.acf(obs.filter($"b" <= 2), "b", "v", maxLag = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(short.map(_._2) == Seq(1L, 0L, 0L), short.toString)
    assert(short.drop(1).forall(_._3 == 0.0d))
    intercept[IllegalArgumentException](ChangeDetect.acf(
      obs, "b", "v", maxLag = 0))
    intercept[IllegalArgumentException](ChangeDetect.acf(
      Seq((Option.empty[Long], 1.0)).toDF("b", "v"), "b", "v"))
  }

  test("seasonalDecompose: alternating series recovers ±5 around the mean") {
    // period 2, values 10,20,10,20,10,20 -> phase means 10/20, trend 15:
    // seasonal(0) = -5, seasonal(1) = +5; edges (b=0,5) are not interior
    val obs = (0L to 5L).map(b =>
      (b, if (b % 2 == 1) 20.0d else 10.0d)).toDF("b", "v")
    val got = ChangeDetect.seasonalDecompose(obs, "b", "v", period = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 2L, -5.0d), (1L, 2L, 5.0d)), got.toString)
  }

  test("seasonalDecompose: centered MA removes a linear trend exactly") {
    // m_b = 100*b + (+5 odd / -5 even): the 2xMA of a line is the line,
    // so the recovered seasonal is exactly +-5 despite the steep trend
    val obs = (0L to 9L).map(b =>
      (b, 100.0d * b + (if (b % 2 == 1) 5.0d else -5.0d))).toDF("b", "v")
    val got = ChangeDetect.seasonalDecompose(obs, "b", "v", period = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 4L, -5.0d), (1L, 4L, 5.0d)), got.toString)
  }

  test("seasonalDecompose: a gap de-centers its neighborhood, not the world") {
    // dropping bucket 4 makes buckets 3..5 non-interior (their straddling
    // windows lose a member); remaining interior buckets are untouched
    val full = (0L to 9L).map(b =>
      (b, if (b % 2 == 1) 20.0d else 10.0d)).toDF("b", "v")
    val gapped = full.filter($"b" =!= 4L)
    val got = ChangeDetect.seasonalDecompose(gapped, "b", "v", period = 2)
      .as[(Long, Long, Double)].collect().toSeq
    // interior buckets: full had 1..8; the gap removes {3,4,5} -> 1,2,6,7,8
    assert(got.map(_._2).sum == 5L, got.toString)
    assert(got.find(_._1 == 1L).get._3 == 5.0d, got.toString)
    // duplicate observations in one bucket fold through the bucket MEAN
    val dup = gapped.union(Seq((1L, 20.0d)).toDF("b", "v"))
    val d = ChangeDetect.seasonalDecompose(dup, "b", "v", period = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(d == got, s"$d vs $got")
    intercept[IllegalArgumentException](
      ChangeDetect.seasonalDecompose(full, "b", "v", period = 1))
    intercept[IllegalArgumentException](ChangeDetect.seasonalDecompose(
      Seq((Option.empty[Long], 1.0)).toDF("b", "v"), "b", "v"))
  }

  test("changePoint: planted step is localized exactly") {
    // 10,10,10,30,30: split after bucket 2 -> means 10/30, shift 20
    val obs = Seq((0L, 10.0d), (1L, 10.0d), (2L, 10.0d),
      (3L, 30.0d), (4L, 30.0d)).toDF("b", "v")
    val got = ChangeDetect.changePoint(obs, "b", "v")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(got == ((5L, 2L, 3L, 2L, 10.0d, 30.0d, 20.0d)), got.toString)
    // partition invariance (prefix sums over the checkpointed grid)
    val p = ChangeDetect.changePoint(obs.repartition(5), "b", "v")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(p == got)
  }

  test("changePoint: constant series tie-breaks earliest with shift 0") {
    val flat = (0L to 4L).map((_, 7.0d)).toDF("b", "v")
    val got = ChangeDetect.changePoint(flat, "b", "v")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(got == ((5L, 0L, 1L, 4L, 7.0d, 7.0d, 0.0d)), got.toString)
    // within-bucket observations fold through the bucket mean first
    val dup = Seq((0L, 5.0d), (0L, 15.0d), (1L, 30.0d)).toDF("b", "v")
    val d = ChangeDetect.changePoint(dup, "b", "v")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(d == ((2L, 0L, 1L, 1L, 10.0d, 30.0d, 20.0d)), d.toString)
    intercept[IllegalArgumentException](ChangeDetect.changePoint(
      Seq((0L, 1.0d)).toDF("b", "v"), "b", "v"))
    intercept[IllegalArgumentException](ChangeDetect.changePoint(
      Seq((Option.empty[Long], 1.0d)).toDF("b", "v"), "b", "v"))
  }

  test("seasonalDecompose: odd period uses the single centered window") {
    // period 3, pattern 10,20,30 repeating, no trend: seasonal = -10,0,+10
    val obs = (0L to 8L).map(b => (b, 10.0d * (b % 3 + 1))).toDF("b", "v")
    val got = ChangeDetect.seasonalDecompose(obs, "b", "v", period = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => r._1 -> r._3).toMap ==
      Map(0L -> -10.0d, 1L -> 0.0d, 2L -> 10.0d), got.toString)
  }

  test("ccf: a planted 2-bucket lead peaks at lag +2; identity peaks at 0 with 1.0") {
    // y(bucket t) = x(bucket t−2): x LEADS y by 2 — the CCF maximum
    // sits at lag +2 (a jagged signal, so no other lag aligns)
    val sig = Seq(1.0d, 5.0d, 2.0d, 8.0d, 3.0d, 9.0d, 4.0d, 7.0d, 0.0d, 6.0d)
    val x = sig.zipWithIndex.map { case (v, t) => (t.toLong, v) }.toDF("b", "v")
    val y = sig.zipWithIndex.map { case (v, t) => (t + 2L, v) }.toDF("b", "v")
    val got = ChangeDetect.ccf(x, y, "b", "v", maxLag = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == (-3L to 3L).toSeq, got.toString)
    val byLag = got.map(r => r._1 -> r._3).toMap
    assert(byLag(2L) == got.map(_._3).max && byLag(2L) > 0.9d, got.toString)
    // exact identity case: two points, y = x → lag 0 is exactly 1.0
    val two = Seq((0L, 0.0d), (1L, 10.0d)).toDF("b", "v")
    val id = ChangeDetect.ccf(two, two, "b", "v", maxLag = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(id.find(_._1 == 0L).get._3 == 1.0d, id.toString)
    // anti-correlated at lag 0
    val neg = Seq((0L, 10.0d), (1L, 0.0d)).toDF("b", "v")
    assert(ChangeDetect.ccf(two, neg, "b", "v", maxLag = 1)
      .as[(Long, Long, Double)].collect()
      .find(_._1 == 0L).get._3 == -1.0d)
  }

  test("ccf: zero variance reports 0.0; missing buckets make no pair; typed guards") {
    val flat = Seq((0L, 5.0d), (1L, 5.0d), (2L, 5.0d)).toDF("b", "v")
    val x = Seq((0L, 1.0d), (1L, 2.0d), (2L, 3.0d)).toDF("b", "v")
    assert(ChangeDetect.ccf(x, flat, "b", "v", maxLag = 1)
      .as[(Long, Long, Double)].collect().forall(_._3 == 0.0d))
    // y covers only bucket 5: no overlap at any |lag| <= 1 → all 0 pairs
    val far = Seq((5L, 1.0d)).toDF("b", "v")
    val gaps = ChangeDetect.ccf(x, far, "b", "v", maxLag = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(gaps.forall(r => r._2 == 0L && r._3 == 0.0d), gaps.toString)
    intercept[IllegalArgumentException](ChangeDetect.ccf(
      x, Seq((Option.empty[Long], 1.0d)).toDF("b", "v"), "b", "v"))
    intercept[IllegalArgumentException](
      ChangeDetect.ccf(x, x, "b", "v", maxLag = 0))
  }

  test("mannKendall: monotone rise, tie correction, flat zero") {
    // strictly rising 3 points: S = 3, var = 3*2*11/18 = 3.666667,
    // z = (3-1)/sqrt(66/18) = 1.044466
    val up = Seq((0L, 1.0d), (1L, 2.0d), (2L, 3.0d)).toDF("b", "v")
    val got = ChangeDetect.mannKendall(up, "b", "v")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((3L, 3L, 3L, 3.666667d, 1.044466d)), got.toString)
    // one tie (t=2): S = 2, var = (66 - 2*1*9)/18 = 2.666667,
    // z = 1/sqrt(48/18) = 0.612372
    val tied = Seq((0L, 1.0d), (1L, 1.0d), (2L, 2.0d)).toDF("b", "v")
    val t = ChangeDetect.mannKendall(tied, "b", "v")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(t == Seq((3L, 3L, 2L, 2.666667d, 0.612372d)), t.toString)
    // all tied: S = 0, var = 0, z = 0 (documented, no NaN)
    val flat = Seq((0L, 5.0d), (1L, 5.0d)).toDF("b", "v")
    val f = ChangeDetect.mannKendall(flat, "b", "v")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(f == Seq((2L, 1L, 0L, 0.0d, 0.0d)), f.toString)
    // symmetric falling series: S and z negate
    val dn = Seq((0L, 3.0d), (1L, 2.0d), (2L, 1.0d)).toDF("b", "v")
    val g = ChangeDetect.mannKendall(dn, "b", "v")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(g == Seq((3L, 3L, -3L, 3.666667d, -1.044466d)), g.toString)
  }

  test("sprt: symmetric boundaries, hand-traced crossing at bucket 3") {
    // p0=0.2, p1=0.8: lls = ln4, llf = -ln4; lnA = ln19 = 2.944439
    // all-success stream crosses H1 at bucket 3 (3 ln4 = 4.158883)
    val up = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("b", "y")
    val got = ChangeDetect.sprt(up, "b", "y", p0 = 0.2d, p1 = 0.8d)
      .as[(Long, Long, Long, Long, Long, Double, String, Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1L, 1L, 1.386294d, "continue", None),
      (2L, 1L, 1L, 2L, 2L, 2.772589d, "continue", None),
      (3L, 1L, 1L, 3L, 3L, 4.158883d, "accept_h1", Some(3L)),
      (4L, 1L, 1L, 4L, 4L, 5.545177d, "accept_h1", Some(3L))),
      got.toString)
    // all-failure stream accepts H0 symmetrically
    val dn = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("b", "y")
    val h0 = ChangeDetect.sprt(dn, "b", "y", p0 = 0.2d, p1 = 0.8d)
      .as[(Long, Long, Long, Long, Long, Double, String, Option[Long])]
      .collect().toSeq
    assert(h0.map(_._7) == Seq("continue", "continue", "accept_h0") &&
      h0.last._8 == Some(3L), h0.toString)
    intercept[IllegalArgumentException](
      ChangeDetect.sprt(up, "b", "y", p0 = 0.8d, p1 = 0.2d))
    intercept[IllegalArgumentException](
      ChangeDetect.sprt(Seq((1L, 2L)).toDF("b", "y"), "b", "y", 0.2d, 0.8d))
  }

  test("segmentedTrend: hand-traced piecewise fits around the split") {
    // 0,1 | 20,23: split lands after bucket 1 (same argmax as
    // changePoint); pre fits y=x, post fits y=3x+14 -> change 2
    val df = Seq((0L, 0.0d), (1L, 1.0d), (2L, 20.0d), (3L, 23.0d))
      .toDF("b", "v")
    val got = ChangeDetect.segmentedTrend(df, "b", "v")
      .as[(Long, Long, Long, Option[Double], Option[Double], Long,
        Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq((4L, 1L, 2L, Some(1.0d), Some(0.0d), 2L,
      Some(3.0d), Some(14.0d), Some(2.0d))), got.toString)
    // break agrees with changePoint by construction
    val cp = ChangeDetect.changePoint(df, "b", "v")
      .select($"break_bucket").as[Long].head()
    assert(cp == got.head._2)
  }

  test("segmentedTrend: single-bucket side reports NULL fit, typed guards") {
    val df = Seq((0L, 0.0d), (1L, 0.0d), (2L, 10.0d)).toDF("b", "v")
    val got = ChangeDetect.segmentedTrend(df, "b", "v")
      .as[(Long, Long, Long, Option[Double], Option[Double], Long,
        Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq((3L, 1L, 2L, Some(0.0d), Some(0.0d), 1L,
      None, None, None)), got.toString)
    intercept[IllegalArgumentException](ChangeDetect.segmentedTrend(
      Seq((0L, 1.0d)).toDF("b", "v"), "b", "v"))
    intercept[IllegalArgumentException](ChangeDetect.segmentedTrend(
      Seq((Option.empty[Long], Some(1.0d))).toDF("b", "v"), "b", "v"))
  }

  test("mannKendall: typed guards") {
    intercept[IllegalArgumentException](ChangeDetect.mannKendall(
      Seq((0L, 1.0d)).toDF("b", "v"), "b", "v")) // 1 bucket
    intercept[IllegalArgumentException](ChangeDetect.mannKendall(
      Seq((Option.empty[Long], Some(1.0d))).toDF("b", "v"), "b", "v"))
  }

  test("runsTest: hand-traced runs, oscillation vs regime, degenerate") {
    // values 1,9,1,9,1,9 around median 5: signs 0,1,0,1,0,1 -> 6 runs,
    // n1 = n2 = 3, mu = 2*9/6 + 1 = 4, v = 18*(18-6)/(36*5) = 1.2
    val osc = (1L to 6L).map(b => (b, if (b % 2 == 0) 9.0d else 1.0d))
      .toDF("b", "v")
    val o = ChangeDetect.runsTest(osc, "b", "v")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(o._1 == 3L && o._2 == 3L && o._3 == 6L && o._4 == 4.0d)
    val z = (6.0d - 4.0d) / math.sqrt(1.2d)
    assert(o._5 == BigDecimal(z).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, o.toString)
    // a regime series (1,1,1,9,9,9) has the MINIMUM 2 runs -> negative z
    val reg = (1L to 6L).map(b => (b, if (b <= 3) 1.0d else 9.0d))
      .toDF("b", "v")
    val r = ChangeDetect.runsTest(reg, "b", "v")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._3 == 2L && r._5 < 0.0d, r.toString)
    // equal-to-median buckets drop: median of (1,5,9) is 5 -> 2 signed
    val withMed = Seq((1L, 1.0d), (2L, 5.0d), (3L, 9.0d)).toDF("b", "v")
    val m = ChangeDetect.runsTest(withMed, "b", "v")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(m._1 == 1L && m._2 == 1L && m._3 == 2L, m.toString)
    // constant series: all equal the median -> zero counts, z = 0.0
    val const = (1L to 4L).map(b => (b, 7.0d)).toDF("b", "v")
    val c = ChangeDetect.runsTest(const, "b", "v")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(c == ((0L, 0L, 0L, 0.0d, 0.0d)), c.toString)
    intercept[IllegalArgumentException](ChangeDetect.runsTest(
      Seq((1L, 1.0d)).toDF("b", "v"), "b", "v"))
  }

  test("pageHinkley: flat series stays silent; a step alarms; hand trace") {
    val flat = (1L to 6L).map(b => (b, 3.0d)).toDF("b", "v")
    val quiet = ChangeDetect.pageHinkley(flat, "b", "v", lambda = 1.0d)
      .select($"ph", $"alarm").as[(Double, Long)].collect()
    assert(quiet.forall { case (p, a) => p == 0.0d && a == 0L },
      quiet.mkString(","))
    // 0,0,0,10: running means 0,0,0,2.5 -> term_4 = 7.5 -> ph_4 = 7.5
    val step = Seq((1L, 0.0d), (2L, 0.0d), (3L, 0.0d), (4L, 10.0d))
      .toDF("b", "v")
    val got = ChangeDetect.pageHinkley(step, "b", "v", lambda = 5.0d)
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 0.0d, 0.0d, 0L), (2L, 0.0d, 0.0d, 0L),
      (3L, 0.0d, 0.0d, 0L), (4L, 10.0d, 7.5d, 1L)), got.toString)
    // delta eats small drifts: with delta 10 the step term goes negative
    val damped = ChangeDetect.pageHinkley(step, "b", "v",
      delta = 10.0d, lambda = 5.0d)
      .filter($"bucket" === 4L).select($"alarm").as[Long].head()
    assert(damped == 0L)
    intercept[IllegalArgumentException](
      ChangeDetect.pageHinkley(flat, "b", "v", delta = -1.0d))
    intercept[IllegalArgumentException](
      ChangeDetect.pageHinkley(flat, "b", "v", lambda = 0.0d))
  }
}
