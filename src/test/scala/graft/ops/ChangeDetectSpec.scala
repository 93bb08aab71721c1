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
}
