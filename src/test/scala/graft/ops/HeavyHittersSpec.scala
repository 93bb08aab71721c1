package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Count-Min-prefiltered exact heavy hitters: one-sided sketch error,
  * exactness of the verified result against the naive aggregate (even
  * under brutal false-positive pressure), and partition independence. */
class HeavyHittersSpec extends SparkSpecBase {
  import spark.implicits._

  private def users = Tables.events(spark, "/root/testdata/sf0.001")
    .select($"user_id")

  private def naive(minCount: Long): Set[(Long, Long)] =
    users.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
      .as[(Long, Long)].collect().toSet

  test("bucket is always in [0, width) — including Long.MinValue and negatives") {
    val gen = Gen.frequency(
      4 -> Gen.chooseNum(Long.MinValue, Long.MaxValue),
      1 -> Gen.oneOf(Long.MinValue, -1L, 0L, 1L, Long.MaxValue))
    val prop = Prop.forAll(gen, Gen.chooseNum(0, 15), Gen.oneOf(16, 101, 8192)) {
      (x, i, w) =>
        val b = HeavyHitters.bucket(x, i, w)
        b >= 0 && b < w
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"bucket range falsified: $res")
  }

  test("CMS never under-counts: estimate(x) >= exact count for every real item") {
    val sk = HeavyHitters.sketch(users, depth = 4, width = 64)
    val exact = naive(1L)
    exact.foreach { case (u, n) =>
      assert(sk.estimate(u) >= n,
        s"user $u: estimate ${sk.estimate(u)} < exact $n — CMS must be one-sided")
    }
  }

  test("verified heavy hitters == naive groupBy at several thresholds") {
    for (t <- Seq(1L, 60L, 80L, 10000L)) {
      val got = RunHH(t, width = 8192)
      assert(got == naive(t), s"minCount=$t")
    }
  }

  test("exact even under brutal FP pressure (width 16 for 15 distinct users)") {
    // nearly every bucket collides; the candidate set balloons with
    // false positives — the exact verify pass must still strip them all
    for (t <- Seq(70L, 80L)) {
      val got = RunHH(t, width = 16)
      assert(got == naive(t), s"minCount=$t width=16")
    }
  }

  test("result is partition-layout-independent") {
    val a = HeavyHitters.heavyHitters(users, "user_id", 70L)
      .as[(Long, Long)].collect().toSet
    val b = HeavyHitters.heavyHitters(users.repartition(13), "user_id", 70L)
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("empty input yields an empty result, not a crash") {
    val got = HeavyHitters.heavyHitters(
      users.filter($"user_id" < 0), "user_id", 1L)
    assert(got.count() == 0L)
  }

  private def RunHH(minCount: Long, width: Int): Set[(Long, Long)] =
    HeavyHitters.heavyHitters(users, "user_id", minCount, depth = 4, width = width)
      .as[(Long, Long)].collect().toSet
}
