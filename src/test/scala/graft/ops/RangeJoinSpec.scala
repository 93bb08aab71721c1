package graft.ops

import graft.SparkSpecBase

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val intervals = Seq( // (key, lo, hi, tag)
    ("a", 0L, 10L, "i1"), ("a", 5L, 7L, "i2"), ("a", 100L, 200L, "i3"),
    ("b", 0L, 1000L, "i4")).toDF("key", "lo", "hi", "tag")
  private val points = Seq( // (key, t, id)
    ("a", 6L, 1L),   // in i1 and i2
    ("a", 10L, 2L),  // in i1 (boundary)
    ("a", 50L, 3L),  // in none
    ("a", 150L, 4L), // in i3
    ("b", 999L, 5L), // in i4
    ("c", 5L, 6L)    // key with no intervals
  ).toDF("key", "t", "id")

  private def naive() = points.join(intervals, Seq("key"))
    .filter($"t" >= $"lo" && $"t" <= $"hi")
    .select("id", "tag").as[(Long, String)].collect().toSet

  test("bucketed range join equals the naive range join for any width") {
    val expected = naive()
    assert(expected == Set((1L, "i1"), (1L, "i2"), (2L, "i1"), (4L, "i3"), (5L, "i4")))
    for (width <- Seq(1L, 7L, 64L, 10000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "key", "t", "lo", "hi", width)
        .select("id", "tag").as[(Long, String)].collect().toSet
      assert(got == expected, s"width=$width")
    }
  }

  test("join is an equi-join on (key, bucket), not a cartesian") {
    val plan = RangeJoin.pointInInterval(points, intervals, "key", "t", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join must be bucketed equi-join:\n$plan")
  }
}
