package graft.ops

import graft.SparkSpecBase

class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def dim(rows: (Long, Double, Long, Long, Long)*) =
    rows.toDF("k", "v", "valid_from", "valid_to", "is_current")

  test("scd2Merge: unchanged, changed, and inserted keys route correctly") {
    val cur = dim((1L, 10.0, 0L, 999999L, 1L), (2L, 20.0, 0L, 999999L, 1L))
    val upd = Seq((2L, 25.0), (3L, 30.0)).toDF("k", "v")
    val got = Scd.scd2Merge(cur, upd, "k", "v", batchVersion = 1L)
      .as[(Long, Double, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 10.0, 0L, 999999L, 1L),  // untouched
      (2L, 20.0, 0L, 1L, 0L),       // old version closed at batch 1
      (2L, 25.0, 1L, 999999L, 1L),  // new version opened
      (3L, 30.0, 1L, 999999L, 1L))) // insert opens its first version
  }

  test("scd2Merge: NULL values version correctly instead of vanishing") {
    val cur = Seq[(Long, Option[Double], Long, Long, Long)](
      (1L, None, 0L, 999999L, 1L),        // open row with NULL value
      (2L, Some(20.0), 0L, 999999L, 1L))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    val upd = Seq[(Long, Option[Double])](
      (1L, Some(15.0)),                    // NULL → value: must version
      (2L, None))                          // value → NULL: must version
      .toDF("k", "v")
    val got = Scd.scd2Merge(cur, upd, "k", "v", batchVersion = 1L)
      .as[(Long, Option[Double], Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, None, 0L, 1L, 0L),
      (1L, Some(15.0), 1L, 999999L, 1L),
      (2L, Some(20.0), 0L, 1L, 0L),
      (2L, None, 1L, 999999L, 1L)), s"NULL transitions wrong: $got")
    // NULL → NULL is a no-op, not a new version
    val noop = Scd.scd2Merge(
      Seq[(Long, Option[Double], Long, Long, Long)]((1L, None, 0L, 999999L, 1L))
        .toDF("k", "v", "valid_from", "valid_to", "is_current"),
      Seq[(Long, Option[Double])]((1L, None)).toDF("k", "v"),
      "k", "v", 1L).as[(Long, Option[Double], Long, Long, Long)].collect().toSet
    assert(noop == Set((1L, None, 0L, 999999L, 1L)), s"NULL→NULL must not version: $noop")
  }

  test("scd2Merge: duplicate batch keys collapse deterministically (no join fan-out)") {
    val cur = dim((1L, 10.0, 0L, 999999L, 1L))
    val upd = Seq((1L, 11.0), (1L, 12.0), (1L, 11.5)).toDF("k", "v")
    val got = Scd.scd2Merge(cur, upd, "k", "v", batchVersion = 1L)
      .as[(Long, Double, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 10.0, 0L, 1L, 0L),
      (1L, 12.0, 1L, 999999L, 1L)), // greatest value wins, once
      s"duplicate keys must collapse to one version: $got")
  }

  test("scd2Merge: same-value update is a no-op; history survives a second batch") {
    val cur = dim((1L, 10.0, 0L, 999999L, 1L))
    val b1 = Scd.scd2Merge(cur, Seq((1L, 10.0)).toDF("k", "v"), "k", "v", 1L)
    assert(b1.as[(Long, Double, Long, Long, Long)].collect().toSet ==
      Set((1L, 10.0, 0L, 999999L, 1L)), "identical value must not version")
    val b2 = Scd.scd2Merge(b1, Seq((1L, 11.0)).toDF("k", "v"), "k", "v", 2L)
    val b3 = Scd.scd2Merge(b2, Seq((1L, 12.0)).toDF("k", "v"), "k", "v", 3L)
    val hist = b3.as[(Long, Double, Long, Long, Long)].collect().toSet
    assert(hist == Set(
      (1L, 10.0, 0L, 2L, 0L),
      (1L, 11.0, 2L, 3L, 0L),
      (1L, 12.0, 3L, 999999L, 1L)), s"three-version history wrong: $hist")
    // exactly one current row per key, and intervals chain
    assert(hist.count(_._5 == 1L) == 1)
  }
}
