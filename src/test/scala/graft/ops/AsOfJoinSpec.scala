package graft.ops

import graft.SparkSpecBase

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val quotes = Seq( // (sym, t, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 5L, 9.0)).toDF("sym", "qt", "px")
  private val trades = Seq( // (sym, t, id)
    ("A", 9L, 1L),  // before any quote -> null
    ("A", 10L, 2L), // exactly at quote -> 1.0
    ("A", 25L, 3L), // between -> 2.0
    ("A", 99L, 4L), // after all -> 3.0
    ("B", 6L, 5L),  // -> 9.0
    ("C", 1L, 6L)   // key with no quotes -> null
  ).toDF("sym", "tt", "id")

  test("as-of semantics: greatest right time <= left time per key") {
    val got = AsOfJoin.asOf(trades, quotes, "sym", "tt", "qt", Seq("qt", "px"))
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(2.0), 4L -> Some(3.0),
      5L -> Some(9.0), 6L -> None))
  }

  test("strict backward: simultaneous right rows are invisible") {
    val got = AsOfJoin.asOf(trades, quotes, "sym", "tt", "qt", Seq("px"),
        strict = true)
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // trade 2 at t=10 no longer sees the t=10 quote -> null (no earlier quote)
    assert(got == Map(
      1L -> None, 2L -> None, 3L -> Some(2.0), 4L -> Some(3.0),
      5L -> Some(9.0), 6L -> None))
  }

  test("forward: smallest right time >= left time per key") {
    val got = AsOfJoin.asOf(trades, quotes, "sym", "tt", "qt", Seq("px"),
        forward = true)
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      1L -> Some(1.0),  // next quote after t=9 is t=10
      2L -> Some(1.0),  // inclusive: the t=10 quote itself
      3L -> Some(3.0),  // next after 25 is 30
      4L -> None,       // nothing after 99
      5L -> None,       // B's only quote (t=5) is before t=6
      6L -> None))
    // strict forward: trade 2 skips the simultaneous quote -> t=20
    val strictGot = AsOfJoin.asOf(trades, quotes, "sym", "tt", "qt", Seq("px"),
        forward = true, strict = true)
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(strictGot(2L) == Some(2.0))
  }

  test("left columns survive untouched; plan has no cartesian/range join") {
    val df = AsOfJoin.asOf(trades, quotes, "sym", "tt", "qt", Seq("px"))
    assert(df.columns.toSeq == Seq("sym", "tt", "id", "px"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must be window-based, not a range join:\n$plan")
    assert(df.count() == 6)
  }
}
