package graft.ops

import graft.SparkSpecBase
import java.sql.Timestamp

class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // user 1: full ordered chain; user 2: click BEFORE view (click must not
  // count) then no later click; user 3: view only; user 4: purchase
  // before click (purchase must not count)
  private val events = Seq(
    (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
    (2L, ts(1), "click"), (2L, ts(2), "view"),
    (3L, ts(1), "view"),
    (4L, ts(1), "view"), (4L, ts(3), "click"), (4L, ts(2), "purchase"),
    (5L, ts(9), "signup") // never enters the funnel
  ).toDF("user_id", "ts", "event_type")

  test("stageTimes: strictly-ordered chains only") {
    val got = Funnel.stageTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "funnel rows = stage-0 users")
    assert(got(1L) == ((ts(1), Some(ts(2)), Some(ts(3)))))
    assert(got(2L) == ((ts(2), None, None)), "pre-view click ignored")
    assert(got(3L) == ((ts(1), None, None)))
    assert(got(4L) == ((ts(1), Some(ts(3)), None)), "pre-click purchase ignored")
  }

  test("summary counts users per reached stage, in funnel order") {
    val got = Funnel.summary(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy($"stage_idx")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((0L, "view", 4L), (1L, "click", 2L), (2L, "purchase", 1L)))
  }

  test("earliest chain: repeated stage events take the first valid one") {
    val e = Seq(
      (7L, ts(1), "view"), (7L, ts(5), "view"),
      (7L, ts(2), "click"), (7L, ts(4), "click"),
      (7L, ts(3), "purchase")).toDF("user_id", "ts", "event_type")
    val got = Funnel.stageTimes(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])].head()
    assert(got == ((7L, ts(1), Some(ts(2)), Some(ts(3)))))
  }

  test("retention: cohort by first activity, offsets counted once per period") {
    def at(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:01")
    // daily periods: user 1 cohort day0, active day0/day1/day1(dup)/day3;
    // user 2 cohort day1, active day1 only; user 3 cohort day0, day0+day1
    val e = Seq(
      (1L, at(0)), (1L, at(1)), (1L, at(1)), (1L, at(3)),
      (2L, at(1)),
      (3L, at(0)), (3L, at(1))).toDF("user_id", "ts")
    val got = Funnel.retention(e, "user_id", "ts", periodSec = 86400L)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._2, r._3)).sorted.toSeq // (offset, n) per cohort row
    // cohort day0 (users 1,3): offset 0 -> 2, offset 1 -> 2, offset 3 -> 1
    // cohort day1 (user 2):   offset 0 -> 1
    assert(got == Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 1L)))
  }

  test("rollingActives: trailing-window distinct counts, hand-checked") {
    def at(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // user 1 active days 0,1; user 2 active day 0 (twice); user 3 day 4
    val e = Seq(
      (1L, at(0)), (1L, at(1)),
      (2L, at(0)), (2L, at(0)),
      (3L, at(4))).toDF("user_id", "ts")
    val got = Funnel.rollingActives(e, "user_id", "ts",
        periodSec = 86400L, windowPeriods = 3)
      .as[(Long, Long)].collect().toMap
    val day0 = got.keys.min
    // window d counts users active in [d-2, d]
    val byOffset = got.map { case (k, v) => (k - day0, v) }
    assert(byOffset == Map(
      0L -> 2L, // day 0: users 1,2
      1L -> 2L, // days 0-1: users 1,2
      2L -> 2L, // days 0-2: users 1,2
      3L -> 1L, // days 1-3: user 1
      4L -> 1L  // days 2-4: user 3
    ), byOffset.toString)
  }

  test("period bucketing floors (not truncates): pre-1970 timestamps") {
    // 1969-12-31 12:00 UTC = epoch -43200 -> floor day -1; truncate-toward-
    // zero would give 0 and merge it with 1970-01-01
    val e = Seq(
      (1L, Timestamp.valueOf("1969-12-31 12:00:00")),
      (2L, Timestamp.valueOf("1970-01-01 12:00:00"))).toDF("user_id", "ts")
    val got = Funnel.retention(e, "user_id", "ts", periodSec = 86400L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((-1L, 0L, 1L), (0L, 0L, 1L)),
      s"pre-1970 day must bucket to -1, got $got")
  }

  test("invalid stage lists rejected") {
    intercept[IllegalArgumentException](
      Funnel.stageTimes(events, "user_id", "ts", "event_type", Seq.empty))
    intercept[IllegalArgumentException](
      Funnel.stageTimes(events, "user_id", "ts", "event_type", Seq("a", "a")))
  }

  test("kaplanMeier: hand-traced curve with horizon censoring") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")
    // u1: day 0 only (churn t=0); u2: days 0-1 (churn t=1); u3: days 0-3
    // (censored, last=horizon); u4: days 1-3 (censored t=2); u5: day 3
    // only (censored t=0)
    val e = Seq(
      (1L, d(0)),
      (2L, d(0)), (2L, d(1)),
      (3L, d(0)), (3L, d(3)),
      (4L, d(1)), (4L, d(3)),
      (5L, d(3))).toDF("user_id", "ts")
    val got = Funnel.kaplanMeier(e, "user_id", "ts")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // steps at churn times only; t=0: 5 at risk, 1 event -> S=0.8;
    // t=1: 3 at risk (u2,u3,u4), 1 event -> S=0.8*(2/3)=0.533333
    assert(got == Seq(
      (0L, 5L, 1L, 0.2d, 0.8d),
      (1L, 3L, 1L, 0.333333d, 0.533333d)), got.toString)
  }

  test("kaplanMeier: d = n_risk step drives survival to exact 0") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")
    // u1,u2: day 0 only; u3: days 0-1 (churns, horizon=5); u4: day 5
    // (censored, sets the horizon)
    val e = Seq(
      (1L, d(0)), (2L, d(0)),
      (3L, d(0)), (3L, d(1)),
      (4L, d(5))).toDF("user_id", "ts")
    val got = Funnel.kaplanMeier(e, "user_id", "ts")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // t=0: risk {u1,u2,u3,u4}=4, d=2 -> S=0.5; t=1: risk {u3}=1, d=1 ->
    // hazard 1, S exactly 0 (flag, not -inf arithmetic)
    assert(got == Seq(
      (0L, 4L, 2L, 0.5d, 0.5d),
      (1L, 1L, 1L, 1.0d, 0.0d)), got.toString)
  }

  test("kaplanMeier: all-censored cohort = EMPTY frame (the documented " +
      "'no churn observed' contract), never a crash") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")
    // every user's last activity falls in the horizon period (day 2):
    // zero event times, zero KM steps — S(t) = 1 reads as zero rows
    val e = Seq(
      (1L, d(0)), (1L, d(2)),
      (2L, d(1)), (2L, d(2)),
      (3L, d(2))).toDF("user_id", "ts")
    val got = Funnel.kaplanMeier(e, "user_id", "ts").collect()
    assert(got.isEmpty, got.mkString(","))
    // single-period data is the same degenerate case
    val single = Seq((1L, d(0)), (2L, d(0))).toDF("user_id", "ts")
    assert(Funnel.kaplanMeier(single, "user_id", "ts").collect().isEmpty)
  }

  test("logRank: hand-traced two-cohort comparison; degenerate cases; guards") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")
    // cohort A: u1 churns t=0, u2 censored (last = horizon day 3)
    // cohort B: u3 churns t=0, u4 churns t=1, u5 censored
    val e = Seq(
      (1L, "A", d(0)),
      (2L, "A", d(0)), (2L, "A", d(3)),
      (3L, "B", d(0)),
      (4L, "B", d(1)), (4L, "B", d(2)),
      (5L, "B", d(3))).toDF("user_id", "cohort", "ts")
    val got = Funnel.logRank(e, "user_id", "ts", "cohort")
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double)]
      .head()
    assert(got._1 == "A" && got._2 == "B")
    assert((got._3, got._4, got._5, got._6) == ((2L, 3L, 1L, 2L)))
    // t=0: at-risk nA=2 {u1,u2}, nB=3 {u3,u4,u5}; d=2 (u1,u3) ->
    //      e1 = 2*2/5 = 0.8, oe = +0.2; v = 2*(2/5)(3/5)(5-2)/4 = 0.36
    // t=1: at-risk {u2(A), u4(B)} (u5's lifespan is 0); d=1 (u4) ->
    //      e1 = 0.5, oe = -0.5; v = 1*(1/2)(1/2)*1/1 = 0.25
    assert(got._7 == -0.3d, got.toString)
    assert(got._8 == 0.61d, got.toString)
    assert(got._9 == 0.147541d, got.toString) // 0.09 / 0.61, 6 dp
    // identical curves (relabel one cohort per user, same lifespans):
    // mirrored fixture -> |oe| small but nonzero is fine; the REAL
    // degenerate contract: all-censored pair reports zeros, not a crash
    val flat = Seq((1L, "A", d(0)), (1L, "A", d(2)),
      (2L, "B", d(1)), (2L, "B", d(2))).toDF("user_id", "cohort", "ts")
    val z = Funnel.logRank(flat, "user_id", "ts", "cohort")
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double)]
      .head()
    assert((z._5, z._6, z._7, z._8, z._9) == ((0L, 0L, 0.0d, 0.0d, 0.0d)),
      z.toString)
    // guards: 3 cohorts; per-user cohort must be constant
    intercept[IllegalArgumentException](Funnel.logRank(
      Seq((1L, "A", d(0)), (2L, "B", d(0)), (3L, "C", d(1)))
        .toDF("user_id", "cohort", "ts"), "user_id", "ts", "cohort"))
    intercept[IllegalArgumentException](Funnel.logRank(
      Seq((1L, "A", d(0)), (1L, "B", d(1)), (2L, "B", d(1)))
        .toDF("user_id", "cohort", "ts"), "user_id", "ts", "cohort"))
  }

  test("kaplanMeier: typed guards") {
    intercept[IllegalArgumentException](Funnel.kaplanMeier(
      Seq((Option.empty[Long], ts(1))).toDF("user_id", "ts"),
      "user_id", "ts"))
    intercept[IllegalArgumentException](Funnel.kaplanMeier(
      events, "user_id", "ts", periodSec = 0L))
  }
}
