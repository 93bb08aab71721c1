package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    // (id, group, prio) — ids 1..3 form one near-dup cluster, 4..5 another
    (1L, "a", 100L), (2L, "a", 90L), (3L, "b", 80L),
    (4L, "b", 70L), (5L, "a", 60L), (6L, "b", 50L),
    (7L, "a", 40L), (8L, "b", 30L), (9L, "a", 20L), (10L, "b", 10L))
    .toDF("doc_id", "source", "n_chars")

  private def pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a_id", "b_id")

  test("clusterSplit: every near-dup pair lands wholly in one split") {
    val asg = Curation.clusterSplit(docs, "doc_id", pairs)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(asg.size == 10)
    Seq((1L, 2L), (2L, 3L), (4L, 5L)).foreach { case (a, b) =>
      assert(asg(a) == asg(b), s"pair ($a,$b) straddles splits")
    }
  }

  test("clusterSplit: cluster members share the hash fate of the cluster min id") {
    val out = Curation.clusterSplit(docs, "doc_id", pairs)
      .select($"doc_id", $"component", $"split")
      .as[(Long, Long, String)].collect()
      .map { case (i, c, s) => i -> ((c, s)) }.toMap
    // components label with the cluster min; singletons with themselves
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L)
    assert(out(4L)._1 == 4L && out(5L)._1 == 4L)
    assert(out(6L)._1 == 6L)
    // singleton docs split exactly like hashSplit on their own id
    val solo = Sampling.hashSplit(docs.filter($"doc_id" >= 6L), "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    solo.foreach { case (id, s) => assert(out(id)._2 == s) }
  }

  test("clusterSplit: assignment is partition-layout independent") {
    val a = Curation.clusterSplit(docs, "doc_id", pairs)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = Curation.clusterSplit(docs.repartition(7), "doc_id", pairs.repartition(3))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("capPerGroup keeps exactly top-k by priority with id tie-break") {
    val withTies = Seq(
      (1L, "a", 50L), (2L, "a", 50L), (3L, "a", 50L), (4L, "a", 99L),
      (5L, "b", 1L))
      .toDF("doc_id", "source", "n_chars")
    val kept = Curation.capPerGroup(withTies, "source", "n_chars", "doc_id", 3)
      .select($"doc_id").as[Long].collect().toSet
    // group a: prio 99 first, then ties 50/50/50 broken by id asc → 4,1,2
    assert(kept == Set(4L, 1L, 2L, 5L))
  }

  test("capPerGroup leaves groups under the cap untouched") {
    val kept = Curation.capPerGroup(docs, "source", "n_chars", "doc_id", 25)
    assert(kept.count() == docs.count())
  }

  test("kAnonymityProfile counts risky cells and rows below k") {
    val rows = Seq(
      ("a", "x", 1L), ("a", "x", 1L), ("a", "x", 1L), // cell of 3: safe at k=3
      ("a", "y", 1L),                                 // cell of 1: risky
      ("b", "x", 1L), ("b", "y", 1L))                 // two risky cells
      .toDF("source", "lang", "b")
    val got = Curation.kAnonymityProfile(rows, Seq("source"), Seq("lang", "b"), k = 3)
      .select($"source", $"n_cells", $"n_risky_cells", $"n_risky_rows", $"anonymity")
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (s, a, b2, c, d) => s -> ((a, b2, c, d)) }.toMap
    assert(got("a") == ((2L, 1L, 1L, 1L)))
    assert(got("b") == ((2L, 2L, 2L, 1L)))
  }

  test("corpusDiff classifies added/removed/changed/same exactly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "a"), (2L, "B2"), (4L, "  d "), (5L, "e"))
      .toDF("doc_id", "text")
    val got = Curation.corpusDiff(old, nw, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // 4's text differs only by whitespace → same fingerprint (normText)
    assert(got == Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      4L -> "same", 5L -> "added"))
  }

  test("filterFunnel: first-reject attribution, chained n_in, zero-reject stages emit") {
    // doc 1 passes all; 2,3 fail gate a; 4 fails b (and would fail c);
    // 5 fails only c — gate c's zero blame for doc 4 is the ORDERED
    // semantics under test
    val sig = Seq(
      (1L, true, true, true),
      (2L, false, true, true),
      (3L, false, false, true),
      (4L, true, false, false),
      (5L, true, true, false)).toDF("id", "a", "b", "c")
    val got = Curation.filterFunnel(sig, Seq(
        "a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .orderBy("stage")
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, "a", 5L, 2L, 3L, 0.4d),
      (1L, "b", 3L, 1L, 2L, 0.333333d),
      (2L, "c", 2L, 1L, 1L, 0.5d)), got.toString)
    // reordering changes attribution, never the survivor count
    val rev = Curation.filterFunnel(sig, Seq(
        "c" -> col("c"), "b" -> col("b"), "a" -> col("a")))
      .orderBy("stage")
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
    assert(rev.last._5 == 1L, rev.toString)
    assert(rev.map(_._4).sum == got.map(_._4).sum)
    // partition-layout independence
    val rep = Curation.filterFunnel(sig.repartition(7), Seq(
        "a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .orderBy("stage")
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
    assert(rep == got)
    // NULL gate value → typed, never silent misattribution
    val withNull = Seq((1L, Some(true)), (2L, None)).toDF("id", "a")
    intercept[IllegalArgumentException] {
      Curation.filterFunnel(withNull, Seq("a" -> col("a")))
    }
    intercept[IllegalArgumentException] {
      Curation.filterFunnel(sig, Seq("a" -> col("a"), "a" -> col("b")))
    }
  }

  test("kAnonymityProfile rejects degenerate k") {
    intercept[IllegalArgumentException](
      Curation.kAnonymityProfile(docs, Seq("source"), Seq("n_chars"), k = 1))
    intercept[IllegalArgumentException](
      Curation.capPerGroup(docs, "source", "n_chars", "doc_id", 0))
  }

  test("lDiversityProfile: floors, risky cells, entropy-l, guards") {
    // g1/c1: all one sensitive value (l = 1, entropy-l = 1);
    // g1/c2: balanced two values (l = 2, entropy-l = 2)
    val rows = Seq(
      ("g1", "c1", "x"), ("g1", "c1", "x"), ("g1", "c1", "x"),
      ("g1", "c2", "x"), ("g1", "c2", "y"),
      ("g2", "c1", "x"), ("g2", "c1", "y"), ("g2", "c1", "z"))
      .toDF("grp", "cell", "sens")
    val got = Curation.lDiversityProfile(rows, Seq("grp"), Seq("cell"),
        "sens", l = 2)
      .orderBy($"grp")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("g1", 2L, 1L, 1L, 3L, 1.0d),
      ("g2", 1L, 3L, 0L, 0L, 3.0d)), got.toString)
    // a skewed cell (99%/1%-style) scores entropy-l far below distinct-l
    val skew = (Seq.fill(9)(("g", "c", "x")) :+ (("g", "c", "y")))
      .toDF("grp", "cell", "sens")
    val e = Curation.lDiversityProfile(skew, Seq("grp"), Seq("cell"),
        "sens", l = 2)
      .select($"l_floor", $"entropy_l_floor")
      .as[(Long, Double)].head()
    assert(e._1 == 2L && e._2 < 1.4d && e._2 > 1.0d, e.toString)
    // partition invariance
    val rep = Curation.lDiversityProfile(rows.repartition(5), Seq("grp"),
        Seq("cell"), "sens", l = 2)
      .orderBy($"grp")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(rep == got)
    intercept[IllegalArgumentException](Curation.lDiversityProfile(
      rows, Seq("grp"), Seq("cell"), "sens", l = 1))
    intercept[IllegalArgumentException](Curation.lDiversityProfile(
      Seq(("g", "c", Option.empty[String])).toDF("grp", "cell", "sens"),
      Seq("grp"), Seq("cell"), "sens", l = 2))
  }

  test("tClosenessProfile: hand-traced TVD with dense completion") {
    // global: en 4, de 4 (p = .5/.5).
    // cell c1: (en,en,en,de) -> q=(.75,.25), TVD = .25
    // cell c2: (en,de,de,de) -> TVD = .25
    val rows = (Seq.fill(3)(("g", "c1", "en")) :+ (("g", "c1", "de")) :+
      (("g", "c2", "en"))) ++ Seq.fill(3)(("g", "c2", "de"))
    val df = rows.toDF("grp", "cell", "sens")
    val got = Curation.tClosenessProfile(df, Seq("grp"), Seq("cell"),
        "sens", t = 0.2)
      .as[(String, Long, Double, Long, Long)].head()
    assert(got == (("g", 2L, 0.25d, 2L, 8L)), got.toString)
    // at t = 0.3 nothing is risky
    val loose = Curation.tClosenessProfile(df, Seq("grp"), Seq("cell"),
        "sens", t = 0.3)
      .as[(String, Long, Double, Long, Long)].head()
    assert(loose == (("g", 2L, 0.25d, 0L, 0L)), loose.toString)
  }

  test("tClosenessProfile: absent values deviate (dense completion) + guards") {
    // cell c1 holds ONLY 'en' (2 rows); global en 4 / de 4:
    // TVD(c1) = (|1 - .5| + |0 - .5|)/2 = 0.5 — an l-diversity-blind
    // leak the dense completion must surface (dropping the absent 'de'
    // row would understate it as 0.25)
    val rows = Seq.fill(2)(("g", "c1", "en")) ++
      (Seq.fill(2)(("g", "c2", "en")) ++ Seq.fill(4)(("g", "c2", "de")))
    val df = rows.toDF("grp", "cell", "sens")
    val got = Curation.tClosenessProfile(df, Seq("grp"), Seq("cell"),
        "sens", t = 0.4)
      .as[(String, Long, Double, Long, Long)].head()
    assert(got._3 == 0.5d, got.toString)
    assert(got._4 == 1L && got._5 == 2L, got.toString)
    // partition invariance
    val rep = Curation.tClosenessProfile(df.repartition(4), Seq("grp"),
        Seq("cell"), "sens", t = 0.4)
      .as[(String, Long, Double, Long, Long)].head()
    assert(rep == got)
    intercept[IllegalArgumentException](Curation.tClosenessProfile(
      Seq(("g", "c", Option.empty[String])).toDF("grp", "cell", "sens"),
      Seq("grp"), Seq("cell"), "sens", t = 0.2))
    intercept[IllegalArgumentException](Curation.tClosenessProfile(
      df, Seq("grp"), Seq("cell"), "sens", t = 0.0))
  }

  test("planGates: most-selective-first order, exact est recurrence, invariance witness") {
    // 4 docs; gate a passes 1, b passes 3, c passes 2 -> plan a, c, b
    val df = Seq(
      (1L, true, true, true), (2L, false, true, true),
      (3L, false, true, false), (4L, false, false, false))
      .toDF("id", "a", "b", "c")
    val gates = Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"))
    val got = Curation.planGates(df, gates)
      .as[(Long, String, Long, Double, Long, Long)].collect().toSeq
    // est: n=4; r_a=250000 -> est2 = 4*250000/1e6 = 1; r_c=500000 ->
    // est3 = 1*500000/1e6 = 0; joint pass = doc 1 only
    assert(got == Seq(
      (1L, "a", 1L, 0.25d, 4L, 1L),
      (2L, "c", 2L, 0.5d, 1L, 1L),
      (3L, "b", 3L, 0.75d, 0L, 1L)), got.toString)
    // the witness is the measured conjunction, not a model estimate
    assert(got.head._6 ==
      df.filter(col("a") && col("b") && col("c")).count())
    // n_pass ties break on gate name; gate ORDER in the call is irrelevant
    val tied = Curation.planGates(df,
      Seq("z" -> col("c"), "y" -> col("c")))
      .as[(Long, String, Long, Double, Long, Long)].collect().toSeq
    assert(tied.map(_._2) == Seq("y", "z"), tied.toString)
    assert(Curation.planGates(df, gates.reverse).collect()
      .map(_.getString(1)).toSeq == got.map(_._2),
      "plan must not depend on declaration order")
  }

  test("planGates: typed guards — NULL gate, empty corpus, dup names") {
    val df = Seq((1L, Option(true)), (2L, Option.empty[Boolean]))
      .toDF("id", "g")
    intercept[IllegalArgumentException](
      Curation.planGates(df, Seq("g" -> col("g"))))
    intercept[IllegalArgumentException](Curation.planGates(
      df.filter(col("id") < 0L), Seq("g" -> col("g").isNotNull)))
    intercept[IllegalArgumentException](Curation.planGates(
      df, Seq("g" -> col("g"), "g" -> col("g"))))
  }

  test("greedyVocabCover: hand-traced greedy chain, zero-gain tail, k cap") {
    val docs = Seq((1L, "a b c"), (2L, "c d"), (3L, "e"), (4L, "a b"))
      .toDF("doc_id", "text")
    val got = Curation.greedyVocabCover(docs, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // pick 1 (gain 3) -> tie(2: d, 3: e) -> min id 2 -> 3 -> 4 (gain 0)
    assert(got == Seq((1L, 1L, 3L, 3L), (2L, 2L, 1L, 4L),
      (3L, 3L, 1L, 5L), (4L, 4L, 0L, 5L)), got.toString)
    // k larger than the doc count stops at the doc count
    val capped = Curation.greedyVocabCover(docs, "doc_id", "text", k = 10)
    assert(capped.count() == 4L)
    // duplicate words inside a doc count once
    val dup = Curation.greedyVocabCover(
      Seq((1L, "a a a"), (2L, "b c")).toDF("doc_id", "text"),
      "doc_id", "text", k = 2).as[(Long, Long, Long, Long)].collect().toSeq
    assert(dup == Seq((1L, 2L, 2L, 2L), (2L, 1L, 1L, 3L)), dup.toString)
    intercept[IllegalArgumentException](
      Curation.greedyVocabCover(docs, "doc_id", "text", k = 0))
  }
}
