package graft.ops

import graft.SparkSpecBase

class ExactRankSpec extends SparkSpecBase {
  import spark.implicits._

  private def sortedSelect(vals: Seq[Long], rank: Long): Long =
    vals.sorted.apply((rank - 1).toInt)

  test("matches sort-based selection on random multisets (ties, skew, negatives)") {
    val rnd = new scala.util.Random(7)
    // three groups with very different shapes: heavy ties, wide range,
    // negative values — and sizes that exercise multi-round narrowing
    // at a tiny bucket count
    val data: Seq[(String, Long)] =
      (1 to 500).map(_ => "ties" -> (rnd.nextInt(5).toLong - 2)) ++
      (1 to 300).map(_ => "wide" -> (rnd.nextLong() % 1000000000000L)) ++
      (1 to 7).map(_ => "tiny" -> rnd.nextInt(100).toLong)
    val df = data.toDF("g", "c")
    val got = ExactRank.valuesAtRanks(spark, df, "g", "c",
        n => Seq("med" -> (n + 1) / 2, "p90" -> (n * 9 + 9) / 10),
        buckets = 16) // force ~multi-round narrowing
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byG = data.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2) }
    byG.foreach { case (g, vals) =>
      val n = vals.size.toLong
      assert(got(g)._1 == sortedSelect(vals, (n + 1) / 2), s"median of $g")
      assert(got(g)._2 == sortedSelect(vals, (n * 9 + 9) / 10), s"p90 of $g")
    }
  }

  test("single-value group and rank-1/rank-n extremes") {
    val df = Seq(("a", 42L), ("b", 5L), ("b", -3L), ("b", 5L)).toDF("g", "c")
    val got = ExactRank.valuesAtRanks(spark, df, "g", "c",
        n => Seq("lo" -> 1L, "hi" -> n), buckets = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((42L, 42L)))
    assert(got("b") == ((-3L, 5L)))
  }

  test("agrees with the former row_number plan on real lineitem cents") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_returnflag".as("g"),
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long").as("c"))
    val got = ExactRank.valuesAtRanks(spark, li, "g", "c",
        n => Seq("p05" -> (n + 19) / 20, "med" -> (n + 1) / 2))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val local = li.as[(String, Long)].collect().groupBy(_._1)
    local.foreach { case (g, rows) =>
      val vals = rows.map(_._2).toSeq
      val n = vals.size.toLong
      assert(got(g)._1 == sortedSelect(vals, (n + 19) / 20), s"p05 of $g")
      assert(got(g)._2 == sortedSelect(vals, (n + 1) / 2), s"median of $g")
    }
  }
}
