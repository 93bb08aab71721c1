package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed() = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k$i", i.toLong)
  }.toDF("key", "v")

  private val dims = Seq(("hot", "H"), ("k901", "A"), ("k950", "B"))
    .toDF("key", "name")

  test("saltedJoin equals the plain join row-for-row") {
    val expected = skewed().join(dims, "key")
      .select("key", "v", "name").collect().toSet
    val got = Skew.saltedJoin(skewed(), dims, "key", salts = 8, saltBy = $"v")
      .select("key", "v", "name").collect().toSet
    assert(got == expected)
    assert(got.count(_.getString(0) == "hot") == 900)
  }

  test("salted aggregation equals plain aggregation") {
    val expected = skewed().groupBy($"key")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Skew.saltedSumCount(skewed(), "key", "v", salts = 8, saltBy = $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("hotColdJoin equals the plain join row-for-row") {
    val lookup = skewed().groupBy($"key").agg(count(lit(1)).as("cnt"))
    val expected = skewed().join(lookup, "key")
      .select("key", "v", "cnt").collect().toSet
    for (hotK <- Seq(1, 2, 1000)) {
      val got = Skew.hotColdJoin(skewed(), lookup, Seq("key"), $"cnt", hotK)
        .select("key", "v", "cnt").collect().toSet
      assert(got == expected, s"hotK=$hotK")
    }
  }

  test("hotColdJoin routes the skewed key through the broadcast side") {
    val lookup = skewed().groupBy($"key").agg(count(lit(1)).as("cnt"))
    val out = Skew.hotColdJoin(skewed(), lookup, Seq("key"), $"cnt", hotK = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // the cold tail ("hot" is in the top-1 set, so only k901..k1000 shuffle)
    val cold = Skew.hotColdJoin(skewed(), lookup, Seq("key"), $"cnt", hotK = 1)
    assert(cold.filter($"key" === "hot").count() == 900)
  }

  test("hotColdJoin with composite keys") {
    val left = Seq(("a", "x", 1L), ("a", "x", 2L), ("b", "y", 3L))
      .toDF("k1", "k2", "v")
    val lookup = left.groupBy($"k1", $"k2").agg(count(lit(1)).as("cnt"))
    val expected = left.join(lookup, Seq("k1", "k2")).collect().toSet
    val got = Skew.hotColdJoin(left, lookup, Seq("k1", "k2"), $"cnt", 1)
      .collect().toSet
    assert(got == expected)
  }

  test("hotColdJoin ≡ plain join across randomized corpora, join types and hotK") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 6) {
      // zipf-ish random left side; lookup covers a random subset of keys
      val nKeys = 3 + rnd.nextInt(10)
      val rows = (1 to 200).map { i =>
        val k = s"k${math.min(nKeys - 1, (math.log(1 + rnd.nextInt(1 << nKeys)) / math.log(2)).toInt)}"
        (k, i.toLong)
      }
      val left = rows.toDF("key", "v")
      val lookup = left.groupBy($"key").agg(count(lit(1)).as("cnt"))
        .filter(pmod(hash($"key"), lit(3)) =!= 0) // drop ~1/3 of keys
      for (jt <- Seq("inner", "left"); hotK <- Seq(1, 3, 1000)) {
        val expected = left.join(lookup, Seq("key"), jt)
          .select("key", "v", "cnt").collect()
          .map(r => (r.getString(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
        val got = Skew.hotColdJoin(left, lookup, Seq("key"), $"cnt", hotK, jt)
          .select("key", "v", "cnt").collect()
          .map(r => (r.getString(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
        assert(got == expected, s"trial=$trial jt=$jt hotK=$hotK")
      }
    }
  }

  test("hotColdJoin ≡ plain join when duplicate lookup keys straddle the hotK boundary") {
    // lookup has TWO rows for key "a" with weights 10 and 1: a row-limit
    // hot set of size 2 would take a(10) and b(5), stranding a(1) on the
    // cold side where hot-matched left rows never reach it — the
    // key-complete hot set must keep both "a" rows together
    val left = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L)).toDF("key", "v")
    val lookup = Seq(("a", 10L, "p1"), ("a", 1L, "p2"), ("b", 5L, "p3"),
      ("c", 2L, "p4"), ("c", 2L, "p5")).toDF("key", "w", "payload")
    for (jt <- Seq("inner", "left"); hotK <- Seq(1, 2, 3, 10)) {
      val expected = left.join(lookup, Seq("key"), jt)
        .select("key", "v", "w", "payload").collect()
        .map(_.toSeq.toList).sortBy(_.toString).toList
      val got = Skew.hotColdJoin(left, lookup, Seq("key"), $"w", hotK, jt)
        .select("key", "v", "w", "payload").collect()
        .map(_.toSeq.toList).sortBy(_.toString).toList
      assert(got == expected, s"jt=$jt hotK=$hotK")
    }
  }

  test("hotColdJoin rejects a left frame already carrying the working column") {
    val left = Seq(("a", 1L)).toDF("key", "__graft_hot")
    val lookup = Seq(("a", 1L)).toDF("key", "cnt")
    val e = intercept[IllegalArgumentException] {
      Skew.hotColdJoin(left, lookup, Seq("key"), $"cnt", 1)
    }
    assert(e.getMessage.contains("__graft_hot"))
  }

  test("autoHotK covers the mass fraction and hotColdJoin(Auto) ≡ any explicit K") {
    val lookup = skewed().groupBy($"key").agg(count(lit(1)).as("cnt"))
    // the hot key alone is 900/1000 of the mass: massFrac 0.5 → K = 1;
    // massFrac 1.0 must take every key
    assert(Skew.autoHotK(lookup, Seq("key"), $"cnt", massFrac = 0.5) == 1)
    val nKeys = lookup.count().toInt
    assert(Skew.autoHotK(lookup, Seq("key"), $"cnt", massFrac = 1.0) == nKeys)
    // the broadcast cap binds
    assert(Skew.autoHotK(lookup, Seq("key"), $"cnt",
      massFrac = 1.0, maxHotK = 7) == 7)
    // the Auto sentinel: row-identical to explicit-K and to the plain join
    val expected = skewed().join(lookup, "key")
      .select("key", "v", "cnt").collect().toSet
    for (k <- Seq(Skew.Auto, 1, 3, 1000)) {
      val got = Skew.hotColdJoin(skewed(), lookup, Seq("key"), $"cnt", k)
        .select("key", "v", "cnt").collect().toSet
      assert(got == expected, s"hotK=$k diverged")
    }
    // degenerate lookups: empty → K = 1 (and the join still matches)
    val empty = lookup.filter($"cnt" < 0)
    assert(Skew.autoHotK(empty, Seq("key"), $"cnt") == 1)
    assert(Skew.hotColdJoin(skewed(), empty, Seq("key"), $"cnt",
      Skew.Auto, "left").count() == 1000L)
  }

  test("salt actually spreads the hot key across groups") {
    val partials = skewed()
      .withColumn("_salt", pmod(hash($"v"), lit(8)))
      .filter($"key" === "hot")
      .select("_salt").distinct().count()
    assert(partials > 4, s"hot key only reached $partials salt groups")
  }

  test("skewReport: hand-traced shares, exact integer salt ceiling") {
    import spark.implicits._
    // key a: 6 rows, b: 2, c: 1, NULL: 1 -> N=10, 4 keys; P=4:
    // balanced task = 2.5; a: skew 2.4x -> salt ceil(6*4/10)=3;
    // b: 0.8x -> salt 1; c/NULL: 0.4x -> salt 1
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(2)(Some("b")) ++
      Seq(Some("c"), Option.empty[String])).toDF("k")
    val got = graft.ops.Skew.skewReport(df, "k", partitions = 4)
      .as[(String, Long, Long, Long, Double, Double, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 6L, 10L, 4L, 0.6d, 2.4d, 3L),
      ("b", 2L, 10L, 4L, 0.2d, 0.8d, 1L),
      ("NULL", 1L, 10L, 4L, 0.1d, 0.4d, 1L),
      ("c", 1L, 10L, 4L, 0.1d, 0.4d, 1L)), got.toString)
    // topK cuts by mass with key tie-break
    val t = graft.ops.Skew.skewReport(df, "k", partitions = 4, topK = 2)
      .as[(String, Long, Long, Long, Double, Double, Long)]
      .collect().toSeq.map(_._1)
    assert(t == Seq("a", "b"), t.toString)
    intercept[IllegalArgumentException](
      graft.ops.Skew.skewReport(df.limit(0), "k", partitions = 4))
    intercept[IllegalArgumentException](
      graft.ops.Skew.skewReport(df, "k", partitions = 0))
  }
}
