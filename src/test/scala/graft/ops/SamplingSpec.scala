package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = (0L until 1000L).toDF("id")

  test("hashSplit is deterministic and roughly proportional") {
    val counts = Sampling.hashSplit(docs, "id", trainPct = 80, valPct = 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    assert(counts("test") > 50 && counts("test") < 160)
    // rerun → identical assignment
    val again = Sampling.hashSplit(docs, "id").groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("splits are disjoint and assignment survives repartitioning") {
    val a = Sampling.hashSplit(docs, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(docs.repartition(13), "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("hashSample(p) is a subset consistent with the bucket definition") {
    val sampled = Sampling.hashSample(docs, "id", 10).as[Long].collect().toSet
    val buckets = docs.select($"id", Sampling.hashBucket($"id").as("b"))
      .as[(Long, Long)].collect().toMap
    assert(sampled == buckets.filter(_._2 < 10).keySet)
  }

  test("invalid percentages rejected") {
    intercept[IllegalArgumentException](Sampling.hashSplit(docs, "id", 95, 10))
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(docs.withColumn("g", $"id" % 2), "g", "id", 0))
  }

  test("packSequences: contiguous token-budget packing per shard") {
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L), (4L, "a", 30L),
      (5L, "b", 300L), (6L, "b", 10L))
      .toDF("id", "shard", "n_tokens")
    val got = Sampling.packSequences(df, "id", "n_tokens", "shard", 256)
      .select("id", "seq_id", "tok_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // shard a cum-before: 0,100,200,300 -> seqs 0,0,0,1; offsets 0,100,200,44
    // shard b cum-before: 0,300 -> seqs 0,1; offsets 0,44
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 100L), (3L, 0L, 200L),
      (4L, 1L, 44L), (5L, 0L, 0L), (6L, 1L, 44L)))
    // partition-layout independent (windowed prefix sum, not zipWithIndex)
    val again = Sampling.packSequences(df.repartition(7), "id", "n_tokens",
        "shard", 256)
      .select("id", "seq_id", "tok_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again == got)
  }

  test("weightedSample: per-group keep rates via the shared hash bucket") {
    val df = (0L until 1000L).toDF("id")
      .withColumn("src", when($"id" < 500L, "keep_all").otherwise("keep_none"))
    val got = Sampling.weightedSample(df, "id", "src",
      Map("keep_all" -> 100, "keep_none" -> 0))
    val srcs = got.select("src").distinct().as[String].collect().toSet
    assert(srcs == Set("keep_all") && got.count() == 500L)
    // unknown group falls back to defaultPct; buckets match hashSample's
    val half = Sampling.weightedSample(df, "id", "src", Map.empty, defaultPct = 10)
    val direct = Sampling.hashSample(df, "id", 10)
    assert(half.select("id").as[Long].collect().toSet
      == direct.select("id").as[Long].collect().toSet)
    intercept[IllegalArgumentException](
      Sampling.weightedSample(df, "id", "src", Map("x" -> 101)))
  }

  test("stratifiedSample caps each group at k, deterministically") {
    val df = (0L until 500L).toDF("id")
      .withColumn("g", ($"id" % 7).cast("string"))
    val got = Sampling.stratifiedSample(df, "g", "id", k = 10)
      .select("g", "id", "rn").as[(String, Long, Long)].collect()
    val byGroup = got.groupBy(_._1)
    assert(byGroup.size == 7)
    byGroup.values.foreach { rows =>
      assert(rows.length == 10)
      assert(rows.map(_._3).sorted.toSeq == (1L to 10L)) // dense ranks 1..k
    }
    // identical selection regardless of partitioning
    val again = Sampling.stratifiedSample(df.repartition(17), "g", "id", 10)
      .select("g", "id", "rn").as[(String, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("stratifiedSample keeps whole groups smaller than k") {
    val df = Seq((1L, "big"), (2L, "big"), (3L, "big"), (4L, "small"))
      .toDF("id", "g")
    val got = Sampling.stratifiedSample(df, "g", "id", k = 2)
      .select("g", "id").as[(String, Long)].collect()
    assert(got.count(_._1 == "big") == 2)
    assert(got.count(_._1 == "small") == 1) // under quota: kept entirely
  }

  test("fixedSample: exact size, deterministic membership, top-k plan") {
    val df = (1L to 1000L).map(i => (i, s"p$i")).toDF("id", "payload")
    val got = Sampling.fixedSample(df, "id", 50)
    assert(got.count() == 50)
    val ids = got.select("id").as[Long].collect().toSet
    val again = Sampling.fixedSample(df.repartition(13), "id", 50)
      .select("id").as[Long].collect().toSet
    assert(ids == again, "membership is partition-independent")
    // no global sort: the plan must be TakeOrderedAndProject
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
    // growing the corpus only perturbs membership via the hash order
    val more = (1L to 2000L).map(i => (i, s"p$i")).toDF("id", "payload")
    val grown = Sampling.fixedSample(more, "id", 50)
      .select("id").as[Long].collect().toSet
    assert(grown.size == 50 && ids.intersect(grown).size >= 20,
      "old members persist unless displaced by smaller hashes")
  }

  test("epochShuffle: a permutation per shard, stable across partitionings") {
    val df = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "g")
    val e1 = Sampling.epochShuffle(df, "id", "g", epoch = 1)
      .select("g", "id", "pos").as[(String, Long, Long)].collect()
    // positions are a dense 0..n-1 permutation within each shard
    e1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // deterministic under repartitioning
    val again = Sampling.epochShuffle(df.repartition(17), "id", "g", epoch = 1)
      .select("g", "id", "pos").as[(String, Long, Long)].collect()
    assert(e1.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("epochShuffle orders differ across epochs but not across runs") {
    val df = (1L to 200L).map(i => (i, "s")).toDF("id", "g")
    def order(epoch: Int): Seq[Long] =
      Sampling.epochShuffle(df, "id", "g", epoch)
        .orderBy($"pos").select("id").as[Long].collect().toSeq
    val o1 = order(1)
    assert(o1 == order(1), "same epoch -> same order")
    assert(o1 != order(2), "different epoch -> different order")
    assert(o1.sorted == (1L to 200L), "still a permutation")
    assert(o1 != (1L to 200L), "and actually shuffled")
  }

  test("weightedFixedSample: exact size, replayable membership, weight bias, top-k plan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Sampling.weightedFixedSample(docs, "doc_id", "n_chars", k = 50)
    val rows = got.select($"doc_id", $"n_chars", $"wkey_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.size == 50)
    // membership replays from the formula: naive in-memory A-ES keys
    val all = docs.select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    def key(id: Long, w: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(13)
      val m = java.lang.Long.parseLong(hex, 16)
      math.round(math.log((m + 0.5d) / 4503599627370496.0d) / w.toDouble * 1e6d)
    }
    val expect = all.map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k0) => (-k0, id) }.take(50).toSeq
    assert(rows.sortBy(t => (-t._3, t._1)) == expect,
      "sample must replay the A-ES key formula exactly")
    // the weighting works: the weighted sample's mean length must beat
    // the uniform (md5-ordered) sample's by a clear margin
    val wMean = rows.map(_._2).sum.toDouble / rows.size
    val uMean = Sampling.fixedSample(docs, "doc_id", 50)
      .select($"n_chars").as[Long].collect().sum.toDouble / 50
    assert(wMean > uMean * 1.05,
      f"weighted mean $wMean%.0f must exceed uniform mean $uMean%.0f")
    // partition independence + top-k plan (never a global sort)
    val again = Sampling.weightedFixedSample(
        docs.repartition(13), "doc_id", "n_chars", k = 50)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == rows.map(_._1).toSet)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("alphaSample upsamples low-resource groups; alpha=1 is proportional") {
    val docs = ((0L until 800L).map(i => (i, "big")) ++
      (800L until 900L).map(i => (i, "small"))).toDF("doc_id", "grp")
    val rates = Sampling.alphaSample(docs, "doc_id", "grp", alpha = 0.3,
        targetFrac = 0.2)
      .select($"grp", $"rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("small") > rates("big"),
      s"alpha<1 must upsample the small group: $rates")
    // alpha=1 degenerates to plain proportional sampling: every group's
    // rate equals targetFrac (p_g^1 / Z = p_g, so rate = f·N·p_g/n_g = f)
    val prop = Sampling.alphaSample(docs, "doc_id", "grp", alpha = 1.0,
        targetFrac = 0.25)
      .select($"rate").distinct().as[Double].collect().toSet
    assert(prop == Set(0.25), s"alpha=1 must give rate=targetFrac: $prop")
  }

  test("alphaSample membership is deterministic and partition-independent") {
    val docs = (0L until 500L).map(i => (i, s"g${i % 4}")).toDF("doc_id", "grp")
    val a = Sampling.alphaSample(docs, "doc_id", "grp")
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.alphaSample(docs.repartition(17), "doc_id", "grp")
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    // expected size ≈ targetFrac·N; md5 uniformity keeps it in family
    assert(a.size > 50 && a.size < 150, s"~100 expected, got ${a.size}")
  }

  test("alphaSample rejects out-of-range parameters") {
    val docs = Seq((0L, "a")).toDF("doc_id", "grp")
    intercept[IllegalArgumentException] {
      Sampling.alphaSample(docs, "doc_id", "grp", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.alphaSample(docs, "doc_id", "grp", targetFrac = 1.5)
    }
  }

  test("uniMax: hand-computed waterfill, budget exhausted exactly, over-budget saturates all") {
    // supplies a=10 b=20 c=100 d=200, B=120: a,b saturate (k*=2, P=30),
    // water level T=(120-30)/2=45 -> alloc 10,20,45,45
    val rows = Seq(("a", 4L), ("a", 6L), ("b", 20L), ("c", 100L), ("d", 200L))
      .toDF("grp", "n")
    val got = Sampling.uniMax(rows, "grp", "n", budget = 120L)
      .orderBy("grp")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 10L, 10.0d, 0.083333d),
      ("b", 20L, 20.0d, 0.166667d),
      ("c", 100L, 45.0d, 0.375d),
      ("d", 200L, 45.0d, 0.375d)), got.toString)
    assert(math.abs(got.map(_._3).sum - 120.0d) < 1e-6,
      "waterfilling must exhaust the budget when supply exceeds it")
    // budget above total supply: every group saturates at its own supply
    val over = Sampling.uniMax(rows, "grp", "n", budget = 1000L)
      .orderBy("grp").as[(String, Long, Double, Double)].collect().toSeq
    assert(over.map(x => (x._1, x._3)) ==
      Seq(("a", 10.0d), ("b", 20.0d), ("c", 100.0d), ("d", 200.0d)))
    // partition-layout independence
    val rep = Sampling.uniMax(rows.repartition(3), "grp", "n", budget = 120L)
      .orderBy("grp").as[(String, Long, Double, Double)].collect().toSeq
    assert(rep == got)
    intercept[IllegalArgumentException] {
      Sampling.uniMax(rows, "grp", "n", budget = 0L)
    }
  }

  test("effectiveSampleSize: Kish identity hand-checked, bounds, guards") {
    // uniform weights: ESS = n exactly, ratio 1
    val uni = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 1.0))
      .toDF("grp", "w")
    val u = Sampling.effectiveSampleSize(uni, "grp", "w")
      .as[(String, Long, Double, Double, Double)].head()
    assert(u == (("a", 4L, 4.0d, 4.0d, 1.0d)), u.toString)
    // (1, 0.5, 0.5): ESS = 2^2 / 1.5 = 2.666667, ratio 0.888889
    val mix = Seq(("a", 1.0), ("a", 0.5), ("a", 0.5)).toDF("grp", "w")
    val m = Sampling.effectiveSampleSize(mix, "grp", "w")
      .as[(String, Long, Double, Double, Double)].head()
    assert(m == (("a", 3L, 2.0d, 2.666667d, 0.888889d)), m.toString)
    // one dominant weight: ESS collapses toward 1 however many rows ride
    val dom = (("a", 1.0) +: Seq.fill(9)(("a", 0.000001))).toDF("grp", "w")
    val d = Sampling.effectiveSampleSize(dom, "grp", "w")
      .select($"ess").as[Double].head()
    assert(d > 1.0d && d < 1.001d, d.toString)
    // partition-layout independence
    val two = Seq(("a", 1.0), ("a", 0.25), ("b", 0.5)).toDF("grp", "w")
    val base = Sampling.effectiveSampleSize(two, "grp", "w")
      .orderBy($"group").collect().toSeq
    val rep = Sampling.effectiveSampleSize(two.repartition(4), "grp", "w")
      .orderBy($"group").collect().toSeq
    assert(base == rep)
    // zero, negative, NULL and oversized weights fail typed
    intercept[IllegalArgumentException](Sampling.effectiveSampleSize(
      Seq(("a", 0.0)).toDF("grp", "w"), "grp", "w"))
    intercept[IllegalArgumentException](Sampling.effectiveSampleSize(
      Seq(("a", -0.5)).toDF("grp", "w"), "grp", "w"))
    intercept[IllegalArgumentException](Sampling.effectiveSampleSize(
      Seq(("a", Option.empty[Double])).toDF("grp", "w"), "grp", "w"))
    intercept[IllegalArgumentException](Sampling.effectiveSampleSize(
      Seq(("a", 1.5e6)).toDF("grp", "w"), "grp", "w"))
  }

  test("neymanAllocation: variance-weighted budget, capping, zero-sigma") {
    // A: values (0, 10) -> sigma 5; B: (5, 5) -> sigma 0.
    // Neyman weight all on A, capped at |A| = 2; B gets 0.
    // Proportional: each round(10 * 2/4) = 5, capped at 2.
    val df = Seq(("A", 0.0), ("A", 10.0), ("B", 5.0), ("B", 5.0))
      .toDF("src", "v")
    val got = Sampling.neymanAllocation(df, "src", "v", budget = 10L)
      .as[(String, Long, Double, Double, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 2L, 5.0d, 0.5d, 2L, 2L),
      ("B", 2L, 0.0d, 0.5d, 2L, 0L)), got.toString)
  }

  test("neymanAllocation: oversamples the noisy stratum; guards typed") {
    // A: 100 rows, sigma 1 (alternating 0/2); B: 100 rows, sigma 3
    // (alternating 0/6). Weights 100 vs 300 -> of budget 40:
    // A gets 10, B gets 30 — vs 20/20 proportional.
    val rows = (1 to 100).map(i => ("A", if (i % 2 == 0) 2.0 else 0.0)) ++
      (1 to 100).map(i => ("B", if (i % 2 == 0) 6.0 else 0.0))
    val df = rows.toDF("src", "v")
    val got = Sampling.neymanAllocation(df, "src", "v", budget = 40L)
      .as[(String, Long, Double, Double, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 100L, 1.0d, 0.5d, 20L, 10L),
      ("B", 100L, 3.0d, 0.5d, 20L, 30L)), got.toString)
    // partition invariance
    val rep = Sampling.neymanAllocation(df.repartition(7), "src", "v", 40L)
      .as[(String, Long, Double, Double, Long, Long)].collect().toSeq
    assert(rep == got)
    intercept[IllegalArgumentException](Sampling.neymanAllocation(
      df, "src", "v", budget = 0L))
    intercept[IllegalArgumentException](Sampling.neymanAllocation(
      Seq(("A", Option.empty[Double])).toDF("src", "v"), "src", "v", 10L))
  }

  test("jackknifeRate: hand-traced two-source SE; identical units give 0") {
    // u1 passes 2/2, u2 passes 0/2: rate 0.5, LOO rates 0 and 1,
    // SE = sqrt(1*(2*1e18 - 1e18))/2/1e9 = 0.5
    val df = Seq(("a", 1L), ("a", 1L), ("b", 0L), ("b", 0L))
      .toDF("src", "keep")
    val got = Sampling.jackknifeRate(df, "src", "keep")
      .as[(Long, Long, Double, Double)].head()
    assert(got == ((2L, 4L, 0.5d, 0.5d)), got.toString)
    // exchangeable units -> every LOO rate identical -> SE exactly 0
    val same = Seq(("a", 1L), ("a", 0L), ("b", 1L), ("b", 0L))
      .toDF("src", "keep")
    val z = Sampling.jackknifeRate(same, "src", "keep")
      .as[(Long, Long, Double, Double)].head()
    assert(z == ((2L, 4L, 0.5d, 0.0d)), z.toString)
    // partition invariance of the quantized variance lattice
    val p = Sampling.jackknifeRate(same.repartition(7), "src", "keep")
      .as[(Long, Long, Double, Double)].head()
    assert(p == z)
  }

  test("jackknifeRate: typed guards — one unit, NULL, off-domain flag") {
    intercept[IllegalArgumentException](Sampling.jackknifeRate(
      Seq(("a", 1L), ("a", 0L)).toDF("src", "keep"), "src", "keep"))
    intercept[IllegalArgumentException](Sampling.jackknifeRate(
      Seq(("a", Option.empty[Long]), ("b", Option(1L))).toDF("src", "keep"),
      "src", "keep"))
    intercept[IllegalArgumentException](Sampling.jackknifeRate(
      Seq(("a", 2L), ("b", 1L)).toDF("src", "keep"), "src", "keep"))
  }

  test("hillTail: hand-traced geometric tail; flat tail reports NULL alpha") {
    // top-3 at k=2: 8, 4, tail 2 → terms ln(4), ln(2) nano-summed
    val vals = (Seq(8L, 4L, 2L) ++ Seq.fill(7)(1L)).toDF("v")
    val got = Sampling.hillTail(vals, "v", k = 2)
      .as[(Long, Long, Long, Double, Option[Double])].head()
    val sl = math.round(math.log(4.0d) * 1e9d) + math.round(math.log(2.0d) * 1e9d)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((2L, 10L, 2L, r6(sl.toDouble / 2.0d / 1e9d),
      Some(r6(2.0d * 1e9d / sl.toDouble)))), got.toString)
    // all-equal tail: every ratio 1, ln 0 → inv_alpha 0, alpha NULL
    val flat = Seq.fill(10)(5L).toDF("v")
    val f = Sampling.hillTail(flat, "v", k = 2)
      .as[(Long, Long, Long, Double, Option[Double])].head()
    assert(f == ((2L, 10L, 5L, 0.0d, None)), f.toString)
    // boundary ties: extra copies of the tail value contribute 0 terms
    val ties = (Seq(8L, 2L, 2L, 2L) ++ Seq.fill(6)(1L)).toDF("v")
    val t = Sampling.hillTail(ties, "v", k = 2)
      .as[(Long, Long, Long, Double, Option[Double])].head()
    val sl2 = math.round(math.log(4.0d) * 1e9d)
    assert(t._3 == 2L && t._4 == r6(sl2.toDouble / 2.0d / 1e9d), t.toString)
  }

  test("hillTail: typed guards") {
    val ok = (1L to 10L).toDF("v")
    intercept[IllegalArgumentException](Sampling.hillTail(ok, "v", k = 1))
    intercept[IllegalArgumentException](Sampling.hillTail(
      (1L to 3L).toDF("v"), "v", k = 5))
    intercept[IllegalArgumentException](Sampling.hillTail(
      Seq(1L, 0L).toDF("v"), "v", k = 2))
    intercept[IllegalArgumentException](Sampling.hillTail(
      Seq(Option(1L), None).toDF("v"), "v", k = 2))
  }

  test("importanceWeights: hand-traced clip and Kish ESS") {
    // A: 8 rows, B: 2 -> raw 0.625 / 2.5; clip at 2 -> B w = 2
    // ESS = (8*.625 + 2*2)^2 / (8*.625^2 + 2*4) = 81/11.125 = 7.280899
    val df = (Seq.fill(8)("A") ++ Seq.fill(2)("B")).toDF("g")
    val got = Sampling.importanceWeights(df, "g", wMax = 2.0d)
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      ("A", 8L, 0.8d, 0.625d, 0.625d, 7.280899d, 0.72809d),
      ("B", 2L, 0.2d, 2.5d, 2.0d, 7.280899d, 0.72809d)), got.toString)
    // unclipped: ESS = 100/15.625 = 6.4
    val un = Sampling.importanceWeights(df, "g", wMax = 10.0d)
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(un == Seq(
      ("A", 8L, 0.8d, 0.625d, 0.625d, 6.4d, 0.64d),
      ("B", 2L, 0.2d, 2.5d, 2.5d, 6.4d, 0.64d)), un.toString)
    intercept[IllegalArgumentException](Sampling.importanceWeights(
      Seq(Option.empty[String], Some("A")).toDF("g"), "g"))
    intercept[IllegalArgumentException](Sampling.importanceWeights(
      df, "g", wMax = 0.5d))
  }
}
