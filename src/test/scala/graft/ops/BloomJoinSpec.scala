package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("set/test kernel: no false negatives, low false-positive rate") {
    val numBits = 1 << 16
    val k = 5
    val bits = new Array[Long](numBits >> 6)
    val keys = (0L until 2000L).map(_ * 7919L + 13L)
    keys.foreach(BloomJoin.set(bits, numBits, k, _))
    keys.foreach(key => assert(BloomJoin.test(bits, numBits, k, key)))
    // ~2k keys in 64k bits at k=5 → FP rate well under 1%
    val probes = (1L to 20000L).map(_ * 104729L + 1L).filterNot(keys.contains)
    val fps = probes.count(BloomJoin.test(bits, numBits, k, _))
    assert(fps.toDouble / probes.size < 0.01, s"$fps false positives")
  }

  test("keyBloom aggregates across partitions into one consistent bitset") {
    val numBits = 1 << 12
    val df = (1L to 1000L).toDF("key").repartition(16)
    val bits = BloomJoin.keyBloom(df, "key", numBits, k = 4)
    assert(bits.length == numBits >> 6)
    (1L to 1000L).foreach(key => assert(BloomJoin.test(bits, numBits, 4, key)))
    val single = BloomJoin.keyBloom((1L to 1000L).toDF("key").coalesce(1),
      "key", numBits, k = 4)
    assert(bits.toSeq == single.toSeq, "bitset must be partition-independent")
  }

  test("prunedSemiJoin returns exactly the plain semi-join rows") {
    val probe = (1L to 5000L).map(i => (i, s"row$i")).toDF("pk", "payload")
    val build = (1L to 5000L).filter(_ % 17 == 0).toDF("bk")
    val pruned = BloomJoin.prunedSemiJoin(probe, build, "pk", "bk",
        numBits = 1 << 12, k = 4)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val plain = probe.join(build, $"pk" === $"bk", "left_semi")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(pruned == plain)
    assert(pruned.size == 5000 / 17)
  }

  test("probe filter compiles into the scan (codegen, no HOF fallback)") {
    val bits = BloomJoin.keyBloom((1L to 64L).toDF("key"), "key", 1 << 10, 3)
    // spark.range, not a local Seq: ConvertToLocalRelation would fold the
    // filter into a LocalTableScan and leave no plan to inspect
    val probe = spark.range(1, 129).select($"id".as("pk"))
      .filter(BloomJoin.mightContain($"pk", bits, 1 << 10, 3))
    val plan = probe.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage in simpleString form
    assert("\\*\\(\\d+\\) Filter bloom_might_contain".r.findFirstIn(plan).isDefined,
      s"bloom filter must sit inside a codegen stage:\n$plan")
  }

  test("prunedSemiJoin works when both sides share the key column name") {
    val probe = (1L to 500L).map(i => (i, i * 2)).toDF("k", "v")
    val build = (1L to 500L).filter(_ % 11 == 0).toDF("k")
    val got = BloomJoin.prunedSemiJoin(probe, build, "k", "k",
        numBits = 1 << 10, k = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == (1L to 500L).filter(_ % 11 == 0).map(i => (i, i * 2)))
  }

  test("empty build side: all-zero bitset prunes every probe row") {
    val probe = (1L to 100L).toDF("pk")
    val build = Seq.empty[Long].toDF("bk")
    val got = BloomJoin.prunedSemiJoin(probe, build, "pk", "bk",
      numBits = 1 << 8, k = 3)
    assert(got.count() == 0L)
  }

  test("invalid configuration rejected") {
    intercept[IllegalArgumentException](new BloomJoin.BloomAgg(100, 3)) // not /64
    intercept[IllegalArgumentException](new BloomJoin.BloomAgg(1 << 10, 0))
  }
}
