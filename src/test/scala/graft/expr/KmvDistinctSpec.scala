package graft.expr

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

import scala.util.Random

class KmvDistinctSpec extends SparkSpecBase {
  import spark.implicits._

  private def reference(keys: Seq[Long], k: Int): Long = {
    val P = DedupKernel.P
    val (a, b) = DedupKernel.perm(0)
    val hs = keys.map(key => (java.lang.Math.floorMod(key, P) * a + b) % P)
      .distinct.sorted
    if (hs.length < k) hs.length.toLong
    else (k - 1).toLong * P / hs(k - 1)
  }

  test("fewer than k distinct keys counts exactly") {
    val kmv = udaf(new KmvDistinct(64))
    val keys = Seq.fill(10)(Seq(1L, 2L, 3L, 4L, 5L)).flatten // dups everywhere
    val got = keys.toDF("key").agg(kmv($"key").as("d")).head().getLong(0)
    assert(got == 5L)
  }

  test("estimate matches the reference fold and is within 30% of truth") {
    val k = 64
    val kmv = udaf(new KmvDistinct(k))
    val rnd = new Random(7)
    val keys = Seq.fill(20000)(rnd.nextInt(5000).toLong + 1)
    val got = keys.toDF("key").agg(kmv($"key").as("d")).head().getLong(0)
    assert(got == reference(keys, k))
    val truth = keys.distinct.length
    assert(math.abs(got - truth).toDouble / truth < 0.30,
      s"estimate $got too far from truth $truth")
  }

  test("partition-count independent (merge associativity + commutativity)") {
    val k = 16
    val kmv = udaf(new KmvDistinct(k))
    val keys = (1L to 3000L) ++ (1L to 3000L)
    val results = Seq(1, 7, 32).map { parts =>
      keys.toDF("key").repartition(parts)
        .agg(kmv($"key").as("d")).head().getLong(0)
    }
    assert(results.distinct.size == 1, s"partition-dependent: $results")
    assert(results.head == reference(keys, k))
  }

  test("merge keeps only the k smallest distinct hashes") {
    val agg = new KmvDistinct(4)
    val x = KmvBuf(Array(1L, 5L, 9L))
    val y = KmvBuf(Array(1L, 3L, 9L, 11L))
    val m = agg.merge(x, y)
    assert(m.hs.toSeq == Seq(1L, 3L, 5L, 9L))
  }

  test("reduce is duplicate-insensitive and keeps buffer sorted") {
    val agg = new KmvDistinct(3)
    var buf = agg.zero
    Seq(42L, 7L, 42L, 99L, 7L, 1L, 100L).foreach { key =>
      buf = agg.reduce(buf, key)
      assert(buf.hs.toSeq == buf.hs.toSeq.sorted.distinct)
      assert(buf.hs.length <= 3)
    }
    // final state: the 3 smallest distinct hashes of {42,7,99,1,100}
    val P = DedupKernel.P
    val (a, b) = DedupKernel.perm(0)
    val expect = Seq(42L, 7L, 99L, 1L, 100L)
      .map(key => (java.lang.Math.floorMod(key, P) * a + b) % P)
      .distinct.sorted.take(3)
    assert(buf.hs.toSeq == expect)
  }
}
