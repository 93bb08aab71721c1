package graft.ops

import graft.SparkSpecBase
import graft.expr.MediaKernel
import org.apache.spark.sql.functions._

class PhashSpec extends SparkSpecBase {
  import spark.implicits._

  /** naive reference replay of the kernel */
  private def naiveHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes.isEmpty) return None
    val n = bytes.length
    val cells = bytes.indices.groupBy(i => (i.toLong * 64 / n).toInt)
    val total = bytes.map(b => (b & 0xff).toLong).sum
    var fp = 0L
    for (j <- 0 until 64; idx <- cells.get(j)) {
      val s = idx.map(i => (bytes(i) & 0xff).toLong).sum
      if (s * n > total * idx.size) fp |= (1L << j)
    }
    Some(fp)
  }

  test("kernel matches a naive reference on assorted payloads") {
    val cases = Seq(
      "a", "ab", "hello world", "x" * 64, "x" * 63 + "Z",
      ('a' to 'z').mkString * 10, "low" + "" * 100 + "HIGH" * 25)
    for (s <- cases) {
      val bytes = s.getBytes("UTF-8")
      assert(Option(MediaKernel.avgHash64(bytes)).map(_.longValue()) ==
        naiveHash(bytes), s"payload: ${s.take(20)}")
    }
  }

  test("empty and null payloads hash to null") {
    assert(MediaKernel.avgHash64(Array.emptyByteArray) == null)
    assert(MediaKernel.avgHash64(null) == null)
  }

  test("expression evaluates via codegen and interpreted paths identically") {
    val df = Seq((1L, "some payload bytes"), (2L, ""), (3L, "other bytes"))
      .toDF("id", "s").select($"id", $"s".cast("binary").as("p"))
    val got = df.select($"id", MediaKernel.avgHash64Col($"p").as("h"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) == Option(MediaKernel.avgHash64("some payload bytes".getBytes)).map(_.longValue()))
    assert(got(2L).isEmpty)
  }

  test("identical payloads pair at hamming 0; near payloads within 3; far ones excluded") {
    val base = ('a' to 'z').mkString * 8 // 208 bytes
    // perturb one region only → small hamming
    val near = base.updated(10, 'Z').updated(11, 'Z').toString
    val docs = Seq(
      (0L, base), (1L, base), (2L, near),
      (3L, "0" * 100 + "~" * 108) // different structure entirely
    ).toDF("doc_id", "s").select($"doc_id", $"s".cast("binary").as("payload"))
    val pairs = Multimodal.phashNearDup(docs, "doc_id", "payload")
      .orderBy($"a_id", $"b_id").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0L),
      s"identical pair missing: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"far payload must not pair: ${pairs.toSeq}")
    // all reported pairs obey the bound
    assert(pairs.forall(_._3 <= 3))
  }

  test("candidate generation is pigeonhole-complete at maxHamming 3") {
    // brute-force all pairs on a corpus with crafted near-dups and check
    // the banded path reports every pair with true hamming <= 3
    val texts = (0 until 30).map { i =>
      val s = ("abcdefgh" * 16).toCharArray
      s(i % s.length) = ('A' + (i % 26)).toChar
      (i.toLong, new String(s))
    }
    val docs = texts.toDF("doc_id", "s")
      .select($"doc_id", $"s".cast("binary").as("payload"))
    val hashes = texts.map { case (id, s) =>
      id -> MediaKernel.avgHash64(s.getBytes("UTF-8")).longValue() }.toMap
    val expected = (for {
      a <- texts.map(_._1); b <- texts.map(_._1) if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.phashNearDup(docs, "doc_id", "payload")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("random hashes produce essentially no band collisions (billion-image safety)") {
    // the point of the 3-of-6-block scheme: a RANDOM pair collides on
    // some band with p ≈ 20·2⁻³³, so spurious candidates stay ~0 even
    // for large N (the old 4×16-bit scheme expects ≈ 4·N²/2¹⁷ — for
    // this N=2000 corpus that is ~122 spurious pairs; here we demand 0)
    val rnd = new scala.util.Random(42)
    val hashes = (0 until 2000).map(i => (i.toLong, rnd.nextLong()))
      .toDF("doc_id", "phash")
    val banded = Multimodal.phashBands(hashes, "doc_id")
    val lhs = banded.select($"doc_id".as("a"), $"band", $"key")
    val rhs = banded.select($"doc_id".as("b"), $"band", $"key")
    val collisions = lhs.join(rhs, Seq("band", "key"))
      .filter($"a" < $"b").count()
    assert(collisions == 0L, s"expected no spurious band collisions, got $collisions")
  }

  test("band keys pack the three blocks injectively") {
    // hashes that differ ONLY inside one block must disagree on every
    // band containing that block and agree on every band excluding it
    val base = 0x0123456789abcdefL
    val tweaked = base ^ (7L << 44) // flip bits inside block 4 only
    val df = Seq((0L, base), (1L, tweaked)).toDF("doc_id", "phash")
    val bands = Multimodal.phashBands(df, "doc_id")
      .select($"doc_id", $"band", $"key")
      .as[(Long, Int, Long)].collect()
    val byBand = bands.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._3).toMap)
    val combos = (0 until 6).combinations(3).toSeq.zipWithIndex
    combos.foreach { case (c, idx) =>
      val agree = byBand(idx)(0L) == byBand(idx)(1L)
      assert(agree == !c.contains(4),
        s"band $idx (blocks $c): agreement should be ${!c.contains(4)}")
    }
  }

  test("invalid maxHamming rejected") {
    val docs = Seq((1L, "x")).toDF("doc_id", "s")
      .select($"doc_id", $"s".cast("binary").as("payload"))
    intercept[IllegalArgumentException](
      Multimodal.phashNearDup(docs, "doc_id", "payload", maxHamming = 4))
  }
}
