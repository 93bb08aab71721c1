package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SpectralSpec extends SparkSpecBase {
  import spark.implicits._

  // vectors spread along the direction (3, 1, 0, 0): the top component
  // must load on dims 0 and 1 with ~3:1 ratio and soak up ~all variance
  private def anisotropic(dims: Int = 8) =
    (-10 to 10).map { t =>
      val v = Array.fill(dims)(0f)
      v(0) = 3f * t; v(1) = 1f * t
      (t.toLong, v)
    }.toDF("vec_id", "embedding")

  test("topComponent finds the dominant direction and its variance share") {
    val got = Spectral.topComponent(anisotropic(), "embedding", dims = 8)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2).take(2) == Seq(0L, 1L),
      s"dims 0 and 1 must dominate: $got")
    val l0 = got.find(_._2 == 0L).get._3
    val l1 = got.find(_._2 == 1L).get._3
    assert(math.abs(l0 / l1 - 3.0) < 0.01,
      s"loading ratio must be ~3:1, got $l0 / $l1")
    assert(got.head._4 > 0.999,
      s"a rank-1 cloud must have ev_share ~ 1: ${got.head._4}")
    // zero-variance dims carry ~0 loading
    assert(got.filter(r => r._2 >= 2).forall(r => math.abs(r._3) < 1e-3), s"$got")
  }

  test("topComponent is partition-invariant (integer-exact end to end)") {
    val a = Spectral.topComponent(anisotropic(), "embedding", 8)
      .collect().toSeq
    val b = Spectral.topComponent(anisotropic().repartition(7), "embedding", 8)
      .collect().toSeq
    assert(a == b)
  }

  test("degenerate inputs fail with typed errors, never NaN arithmetic") {
    // constant embeddings → zero covariance → no principal direction
    val flat = (1 to 5).map(i => (i.toLong, Array.fill(4)(2.5f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Spectral.topComponent(flat, "embedding", dims = 4, k = 4))
    assert(e.getMessage.contains("identically zero"), e.getMessage)
  }

  test("topComponents: deflation recovers the second orthogonal direction") {
    // two independent axes with variances 25:4 — component 1 must load
    // on dim 0, component 2 (after deflation) on dim 1, shares ordered
    val grid = for { t <- -5 to 5; s <- -5 to 5 } yield {
      val v = Array.fill(6)(0f)
      v(0) = 5f * t; v(1) = 2f * s
      ((t * 11 + s).toLong, v)
    }
    val df = grid.toDF("vec_id", "embedding")
    val got = Spectral.topComponents(df, "embedding", dims = 6, m = 2, k = 2)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.size == 4)
    val c1 = got.filter(_._1 == 1L)
    val c2 = got.filter(_._1 == 2L)
    assert(c1.head._3 == 0L, s"comp 1 must load on dim 0: $got")
    assert(c2.head._3 == 1L, s"comp 2 must load on dim 1 after deflation: $got")
    val (s1, s2) = (c1.head._5, c2.head._5)
    assert(s1 > s2 && s2 > 0.0, s"shares must rank 25:4 variance: $s1 vs $s2")
    assert(math.abs(s1 - 25.0 / 29.0) < 0.01 && math.abs(s2 - 4.0 / 29.0) < 0.01,
      s"shares must split the trace ~25/29 and ~4/29: $s1, $s2")
    // m = 1 slice reproduces topComponent exactly (the q166 contract)
    val one = Spectral.topComponent(df, "embedding", dims = 6, k = 2)
      .collect().toSeq
    val viaM = Spectral.topComponents(df, "embedding", dims = 6, m = 1, k = 2)
      .drop("comp").collect().toSeq
    assert(one == viaM)
  }

  test("pcaProjection: most-aligned rows, exact tie-breaks, unit r2 on-axis") {
    val grid = for { t <- -5 to 5; s <- -5 to 5 } yield {
      val v = Array.fill(6)(0f)
      v(0) = 5f * t; v(1) = 2f * s
      ((t * 11 + s).toLong, v)
    }
    val df = grid.toDF("vec_id", "embedding")
    val got = Spectral.pcaProjection(df, "vec_id", "embedding",
        dims = 6, m = 2, topN = 12)
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.size == 12)
    // the 11 t=5 rows (ids 50..60) carry the maximal dim-0 projection —
    // they must all rank ahead of every t<5 row (their relative order
    // depends on the eigenvector's sub-micro noise on other dims, which
    // is deterministic but not meaningfully ordered)
    assert(got.take(11).map(_._1).toSet == (50L to 60L).toSet,
      s"t=5 rows must fill the top 11: ${got.map(_._1)}")
    // the on-axis row (t=5, s=0 → id 55) aligns perfectly with comp 1
    val onAxis = got.find(_._1 == 55L).get
    assert(math.abs(onAxis._3 - 1.0) < 1e-6, s"r2_1 must be 1 on-axis: $onAxis")
    assert(math.abs(onAxis._5) < 1e-6, s"r2_2 must be 0 on-axis: $onAxis")
    // partition invariance: exact integers end to end
    val b = Spectral.pcaProjection(df.repartition(7), "vec_id", "embedding",
        dims = 6, m = 2, topN = 12)
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    assert(got == b)
  }

  test("topComponents: rank-exhausted residual raises a typed error") {
    // exactly one nonzero direction → deflation cancels the lone cell
    // EXACTLY on the integer grid; component 2 has nothing left
    val df = (-6 to 6).map { t =>
      val v = Array.fill(4)(0f); v(0) = 4f * t
      (t.toLong, v)
    }.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Spectral.topComponents(df, "embedding", dims = 4, m = 2, k = 2))
    assert(e.getMessage.contains("exhausted"), e.getMessage)
  }

  test("topComponent rejects bad configs") {
    val df = anisotropic()
    intercept[IllegalArgumentException](
      Spectral.topComponent(df, "embedding", dims = 1))
    intercept[IllegalArgumentException](
      Spectral.topComponent(df, "embedding", dims = 8, iters = 17))
    intercept[IllegalArgumentException](
      Spectral.topComponent(df, "embedding", dims = 8, k = 9))
  }

  test("isotropy: orthogonal cross reports -1/(n-1), clones report 1") {
    // 4 unit vectors at the axes: sum cancels -> mean pairwise
    // cosine = (0 - n)/(n(n-1)) = -1/3
    val cross = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(-1f, 0f)), (4L, Array(0f, -1f)))
      .toDF("vec_id", "embedding")
    val got = Spectral.isotropy(cross, "embedding")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((4L, 2L, 1.0d, -0.333333d)), got.toString)
    // three clones of (2,0): every pair has cosine exactly 1
    val clones = Seq((1L, Array(2f, 0f)), (2L, Array(2f, 0f)),
      (3L, Array(2f, 0f))).toDF("vec_id", "embedding")
    val c = Spectral.isotropy(clones, "embedding")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(c == Seq((3L, 2L, 1.0d, 1.0d)), c.toString)
  }

  test("isotropy: typed guards — zero vector, NULL, n < 2") {
    intercept[IllegalArgumentException](Spectral.isotropy(
      Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)))
        .toDF("vec_id", "embedding"), "embedding"))
    intercept[IllegalArgumentException](Spectral.isotropy(
      Seq((1L, Option.empty[Array[Float]]), (2L, Some(Array(1f, 0f))))
        .toDF("vec_id", "embedding"), "embedding"))
    intercept[IllegalArgumentException](Spectral.isotropy(
      Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding"), "embedding"))
  }

  test("crossGroupCosine: diagonal == isotropyByGroup, opposed groups -1") {
    // group "e" along +x, group "w" along -x: between-cos exactly -1;
    // diagonals are the clone value 1.000001 (quantization overshoot
    // is absent here: unit axis vectors are exact on the micro grid)
    val df = Seq(
      ("e", Array(1f, 0f)), ("e", Array(2f, 0f)),
      ("w", Array(-1f, 0f)), ("w", Array(-3f, 0f)),
      ("solo", Array(0f, 1f)))
      .toDF("label", "embedding")
    val got = Spectral.crossGroupCosine(df, "label", "embedding")
      .as[(String, String, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("e", "e", 2L, 2L, Some(1.0d)),
      ("e", "solo", 2L, 1L, Some(0.0d)),
      ("e", "w", 2L, 2L, Some(-1.0d)),
      ("solo", "solo", 1L, 1L, None),
      ("solo", "w", 1L, 2L, Some(0.0d)),
      ("w", "w", 2L, 2L, Some(1.0d))), got.toString)
    intercept[IllegalArgumentException](Spectral.crossGroupCosine(
      Seq(("a", Array(1f, 0f)), ("a", Array(1f, 0f, 0f)))
        .toDF("label", "embedding"), "label", "embedding"))
  }

  test("isotropyByGroup: per-group cross vs clones, single-vector NULL") {
    val df = Seq(
      ("cross", Array(1f, 0f)), ("cross", Array(0f, 1f)),
      ("cross", Array(-1f, 0f)), ("cross", Array(0f, -1f)),
      ("clone", Array(2f, 0f)), ("clone", Array(2f, 0f)),
      ("solo", Array(0f, 3f)))
      .toDF("label", "embedding")
    val got = Spectral.isotropyByGroup(df, "label", "embedding")
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("clone", 2L, 2L, 1.0d, Some(1.0d)),
      ("cross", 4L, 2L, 1.0d, Some(-0.333333d)),
      ("solo", 1L, 2L, 1.0d, None)), got.toString)
    intercept[IllegalArgumentException](Spectral.isotropyByGroup(
      Seq(("a", Array(1f, 0f)), ("a", Array(1f, 0f, 0f)))
        .toDF("label", "embedding"), "label", "embedding")) // ragged
    intercept[IllegalArgumentException](Spectral.isotropyByGroup(
      Seq(("a", Array(0f, 0f))).toDF("label", "embedding"),
      "label", "embedding"))
  }
}
