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

  test("topComponent rejects bad configs") {
    val df = anisotropic()
    intercept[IllegalArgumentException](
      Spectral.topComponent(df, "embedding", dims = 1))
    intercept[IllegalArgumentException](
      Spectral.topComponent(df, "embedding", dims = 8, iters = 17))
    intercept[IllegalArgumentException](
      Spectral.topComponent(df, "embedding", dims = 8, k = 9))
  }
}
