package graft.expr

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SpectralMomentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def moments(df: org.apache.spark.sql.DataFrame, dims: Int) =
    df.agg(SpectralMoments.of(col("vm"), dims).as("m"))
      .select(col("m.n"), col("m.sx"), col("m.sxy"))
      .head()

  test("moments match a hand-computed reference") {
    val df = Seq(
      Seq(1L, 2L, 3L),
      Seq(-4L, 5L, 0L),
      Seq(7L, -1L, 2L)).toDF("vm")
    val r = moments(df, 3)
    assert(r.getLong(0) == 3L)
    assert(r.getSeq[String](1) == Seq("4", "6", "5"))
    // triangle (0,0)(0,1)(0,2)(1,1)(1,2)(2,2):
    //   1+16+49, 2-20-7, 3+0+14, 4+25+1, 6+0-2, 9+0+4
    assert(r.getSeq[String](2) == Seq("66", "-25", "17", "30", "4", "13"))
  }

  test("128-bit accumulation is exact across the 2^63 boundary") {
    // 3e9 · 3e9 = 9e18 ≈ Long.MaxValue — a handful of rows overflows
    // any 64-bit sum; the result must still be exact
    val rows = 32
    val v = 3000000000L
    val df = (1 to rows).map(_ => Seq(v)).toDF("vm")
    val r = moments(df, 1)
    assert(r.getLong(0) == rows.toLong)
    assert(BigInt(r.getSeq[String](1).head) == BigInt(v) * rows)
    assert(BigInt(r.getSeq[String](2).head) == BigInt(v) * BigInt(v) * rows,
      s"got ${r.getSeq[String](2).head}")
    // …and the negative direction
    val dfn = (1 to rows).map(_ => Seq(-v)).toDF("vm")
    val rn = moments(dfn, 1)
    assert(BigInt(rn.getSeq[String](1).head) == -BigInt(v) * rows)
    assert(BigInt(rn.getSeq[String](2).head) == BigInt(v) * BigInt(v) * rows)
  }

  test("partition-invariant: merge order never changes the sums") {
    val data = (1 to 97).map(i => Seq((i * 37 % 11 - 5).toLong, (i % 7).toLong))
    val a = moments(data.toDF("vm"), 2)
    val b = moments(data.toDF("vm").repartition(13), 2)
    assert(a.toSeq == b.toSeq)
  }

  test("non-bigint vector columns fail at analysis, not as silent garbage") {
    val floats = Seq(Seq(1.5f, 2.5f)).toDF("vm")
    val e = intercept[org.apache.spark.sql.AnalysisException](
      moments(floats, 2))
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
    intercept[IllegalArgumentException](
      SpectralMoments.of(col("vm"), 2048)) // buffer-memory ceiling
  }

  test("typed failures: null vector, wrong length, out-of-range component") {
    def err(df: org.apache.spark.sql.DataFrame, dims: Int): String =
      intercept[org.apache.spark.SparkException] {
        moments(df, dims)
      }.getMessage

    val nullVec = Seq(Some(Seq(1L, 2L)), None).toDF("vm")
    assert(err(nullVec, 2).contains("NULL vector"))

    val shortVec = Seq(Seq(1L, 2L), Seq(3L)).toDF("vm")
    assert(err(shortVec, 2).contains("!= dims"))

    val bigVec = Seq(Seq(4000000000L)).toDF("vm")
    assert(err(bigVec, 1).contains("micro-units"))
  }
}
