package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HistogramQuantileSpec extends SparkSpecBase {
  import spark.implicits._

  test("uniform data: estimates land within one bucket width of exact") {
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = HistogramQuantile.quantiles(df, "g", "v", Seq(0.5, 0.9, 0.99),
        bins = 100)
      .select("p", "est").as[(Double, Double)].collect().toMap
    val width = (10000.0 - 1.0) / 100
    assert(math.abs(got(0.5) - 5000.0) <= width, s"p50=${got(0.5)}")
    assert(math.abs(got(0.9) - 9000.0) <= width, s"p90=${got(0.9)}")
    assert(math.abs(got(0.99) - 9900.0) <= width, s"p99=${got(0.99)}")
  }

  test("hand-checked tiny histogram") {
    // 4 values in [0, 3], 3 bins: bins are [0,1),[1,2),[2,3]; counts 1,1,2
    val df = Seq(("g", 0.0), ("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("g", "v")
    val got = HistogramQuantile.quantiles(df, "g", "v", Seq(0.5), bins = 3)
      .select("est", "n").as[(Double, Long)].head()
    // needed = ceil(0.5*4) = 2 -> second value; bin 1 (count 1, cumBefore 1)
    // est = 0 + 1 * (1 + (2-1)/1) = 2.0
    assert(got == ((2.0, 4L)))
  }

  test("degenerate group (all equal) returns the value; multi-group works") {
    val df = Seq(("a", 7.0), ("a", 7.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val got = HistogramQuantile.quantiles(df, "g", "v", Seq(0.5, 0.99), bins = 8)
      .select("g", "p", "est").as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 0.5)) == 7.0 && got(("a", 0.99)) == 7.0)
    assert(got(("b", 0.99)) == 2.0)
  }

  test("partition-layout independent and null-safe") {
    val rows = (1 to 5000).map(i => ("g", if (i % 100 == 0) null
      else java.lang.Double.valueOf((i % 37).toDouble))) :+ (("g", null))
    val df = rows.toDF("g", "v")
    def run(parts: Int) = HistogramQuantile.quantiles(
        df.repartition(parts), "g", "v", Seq(0.5, 0.9), bins = 16)
      .select("p", "est", "n").as[(Double, Double, Long)].collect().toSet
    val a = run(1)
    assert(a == run(13))
    assert(a.forall(_._3 == 4950L), "null values must be excluded from n")
  }

  test("invalid parameters rejected") {
    val df = Seq(("g", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException](
      HistogramQuantile.quantiles(df, "g", "v", Seq(0.5), bins = 1))
    intercept[IllegalArgumentException](
      HistogramQuantile.quantiles(df, "g", "v", Seq(1.5)))
    intercept[IllegalArgumentException](
      HistogramQuantile.quantiles(df, "g", "v", Nil))
  }
}
