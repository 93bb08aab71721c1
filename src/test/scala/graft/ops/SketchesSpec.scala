package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private def code = Dedup.polyHashCol("token", 31L)

  test("CountMin never under-counts; exact on a sparse corpus") {
    val toks = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = toks.toDF("token")
    val sketch = CountMin.build(df, code, d = 4, w = 1024)
    val exact = df.groupBy($"token").agg(count(lit(1)).as("exact"))
    val got = CountMin.estimate(exact, code, sketch, d = 4, w = 1024)
      .select($"token", $"exact", $"cms_est")
      .as[(String, Long, Long)].collect()
      .map { case (t, e, c) => t -> ((e, c)) }.toMap
    got.foreach { case (t, (e, c)) =>
      assert(c >= e, s"CMS under-counted $t: est $c < exact $e")
    }
    // 3 distinct tokens in 4×1024 cells: no collisions — est exact
    assert(got("alpha") == ((7L, 7L)) && got("beta") == ((3L, 3L)) &&
      got("gamma") == ((1L, 1L)), got.toString)
  }

  test("CountMin merges: sketch(a ∪ b) = cellwise sum of the two sketches") {
    val a = Seq("x", "x", "y").toDF("token")
    val b = Seq("y", "z", "z", "z").toDF("token")
    val merged = CountMin.build(a, code).unionByName(CountMin.build(b, code))
      .groupBy($"j", $"bucket").agg(sum($"cnt").as("cnt"))
    val direct = CountMin.build(a.unionByName(b), code)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val d2 = direct.as[(Int, Long, Long)].collect().toSet
    assert(m == d2, s"merged $m != direct $d2")
  }

  test("CountMin overshoot under forced collisions stays an UPPER bound") {
    // w = 2: every token collides somewhere — estimates must still
    // dominate the exact counts
    val df = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(s"tok$i"))
      .toDF("token")
    val sk = CountMin.build(df, code, d = 3, w = 2)
    val exact = df.groupBy($"token").agg(count(lit(1)).as("exact"))
    val bad = CountMin.estimate(exact, code, sk, d = 3, w = 2)
      .filter($"cms_est" < $"exact").count()
    assert(bad == 0L)
  }

  test("CountMin typed guards") {
    val df = Seq("x").toDF("token")
    intercept[IllegalArgumentException](CountMin.build(df, code, d = 0))
    intercept[IllegalArgumentException](CountMin.build(df, code, w = 1))
  }
}
