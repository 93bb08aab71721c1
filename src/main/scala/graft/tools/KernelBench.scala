package graft.tools

import graft.GraftSession
import graft.expr.VectorExprs
import org.apache.spark.sql.functions._

/** Microbench: the three ways to compute a dot product over
  * ArrayType(FloatType), at 1M rows × 64 dims —
  *   (a) graft's codegen Catalyst Expression (the engine's kernel),
  *   (b) built-in higher-order functions (aggregate ∘ zip_with),
  *   (c) a Scala UDF.
  * Quantifies the SURVEY §4.3 design choice. Appends nothing; prints a
  * markdown table (paste into BENCH notes).
  *
  *   sbt "runMain graft.tools.KernelBench"
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = GraftSession.local()
    import spark.implicits._

    val dim = 64
    val df = spark.range(n).select(
      col("id"),
      expr(s"transform(sequence(1, $dim), i -> cast(pmod(id * i, 97) / 97.0 as float))").as("a"),
      expr(s"transform(sequence(1, $dim), i -> cast(pmod(id + i, 89) / 89.0 as float))").as("b"))
      .persist()
    df.count() // materialize input once

    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0.0d, (acc, v) -> acc + v)")
    val udf_ = udf((a: Seq[Float], b: Seq[Float]) => {
      var acc = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    })

    def time(label: String)(c: org.apache.spark.sql.Column): Double = {
      df.select(sum(c)).head() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.select(sum(c)).head()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"| $label%-22s | $best%8.3f s | ${n / best / 1e6}%8.1f M rows/s |")
      best
    }

    println(s"Dot product over $n rows x $dim float dims (local, min of 3):")
    println("| kernel                 | time       | throughput      |")
    println("|------------------------|------------|-----------------|")
    val ce = time("codegen Expression")(VectorExprs.dot(col("a"), col("b")))
    val hf = time("HoF zip_with+aggregate")(hof)
    val ud = time("Scala UDF")(udf_(col("a"), col("b")))
    println(f"speedup vs HoF: ${hf / ce}%.1fx; vs UDF: ${ud / ce}%.1fx")
    spark.stop()
  }
}
