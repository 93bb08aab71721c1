package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf-scale-up generator for the SCALE.md empirical probe (dev tool,
  * not library surface): synthesizes an sf≈1.0 dataset from the
  * driver's read-only sf0.1 tables by unioning `copies` key-shifted
  * replicas — the distributions (Zipf text, value ranges, join fan-out
  * per key) are preserved exactly while every entity-key cardinality
  * and every fact row count grows ×copies, which is what a plan-scaling
  * probe needs (it measures HOW COST GROWS, not new content).
  *
  * Key discipline: every surrogate key is offset by `copy · stride`
  * (stride = a power of 10 above the table's max key) so intra-copy
  * joins land exactly as in the source and copies never collide.
  * Dimension leaves (region/nation — fixed 5/25 rows by TPC-H
  * construction) are NOT replicated; foreign keys into them are left
  * unshifted, so each copy joins the same shared dims (fan-out per dim
  * key grows ×copies — precisely the 100 TB star-join shape).
  * Documents get a per-copy suffix token (so near-dup tiers see
  * NEAR-duplicates with realistic signature spread, not byte-identical
  * explosion) and embeddings a per-copy micro-offset on dim 0 (distinct
  * vectors, same geometry). Events keep their timestamps (denser hours
  * = the bounded-grid monitors' scale case) with user/event ids
  * shifted.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> [copies=10]
  */
object ScaleGen {

  private def stride(df: DataFrame, key: String): Long = {
    val mx = df.agg(max(col(key))).head().getLong(0)
    var s = 10L
    while (s <= mx) s *= 10L
    s
  }

  private def replicate(s: SparkSession, df: DataFrame, copies: Int)(
      shift: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until copies).map(c => shift(df, c)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleGen <srcSfDir> <outDir> [copies]")
    val (src, out) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // shared dims: fixed TPC-H leaves, not replicated
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    val cust = rd("customer"); val cs = stride(cust, "c_custkey")
    wr(replicate(spark, cust, copies) { (d, c) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(c * cs))
    }, "customer")

    val supp = rd("supplier"); val ss = stride(supp, "s_suppkey")
    wr(replicate(spark, supp, copies) { (d, c) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(c * ss))
    }, "supplier")

    val part = rd("part"); val ps = stride(part, "p_partkey")
    wr(replicate(spark, part, copies) { (d, c) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(c * ps))
    }, "part")

    val ord = rd("orders"); val os = stride(ord, "o_orderkey")
    wr(replicate(spark, ord, copies) { (d, c) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(c * os))
        .withColumn("o_custkey", col("o_custkey") + lit(c * cs))
    }, "orders")

    wr(replicate(spark, rd("lineitem"), copies) { (d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(c * os))
        .withColumn("l_partkey", col("l_partkey") + lit(c * ps))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * ss))
    }, "lineitem")

    val ev = rd("events")
    val es = stride(ev, "event_id"); val us = stride(ev, "user_id")
    wr(replicate(spark, ev, copies) { (d, c) =>
      d.withColumn("event_id", col("event_id") + lit(c * es))
        .withColumn("user_id", col("user_id") + lit(c * us))
    }, "events")

    val docs = rd("documents"); val ds = stride(docs, "doc_id")
    wr(replicate(spark, docs, copies) { (d, c) =>
      d.withColumn("doc_id", col("doc_id") + lit(c * ds))
        .withColumn("text",
          if (c == 0) col("text")
          else concat(col("text"), lit(s" copyvariant$c")))
        .withColumn("n_chars",
          if (c == 0) col("n_chars")
          else col("n_chars") + lit(s" copyvariant$c".length.toLong))
    }, "documents")

    val emb = rd("embeddings"); val vs = stride(emb, "vec_id")
    wr(replicate(spark, emb, copies) { (d, c) =>
      d.withColumn("vec_id", col("vec_id") + lit(c * vs))
        .withColumn("embedding",
          if (c == 0) col("embedding")
          else transform(col("embedding"), (x, i) =>
            when(i === 0, x + lit(c.toFloat * 1e-3f)).otherwise(x)))
    }, "embeddings")

    println(s"wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
