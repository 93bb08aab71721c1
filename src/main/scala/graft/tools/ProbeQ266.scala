package graft.tools

import graft.GraftSession

/** Dev probe: q266 output cardinality at two scale dirs (SCALE.md). */
object ProbeQ266 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.cosineTfJoin(
        graft.Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.8d, w = 3).count()
      println(f"$dir: output rows = $n, sec = ${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
