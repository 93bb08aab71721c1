package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: print the formatted physical plan and timed runs of one query.
  *   sbt "runMain graft.tools.Explain q30_dedup_exact /root/testdata/sf0.1 3"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local()
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"RUN$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
