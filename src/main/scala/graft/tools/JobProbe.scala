package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool (r16): run one query N times and print every Spark job's
  * wall-clock duration + call site, so per-query time decomposes into
  * its constituent jobs (driver-side gaps show up as the difference).
  *   sbt "runMain graft.tools.JobProbe q168_lm_index_score /root/testdata/sf0.1 2"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(),
          Option(e.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(e.jobId, (0L, "?"))
        println(f"[job ${e.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
      }
    })
    val fn = SparkEntry.queries(name)
    for (i <- 0 to reps) { // rep 0 = warm-up
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val n = df.count()
      println(f"=== RUN$i: total ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"(build $tBuild%.3f s, $n rows)")
    }
    spark.stop()
  }
}
