package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: run a declared query and print operator counts from the
  * final (post-AQE) executed plan — scans, exchanges, reuse, joins —
  * the quick "how many times does this recompute the corpus" readout
  * used when auditing plan shapes.
  * Run: sbt "runMain graft.tools.PlanStats <sfDir> <query> [query...]"
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      def n(s: String) = s.r.findAllIn(p).size
      println(s"== $name")
      println(s"  scans=${n("Scan parquet")} exch=${n("Exchange hashpartitioning")}" +
        s" reusedExch=${n("ReusedExchange")} bcastJoin=${n("BroadcastHashJoin")}" +
        s" smj=${n("SortMergeJoin")} shj=${n("ShuffledHashJoin")}" +
        s" agg=${n("HashAggregate")} cache=${n("InMemoryTableScan")}")
    }
    spark.stop()
  }
}
