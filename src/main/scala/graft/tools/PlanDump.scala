package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dev tool (r16 optimization evidence): write the `explain("formatted")`
  * output of each named query to `plans/r16/<name>_<suffix>.txt`.
  *   sbt "runMain graft.tools.PlanDump before /root/testdata/sf0.1 q280_hubness ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val sfDir = args(1)
    val names = args.drop(2)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local()
    Files.createDirectories(Paths.get("plans/r16"))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(s"plans/r16/${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/r16/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
