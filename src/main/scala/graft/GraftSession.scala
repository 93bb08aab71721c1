package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's standard configuration: UTC, AQE on,
  * shuffle partitions sized to local cores (not 200), nanos-as-long so the
  * driver's TIMESTAMP(NANOS) events parquet is readable, and broadcast
  * threshold left at default (dimension tables are hinted explicitly).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
