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
      // ObjectHashAggregate (TopKBy bounded heaps, collect_list) falls
      // back to SORT-based aggregation after 128 distinct groups by
      // default — a top-k-per-query aggregate over >128 query groups
      // would silently sort the whole product it exists to avoid. Every
      // object-aggregate state in this repo is bounded (k-heaps,
      // config-capped lists), so a 64 Ki hash map is still model-sized;
      // scale-safe because the cap is per-task GROUP COUNT, not bytes.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      // r17 session hygiene: ephemeral localCheckpoint blocks are only
      // released when the DRIVER garbage-collects the abandoned RDD
      // objects (ContextCleaner is GC-driven), and the default periodic
      // System.gc() runs every 30 MIN — a long query suite (or any
      // long-lived session) accumulates thousands of dead pinned
      // partitions before the first sweep, degrading late queries under
      // storage-memory pressure. 5 min bounds that accumulation at a
      // few driver GCs per hour; measured flat on the bench total.
      .config("spark.cleaner.periodicGC.interval", sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "5min"))
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
