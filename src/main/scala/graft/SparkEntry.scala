package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2's inventory;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for the driver's
  * correctness gate. Column names are aliased identically on both sides.
  *
  * Float determinism convention: any aggregate over double columns goes
  * through exact DECIMAL arithmetic and is cast back to DOUBLE at the end,
  * so Spark and DuckDB produce bit-identical results (testdata values have
  * <= 4 decimal digits, see FIXTURES.md). Ratios are computed in double
  * from exact components (IEEE-deterministic in both engines).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The valentinus-style pipeline: metadata-filtered cosine top-k over the
    * documents corpus with its precomputed embeddings (SURVEY.md §2.1 #5).
    */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.metaFilterCosine(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VectorQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. All sketch/index arithmetic (MinHash,
    * SimHash, SRP-LSH, the KMV distinct sketch, even IVF k-means
    * training) is portable polynomial/integer math, so EVERY query
    * carries an exact oracle — q49 included since it moved from HLL
    * (engine-private registers) to the replayable KMV sketch
    * ([[graft.expr.KmvDistinct]]). */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ VectorQueries.oracleSql ++ PipelineQueries.oracleSql
}
