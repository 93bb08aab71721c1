package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink writers (SURVEY.md §2.3 "Sinks") — the LMDB chunked-blob layer of
  * the reference (database.rs:169-194) replaced by Parquet layouts chosen
  * for 100 TB reads:
  *
  *  - [[partitionedParquet]]: hive-partitioned by low-cardinality columns
  *    → partition pruning eliminates whole directories at scan time;
  *  - [[bucketedTable]]: bucketed + sorted by join key → co-located
  *    (shuffle-free) joins and aggregations between tables bucketed the
  *    same way. Bucketing is the Spark answer to "pre-partition the 100 TB
  *    fact table once, join it many times".
  */
object Sinks {

  def parquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed table (requires a warehouse-enabled session).
    * Joins between two tables bucketed by the same key and count plan
    * without an Exchange on either side. */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
