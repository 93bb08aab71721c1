package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType,
  TimestampNTZType, TimestampType}

/** Loaders for the driver-generated synthetic testdata (TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory. All reads go
  * through here so every query benefits from the same conventions: parquet
  * scans (columnar, predicate/projection pushdown via Catalyst), no caching
  * by default (callers opt in), no driver-side materialization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` normalized to session-TZ TimestampType regardless of how
    * the testdata generation wrote it — the encoding has drifted between
    * rounds, so all three observed forms are handled:
    *   - TIMESTAMP(NANOS): Spark reads only as a nanos-since-epoch long
    *     (spark.sql.legacy.parquet.nanosAsLong=true, set by GraftSession);
    *     integer-divided to micros, no float round-trip.
    *   - timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ: cast to
    *     TimestampType. The session TZ is UTC (GraftSession), so the wall
    *     values map to the same instants DuckDB's epoch_us sees.
    *   - timestamp[us] UTC-adjusted → already TimestampType: pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  /** Conditionally cast `cols` to the target types — identity (no extra
    * plan node, pushdown untouched) when the parquet already matches, a
    * single projection when a regeneration drifted the encoding. Same
    * armor idea as [[events]]: the testdata writer has changed physical
    * types between rounds, and a loader is the one place to absorb that. */
  private def normalize(df: DataFrame,
      cols: Map[String, org.apache.spark.sql.types.DataType]): DataFrame =
    cols.foldLeft(df) { case (acc, (name, want)) =>
      // catalogString ignores nullability — a required-element parquet
      // list<float> must not pick up a pointless no-op cast projection
      if (acc.schema.fieldNames.contains(name) &&
          acc.schema(name).dataType.catalogString != want.catalogString)
        acc.withColumn(name, col(name).cast(want))
      else acc
    }

  /** `documents` with integer id/length columns normalized to LongType —
    * an int32 regeneration would silently narrow every downstream output
    * type; the cast is a no-op on the canonical int64 encoding. */
  def documents(s: SparkSession, d: String): DataFrame =
    normalize(load(s, d, "documents"),
      Map("doc_id" -> LongType, "n_chars" -> LongType))

  /** `embeddings` with the vector normalized to array&lt;float&gt; (the type
    * every vector kernel requires — a list&lt;double&gt; regeneration would
    * fail resolution in 20+ queries, the r10 events failure mode) and
    * `vec_id` to LongType. No-op on the canonical encoding. */
  def embeddings(s: SparkSession, d: String): DataFrame =
    normalize(load(s, d, "embeddings"),
      Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true)))
}
