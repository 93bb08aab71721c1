package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source readers (SURVEY.md §2.3 "Scans/sources").
  *
  * The reference's only external source is a header-aware CSV read in its
  * examples/tests (csv crate; examples/cosine_query_example.rs:17-39,
  * embeddings.rs:592-614) that derives metadata columns from the review
  * fields. Here that becomes `spark.read.csv` + column expressions, plus
  * the generic typed loaders a Spark engine gets for free.
  */
object Sources {

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The reference's car-review CSV projection (embeddings.rs:592-618):
    * document = review, Year = first-5-chars of vehicle_title as u64,
    * Rating = rating as u64, id = "id{rowNumber}"; metadata kept both as
    * typed columns (pushdown path) and as the reference's array-of-JSON
    * strings (fidelity path). */
  def carReviews(spark: SparkSession, path: String): DataFrame = {
    // id = "id{n}" with n from row_number() over a stable ordering of the
    // CSV columns — deterministic across runs and partitionings, unlike
    // monotonically_increasing_id() (which encodes the partition layout).
    // The single-partition window is fine here: the reference's dataset is
    // a 141-line CSV (BASELINE.md); for big sources use a content hash id.
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("review"), col("vehicle_title"), col("rating"))
    csv(spark, path)
      .withColumn("id",
        concat(lit("id"), (row_number().over(w) - 1).cast("string")))
      .select(
        col("id"),
        col("review").as("document"),
        trim(substring(col("vehicle_title"), 1, 5)).cast("long").as("Year"),
        col("rating").cast("long").as("Rating"))
      .withColumn("metadata", array(
        concat(lit("""{"Year": """), col("Year"), lit("}")),
        concat(lit("""{"Rating": """), col("Rating"), lit("}"))))
  }
}
