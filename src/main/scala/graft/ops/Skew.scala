package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations (SCALE.md): when one key
  * carries a disproportionate share of rows (a viral user_id, an empty-
  * string document), hash-partitioning sends it all to one task. AQE's
  * skew-join split handles sort-merge cases at runtime; salting is the
  * deterministic, plan-level fix that also covers aggregations.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random-but-
    * deterministic salt in [0, salts); the small side is replicated once
    * per salt value via explode. The join key becomes (key, salt), so a
    * hot key spreads over `salts` tasks. Row-level results are identical
    * to the unsalted join.
    *
    * Determinism: salt = hash of the large side's full row id expression,
    * not rand() — reruns and retries produce the same partitioning.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    val saltedLarge = large.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Use for
    * algebraic aggregates (sum/count/min/max). */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String, salts: Int,
      saltBy: Column): DataFrame =
    df.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n"))
}
