package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical operator Spark's DataFrame
  * API lacks (pandas-on-Spark has merge_asof; Scala does not). For each
  * left row, attach the right row with the greatest right-time ≤ left-time
  * within the same key.
  *
  * Implementation follows preference (a) of the custom-operator ladder
  * (compose built-ins — SURVEY.md §4.3): tag both sides, union, and take
  * `last(payload, ignoreNulls)` over a (key, time, side) window. One
  * shuffle + one in-partition sort, no range-condition join explosion —
  * the plan a time-series engine would hand-build, expressed in Catalyst
  * operators so AQE/skew handling still apply. Right side must be unique
  * per (key, time) — pre-aggregate if it is not (ties would be arbitrary).
  */
object AsOfJoin {

  /** @param left       left (probe) rows, keeps all its columns
    * @param right      right (reference) rows, unique per (key, rightTime)
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   left timestamp column name
    * @param rightTime  right timestamp column name
    * @param rightCols  right columns to attach (null when no match);
    *                    names must not collide with left column names —
    *                    alias on the right side first if they do
    * @param forward    false (default): greatest right-time ≤ left-time
    *                    (backward as-of); true: SMALLEST right-time ≥
    *                    left-time (forward as-of — "next quote after")
    * @param strict     true drops the equality: simultaneous right rows
    *                    are not visible (< instead of ≤, > instead of ≥)
    */
  def asOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      forward: Boolean = false, strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val payload = struct(rightCols.map(right(_)): _*)
    val payloadType = StructType(rightCols.map(c => right.schema(c)))
    val leftRowType = StructType(left.schema.fields)
    val leftStruct = struct(left.columns.map(left(_)): _*)
    // Visibility at equal times is encoded purely in the sort order: a
    // right row is visible to a left row iff it sorts before it inside
    // the frame — right-before-left at ties = inclusive, left-before-right
    // = strict. Direction flips the time order (the frame is always
    // "everything sorted earlier"), so all four variants are the same
    // one-shuffle union+window plan.
    val rightSide = if (strict) 1 else 0
    val taggedRight = right.select(
      right(key).as("_k"), right(rightTime).as("_t"),
      lit(rightSide).as("_side"),
      lit(null).cast(leftRowType).as("_lrow"),
      payload.as("_p"))
    val taggedLeft = left.select(
      left(key).as("_k"), left(leftTime).as("_t"),
      lit(1 - rightSide).as("_side"),
      leftStruct.as("_lrow"),
      lit(null).cast(payloadType).as("_p"))
    val timeOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(col("_k")).orderBy(timeOrder, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols =
      left.columns.map(c => col(s"_lrow.$c").as(c)) ++
        rightCols.map(c => col(s"_asof.$c").as(c))
    taggedRight.unionByName(taggedLeft)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === lit(1 - rightSide))
      .select(matchedCols: _*)
  }
}
