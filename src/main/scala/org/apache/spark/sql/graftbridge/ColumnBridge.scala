package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 moved `Column` to a backend-agnostic `ColumnNode` representation;
  * the classic-backend conversions live in `org.apache.spark.sql.classic`
  * with `private[sql]` visibility, so this one-file shim lives under the
  * `org.apache.spark.sql` package to expose them to graft's custom
  * expressions (same pattern used by open-source Spark extensions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
