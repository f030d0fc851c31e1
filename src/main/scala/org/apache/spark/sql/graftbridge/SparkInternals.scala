package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Spark internals needed to expose custom
  * Catalyst expressions as user-facing Columns (Spark 4 moved the
  * Column↔Expression conversion behind `org.apache.spark.sql.classic`).
  * Lives in a subpackage of `org.apache.spark.sql` for access; keep tiny.
  */
object SparkInternals {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
