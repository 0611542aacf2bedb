package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge from a Catalyst [[Expression]] to a user-facing
  * [[Column]]. Spark 4 made `Column` a Connect-compatible node wrapper
  * and scoped the Expression constructor `private[sql]`, so extension
  * libraries reach it from an `org.apache.spark.sql` subpackage — the
  * standard pattern for open-source Catalyst extensions. This is the
  * only file outside the `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
