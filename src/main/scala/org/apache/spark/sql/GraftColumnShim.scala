package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` bridge for wrapping a custom Catalyst
  * Expression in a user-facing Column (and back) without the function
  * registry — the standard technique of Spark extension libraries.
  * Kept to exactly these two calls.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
