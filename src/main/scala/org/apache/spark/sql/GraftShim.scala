package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package shim: bridges Column ↔ Expression for graft's native
  * expressions (the Spark 4 helpers live behind private[sql]). */
object GraftShim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
