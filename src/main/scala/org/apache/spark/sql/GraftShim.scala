package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 moved the Expression-backed Column constructor behind
  * `private[sql] org.apache.spark.sql.classic.ExpressionUtils`; custom
  * scalar expressions (graft.functions.expressions) still need to cross
  * that boundary, so this one-file shim lives in the sql package.
  */
object GraftShim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
