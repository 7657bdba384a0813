package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters — the
  * minimal compilation-unit-in-their-package pattern for registering custom
  * Catalyst expressions from an external library (Spark 4 Columns wrap
  * ColumnNodes, not Expressions, so no public constructor exists). */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The exact DIVIDE_BY_ZERO error `Divide` raises under ANSI
    * (`QueryExecutionErrors` is private[sql]). */
  def divideByZeroError(): ArithmeticException =
    errors.QueryExecutionErrors.divideByZeroError(null)
}
