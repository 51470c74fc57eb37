package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for building Columns from custom Catalyst expressions:
  * `ExpressionUtils` is private[sql] in Spark 4, so the (two-line)
  * accessor lives in this package. No Spark internals are modified.
  */
object GraftColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
