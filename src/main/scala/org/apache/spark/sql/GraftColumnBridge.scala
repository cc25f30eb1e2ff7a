package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved `Column` onto ColumnNode and made the Expression↔Column
  * converters `private[sql]`. This is the minimal interop shim a library
  * needs to expose custom Catalyst expressions as user-facing `Column`s —
  * the same role `Column(expr)` played in Spark 3.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
