package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` classic Column↔Expression converters —
  * Spark 4.x Columns wrap ColumnNodes, and the supported conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils` (sql-visibility only).
  * This is the one place the engine reaches across Spark's package
  * boundary, used solely to expose custom Catalyst expressions as Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
