package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression conversions —
  * the supported pattern for libraries that ship custom Catalyst
  * expressions without a SparkSessionExtensions round-trip. Lives in the
  * `org.apache.spark.sql` package purely for access; no Spark internals
  * are modified. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
