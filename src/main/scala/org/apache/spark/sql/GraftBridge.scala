package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 made Column a
  * connect-compatible wrapper around ColumnNode; constructing a Column from
  * a custom Catalyst Expression — the documented extension path for native
  * expressions — now goes through this internal utility. This is the
  * standard shim every Spark-extension library ships: one file inside the
  * org.apache.spark.sql package, nothing else reaches into internals.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
