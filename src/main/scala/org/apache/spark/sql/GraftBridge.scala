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
  /** Re-export of the `private[sql]` AbstractDataType so graft expressions
    * can declare `inputTypes` (ExpectsInputTypes) outside the sql package. */
  type AbstractDT = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a native expression as a SQL function on a live session (the
    * imperative twin of wiring [[graft.functions.GraftExtensions]] into
    * `spark.sql.extensions` at session build time). */
  def registerFunction(
      spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
