package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Catalyst-Expression bridge for graft's session-free native
  * expressions. Spark 4 moved `Column` onto ColumnNode and made the
  * classic converters (`org.apache.spark.sql.classic.ExpressionUtils`)
  * `private[sql]`, so a library can no longer wrap one of its own
  * Catalyst expressions in a Column without either a SparkSession
  * function-registry registration (which couples a pure Column helper to
  * the thread's active session — wrong in a multi-session JVM) or this
  * one-file bridge living in the sql package. Thin by design: two
  * delegating calls, no logic. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
