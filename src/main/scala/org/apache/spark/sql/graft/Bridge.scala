package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge.
  *
  * Spark 4.x made `Column` a ColumnNode wrapper and marked the
  * conversion helpers (`classic.ExpressionUtils`) `private[sql]` — the
  * 3.x idiom `new Column(expr)` no longer exists. Every library that
  * ships custom Catalyst expressions needs exactly these two calls, so
  * this one object lives under `org.apache.spark.sql` for package-level
  * access; all graft code goes through it (see
  * [[graft.functions.VecFns]]), nothing else reaches into Spark
  * internals.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
