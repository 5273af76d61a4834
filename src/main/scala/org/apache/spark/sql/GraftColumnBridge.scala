package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters for
  * the graft custom expressions (`graft.plans.DenseMatrixAgg`).
  *
  * Spark 4 moved the classic `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`; extension libraries bridge it from inside the package
  * (the established pattern of Delta Lake / Frameless / Sedona). This is
  * the ONLY file outside the `graft` namespace, and it contains no logic.
  */
object GraftColumnBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
