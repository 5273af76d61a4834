package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge

/** Column-level entry points for graft's native vector expressions. */
object VecFns {

  /** Codegen'd double dot product of two numeric array columns.
    * See [[VecDot]] for exact null/precision semantics. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
}
