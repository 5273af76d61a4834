package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: double-precision dot product of two
  * numeric array columns (`array<float>` / `array<double>` on either
  * side), accumulated as a strict left fold —
  * `acc_0 = 0.0; acc_{i+1} = acc_i + (double)a[i] * (double)b[i]`.
  *
  * Why an `Expression` and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions are `CodegenFallback` — every 64-dim dot
  * product walks two lambda trees per element in interpreted mode,
  * allocating a zipped intermediate array per row. This expression
  * participates in whole-stage codegen (`doGenCode` emits one tight
  * `for` loop over the two `ArrayData`), which matters because the dot
  * product is the innermost kernel of every similarity operator
  * (brute-force/LSH/IVF top-k, embedding near-dup): it runs once per
  * candidate PAIR, i.e. billions of times at corpus scale.
  *
  * Null semantics match the higher-order-function formulation it
  * replaces (so oracle hashes are bit-identical): null if either array
  * is null, if the lengths differ (`zip_with` pads with null), or if
  * any element is null (`null` poisons the fold). The accumulation
  * order and the float→double widening are also identical, so results
  * are bit-for-bit the same as the old
  * `aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0, _+_)`.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = av.numElements()
    if (bv.numElements() != n) return null
    val aD = elemIsDouble(left)
    val bD = elemIsDouble(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (av.isNullAt(i) || bv.isNullAt(i)) return null
      val x = if (aD) av.getDouble(i) else av.getFloat(i).toDouble
      val y = if (bD) bv.getDouble(i) else bv.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val aGet = if (elemIsDouble(left)) s"$a.getDouble($i)"
                 else s"(double) $a.getFloat($i)"
      val bGet = if (elemIsDouble(right)) s"$b.getDouble($i)"
                 else s"(double) $b.getFloat($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $aGet * $bGet;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
