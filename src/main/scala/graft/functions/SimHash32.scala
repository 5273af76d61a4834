package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: 32-bit SimHash of a token-hash array
  * (`array<bigint>` → `bigint`).
  *
  * Semantics — exactly the higher-order fold it replaces
  * (`TextFns.simhash32Fold`, kept as the parity witness): for each bit
  * position j, count +1 per hash with bit j set and −1 otherwise; the
  * output sets bit j iff the count is strictly positive. A NULL element
  * counts −1 on every bit — the fold's `when(h&m≠0,1).otherwise(-1)`
  * and the oracle's `CASE … ELSE -1` both send a null condition to the
  * else branch, and parity beats null-purity here. Null array → null;
  * empty array → 0 (all counts 0, no bit wins).
  *
  * Why native: the HOF formulation allocates a fresh 32-element counter
  * array per TOKEN per row (`aggregate` over `zip_with`), interpreted —
  * this expression is one codegen'd loop with a single on-stack counter
  * array per row, O(tokens × 32) integer ops and zero allocation churn.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += (if (((h >> j) & 1L) != 0L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final int[] $counts = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) {
         |    $counts[$j] += ((($h >> $j) & 1L) != 0L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($counts[$j] > 0) $out |= 1L << $j;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
