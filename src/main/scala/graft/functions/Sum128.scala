package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native exact decimal summation (the q01/q15 scale constant).
  *
  * Spark's built-in `sum` over `DecimalType(18, s)` widens the buffer to
  * `DecimalType(28, s)`, which exceeds the compact-long representation —
  * every row update goes through `Decimal.+` on java.math.BigDecimal
  * (allocation + object arithmetic), measured at 4–14 µs/row on the sf5
  * lineitem vs ~40 ns/row for a long sum (tools/ProfileAgg). This
  * aggregate instead sums the decimal's UNSCALED long in 128-bit integer
  * arithmetic held in TWO long buffer slots (low word unsigned, high word
  * signed) plus a count for SQL null semantics:
  *
  *  - exact for any input count below 2⁶³ rows of decimal(18) values
  *    (|sum| < 10¹⁸·2⁶³ ≪ 2¹²⁷) — integer addition is associative and
  *    commutative, so the result is bit-identical to the BigDecimal sum
  *    regardless of partitioning/merge order (the same portability
  *    contract [[graft.queries.Query.dsum]] documents);
  *  - primitive buffer types keep the aggregate in the codegen'd
  *    row-based HashAggregateExec fast path (a TypedImperativeAggregate
  *    would force ObjectHashAggregate and its 128-group sort-based
  *    fallback);
  *  - the 128→decimal conversion happens once per GROUP at evaluate,
  *    not per row.
  *
  * The wrapping adds live in dedicated codegen expressions ([[WrapAdd]],
  * [[CarryU64]]) because the built-in `Add` on longs THROWS on overflow
  * under ANSI mode — here low-word wraparound is the design.
  */
case class Sum128(child: Expression, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, scale)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sum128 needs a LONG (unscaled) input, got ${child.dataType}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    // sign-extended 128-bit add of child x: hi += (x >> 63) + carry(lo, x)
    val newHi = Add(Add(hi, ShiftRight(child, Literal(63))), CarryU64(lo, child))
    val newLo = WrapAdd(lo, child)
    Seq(
      If(IsNull(child), hi, newHi),
      If(IsNull(child), lo, newLo),
      If(IsNull(child), cnt, Add(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(Add(hi.left, hi.right), CarryU64(lo.left, lo.right)),
    WrapAdd(lo.left, lo.right),
    Add(cnt.left, cnt.right))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal.create(null, dataType),
      Decimal128(hi, lo, scale))

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}

object Sum128 {
  private[functions] def requireLongs(e: BinaryExpression): TypeCheckResult =
    if (e.left.dataType == LongType && e.right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${e.prettyName} needs LONG inputs, got " +
        s"(${e.left.dataType}, ${e.right.dataType})")
}

/** Wrapping long addition (Java `+` semantics): the intended low-word
  * overflow of the 128-bit accumulator. Null-safe via BinaryExpression. */
case class WrapAdd(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = Sum128.requireLongs(this)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] + b.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"($a + $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WrapAdd =
    copy(left = l, right = r)
}

/** Carry-out (0 or 1) of the UNSIGNED addition of two longs — the
  * classic bit identity carry = ((a & b) | ((a | b) & ~(a + b))) >>> 63. */
case class CarryU64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = Sum128.requireLongs(this)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    ((x & y) | ((x | y) & ~(x + y))) >>> 63
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"((($a & $b) | (($a | $b) & ~($a + $b))) >>> 63)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CarryU64 =
    copy(left = l, right = r)
}

/** (hi, lo) 128-bit two's-complement integer → Decimal(38, scale) with
  * the given scale. Runs once per group at aggregate evaluation. */
case class Decimal128(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = Sum128.requireLongs(this)
  override def dataType: DataType = DecimalType(38, scale)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Decimal128.toDecimal(a.asInstanceOf[Long], b.asInstanceOf[Long], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, l) => s"graft.functions.Decimal128.toDecimal($h, $l, $scale)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Decimal128 =
    copy(left = l, right = r)
}

object Decimal128 {
  /** Exact (hi·2⁶⁴ + unsigned lo) rescaled by 10^-scale. */
  def toDecimal(hi: Long, lo: Long, scale: Int): org.apache.spark.sql.types.Decimal = {
    val big = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(big, scale), 38, scale)
  }
}
