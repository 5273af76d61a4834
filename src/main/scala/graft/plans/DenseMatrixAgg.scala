package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** W7 upgrade path (SURVEY.md §4 custom candidate #1): dense per-patch
  * matrix assembly as a `TypedImperativeAggregate` — a flat
  * `Array[Double]` buffer scatter-filled in place, instead of
  * `sort_array(collect_list(struct(...)))`'s per-row struct allocation +
  * O(n log n) sort. For 256×256 patches (65k cells) the collect_list
  * path materializes and sorts 65k boxed structs per patch; this buffer
  * writes each cell once and merges partials by overwrite.
  *
  * Missing cells stay NaN — the reference's NaN-canvas init (F14,
  * `archive.py:133`). Deterministic given unique (r, c) per group (the
  * tiling key guarantees it).
  */
case class DenseMatrixAgg(
    first: Expression,  // row index within the patch
    second: Expression, // col index within the patch
    third: Expression,  // cell value
    window: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with TernaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] =
    Array.fill(window * window)(Double.NaN)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val r = first.eval(input)
    val c = second.eval(input)
    val v = third.eval(input)
    if (r != null && c != null && v != null) {
      val ri = r.asInstanceOf[Number].intValue()
      val ci = c.asInstanceOf[Number].intValue()
      // fail fast with a descriptive error: out-of-window indices would
      // otherwise throw a bare AIOOBE (ri too large) or silently scatter
      // into the wrong cell (negative ci wraps into the previous row).
      if (ri < 0 || ri >= window || ci < 0 || ci >= window)
        throw new IllegalArgumentException(
          s"dense_matrix cell ($ri, $ci) outside window $window x $window")
      buf(ri * window + ci) = v.asInstanceOf[Number].doubleValue()
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { if (!b2(i).isNaN) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData((0 until window).map { r =>
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, r * window, (r + 1) * window))
    }.toArray[Any])

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): DenseMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DenseMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): DenseMatrixAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DenseMatrixAgg {
  /** Column-API entry: `dense_matrix(r, c, v, window)` aggregate. */
  def dense_matrix(r: Column, c: Column, v: Column, window: Int): Column = {
    import org.apache.spark.sql.graft.Bridge.{column, expression}
    column(DenseMatrixAgg(expression(r), expression(c), expression(v), window)
      .toAggregateExpression())
  }
}
