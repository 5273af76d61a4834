package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Fixed-point second-moment matrix aggregate (the L79 kernel): for an
  * `array<float>` embedding column, accumulates
  * `m[i*dim+j] = Σ_rows floor(x_i · x_j · 2^30)` into a flat
  * `long[dim²]` buffer — ONE pass, no row expansion. Replaces the
  * explode-4096-structs formulation of the same sum: the HOF expansion
  * pushed dim²·n rows through the hash aggregate (q118 at sf1: ~7 s);
  * here each row is a tight O(dim²) loop into a primitive array and
  * the shuffle carries one dim²-long buffer per task.
  *
  * Value-identical to the explode formulation (same floor-quantized
  * products, summed in any order — integer addition commutes), so the
  * q118 oracle is unchanged. Long-sum bound: |Σ| stays exact while
  * n · 2^30 · E|x_i x_j| < 2^63, i.e. ~8.6e9 unit-scale rows; a
  * spectral AUDIT of a larger corpus should run on a sample anyway
  * (the operator's contract documents this).
  */
case class MomentMatrixAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim > 0, "moment_matrix dim must be positive")

  private val Q = 1073741824.0 // 2^30

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim * dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      i = 0
      while (i < dim) {
        val xi = x(i)
        var j = 0
        val base = i * dim
        while (j < dim) {
          buf(base + j) += math.floor(xi * x(j) * Q).toLong
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < b1.length) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf): Array[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var k = 0
    while (k < buf.length) { out.writeLong(buf(k)); k += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](dim * dim)
    var k = 0
    while (k < buf.length) { buf(k) = in.readLong(); k += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "moment_matrix"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MomentMatrixAgg =
    copy(child = newChild)
}

object MomentMatrixAgg {
  /** Column API: `moment_matrix(embedding, dim)` → array<long> of dim²
    * fixed-point sums, row-major. */
  def momentMatrix(emb: Column, dim: Int): Column =
    Bridge.column(MomentMatrixAgg(Bridge.expression(emb), dim)
      .toAggregateExpression())
}
