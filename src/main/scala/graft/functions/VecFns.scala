package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge

/** Column-level entry points for graft's native vector expressions. */
object VecFns {

  /** Codegen'd double dot product of two numeric array columns.
    * See [[VecDot]] for exact null/precision semantics. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd map-side IVF cell assignment: the `k` nearest centroid
    * ids (cosine, ties to lowest id) against a literal centroid table.
    * See [[NearestCells]] for the parity contract. */
  def nearestCells(emb: Column, centIds: Array[Long], centFlat: Array[Double],
                   centNorms: Array[Double], dim: Int, k: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(emb), centIds, centFlat,
      centNorms, dim, k))

  /** Codegen'd TWO-LEVEL cell assignment (hierarchical-IVF rule:
    * nearest super, then nearest member cell of that group) — the
    * ~O(√C·dim)-per-row path for codebooks that grow with the corpus.
    * See [[NearestCellTwoLevel]] for the parity contract; the index
    * comes from [[NearestCellTwoLevel.buildIndex]]. */
  def nearestCellTwoLevel(emb: Column, centIds: Array[Long],
                          centFlat: Array[Double], centNorms: Array[Double],
                          dim: Int): Column = {
    val (superPos, memberStart, memberCell) =
      NearestCellTwoLevel.buildIndex(centFlat, centNorms, dim)
    Bridge.column(NearestCellTwoLevel(Bridge.expression(emb), centIds,
      centFlat, centNorms, dim, superPos, memberStart, memberCell))
  }

  /** Codegen'd per-row scalar quantize-dequantize against a literal
    * per-dim (min, max) grid. See [[DequantizeGrid]] for the arithmetic
    * and null contract. */
  def dequantizeGrid(emb: Column, mins: Array[Double], maxs: Array[Double],
                     levels: Double): Column =
    Bridge.column(DequantizeGrid(Bridge.expression(emb), mins, maxs, levels))
}
