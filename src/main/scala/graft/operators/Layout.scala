package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Storage-layout keys for data-skipping writes (L38): sorting (or
  * range-partitioning) a table by a Z-order key before writing gives
  * every file a tight min/max envelope on BOTH dimensions, so
  * two-dimensional predicates prune files instead of scanning them —
  * the layout story behind `OPTIMIZE ZORDER BY` in lakehouse engines,
  * as a plain deterministic column expression.
  *
  * The key interleaves the low `bits` of two non-negative integer
  * columns (a→even bit positions, b→odd): pure shift/mask/or integer
  * math, codegen'd, engine-portable (mirrored textually in the q69
  * oracle), no UDF. 2×`bits` ≤ 62 keeps everything in a BIGINT.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` of `a` and `b`.
    * Caller contract: both non-negative and < 2^bits (mask enforces the
    * width; negative inputs are masked to their low bits too). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      val ai = shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i)
      val bi = shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
      ai.bitwiseOR(bi)
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB mirror of [[zValue]] (same shifts, same reduction order). */
  def sqlZValue(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.map(t => s"($t)").mkString(" | ")
}
