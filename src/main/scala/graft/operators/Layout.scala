package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** L117 — DETERMINISTIC range-shard layout: assign each row a shard
    * id such that shard value-ranges are disjoint and ordered (shard i
    * holds keys ≤ every key in shard i+1) — the "write the table
    * globally sorted" primitive behind ordered lakehouse layouts and
    * merge-friendly compaction, WITHOUT a global sort and WITHOUT
    * `repartitionByRange` (whose RangePartitioner SAMPLES with an
    * RDD-id-seeded RNG: two evaluations of the same subtree see
    * different bounds — the round-2 lost-rows bug; these cuts are a
    * pure function of the data).
    *
    * Cut points are exact integer ranks over the VALUE HISTOGRAM:
    * cut(i) = the smallest key value whose cumulative count reaches
    * i·N/numShards (ceil division) — so shard i is
    * `(cut(i-1), cut(i)]`-bounded, every row with the same key lands in
    * the same shard (ties never straddle), and the assignment is
    * reproducible across runs, partitionings and engines.
    *
    * 100 TB shape: ONE exchange on the key value builds the histogram
    * (value-domain-bounded — use a quantized key for continuous
    * domains); the cumulative walk runs on the histogram frame
    * (SinglePartition over |distinct values| rows); the cut table
    * broadcasts; assignment is a map-side range lookup (a join on
    * shard-interval containment against ≤ numShards rows). Balance is
    * within max-value-multiplicity of N/numShards by construction. */
  def rangeShards(df: DataFrame, key: Column, numShards: Int): DataFrame = {
    require(numShards >= 1, "numShards must be positive")
    val Seq(kc, cnt, cum, tot) = Seq("_rs_k", "_rs_n", "_rs_c", "_rs_t")
    require(!df.columns.exists(Seq(kc, cnt, cum, tot, "shard").contains),
      "input collides with rangeShards internals ('shard', '_rs_*')")
    val hist = df.groupBy(key.as(kc)).agg(count(lit(1)).as(cnt))
    val everything = Window.orderBy(col(kc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // shard of a VALUE = ceil(numShards * cumCount / N) — monotone in
    // the cumulative count, so shard ranges are ordered and disjoint
    val cuts = hist
      .withColumn(cum, sum(col(cnt)).over(everything))
      .withColumn(tot, sum(col(cnt)).over(full))
      .select(col(kc),
        // integer ceil division — never a double `/` (exactness past
        // 2^53 rows is the memory-rule for integer↔double crossings)
        expr(s"($numShards * $cum + $tot - 1) div $tot").as("shard"))
      .groupBy(col("shard"))
      .agg(max(col(kc)).as("hi"))
    // per-shard upper bounds, ordered; assignment = first shard whose
    // hi >= key (map-side broadcast range join on <= numShards rows)
    val bounds = cuts.select(col("shard"), col("hi"),
      lag(col("hi"), 1).over(Window.orderBy(col("shard"))).as("lo"))
    df.join(broadcast(bounds),
        key <= col("hi") && (col("lo").isNull || key > col("lo")))
      .drop("hi", "lo")
  }

  /** DuckDB mirror of [[rangeShards]]'s shard-of-value rule, as a CTE
    * body over table `t(k)`: emits (k, shard). */
  def sqlRangeShardOfValue(table: String, k: String, numShards: Int): String =
    s"""SELECT $k, CAST(($numShards * cum + tot - 1) // tot AS BIGINT) AS shard
      FROM (SELECT $k,
          sum(n) OVER (ORDER BY $k ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS cum,
          sum(n) OVER () AS tot
        FROM (SELECT $k, count(*) AS n FROM $table GROUP BY 1))"""
}
