package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of join (L29): attach to each left row the most recent
  * right row at-or-before it, per key — the classic event-stream
  * enrichment (trade↔quote, impression↔conversion, click↔purchase).
  *
  * The union-carry formulation, not a join: right rows (pre-deduped to
  * one per (key, ts) — latest by `ordCol` wins) and left rows
  * interleave in ONE shuffle keyed on `keyCol`, sorted by (ts, side)
  * with right rows first on ties, and `last(_, ignoreNulls)` windows
  * carry the running right payload forward onto every left row.
  *
  * Why this shape at 100 TB:
  *  - a range self-join (`l.ts >= r.ts` + max-window) multiplies rows
  *    by the per-key history length — quadratic for hot keys;
  *  - broadcasting either side is corpus-sized;
  *  - here each side shuffles exactly once, the carry scan holds ONE
  *    row of state per key, and ties are deterministic.
  *
  * Returns the left columns plus the carried right payload columns
  * (null where no right row precedes). Equivalent to DuckDB's native
  * `ASOF LEFT JOIN` on `l.key = r.key AND l.ts >= r.ts` — q59's oracle
  * pins that equivalence on real data.
  */
object AsOf {

  /** @param left     left (probe) rows
    * @param right    right (reference) rows; deduped per (key, ts) by
    *                 greatest `ordCol` before the merge
    * @param keyCol   equi-join key column name (both sides)
    * @param tsCol    event-time column name (both sides, same type)
    * @param ordCol   right-side tie-break column name (unique per
    *                 (key, ts) group makes the dedup deterministic)
    * @param payload  right-side columns to carry (must not collide with
    *                 left column names)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, ordCol: String,
               payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "joinAsOf needs at least one payload column")
    val key = col(keyCol); val ts = col(tsCol)
    // one right row per (key, ts): the greatest-ord row's payload
    val dedupAggs = payload.map(c => max_by(col(c), col(ordCol)).as(c))
    val r1 = right.groupBy(key, ts).agg(dedupAggs.head, dedupAggs.tail: _*)
    val leftCols = left.columns.toSeq
    // union schema: key, ts, side, then left columns (null on right rows),
    // then payload columns (null on left rows)
    val rSide = r1.select(
      Seq(key, ts, lit(0).as("_side")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val lSide = left.select(
      Seq(key, ts, lit(1).as("_side")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) ++
        payload.map(c => lit(null).cast(r1.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(key).orderBy(ts, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(rSide.unionByName(lSide)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("_side") === 1).drop("_side")
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
