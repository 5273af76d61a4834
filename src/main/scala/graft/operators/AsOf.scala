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
  * with right rows first on ties, and a single `last(_, ignoreNulls)`
  * window over a struct of the payload columns carries the running
  * right row forward onto every left row — one struct (not one window
  * per column) so all carried fields come from the SAME right row even
  * when individual payload values are NULL.
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
    // then ONE `_pay` struct of the payload columns (null on left rows).
    // A single struct carry keeps each output row's payload columns
    // coherent — all from the same (newest) right row — even when some
    // payload fields are legitimately NULL; per-column carries would
    // resurrect an older row's non-null value for just those fields.
    val payStructType = org.apache.spark.sql.types.StructType(
      payload.map(c => r1.schema(c).copy(name = c)))
    val rSide = r1.select(
      Seq(key, ts, lit(0).as("_side")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_pay"): _*)
    val lSide = left.select(
      Seq(key, ts, lit(1).as("_side")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) :+
        lit(null).cast(payStructType).as("_pay"): _*)
    val w = Window.partitionBy(key).orderBy(ts, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rSide.unionByName(lSide)
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("_pay").getField(c).as(c)): _*)
  }
}
