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
    * @param direction "backward" (most recent right at-or-before — the
    *                 default and the classic as-of), "forward" (next
    *                 right at-or-after), or "nearest" (smaller absolute
    *                 time distance; exact ties prefer backward) — the
    *                 pandas merge_asof direction surface
    * @param allowExactMatches false → strictly before/after (exact-ts
    *                 right rows are invisible to that left row)
    * @param toleranceMicros when set, a carried row further than this
    *                 many MICROSECONDS (timestamp ts; raw units for
    *                 numeric ts) from the left row is nulled out —
    *                 integer-exact, engine-portable (no float epoch)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, ordCol: String,
               payload: Seq[String],
               direction: String = "backward",
               allowExactMatches: Boolean = true,
               toleranceMicros: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "joinAsOf needs at least one payload column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction '$direction'")
    // The merge machinery injects `_rts` at the head of the payload
    // struct and stages through `_pay`/`_pick`/`_b`/`_f`/`_side`; a
    // payload (or key/ts) column with one of those names would create a
    // duplicate struct field and make getField("_rts") ambiguous,
    // silently corrupting the nearest/tolerance arithmetic (ADVICE r7).
    locally {
      val reserved = Set("_rts", "_pay", "_pick", "_b", "_f", "_side")
      val clash = (payload ++ Seq(keyCol, tsCol)).filter(reserved)
      require(clash.isEmpty,
        s"joinAsOf: column name(s) ${clash.mkString(", ")} collide with " +
          "reserved internal names (_rts, _pay, _pick, _b, _f, _side); " +
          "rename before joining")
      require(!Seq(keyCol, tsCol).exists(payload.contains),
        s"joinAsOf: payload must not repeat the key/ts columns " +
          s"($keyCol, $tsCol) — they are already carried on the left row")
    }
    val key = col(keyCol); val ts = col(tsCol)
    val isTimestamp = left.schema(tsCol).dataType ==
      org.apache.spark.sql.types.TimestampType
    def micros(c: Column): Column =
      if (isTimestamp) unix_micros(c) else c.cast("long")
    // one right row per (key, ts): the greatest-ord row's payload
    val dedupAggs = payload.map(c => max_by(col(c), col(ordCol)).as(c))
    val r1 = right.groupBy(key, ts).agg(dedupAggs.head, dedupAggs.tail: _*)
    val leftCols = left.columns.toSeq
    // union schema: key, ts, side, then left columns (null on right rows),
    // then ONE `_pay` struct of `_rts` (the right row's event time, for
    // nearest/tolerance arithmetic) + the payload columns (null on left
    // rows). A single struct carry keeps each output row's payload
    // columns coherent — all from the same right row — even when some
    // payload fields are legitimately NULL; per-column carries would
    // resurrect an older row's non-null value for just those fields.
    val payStructType = org.apache.spark.sql.types.StructType(
      r1.schema(tsCol).copy(name = "_rts") +:
        payload.map(c => r1.schema(c).copy(name = c)))
    val rSide = r1.select(
      Seq(key, ts, lit(0).as("_side")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(ts.as("_rts") +: payload.map(col): _*).as("_pay"): _*)
    val lSide = left.select(
      Seq(key, ts, lit(1).as("_side")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) :+
        lit(null).cast(payStructType).as("_pay"): _*)
    val merged = rSide.unionByName(lSide)
    // On equal ts, the right row sorts BEFORE the left row when exact
    // matches are allowed (so the carry window sees it) and AFTER when
    // they are not. `_side` is 0 on right rows, 1 on left rows; the
    // strict variant flips the tie order.
    val sideOrd = if (allowExactMatches) col("_side").asc else col("_side").desc
    def carry(ascending: Boolean): Column = {
      val w = Window.partitionBy(key)
        .orderBy(if (ascending) ts.asc else ts.desc, sideOrd)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("_pay"), ignoreNulls = true).over(w)
    }
    val chosen = direction match {
      case "backward" => merged.withColumn("_pick", carry(ascending = true))
      case "forward"  => merged.withColumn("_pick", carry(ascending = false))
      case "nearest" =>
        // both carries ride the SAME key-partitioned shuffle (two sorts,
        // one exchange); exact-distance ties prefer the backward row
        val both = merged
          .withColumn("_b", carry(ascending = true))
          .withColumn("_f", carry(ascending = false))
        val db = micros(ts) - micros(col("_b").getField("_rts"))
        val df = micros(col("_f").getField("_rts")) - micros(ts)
        both.withColumn("_pick",
          when(col("_b").isNull, col("_f"))
            .when(col("_f").isNull, col("_b"))
            .when(db <= df, col("_b")).otherwise(col("_f")))
          .drop("_b", "_f")
    }
    val withTol = toleranceMicros match {
      case None => chosen
      case Some(tol) => chosen.withColumn("_pick",
        when(abs(micros(ts) - micros(col("_pick").getField("_rts"))) <= tol,
          col("_pick")))
    }
    withTol.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("_pick").getField(c).as(c)): _*)
  }
}
