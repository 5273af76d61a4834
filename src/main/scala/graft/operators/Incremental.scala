package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (L114): merge yesterday's
  * aggregate SNAPSHOT with today's DELTA aggregate instead of
  * recomputing from all of history — the pattern that turns a daily
  * 100 TB full-scan into a snapshot-sized merge plus a delta-sized
  * scan. Works for any algebra whose statistics are MERGEABLE:
  * counts/sums add, mins/maxes combine, and anything expressible as
  * those (mean = sum/count downstream; HLL registers merge by max —
  * see the q162 sketch-merge lifecycle).
  *
  * Exactness contract: sums should be carried as DECIMAL inside the
  * snapshots (integer unscaled addition is associative and exact, so
  * snapshot+delta == from-scratch BIT-EXACTLY — the q161 gate); a
  * double sum would make the merged result order-dependent and the
  * maintained aggregate would drift from a recompute.
  *
  * 100 TB shape: both inputs arrive hash-partitioned by the group key
  * (each is an aggregate output — or a snapshot table bucketed on the
  * key), so the FULL OUTER merge join requires no additional exchange:
  * Catalyst reuses the aggregation partitioning and the join adds only
  * sorts (q161's plan contract pins exactly 2 exchanges for the whole
  * snapshot+delta+merge pipeline). State never concentrates: the merge
  * is per-key, skew splits at the key grain.
  */
object Incremental {

  /** Merge two per-key statistic frames. Both must carry `keys` plus
    * the same statistic columns; every non-key output is
    * null-safe-combined (a key absent from one side contributes zero
    * counts/sums and identity min/max).
    *
    * @param counts columns combined by `+` with 0 for absent (LongType)
    * @param sums   columns combined by `+` with a typed zero for absent
    *               (keep these DECIMAL for exactness — see class doc)
    * @param mins   columns combined by `least` (null-skipping)
    * @param maxs   columns combined by `greatest` (null-skipping)
    */
  def mergeStats(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
                 counts: Seq[String], sums: Seq[String],
                 mins: Seq[String], maxs: Seq[String]): DataFrame = {
    val stats = counts ++ sums ++ mins ++ maxs
    require(stats.nonEmpty, "no statistic columns to merge")
    require(stats.intersect(keys).isEmpty, "keys overlap statistics")
    for (df <- Seq(snapshot, delta); c <- keys ++ stats)
      require(df.columns.contains(c), s"column '$c' missing from an input")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(keys.map(col) ++ stats.map(c => col(c).as(s"_$tag$c")): _*)
    val joined = side(snapshot, "a").join(side(delta, "b"), keys, "full_outer")
    def a(c: String): Column = col(s"_a$c")
    def b(c: String): Column = col(s"_b$c")
    val zeroOf: String => Column = c =>
      lit(0).cast(snapshot.schema(c).dataType)
    joined.select(keys.map(col) ++
      counts.map(c => (coalesce(a(c), lit(0L)) + coalesce(b(c), lit(0L))).as(c)) ++
      sums.map(c => (coalesce(a(c), zeroOf(c)) + coalesce(b(c), zeroOf(c))).as(c)) ++
      mins.map(c => least(a(c), b(c)).as(c)) ++
      maxs.map(c => greatest(a(c), b(c)).as(c)): _*)
  }
}
