package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history build (L52) — turn a change-event
  * stream into SCD-type-2 validity intervals: one row per run of equal
  * attribute values per key, with `[valid_from, valid_to)` bounds and a
  * current flag. The warehouse-standard "build the dimension history
  * from CDC events" operator (Kimball SCD2), and the batch counterpart
  * of a `mapGroupsWithState` state timeline.
  *
  * 100 TB shape: ONE hash exchange on the key. Both windows (the
  * change detector and the interval close) partition by the same key
  * with the same (ts, ord) sort, and the run-start filter between them
  * preserves partitioning and order — Catalyst plans a single Exchange
  * + single Sort feeding both Window operators. No groupBy re-shuffle
  * (the run-start row IS the interval row; a groupBy(key, run) would
  * re-key the shuffle on a different grain for nothing).
  */
object History {

  /** @param key  partition key (the dimension's natural key)
    * @param attr tracked attribute — a run of consecutive equal values
    *             collapses to one interval (null-safe comparison)
    * @param ts   event time; interval bounds come from run-start times
    * @param ord  unique tie-breaker within (key, ts) — makes the
    *             ordering total and the output deterministic
    * @return (key, attr, valid_from, valid_to, is_current): valid_to is
    *         the next run's valid_from (half-open interval), null on the
    *         current run; is_current 1L/0L.
    */
  def scd2(df: DataFrame, key: Column, attr: Column, ts: Column,
           ord: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("_ord"))
    df.select(key.as("key"), attr.as("attr"), ts.as("ts"), ord.as("_ord"))
      // run start = first row of the key OR attr change. The first-row
      // test is on the (required non-null) tie-breaker, NOT on
      // lag(attr): a genuinely-null attr in the first row would make
      // `lag(attr) <=> attr` true and silently drop the run.
      .withColumn("_chg",
        when(lag(col("_ord"), 1).over(w).isNull
          || !(lag(col("attr"), 1).over(w) <=> col("attr")), 1).otherwise(0))
      .where(col("_chg") === 1)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("key"), col("attr"), col("ts").as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
  }
}
