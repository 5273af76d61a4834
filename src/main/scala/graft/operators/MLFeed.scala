package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ML-feed operators: day-of-year filtering, exact train/validation
  * splits, epoch shuffles, batch slicing, tensor assembly (P9, B1-B4,
  * A4-A6; `/root/reference/asip_v2/utility.py:153-198`,
  * `train_model.py:59-99`, `data_generator.py:20-89`).
  *
  * The reference shuffles with seedless Python RNG — exact RNG parity is
  * impossible (SURVEY.md §7.4.4), so these operators take an explicit
  * deterministic permutation key and promise distributional equivalence
  * plus our own reproducibility.
  */
object MLFeed {

  /** Knuth-style multiplicative mix — a deterministic, engine-portable
    * stand-in for `random.shuffle`. Same arithmetic is expressible in
    * ANSI SQL, which is what makes the split/batch oracles exact. */
  def permuteKey(key: Column): Column =
    pmod(key.cast("long") * 2654435761L, lit(4294967296L))

  /** P9/F3/F4 — keep records whose day-of-year (days since Jan 1, i.e.
    * `dayofyear - 1`, matching `(ts - Jan1).days`,
    * `train_model.py:69-81`) lies in [beginDay, endDay]. */
  def dayOfYearFilter(df: DataFrame, tsCol: String,
                      beginDay: Int, endDay: Int): DataFrame =
    df.filter((dayofyear(col(tsCol)) - 1).between(beginDay, endDay))

  /** Scale-safe global rank: `Window.orderBy(...)` funnels every row
    * through ONE task twice (rank pass + unpartitioned count pass —
    * VERDICT r1 perf: q15 13.3 s at sf0.1, serial at 100×). Instead:
    *
    *  1. range-repartition on the order keys — Spark's distributed sort
    *     shuffle; partition p holds a contiguous key range, ranges
    *     ascending with partition id;
    *  2. rank *within* partitions (parallel) via a window keyed on the
    *     materialized partition id;
    *  3. global rank = within-partition rank + exclusive prefix sum of
    *     per-partition counts — a numPartitions-row aggregate (tiny),
    *     broadcast back. Total row count rides along for free.
    *
    * Adds `_rank` (1-based) and `_n` (total rows). Rank values are
    * identical to the single-window formulation for unique keys.
    */
  private def withGlobalRank(df: DataFrame, orderKeys: Seq[Column]): DataFrame = {
    val parted = df.repartitionByRange(orderKeys: _*)
      .withColumn("_pid", spark_partition_id())
    val counts = parted.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
    val cum = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts // numPartitions rows — single-partition windows are fine
      .withColumn("_off", sum(col("_cnt")).over(cum) - col("_cnt"))
      .withColumn("_n", sum(col("_cnt")).over(Window.partitionBy()))
      .select(col("_pid"), col("_off"), col("_n"))
    val wInPart = Window.partitionBy(col("_pid")).orderBy(orderKeys: _*)
    parted.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_rank", col("_off") + row_number().over(wInPart))
      .drop("_pid", "_off")
  }

  /** B1 — exact head/tail split after a deterministic permutation
    * (`utility.py:167-179`): first floor(p*n) rows are the training set.
    * NOT Bernoulli `randomSplit` — the reference slices exactly.
    * Emits `split` ∈ {"train","valid"}. Global case uses the scale-safe
    * two-pass rank; for per-scene splits pass `partitionBy` (already
    * parallel across scenes).
    */
  def exactSplit(df: DataFrame, orderKeys: Seq[Column], fraction: Double,
                 partitionBy: Seq[String] = Nil): DataFrame = {
    val ranked =
      if (partitionBy.isEmpty) withGlobalRank(df, orderKeys)
      else {
        val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderKeys: _*)
        val cw = Window.partitionBy(partitionBy.map(col): _*)
        df.withColumn("_rank", row_number().over(w))
          .withColumn("_n", count(lit(1)).over(cw))
      }
    ranked
      .withColumn("split",
        when(col("_rank") <= floor(col("_n") * fraction), "train")
          .otherwise("valid"))
      .drop("_rank", "_n")
  }

  /** B2 — deterministic epoch shuffle key: reshuffle per epoch by mixing
    * the epoch into the permutation (`data_generator.py:43-47`). */
  def epochShuffleKey(key: Column, epoch: Int): Column =
    permuteKey(key + lit(epoch.toLong * 1000003L))

  /** B3 — batch slicing (`data_generator.py:20-35`): rows ordered by
    * `orderKey` get `batch_id = floor(rank/batchSize)`; the ragged tail
    * (`n % batchSize` rows) is dropped — the reference serves exactly
    * `floor(n/bs)` batches. */
  def batchIds(df: DataFrame, orderKeys: Seq[Column], batchSize: Int,
               partitionBy: Seq[String] = Nil): DataFrame = {
    val ranked =
      if (partitionBy.isEmpty) withGlobalRank(df, orderKeys)
      else {
        val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderKeys: _*)
        val cw = Window.partitionBy(partitionBy.map(col): _*)
        df.withColumn("_rank", row_number().over(w))
          .withColumn("_n", count(lit(1)).over(cw))
      }
    ranked
      .withColumn("batch_id", ((col("_rank") - 1) / batchSize).cast("long"))
      .filter(col("batch_id") < floor(col("_n") / batchSize))
      .drop("_rank", "_n")
  }

  /** B4 — assemble one dense tensor row per batch at the ML hand-off
    * boundary: list of per-sample structs, ordered within the batch.
    * Long format everywhere else; this runs only at the sink
    * (SURVEY.md §7.4.1). */
  def assembleBatches(df: DataFrame, orderKey: Column,
                      sampleCols: Seq[String]): DataFrame =
    df.groupBy(col("batch_id"))
      .agg(sort_array(collect_list(struct(
        orderKey.as("_ord") +: sampleCols.map(col): _*))).as("samples"))
}
