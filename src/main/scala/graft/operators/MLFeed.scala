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

  /** B1 — exact head/tail split after a deterministic permutation
    * (`utility.py:167-179`): first floor(p*n) rows are the training set.
    * NOT Bernoulli `randomSplit` — the reference slices exactly.
    * Emits `split` ∈ {"train","valid"}.
    *
    * Scale note: the permutation ranking uses a global sort, which is a
    * single range-partitioned exchange (Spark's sort is distributed, not
    * single-node); n comes from a scalar count window. For per-scene
    * splits pass `partitionBy`.
    */
  def exactSplit(df: DataFrame, orderKeys: Seq[Column], fraction: Double,
                 partitionBy: Seq[String] = Nil): DataFrame = {
    val w = if (partitionBy.isEmpty) Window.orderBy(orderKeys: _*)
            else Window.partitionBy(partitionBy.map(col): _*).orderBy(orderKeys: _*)
    val cw = if (partitionBy.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionBy.map(col): _*)
    df.withColumn("_rank", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(cw))
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
    val w = if (partitionBy.isEmpty) Window.orderBy(orderKeys: _*)
            else Window.partitionBy(partitionBy.map(col): _*).orderBy(orderKeys: _*)
    val cw = if (partitionBy.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionBy.map(col): _*)
    df.withColumn("_rank", row_number().over(w) - 1)
      .withColumn("_n", count(lit(1)).over(cw))
      .withColumn("batch_id", (col("_rank") / batchSize).cast("long"))
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
