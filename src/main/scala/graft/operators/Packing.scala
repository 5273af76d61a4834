package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Sequence packing for LLM training feeds: assign rows (documents) to
  * fixed-weight-budget chunks per stratum. The concatenation order is a
  * salted hash of the row key — a deterministic shuffle with no RNG
  * state (same derivation as [[Sampling]]) — and the chunk id /
  * intra-chunk offset fall out of a cumulative weight sum, so a doc
  * straddles chunk boundaries exactly the way pretraining packing
  * concatenates-then-splits at budget multiples.
  *
  * 100 TB notes: one partitioned window shuffle per call (the stratum
  * cumsum); there is never a global / SinglePartition cumulative sum —
  * packing is per-stratum by construction, which is also what a
  * mixture-weighted loader consumes. All arithmetic is integer, so the
  * assignment is exactly reproducible on any engine.
  */
object Packing {

  /** Adds `chunk_id` and `chunk_off` columns: the row's chunk within
    * its stratum and its start offset inside that chunk.
    *
    * @param weight per-row cost column (e.g. a token count); must be
    *               non-negative integers
    * @param budget chunk capacity in weight units
    */
  def packChunks(df: DataFrame, stratum: Column, key: Column,
                 weight: Column, budget: Long, salt: String): DataFrame = {
    val h = TextFns.hash60(concat(key.cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(stratum).orderBy(h, key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(weight).over(w))
      .withColumn("chunk_id",
        ((col("_cum") - weight) / budget).cast("long"))
      .withColumn("chunk_off",
        ((col("_cum") - weight) % budget).cast("long"))
      .drop("_cum")
  }
}
