package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** L94 — padding-waste audit for length-bucketed batching: assign
    * every document to the length bucket ceil(len/width)·width and
    * report, per bucket, the support, real token mass, padded mass, the
    * padding overhead, and the bucket's efficiency — the number that
    * decides bucket boundaries (or justifies sequence packing, L21)
    * before a training run pays for pad tokens. All integer except the
    * final ratios.
    *
    * 100 TB shape: ONE map-combined groupBy on the bucket id (length
    * buckets are a few hundred rows at any corpus size); nothing else
    * touches the corpus. */
  def paddingWaste(docs: DataFrame, idCol: Column, text: Column,
                   bucketWidth: Int): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val len = size(graft.functions.TextFns.tokens(text)).cast("long")
    docs.select(idCol.as("_id"), len.as("len"))
      .withColumn("bucket",
        expr(s"(len + ${bucketWidth - 1}) div $bucketWidth") * bucketWidth)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("real_tokens"))
      .select(col("bucket"), col("n_docs"), col("real_tokens"),
        (col("bucket") * col("n_docs")).as("padded_tokens"),
        (col("bucket") * col("n_docs") - col("real_tokens")).as("pad_waste"),
        (col("real_tokens").cast("double")
          / (col("bucket") * col("n_docs"))).as("efficiency"))
  }

  /** Adds `chunk_id` and `chunk_off` columns: the row's chunk within
    * its stratum and its start offset inside that chunk.
    *
    * @param weight per-row cost column (e.g. a token count); must be
    *               non-negative integers
    * @param budget chunk capacity in weight units
    */
  def packChunks(df: DataFrame, stratum: Column, key: Column,
                 weight: Column, budget: Long, salt: String): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    val w = Window.partitionBy(stratum).orderBy(Sampling.saltedHash(key, salt), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `div`, not `/`: Spark's Divide on integrals is DOUBLE division,
    // which loses low bits once a stratum's cumulative weight passes
    // 2^53 — the oracle's integer floor division would then diverge.
    df.withColumn("_start", (sum(weight).over(w) - weight).cast("long"))
      .withColumn("chunk_id", expr(s"_start div ${budget}L"))
      .withColumn("chunk_off", pmod(col("_start"), lit(budget)))
      .drop("_start")
  }
}
