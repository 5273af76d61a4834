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

  /** L101 — packed-sequence SPAN manifest: the per-(doc, chunk) span
    * table a packed-training loader actually consumes. [[packChunks]]
    * gives each doc its start offset in the stratum's token stream; a
    * doc whose interval crosses budget boundaries occupies SEVERAL
    * chunks — this operator emits one row per (doc, chunk) with the
    * span's position inside the chunk (`span_off`), the corresponding
    * offset inside the doc (`doc_off`), and the span length — exactly
    * what attention-mask / cross-doc-boundary construction needs.
    * Laws (spec-pinned): per doc, spans tile [0, weight) of the doc;
    * per (stratum, chunk), spans tile [0, budget) with no overlap
    * (except the stratum's ragged last chunk).
    *
    * 100 TB shape: ONE stratum-partitioned window (same shuffle as
    * [[packChunks]]) + a map-side generator; fan-out per doc is
    * 1 + floor(weight/budget) — bounded by the doc/budget ratio. */
  def packSpans(df: DataFrame, stratum: Column, key: Column,
                weight: Column, budget: Long, salt: String): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    val w = Window.partitionBy(stratum).orderBy(Sampling.saltedHash(key, salt), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(budget)
    df.withColumn("_w", weight.cast("long"))
      .withColumn("_start", (sum(col("_w")).over(w) - col("_w")).cast("long"))
      .where(col("_w") > 0)
      .withColumn("chunk_id", explode(sequence(
        expr(s"_start div ${budget}L"),
        expr(s"(_start + _w - 1) div ${budget}L"))))
      .withColumn("_sb", greatest(col("_start"), col("chunk_id") * b))
      .withColumn("span_off", col("_sb") - col("chunk_id") * b)
      .withColumn("doc_off", col("_sb") - col("_start"))
      .withColumn("span_len",
        least(col("_start") + col("_w"), (col("chunk_id") + 1) * b) - col("_sb"))
      .drop("_w", "_start", "_sb")
  }
}
