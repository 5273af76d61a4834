package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Multinomial Naive Bayes text classifier with CLOSED-FORM training —
  * the quality-filter workhorse of LLM corpus curation (CCNet/fastText
  * quality classifiers, spam filtering): learn per-token class
  * log-likelihoods from a labeled subset, score every document, keep
  * the predicted-positive side. NB is the one classifier whose
  * training is exactly two aggregations (class-doc counts + per-class
  * token counts) — no gradient loop, no driver-side iteration — so at
  * 100 TB "training" is one pass over the labeled tokens and the model
  * IS a vocabulary-sized frame.
  *
  * Math (Laplace α=1 on both priors and likelihoods — no infinities
  * even for an empty class):
  *
  *   prior(c)  = ln(N_c + 1) − ln(N + 2)
  *   llk(w, c) = ln(cnt(w,c) + 1) − ln(total_c + V)
  *   score(d, c) = prior(c) + Σ_{w ∈ d ∩ V} llk(w, c)
  *
  * with V the TRAIN vocabulary size; apply-side tokens outside V are
  * ignored (the standard convention — smoothing covers in-vocab tokens
  * absent from one class).
  *
  * Plan shape (the L43/q80 shape): token-keyed map-combined count
  * aggregates (vocabulary-sized results), scalar priors, the
  * vocabulary-sized llk table BROADCAST back onto the token stream —
  * the corpus never shuffles — then ONE doc-keyed aggregate.
  * Determinism: per-token llk values sum through [[Q.dsum]]
  * (decimal-quantized, order-independent), so scores are bit-stable
  * under any partitioning. */
object NaiveBayes {

  /** Score every document. `toks` is the token-array column; `label`
    * must be 0/1 for TRAIN documents and null for apply-only ones.
    * Output: (doc_id, s1, s0, n_known, pred, is_train). */
  def classify(docs: DataFrame, idCol: String, toks: Column,
               label: Column): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      toks.as("_toks"), label.cast("long").as("_lab"))
    val tok = base.select(col("doc_id"), col("_lab"),
      explode(col("_toks")).as("tok"))
    val trTok = tok.filter(col("_lab").isNotNull)

    // model: per-(token, class) counts, per-class totals, vocab size
    val cnt = trTok.groupBy(col("tok"), col("_lab"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("_lab")).agg(sum(col("c")).as("t"))
    val vocab = cnt.select(col("tok")).distinct()
    val vocabN = vocab.agg(count(lit(1)).as("v"))
    val grid = vocab.select(col("tok"),
      explode(array(lit(0L), lit(1L))).as("_lab"))
    val llk = grid.join(cnt, Seq("tok", "_lab"), "left")
      .join(broadcast(tot), Seq("_lab"), "left")
      .crossJoin(broadcast(vocabN))
      .select(col("tok"), col("_lab"),
        (log((coalesce(col("c"), lit(0L)) + 1).cast("double")) -
          log((coalesce(col("t"), lit(0L)) + col("v")).cast("double")))
          .as("lp"))
    val model = llk.groupBy(col("tok")).agg(
      max(when(col("_lab") === 1, col("lp"))).as("lp1"),
      max(when(col("_lab") === 0, col("lp"))).as("lp0"))

    // priors from the labeled doc counts (one scalar row) — quantized
    // to the same 9-decimal grid as the summed llks, so the final
    // prior+sum double add sees engine-identical operands (Spark's log
    // is StrictMath; the grid absorbs the last-ULP ln differences)
    def q9(c: Column): Column = c.cast("decimal(18,9)").cast("double")
    val pri = base.agg(
        sum(when(col("_lab") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("_lab").isNotNull, 1L).otherwise(0L)).as("n"))
      .select(
        q9(log((col("n1") + 1).cast("double")) -
          log((col("n") + 2).cast("double"))).as("p1"),
        q9(log((col("n") - col("n1") + 1).cast("double")) -
          log((col("n") + 2).cast("double"))).as("p0"))

    // apply: llk table broadcast onto the token stream, one doc agg
    val sums = tok.join(broadcast(model), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_known"),
        Q.dsum(col("lp1"), 9).as("s1d"), Q.dsum(col("lp0"), 9).as("s0d"))
    val s1 = col("p1") + coalesce(col("s1d"), lit(0.0))
    val s0 = col("p0") + coalesce(col("s0d"), lit(0.0))
    base.select(col("doc_id"), col("_lab"))
      .join(sums, Seq("doc_id"), "left")
      .crossJoin(broadcast(pri))
      .select(col("doc_id"), s1.as("s1"), s0.as("s0"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        when(s1 > s0, 1L).otherwise(0L).as("pred"),
        when(col("_lab").isNotNull, 1L).otherwise(0L).as("is_train"))
  }
}
