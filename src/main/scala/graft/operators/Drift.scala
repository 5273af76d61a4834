package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots (L53) —
  * the "did the ingest mix shift?" monitor a training-data pipeline
  * runs between crawl batches. Per-bin histogram comparison with an
  * INTEGER-EXACT total-variation numerator: for bin i,
  * `|c_a[i]·N_b − c_b[i]·N_a|`, so that
  * `TV = Σ_i num_i / (2·N_a·N_b)` — but no division, logarithm or
  * floating point ever happens inside the operator. PSI/KL-style
  * scores need ln() whose last-ulp behavior differs across engines;
  * the cross-multiplied TV form is bit-identical everywhere (the
  * arithmetic runs in DECIMAL(38,0): c·N ≤ N² overflows int64 past
  * ~3·10⁹ rows — a 100 TB corpus is ~10¹¹).
  *
  * 100 TB shape: one scan per snapshot into a map-combined groupBy on
  * the bin key (shuffle carries ≤bins partial rows per task); the
  * full-outer bin join and the two totals are bin-frame-sized (the
  * totals are keyless sums over the BIN frames — no second corpus
  * scan); both totals broadcast back onto the bins.
  */
object Drift {

  /** L68 — per-source token-mix drift vs the whole corpus: for each
    * source s, the total-variation distance between its unigram
    * distribution and the corpus's,
    * `TV(s) = Σ_t |c_st·N − c_t·n_s| / (2·n_s·N)`, with the numerator
    * in integer-exact DECIMAL(38,0) (the [[histogramDrift]] stance —
    * no ln(), no order-sensitive float sum). Tokens the source never
    * emits contribute `c_t·n_s` without being materialized: their sum
    * telescopes to `n_s·(N − Σ_{t∈s} c_t)`, so the operator only ever
    * touches (source, token) pairs that exist. Also reports the
    * present token with the largest drift term (tie → token asc) — the
    * "what changed" pointer next to the "how much" score.
    *
    * Output: (source, n_toks_src, tv_num, tv, top_tok, top_tok_num).
    *
    * 100 TB shape: ONE (source, token)-keyed map-combined aggregate
    * over the token stream; corpus totals derive from those partials
    * (no second scan) and broadcast back; the top-term election is a
    * rank-1 window over the vocab-sized pair frame (WindowGroupLimit
    * keeps one row per source per task). The corpus never shuffles
    * twice. */
  def sourceMixDrift(docs: DataFrame, sourceCol: Column,
                     text: Column): DataFrame = {
    import graft.functions.TextFns
    // st feeds ct, ns AND the terms join; terms feeds the top-term
    // election AND the final rollup. Unpinned, every consumer re-runs
    // the corpus tokenize+count (8 scans in the plan dump — despite the
    // "no second scan" design intent; exchange reuse is best-effort,
    // the q27 lesson). Both frames are (source, token)-vocabulary-sized
    // — far smaller than the corpus they would otherwise re-scan.
    val st = docs.select(sourceCol.as("source"),
        explode(TextFns.tokens(text)).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_st"))
      .localCheckpoint()
    val ct = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val n = ct.agg(sum(col("c_t")).as("n_tot"))
    val terms = st.join(ct, Seq("tok")).join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("num",
        abs(col("c_st").cast("decimal(38,0)") * col("n_tot")
          - col("c_t").cast("decimal(38,0)") * col("n_s")))
      .localCheckpoint()
    val top = terms
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("num").desc, col("tok"))))
      .where(col("rk") === 1)
      .select(col("source"), col("tok").as("top_tok"),
        col("num").cast("long").as("top_tok_num"))
    // _cov is the CORPUS mass of the source's present tokens (Σ c_t over
    // t∈s — each (source, tok) row carries c_t exactly once), so the
    // absent-token terms Σ_{t∉s} c_t·n_s telescope to n_s·(N − _cov).
    // Summing c_st here instead would under-count sources whose tokens
    // are corpus-common (caught by the zero-self-drift spec).
    terms.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_toks_src"), max(col("n_tot")).as("_n"),
        sum(col("num")).as("_present"), sum(col("c_t")).as("_cov"))
      .withColumn("tv_num",
        (col("_present") + col("n_toks_src").cast("decimal(38,0)")
          * (col("_n") - col("_cov"))).cast("decimal(38,0)"))
      .withColumn("tv", col("tv_num").cast("double")
        / ((lit(2.0) * col("n_toks_src")) * col("_n")))
      .join(top, Seq("source"))
      .select(col("source"), col("n_toks_src"),
        col("tv_num").cast("long").as("tv_num"), col("tv"),
        col("top_tok"), col("top_tok_num"))
  }

  /** Per-bin drift frame: (bin, c_a, c_b, n_a, n_b, drift_num), where
    * drift_num = |c_a·n_b − c_b·n_a| exactly. Bins absent on one side
    * count 0 there (full-outer). Null bins form their own bin. */
  def histogramDrift(a: DataFrame, b: DataFrame, bin: Column): DataFrame = {
    val ca = a.groupBy(bin.as("bin")).agg(count(lit(1)).as("c_a"))
    val cb = b.groupBy(bin.as("bin")).agg(count(lit(1)).as("c_b"))
    val na = ca.agg(coalesce(sum(col("c_a")), lit(0L)).as("n_a"))
    val nb = cb.agg(coalesce(sum(col("c_b")), lit(0L)).as("n_b"))
    ca.join(cb, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("c_a", "c_b"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("drift_num",
        abs(col("c_a").cast("decimal(38,0)") * col("n_b")
          - col("c_b").cast("decimal(38,0)") * col("n_a")))
  }

  /** L93 — exact two-sample Kolmogorov–Smirnov statistic: the maximum
    * ECDF gap between two slices' integer value distributions,
    * cross-multiplied so the numerator is integer-exact
    * (D = max_v |F_a(v)·n_b − F_b(v)·n_a| / (n_a·n_b)) — the
    * distribution-shift test that complements L53's TV (TV sees mass
    * moved anywhere; KS sees WHERE the CDFs diverge, and its null
    * distribution is the textbook one). Returns ONE row:
    * (n_a, n_b, ks_num, ks, at_value) — at_value is the smallest value
    * attaining the max (deterministic tie-break).
    *
    * 100 TB shape: each side collapses map-combined to its per-VALUE
    * count frame (value-domain-bounded — a length histogram has
    * thousands of rows at any corpus size); the ECDF prefix windows and
    * the max election run over the merged value frame, so the
    * unpartitioned sort is domain-bounded, never corpus-bounded (the
    * q130 time-axis argument with the value axis as the bound). */
  def ksStatistic(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = a.select(value.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c_a"))
    val cb = b.select(value.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c_b"))
    val merged = ca.join(cb, Seq("v"), "full_outer")
      .na.fill(0L, Seq("c_a", "c_b"))
    val na = merged.agg(sum(col("c_a")).as("n_a"))
    val nb = merged.agg(sum(col("c_b")).as("n_b"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("f_a", sum(col("c_a")).over(w))
      .withColumn("f_b", sum(col("c_b")).over(w))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("num",
        abs(col("f_a").cast("decimal(38,0)") * col("n_b")
          - col("f_b").cast("decimal(38,0)") * col("n_a")))
      .orderBy(col("num").desc, col("v")).limit(1)
      .select(col("n_a"), col("n_b"),
        col("num").cast("long").as("ks_num"),
        (col("num").cast("double")
          / (col("n_a").cast("double") * col("n_b"))).as("ks"),
        col("v").as("at_value"))
  }

  /** L91 — CUSUM rate-change detection: bucket events into fixed time
    * windows (EMPTY buckets materialize — a silence is a rate change
    * too), accumulate the one-sided CUSUM of deviations from the mean
    * rate, and flag buckets where it crosses `thrNum/thrDen · N·T`
    * (deviations d_t = c_t·T − N live on the N·T scale, so the
    * threshold must too) — the
    * ingest-monitoring alarm (crawler stall, duplicate flood, burst)
    * computed exactly. The clamp recurrence S_t = max(0, S_{t−1}+d_t)
    * is NOT a plain prefix sum, but it equals P_t − min_{τ≤t} P_τ over
    * the raw prefix P — two window scans instead of a sequential loop.
    * All integer: d_t = c_t·T − N (Σd = 0 by construction), and the
    * threshold compare cross-multiplies.
    *
    * 100 TB shape: ONE map-combined bucket-count aggregate collapses
    * the corpus to the TIME-BOUNDED bucket frame (range/bucketSec rows
    * — a year of hourly buckets is 8 760 rows no matter how many events
    * land in them); the prefix windows run over that frame, so the
    * unpartitioned sort is bounded by the time axis, never the corpus
    * (the q129 sample-bounded argument, with time as the bound). */
  def cusumAlarms(events: DataFrame, tsCol: Column, bucketSec: Long,
                  thrNum: Long, thrDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketSec > 0 && thrDen > 0, "bad cusum config")
    val spark = events.sparkSession
    def idiv(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(a), Bridge.expression(b)))
    }
    val counts = events
      .select(idiv(tsCol.cast("long"), lit(bucketSec)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // bucket-frame sized; consumed by probe + join
    val mm = counts.agg(min(col("b")), max(col("b")), sum(col("c"))).head()
    if (mm.isNullAt(0))
      return spark.range(0).select(col("id").as("bucket_ts"),
        lit(0L).as("n_events"), lit(0L).as("cusum"), lit(0L).as("is_alarm"))
    val (bLo, bHi, n) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    val t = bHi - bLo + 1
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.range(bLo, bHi + 1).select(col("id").as("b"))
      .join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("p", sum(col("c") * t - n).over(w))
      // the virtual P₀ = 0 matters: without it a rate rise from the
      // very first bucket would read cusum 0 (min over {P₁} = P₁)
      .withColumn("cusum",
        col("p") - least(lit(0L), min(col("p")).over(w)))
      .select((col("b") * bucketSec).as("bucket_ts"), col("c").as("n_events"),
        col("cusum"),
        when(col("cusum") * thrDen > lit(thrNum) * n * t, 1L).otherwise(0L)
          .as("is_alarm"))
  }
}
