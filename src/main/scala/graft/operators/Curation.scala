package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Corpus-curation operators for LLM training-data prep (builder brief;
  * SURVEY.md §2.9b L57–L61, L66–L67): boilerplate n-gram detection,
  * per-source document caps, dedup-aware token accounting, balanced
  * shard planning, corpus-wide block dedup, and vocabulary-coverage
  * audits — the admission/reporting layer that sits between the dedup
  * family ([[Dedup]]) and the sampling family ([[Sampling]]).
  */
object Curation {

  /** L66 — corpus-wide block-level dedup with document reassembly (the
    * C4 / RefinedWeb line-dedup step generalized to fixed-width token
    * blocks): split every document into `blockTokens`-token blocks,
    * keep only the globally FIRST occurrence of each distinct block
    * (ordered by (doc_id, block_idx) — deterministic), and rebuild each
    * document from its surviving blocks in order. Returns one row per
    * input document: (doc_id, n_blocks, n_kept, text_dedup) — a doc
    * whose every block appeared earlier elsewhere survives with
    * n_kept = 0 and empty text, which is exactly the boilerplate-only
    * page the step exists to delete.
    *
    * 100 TB shape: first-occurrence election is ONE row_number over the
    * 8-byte block hash (hash keys are uniform, so the exchange is
    * skew-free by construction; no corpus-wide sort, no driver state);
    * reassembly is one doc-keyed exchange whose per-group state is a
    * single document's surviving blocks. Block text rides each exchange
    * once — there is no all-pairs comparison anywhere (dedup is
    * equality-on-hash, the L1 rule applied at block granularity). */
  def blockDedup(docs: DataFrame, idCol: Column, text: Column,
                 blockTokens: Int, skewSafe: Boolean = false): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1, got $blockTokens")
    val (base, blocks) = blockFrame(docs, idCol, text, blockTokens)
    // First-occurrence election — two plan shapes for two key regimes
    // (measured head-to-head on a 90%-hot boilerplate fixture AND the
    // near-unique real corpus; graft.tools.SkewStress + SCALE.md r7):
    //  - default: row_number window over the content hash. Content keys
    //    of a deduplicated-ish corpus are NEAR-UNIQUE, so one streaming
    //    sort beats a hash aggregate that can't collapse anything.
    //  - skewSafe: map-combined MIN_BY aggregate. A boilerplate-heavy
    //    corpus concentrates one block hash on 90%+ of rows; a window
    //    physically sorts that whole key inside ONE unsplittable task
    //    (the cluster-death mode at 1000 executors), while the hash
    //    aggregate collapses the hot key to one candidate per map task
    //    before the shuffle.
    // (doc_id, block_idx) is unique per row, so both elections pick the
    // identical winner (spec-pinned).
    val kept =
      if (skewSafe)
        blocks
          .groupBy(TextFns.hash60(col("btext")).as("bh"))
          .agg(min_by(struct(col("doc_id"), col("block_idx"), col("btext")),
            struct(col("doc_id"), col("block_idx"))).as("w"))
          .select(col("w.doc_id").as("doc_id"),
            col("w.block_idx").as("block_idx"), col("w.btext").as("btext"))
      else
        blocks
          .withColumn("rk", row_number().over(
            Window.partitionBy(TextFns.hash60(col("btext")))
              .orderBy(col("doc_id"), col("block_idx"))))
          .where(col("rk") === 1)
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("block_idx"), col("btext")))),
          x => x("btext")), " ").as("text_dedup"))
    base.select(col("doc_id"),
        (floor((size(col("toks")) - 1) / lit(blockTokens)) + 1)
          .cast("long").as("n_blocks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** (tokenized docs, exploded blocks) — shared by [[blockDedup]] and
    * the [[blockDedupAuto]] skew probe. */
  private def blockFrame(docs: DataFrame, idCol: Column, text: Column,
                         blockTokens: Int): (DataFrame, DataFrame) = {
    val base = docs.select(idCol.as("doc_id"),
      TextFns.tokens(text).as("toks"))
    val blocks = base.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0L), floor((size(col("toks")) - 1) / lit(blockTokens))),
        i => array_join(
          slice(col("toks"), (i * blockTokens + 1).cast("int"),
            lit(blockTokens)), " "))))
      .toDF("doc_id", "block_idx", "btext")
    (base, blocks)
  }

  /** Plan-build-time hot-key probe (VERDICT r7 #8): the share of the
    * single most frequent key among `keys` (a one-column frame named
    * `k`, already bounded by the caller). 0.0 for an empty probe. */
  private[graft] def hotKeyShare(keys: DataFrame): Double = {
    val r = keys.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).cast("double").as("mx"),
        sum(col("c")).cast("double").as("n"))
      .head()
    if (r.isNullAt(0) || r.isNullAt(1) || r.getDouble(1) == 0.0) 0.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** [[blockDedup]] with the election chosen AUTOMATICALLY (VERDICT r7
    * #8 — the r7 decision rule "flip skewSafe for boilerplate-heavy
    * corpora" was manual): a bounded `probeDocs`-document sample is
    * blocked and hashed at plan-build time, and the skew-safe MIN_BY
    * arm is chosen when one block hash carries ≥ `hotShare` of the
    * sampled blocks — else the streaming-sort window arm (optimal for
    * near-unique keys). Both arms produce the IDENTICAL result
    * (spec-pinned), so the probe's sampling order only ever affects
    * the plan, never the answer; the probe cost is one bounded action
    * (LocalLimit stops the scan after `probeDocs` rows — O(sample),
    * not O(corpus), at any scale). */
  def blockDedupAuto(docs: DataFrame, idCol: Column, text: Column,
                     blockTokens: Int, probeDocs: Int = 512,
                     hotShare: Double = 0.25): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1, got $blockTokens")
    val share = hotKeyShare(
      blockFrame(docs.limit(probeDocs), idCol, text, blockTokens)._2
        .select(TextFns.hash60(col("btext")).as("k")))
    blockDedup(docs, idCol, text, blockTokens, skewSafe = share >= hotShare)
  }

  /** L67 — vocabulary coverage / OOV audit: induce the top-`vocabK`
    * corpus vocabulary (by count desc, token asc — the q62 boundary
    * tie-break) and report, per document, its token count, OOV token
    * count, OOV rate, and distinct OOV types — the "how much of this
    * corpus does my tokenizer actually cover" number that decides vocab
    * size and flags out-of-domain ingest.
    *
    * 100 TB shape: vocabulary induction is one map-combined token
    * aggregate cut by TakeOrderedAndProject (top-K never sorts the
    * vocabulary globally); the vocabulary — vocabK rows by definition —
    * BROADCASTS onto the token stream, so the per-doc audit is one
    * doc-keyed map-combined aggregate; the corpus shuffles once (token
    * agg) plus once keyed by doc id. */
  def vocabCoverage(docs: DataFrame, idCol: Column, text: Column,
                    vocabK: Int): DataFrame = {
    val tok = docs.select(idCol.as("doc_id"),
      explode(TextFns.tokens(text)).as("tok"))
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("tok")).limit(vocabK)
      .select(col("tok"), lit(1).as("_in_vocab"))
    tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(when(col("_in_vocab").isNull, col("tok")))
          .as("n_oov_types"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_toks"))
  }

  /** L57 — boilerplate n-gram report (the C4/RefinedWeb template-removal
    * signal generalized to n-grams). A gram is boilerplate WITHIN a
    * source when it appears in ≥ dfFracNum/dfFracDen of that source's
    * documents; each doc reports how much of its gram stream that
    * boilerplate set covers. The threshold compare is pure integer
    * cross-multiplication (`df·den ≥ n_src·num`) — no float ratio.
    *
    * 100 TB shape: gram occurrences shuffle once as 8-byte hash60 keys
    * for the (source, gram) doc-frequency aggregate (two-phase distinct,
    * map-combined); the boilerplate set — by definition the ubiquitous
    * tail, orders of magnitude smaller than the gram vocabulary — is
    * BROADCAST back onto the gram stream, so the per-doc coverage pass
    * never re-shuffles gram occurrences; the final aggregate is one
    * doc-keyed map-combined exchange. Documents shorter than the gram
    * width carry no signal and are dropped (the [[Dedup]] convention). */
  def boilerplateReport(docs: DataFrame, idCol: Column, sourceCol: Column,
                        text: Column, gramN: Int,
                        dfFracNum: Int, dfFracDen: Int): DataFrame = {
    val base = docs.select(idCol.as("doc_id"), sourceCol.as("source"),
        TextFns.shingleHashes60(TextFns.tokens(text), gramN).as("hs"))
      .where(size(col("hs")) > 0)
    val grams = base.select(col("doc_id"), col("source"),
      size(col("hs")).cast("long").as("n_grams"), explode(col("hs")).as("h"))
    val srcCounts = base.groupBy(col("source"))
      .agg(count(lit(1)).as("_n_src"))
    val boiler = grams.groupBy(col("source"), col("h"))
      .agg(countDistinct(col("doc_id")).as("_df"))
      .join(broadcast(srcCounts), Seq("source"))
      .where(col("_df") * dfFracDen >= col("_n_src") * dfFracNum)
      .select(col("source"), col("h"), lit(1).as("_bp"))
    grams.join(broadcast(boiler), Seq("source", "h"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("n_grams")).as("n_grams"),
        sum(when(col("_bp").isNotNull, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_grams"))
  }

  /** L58 — per-group document cap (RefinedWeb/FineWeb-style domain caps):
    * keep at most `k` rows per group, best-first by `orderKeys` (which
    * MUST end in a unique tie-breaker for a deterministic cut). Emits the
    * kept rows with their 1-based `rnk`.
    *
    * 100 TB shape: `row_number ≤ k` compiles to WindowGroupLimit — every
    * map task keeps only its local top-k per group BEFORE the single
    * group-keyed exchange, so the shuffle carries ≤ k·groups·tasks rows,
    * not the corpus. Hot groups (one domain = half the crawl) bound at k
    * per task the same way. */
  def capPerGroup(df: DataFrame, group: Column, orderKeys: Seq[Column],
                  k: Int): DataFrame =
    df.withColumn("rnk",
        row_number().over(Window.partitionBy(group).orderBy(orderKeys: _*)))
      .where(col("rnk") <= k)

  /** L60 — dedup-weighted token accounting: per source, raw vs effective
    * (dedup-once) document and token counts. Clusters are exact-dup
    * groups under [[Dedup.contentKey]]; each cluster is counted once, at
    * its keeper (min doc id), and attributed to the keeper's source —
    * the "how many unique tokens do I actually have" number that drives
    * epoch math for training runs. All counters are integers; nothing
    * here can drift under partial-agg reordering.
    *
    * 100 TB shape: the cluster frame is ONE digest-keyed map-combined
    * aggregate (32-byte keys — the L1 rule: shuffle digests, never
    * documents); the keeper join re-shuffles only (digest, id, n_toks)
    * triples on the same key; the per-source rollup is one map-combined
    * exchange of ≤ sources rows per task. */
  def effectiveTokens(docs: DataFrame, idCol: Column, text: Column,
                      sourceCol: Column): DataFrame = {
    val d = docs.select(idCol.as("doc_id"), sourceCol.as("source"),
      Dedup.contentKey(text).as("ckey"),
      size(TextFns.tokens(text)).cast("long").as("n_toks"))
    val keepers = d.groupBy(col("ckey")).agg(min(col("doc_id")).as("keeper_id"))
    d.join(keepers, Seq("ckey"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("raw_tokens"),
        sum(when(col("doc_id") === col("keeper_id"), 1L).otherwise(0L))
          .as("n_unique_docs"),
        sum(when(col("doc_id") === col("keeper_id"), col("n_toks"))
          .otherwise(0L)).as("unique_tokens"))
  }

  /** L61 — balanced shard plan: assign every row to one of `nShards`
    * output shards by round-robin over the size-descending global rank
    * (longest-processing-time-first — the classic balance heuristic for
    * writing training shards with ~equal token budgets). Returns the
    * per-row assignment (id, size, rank, shard).
    *
    * 100 TB shape: the global rank is the q15 two-pass — per-bucket
    * row_number + broadcast per-bucket offsets ([[MLFeed.rankByBucket]]),
    * never an unpartitioned window; buckets are equal-width over the
    * [min,max] size domain measured by one two-scalar aggregate (the
    * codebook-collect pattern). Shard assignment and the downstream
    * per-shard rollup are map-side arithmetic on the rank. */
  def shardPlan(df: DataFrame, sizeCol: Column, idCol: Column,
                nShards: Int): DataFrame = {
    val base = df.select(idCol.as("doc_id"), sizeCol.cast("long").as("sz"))
    val mm = base.agg(min(col("sz")).as("lo"), max(col("sz")).as("hi")).head()
    // empty input → null domain; any constant keeps the bucket expression
    // well-formed (there are no rows for it to misplace)
    val (lo, hi) = if (mm.isNullAt(0)) (0L, 0L)
      else (mm.getLong(0), mm.getLong(1))
    val nb = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val key = lit(hi) - col("sz") // ascending key == size-descending order
    val bucket = least(greatest((key * nb / (hi - lo + 1)).cast("int"),
      lit(0)), lit(nb - 1))
    MLFeed.rankByBucket(base.withColumn("_key", key), bucket,
        Seq(col("_key"), col("doc_id")))
      .select(col("doc_id"), col("sz"),
        col("_rank").as("g_rank"),
        ((col("_rank") - 1) % nShards).as("shard"))
  }

  /** L100 — balanced shard SINK: materialize a [[shardPlan]] assignment
    * as an actual partitioned parquet layout (`outDir/shard=K/…`) and
    * return the MANIFEST read back from the written files — per shard:
    * document count, total payload size, id range. The read-back (not
    * the input) is the manifest source, so the gate proves the physical
    * round trip: what the plan assigned is exactly what a training job
    * reading `shard=K` will see. This is the missing last step of the
    * q99 planner — the writer a 100 TB curation pipeline actually ends
    * with.
    *
    * 100 TB shape: docs join the (doc-keyed, slim) plan on doc_id, the
    * write repartitions BY THE SHARD COLUMN so each task writes whole
    * shards (no shard's rows scattered across hundreds of task files),
    * and `partitionBy(shard)` gives readers partition pruning per
    * shard. The manifest aggregate is ≤ nShards rows, map-combined. */
  def writeShards(docs: DataFrame, plan: DataFrame, idCol: Column,
                  sizeCol: Column, outDir: String): DataFrame = {
    val joined = docs.select(idCol.as("doc_id"), sizeCol.cast("long").as("sz"))
      .join(plan.select(col("doc_id"), col("shard")), Seq("doc_id"))
    joined.repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    // explicit read schema: no inference job, and an EMPTY write (no
    // partition dirs at all) still yields a well-formed empty manifest
    docs.sparkSession.read.schema(joined.schema).parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("sz")).as("sum_sz"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
  }

  /** L70 — quality-classifier ROC-AUC audit: the Mann-Whitney AUC of an
    * integer score against a binary label, with exact tie correction —
    * the number that validates a quality/toxicity/language classifier
    * before its threshold gates a 100 TB corpus. Uses the average-rank
    * formulation: every member of a tied score group takes rank
    * (min_rank + max_rank)/2, so 2·U = Σ_s n_pos(s)·(min_rk(s)+max_rk(s))
    * − n_pos·(n_pos+1) — all integer until the final division. Returns
    * ONE row: (n_pos, n_neg, u2, auc).
    *
    * 100 TB shape: the global rank is the q15 two-pass
    * ([[MLFeed.rankByBucket]] — per-bucket row_number + broadcast
    * offsets over equal-width score buckets, never an unpartitioned
    * window); the per-score tie aggregate is one map-combined
    * score-keyed exchange; u2 accumulates in DECIMAL(38,0) (rank sums
    * are O(n²) — a long overflows near 4 B rows). */
  def rocAuc(df: DataFrame, score: Column, label: Column,
             idCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = df.select(score.cast("long").as("s"),
      label.cast("long").as("y"), idCol.as("_id"))
    val mm = base.agg(min(col("s")).as("lo"), max(col("s")).as("hi")).head()
    val (lo, hi) = if (mm.isNullAt(0)) (0L, 0L)
      else (mm.getLong(0), mm.getLong(1))
    val nb = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val bucket = least(greatest(((col("s") - lo) * nb / (hi - lo + 1))
      .cast("int"), lit(0)), lit(nb - 1))
    val ranked = MLFeed.rankByBucket(base, bucket, Seq(col("s"), col("_id")))
    val perScore = ranked.groupBy(col("s"))
      .agg(sum(col("y")).as("n_pos_s"), min(col("_rank")).as("min_rk"),
        max(col("_rank")).as("max_rk"))
    perScore.agg(
        sum(col("n_pos_s")).as("n_pos_l"),
        sum(col("max_rk") - col("min_rk") + 1 - col("n_pos_s")).as("n_neg_l"),
        sum((col("min_rk") + col("max_rk")).cast(DecimalType(38, 0))
          * col("n_pos_s")).as("rk2_sum"))
      .select(col("n_pos_l").as("n_pos"), col("n_neg_l").as("n_neg"),
        // DECIMAL stays internal (rank-sum products can exceed long at
        // extreme n); the OUTPUT is 2·U ≤ 2·n_pos·n_neg — long-exact to
        // billions of rows, and the PortabilitySpec contract bans
        // DECIMAL output columns (driver-comparator portability).
        (col("rk2_sum") - col("n_pos_l").cast(DecimalType(38, 0))
          * (col("n_pos_l") + 1)).cast("long").as("u2"))
      .withColumn("auc", col("u2").cast("double")
        / (lit(2.0) * col("n_pos") * col("n_neg")))
  }

  /** L71 — calibration audit (reliability bins): bucket a predicted
    * probability into `bins` equal-width bins and report, per bin, the
    * support, positive count, exact mean prediction, empirical positive
    * rate, and |gap| — the reliability diagram + per-bin ECE contribution
    * that decides whether a quality classifier's scores can be used as
    * sampling weights (vs mere ranks). The mean prediction goes through
    * the decimal-exact [[graft.queries.Q.dsum]] path so partial-agg
    * order cannot skew it.
    *
    * 100 TB shape: ONE map-combined groupBy on the bin id (≤ bins rows
    * per task) — nothing else touches the corpus. */
  def calibrationReport(df: DataFrame, prob: Column, label: Column,
                        bins: Int): DataFrame = {
    val b = least(floor(prob * bins).cast("long"), lit(bins - 1L)).as("bin")
    df.select(b, prob.as("p"), label.cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        graft.queries.Q.dsum(col("p"), 6).as("_sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("_sp") / col("n")).as("mean_pred"),
        (col("n_pos").cast("double") / col("n")).as("pos_rate"),
        abs(col("_sp") / col("n") - col("n_pos").cast("double") / col("n"))
          .as("gap"))
  }

  /** L72 — hashed n-gram importance weights (the DSIR recipe, Xie et al.
    * 2023, arXiv:2302.03169): score every document by how much its token
    * distribution looks like a TARGET slice of the corpus vs the raw
    * corpus, via hashed unigram buckets. Per bucket b the weight is the
    * smoothed probability ratio  ((c_tgt(b)+1)·(N+B)) / ((c_all(b)+1)·(T+B))
    * quantized by integer floor division at `Scale` — exact, log-free
    * arithmetic (ln differs in the last ulp across libm builds; an
    * engine-portable score cannot contain it), monotone in the true
    * ratio. A document's score is the sum of its tokens' bucket weights;
    * resampling keeps the top mass (rank or threshold — caller's cut).
    * Returns (doc_id, n_toks, dsir_score, dsir_mean).
    *
    * 100 TB shape: bucket counts are ONE map-combined aggregate onto ≤
    * `buckets` rows; the weight table (buckets rows by construction)
    * BROADCASTS back onto the token stream; the per-doc score is one
    * doc-keyed map-combined exchange. The corpus shuffles exactly twice,
    * both times as 8-byte keys. Weight products run in DECIMAL(38,0):
    * c·N at corpus scale overflows a long. */
  def importanceWeights(docs: DataFrame, idCol: Column, text: Column,
                        isTarget: Column, buckets: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val Scale = 1000000L
    val tok = docs.select(idCol.as("doc_id"),
        isTarget.cast("long").as("_t"), explode(TextFns.tokens(text)).as("tok"))
      .select(col("doc_id"), col("_t"),
        pmod(TextFns.hash60(col("tok")), lit(buckets.toLong)).as("b"))
    // counts feeds both the totals scalar and the weight table;
    // unpinned, each re-runs the token-stream scan (the q27
    // shuffle-reuse lesson). It is ≤ buckets rows — checkpoint.
    val counts = tok.groupBy(col("b"))
      .agg(count(lit(1)).as("c_all"), sum(col("_t")).as("c_tgt"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("c_all")).as("n_all"),
      sum(col("c_tgt")).as("n_tgt"))
    // Integer floor division (`div`), not `/`: the quantized weight must
    // be the same integer in every engine — fractional decimal division
    // rounds at an engine-chosen scale.
    def idiv(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(a), Bridge.expression(b)))
    }
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        idiv((col("c_tgt") + 1).cast(DecimalType(38, 0))
            * (col("n_all") + buckets) * Scale,
          (col("c_all") + 1).cast(DecimalType(38, 0))
            * (col("n_tgt") + buckets)).as("w"))
    tok.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("dsir_score"))
      .withColumn("dsir_mean",
        col("dsir_score").cast("double") / col("n_toks"))
  }

  /** L90 — deterministic bootstrap confidence interval for a corpus
    * metric: B resamples (with replacement, size = sample size) of a
    * FIXED evaluation sample, the mean of `value` per resample, and the
    * exact lo/hi quantiles of those B means — the error bar that turns
    * "mean doc length = 512" into a defensible report number. No RNG:
    * draw d of resample b picks sample index hash60(b:d:salt) % n, so
    * the interval is reproducible across runs, engines and
    * partitionings.
    *
    * Returns ONE row: (n_sample, n_resamples, mean_full, ci_lo, ci_hi).
    * Means are decimal-exact ([[graft.queries.Q.dsum]] on the long
    * values); the quantiles are the discrete rank-ceil elements of the
    * B-row means frame.
    *
    * 100 TB shape: `isSample` must select a corpus-size-independent set
    * (the q123 contract); everything downstream is B·n generated draws
    * — a map-side grid join against the BROADCAST n-row sample frame,
    * one (resample)-keyed map-combined aggregate to B rows, and a
    * B-row quantile election. The corpus is touched once, by the
    * sample filter. */
  def bootstrapCi(df: DataFrame, isSample: Column, idCol: Column,
                  value: Column, resamples: Int, loPct: Int, hiPct: Int,
                  salt: String): DataFrame = {
    import graft.functions.TextFns
    require(resamples > 0 && loPct < hiPct && loPct >= 0 && hiPct <= 100,
      "bad bootstrap config")
    val sample = df.where(isSample)
      .select(idCol.as("_id"), value.cast("long").as("v"))
      .withColumn("idx", row_number().over(
        Window.orderBy(col("_id"))) - 1) // n is sample-sized: tiny sort
      .localCheckpoint()
    val n = sample.count()
    // Empty sample: still ONE row (the scaladoc contract, and what the
    // oracle's global aggregate yields over an empty sample — DuckDB's
    // sum-over-empty/max-over-empty are NULL, count is 0), so operator
    // and oracle agree on the degenerate shape too.
    if (n == 0)
      return sample.sparkSession.range(1).select(lit(0L).as("n_sample"),
        lit(resamples.toLong).as("n_resamples"),
        lit(null).cast("double").as("mean_full"),
        lit(null).cast("double").as("ci_lo"),
        lit(null).cast("double").as("ci_hi"))
    val draws = sample.sparkSession.range(resamples.toLong)
      .select(col("id").as("b"),
        explode(sequence(lit(0L), lit(n - 1))).as("d"))
      .select(col("b"),
        pmod(TextFns.hash60(concat_ws(":", col("b"), col("d"),
          lit(salt))), lit(n)).as("idx"))
    val means = draws.join(broadcast(sample.select(col("idx"), col("v"))),
        Seq("idx"))
      .groupBy(col("b"))
      .agg((graft.queries.Q.dsum(col("v").cast("double"), 4)
        / count(lit(1))).as("m"))
    val ranked = means
      .withColumn("rk", row_number().over(Window.orderBy(col("m"), col("b"))))
    val full = sample.agg((graft.queries.Q.dsum(col("v").cast("double"), 4)
      / count(lit(1))).as("mean_full"))
    // quantile ranks are compile-time constants (pct and B are
    // literals) — no float boundary can differ between engines
    def rankOf(pct: Int): Long =
      math.max(1L, math.ceil(pct / 100.0 * resamples).toLong)
    def pick(pct: Int): Column =
      max(when(col("rk") === rankOf(pct), col("m")))
    ranked.agg(pick(loPct).as("ci_lo"), pick(hiPct).as("ci_hi"))
      .crossJoin(full)
      .select(lit(n).as("n_sample"), lit(resamples.toLong).as("n_resamples"),
        col("mean_full"), col("ci_lo"), col("ci_hi"))
  }

  /** L88 — per-group percentile normalization: each row's value mapped
    * to its within-group percentile rank (rk−1)/(n−1) ∈ [0,1] — the
    * step that makes quality scores COMPARABLE across sources whose raw
    * scales differ (a FineWeb-style mixed corpus cannot threshold raw
    * scores globally; it thresholds percentiles). Deterministic: rank
    * ties break on the id, singleton groups land at 0.5, and the ratio
    * is an exact small-int division — engine-portable.
    *
    * 100 TB shape: ONE group-partitioned window (partition-parallel —
    * groups are corpus sources); no second exchange (the count rides
    * the same partitioning). Mono-group corpora belong to the L20/L70
    * two-pass global rank instead. */
  def percentileNormalize(df: DataFrame, group: Column, value: Column,
                          idCol: Column): DataFrame = {
    val w = Window.partitionBy(col("_g")).orderBy(col("_v"), col("_id"))
    df.select(group.as("_g"), value.cast("long").as("_v"), idCol.as("_id"))
      .withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_g"))))
      .select(col("_g").as("group_key"), col("_id").as("id"),
        col("_v").as("value"),
        when(col("_n") === 1, 0.5).otherwise(
          (col("_rk") - 1).cast("double") / (col("_n") - 1)).as("pct_rank"))
  }

  /** L85 — per-source data card: the one-stop corpus summary a training
    * run's documentation (and its mixture tuning) starts from — per
    * source: document/token/char counts, language diversity, dominant
    * language with its share, exact-duplicate rate (distinct content
    * digests vs rows — the L1 measure), and mean document length.
    *
    * 100 TB shape: three passes over the corpus, EACH collapsing
    * map-side to a tiny frame — a wide (source)-keyed aggregate
    * (≤ sources rows/task), a (source, lang) count for the dominant-
    * language election (rank-1 → WindowGroupLimit), and the digest-
    * distinct arm (digests shuffle, documents never — the L1 rule);
    * the three ≤ sources-row results join broadcast-small. Fusing all
    * three into one scan would shuffle digests through the wide agg's
    * exchange — strictly worse. */
  def dataCard(docs: DataFrame, sourceCol: Column, idCol: Column,
               text: Column, langCol: Column): DataFrame = {
    val base = docs.select(sourceCol.as("source"), idCol.as("doc_id"),
      langCol.as("lang"), text.as("text"))
    val wide = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextFns.tokens(col("text"))).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"))
    val topLang = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("_c").desc, col("lang"))))
      .where(col("_rk") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("_c").as("top_lang_docs"))
    val distinctDocs = base
      .select(col("source"), Dedup.contentKey(col("text")).as("ckey"))
      .groupBy(col("source"))
      .agg(countDistinct(col("ckey")).as("n_distinct"))
    wide.join(topLang, Seq("source")).join(distinctDocs, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("top_lang"), col("top_lang_docs"),
        (col("top_lang_docs").cast("double") / col("n_docs"))
          .as("top_lang_share"),
        col("n_distinct"),
        ((col("n_docs") - col("n_distinct")).cast("double") / col("n_docs"))
          .as("dup_rate"),
        (col("n_tokens").cast("double") / col("n_docs")).as("mean_doc_tokens"))
  }

  /** L74 — content-defined chunking (the FastCDC/rsync idea at token
    * grain): a chunk boundary falls AFTER every token whose hash ≡ 0
    * (mod `modulus`), so boundaries are decided by content, not
    * position — insert a sentence into a document and every chunk
    * except the one touched keeps its identity, where the fixed-width
    * blocks of [[blockDedup]] all shift and re-hash. Expected chunk
    * length is `modulus` tokens. Emits one row per chunk: (doc_id,
    * chunk_idx, chunk_start, n_toks, chunk_key, is_first) — is_first
    * marks the globally-first occurrence of the chunk's content
    * (ordered (doc_id, chunk_idx)), so `is_first = 0` rows ARE the
    * shift-resistant duplicate mass.
    *
    * 100 TB shape: boundary flags and chunk ids are one doc-keyed
    * window (partition-parallel, per-group state = one document); the
    * chunk rebuild groups by (doc, chunk) UNDER the same doc
    * partitioning (no second exchange — HashPartitioning(doc) satisfies
    * the (doc, chunk) clustering); first-occurrence election is one
    * row_number over the 32-byte content key — near-unique for real
    * corpora; boilerplate-heavy corpora concentrate one key on most
    * rows, which serializes a window in one unsplittable task — flip
    * `skewSafe` for the map-combined MIN_BY election (identical
    * winners, measured in SCALE.md r7 / graft.tools.SkewStress). */
  def cdcChunks(docs: DataFrame, idCol: Column, text: Column,
                modulus: Int, skewSafe: Boolean = false): DataFrame = {
    require(modulus >= 1, s"modulus must be >= 1, got $modulus")
    val chunks = cdcChunkFrame(docs, idCol, text, modulus)
    // First-occurrence flag — two plan shapes for two key regimes (see
    // blockDedup's election note; measured in graft.tools.SkewStress +
    // SCALE.md r7). Default: row_number window over chunk_key — ONE
    // streaming sort, optimal for the near-unique chunk keys of a real
    // corpus. skewSafe: map-combined MIN_BY winner frame + equi join
    // back — the winner aggregate collapses a 90%-hot boilerplate key
    // map-side and the join back is an AQE-splittable exchange (a
    // window's per-key sort is a single unsplittable task), at the cost
    // of re-running the chunk build for the second consumer. Both flags
    // mark the identical (doc_id, chunk_idx)-minimal row (spec-pinned).
    if (skewSafe) {
      val winners = chunks
        .groupBy(col("chunk_key"))
        .agg(min_by(struct(col("doc_id"), col("chunk_idx")),
          struct(col("doc_id"), col("chunk_idx"))).as("w"))
        .select(col("chunk_key"), col("w.doc_id").as("w_doc"),
          col("w.chunk_idx").as("w_idx"))
      chunks.join(winners, Seq("chunk_key"))
        .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
          col("n_toks"), col("chunk_key"),
          when(col("doc_id") === col("w_doc") &&
            col("chunk_idx") === col("w_idx"), 1L).otherwise(0L).as("is_first"))
    } else
      chunks.withColumn("is_first",
        when(row_number().over(Window.partitionBy(col("chunk_key"))
          .orderBy(col("doc_id"), col("chunk_idx"))) === 1, 1L).otherwise(0L))
  }

  /** The (doc, chunk) frame with content keys — shared by [[cdcChunks]]
    * and the [[cdcChunksAuto]] skew probe. */
  private def cdcChunkFrame(docs: DataFrame, idCol: Column, text: Column,
                            modulus: Int): DataFrame = {
    val toks = docs.select(idCol.as("doc_id"),
        posexplode(TextFns.tokens(text)))
      .toDF("doc_id", "pos", "tok")
      .withColumn("bnd",
        when(pmod(TextFns.hash60(col("tok")), lit(modulus.toLong)) === 0, 1L)
          .otherwise(0L))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("chunk_idx", coalesce(sum(col("bnd")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(min(col("pos")).cast("long").as("chunk_start"),
        count(lit(1)).as("n_toks"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x("tok")), " ")).as("chunk_key"))
  }

  /** [[cdcChunks]] with the automatic election ([[blockDedupAuto]]'s
    * probe applied to chunk content keys on a bounded document
    * sample). Identical output either way; only the plan shape is
    * decided. */
  def cdcChunksAuto(docs: DataFrame, idCol: Column, text: Column,
                    modulus: Int, probeDocs: Int = 512,
                    hotShare: Double = 0.25): DataFrame = {
    require(modulus >= 1, s"modulus must be >= 1, got $modulus")
    val share = hotKeyShare(
      cdcChunkFrame(docs.limit(probeDocs), idCol, text, modulus)
        .select(col("chunk_key").as("k")))
    cdcChunks(docs, idCol, text, modulus, skewSafe = share >= hotShare)
  }

  /** L78 — reciprocal-rank fusion of two quality signals (the RRF
    * recipe from hybrid retrieval, applied to curation): rank the
    * corpus independently by each signal (descending, id tie-break),
    * fuse with score = 1/(k + rank_a) + 1/(k + rank_b), keep the top
    * `topN` — the rank-robust way to combine signals with incomparable
    * scales (a length heuristic and an importance weight, BM25 and
    * cosine) without normalizing either. Integer ranks make the float
    * fusion engine-exact.
    *
    * 100 TB shape: each global rank is the q15 two-pass
    * ([[MLFeed.rankByBucket]] over equal-width score buckets) — two
    * bucketed rank passes, a co-keyed self-join on the row id, and a
    * TakeOrderedAndProject cut at topN; no unpartitioned window
    * anywhere. */
  def rrfFuse(df: DataFrame, idCol: Column, scoreA: Column, scoreB: Column,
              k: Int, topN: Int): DataFrame = {
    def rankBy(score: Column, out: String): DataFrame = {
      val base = df.select(idCol.as("id"), score.cast("long").as("s"))
      val mm = base.agg(min(col("s")).as("lo"), max(col("s")).as("hi")).head()
      val (lo, hi) = if (mm.isNullAt(0)) (0L, 0L)
        else (mm.getLong(0), mm.getLong(1))
      val nb = df.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "200").toInt
      // descending: rank 1 = highest score (negate into the ascending
      // two-pass machinery); id tie-break keeps it total
      val key = lit(hi) - col("s")
      val bucket = least(greatest((key * nb / (hi - lo + 1)).cast("int"),
        lit(0)), lit(nb - 1))
      MLFeed.rankByBucket(base.withColumn("_key", key), bucket,
          Seq(col("_key"), col("id")))
        .select(col("id"), col("_rank").as(out))
    }
    rankBy(scoreA, "rank_a").join(rankBy(scoreB, "rank_b"), Seq("id"))
      .select(col("id"), col("rank_a"), col("rank_b"),
        (lit(1.0) / (lit(k) + col("rank_a"))
          + lit(1.0) / (lit(k) + col("rank_b"))).as("rrf"))
      .orderBy(col("rrf").desc, col("id")).limit(topN)
  }

  /** L76 — per-group exact quantiles (discrete: the element at rank
    * ceil(q·n), never an interpolated value): p50/p90/p99 of an integer
    * measure per group — the per-source length/quality profile that
    * `approx_percentile` cannot give a hash-stable answer for. Exact
    * and engine-portable because every output is an actual input value
    * selected by integer rank.
    *
    * 100 TB shape: ONE group-partitioned window (partition-parallel;
    * per-group state is the group's sort — groups here are corpus
    * sources, i.e. dozens); the quantile election is a conditional
    * aggregate over the ranked frame under the same partitioning. For
    * a single-group corpus use the L20 global cut-points instead (that
    * operator's two-pass bucketed rank exists precisely because a
    * mono-key window cannot parallelize). */
  def groupQuantiles(df: DataFrame, group: Column, value: Column,
                     idCol: Column): DataFrame = {
    val w = Window.partitionBy(col("_g")).orderBy(col("_v"), col("_id"))
    val ranked = df.select(group.as("_g"), value.cast("long").as("_v"),
        idCol.as("_id"))
      .withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_g"))))
    def pick(q: Double): Column =
      max(when(col("_rk") === greatest(lit(1L),
        ceil(lit(q) * col("_n")).cast("long")), col("_v")))
    ranked.groupBy(col("_g").as("group_key"))
      .agg(count(lit(1)).as("n"), pick(0.5).as("p50"),
        pick(0.9).as("p90"), pick(0.99).as("p99"))
  }

  /** L97 — mergeable histogram-quantile sketch + error audit: the
    * 100 TB companion of the exact-quantile family (L20/L76). An
    * equal-width `bins`-bin histogram over [min, max] is the simplest
    * MERGEABLE quantile sketch (per-partition counts just add — the
    * same property t-digest/GK buy with far more machinery), with the
    * hard guarantee |estimate − exact| ≤ bin width. Returns one row per
    * requested percentile: the sketch estimate (upper edge of the bin
    * holding the target rank), the exact rank-ceil value, the absolute
    * error, and the width bound the error must respect — the audit that
    * decides whether the sketch can replace the exact pass on the next
    * corpus.
    *
    * 100 TB shape: the sketch path is two scalar-merge passes (min/max/
    * count, then ≤ bins map-combined counts); the EXACT arm exists for
    * the audit only (like q58's exact-distinct witness — production
    * drops it) and runs on the distinct-VALUE frame — value-domain-
    * bounded (a length histogram), not corpus-bounded; the q132
    * precedent. `n`/`lo`/`hi` are driver scalars (three doubles — the
    * codebook-collect precedent). */
  def histogramQuantiles(df: DataFrame, value: Column, pcts: Seq[Int],
                         bins: Int): DataFrame = {
    require(bins >= 1 && pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "histogramQuantiles needs bins >= 1 and percentiles in [1, 100]")
    val spark = df.sparkSession
    import spark.implicits._
    // NOT checkpointed: vals is corpus-sized (the localCheckpoint policy
    // pins sublinear frames only) — its three consumers are each one
    // column-pruned scan of a single double column.
    val vals = df.select(value.cast("double").as("v"))
      .where(col("v").isNotNull)
    val mm = vals.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    if (mm.isNullAt(0))
      return Seq.empty[(Long, Long, Double, Double, Double, Double, Double)]
        .toDF("pct", "n", "lo", "hi", "est", "exact", "abs_err")
        .withColumn("bound", lit(0.0))
    val (lo, hi, n) = (mm.getDouble(0), mm.getDouble(1), mm.getLong(2))
    val width = (hi - lo) / bins
    val targets = pcts.map(p =>
      (p.toLong, math.max(1L, math.ceil(p / 100.0 * n).toLong)))
      .toDF("pct", "target")
    val bin =
      if (width == 0.0) lit(0L)
      else least(floor((col("v") - lo) / width).cast("long"), lit(bins - 1L))
    val hist = vals.groupBy(bin.as("bin")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over( // ≤ bins rows: tiny frame
        Window.orderBy(col("bin"))))
    val est = targets.join(hist, col("cum") >= col("target"))
      .groupBy(col("pct"), col("target")).agg(min(col("bin")).as("ebin"))
      .select(col("pct"), col("target"),
        (lit(lo) + (col("ebin") + 1) * lit(width)).as("est"))
    val distCum = vals.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over( // value-domain-bounded
        Window.orderBy(col("v"))))
    val exact = targets.join(distCum, col("cum") >= col("target"))
      .groupBy(col("pct")).agg(min(col("v")).as("exact"))
    est.join(exact, Seq("pct"))
      .select(col("pct"), lit(n).as("n"), lit(lo).as("lo"), lit(hi).as("hi"),
        col("est"), col("exact"), abs(col("est") - col("exact")).as("abs_err"),
        lit(if (width == 0.0) 0.0 else width).as("bound"))
  }

  /** L98 — precision/recall threshold sweep: one PR point per DISTINCT
    * score threshold t — precision/recall/F1 of the rule "accept when
    * score ≥ t" — the curve a quality-filter threshold is chosen from
    * (the operating-point companion of [[rocAuc]]'s single summary
    * number). Exact integer TP/FP/FN at every point; thresholds are the
    * observed score values, the standard PR-curve definition.
    *
    * CONTRACT: `score` must be a quantized / bounded-cardinality column
    * (a bucketed quality score, a capped length — like the DSIR buckets
    * or q109's bins). The sweep frame is one row per distinct score, so
    * the cumulative windows are value-domain-bounded, not
    * corpus-bounded (the q132 ECDF precedent); the corpus itself is
    * touched by ONE map-combined groupBy. */
  def prCurve(df: DataFrame, score: Column, label: Column): DataFrame = {
    val base = df.select(score.cast("long").as("s"),
      label.cast("long").as("y"))
    val perScore = base.groupBy(col("s"))
      .agg(sum(col("y")).as("pos"), count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("s").desc) // distinct-score frame: bounded
    val totPos = sum(col("pos")).over(
      Window.partitionBy(lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    perScore
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("n_ge", sum(col("cnt")).over(w))
      .withColumn("p_all", totPos)
      .select(col("s").as("threshold"), col("tp"),
        (col("n_ge") - col("tp")).as("fp"),
        (col("p_all") - col("tp")).as("fn"),
        (col("tp").cast("double") / col("n_ge")).as("prec"),
        (col("tp").cast("double") / col("p_all")).as("recall"))
      .withColumn("f1",
        when(col("prec") + col("recall") > 0.0,
          lit(2.0) * col("prec") * col("recall")
            / (col("prec") + col("recall"))).otherwise(lit(0.0)))
  }
}
