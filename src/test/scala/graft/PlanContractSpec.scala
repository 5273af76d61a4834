package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan contracts for the load-bearing queries: the invariants
  * PLANS.md narrates, pinned as tests so a plan regression (lost
  * broadcast, new unpartitioned window, fact-side shuffle, codegen
  * fallback on the similarity kernel) fails the suite instead of only
  * showing up as a slower bench. Plans are built at sf0.001 — plan
  * SHAPE is scale-independent for these queries (broadcast thresholds
  * are generous vs the dimension sizes at any SF the driver uses).
  */
class PlanContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()

  test("q02 decode join: dimension broadcast, no fact-side exchange before the join") {
    val p = plan("q02_decode_join")
    assert(p.contains("BroadcastHashJoin"), p)
    // the only Exchange carries pre-aggregated partials, keyed by brand
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("p_brand"), exchanges.mkString("\n"))
  }

  test("q07 tumbling tiling: exactly one shuffle (the patch aggregation)") {
    val p = plan("q07_tile_tumbling")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("no data-bearing SinglePartition exchange in the driver surface") {
    // An unpartitioned window/sort funnels all rows through one task and
    // compiles to `Exchange SinglePartition` — the scale hazard the
    // two-pass rank machinery exists to avoid, so its appearance is
    // guilty until proven tiny. The known-tiny exemptions: the
    // per-bucket count frames of the global-rank helpers (numBuckets
    // rows) in q14/q15/q37, and q36's scalar dims probe (one row).
    val tinyByDesign = Set("q14_exact_split", "q15_batches", "q37_catalog",
      "q36_patch_matrix",
      // q129: every window runs over the FIXED bootstrap sample (500
      // rows by contract) or the B-row means frame — sample-bounded,
      // not corpus-bounded
      "q129_bootstrap_ci",
      // q130: the prefix windows run over the TIME-BOUNDED bucket frame
      // (range/bucketSec rows — a year of hourly buckets is 8760 rows
      // regardless of event volume)
      "q130_cusum_alarms",
      // q132: the ECDF prefix windows run over the merged per-VALUE
      // frame — value-domain-bounded (a length histogram), not corpus
      "q132_ks_statistic",
      // q137: the sketch cum window runs over the ≤ bins histogram
      // frame; the exact-audit window over the distinct-VALUE frame
      // (value-domain-bounded, the q132 precedent; production drops
      // the audit arm)
      "q137_hist_quantiles",
      // q138: the PR sweep windows run over the distinct-SCORE frame —
      // bounded by the score-quantization contract, not the corpus
      "q138_pr_curve",
      // q158: the allocation windows (grand total, remainder rank) run
      // over the per-stratum COUNTS frame — |strata| rows regardless of
      // corpus size; the corpus-sized selection rank is stratum-
      // partitioned and WindowGroupLimit-capped (dedicated test below)
      "q158_proportional_sample")
    // Derived from the ONE shared classification (ADVICE r7): a second
    // hand-maintained list here drifted from QuerySets.sideEffecting and
    // made the sweep execute q142's parquet write / q146's codebook save
    // as a hidden side effect of plan(). The side-effecting queries have
    // dedicated plan tests below where the side effect is intentional.
    SparkEntry.queries.keys.filterNot(QuerySets.sideEffecting)
      .foreach { name =>
        val lines = plan(name).linesIterator.toIndexedSeq
        lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
          .foreach { case (l, i) =>
            // a keyless partial aggregate below the exchange = scalar
            // global-agg merge (a handful of rows) — always fine.
            val scalarMerge = lines.lift(i + 1)
              .exists(_.contains("HashAggregate(keys=[], functions=[partial_"))
            assert(scalarMerge || tinyByDesign(name),
              s"$name has a data-bearing SinglePartition exchange: $l")
          }
      }
  }

  test("q28 top-k: WindowGroupLimit pushes k below the shuffle; probes broadcast") {
    val p = plan("q28_cosine_topk")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("vec_dot"), p) // the native kernel, not the HOF fold
  }

  test("q42 scene source: pruned read schema and pushed filters reach the BatchScan") {
    val p = plan("q42_scene_source")
    assert(p.contains("pruned=[scene,line,polygon_id,distance_map]"), p)
    assert(p.contains("In(scene"), p)
  }

  test("canvas generation parallelizes within a scene (exchange between the explodes)") {
    // one row's generator output cannot be split across tasks: without
    // the line-band repartition, a single scene's whole H×W canvas is
    // generated inside ONE task (VERDICT r3 #2)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val scenes = Seq(("s0", 40, 30)).toDF("scene", "el", "es")
    val pixels = Seq(("s0", 1, 2, 5.0)).toDF("scene", "line", "sample", "value")
    val out = graft.operators.Reconstruct.onCanvas(pixels, scenes, col("el"), col("es"))
    assert(out.count() == 1200)
    val lines = out.queryExecution.executedPlan.toString.linesIterator.toIndexedSeq
    val gens = lines.zipWithIndex.filter(_._1.contains("Generate explode")).map(_._2)
    val exs = lines.zipWithIndex.filter(_._1.contains("Exchange")).map(_._2)
    assert(gens.size == 2, lines.mkString("\n"))
    assert(exs.exists(i => gens.min < i && i < gens.max), lines.mkString("\n"))

    val padded = graft.operators.GridOps.padConstant(
      pixels, scenes, col("el"), col("es"),
      org.apache.spark.sql.functions.lit(1), org.apache.spark.sql.functions.lit(1),
      Seq("value"), 0.0)
    assert(padded.count() == 1200)
    val pl = padded.queryExecution.executedPlan.toString.linesIterator.toIndexedSeq
    val pg = pl.zipWithIndex.filter(_._1.contains("Generate explode")).map(_._2)
    val pe = pl.zipWithIndex.filter(_._1.contains("Exchange")).map(_._2)
    assert(pg.size == 2 && pe.exists(i => pg.min < i && i < pg.max), pl.mkString("\n"))
  }

  test("q27 jaccard: pure map+filter over the memoized pair-stats checkpoint") {
    // r8 shape (VERDICT r7 #3): the capped index, pair fan-out and size
    // joins all run ONCE inside Dedup.cappedPostingCounts (memoized per
    // run, shared with q139); the consumer plan is a project+filter
    // over the materialized pair frame — zero exchanges, zero windows,
    // zero parquet scans of documents.
    val df = SparkEntry.queries("q27_ngram_jaccard")(spark, dir)
    df.collect() // materialize so the localCheckpoint plan is final
    val p = df.queryExecution.executedPlan.toString
    val lines = p.linesIterator.toIndexedSeq
    assert(!lines.exists(_.contains("Window")), p)
    assert(!lines.exists(_.contains("SortMergeJoin")), p)
    assert(lines.exists(_.contains("Scan ExistingRDD")), p)
    assert(!lines.exists(_.contains("documents.parquet")),
      s"documents must be read only behind the checkpoint:\n$p")
    assert(!lines.exists(_.contains("Exchange")),
      s"the consumer must not re-shuffle the memoized pair frame:\n$p")
  }

  test("q40 ivf: cell assignment is map-side — no exchange carries the corpus") {
    val p = plan("q40_ann_ivf")
    // the native argmax kernel, not a crossJoin+row_number assignment
    assert(p.contains("nearest_cells"), p)
    // the only hash exchanges ship candidate pairs for the per-probe rank
    // window; nothing keyed on vec_id (the r3 scale-killer) may remain
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(_.contains("probe_id")), ex.mkString("\n"))
  }

  test("q01 pricing agg: decimal sums lower to the native sum128 kernel") {
    val p = plan("q01_pricing_agg")
    // the BigDecimal-buffer built-in sum is the 4-14 µs/row scale
    // constant Sum128 exists to remove (SCALE.md) — it must not come back
    assert(p.contains("sum128"), p)
    assert(!p.contains("sum(cast(l_extendedprice"), p)
  }

  test("q76 bigram lift: distributed top-K; vocabulary joins broadcast") {
    val p = plan("q76_bigram_lift")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q77 mixture schedule: per-source windows only; distributed head") {
    val p = plan("q77_mixture_schedule")
    // the per-source sequence must stay a source-partitioned window —
    // a global rank here would funnel the corpus through one task
    assert(p.contains("Window") && p.contains("partitionBy" ) ||
      p.linesIterator.exists(l => l.contains("windowspecdefinition(source")), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q44 salted agg: partial exchange keys on (kk, _salt)") {
    val p = plan("q44_skew_salted")
    assert(p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("_salt")), p)
  }

  test("q48 stratified sample: a pure map-side filter — zero exchanges") {
    val p = plan("q48_stratified_sample")
    assert(!p.contains("Exchange"), p)
  }

  test("q50 curation: the keeper window is the only exchange (keyed on ckey)") {
    val p = plan("q50_curate_corpus")
    val ex = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(ex.nonEmpty && ex.forall(_.contains("ckey")), ex.mkString("\n"))
  }

  test("q57 bm25: ONE corpus scan — tf, idf and length scalars all derive " +
      "from the checkpointed slim frame") {
    val p = plan("q57_bm25")
    val lines = p.linesIterator.toIndexedSeq
    // the documents parquet is scanned once, at slim-frame
    // materialization (doc_id, dl, query-term-filtered toks — the
    // IN(terms) cut runs inside that scan task); the final plan reads
    // ONLY the checkpoint — no file scan of the corpus anywhere
    assert(!p.contains("FileScan") && !p.contains("documents"), p)
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    // tf exchange keys on (doc_id, tok)
    assert(lines.exists(l => l.contains("Exchange hashpartitioning") &&
      l.contains("doc_id") && l.contains("tok")), p)
    // idf table and corpus scalars are broadcast, never shuffled onto the fact
    assert(lines.count(_.contains("BroadcastExchange")) >= 2, p)
  }

  test("q58 hll: register exchange keys on (event_type, bucket) — never raw rows") {
    val p = plan("q58_hll_distinct")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    // every exchange is keyed on event_type (register/merge/witness stages);
    // the register stage pre-combines map-side so at most types×256 rows
    // per task cross the wire
    assert(ex.nonEmpty && ex.forall(_.contains("event_type")), ex.mkString("\n"))
    // map-side partial max of the register rank below the first exchange
    assert(p.contains("partial_max(rho"), p)
  }

  test("q58 hll production mode: no distinct aggregation, no corpus-sized state") {
    // witness OFF = production: the exact-distinct companion column (the
    // gate's only corpus-sized aggregation) must vanish entirely — no
    // count(distinct), no Expand, and the witness join with it
    val prod = graft.queries.SceneQueries.hllDistinct(
      graft.Tables.events(spark, dir), withExactWitness = false)
    val p = prod.queryExecution.executedPlan.toString()
    assert(!p.toLowerCase.contains("count(distinct"), p)
    assert(!p.contains("Expand"), p)
    assert(!p.toLowerCase.contains("join"), p)
    prod.columns.toSeq shouldBe Seq(
      "event_type", "n_buckets_hit", "sum_scaled", "est_distinct")
    // gate mode still carries the witness (sanity that the flag flips it)
    val gate = plan("q58_hll_distinct").toLowerCase
    assert(gate.contains("count(distinct") || gate.contains("expand"), gate)
  }

  test("q59 as-of: one user-keyed window sort, no row-multiplying join") {
    val p = plan("q59_asof_join")
    val lines = p.linesIterator.toIndexedSeq
    // exactly two hash exchanges: the purchase (user, ts) dedup and the
    // user-keyed carry window — and no join operator at all (the carry
    // formulation replaces the range self-join)
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 2, p)
    assert(!p.contains("Join"), p)
    assert(lines.count(_.contains("Window")) == 1, p)
  }

  test("q60 lloyd: assignment inside the scan stage; one map-combined exchange") {
    val p = plan("q60_lloyd_refine")
    val lines = p.linesIterator.toIndexedSeq
    // r7: the growing-codebook assignment is the two-level kernel
    // (hierarchical-IVF; ~O(sqrt(C)*dim) per row), still map-side
    assert(p.contains("nearest_cell_two_level"), p)
    // a single exchange, keyed (cell, d), fed by a partial aggregate —
    // the corpus is never shuffled raw and never row-multiplied by cells
    val ex = lines.filter(_.contains("Exchange hashpartitioning"))
    assert(ex.size == 1 && ex.head.contains("cell"), ex.mkString("\n"))
    assert(lines.exists(_.contains("partial_sum(qx")), p)
  }

  test("q61 chunking: a pure map-side generator — zero exchanges") {
    val p = plan("q61_chunk_windows")
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q62 vocab: global top-K is TakeOrdered, never a single-partition sort") {
    val p = plan("q62_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q63 rollup: one Expand feeding one map-combined aggregate") {
    val p = plan("q63_rollup_stats")
    val lines = p.linesIterator.toIndexedSeq
    assert(lines.count(_.contains("Expand [")) == 1, p)
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("q64 quantize: stats agg map-combined and broadcast back — corpus never shuffles") {
    val p = plan("q64_quantize_embed")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    // the only hash exchange is the ≤ dim-row stats aggregate, keyed on d
    assert(ex.size == 1 && ex.head.contains("(d#"), ex.mkString("\n"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q66 recall: quantized corpus comes off the scan — no vec_id repack exchange") {
    val p = plan("q66_quantized_recall")
    assert(p.contains("dequantize_grid"), p)
    // the explode→stats-join→groupBy repack this kernel replaced put the
    // whole corpus through a (vec_id)-keyed exchange
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.forall(!_.contains("vec_id#")), ex.mkString("\n"))
  }

  test("q79 pii: pure per-row regex column work — zero exchanges") {
    val p = plan("q79_pii_scrub")
    assert(!p.contains("Exchange"), p)
  }

  test("q80 unigram LM: corpus never shuffles — exchanges only on tok/doc_id, LM broadcast") {
    val p = plan("q80_unigram_nll")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    // the vocabulary count (tok) and the per-doc aggregate (doc_id) are
    // the only hash exchanges; the token stream reaches the doc agg via
    // a BroadcastHashJoin against the vocabulary-sized log-prob frame
    assert(ex.nonEmpty && ex.forall(l => l.contains("tok#") || l.contains("doc_id#")),
      ex.mkString("\n"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q81 dup spans: digests shuffle on h, islands window on doc_id — text never shuffles") {
    val p = plan("q81_dup_spans")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(l => l.contains("h#") || l.contains("doc_id#")),
      ex.mkString("\n"))
  }

  test("q83 cohort: every exchange keys on the user/pair/cohort grain") {
    val p = plan("q83_cohort_retention")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    // grains: (user_id, wk) distinct, user_id min-agg/join, and the
    // final (c_wk, offset) count — offset prints as _groupingexpression
    assert(ex.nonEmpty && ex.forall(l =>
      l.contains("user_id#") || l.contains("c_wk#")), ex.mkString("\n"))
  }

  test("q84 rolling window: ONE user-keyed exchange feeds the range frame") {
    val p = plan("q84_rolling_window")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.size == 1 && ex.head.contains("user_id#"), ex.mkString("\n"))
    assert(p.contains("RangeFrame"), p)
  }

  test("q85 textrank: rank frame broadcasts onto edges; exchanges on graph keys only") {
    val p = plan("q85_textrank")
    assert(p.contains("BroadcastHashJoin"), p)
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    // edge-weight/out-weight/contribution aggregates: u / (u,v) / v keys
    assert(ex.nonEmpty && ex.forall(l => l.contains("u#") || l.contains("v#")),
      ex.mkString("\n"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q86 label purity: centroids broadcast; corpus shuffles only pre-combined per-id rows") {
    val p = plan("q86_label_purity")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("vec_dot"), p)
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    // (c_label, d) centroid partials (≤ labels×dim rows) and the
    // (id, label) margin pivot (map-combined to ≤ one row per vector)
    assert(ex.nonEmpty && ex.forall(l =>
      l.contains("c_label#") || l.contains("id#")), ex.mkString("\n"))
  }

  test("q88 bloom decontam: subquery sketch probes the train scan stage") {
    val p = plan("q88_bloom_decontam")
    // the sketch is a one-row scalar subquery, not an inlined hex literal
    assert(p.contains("might_contain(Subquery subquery"), p.take(2000))
    assert(p.length < 200000, s"plan bloat: ${p.length} chars")
    // the probe sits BELOW the first exchange of the train branch: every
    // might_contain line is deeper in the tree than any exchange line
    // that follows it upward — cheap structural proxy: the filter lines
    // mentioning might_contain must not be root-level (indented), and at
    // least one exchange exists above (the confirm join / final agg).
    val lines = p.linesIterator.toIndexedSeq
    val probeIdx = lines.indexWhere(_.contains("might_contain"))
    assert(probeIdx > 0, "no might_contain in plan")
    assert(lines.take(probeIdx).exists(_.contains("Exchange")),
      "bloom probe must be below the shuffles it prunes")
  }

  test("q92 hard negatives: rank-1 pushes below the anchor shuffle; exchanges on bucket/anchor only") {
    val p = plan("q92_hard_negatives")
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(l =>
      l.contains("bucket#") || l.contains("vec_id#")), ex.mkString("\n"))
  }

  test("q95 boilerplate: boiler set broadcasts back; gram exchanges on (source, h)/doc_id only") {
    val p = plan("q95_boilerplate")
    // the coverage pass must re-meet the gram stream via broadcast —
    // re-shuffling gram occurrences for it is the regression this pins
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(l =>
      l.contains("h#") || l.contains("doc_id#") || l.contains("source#")),
      ex.mkString("\n"))
  }

  test("q97 trajectories: ONE user-keyed exchange (session agg state)") {
    val p = plan("q97_trajectories")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.size == 1 && ex.head.contains("user_id"), ex.mkString("\n"))
  }

  test("q98 effective tokens: digest-keyed exchanges only (plus the source rollup)") {
    val p = plan("q98_effective_tokens")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(l =>
      l.contains("ckey#") || l.contains("source#")), ex.mkString("\n"))
  }

  test("q100 cluster metrics: map-side assignment, broadcast codebook, one cell exchange") {
    val p = plan("q100_cluster_metrics")
    assert(p.contains("nearest_cells"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the only hash exchange carries (cell, count, sum) partials
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.size == 1 && ex.head.contains("cell#"), ex.mkString("\n"))
  }

  test("q101 truncation recall: both searches broadcast probes, k below the shuffle") {
    val p = plan("q101_trunc_recall")
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(p.contains("vec_dot"), p.take(3000))
    // rank/intersection exchanges key on probe_id; the corpus never
    // shuffles by vec_id
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(l =>
      l.contains("probe_id#") || l.contains("cand_id#")), ex.mkString("\n"))
  }

  test("q102 leakage split: pure map-side hash math — zero exchanges") {
    val p = plan("q102_leakage_split")
    assert(!p.contains("Exchange"), p)
  }

  test("q103 overlap matrix: shingle/source exchanges only; size frames broadcast") {
    val p = plan("q103_source_overlap")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty && ex.forall(l =>
      l.contains("h#") || l.contains("source")), ex.mkString("\n"))
  }

  test("q135 pq encode: codes + recon are map-side — no exchange at all") {
    // per-subspace NearestCells kernels + literal-map recon lookups run
    // inside the scan stage; nothing about PQ encoding shuffles
    val p = plan("q135_pq_encode")
    assert(p.contains("nearest_cells"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q136/q145 pq search: probes broadcast, top-k is WindowGroupLimit") {
    for (q <- Seq("q136_pq_recall", "q145_ivfpq_recall")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q:\n$p")
      assert(p.contains("BroadcastExchange"), s"$q:\n$p")
      // the scored side never shuffles raw by candidate: the only hash
      // exchanges are the tiny per-probe hit aggregates / final joins
      assert(p.contains("vec_dot"), s"$q:\n$p")
    }
  }

  test("q139 containment: the q27 consumer shape — map+filter over the shared pair-stats checkpoint") {
    val p = plan("q139_containment")
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the memoized pair-stats frame (built once, shared with q27) is an
    // RDD scan; the consumer adds only projection + threshold filter
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Exchange"),
      s"the consumer must not re-shuffle the memoized pair frame:\n$p")
  }

  test("q142 shard sink: the manifest reads the written files with shard partition columns") {
    val p = plan("q142_shard_sink")
    // the read-back scan carries the shard partition column (proves the
    // manifest derives from the physical layout, not the input plan)
    assert(p.contains("Scan parquet") && p.contains("shard"), p)
  }

  test("q143 pack spans: one stratum window + a map-side generator; no second exchange") {
    val p = plan("q143_pack_spans")
    assert(p.contains("Generate explode"), p)
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.size == 1 && ex.head.contains("lang"), ex.mkString("\n"))
  }

  test("q155 range join: an equi hash join on (key, bucket) — never a " +
      "nested loop, and the containment filter stays inside the join stage") {
    val p = plan("q155_range_join")
    // the whole point of the binned rewrite: a raw inequality join
    // plans as BroadcastNestedLoopJoin (build-side scan per probe row)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    // the equi keys carry the bucket column
    assert(p.contains("_rj_b"), p)
  }

  test("q156 point-in-time join: the SCD2 dim + as-of carry — no " +
      "row-multiplying validity join, one carry window") {
    val p = plan("q156_pit_join")
    val lines = p.linesIterator.toIndexedSeq
    // no join operator anywhere: the validity match is the as-of carry
    assert(!p.contains("Join"), p)
    // exchanges: purchase (user, ts) dedup + scd2 user window + carry
    // union window all hash-keyed; no SinglePartition anywhere
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(lines.count(_.contains("Exchange hashpartitioning")) <= 3, p)
  }

  test("q160 interval overlap: equi hash join, both sides exploded, " +
      "no dedup aggregate after the join (first-shared-bucket law)") {
    val p = plan("q160_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    // the uniqueness law means no distinct/dedup pass may follow the
    // join: any aggregate above it would betray pair multiplication
    val lines = p.linesIterator.toIndexedSeq
    val joinAt = lines.indexWhere(l => l.contains("Join"))
    assert(lines.take(joinAt).forall(l => !l.contains("HashAggregate")), p)
  }

  test("q161 incremental merge: the full-outer join reuses the " +
      "aggregation partitioning — two exchanges for the whole pipeline") {
    val p = plan("q161_incremental_agg")
    val lines = p.linesIterator.toIndexedSeq
    // one user_id exchange per half; the merge join must NOT add a
    // third (both sides already hash-partitioned by the join key)
    val ex = lines.filter(_.contains("Exchange hashpartitioning"))
    assert(ex.size == 2 && ex.forall(_.contains("user_id")),
      ex.mkString("\n"))
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
  }

  test("q162 sketch merge: corpus leaves the scan stage as registers " +
      "(map-side partial max), never as raw rows") {
    val p = plan("q162_hll_merge")
    val lines = p.linesIterator.toIndexedSeq
    // the first exchange must sit above a partial max aggregate — the
    // corpus-sized frame never shuffles
    val firstEx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(firstEx >= 0, p)
    assert(lines.drop(firstEx).exists(_.contains("partial_max")), p)
    assert(!p.contains("count(distinct"), p)
  }

  test("q158 proportional sample: WindowGroupLimit caps the stratum " +
      "rank; the quota joins as a broadcast") {
    val p = plan("q158_proportional_sample")
    // the literal `total` cap before the quota filter is what lets the
    // rank window prune to per-task top-N heaps instead of a full
    // stratum sort output
    assert(p.contains("WindowGroupLimit"), p)
    // the strata-bounded quota frame must broadcast, never shuffle the
    // corpus side for the join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q167 flagship: exchanges key only on the stage keys; NLJs are " +
      "broadcast-bounded; every SinglePartition is a scalar/sketch merge") {
    // r16: the production plan is SEVERED at the chunk frame
    // (localCheckpoint before rangeShards) so the layout fan-out plans
    // over an RDD leaf instead of 6 copies of the curation DAG. The
    // upstream shuffle-key budget is pinned on the un-cut plan (conf
    // escape hatch — identical DAG, no checkpoint); the cut plan must
    // expose ONLY the layout keys.
    spark.conf.set("spark.graft.curation.cut", "false")
    val p = try plan("q167_curation_flagship")
      finally spark.conf.unset("spark.graft.curation.cut")
    // The printed tree re-expands shared subtrees (keepers feeds four
    // consumers), so RAW exchange-line counts are meaningless; the
    // semantic contract is the SET of shuffle keys — the pipeline may
    // shuffle only on: ckey (exact dedup window), doc_id (near-dup
    // verify + anti joins), h (shingle/LSH bucket machinery), source
    // (pack window + chunk agg), sched_vt + _rs_b + shard (the
    // range-shard layout). A corpus-sized shuffle on anything else —
    // text, toks, an accidental global sort — breaks the budget.
    val keyRe = "hashpartitioning\\(([A-Za-z_0-9#]+)".r
    val keys = keyRe.findAllMatchIn(p)
      .map(_.group(1).replaceAll("#[0-9]+L?", "")).toSet
    assert(keys == Set("ckey", "doc_id", "h", "source", "sched_vt",
      "_rs_b", "shard"), s"unexpected shuffle keys: $keys")
    // the severed production plan: layout keys only, nothing upstream
    // leaks past the checkpoint
    val pCut = plan("q167_curation_flagship")
    val keysCut = keyRe.findAllMatchIn(pCut)
      .map(_.group(1).replaceAll("#[0-9]+L?", "")).toSet
    assert(keysCut == Set("sched_vt", "_rs_b", "shard"),
      s"unexpected post-cut shuffle keys: $keysCut")
    // rangeShards' containment join and scalar-frame cross joins are
    // the only nested-loop joins, and all broadcast the bounded side
    val lines = p.linesIterator.toIndexedSeq
    lines.filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
      assert(l.contains("BuildRight") || l.contains("BuildLeft"), l)
    }
    // every SinglePartition exchange merges keyless partials (scalar
    // min/max frames, bloom sketch) — never data rows (the global
    // sweep above also enforces this; restated here so the flagship's
    // contract is self-contained)
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (l, i) =>
        assert(lines.lift(i + 1).exists(
          _.contains("HashAggregate(keys=[], functions=[partial_")), l)
      }
  }

  test("q184 crawl flagship: two real-key exchanges, the robots NLJ " +
      "broadcasts a bounded rule frame, the scan reads only doc_id") {
    val p = plan("q184_crawl_flagship")
    // shuffle keys: the record-grain verdict aggregate and the
    // per-host politeness window — nothing else (never text/uri/path)
    val keyRe = "hashpartitioning\\(([A-Za-z_0-9#,. ]+?)\\, [0-9]+\\)".r
    val keySets = keyRe.findAllMatchIn(p)
      .map(_.group(1).replaceAll("#[0-9]+L?", "")).toSet
    assert(keySets == Set("media_id, rec_idx, host, content_len", "host"),
      s"unexpected shuffle keys: $keySets")
    // the robots rules join is the documented broadcast-bounded NLJ
    val lines = p.linesIterator.toIndexedSeq
    val nljs = lines.filter(_.contains("BroadcastNestedLoopJoin"))
    assert(nljs.nonEmpty && nljs.forall(l =>
      l.contains("BuildRight") && l.contains("robots_match")), nljs)
    // payloads never reach the plan: the parquet scan projects ONLY
    // doc_id (records synthesize + reduce inside mapPartitions)
    assert(lines.exists(_.contains("ReadSchema: struct<doc_id:bigint>")), p)
  }

  test("q199 bytes→shards: the whole crawl+curation chain keeps the " +
      "q167 shuffle-key budget; robots NLJ broadcasts; codecs stay map-side") {
    // un-cut plan (see the q167 test): full-chain shuffle-key budget
    spark.conf.set("spark.graft.curation.cut", "false")
    val p = try plan("q199_bytes_to_shards")
      finally spark.conf.unset("spark.graft.curation.cut")
    // the ONLY allowed shuffle keys are q167's stage keys (the robots
    // verdict aggregate lands on doc_id, already in the budget): a
    // corpus-sized shuffle on text/uri/path — or any exchange before
    // the WET text leaves the codec seam — breaks the contract
    val keyRe = "hashpartitioning\\(([A-Za-z_0-9#]+)".r
    val keys = keyRe.findAllMatchIn(p)
      .map(_.group(1).replaceAll("#[0-9]+L?", "")).toSet
    assert(keys == Set("ckey", "doc_id", "h", "source", "sched_vt",
      "_rs_b", "shard"), s"unexpected shuffle keys: $keys")
    // the severed production plan exposes only the layout keys
    val pCut = plan("q199_bytes_to_shards")
    val keysCut = keyRe.findAllMatchIn(pCut)
      .map(_.group(1).replaceAll("#[0-9]+L?", "")).toSet
    assert(keysCut == Set("sched_vt", "_rs_b", "shard"),
      s"unexpected post-cut shuffle keys: $keysCut")
    val lines = p.linesIterator.toIndexedSeq
    // the robots rules join is the documented broadcast-bounded NLJ
    val nljs = lines.filter(_.contains("BroadcastNestedLoopJoin"))
    assert(nljs.exists(_.contains("robots_match")), nljs)
    nljs.foreach { l =>
      assert(l.contains("BuildRight") || l.contains("BuildLeft"), l)
    }
    // every SinglePartition exchange merges keyless partials only
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (l, i) =>
        assert(lines.lift(i + 1).exists(
          _.contains("HashAggregate(keys=[], functions=[partial_")), l)
      }
  }

  test("connectedComponents output reads the checkpoint, not its input lineage") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (3L, 2L)).toDF("u", "v")
      .withColumn("u", org.apache.spark.sql.functions.col("u") * 1)
    val out = graft.operators.Dedup.connectedComponents(edges)
    val p = out.queryExecution.executedPlan.toString
    // the iterative rounds are severed by localCheckpoint: the returned
    // frame scans the materialized RDD and must not replay the edge
    // derivation (here a LocalTableScan; in q47 the whole LSH pipeline)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("LocalTableScan"), p)
  }
}
