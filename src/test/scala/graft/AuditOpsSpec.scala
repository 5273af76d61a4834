package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Similarity}

/** The round-6 audit family: ROC-AUC with tie correction
  * ([[Curation.rocAuc]]), reliability bins ([[Curation.calibrationReport]]),
  * cluster-agreement ARI ([[Similarity.clusterAgreement]]), and DSIR
  * importance weights ([[Curation.importanceWeights]]) — each pinned
  * against a hand-computed fixture. */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc: tied scores take average ranks (hand-computed U)") {
    // scores 1,2,2,3 / labels 0,0,1,1. Ranks 1, 2.5, 2.5, 4.
    // U = (2.5 + 4) - 2*3/2 = 3.5 -> u2 = 7, AUC = 3.5/(2*2) = 0.875.
    val df = Seq((1L, 0), (2L, 0), (2L, 1), (3L, 1))
      .toDF("s", "y").withColumn("id", monotonically_increasing_id())
    val r = Curation.rocAuc(df, col("s"), col("y"), col("id")).head()
    r.getLong(0) shouldBe 2L // n_pos
    r.getLong(1) shouldBe 2L // n_neg
    r.getLong(2) shouldBe 7L // u2 is BIGINT output (PortabilitySpec contract)
    r.getDouble(3) shouldBe 0.875 +- 1e-12
  }

  test("rocAuc: perfect and inverted separation hit 1.0 and 0.0") {
    val perfect = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1))
      .toDF("s", "y").withColumn("id", monotonically_increasing_id())
    Curation.rocAuc(perfect, col("s"), col("y"), col("id"))
      .head().getDouble(3) shouldBe 1.0 +- 1e-12
    val inverted = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0))
      .toDF("s", "y").withColumn("id", monotonically_increasing_id())
    Curation.rocAuc(inverted, col("s"), col("y"), col("id"))
      .head().getDouble(3) shouldBe 0.0 +- 1e-12
  }

  test("rocAuc matches a single-window reference on a random-ish frame") {
    // 200 rows, score = (i*37)%23 (many ties), label = i%3==0.
    val df = (0 until 200).map(i => (i.toLong, (i * 37) % 23, i % 3))
      .toDF("id", "s", "m")
      .select(col("id"), col("s"), (col("m") === 0).cast("int").as("y"))
    val ref = {
      // average-rank AUC via two plain windows (test-only shape)
      import org.apache.spark.sql.expressions.Window
      val ranked = df.withColumn("rk",
        row_number().over(Window.orderBy(col("s"), col("id"))))
      val g = ranked.groupBy("s").agg(sum("y").as("p"),
        min("rk").as("lo"), max("rk").as("hi"))
      val agg = g.agg(sum("p").as("np"),
        sum(expr("hi - lo + 1 - p")).as("nn"),
        sum(expr("(lo + hi) * p")).as("rk2")).head()
      val (np, nn, rk2) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      (rk2 - np * (np + 1)).toDouble / (2.0 * np * nn)
    }
    Curation.rocAuc(df, col("s"), col("y"), col("id"))
      .head().getDouble(3) shouldBe ref +- 1e-12
  }

  test("calibrationReport bins support, rate, and exact mean prediction") {
    // p=1.0 lands in the LAST bin (least(floor(p*B), B-1)).
    val df = Seq((0.05, 1), (0.05, 0), (0.95, 1), (1.0, 1))
      .toDF("p", "y")
    val out = Curation.calibrationReport(df, col("p"), col("y"), 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    out.keySet shouldBe Set(0L, 9L)
    out(0L)._1 shouldBe 2L
    out(0L)._2 shouldBe 1L
    out(0L)._3 shouldBe 0.05 +- 1e-9
    out(0L)._4 shouldBe 0.5 +- 1e-12
    out(9L)._1 shouldBe 2L
    out(9L)._2 shouldBe 2L
    out(9L)._4 shouldBe 1.0 +- 1e-12
  }

  test("clusterAgreement: a partition agrees with itself at ARI = 1") {
    // 3 tight groups along distinct axes; centroids = one per group.
    // truth = the generating group -> assignment recovers it exactly.
    val vecs = (0 until 30).map { i =>
      val g = i % 3
      val base = Array.fill(4)(0.01f * i)
      base(g) = 10f
      (i.toLong, base.toSeq, g)
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.clusterAgreement(vecs, col("label"),
      col("vec_id") < 3).head()
    r.getLong(0) shouldBe 30L
    r.getDouble(4) shouldBe 1.0 +- 1e-12
  }

  test("clusterAgreement: independent labeling lands near 0 (hand check)") {
    // truth alternates 0/1 independent of the two spatial groups -> a
    // perfectly balanced 2x2 contingency (n_ij = 10). Hand ARI:
    // sij = 4*C(10,2) = 180, sa = sb = 2*C(20,2) = 380, C(40,2) = 780,
    // E = 380*380/780 -> ARI = (180-E)/(380-E) = -4000/152000 = -1/38.
    val vecs = (0 until 40).map { i =>
      val g = i % 2 // spatial group (recovered by assignment)
      val base = Array.fill(4)(0f)
      base(g) = 10f
      (i.toLong, base.toSeq, (i / 2) % 2) // truth independent of g
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.clusterAgreement(vecs, col("label"),
      col("vec_id") < 2).head()
    r.getDouble(4) shouldBe (-1.0 / 38.0) +- 1e-9
  }

  test("importanceWeights: target == corpus collapses to the Scale constant") {
    // When every doc is in the target slice, c_tgt(b) == c_all(b) and
    // T == N, so every bucket weight is exactly Scale = 1e6 and a doc's
    // score is n_toks * 1e6.
    val df = Seq((0L, "a b c"), (1L, "d e")).toDF("doc_id", "text")
    val out = Curation.importanceWeights(df, col("doc_id"), col("text"),
        lit(true), 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(0L) shouldBe ((3L, 3000000L))
    out(1L) shouldBe ((2L, 2000000L))
  }

  test("countMinAudit: est >= true always; width 1 collapses to the stream total") {
    import graft.operators.HeavyHitters
    val items = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("tok")
    // ample width: every estimate exact
    val wide = HeavyHitters.countMinAudit(items, col("tok"), 2, 4096, 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    wide("a") shouldBe ((5L, 5L))
    wide("b") shouldBe ((3L, 3L))
    wide("c") shouldBe ((1L, 1L))
    // width 1: every key shares the single bucket -> est = 9 for all
    val tight = HeavyHitters.countMinAudit(items, col("tok"), 3, 1, 3)
      .collect()
    tight.foreach { r =>
      r.getLong(2) shouldBe 9L
      r.getLong(3) shouldBe 9L - r.getLong(1) // overestimate
    }
  }

  test("rrfFuse: hand-computed fusion of two opposed rankings") {
    // scoreA ranks 1,2,3 as id 3,2,1; scoreB ranks them 1,2,3 ->
    // with k=0: id1: 1/3+1/1, id2: 1/2+1/2, id3: 1/1+1/3.
    val df = Seq((1L, 10L, 30L), (2L, 20L, 20L), (3L, 30L, 10L))
      .toDF("id", "a", "b")
    val out = Curation.rrfFuse(df, col("id"), col("a"), col("b"), 0, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    out(1L) shouldBe (1.0 / 3 + 1.0) +- 1e-12
    out(2L) shouldBe 1.0 +- 1e-12
    out(3L) shouldBe (1.0 + 1.0 / 3) +- 1e-12
  }

  test("rrfFuse: topN cut is deterministic under rrf ties (id tie-break)") {
    // identical scores -> ranks decided by id; take top 2 of 4
    val df = (1L to 4L).map(i => (i, 5L, 5L)).toDF("id", "a", "b")
    val out = Curation.rrfFuse(df, col("id"), col("a"), col("b"), 60, 2)
      .collect().map(_.getLong(0)).toSeq
    out shouldBe Seq(1L, 2L) // rank = id order on ties -> best rrf first
  }

  test("lshPairEval finds the planted near-dup pair; short docs excluded") {
    import graft.operators.Dedup
    val near = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, near), (1L, near + " iota"), // Jaccard ~ 6/8 -> truth + LSH hit
      (2L, "totally different content one two three four"),
      (3L, "and a third unrelated document with more words"),
      (4L, "xy")).toDF("doc_id", "text") // < shingle width -> excluded
    val r = Dedup.lshPairEval(docs, col("doc_id"), col("text"),
      lit(true), 3, 16, 4, 4, 1, 4).head()
    r.getLong(0) shouldBe 1L // n_truth: just the planted pair
    r.getLong(2) shouldBe 1L // n_hit
    r.getDouble(4) shouldBe 1.0 +- 1e-12 // recall
  }

  test("dataCard summarizes counts, dominant language, and dup rate") {
    import graft.operators.Curation
    val docs = Seq(
      (0L, "s1", "en", "a b c"),
      (1L, "s1", "en", "a b c"), // exact dup of 0
      (2L, "s1", "de", "d e"),
      (3L, "s2", "fr", "f g h i")).toDF("doc_id", "source", "lang", "text")
    val out = Curation.dataCard(docs, col("source"), col("doc_id"),
        col("text"), col("lang"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    s1.getLong(1) shouldBe 3L // n_docs
    s1.getLong(2) shouldBe 8L // n_tokens
    s1.getLong(4) shouldBe 2L // n_langs
    s1.getString(5) shouldBe "en" // top_lang
    s1.getLong(8) shouldBe 2L // n_distinct (dup collapsed)
    s1.getDouble(9) shouldBe (1.0 / 3.0) +- 1e-12 // dup_rate
    out("s2").getLong(1) shouldBe 1L
    out("s2").getDouble(9) shouldBe 0.0 +- 1e-12
  }

  test("bootstrapCi: constant values collapse the interval; interval brackets the mean") {
    import graft.operators.Curation
    val const = (0 until 40).map(i => (i.toLong, 7L)).toDF("id", "v")
    val r0 = Curation.bootstrapCi(const, lit(true), col("id"), col("v"),
      20, 5, 95, "s").head()
    r0.getDouble(2) shouldBe 7.0 +- 1e-12 // mean_full
    r0.getDouble(3) shouldBe 7.0 +- 1e-12 // ci_lo
    r0.getDouble(4) shouldBe 7.0 +- 1e-12 // ci_hi
    val varied = (0 until 60).map(i => (i.toLong, (i % 13).toLong))
      .toDF("id", "v")
    val r = Curation.bootstrapCi(varied, lit(true), col("id"), col("v"),
      30, 5, 95, "s").head()
    r.getDouble(3) should be <= r.getDouble(2)
    r.getDouble(4) should be >= r.getDouble(2)
    // deterministic under repartitioning (no RNG)
    val again = Curation.bootstrapCi(varied.repartition(7), lit(true),
      col("id"), col("v"), 30, 5, 95, "s").head()
    again.getDouble(3) shouldBe r.getDouble(3)
    again.getDouble(4) shouldBe r.getDouble(4)
  }

  test("bootstrapCi: empty sample still yields ONE row with NULL stats (oracle aggregate shape)") {
    import graft.operators.Curation
    val docs = (0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val rows = Curation.bootstrapCi(docs, lit(false), col("id"), col("v"),
      10, 5, 95, "s").collect()
    rows.length shouldBe 1
    val r = rows.head
    r.getLong(0) shouldBe 0L  // n_sample
    r.getLong(1) shouldBe 10L // n_resamples
    r.isNullAt(2) shouldBe true // mean_full: NULL, like sum-over-empty
    r.isNullAt(3) shouldBe true
    r.isNullAt(4) shouldBe true
  }

  test("cusumAlarms: a planted rate burst alarms; a uniform stream stays quiet") {
    import graft.operators.Drift
    import java.sql.Timestamp
    def ev(sec: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // uniform: 5 events per 10s bucket over 20 buckets -> no alarms
    val uniform = (0 until 200).map(i => Tuple1(ev(i))).toDF("ts")
    val quiet = Drift.cusumAlarms(uniform, col("ts"), 10L, 1L, 100L)
      .collect()
    quiet.map(_.getLong(3)).sum shouldBe 0L
    // burst: buckets 0-9 hold 1 event each, buckets 10-19 hold 20 each
    val burst = ((0 until 10).map(b => Tuple1(ev(b * 10L))) ++
      (10 until 20).flatMap(b => (0 until 20).map(k => Tuple1(ev(b * 10L + k % 10)))))
      .toDF("ts")
    val alarms = Drift.cusumAlarms(burst, col("ts"), 10L, 5L, 100L)
      .collect().map(r => (r.getLong(0) / 10, r.getLong(3))).toMap
    alarms.filter(_._1 < 10).values.sum shouldBe 0L // quiet half silent
    alarms.filter(_._1 >= 12).values.sum should be >= 5L // burst accumulates
  }

  test("ksStatistic: disjoint supports hit 1.0; identical samples hit 0; hand case") {
    import graft.operators.Drift
    val lo = (0 until 20).map(i => Tuple1((i % 5).toLong)).toDF("v")
    val hi = (0 until 30).map(i => Tuple1((100 + i % 7).toLong)).toDF("v")
    val r1 = Drift.ksStatistic(lo, hi, col("v")).head()
    r1.getDouble(3) shouldBe 1.0 +- 1e-12 // disjoint supports
    val r0 = Drift.ksStatistic(lo, lo, col("v")).head()
    r0.getDouble(3) shouldBe 0.0 +- 1e-12 // identical distributions
    // hand case: A = {1,1,2}, B = {1,2,2,3}
    // F_a = 2/3, 3/3, 3/3 at v=1,2,3; F_b = 1/4, 3/4, 4/4
    // gaps |F_a - F_b| = 5/12, 3/12, 0 -> KS = 5/12 at v = 1
    val a = Seq(1L, 1L, 2L).map(Tuple1(_)).toDF("v")
    val b = Seq(1L, 2L, 2L, 3L).map(Tuple1(_)).toDF("v")
    val r = Drift.ksStatistic(a, b, col("v")).head()
    r.getLong(2) shouldBe 5L // ks_num = |2*4 - 1*3|
    r.getDouble(3) shouldBe (5.0 / 12.0) +- 1e-12
    r.getLong(4) shouldBe 1L // at_value
  }

  test("importanceWeights favors docs made of target-heavy tokens") {
    // 'en'-slice docs use token x; raw-only docs use token y. A doc of
    // x-tokens must outscore a doc of y-tokens.
    val df = (Seq((0L, "x x x", true), (1L, "x x x", true)) ++
      Seq((2L, "y y y", false), (3L, "y y y", false), (4L, "x y y", false)))
      .toDF("doc_id", "text", "tgt")
    val out = Curation.importanceWeights(df, col("doc_id"), col("text"),
        col("tgt"), 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    out(0L) should be > out(2L)
    out(4L) should be > out(2L)
    out(4L) should be < out(0L)
  }

  test("histogramQuantiles: error within the bin-width bound; exact on wide bins") {
    import graft.operators.Curation
    val df = (1 to 1000).map(i => ((i * 37) % 500 + 1).toLong)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Curation.histogramQuantiles(df, col("v"), Seq(5, 50, 95), 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    out.keySet shouldBe Set(5L, 50L, 95L)
    out.values.foreach { case (_, _, err, bound) =>
      err should be <= bound + 1e-9 // the sketch guarantee
    }
    // bins >= value range: every value has its own bin -> est lands in
    // the exact value's bin, err <= width < 1
    val wide = Curation.histogramQuantiles(df, col("v"), Seq(50), 1024)
      .head()
    wide.getDouble(6) should be <= wide.getDouble(7) + 1e-9
    wide.getDouble(7) should be < 1.0
  }

  test("histogramQuantiles: constant column collapses (est = exact = value, bound 0)") {
    import graft.operators.Curation
    val df = (0 until 50).map(i => (i.toLong, 7L)).toDF("id", "v")
    val r = Curation.histogramQuantiles(df, col("v"), Seq(50), 64).head()
    r.getDouble(4) shouldBe 7.0 // est
    r.getDouble(5) shouldBe 7.0 // exact
    r.getDouble(6) shouldBe 0.0 // abs_err
    r.getDouble(7) shouldBe 0.0 // bound
  }

  test("histogramQuantiles: empty input yields an empty frame with the full schema") {
    import graft.operators.Curation
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    val out = Curation.histogramQuantiles(df, col("v"), Seq(50), 64)
    out.columns.toSeq shouldBe
      Seq("pct", "n", "lo", "hi", "est", "exact", "abs_err", "bound")
    out.count() shouldBe 0L
  }

  test("prCurve: hand-computed sweep; monotone recall; threshold=max gives precision of the top score") {
    import graft.operators.Curation
    // scores 3,3,2,1 labels 1,0,1,0: thresholds 3,2,1
    // t=3: tp=1 fp=1 fn=1 -> prec .5 rec .5; t=2: tp=2 fp=1 -> prec 2/3
    // rec 1; t=1: tp=2 fp=2 -> prec .5 rec 1
    val df = Seq((3L, 1L), (3L, 0L), (2L, 1L), (1L, 0L)).toDF("s", "y")
    val out = Curation.prCurve(df, col("s"), col("y") === 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    out(3L) shouldBe ((1L, 1L, 1L, 0.5, 0.5))
    out(2L) shouldBe ((2L, 1L, 0L, 2.0 / 3, 1.0))
    out(1L) shouldBe ((2L, 2L, 0L, 0.5, 1.0))
    // recall is monotone non-increasing in threshold
    val recs = out.toSeq.sortBy(_._1).map(_._2._5)
    recs.zip(recs.tail).foreach { case (lo, hi) => lo should be >= hi }
  }
}
