package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** [[graft.operators.Curation]] — boilerplate detection thresholds,
  * cap determinism + the WindowGroupLimit plan shape, integer-exact
  * dedup accounting, and the two-pass shard rank vs a single-window
  * reference. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplateReport flags grams at the df threshold, drops short docs") {
    // source "a": 10 docs; "x y" opens 5 of them (df 5/10 ≥ 1/2 → boiler
    // at num=1 den=2); every other 2-gram appears once. One 1-token doc
    // must be dropped (no 2-grams).
    val rows = (0 until 5).map(i => (i.toLong, "a", s"x y t$i u$i")) ++
      (5 until 10).map(i => (i.toLong, "a", s"p$i q$i r$i s$i")) :+
      (10L, "a", "solo")
    val out = Curation.boilerplateReport(rows.toDF("doc_id", "source", "text"),
        col("doc_id"), col("source"), col("text"), 2, 1, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out.size shouldBe 10 // the 1-token doc is gone
    (0 until 5).foreach { i =>
      out(i.toLong) shouldBe ((3L, 1L)) // 3 grams, "x y" flagged
    }
    (5 until 10).foreach { i => out(i.toLong) shouldBe ((3L, 0L)) }
  }

  test("blockDedup keeps first global occurrence and reassembles in order") {
    // 2-token blocks. doc 0 = [a b][c d]; doc 1 repeats [a b] (dropped,
    // earlier global occurrence) then contributes [e f]; doc 2 is
    // entirely made of already-seen blocks -> empty survivor.
    val df = Seq(
      (0L, "a b c d"),
      (1L, "a b e f"),
      (2L, "c d a b")).toDF("doc_id", "text")
    val out = Curation.blockDedup(df, col("doc_id"), col("text"), 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(0L) shouldBe ((2L, 2L, "a b c d"))
    out(1L) shouldBe ((2L, 1L, "e f"))
    out(2L) shouldBe ((2L, 0L, ""))
  }

  test("blockDedup: intra-document repeats collapse; ragged tail is its own block") {
    // doc 0 repeats its own opening block; 5 tokens at width 2 -> 3
    // blocks with a 1-token tail ("e").
    val df = Seq((0L, "a b a b e")).toDF("doc_id", "text")
    val out = Curation.blockDedup(df, col("doc_id"), col("text"), 2).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 3L   // n_blocks
    out.head.getLong(2) shouldBe 2L   // [a b] once + tail [e]
    out.head.getString(3) shouldBe "a b e"
  }

  test("blockDedup/cdcChunks under a 90%-hot content key: election stays exact") {
    // Boilerplate-heavy corpus — the adversarial shape for the
    // first-occurrence election (graft.tools.SkewStress measures the
    // wall-time side at scale; this pins correctness): 90% of docs are
    // ONE disclaimer, so one block hash / chunk key carries ~90% of
    // rows. The min_by election must behave exactly like the
    // row_number-window rule it replaced.
    import graft.operators.Curation
    val disclaimer = (0 until 8).map(j => s"term$j").mkString(" ")
    val docs = (0L until 200L).map { id =>
      (id, if (id % 10 < 9) disclaimer
           else (0 until 8).map(j => s"u${id}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val blocks = Curation.blockDedup(docs, col("doc_id"), col("text"), 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // both election shapes pick identical winners
    val blocksSafe = Curation
      .blockDedup(docs, col("doc_id"), col("text"), 4, skewSafe = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    blocksSafe shouldBe blocks
    blocks.size shouldBe 200
    // doc 0 (smallest hot id) keeps both disclaimer blocks; every other
    // hot doc keeps none; unique docs keep both of theirs
    blocks(0L) shouldBe ((2L, 2L))
    (1L until 200L).filter(_ % 10 < 9).foreach(id => blocks(id) shouldBe ((2L, 0L)))
    (0L until 200L).filter(_ % 10 >= 9).foreach(id => blocks(id) shouldBe ((2L, 2L)))
    // CDC: each distinct chunk key elects exactly ONE is_first row, and
    // it is the (doc_id, chunk_idx)-minimal occurrence; both shapes agree
    val cdc = Curation.cdcChunks(docs, col("doc_id"), col("text"), 4)
    val cdcSafe = Curation
      .cdcChunks(docs, col("doc_id"), col("text"), 4, skewSafe = true)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).sorted.toSeq
    rows(cdcSafe) shouldBe rows(cdc)
    val perKey = cdc.groupBy(col("chunk_key"))
      .agg(sum(col("is_first")).as("nf"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("mn"),
        min_by(struct(col("doc_id"), col("chunk_idx")),
          when(col("is_first") === 1, struct(col("doc_id"), col("chunk_idx"))))
          .as("first"))
      .collect()
    perKey.foreach { r =>
      r.getLong(1) shouldBe 1L // exactly one first per key
    }
    // winner == minimal occurrence, for every key
    cdc.filter(col("is_first") === 1)
      .select(col("chunk_key"), struct(col("doc_id"), col("chunk_idx")).as("w"))
      .join(cdc.groupBy(col("chunk_key"))
        .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("mn")), Seq("chunk_key"))
      .filter(col("w") =!= col("mn")).count() shouldBe 0L
  }

  test("AUTO election (VERDICT r7 #8): hot fixture picks min_by, uniform picks window, " +
      "outputs identical either way") {
    import graft.operators.Curation
    val disclaimer = (0 until 8).map(j => s"term$j").mkString(" ")
    val hotDocs = (0L until 200L).map { id =>
      (id, if (id % 10 < 9) disclaimer
           else (0 until 8).map(j => s"u${id}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val uniqDocs = (0L until 200L)
      .map(id => (id, (0 until 8).map(j => s"u${id}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    def hasWindow(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.linesIterator
        .exists(_.contains("Window [")) // WindowExec; not WindowGroupLimit
    // the probe decides the ARM (visible in the physical plan)...
    val hotAuto = Curation.blockDedupAuto(hotDocs, col("doc_id"), col("text"), 4)
    val uniqAuto = Curation.blockDedupAuto(uniqDocs, col("doc_id"), col("text"), 4)
    hasWindow(hotAuto) shouldBe false // min_by aggregate, no per-key sort
    hasWindow(uniqAuto) shouldBe true // streaming-sort window
    // ...and never the ANSWER
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString).toSeq
    rowsOf(hotAuto) shouldBe
      rowsOf(Curation.blockDedup(hotDocs, col("doc_id"), col("text"), 4))
    rowsOf(uniqAuto) shouldBe
      rowsOf(Curation.blockDedup(uniqDocs, col("doc_id"), col("text"), 4))
    // CDC twin: the chunk-key probe flips the same way. The chunk build
    // itself runs doc-keyed windows (both arms), so the arm check is
    // specifically a Window PARTITIONED BY the content key.
    def hasChunkKeyWindow(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.linesIterator
        .exists(l => l.contains("Window [") && l.contains("chunk_key"))
    val cdcHot = Curation.cdcChunksAuto(hotDocs, col("doc_id"), col("text"), 4)
    val cdcUniq = Curation.cdcChunksAuto(uniqDocs, col("doc_id"), col("text"), 4)
    hasChunkKeyWindow(cdcHot) shouldBe false
    hasChunkKeyWindow(cdcUniq) shouldBe true
    def cdcRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).sorted.toSeq
    cdcRows(cdcHot) shouldBe
      cdcRows(Curation.cdcChunks(hotDocs, col("doc_id"), col("text"), 4))
    cdcRows(cdcUniq) shouldBe
      cdcRows(Curation.cdcChunks(uniqDocs, col("doc_id"), col("text"), 4))
    // probe share is the decision variable: ~0.9 hot, ~1/400 uniform
    import graft.functions.TextFns
    val hotShare = Curation.hotKeyShare(
      hotDocs.select(TextFns.hash60(col("text")).as("k")))
    hotShare should be > 0.8
    Curation.hotKeyShare(
      uniqDocs.select(TextFns.hash60(col("text")).as("k"))) should be < 0.05
    Curation.hotKeyShare(hotDocs.limit(0)
      .select(TextFns.hash60(col("text")).as("k"))) shouldBe 0.0
  }

  test("writeShards: physical layout round-trips the plan; shard dirs prune") {
    import graft.operators.Curation
    val docs = (0L until 40L).map(id => (id, 10L + id % 7))
      .toDF("doc_id", "n_chars")
    val plan = Curation.shardPlan(docs, col("n_chars"), col("doc_id"), 4)
    val out = java.nio.file.Files.createTempDirectory("graft_ws").toString
    val manifest = Curation.writeShards(docs, plan, col("doc_id"),
        col("n_chars"), out)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    manifest.keySet shouldBe Set(0L, 1L, 2L, 3L)
    manifest.values.map(_._1).sum shouldBe 40L           // nothing lost
    manifest.values.map(_._2).sum shouldBe
      (0L until 40L).map(id => 10L + id % 7).sum         // sizes intact
    // round-robin over the size-descending rank balances counts exactly
    manifest.values.map(_._1).toSet shouldBe Set(10L)
    // physical layout: one directory per shard; reading one shard
    // returns only that shard's docs (partition pruning surface)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    dirs.toSeq shouldBe Seq("shard=0", "shard=1", "shard=2", "shard=3")
    val one = spark.read.parquet(s"$out/shard=2")
    one.count() shouldBe 10L
    val planned = plan.filter(col("shard") === 2)
      .select("doc_id").as[Long].collect().toSet
    one.select("doc_id").as[Long].collect().toSet shouldBe planned
    // empty input: empty manifest, no crash
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_chars")
    val eplan = Curation.shardPlan(empty, col("n_chars"), col("doc_id"), 4)
    val eout = java.nio.file.Files.createTempDirectory("graft_ws_e").toString
    Curation.writeShards(empty, eplan, col("doc_id"), col("n_chars"), eout)
      .count() shouldBe 0L
  }

  test("vocabCoverage: boundary tie-break and per-doc OOV accounting") {
    // corpus counts: x=3, y=2, z=2, w=1. K=2 vocabulary is {x, y}
    // (count desc, token asc breaks the y/z tie toward y).
    val df = Seq(
      (0L, "x x y z"),
      (1L, "x y z w")).toDF("doc_id", "text")
    val out = Curation.vocabCoverage(df, col("doc_id"), col("text"), 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out(0L) shouldBe ((4L, 1L, 1L))          // z OOV
    out(1L) shouldBe ((4L, 2L, 2L))          // z, w OOV
  }

  test("boilerplateReport counts every occurrence of a boiler gram") {
    // "x y" df = 2/2 docs → boiler at any threshold; doc 0 contains the
    // gram twice ("x y x y" → grams [x y, y x, x y]).
    val df = Seq((0L, "a", "x y x y"), (1L, "a", "x y end")).toDF("doc_id", "source", "text")
    val out = Curation.boilerplateReport(df, col("doc_id"), col("source"),
        col("text"), 2, 1, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    out(0L) shouldBe 2L
    out(1L) shouldBe 1L
  }

  test("capPerGroup keeps exactly k per group with a deterministic cut") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), (4L, "a", 5L),
      (5L, "b", 7L)).toDF("id", "grp", "sz")
    val kept = Curation.capPerGroup(df, col("grp"),
      Seq(col("sz").desc, col("id")), 2)
    kept.count() shouldBe 3
    // ties on sz broken by id: group a keeps ids 1, 2
    kept.where(col("grp") === "a").select("id").as[Long]
      .collect().sorted shouldBe Array(1L, 2L)
    kept.where(col("id") === 2L).select("rnk").as[Int].head() shouldBe 2
  }

  test("capPerGroup compiles to WindowGroupLimit (top-k before the exchange)") {
    val df = Seq((1L, "a", 10L), (2L, "a", 9L)).toDF("id", "grp", "sz")
    val plan = Curation.capPerGroup(df, col("grp"),
      Seq(col("sz").desc, col("id")), 1).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("effectiveTokens counts each cluster once, at its keeper's source") {
    // docs 0/2 share content (keeper 0, source a); doc 3 in source b is
    // the same bag of words again — cross-source cluster, still keeper 0.
    val df = Seq(
      (0L, "a", "w1 w2 w3"), (1L, "a", "w4 w5"),
      (2L, "a", "w3 w2 w1"), (3L, "b", "w1 w1 w2 w3")).toDF("doc_id", "source", "text")
    val out = Curation.effectiveTokens(df, col("doc_id"), col("text"),
        col("source"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // source a: 3 docs, 3+2+3=8 raw tokens; clusters {0,2,3} (keeper 0)
    // and {1} → 2 unique docs, 3+2=5 unique tokens.
    out("a") shouldBe ((3L, 8L, 2L, 5L))
    // source b: 1 doc, 4 raw tokens, its cluster's keeper lives in a →
    // nothing counted as unique here.
    out("b") shouldBe ((1L, 4L, 0L, 0L))
  }

  test("shardPlan's two-pass rank equals the single-window reference") {
    val df = (1 to 40).map(i => (i.toLong, ((i * 37) % 13 + 3).toLong))
      .toDF("doc_id", "sz")
    val got = Curation.shardPlan(df, col("sz"), col("doc_id"), 4)
    val ref = df.withColumn("g_rank",
        row_number().over(Window.orderBy(col("sz").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("sz").as("sz"), col("g_rank"),
        ((col("g_rank") - 1) % 4).as("shard"))
    got.exceptAll(ref).count() shouldBe 0
    ref.exceptAll(got).count() shouldBe 0
    // round-robin over size-descending rank ⇒ shard doc counts differ by ≤1
    val counts = got.groupBy("shard").count().select("count").as[Long].collect()
    (counts.max - counts.min) should be <= 1L
  }
}
