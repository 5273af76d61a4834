package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for LLM training-data prep (builder brief;
  * SURVEY.md §7.2 step 11): exact, MinHash-LSH banded near-dup, SimHash,
  * and n-gram Jaccard — all as declarative DataFrame transforms.
  *
  * 100 TB design notes:
  *  - exact dedup is ONE hash-shuffle keyed on the content digest (never
  *    `dropDuplicates()` on raw text — the digest is 32 bytes, the text
  *    can be megabytes; shuffle the digest, not the document);
  *  - MinHash-LSH joins only WITHIN band buckets — the shuffle key is
  *    (band_idx, band_key), so candidate generation is linear in corpus
  *    size plus the (small) bucket-pair blow-up; all-pairs O(n²) never
  *    happens. Bucket skew (a degenerate band key shared by a huge doc
  *    cluster) is handled by AQE skew-join splitting; at 16 hashes / 4
  *    bands the collision probability for Jaccard-s pairs is
  *    1-(1-s⁴)⁴ (s=0.5 → 23%, s=0.8 → 87%, s=0.95 → 99.8%);
  *  - signatures/simhashes are per-row column folds (codegen'd, no UDF) —
  *    computed in the scan stage, map-side.
  */
object Dedup {

  /** Exact dedup via content-digest group: one row per distinct key with
    * the keeper (min id) and the duplicate count. `key` defaults to the
    * md5 of the normalized token-set, which also catches order/whitespace
    * permutations of the same bag of words. */
  def exactGroups(docs: DataFrame, idCol: Column, key: Column): DataFrame =
    docs.groupBy(key.as("dup_key"))
      .agg(min(idCol).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Canonical content key: md5 over the sorted distinct token set. */
  def contentKey(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(TextFns.tokens(text)))))

  /** Per-doc MinHash signature frame: (id, sig array<long>). Docs with no
    * shingles (shorter than the shingle width) are dropped — they cannot
    * participate in near-dup detection.
    *
    * Shape: explode shingle hashes once, then `numHashes` plain `min`
    * aggregates. Spark's higher-order array functions are interpreted
    * (CodegenFallback) AND adjacent projections collapse — an array-fold
    * signature re-evaluates the whole shingle+md5 tree once per
    * permutation (16× at defaults; measured 23 s at sf0.1 vs ~2 s this
    * way). The explode+hash-agg form keeps every per-perm expression a
    * codegen'd two-op arithmetic, computes each shingle hash exactly
    * once, and map-side partial aggregation reduces the shuffle to one
    * row per (doc, partition). */
  def minhashSignatures(docs: DataFrame, idCol: Column, text: Column,
                        shingleN: Int, numHashes: Int): DataFrame =
    docs.select(idCol.as("doc_id"), TextFns.tokens(text).as("toks"))
      .select(col("doc_id"),
        explode(TextFns.shingleHashes(col("toks"), shingleN)).as("h"))
      .groupBy(col("doc_id"))
      .agg(array((0 until numHashes).map { i =>
        min((lit(TextFns.permA(i)) * col("h") + lit(TextFns.permB(i))) % TextFns.HashMod)
      }: _*).as("sig"))

  /** Banded-LSH candidate pairs (doc_a < doc_b, distinct): explode each
    * signature into `numBands` band keys and self-join per bucket. The
    * join is equi on (band, band_key) — hash-partitioned, never all-pairs. */
  def lshCandidatePairs(sigs: DataFrame, numBands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until numBands).map { b =>
        concat_ws("_", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
      }: _*)).as(Seq("band", "band_key")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Incremental corpus-append triage (L56): classify each NEW-batch
    * document against the existing corpus as `exact_dup` (content
    * digest already present), `near_dup` (MinHash-LSH candidate that
    * passes the Jaccard ≥ 1/2 gate against ≥1 existing doc) or `clean`
    * — the nightly-crawl admission decision, composed from the S5/L1/L2
    * machinery.
    *
    * 100 TB shape: the exact arm is a digest SEMI join (32-byte keys
    * both ways, never text); the near arm reuses the banded-LSH
    * candidate join and keeps only CROSS pairs (exactly one endpoint
    * new), so candidate volume is the usual band-bucket blow-up, never
    * new×old. In production the old side's signatures/digests come from
    * the S5-style ledger instead of being recomputed — the plan from
    * the band join onward is identical.
    *
    * Output: one row per new doc — (doc_id, is_exact_dup, n_near_dup,
    * verdict), exact-dup precedence over near-dup. */
  def appendTriage(docs: DataFrame, isNew: Column, idCol: Column,
                   text: Column, shingleN: Int, numHashes: Int,
                   numBands: Int, rowsPerBand: Int): DataFrame = {
    val keyed = docs.select(idCol.as("doc_id"), isNew.as("is_new"),
      contentKey(text).as("ckey"))
    val exact = keyed.where(col("is_new"))
      .join(keyed.where(!col("is_new")).select(col("ckey")).distinct(),
        Seq("ckey"), "left_semi")
      .select(col("doc_id"), lit(1L).as("is_exact_dup"))
    val sigs = minhashSignatures(docs, idCol, text, shingleN, numHashes)
    val pairs = lshCandidatePairs(sigs, numBands, rowsPerBand)
    val sets = shingleSets(docs, idCol, text, shingleN)
    val newIds = docs.select(idCol.as("doc_id"), isNew.as("is_new"))
    val flagged = jaccardVerify(pairs, sets)
      .where(lit(2) * col("n_common") >= col("n_union"))
      .join(newIds.select(col("doc_id").as("doc_a"), col("is_new").as("na")), "doc_a")
      .join(newIds.select(col("doc_id").as("doc_b"), col("is_new").as("nb")), "doc_b")
      .where(col("na") =!= col("nb"))
    val near = flagged
      .select(when(col("na"), col("doc_a")).otherwise(col("doc_b")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near_dup"))
    newIds.where(col("is_new")).select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("is_exact_dup"), lit(0L)).as("is_exact_dup"),
        coalesce(col("n_near_dup"), lit(0L)).as("n_near_dup"),
        when(coalesce(col("is_exact_dup"), lit(0L)) === 1L, "exact_dup")
          .when(coalesce(col("n_near_dup"), lit(0L)) > 0L, "near_dup")
          .otherwise("clean").as("verdict"))
  }

  /** L119 — the persisted dedup-signature LEDGER (the S5 ledger
    * carrying dedup state, VERDICT r8 #6): one row per existing doc —
    * (doc_id, ckey, sig) — everything the append-triage decision needs
    * about the old side, so the nightly batch never re-reads (or even
    * retains) old TEXT. Docs with no shingles carry a null `sig` (they
    * cannot near-dup, the corpus-wide convention) but still contribute
    * their digest to the exact arm. */
  def dedupLedger(docs: DataFrame, idCol: Column, text: Column,
                  shingleN: Int, numHashes: Int): DataFrame =
    docs.select(idCol.as("doc_id"), contentKey(text).as("ckey"))
      .join(minhashSignatures(docs, idCol, text, shingleN, numHashes),
        Seq("doc_id"), "left")

  /** Persist [[dedupLedger]] as a parquet artifact (the L103/L106
    * artifact lifecycle applied to dedup state). */
  def saveDedupLedger(docs: DataFrame, idCol: Column, text: Column,
                      shingleN: Int, numHashes: Int, path: String): Unit =
    dedupLedger(docs, idCol, text, shingleN, numHashes)
      .write.mode("overwrite").parquet(path)

  def loadDedupLedger(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame = spark.read.parquet(path)

  /** [[appendTriage]] against a PERSISTED ledger instead of the live
    * old-side corpus: the exact arm is the same digest semi join; the
    * near arm bands new (live) and old (ledger) signatures together and
    * decides near-dup by SIGNATURE-component agreement —
    * `2 · |{i : sig_a[i] = sig_b[i]}| ≥ numHashes`, the MinHash
    * estimator of Jaccard ≥ 1/2 — because the ledger (correctly) does
    * not retain old shingle sets, let alone text. That estimator swap
    * is exactly what a production ledger run does; the q168 oracle
    * replays it, and AppendTriageSpec pins persisted ≡ in-memory.
    *
    * Caller contract: new and ledger doc_ids are disjoint.
    *
    * 100 TB shape: old text never exists in the job at all — the
    * ledger rows are (8 B id, 32 B digest, numHashes·8 B sig); band
    * join + signature compare are the only cross-side contact, both
    * equi-keyed. */
  def appendTriageLedger(newDocs: DataFrame, ledger: DataFrame,
                         idCol: Column, text: Column, shingleN: Int,
                         numHashes: Int, numBands: Int,
                         rowsPerBand: Int): DataFrame = {
    val newLed = dedupLedger(newDocs, idCol, text, shingleN, numHashes)
    val exact = newLed
      .join(ledger.select(col("ckey")).distinct(), Seq("ckey"), "left_semi")
      .select(col("doc_id"), lit(1L).as("is_exact_dup"))
    val allSigs = newLed
      .select(col("doc_id"), col("sig"), lit(true).as("is_new"))
      .unionByName(ledger
        .select(col("doc_id"), col("sig"), lit(false).as("is_new")))
      .where(col("sig").isNotNull)
    val pairs = lshCandidatePairs(allSigs.select(col("doc_id"), col("sig")),
      numBands, rowsPerBand)
    val near = pairs
      .join(allSigs.select(col("doc_id").as("doc_a"), col("sig").as("sa"),
        col("is_new").as("na")), "doc_a")
      .join(allSigs.select(col("doc_id").as("doc_b"), col("sig").as("sb"),
        col("is_new").as("nb")), "doc_b")
      .where(col("na") =!= col("nb"))
      .withColumn("n_match",
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
          b => b)))
      .where(col("n_match") * 2 >= numHashes)
      .select(when(col("na"), col("doc_a")).otherwise(col("doc_b"))
        .as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near_dup"))
    newLed.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("is_exact_dup"), lit(0L)).as("is_exact_dup"),
        coalesce(col("n_near_dup"), lit(0L)).as("n_near_dup"),
        when(coalesce(col("is_exact_dup"), lit(0L)) === 1L, "exact_dup")
          .when(coalesce(col("n_near_dup"), lit(0L)) > 0L, "near_dup")
          .otherwise("clean").as("verdict"))
  }

  /** L84 — LSH candidate-pair precision/recall evaluation: on a FIXED
    * document sample, compare the banded-LSH candidate pairs against
    * ground truth (exact all-pairs n-gram Jaccard ≥ num/den) and report
    * ONE row: (n_truth, n_cand, n_hit, precision, recall) — the number
    * that tunes bands×rows before an LSH config gates a 100 TB dedup
    * run (the near-dup twin of the q73/q74 ANN recall gates).
    *
    * `isSample` MUST select a corpus-size-independent set (e.g.
    * `doc_id < 200` over dense ids): ground truth is all-pairs within
    * the sample, so the pair frame is sample²-bounded BY CONTRACT —
    * never corpus-fraction (the SCALE.md probe lesson).
    *
    * 100 TB shape: everything downstream of the sample filter touches
    * ≤ sample rows; the LSH arm is the production band join run ON THE
    * SAMPLE (same code path, [[lshCandidatePairs]]), so the measured
    * precision/recall is the production operator's, not a mock's. */
  def lshPairEval(docs: DataFrame, idCol: Column, text: Column,
                  isSample: Column, shingleN: Int, numHashes: Int,
                  numBands: Int, rowsPerBand: Int,
                  jacNum: Int, jacDen: Int): DataFrame = {
    val sample = docs.where(isSample)
    // shingle-less docs can't near-dup (the corpus-wide convention);
    // without the filter two empty sets would count as a truth pair
    val sets = shingleSets(sample, idCol, text, shingleN)
      .where(size(col("shset")) > 0)
    val allPairs = sets.select(col("doc_id").as("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b")),
        col("doc_a") < col("doc_b"))
    val truth = jaccardVerify(allPairs, sets)
      .where(col("n_common") * jacDen >= col("n_union") * jacNum)
      .select(col("doc_a"), col("doc_b"))
    val cand = lshCandidatePairs(
      minhashSignatures(sample, idCol, text, shingleN, numHashes),
      numBands, rowsPerBand)
    val hit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    val nT = truth.agg(count(lit(1)).as("n_truth"))
    val nC = cand.agg(count(lit(1)).as("n_cand"))
    val nH = hit.agg(count(lit(1)).as("n_hit"))
    nT.crossJoin(nC).crossJoin(nH)
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_cand") > 0,
          col("n_hit").cast("double") / col("n_cand")).as("precision"),
        when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth")).as("recall"))
  }

  /** Exact n-gram Jaccard for a pair frame (doc_a, doc_b) given per-doc
    * distinct shingle sets (id, shset). Intersection/union sizes are
    * integers; the ratio is an exact small-int division — engine-portable. */
  def jaccardVerify(pairs: DataFrame, shingleSets: DataFrame): DataFrame =
    pairs
      .join(shingleSets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), "doc_a")
      .join(shingleSets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("n_union", size(col("sa")) + size(col("sb")) - col("n_common"))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
      .drop("sa", "sb")

  /** Per-doc distinct shingle HASH sets (id, shset: array<long>). Sets of
    * 60-bit hashes, not strings: set intersection on fixed-width longs is
    * several times cheaper than on shingle strings, and the (identically
    * hashed) oracle sees the same collisions, so Jaccard values agree. */
  def shingleSets(docs: DataFrame, idCol: Column, text: Column, shingleN: Int): DataFrame =
    docs.select(idCol.as("doc_id"), TextFns.tokens(text).as("toks"))
      .select(col("doc_id"),
        array_distinct(TextFns.shingleHashes(col("toks"), shingleN)).as("shset"))

  /** Per-doc 32-bit SimHash (id, simhash). Near-dup pairs are then found
    * by banding the simhash bits (e.g. 4 bytes → 4 sub-keys) — same LSH
    * join shape as MinHash; hamming distance ≤ 3 pairs share ≥1 byte. */
  def simhashes(docs: DataFrame, idCol: Column, text: Column): DataFrame =
    docs.select(idCol.as("doc_id"),
        TextFns.tokenHashes(TextFns.tokens(text)).as("hs"))
      .select(col("doc_id"), TextFns.simhash32(col("hs")).as("simhash"))

  /** Eval-set decontamination report (which eval docs share at least
    * `minShared` distinct shingles with a train doc, and with how many
    * train docs): the inverted-index equi-join shape — explode distinct
    * shingle hashes on both sides, cap train posting lists at `maxDf`
    * docs (a stop-shingle carries no contamination signal but makes the
    * join quadratic), join on the hash, count per (eval, train) pair.
    * Never an all-pairs set intersection. Output: (e_id,
    * n_contaminated, max_common). */
  def contaminationReport(evalDocs: DataFrame, trainDocs: DataFrame,
                          idCol: Column, text: Column, shingleN: Int,
                          maxDf: Int, minShared: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = shingleSets(evalDocs, idCol, text, shingleN)
      .select(col("doc_id").as("e_id"), explode(col("shset")).as("h"))
    val tr = shingleSets(trainDocs, idCol, text, shingleN)
      .select(col("doc_id").as("t_id"), explode(col("shset")).as("h"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .where(col("df") <= maxDf).drop("df")
    ev.join(tr, "h")
      .groupBy(col("e_id"), col("t_id"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minShared)
      .groupBy(col("e_id"))
      .agg(count(lit(1)).as("n_contaminated"),
        max(col("n_common")).as("max_common"))
  }

  /** L65 — cross-source shingle-overlap matrix: for every source pair,
    * how many distinct shingles they share — the leakage heat-map that
    * generalizes eval-vs-train decontamination to all corpus slices
    * (mirror detection, license-pool overlap, "is src7 just src3
    * re-crawled"). `overlap` is the overlap coefficient
    * |A∩B| / min(|A|, |B|) over the CAPPED shingle universe.
    *
    * `maxSources` is the q27 df-cap one level up: a shingle present in
    * more than that many sources is corpus-ubiquitous — it carries no
    * pairing signal but contributes O(sources²) join rows — and is
    * dropped before the pair join (on both engines, so the oracle
    * matches by definition).
    *
    * 100 TB shape: the (source, shingle) frame is ONE distinct
    * aggregate over 8-byte hash60 keys (documents never shuffle); the
    * pair join is shingle-keyed with per-key fanout ≤ maxSources²; the
    * matrix aggregate map-combines to ≤ sources² rows per task, and the
    * per-source size frame broadcasts. */
  def sourceOverlapMatrix(docs: DataFrame, sourceCol: Column, text: Column,
                          shingleN: Int, maxSources: Int): DataFrame = {
    val sets = docs.select(sourceCol.as("source"),
        explode(TextFns.shingleHashes60(TextFns.tokens(text), shingleN)).as("h"))
      .distinct()
    val kept = sets.join(
      sets.groupBy(col("h")).agg(count(lit(1)).as("_ns"))
        .where(col("_ns") >= 2 && col("_ns") <= maxSources)
        .select(col("h")),
      Seq("h"))
    val sizes = sets.groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"))
    kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n_shingles").as("_na"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_shingles").as("_nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        (col("n_shared").cast("double") / least(col("_na"), col("_nb")))
          .as("overlap"))
  }

  /** Connected components over an undirected pair list — the cluster-
    * resolution stage that turns near-dup PAIRS (L2/L3/L7 output) into
    * dedup CLUSTERS with a canonical keeper per cluster (the component
    * minimum). Alternating large-star / small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * the standard MapReduce CC algorithm): O(log n) rounds on ANY graph
    * shape — a length-n duplicate chain converges in ~log n rounds where
    * naive label propagation needs n.
    *
    * Input: a DataFrame whose first two columns are node ids (one row
    * per edge, direction irrelevant, self-loops/dups tolerated; any
    * further columns are ignored). Output: (node, component) for every
    * node incident to at least one NON-self edge — a node appearing
    * only in self-loops is its own singleton and is omitted, like any
    * other edge-free node; left-join and coalesce to the node's own id
    * to label singletons. `component` = the minimum node id in the
    * node's component — deterministic, independent of round count or
    * partitioning.
    *
    * 100 TB shape: each round is two hash-shuffles (a groupBy-min and an
    * equi-join) over the contracted edge set, which only shrinks; edges
    * are (id, id) pairs, never payloads. `localCheckpoint` truncates the
    * lineage per round so round r+1 does not replay rounds 1..r. The
    * fixpoint test is structural, not a compare against the previous
    * round: a canonical (hi→lo) edge set is stable under both star
    * transforms iff it is a proper star forest — no node is both a
    * child and a parent, and every child has exactly one parent. (Both
    * transforms preserve the component partition, so each star then
    * spans a full component and its root is the component minimum.)
    * Checking the OUTPUT directly saves the confirmation round a
    * previous-vs-next set compare would need. */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    // stable under both stars iff a proper star forest (see scaladoc);
    // both violation probes union into ONE action per round
    def isStarForest(e: DataFrame): Boolean = {
      val multiParent = e.groupBy("hi").agg(count(lit(1)).as("c"))
        .where(col("c") > 1).select(lit(1).as("viol"))
      val chained = e.as("x")
        .join(e.as("y"), col("x.lo") === col("y.hi"), "left_semi")
        .select(lit(1).as("viol"))
      multiParent.union(chained).isEmpty
    }
    // canonical directed form (hi > lo); self-loops and dup edges dropped
    var e = edges.select(edges.columns.take(2).map(col): _*).toDF("eu", "ev")
      .where(col("eu") =!= col("ev"))
      .select(greatest(col("eu"), col("ev")).as("hi"),
        least(col("eu"), col("ev")).as("lo"))
      .distinct()
      .localCheckpoint()
    var done = isStarForest(e)
    var round = 0
    while (!done && round < maxRounds) {
      // large-star: m(a) = min over a's full neighborhood ∪ {a}; every
      // neighbor LARGER than a re-links to m(a).
      val sym = e.select(col("hi").as("a"), col("lo").as("b"))
        .union(e.select(col("lo").as("a"), col("hi").as("b")))
      val mins = sym.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val ls = sym.join(mins, "a")
        .where(col("b") > col("a"))
        .select(col("b").as("hi"), col("m").as("lo"))
        .distinct()
      // small-star: within each node's smaller-neighborhood ∪ {self},
      // link everything to the minimum.
      val mins2 = ls.groupBy("hi").agg(min("lo").as("m"))
      val joined = ls.join(mins2, "hi")
      val ss = joined.select(col("lo"), col("m"))
        .where(col("lo") =!= col("m"))
        .union(joined.select(col("hi"), col("m")).distinct())
        .toDF("hi", "lo")
        .distinct()
        .localCheckpoint()
      e = ss
      done = isStarForest(e)
      round += 1
    }
    require(done, s"connectedComponents: no fixpoint after $maxRounds rounds")
    // fixpoint is a star forest (node → root); roots label themselves
    e.select(col("hi").as("node"), col("lo").as("component"))
      .union(e.select(col("lo").as("node"), col("lo").as("component")))
      .distinct()
  }

  /** Duplicate-span detection (substring-level dedup, the Lee et al.
    * 2022 signal): the maximal token spans of each doc whose every
    * `n`-token shingle occurs at least `minOccurrences` times in the
    * corpus (another doc, or another position of the same doc).
    * Returns (doc_id, span_start, span_end, n_shingles) with 1-based
    * inclusive token indices.
    *
    * Shape: position-ordered 60-bit shingle hashes off the native
    * kernel (the 31-bit MinHash universe would birthday-collide at
    * corpus scale — duplicate-span keys on shingle IDENTITY), one
    * hash-keyed map-combined count to find duplicated shingles, an
    * equi-join back on the 8-byte hash (digests shuffle, text never
    * does), then gaps-and-islands per doc: adjacent duplicated
    * positions merge into maximal spans via the p − row_number()
    * island key — a doc-partitioned window, no global sort. */
  def duplicateSpans(docs: DataFrame, idCol: Column, text: Column,
                     n: Int, minOccurrences: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs
      .select(idCol.as("doc_id"), TextFns.tokens(text).as("toks"))
      .select(col("doc_id"),
        posexplode(TextFns.shingleHashes60(col("toks"), n)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("h"))
    val dup = sh.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minOccurrences).select(col("h"))
    sh.join(dup, Seq("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("p"))))
      .withColumn("grp", col("p") - col("rn"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_shingles"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_shingles"))
  }

  /** L99 — shingle CONTAINMENT (asymmetric near-dup): C = |A∩B| /
    * min(|A|, |B|) over distinct shingle sets — the signal Jaccard
    * structurally misses: a short doc pasted verbatim inside a much
    * longer one has tiny |∩|/|∪| but containment ≈ 1 (quotation
    * farms, boilerplate-wrapped reposts, doc-in-doc aggregation). One
    * row per flagged pair, oriented: `doc_small` is the contained
    * (smaller-set) side, ties broken to the lower id.
    *
    * Shingle sets and sizes follow the q27 capped-inverted-index
    * convention: per-(source, h) posting sets with `maxDf` df cap —
    * sizes count KEPT shingles, so the blow-up bound and the
    * ubiquitous-shingle semantics are exactly q27's (the cap is the
    * stop-shingle rule; cross-source containment belongs to MinHash).
    *
    * 100 TB shape: identical to q27 — ONE exchange builds the capped
    * index (collect_set straight to posting sets), pair fan-out is
    * bounded at maxDf·(maxDf−1)/2 per shingle, and the final frame is
    * pair-keyed (flagged pairs only). */
  /** The capped inverted-index pipeline shared by q27 (Jaccard) and
    * [[shingleContainment]] — ONE definition of the posting-set
    * semantics (null filters, df-cap placement, checkpoint rule, a<b
    * pair fan-out), so a cap or checkpoint-policy change cannot
    * silently diverge the two consumers.
    *
    * Returns (sizes, ni): per-doc KEPT-shingle counts and per-pair
    * shared-shingle counts. The explicit isnotnull filters and the
    * single collect_set exchange + localCheckpoint are the measured q27
    * shape (one exchange builds the whole index; the slim set frame
    * feeds both consumers — see the q27 narration for the 212→40 s
    * history). */
  /** Per-run memo of the materialized capped index (VERDICT r7 #3):
    * q27 and q139 are SEPARATE driver queries over the same documents
    * frame, and each used to rebuild (and re-checkpoint) the identical
    * index — at sf5 the build is ~20 s of the ~22 s either query
    * costs, so the pair paid it twice. Entries are keyed by session +
    * params and matched by `LogicalPlan.sameResult` on a normalized
    * input signature (never by hashCode alone — a collision here would
    * silently serve another corpus's index).
    *
    * Lifecycle (ADVICE r8): sessions are held via WEAK references and
    * entries whose session was collected or whose context stopped are
    * pruned on every lookup — a long-lived JVM hosting many sessions
    * (test suites, notebook kernels) never accumulates dead
    * checkpoint-pinning frames. The global lock covers only the list
    * scan/insert; the Spark jobs of the build run under a PER-ENTRY
    * lock, so concurrent sessions building different indexes never
    * serialize on each other. Caveat (documented, not detected): the
    * signature is the logical plan — rewriting the same input PATH
    * with different data mid-session serves the stale frame; new data
    * belongs in a new session or a new path. */
  private final class IndexEntry(
      val sessionRef: java.lang.ref.WeakReference[org.apache.spark.sql.SparkSession],
      val shingleN: Int, val maxDf: Int,
      val plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) {
    @volatile var frame: DataFrame = _
  }
  private val postingIndexCache =
    scala.collection.mutable.ListBuffer.empty[IndexEntry]

  /** The materialized PAIR-STATS frame: one row per intersecting doc
    * pair — (doc_a, doc_b, ni, na, nb) with doc_a < doc_b, ni = shared
    * kept shingles, na/nb = per-doc kept-shingle counts. Everything
    * q27's Jaccard and q139's containment need is a pure map+filter
    * over this frame. */
  private[graft] def cappedPostingCounts(docs: DataFrame, idCol: Column,
                                         sourceCol: Column, text: Column,
                                         shingleN: Int, maxDf: Int): DataFrame = {
    val input = docs.select(idCol.as("doc_id"), sourceCol.as("source"),
      text.as("_text"))
    val session = docs.sparkSession
    val sig = input.queryExecution.analyzed
    // find-or-insert under the global lock (list scan only — no Spark
    // jobs run while holding it), pruning dead sessions as we pass
    val entry = postingIndexCache.synchronized {
      postingIndexCache.filterInPlace { e =>
        val s = e.sessionRef.get()
        s != null && !s.sparkContext.isStopped
      }
      postingIndexCache.find { e =>
        (e.sessionRef.get() eq session) && e.shingleN == shingleN &&
          e.maxDf == maxDf && e.plan.sameResult(sig)
      }.getOrElse {
        val e = new IndexEntry(
          new java.lang.ref.WeakReference(session), shingleN, maxDf, sig)
        postingIndexCache += e
        e
      }
    }
    // the build's Spark jobs run under the entry's own lock: a second
    // caller for the SAME index waits for it, callers for other
    // indexes (other sessions / params) proceed concurrently
    entry.synchronized {
      if (entry.frame == null)
        entry.frame = buildCappedPairStats(input, shingleN, maxDf)
      entry.frame
    }
  }

  /** Free a localCheckpoint'ed frame's storage blocks. `Dataset
    * .unpersist` is a NO-OP here — checkpoint blocks belong to the
    * materialized RDD (a `LogicalRDD` leaf), not the CacheManager —
    * so walk the analyzed plan's leaves and unpersist the RDDs. */
  private[operators] def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        try lr.rdd.unpersist(blocking = false)
        catch { case _: Throwable => () }
      case _ => ()
    }

  /** Release every memoized pair-stats frame of `session` (unpersist
    * the localCheckpoint blocks, drop the entries). A sweep driver
    * calls this once the last index consumer has run — at sf20 the
    * pinned pair frame is GBs of storage memory that every later query
    * would otherwise pay for (the r9 q01-in-sweep-20× debris). Safe at
    * any time: the next [[cappedPostingCounts]] call simply rebuilds. */
  def releasePostingIndexes(session: org.apache.spark.sql.SparkSession): Unit =
    postingIndexCache.synchronized {
      postingIndexCache.filterInPlace { e =>
        val owned = e.sessionRef.get() eq session
        if (owned && e.frame != null) unpersistCheckpoint(e.frame)
        !owned
      }
    }

  private def buildCappedPairStats(input: DataFrame, shingleN: Int,
                                   maxDf: Int): DataFrame = {
    // r16 note: Tables.spread on `input` was tried and REVERTED — the
    // build is dominated by the (source,h) aggregate and pair fan-out
    // (already exchange-parallel), and the added exchange measured
    // q00 3.2 → 3.6-4.0 s in same-protocol A/B.
    val kept = input
      .select(col("doc_id"), col("source"),
        TextFns.tokens(col("_text")).as("toks"))
      // array_distinct BEFORE the explode: downstream is set-semantics
      // (collect_set / list_distinct in the oracle), so per-doc repeat
      // shingles are pure exchange traffic — dropping them map-side
      // shrinks the one index-building shuffle with no semantic change
      .select(col("doc_id"), col("source"),
        explode(array_distinct(
          TextFns.shingleHashes(col("toks"), shingleN))).as("h"))
      .filter(col("h").isNotNull && col("source").isNotNull)
      .groupBy(col("source"), col("h"))
      .agg(collect_set(col("doc_id")).as("ds"))
      .filter(size(col("ds")) <= maxDf)
      .select(col("ds"))
      .localCheckpoint() // posting sets; released below
    val sizes = kept.select(explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nset"))
    val ni = kept.filter(size(col("ds")) >= 2)
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ni"))
    // The pair fan-out + count + size joins are the dominant cost of
    // the pipeline (~16 s of either query's ~20 s at sf5 — the index
    // build is only ~4 s), and each of the two consumers used to
    // re-execute them. Materialize the fully-joined pair frame ONCE;
    // both consumers become a map+filter over it. `sizes` is doc-count
    // sized (one long per doc) — no forced broadcast: AQE broadcasts
    // it while it fits and falls back to a shuffle join at corpus
    // scale, where a forced broadcast would be the OOM.
    val pairs = ni
      .join(sizes.select(col("doc_id").as("doc_a"), col("nset").as("na")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nset").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("ni"), col("na"), col("nb"))
      .localCheckpoint()
    // consumers only ever touch the pair frame; free the posting-set
    // checkpoint blocks NOW (r9: `Dataset.unpersist` was a silent
    // no-op on a localCheckpoint — see unpersistCheckpoint)
    unpersistCheckpoint(kept)
    pairs
  }

  def shingleContainment(docs: DataFrame, idCol: Column, sourceCol: Column,
                         text: Column, shingleN: Int, maxDf: Int,
                         minContainment: Double): DataFrame = {
    cappedPostingCounts(docs, idCol, sourceCol, text, shingleN, maxDf)
      .select(
        when(col("na") <= col("nb"), col("doc_a")).otherwise(col("doc_b"))
          .as("doc_small"),
        when(col("na") <= col("nb"), col("doc_b")).otherwise(col("doc_a"))
          .as("doc_big"),
        col("ni").as("n_common"),
        least(col("na"), col("nb")).as("n_small"),
        greatest(col("na"), col("nb")).as("n_big"),
        (col("ni").cast("double") / least(col("na"), col("nb")))
          .as("containment"))
      .filter(col("containment") >= minContainment)
  }
}
