package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns
import graft.operators.{BloomPrune, Bpe, CharsetDecode, Curation, Dedup, Drift, FuzzyJoin, Gif, GraphRank, HeavyHitters, Html, Http, Jpeg, Mp3, Mp4, Multimodal, NaiveBayes, Packing, Pdf, Pii, Robots, Sampling, Similarity, Sitemap, Spectral, SuffixArray, Tar, Tiff, Warc, Wet}
import graft.operators.{Avro, DomainSuffix, ParquetFile, TxLog, Zip}
import TextFns._

/** Driver-contract queries for the LLM-data-pipeline operator family
  * (builder brief; SURVEY.md §7.2 step 11): dedup (exact, MinHash-LSH,
  * SimHash, n-gram Jaccard), embedding similarity (brute force + LSH
  * ANN), text analysis (stats, language ID, winnowing fingerprints) and
  * multimodal binary plumbing — each with a bit-exact DuckDB oracle
  * (shared constants are interpolated into both sides from one Scala
  * value; see [[graft.functions.TextFns]] for the parity rules).
  */
object LlmQueries {

  private val ShingleN = 3
  private val NumHashes = 16
  private val NumBands = 4
  private val RowsPerBand = 4
  private val WinnowW = 5
  /** q27 stop-shingle cap: a shingle present in more than this many docs
    * of one source block is dropped before the inverted-index self-join
    * (bounds per-shingle co-occurrence fanout at 100 TB; block-ubiquitous
    * shingles carry no near-dup signal). */
  private val MaxShingleDf = 25
  private val TopK = 5
  /** q76 collocations: keep bigrams seen ≥ this often; report the top K. */
  private val MinBigramCount = 3
  private val BigramK = 30
  /** q77 mixture schedule: rows in the emitted schedule head. */
  private val MixN = 200
  /** q80 unigram-LM quality gate: flag a doc when its summed negative
    * log-likelihood exceeds this many nats per token (the synthetic
    * vocabulary is ~uniform at ln(V) ≈ 3.7 nats, so the flag cuts
    * through the actual score distribution instead of being vacuous). */
  private val NllFlagNats = 3.7
  /** q81 duplicate-span shingle width (tokens). */
  private val DupSpanN = 5
  /** q171 suffix-array cap: suffix order to 32 chars = a 32-char exact
    * substring-dedup threshold; bounds prefix doubling at 5 rounds. */
  private val SaCap = 32

  /** q176 NB weak-supervision label: "quality" = at least this many
    * tokens (the corpus median — both classes stay populated). */
  private val NbMinToks = 56
  /** q172 duplicate-span threshold: a 16-char exact repeat marks a
    * duplicated substring (567 adjacent pairs at sf0.01). */
  private val SaDupMin = 16
  /** q173 fuzzy-join edit-distance threshold (FastSS neighborhood k). */
  private val FuzzyK = 2
  /** q82 tokens reported per source. */
  private val TopTokK = 8
  /** q85 TextRank: power-iteration count, damping, reported head. */
  private val TextRankIters = 3
  private val TextRankDamping = 0.85
  private val TextRankK = 25
  /** q86 centroid quantization (the q60 Lloyd rule). */
  private val PurityQuantBits = 20
  private val Dim = 64
  /** Probe sample for the similarity/recall queries: every 100th vec_id
    * WITHIN the first [[ProbeCap]] ids — a FIXED evaluation set (50
    * probes at the driver embedding density) rather than a fraction of
    * the corpus. An uncapped `% 100` probe rule grows the probe set
    * linearly with the corpus, which turns every exact/recall arm into
    * O(n²/100) pair work — measured super-linear at sf5 (q66 101 s,
    * q73 19 s isolated). Retrieval recall is evaluated on a fixed query
    * sample; the corpus is what scales. Ids below 5000 are identical at
    * sf0.01/sf0.1, so driver-gate hashes are unchanged. */
  private val ProbeCap = 5000

  /** q153's encoder-LAYOUT truth (n_quant_tables, n_huff_tables,
    * h_max, v_max, restart_interval), probed from one JDK-encoded
    * gray fixture at oracle-build time (ADVICE r8: these are
    * vendor/version-dependent encoder choices; hard-coded constants
    * silently flip the gate to fixture drift on a JDK upgrade). The
    * probe is an INDEPENDENT ~30-line marker walk — deliberately NOT
    * `Jpeg.decode`, so the oracle never reads the engine's own answer. */
  private lazy val jdkGrayJpegLayout: (Int, Int, Int, Int, Int) = {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bo)
    val b = bo.toByteArray
    var nQ = 0; var nH = 0; var hM = 0; var vM = 0; var dri = 0
    var pos = 2 // past SOI
    var done = false
    while (!done && pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) pos += 1
      else (b(pos + 1) & 0xff) match {
        case 0xd8 | 0x01 => pos += 2
        case mk if mk >= 0xd0 && mk <= 0xd7 => pos += 2
        case 0xda | 0xd9 => done = true // scan data / EOI: layout is done
        case mk =>
          val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
          val seg = pos + 4; val end = pos + 2 + len
          mk match {
            case 0xdb => // DQT: each entry 1 + 64 (8-bit) / 128 bytes
              var p = seg
              while (p < end) {
                val pq = (b(p) & 0xff) >> 4
                nQ += 1; p += 1 + (if (pq == 0) 64 else 128)
              }
            case 0xc4 => // DHT: each entry 1 + 16 counts + sum(counts)
              var p = seg
              while (p < end) {
                var s = 0; var i = 0
                while (i < 16) { s += b(p + 1 + i) & 0xff; i += 1 }
                nH += 1; p += 17 + s
              }
            case 0xc0 => // SOF0: prec(1) h(2) w(2) nc(1), 3 bytes/comp
              val nc = b(seg + 5) & 0xff
              var i = 0
              while (i < nc) {
                val hv = b(seg + 6 + 3 * i + 1) & 0xff
                hM = math.max(hM, hv >> 4); vM = math.max(vM, hv & 15)
                i += 1
              }
            case 0xdd =>
              dri = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
            case _ => ()
          }
          pos = end
      }
    }
    require(nQ > 0 && nH > 0 && hM > 0 && vM > 0,
      s"JDK gray-JPEG layout probe failed: nQ=$nQ nH=$nH hM=$hM vM=$vM")
    (nQ, nH, hM, vM, dri)
  }
  private def isProbeId(c: Column): Column = c % 100 === 0 && c < ProbeCap
  private val sqlProbeId = s"vec_id % 100 = 0 AND vec_id < 5000"
  /** q135/q136 PQ subspace count (Dim 64 → 4 × 16-dim subspaces). */
  private val PqM = 4
  private val NumPlanes = 8

  /** q92 hard-negative target bucket population: negatives want wider
    * buckets than near-dup (q38's 8 fixed planes), so the auto-sizer
    * aims for ~125 peers per bucket at every SF. */
  private val HnTargetBucket = 125L
  /** q73's data-sized LSH config: ≈ log2(corpus / target bucket size)
    * planes (8 buckets for the 500-vector sf0.01 corpus), searched with
    * Hamming-1 multi-probe. */
  private val MpPlanes = 3

  /** q48 per-stratum sample rates (per mille, by `lang`); order is the
    * CASE/when chain order on both sides. */
  private val SampleRates = Seq("en" -> 900, "de" -> 500, "fr" -> 250)
  private val SampleDefault = 100

  /** q50 curation config: denylist terms scrubbed to a single token,
    * quality gate (min tokens + a stopword floor as the integer-pure
    * `stops·50 >= n_tokens`), then keeper-dedup and the q48 sample. */
  private val DenyTerms = Seq("customer", "supplier")
  private val ScrubToken = "<ent>"
  private val CurateMinTokens = 30
  private val StopWords = Seq("the", "a", "of", "and")

  /** q52 token budget per packed training chunk. */
  private val PackBudget = 10000

  /** q53 contamination threshold: an eval doc is contaminated by a train
    * doc when they share at least this many distinct shingles. */
  private val ContamMinShared = 5
  /** q167: Jaccard threshold above which the higher-id doc of a
    * verified near-dup pair is dropped. */
  private val NearDupJ = 0.8

  /** q54 repetition gates, integer-pure: repetitive iff duplicate
    * 2-grams exceed 1/Dup2Den of all 2-grams OR the mode token covers
    * more than 1/ModeDen of the doc. */
  private val Dup2Den = 10
  private val ModeDen = 5

  /** q55 per-stratum repeat factors (per mille: 1000 = keep, 500 =
    * halve, 2300 = 2.3× upsample) — the multilingual temperature-mixing
    * weights. */
  private val ResampleFactors = Seq("en" -> 500, "de" -> 1500, "fr" -> 2300)
  private val ResampleDefault = 1000

  /** q56 vocabulary cut: a token is in-vocab (common) iff its corpus
    * occurrence count × RareDfRatio ≥ the document count — a
    * scale-relative threshold, so the same query is non-vacuous at
    * every SF. */
  private val RareDfRatio = 10

  /** q57 BM25 parameters (the Robertson/Lucene defaults) and the fixed
    * query-term set. Every fp constant is interpolated from ONE Scala
    * double into both the Spark plan and the SQL text (`Double.toString`
    * is shortest-round-trip, so both engines parse the identical bits —
    * e.g. K1+1 may not print "2.2"). */
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25K1p1 = Bm25K1 + 1.0
  private val Bm25OneMinusB = 1.0 - Bm25B
  private val Bm25Terms = Seq("table", "spark", "merge", "row")

  /** q60 Lloyd-update quantization: component values are scaled by an
    * exact power of two and floored to integers before the per-cell
    * mean, so the centroid-update sum is exact integer math on both
    * engines (a raw double sum would be partial-agg-order-sensitive). */
  private val LloydQuantBits = 20

  /** q95 boilerplate grams: width and the within-source doc-frequency
    * threshold (a gram in ≥ num/den of a source's docs is boilerplate).
    * 1/10 measured non-vacuous at BOTH driver SFs: the synthetic 2-gram
    * df tail tops out at ~13% of a source block at sf0.1, ~30% at
    * sf0.01 — a 15% line would select nothing at sf0.1. */
  private val BoilerN = 2
  private val BoilerNum = 1
  private val BoilerDen = 10
  /** q96 per-source document cap. */
  private val CapK = 10
  /** q99 shard-plan fan-out. */
  private val NumShards = 8
  /** q101 truncation-recall dims (of the full [[Dim]]). */
  private val TruncDims = Seq(16, 32)
  /** q102 leakage-safe split: train share (per mille) and salt. */
  private val SplitPerMille = 900
  private val SplitSalt = "split42"
  /** q103 overlap matrix: shingles in more sources than this are
    * corpus-ubiquitous — no pairing signal, O(sources²) join rows —
    * and are dropped (the q27 df-cap one level up). Non-vacuous at
    * sf0.1 (3-shingle spread tops out at 17 sources). */
  private val MaxOverlapSources = 10

  /** q61 chunking geometry: `ChunkSize`-token windows every
    * `ChunkStride` tokens (overlap = size − stride). */
  private val ChunkSize = 40
  private val ChunkStride = 30

  /** q105 block-dedup width (tokens per block). 16 keeps multiple
    * blocks per synthetic doc at every SF, so reassembly is exercised
    * with real drops. */
  private val BlockTok = 16
  /** q106 coverage vocabulary size — small enough that the synthetic
    * corpus has real OOV mass at both driver SFs. */
  private val OovVocabK = 25

  /** q109 reliability-diagram bin count. */
  private val CalibBins = 10

  /** q111 DSIR hash-bucket count — small enough that every bucket is
    * populated at sf0.001, large enough that the en/raw ratio varies
    * across buckets. */
  private val DsirBuckets = 256

  /** q113 content-defined chunk modulus (expected chunk length in
    * tokens) — small enough that synthetic docs carry several chunks. */
  private val CdcModulus = 8

  /** q114 bigram-LM interpolation weight on the conditional term. */
  private val BigramLambda = 0.75

  /** q116 CMS geometry + audit size: width 16 is deliberately TIGHT
    * against the synthetic ~31-token vocabulary so bucket collisions —
    * the thing the audit measures — actually occur at every SF (width
    * 512 produced all-zero overestimates at sf0.01: vacuous). */
  private val CmsDepth = 4
  private val CmsWidth = 16
  private val CmsAuditK = 30

  /** q117 RRF constant (the canonical k=60) and fused-list size. */
  private val RrfK = 60
  private val RrfTopN = 100

  /** q121 priority-sample size + salt. */
  private val PrioN = 100
  private val PrioSalt = "ps42"

  /** q122 JL output dimensionality (64 → 8) and FIXED probe-set size —
    * ids are dense from 0, so `vec_id < 32` is 32 probes (496 pairs) at
    * every SF: the pair frame must not grow with the corpus (the
    * SCALE.md corpus-fraction-probe lesson). */
  private val JlK = 8
  private val JlProbes = 32

  /** q125 outlier-shortlist size per label. */
  private val OutlierK = 5

  /** q126 PCM window width in samples (int16 → 8-byte windows). */
  private val PcmWin = 4

  /** q128 pooling-group width (vec_id div 8 → 8 members per group). */
  private val PoolGroup = 8

  /** q129 bootstrap: fixed 500-doc sample, 50 resamples, 5–95% CI. */
  private val BootSampleN = 500L
  private val BootB = 50
  private val BootLo = 5
  private val BootHi = 95
  private val BootSalt = "boot7"

  /** q130 CUSUM: 1-hour buckets; alarm at 0.4% of the N·T deviation
    * scale — flags the top ~decile of drift on the synthetic stream
    * (non-vacuous both ways: most buckets stay quiet). */
  private val CusumBucketSec = 3600L
  private val CusumThrNum = 4L
  private val CusumThrDen = 1000L

  /** q123 LSH-eval sample (FIXED 200 dense ids → ≤ 19 900 ground-truth
    * pairs at every SF) and truth threshold 1/4. The synthetic sample's
    * pair-Jaccard is bimodal (3 pairs ≥ 0.5; everything else < 0.0625),
    * so the gate pins the sharp verdict: the 16-hash/4-band config
    * finds ALL planted near-dups with ZERO false candidates
    * (P = R = 1.0) — any band-config regression (fewer bands, coarser
    * rows) flips one of the five counters. */
  private val EvalSampleN = 200L
  private val EvalJacNum = 1
  private val EvalJacDen = 4

  /** q62 vocabulary size (top-K tokens by occurrence) — smaller than
    * the synthetic corpus's distinct-token count at every SF, so the
    * K-boundary cut (and its tie-break) is actually exercised by the
    * oracle gate. */
  private val VocabK = 20

  /** Language keyword profiles (first-max order is the tie-break). */
  /** q150's synthesized small-vocab merges artifact (rank = index):
    * the fixture stands in for a real merges.txt, with compositional
    * depth (the→ther needs th→the needs t+h; ing needs in) so the gate
    * exercises rank priority, not just single merges. Outputs are
    * distinct by construction (Bpe.tokenize guards it). */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "i" -> "n", "a" -> "n", "r" -> "e", "o" -> "n",
    "e" -> "r", "th" -> "e", "an" -> "d", "in" -> "g", "e" -> "n",
    "o" -> "r", "e" -> "s", "a" -> "t", "o" -> "u", "i" -> "t",
    "a" -> "l", "s" -> "t", "the" -> "r", "er" -> "s", "on" -> "g")

  /** The q150/q151 DuckDB BPE replay, shared: `fin` holds each word's
    * fixpoint token list after the identical one-merge-per-step loop. */
  private lazy val sqlBpeFinCte: String = {
    val rankCase = BpeMerges.zipWithIndex.map { case ((l, r), k) =>
      s"WHEN seq[i+1]='$l' AND seq[i+2]='$r' THEN $k"
    }.mkString("CASE ", " ", " END")
    s"""WITH RECURSIVE
      w AS (SELECT doc_id, CAST(i + 1 AS INT) AS wi, toks[i + 1] AS word
            FROM (SELECT doc_id, $sqlToks AS toks FROM documents),
              LATERAL (SELECT unnest(range(len(toks))) AS i)
            WHERE toks[i + 1] <> ''),
      it AS (
        SELECT doc_id, wi,
          list_transform(range(length(word)),
            i -> substr(word, CAST(i + 1 AS INT), 1)) AS seq
        FROM w
        UNION ALL
        SELECT doc_id, wi,
          list_slice(seq, 1, p - 1)
            || [seq[p] || seq[p + 1]]
            || list_slice(seq, p + 2, len(seq)) AS seq
        FROM (SELECT doc_id, wi, seq,
                list_position(rks,
                  list_min(list_filter(rks, x -> x IS NOT NULL))) AS p
              FROM (SELECT doc_id, wi, seq,
                      list_transform(range(len(seq) - 1),
                        i -> $rankCase) AS rks
                    FROM it) rk
              WHERE list_min(list_filter(rks, x -> x IS NOT NULL))
                IS NOT NULL) stepped),
      fin AS (SELECT doc_id, wi, seq FROM (
          SELECT doc_id, wi, seq,
            list_min(list_filter(list_transform(range(len(seq) - 1),
              i -> $rankCase), x -> x IS NOT NULL)) AS best
          FROM it) f
        WHERE best IS NULL)"""
  }

  /** token string → id, mirroring Bpe's id rule (codepoint | 1000+rank). */
  private lazy val sqlBpeIdCase: String =
    BpeMerges.zipWithIndex.map { case ((l, r), k) =>
      s"WHEN tok='${l + r}' THEN ${1000 + k}"
    }.mkString("CASE ", " ", " ELSE unicode(tok) END")

  /** Merges learned by q157 (kept small: the oracle unrolls one CTE
    * block per round). */
  private val BpeTrainN = 6

  /** q157's oracle: the ENTIRE training loop replayed in DuckDB, one
    * unrolled CTE block per round — pc_i (pair counts over the evolving
    * vocab tokenization, weighted by word frequency), b_i (argmax with
    * the (cnt DESC, l, r) tie-break), a_i (recursive: merge the
    * LEFTMOST occurrence of b_i until none — equivalent to the engine's
    * one-pass left-to-right application, see Bpe.applyMergeCol's
    * scaladoc for the law), t_i (the fixpoint rows feeding round i+1).
    * LEFT JOIN ON true (not a cross join) so an exhausted b_i passes
    * the vocab through unchanged instead of annihilating it. */
  private def sqlBpeTrainOracle(n: Int): String = {
    def occ = (t: String, b: String) =>
      s"""list_position(list_transform(range(len($t.seq) - 1),
            j -> $t.seq[CAST(j + 1 AS INT)] = $b.l
              AND $t.seq[CAST(j + 2 AS INT)] = $b.r), true)"""
    def stage(i: Int): String = {
      val prev = s"t${i - 1}"
      s""",
      pc$i AS (SELECT seq[CAST(j + 1 AS INT)] AS l,
            seq[CAST(j + 2 AS INT)] AS r, sum(freq) AS cnt
          FROM $prev, LATERAL (SELECT unnest(range(len(seq) - 1)) AS j)
          GROUP BY 1, 2),
      b$i AS (SELECT l, r, cnt FROM pc$i ORDER BY cnt DESC, l, r LIMIT 1),
      a$i AS (
        SELECT word, freq, seq FROM $prev
        UNION ALL
        SELECT word, freq,
          list_slice(seq, 1, p - 1) || [l || r]
            || list_slice(seq, CAST(p + 2 AS INT), len(seq)) AS seq
        FROM (SELECT t.word, t.freq, t.seq, b.l, b.r,
                ${occ("t", "b")} AS p
              FROM a$i t LEFT JOIN b$i b ON true) s
        WHERE p IS NOT NULL AND p > 0),
      t$i AS (SELECT word, freq, seq FROM (
          SELECT t.word, t.freq, t.seq, ${occ("t", "b")} AS p
          FROM a$i t LEFT JOIN b$i b ON true) z
        WHERE p IS NULL OR p = 0)"""
    }
    val unionAll = (1 to n).map { i =>
      s"""SELECT CAST(${i - 1} AS BIGINT) AS merge_rank, l AS pair_left,
        r AS pair_right, CAST(cnt AS BIGINT) AS pair_count FROM b$i"""
    }.mkString(" UNION ALL ")
    s"""WITH RECURSIVE
      w0 AS (SELECT toks[CAST(i + 1 AS INT)] AS word, count(*) AS freq
          FROM (SELECT $sqlToks AS toks FROM documents),
            LATERAL (SELECT unnest(range(len(toks))) AS i)
          WHERE toks[CAST(i + 1 AS INT)] <> ''
          GROUP BY 1),
      t0 AS (SELECT word, freq,
          list_transform(range(length(word)),
            i -> substr(word, CAST(i + 1 AS INT), 1)) AS seq
        FROM w0)""" + (1 to n).map(stage).mkString + "\n" + unionAll
  }

  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "query", "fast"),
    "de" -> Seq("window", "batch", "group", "merge"),
    "fr" -> Seq("table", "join", "line", "sort"),
    "es" -> Seq("data", "row", "stream", "filter"),
    "zh" -> Seq("spark", "scan", "big", "small"))

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  /** The id feed for the codec-synthesis gates (media/pages/rows =
    * one synthesized artifact per doc_id). r16: spread across the box
    * — the single-file single-row-group input layout made every
    * synthesis+decode pipeline a ONE-task stage (all of a 2 s JPEG
    * gate on one of 32 cores); `Tables.spread` fans out only when the
    * planned scan cannot cover the cluster, so production layouts are
    * untouched. Shuffles 8-byte ids, never media bytes. */
  private def mediaIds(s: SparkSession, dir: String): Dataset[Long] = {
    import s.implicits._
    Tables.spread(docs(s, dir).select(col("doc_id")).as[Long])
  }

  /** q234's fixture TEMPLATE (r15 — VERDICT r14 #8: at sf5 the gate's
    * record measured its own 9.8k single-file own-writer build, not
    * the merge; its isolated number was WORSE than in-sweep because
    * the sweep had warmed the page cache). The 1-file-per-256-ids
    * layout builds ONCE per (session, dir) into a shared immutable
    * template; each gate run commits a fresh per-run log whose v0
    * references the template's data files — the timed region holds
    * the MERGE. Returns v0's add lines. Bench calls this untimed via
    * the query's `prepare` hook; Verify and ad-hoc runs hit the same
    * memoization on first use. */
  /** 48-bit md5 prefix of `dir` — MEMOIZED-fixture keys must not ride
    * 32-bit String.hashCode (ADVICE r16: a hashCode collision between
    * two data dirs would silently serve the first dir's memoized
    * fixture to the second; md5 makes that practically impossible). */
  private def dirMd5(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString

  /** Delete a template tree on JVM exit (ADVICE r16: the data-file
    * templates leaked one warehouse per application under tmpdir —
    * repeated large-SF runs accumulated unbounded tmp usage). */
  private val cleanupRegistered =
    scala.collection.mutable.Set.empty[String]
  private def deleteTreeOnExit(path: String): Unit =
    cleanupRegistered.synchronized {
      if (cleanupRegistered.add(path))
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          def del(f: java.io.File): Unit = {
            if (f.isDirectory)
              Option(f.listFiles()).toSeq.flatten.foreach(del)
            f.delete(): Unit
          }
          del(new java.io.File(path))
        }))
    }

  private val lakemdLock = new Object
  private def lakemdTemplate(s: SparkSession, dir: String): Seq[String] =
    lakemdLock.synchronized {
      import s.implicits._
      val tpl = s"${System.getProperty("java.io.tmpdir")}/graft_lakemd_tpl_" +
        s.sparkContext.applicationId + "_" + dirMd5(dir)
      deleteTreeOnExit(tpl)
      val marker = new java.io.File(s"$tpl/lines.txt")
      if (!marker.isFile) {
        def del(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).toSeq.flatten.foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(tpl))
        new java.io.File(s"$tpl/data").mkdirs(): Unit
        val lines = docs(s, dir)
          .select((col("doc_id") / 256).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("lang"))
          .as[(Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._2)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._2)),
              graft.operators.ParquetWrite.OptLongCol("n_chars",
                rows.map(r => if (r._2 % 9 == 0) null
                  else java.lang.Long.valueOf(r._3))),
              graft.operators.ParquetWrite.StrCol("lang",
                rows.map(_._4))))
            val p = s"$tpl/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            val st = graft.operators.ParquetFile.parse(g, bytes)
              .filter(r => r.valid && r.col_path == "doc_id" &&
                r.has_stats)
            (g, s"""{"add":{"path":"$p","size":${rows.length}""" +
              s""","min_key":${st.map(_.min_long).min}""" +
              s""","max_key":${st.map(_.max_long).max}}}""")
          }
          .collect().sortBy(_._1).map(_._2).toSeq
        java.nio.file.Files.write(marker.toPath,
          lines.mkString("\n").getBytes("UTF-8")): Unit
      }
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(marker.toPath)).asScala
        .toSeq.filter(_.nonEmpty)
    }

  /** q263's fixture TEMPLATE (r16 — the q234/lakemdTemplate pattern,
    * VERDICT r15 #9's discipline): the gate's CREATE + bootstrap
    * INSERT (half the documents table through the SQL catalog writer)
    * built the same immutable table every run INSIDE the timed region,
    * ~2.5 s of fixture at sf0.1 before the first DML under test. Build
    * it ONCE per (session, dir) under a template warehouse; each run
    * copies the few-KB log + props sidecar into its fresh warehouse —
    * v0/v1 reference the template's absolute data paths, the DML under
    * test rewrites into the run's own data dir (merge never mutates
    * input files, so the template stays immutable; the q234/L218
    * zero-copy precedent). Bench builds the template untimed via the
    * query's `prepare` hook; Verify hits the memoization on first use. */
  private val sqlw263Lock = new Object
  private def sqlw263Template(s: SparkSession, dir: String): String =
    sqlw263Lock.synchronized {
      // the template CATALOG name must carry the dir hash: Spark
      // caches catalog instances per NAME per session, so one name
      // serving two test dirs would keep the first dir's warehouse.
      // md5, not String.hashCode: a 32-bit collision between two dirs
      // would silently serve the first dir's MEMOIZED data to the
      // second (the per-run paths elsewhere only risk path reuse,
      // never a wrong memoized fixture).
      val hex = dirMd5(dir)
      val cat = s"graft_c263t_$hex"
      val tpl = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw263tpl_" +
        s.sparkContext.applicationId + "_" + hex
      deleteTreeOnExit(tpl)
      val marker = new java.io.File(s"$tpl/done.txt")
      if (!marker.isFile) {
        sqlLakeReset(s, cat, tpl)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q263_tpl_src")
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db"): Unit
        s.sql(s"""CREATE TABLE $cat.db.t (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake`"""): Unit
        s.sql(s"INSERT INTO $cat.db.t " +
          "SELECT doc_id, n_chars, lang FROM q263_tpl_src " +
          "WHERE doc_id % 2 = 0"): Unit
        java.nio.file.Files.write(marker.toPath,
          "ok".getBytes("UTF-8")): Unit
      }
      tpl
    }

  /** Clone a template table's METADATA (log dir + props sidecar) into
    * a fresh warehouse — a few small text files; the data paths inside
    * the add actions are absolute, so the clone reads the template's
    * immutable files. */
  private def sqlwCloneMeta(tpl: String, base: String,
      rel: String): Unit = {
    import java.nio.file.{Files, Paths}
    val logSrc = new java.io.File(s"$tpl/$rel/log")
    val logDst = s"$base/$rel/log"
    def cp(src: java.io.File, dst: String): Unit = {
      new java.io.File(dst).mkdirs(): Unit
      Option(src.listFiles()).toSeq.flatten.foreach { f =>
        if (f.isDirectory) cp(f, s"$dst/${f.getName}")
        else Files.copy(f.toPath, Paths.get(s"$dst/${f.getName}")): Unit
      }
    }
    cp(logSrc, logDst)
    val props = new java.io.File(s"$tpl/$rel/props.json")
    if (props.isFile)
      Files.copy(props.toPath,
        Paths.get(s"$base/$rel/props.json")): Unit
    new java.io.File(s"$base/$rel/data").mkdirs(): Unit
  }

  /** Register a LakeCatalog under `name` rooted at `base` and wipe the
    * warehouse (the SQL-surface gates bootstrap per run; the catalog
    * instance is cached per session, so `base` must be stable within
    * one session — it carries the applicationId only). */
  private def sqlLakeReset(s: SparkSession, name: String,
      base: String): Unit = {
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(del)
      f.delete(): Unit
    }
    del(new java.io.File(base))
    new java.io.File(base).mkdirs(): Unit
    s.conf.set(s"spark.sql.catalog.$name", "graft.sources.LakeCatalog")
    s.conf.set(s"spark.sql.catalog.$name.warehouse", base)
  }

  /** The q258 delete key set — deterministic, shared verbatim with the
    * DuckDB oracle text. */
  private val SqlDeleteKeys: Seq[Long] = (0 until 40).map(_ * 7L)

  private val sqlToks = sqlTokens("text")

  /** Shared artifact builder for the Parquet-reader family: Spark's
    * real writer lays the four-column projection out under the
    * requested codec/dictionary/block options; returns the file
    * bytes as a media Dataset for the codec seam. */
  private def parquetArtifactMedia(s: SparkSession, dir: String,
      tag: String, codec: String, dict: Boolean,
      blockSize: Int,
      writerVersion: String = "PARQUET_1_0",
      extraOpts: Map[String, String] = Map.empty)
      : Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    // per-run artifact path (the q142/q146 rule: no cross-run race)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_pqp_" +
      tag + "_" + s.sparkContext.applicationId + "_" +
      java.lang.Integer.toHexString(dir.hashCode)
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete(): Unit
    }
    del(new java.io.File(base))
    docs(s, dir).select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      .repartition(1).sortWithinPartitions("doc_id")
      .write.option("compression", codec)
      .option("parquet.block.size", blockSize.toString)
      .option("parquet.enable.dictionary", dict.toString)
      .option("parquet.writer.version", writerVersion)
      .options(extraOpts)
      .parquet(base)
    s.read.format("binaryFile").load(base)
      .filter(col("path").endsWith(".parquet"))
      .select(lit(0L), col("content")).as[(Long, Array[Byte])]
  }

  /** q203/q204/q207 shared body: per-column value aggregates decoded
    * from the pages by the dependency-free reader. */
  private def parquetPages(s: SparkSession, dir: String, tag: String,
      codec: String, dict: Boolean): DataFrame = {
    val media = parquetArtifactMedia(s, dir, tag, codec, dict,
      256 * 1024)
    ParquetFile.decodeColumnSums(media).toDF()
      .where(col("valid"))
      .groupBy(col("col_path"))
      .agg(sum(col("n_values")).as("n_values"),
        sum(col("n_nonnull")).as("n_nonnull"),
        sum(col("sum_long")).as("sum_long"),
        sum(col("sum_blen")).as("sum_blen"),
        sum(col("sum_bytes")).as("sum_bytes"))
  }

  /** q212/q213 shared body — the lakehouse TABLE-FORMAT layer above
    * the parquet reader: a Delta-protocol-style transaction log
    * (JSON-lines action files, one directory per commit version) is
    * WRITTEN to disk from deterministic formulas, read back as real
    * files, and folded into a snapshot by the protocol's resolution
    * rule — per path, the action with the highest version wins; the
    * path exists iff that action is an `add`. `asOf < 0` resolves the
    * latest snapshot; otherwise time-travels to commit `asOf`.
    *
    * Action formulas per doc d (V=12 commits):
    *  - add at `va = d % 12` with size `n_chars`;
    *  - if d%2==0: remove at `vr = va + 1 + d%5` (when ≤ 11);
    *  - if d%4==0 and the remove landed: RE-ADD at
    *    `va2 = vr + 1 + d%3` (when ≤ 11) with size `n_chars + 7` —
    *    the add-after-remove case a naive "was it ever removed"
    *    resolver gets wrong.
    *
    * 100 TB shape: the log is tiny next to the data it describes;
    * the fold is ONE path-keyed exchange (window latest-wins). */
  /** Write the deterministic V-commit action log (the formulas shared
    * with [[deltaOracle]]) as REAL files under `base`, one directory per
    * commit version. `onePerCommit` coalesces each commit to a single
    * JSON-lines file — the atomic-commit shape of a production log
    * (fixture-side serialization; the LOG is metadata-sized by design).
    * Returns false when the corpus is empty (no commit dirs written). */
  private def writeDeltaLog(s: SparkSession, dir: String, base: String,
      v: Int, onePerCommit: Boolean = false): Boolean = {
    val last = v - 1
    val d = docs(s, dir).select(col("doc_id"),
      col("n_chars").cast("long").as("n_chars"))
    val va = col("doc_id") % v
    val vr = va + lit(1) + col("doc_id") % 5
    val va2 = vr + lit(1) + col("doc_id") % 3
    val adds = d.select(va.as("version"),
      to_json(struct(
        struct(concat(lit("part-"), col("doc_id")).as("path"),
          col("n_chars").as("size")).as("add"))).as("value"))
    val removes = d.where(col("doc_id") % 2 === 0 && vr <= last)
      .select(vr.as("version"),
        to_json(struct(
          struct(concat(lit("part-"), col("doc_id")).as("path"))
            .as("remove"))).as("value"))
    val readds = d.where(col("doc_id") % 4 === 0 && vr <= last &&
        va2 <= last)
      .select(va2.as("version"),
        to_json(struct(
          struct(concat(lit("part-"), col("doc_id")).as("path"),
            (col("n_chars") + 7).as("size")).as("add"))).as("value"))
    val all = adds.unionAll(removes).unionAll(readds)
    (if (onePerCommit) all.coalesce(1) else all)
      .write.partitionBy("version").text(base)
    Option(new java.io.File(base).listFiles())
      .exists(_.exists(_.getName.startsWith("version=")))
  }

  /** Memoized on-disk action-log FIXTURE shared by the txlog gates
    * (r16 — the q234/lakemdTemplate pattern, and VERDICT r15 #9's
    * explicit prepare-hook ask for q218): [[writeDeltaLog]]'s output
    * is an immutable function of (dir, v, onePerCommit), so it is
    * built ONCE per (session, dir) and every gate run reads it; the
    * timed region holds the log READER under test (replay /
    * checkpoint write+resolve / streaming tail), not the 175k-row
    * fixture write. Bench pre-warms via each query's `prepare` hook;
    * Verify and ad-hoc runs hit the same memoization on first use.
    * Returns the log root, or None when the corpus is empty (no
    * commit dirs were written). */
  private val dlogTplLock = new Object
  private def deltaLogTemplate(s: SparkSession, dir: String, v: Int,
      onePerCommit: Boolean): Option[String] = dlogTplLock.synchronized {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_dltpl_" +
      v + (if (onePerCommit) "c" else "") + "_" +
      s.sparkContext.applicationId + "_" + dirMd5(dir)
    deleteTreeOnExit(base)
    val marker = new java.io.File(s"$base/done.txt")
    if (!marker.isFile) {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(del)
        f.delete(): Unit
      }
      del(new java.io.File(base))
      new java.io.File(base).mkdirs(): Unit
      val has = writeDeltaLog(s, dir, s"$base/log", v, onePerCommit)
      java.nio.file.Files.write(marker.toPath,
        (if (has) "1" else "0").getBytes("UTF-8")): Unit
    }
    if (new String(java.nio.file.Files.readAllBytes(marker.toPath),
        "UTF-8").startsWith("1")) Some(s"$base/log")
    else None
  }

  private def deltaSnapshot(s: SparkSession, dir: String, tag: String,
      asOf: Long): DataFrame = {
    import s.implicits._
    // read the log back as REAL files; the commit version lives in
    // the directory name, exactly where a reader must find it.
    // (Empty corpus → an empty log: no commit dirs to glob — resolve
    // against the empty action frame instead of a PATH_NOT_FOUND.)
    // r16: the 12-commit log comes from the shared memoized fixture
    // (one copy serves q212 AND q213 — the content never depended on
    // `tag`); the timed region is the replay resolver only.
    val tpl = deltaLogTemplate(s, dir, 12, onePerCommit = false)
    val hasCommits = tpl.isDefined
    val base = tpl.getOrElse("")
    val acts =
      if (!hasCommits)
        Seq.empty[(Long, String, Long, String)]
          .toDF("version", "add_path", "add_size", "rm_path")
          .select(col("version"), col("add_path"), col("add_size"),
            col("rm_path"))
      else {
        val log = s.read.text(s"$base/version=*")
          .withColumn("version", regexp_extract(input_file_name(),
            "version=(\\d+)", 1).cast("long"))
        log.select(col("version"),
          get_json_object(col("value"), "$.add.path").as("add_path"),
          get_json_object(col("value"), "$.add.size").cast("long")
            .as("add_size"),
          get_json_object(col("value"), "$.remove.path").as("rm_path"))
      }
    val bounded = if (asOf >= 0) acts.where(col("version") <= asOf)
                  else acts
    val norm = bounded.select(col("version"),
      coalesce(col("add_path"), col("rm_path")).as("path"),
      col("add_path").isNotNull.as("is_add"), col("add_size"))
    val w = Window.partitionBy(col("path"))
      .orderBy(col("version").desc)
    norm.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("is_add"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("add_size")).as("sum_size"),
        sum(regexp_extract(col("path"), "part-(\\d+)", 1)
          .cast("long")).as("sum_doc"))
  }

  /** The oracle replay of [[writeDeltaLog]]'s action formulas: FULL
    * REPLAY semantics — the gate for both the replay resolver
    * (q212/q213) and the checkpointed/streamed resolvers (q217/q218),
    * which must be bit-identical to replay. */
  private def deltaOracle(asOf: Long, v: Int = 12): String = {
    val last = v - 1
    val bound = if (asOf >= 0) asOf else last.toLong
    s"""WITH d AS (SELECT doc_id, n_chars, doc_id % $v AS va,
            doc_id % $v + 1 + doc_id % 5 AS vr,
            doc_id % $v + 2 + doc_id % 5 + doc_id % 3 AS va2
          FROM documents),
        st AS (SELECT doc_id, n_chars,
            CASE
              WHEN doc_id % 4 = 0 AND vr <= $last AND va2 <= $last
                AND va2 <= $bound THEN 'readd'
              WHEN doc_id % 2 = 0 AND vr <= $last AND vr <= $bound
                THEN 'gone'
              WHEN va <= $bound THEN 'live'
              ELSE 'never' END AS state
          FROM d)
      SELECT CAST(count(*) FILTER (WHERE state IN ('live', 'readd'))
          AS BIGINT) AS n_files,
        CAST(sum(CASE WHEN state = 'live' THEN n_chars
          WHEN state = 'readd' THEN n_chars + 7 END) AS BIGINT)
          AS sum_size,
        CAST(sum(CASE WHEN state IN ('live', 'readd') THEN doc_id END)
          AS BIGINT) AS sum_doc
      FROM st"""
  }

  /** lang/source are ASCII in the table, so DuckDB's per-char `ord`
    * equals the decoder's unsigned UTF-8 byte sum; `strlen` is the
    * byte length. */
  private val ParquetPagesOracle: String =
    """SELECT 'doc_id' AS col_path,
        CAST(count(*) AS BIGINT) AS n_values,
        CAST(count(doc_id) AS BIGINT) AS n_nonnull,
        CAST(sum(doc_id) AS BIGINT) AS sum_long,
        CAST(0 AS BIGINT) AS sum_blen, CAST(0 AS BIGINT) AS sum_bytes
      FROM documents
      UNION ALL SELECT 'lang', CAST(count(*) AS BIGINT),
        CAST(count(lang) AS BIGINT), CAST(0 AS BIGINT),
        CAST(sum(strlen(lang)) AS BIGINT),
        CAST(sum(list_sum(list_transform(range(1, len(lang) + 1),
          i -> ord(lang[i])))) AS BIGINT) FROM documents
      UNION ALL SELECT 'n_chars', CAST(count(*) AS BIGINT),
        CAST(count(n_chars) AS BIGINT), CAST(sum(n_chars) AS BIGINT),
        CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM documents
      UNION ALL SELECT 'source', CAST(count(*) AS BIGINT),
        CAST(count(source) AS BIGINT), CAST(0 AS BIGINT),
        CAST(sum(strlen(source)) AS BIGINT),
        CAST(sum(list_sum(list_transform(range(1, len(source) + 1),
          i -> ord(source[i])))) AS BIGINT) FROM documents"""

  /** Shared DuckDB oracle fragments for the PQ family (q135/q136/q145):
    * per-subspace assignment CTEs (`a0/w0 … a{m-1}/w{m-1}`), the join
    * chain attaching each winning sub-centroid, and the list-slice
    * reconstruction expression — ONE definition of the sub-codebook
    * argmax so a tie-break or slice-bound fix cannot diverge across the
    * three gates (the `Similarity.sqlDotD` precedent). Expects CTEs
    * `e(vec_id, embedding, …)` and `c(cent_id, cemb, …)` in scope. */
  private def sqlPqFragments: (String, String, String) = {
    val sub = Dim / PqM
    def dotSub(a: String, b: String, off: Int) =
      s"""list_reduce(list_transform(range(1, ${sub + 1}),
          i -> $a[$off + i]::DOUBLE * $b[$off + i]::DOUBLE),
          (x, y) -> x + y)"""
    val winCtes = (0 until PqM).map { m =>
      val off = m * sub
      s"""a$m AS (SELECT e.vec_id, c.cent_id,
            (${dotSub("e.embedding", "c.cemb", off)}
              / sqrt(${dotSub("e.embedding", "e.embedding", off)}
                * ${dotSub("c.cemb", "c.cemb", off)})) AS csim
          FROM e, c),
        w$m AS (SELECT vec_id, cent_id FROM
          (SELECT *, row_number() OVER
             (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk
           FROM a$m) WHERE rk = 1)"""
    }.mkString(",\n          ")
    val wJoins = (0 until PqM).map(m =>
      s"JOIN w$m ON w$m.vec_id = e.vec_id " +
        s"JOIN c c$m ON c$m.cent_id = w$m.cent_id").mkString(" ")
    val reconExpr = (0 until PqM).map(m =>
      s"c$m.cemb[${m * sub + 1}:${(m + 1) * sub}]").mkString(" || ")
    (winCtes, wJoins, reconExpr)
  }

  /** Shared DuckDB CTE prefix for the MinHash-LSH pipeline (tokens →
    * shingle hashes → signatures → bands → candidate pairs → shingle
    * sets) — interpolated into both the q25 and q47 oracles so the two
    * stay definitionally identical. */

  /** The shared q167/q199 curation DAG — scrub → quality gate → exact
    * dedup → MinHash-LSH near-dedup → decontamination vs the `src0`
    * eval source → per-source packing → weighted-round-robin mixture
    * schedule → range-shard layout. `corpus`: (doc_id, source, text).
    * Every stage is the operator its own gate pins (q50/q24/q25/q88/
    * q143/q77/q164), composed; q167 feeds it the documents table,
    * q199 the WET text derived from archive bytes. */
  private def curationShards(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evalDocs = corpus.where(col("source") === "src0")
    val train = corpus.where(col("source") =!= "src0")
    // scrub + quality gate (the q50 stage, minus sampling)
    val scrub = train.select(col("doc_id"), col("source"),
      col("text"), Dedup.contentKey(col("text")).as("ckey"),
      tokens(TextFns.redactDenylist(col("text"), DenyTerms, ScrubToken))
        .as("toks"))
    val stats = scrub.select(col("doc_id"), col("source"),
      col("text"), col("ckey"), size(col("toks")).as("n_tokens"),
      size(filter(col("toks"), t => t.isin(StopWords: _*))).as("stops"))
    val gated = stats.where(col("n_tokens") >= CurateMinTokens &&
      col("stops") * 50 >= col("n_tokens"))
    // exact dedup: keep the min doc_id per content key
    val keepers = gated
      .withColumn("_keep",
        min(col("doc_id")).over(Window.partitionBy(col("ckey"))))
      .where(col("doc_id") === col("_keep"))
      .drop("_keep", "ckey", "stops")
    // near-dedup: banded LSH candidates, Jaccard-verified; drop the
    // HIGHER id of every confirmed pair (doc_a < doc_b by
    // construction, so survivors are the per-pair minima)
    val sigs = Dedup.minhashSignatures(keepers, col("doc_id"),
      col("text"), ShingleN, NumHashes)
    val cand = Dedup.lshCandidatePairs(sigs, NumBands, RowsPerBand)
    val sets = Dedup.shingleSets(keepers, col("doc_id"), col("text"),
      ShingleN)
    val nearDup = Dedup.jaccardVerify(cand, sets)
      .where(col("jaccard") >= NearDupJ)
      .select(col("doc_b").as("doc_id")).distinct()
    val uniq = keepers.join(nearDup, Seq("doc_id"), "left_anti")
    // decontamination: drop survivors sharing >= ContamMinShared
    // distinct shingles with the eval source (the q88 stage)
    val contaminated = BloomPrune.contaminatedTrainDocs(evalDocs, uniq,
        col("doc_id"), col("text"), ShingleN, ContamMinShared)
      .select(col("t_id").as("doc_id"))
    val clean = uniq.join(contaminated, Seq("doc_id"), "left_anti")
    // pack per source (the q143 stage), then the chunk-level
    // weighted round-robin schedule (the q77 law lifted to chunks)
    val spans = Packing.packSpans(
      clean.select(col("doc_id"), col("source"), col("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), PackBudget, "flag")
    val w = (lit(1) + regexp_extract(col("source"), "([0-9]+)", 1)
      .cast("int") % 3).cast("double")
    val chunks = spans.groupBy(col("source"), col("chunk_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("doc_off") > 0, 1L).otherwise(0L)).as("n_carried"),
        sum(col("span_len")).as("chunk_tokens"))
      .withColumn("sched_vt", (col("chunk_id").cast("double") + 1) / w)
      // r16: MATERIALIZE the chunk frame before the rangeShards fan-out
      // (guide §3.3 "materialising an intermediate truncates the plan").
      // rangeShards references its input ~6x (hist→bucketed→sums/cuts→
      // offs/bounds + the final join); without the cut each copy
      // carries the WHOLE curation DAG — 27 documents scans in the
      // plan, 4.1 s of Catalyst optimization alone at sf0.1, and 26
      // scalar subqueries for AQE to replan. The chunk frame is
      // chunk-count-sized (corpus_tokens / PackBudget rows — metadata,
      // not corpus), so the checkpoint is tiny at any scale; the heavy
      // corpus pipeline is planned and executed exactly once. The cut
      // can be disabled (spark.graft.curation.cut=false) so the plan
      // contract tests can still pin the UPSTREAM shuffle-key budget
      // on one un-severed plan; results are identical either way.
    val cut = corpus.sparkSession.conf
      .get("spark.graft.curation.cut", "true").toBoolean
    val chunksCut = if (cut) chunks.localCheckpoint() else chunks
    // shard layout over the schedule's virtual time (the q164
    // operator): disjoint ordered vt ranges per shard
    graft.operators.Layout.rangeShards(chunksCut, col("sched_vt"), NumShards)
      .select(col("source"), col("chunk_id"), col("n_spans"),
        col("n_carried"), col("chunk_tokens"), col("sched_vt"),
        col("shard"))
  }

  /** Literal-list helpers for the q200 synthesis oracle: the shared
    * constant tables cross the engine boundary as exact double/int
    * literals (`Double.toString` round-trips, DuckDB parses to the
    * identical IEEE value), so no libm call runs on either side. */
  private def sqlD(xs: Seq[Double]): String =
    xs.map(java.lang.Double.toString).mkString("[", ", ", "]")
  private def sqlI(xs: Seq[Int]): String = xs.mkString("[", ", ", "]")

  /** q200/q223: replay the synthesis chain from the fixture
    * formulas — spectral lines/scalefactors/gains from the writer's
    * mixes, then requant → IMDCT → window → overlap-add (densified
    * over the (granule, subband) grid so tails cross silent granules
    * exactly like the decoder's carry buffer) → inversion → step-0
    * matrixing; every float table a literal, every sum ascending.
    * ONE definition for ALL three gates (the sqlDotD precedent):
    * `btExpr` yields the per-granule BLOCK TYPE — "0" replays the
    * all-long q200 fixture; the q223 CASE adds SHORT granules
    * (subblock gains, window scalefactors, the (sfb, window, line)
    * reorder, three 12-point IMDCTs into the 36-sample hybrid grid);
    * the q225 cycle adds START/STOP granules (long-shaped transforms
    * under the asymmetric transition windows). */
  private def sqlMp3SynthOracle(btExpr: String,
      scfsiExpr: String = "0"): String = {
    val wsfExpr = btExpr
    val zero36 = "list_transform(range(36), zz -> 0.0)"
    s"""WITH tabs AS (SELECT
          ${sqlD(Mp3.ImdctCos.toSeq)} AS imt,
          ${sqlD(Mp3.SynthWin.toSeq)} AS wint,
          ${sqlD(Mp3.MatrixCos.toSeq)} AS matt,
          ${sqlD(Mp3.GainTab.toSeq)} AS gaint,
          ${sqlD(Mp3.SfTab(0).toSeq)} AS sft0,
          ${sqlD(Mp3.SfTab(1).toSeq)} AS sft1,
          ${sqlI(Mp3.Slen1.toSeq)} AS sl1,
          ${sqlI(Mp3.Slen2.toSeq)} AS sl2,
          ${sqlI(Mp3.Pretab.toSeq)} AS pret,
          ${sqlI(Mp3.BandMap(0).toSeq)} AS bm0,
          ${sqlI(Mp3.BandMap(1).toSeq)} AS bm1,
          ${sqlI(Mp3.BandMap(2).toSeq)} AS bm2,
          ${sqlD(Mp3.ImdctCosS.toSeq)} AS imts,
          ${sqlD(Mp3.SynthWinS.toSeq)} AS wins,
          ${sqlD(Mp3.SynthWinStart.toSeq)} AS wst1,
          ${sqlD(Mp3.SynthWinStop.toSeq)} AS wst3,
          ${sqlD(Mp3.SbGainTab.toSeq)} AS sgt,
          ${sqlI(Mp3.ShortWinMap(0).toSeq)} AS swm0,
          ${sqlI(Mp3.ShortWinMap(1).toSeq)} AS swm1,
          ${sqlI(Mp3.ShortWinMap(2).toSeq)} AS swm2,
          ${sqlI(Mp3.ShortSfbMap(0).toSeq)} AS ssb0,
          ${sqlI(Mp3.ShortSfbMap(1).toSeq)} AS ssb1,
          ${sqlI(Mp3.ShortSfbMap(2).toSeq)} AS ssb2,
          ${sqlI(Mp3.ShortFreqMap(0).toSeq)} AS sfr0,
          ${sqlI(Mp3.ShortFreqMap(1).toSeq)} AS sfr1,
          ${sqlI(Mp3.ShortFreqMap(2).toSeq)} AS sfr2,
          ${sqlI(Mp3.MixedLongBand.toSeq)} AS bml36,
          ${sqlI(Mp3.MixedWinMap(0).toSeq)} AS mwm0,
          ${sqlI(Mp3.MixedWinMap(1).toSeq)} AS mwm1,
          ${sqlI(Mp3.MixedWinMap(2).toSeq)} AS mwm2,
          ${sqlI(Mp3.MixedSfbMap(0).toSeq)} AS msb0,
          ${sqlI(Mp3.MixedSfbMap(1).toSeq)} AS msb1,
          ${sqlI(Mp3.MixedSfbMap(2).toSeq)} AS msb2,
          ${sqlI(Mp3.MixedFreqMap(0).toSeq)} AS mfr0,
          ${sqlI(Mp3.MixedFreqMap(1).toSeq)} AS mfr1,
          ${sqlI(Mp3.MixedFreqMap(2).toSeq)} AS mfr2),
      m AS (SELECT doc_id AS media_id, 2 + doc_id % 4 AS nf,
            doc_id % 14 AS seed, doc_id % 3 AS sri FROM documents),
      gr AS (SELECT media_id, seed, sri, i, g, 2 * i + g AS gseq,
            2 + ((seed + i) * 5 + g * 7) % 24 AS bv,
            1 + (seed + i + g) % 6 AS n1,
            ((seed + i) * 3 + g) % 256 AS gg,
            (i + g) % 16 AS sfc,
            (seed + i + g) % 2 AS pre,
            (seed + g) % 2 AS ss,
            $wsfExpr AS bt,
            (seed + i + g) % 8 AS sbg0,
            (seed + i + g + 1) % 8 AS sbg1,
            (seed + i + g + 2) % 8 AS sbg2
          FROM m, LATERAL (SELECT unnest(range(nf)) AS i) ii,
                 LATERAL (SELECT unnest(range(2)) AS g) gg2),
      ln AS (
        SELECT media_id, sri, gseq, seed, i, g, gg, sfc, pre, ss,
            bt, sbg0, sbg1, sbg2,
            2 * k AS idx, (seed + i + g + k) % 2 AS raw,
            (seed + k) % 2 AS sgn
          FROM gr, LATERAL (SELECT unnest(range(bv)) AS k) kk
        UNION ALL
        SELECT media_id, sri, gseq, seed, i, g, gg, sfc, pre, ss,
            bt, sbg0, sbg1, sbg2,
            2 * k + 1, (seed + 2 * i + g + k) % 2, (i + k) % 2
          FROM gr, LATERAL (SELECT unnest(range(bv)) AS k) kk
        UNION ALL
        SELECT media_id, sri, gseq, seed, i, g, gg, sfc, pre, ss,
            bt, sbg0, sbg1, sbg2,
            2 * bv + 4 * k, (seed + i + k) % 2, (seed + k) % 2
          FROM gr, LATERAL (SELECT unnest(range(n1)) AS k) kk
        UNION ALL
        SELECT media_id, sri, gseq, seed, i, g, gg, sfc, pre, ss,
            bt, sbg0, sbg1, sbg2,
            2 * bv + 4 * k + 1, (i + g + k) % 2, (i + k) % 2
          FROM gr, LATERAL (SELECT unnest(range(n1)) AS k) kk
        UNION ALL
        SELECT media_id, sri, gseq, seed, i, g, gg, sfc, pre, ss,
            bt, sbg0, sbg1, sbg2,
            2 * bv + 4 * k + 2, (seed + g + k) % 2, (g + k) % 2
          FROM gr, LATERAL (SELECT unnest(range(n1)) AS k) kk
        UNION ALL
        SELECT media_id, sri, gseq, seed, i, g, gg, sfc, pre, ss,
            bt, sbg0, sbg1, sbg2,
            2 * bv + 4 * k + 3, (seed + i + g + k) % 2, k % 2
          FROM gr, LATERAL (SELECT unnest(range(n1)) AS k) kk),
      xr AS (
        SELECT media_id, gseq, bt,
            CAST(idx // 18 AS BIGINT) AS sb, CAST(idx % 18 AS BIGINT) AS ii,
            (CASE WHEN sgn = 1 THEN -1.0 ELSE 1.0 END)
              * gaint[gg + 1]
              * (CASE WHEN ss = 1 THEN sft1 ELSE sft0 END)[
                  CAST(CASE WHEN bd < 21 THEN
                    (CASE WHEN g = 1 AND (($scfsiExpr) //
                        (CASE WHEN bd < 6 THEN 8 WHEN bd < 11 THEN 4
                         WHEN bd < 16 THEN 2 ELSE 1 END)) % 2 = 1
                      THEN (seed + i + bd) % (CASE sl0 WHEN 0 THEN 1
                        WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
                        ELSE 16 END)
                      ELSE (seed + i + g + bd) % (CASE sl WHEN 0 THEN 1
                        WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
                        ELSE 16 END) END)
                    + pre * pret[bd + 1]
                  ELSE 0 END + 1 AS INT)] AS v
          FROM (SELECT *,
              (CASE sri WHEN 0 THEN bm0 WHEN 1 THEN bm1
                 ELSE bm2 END)[CAST(idx + 1 AS INT)] AS bd,
              (CASE WHEN (CASE sri WHEN 0 THEN bm0 WHEN 1 THEN bm1
                 ELSE bm2 END)[CAST(idx + 1 AS INT)] < 11
                 THEN sl1[sfc + 1] ELSE sl2[sfc + 1] END) AS sl,
              (CASE WHEN (CASE sri WHEN 0 THEN bm0 WHEN 1 THEN bm1
                 ELSE bm2 END)[CAST(idx + 1 AS INT)] < 11
                 THEN sl1[CAST(i % 16 + 1 AS INT)]
                 ELSE sl2[CAST(i % 16 + 1 AS INT)] END) AS sl0
            FROM ln, tabs WHERE bt IN (0, 1, 3))
          WHERE raw = 1
        UNION ALL
        SELECT media_id, gseq, bt,
            CAST(f // 6 AS BIGINT) AS sb,
            CAST(sw * 6 + f % 6 AS BIGINT) AS ii,
            (CASE WHEN sgn = 1 THEN -1.0 ELSE 1.0 END)
              * gaint[gg + 1]
              * sgt[CAST((CASE sw WHEN 0 THEN sbg0 WHEN 1 THEN sbg1
                  ELSE sbg2 END) + 1 AS INT)]
              * (CASE WHEN ss = 1 THEN sft1 ELSE sft0 END)[
                  CAST(CASE WHEN sbd < 6 THEN
                      (seed + i + g + (sbd * 3 + sw))
                        % (CASE sl1[sfc + 1] WHEN 0 THEN 1
                           WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
                           ELSE 16 END)
                    WHEN sbd < 12 THEN
                      (seed + i + g + 18 + ((sbd - 6) * 3 + sw))
                        % (CASE sl2[sfc + 1] WHEN 0 THEN 1
                           WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
                           ELSE 16 END)
                    ELSE 0 END + 1 AS INT)] AS v
          FROM (SELECT *,
              (CASE sri WHEN 0 THEN swm0 WHEN 1 THEN swm1
                 ELSE swm2 END)[CAST(idx + 1 AS INT)] AS sw,
              (CASE sri WHEN 0 THEN ssb0 WHEN 1 THEN ssb1
                 ELSE ssb2 END)[CAST(idx + 1 AS INT)] AS sbd,
              (CASE sri WHEN 0 THEN sfr0 WHEN 1 THEN sfr1
                 ELSE sfr2 END)[CAST(idx + 1 AS INT)] AS f
            FROM ln, tabs WHERE bt = 2)
          WHERE raw = 1
        UNION ALL
        SELECT media_id, gseq, bt,  -- mixed (oracle code 4): LONG region
            CAST(idx // 18 AS BIGINT) AS sb,
            CAST(idx % 18 AS BIGINT) AS ii,
            (CASE WHEN sgn = 1 THEN -1.0 ELSE 1.0 END)
              * gaint[gg + 1]
              * (CASE WHEN ss = 1 THEN sft1 ELSE sft0 END)[
                  CAST((seed + i + g + bml36[CAST(idx + 1 AS INT)])
                    % (CASE sl1[sfc + 1] WHEN 0 THEN 1
                       WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
                       ELSE 16 END) + 1 AS INT)] AS v
          FROM ln, tabs
          WHERE bt = 4 AND raw = 1 AND idx < 36
        UNION ALL
        SELECT media_id, gseq, bt,  -- mixed: SHORT region (sfb 3..12)
            CAST(f // 6 AS BIGINT) AS sb,
            CAST(sw * 6 + f % 6 AS BIGINT) AS ii,
            (CASE WHEN sgn = 1 THEN -1.0 ELSE 1.0 END)
              * gaint[gg + 1]
              * sgt[CAST((CASE sw WHEN 0 THEN sbg0 WHEN 1 THEN sbg1
                  ELSE sbg2 END) + 1 AS INT)]
              * (CASE WHEN ss = 1 THEN sft1 ELSE sft0 END)[
                  CAST(CASE WHEN sbd < 6 THEN
                      (seed + i + g + (8 + (sbd - 3) * 3 + sw))
                        % (CASE sl1[sfc + 1] WHEN 0 THEN 1
                           WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
                           ELSE 16 END)
                    WHEN sbd < 12 THEN
                      (seed + i + g + 17 + ((sbd - 6) * 3 + sw))
                        % (CASE sl2[sfc + 1] WHEN 0 THEN 1
                           WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
                           ELSE 16 END)
                    ELSE 0 END + 1 AS INT)] AS v
          FROM (SELECT *,
              (CASE sri WHEN 0 THEN mwm0 WHEN 1 THEN mwm1
                 ELSE mwm2 END)[CAST(idx - 36 + 1 AS INT)] AS sw,
              (CASE sri WHEN 0 THEN msb0 WHEN 1 THEN msb1
                 ELSE msb2 END)[CAST(idx - 36 + 1 AS INT)] AS sbd,
              (CASE sri WHEN 0 THEN mfr0 WHEN 1 THEN mfr1
                 ELSE mfr2 END)[CAST(idx - 36 + 1 AS INT)] AS f
            FROM ln, tabs WHERE bt = 4 AND idx >= 36)
          WHERE raw = 1),
      xa AS (SELECT media_id, gseq, sb, max(bt) AS bt,
            list(struct_pack(ii := ii, v := v) ORDER BY ii) AS es
          FROM xr GROUP BY media_id, gseq, sb),
      z AS (SELECT media_id, gseq, sb,
            CASE WHEN bt = 2 OR (bt = 4 AND sb >= 2) THEN
              list_transform(range(36), n ->
                list_sum(list_transform(es, e ->
                  CASE WHEN n - 6 - 6 * (e.ii // 6) >= 0
                        AND n - 6 - 6 * (e.ii // 6) < 12
                    THEN wins[CAST(n - 6 - 6 * (e.ii // 6) + 1 AS INT)]
                       * imts[CAST((n - 6 - 6 * (e.ii // 6)) * 6
                           + e.ii % 6 + 1 AS INT)]
                       * e.v
                    ELSE 0.0 END)))
            ELSE
              list_transform(range(36), n ->
                (CASE bt WHEN 1 THEN wst1 WHEN 3 THEN wst3
                   ELSE wint END)[CAST(n + 1 AS INT)]
                * list_sum(list_transform(es, e ->
                  imt[CAST(n * 18 + e.ii + 1 AS INT)] * e.v)))
            END AS zw
          FROM xa, tabs),
      zg AS (SELECT g2.media_id, g2.gseq, s2.sb,
            coalesce(z.zw, $zero36) AS zw
          FROM (SELECT DISTINCT media_id, gseq FROM gr) g2
          CROSS JOIN (SELECT CAST(unnest(range(32)) AS BIGINT) AS sb) s2
          LEFT JOIN z ON z.media_id = g2.media_id
            AND z.gseq = g2.gseq AND z.sb = s2.sb),
      td AS (SELECT media_id, gseq, sb,
            list_transform(range(18), t ->
              (zw[CAST(t + 1 AS INT)]
                 + coalesce(pz, $zero36)[CAST(18 + t + 1 AS INT)])
              * (CASE WHEN sb % 2 = 1 AND t % 2 = 1
                 THEN -1.0 ELSE 1.0 END)) AS ts
          FROM (SELECT *, lag(zw) OVER
              (PARTITION BY media_id, sb ORDER BY gseq) AS pz FROM zg)),
      vv AS (SELECT media_id, gseq,
            list_transform(range(64), iq ->
              list_sum(list_transform(range(32), kq ->
                matt[CAST(iq * 32 + kq + 1 AS INT)]
                  * s32[CAST(kq + 1 AS INT)]))) AS vs
          FROM (SELECT media_id, gseq, list(ts[1] ORDER BY sb) AS s32
                FROM td GROUP BY media_id, gseq), tabs),
      fx AS (SELECT media_id, CAST(sum(CAST(floor(v * 1e9) AS BIGINT))
               AS BIGINT) AS sum_xr_q FROM xr GROUP BY media_id),
      ft AS (SELECT media_id, CAST(sum(q) AS BIGINT) AS sum_td_q FROM
            (SELECT media_id, CAST(list_sum(list_transform(ts, x ->
                CAST(floor(x * 1e9) AS BIGINT))) AS BIGINT) AS q FROM td)
            GROUP BY media_id),
      fv AS (SELECT media_id, CAST(sum(q) AS BIGINT) AS sum_v_q FROM
            (SELECT media_id, CAST(list_sum(list_transform(vs, x ->
                CAST(floor(x * 1e9) AS BIGINT))) AS BIGINT) AS q FROM vv)
            GROUP BY media_id)
    SELECT m.media_id, CAST(m.nf AS BIGINT) AS n_frames,
      coalesce(fx.sum_xr_q, 0) AS sum_xr_q,
      coalesce(ft.sum_td_q, 0) AS sum_td_q,
      coalesce(fv.sum_v_q, 0) AS sum_v_q,
      true AS valid
    FROM m LEFT JOIN fx ON m.media_id = fx.media_id
           LEFT JOIN ft ON m.media_id = ft.media_id
           LEFT JOIN fv ON m.media_id = fv.media_id"""
  }

  /** The shared q167/q199 curation ORACLE: the whole DAG as one CTE
    * chain; `corpusCtes` must define `evd` (eval docs) and `trd`
    * (train docs) over the documents table. */
  private def sqlCurationOracle(corpusCtes: String): String = {
    val stopsIn = StopWords.map(w => s"'$w'").mkString(", ")
    val lsh = sqlLshPairsCtesFrom("keepers")
    val svCte = graft.operators.Layout
      .sqlRangeShardOfValue("shardkeys", "k", NumShards)
    s"""WITH $corpusCtes,
          s0 AS (SELECT doc_id, lang, source, text,
              md5(array_to_string(list_sort(list_distinct($sqlToks)), ' ')) AS ckey,
              string_split_regex(trim(${sqlRedactDenylist("text", DenyTerms, ScrubToken)}),
                '\\s+') AS rtoks
            FROM trd),
          s1 AS (SELECT doc_id, lang, source, text, ckey,
              len(rtoks) AS n_tokens,
              len(list_filter(rtoks, t -> t IN ($stopsIn))) AS stops
            FROM s0),
          gated AS (SELECT * FROM s1
            WHERE n_tokens >= $CurateMinTokens AND stops * 50 >= n_tokens),
          keepers AS (SELECT doc_id, lang, source, text, n_tokens FROM
            (SELECT *, min(doc_id) OVER (PARTITION BY ckey) AS keep
             FROM gated) WHERE doc_id = keep),
          $lsh,
          nd AS (SELECT DISTINCT doc_b AS doc_id
            FROM pairs JOIN sets sa ON pairs.doc_a = sa.doc_id
                       JOIN sets sb ON pairs.doc_b = sb.doc_id
            WHERE len(list_intersect(sa.shset, sb.shset))::DOUBLE
                / (len(sa.shset) + len(sb.shset)
                   - len(list_intersect(sa.shset, sb.shset))) >= $NearDupJ),
          uniq AS (SELECT * FROM keepers
            WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
          evsh AS (SELECT DISTINCT unnest(list_distinct(
              ${sqlShingleHashes(sqlToks, ShingleN)})) AS h FROM evd),
          trsh AS (SELECT doc_id AS t_id, unnest(list_distinct(
              ${sqlShingleHashes(sqlToks, ShingleN)})) AS h
            FROM uniq),
          contaminated AS (SELECT t_id FROM trsh JOIN evsh USING (h)
            GROUP BY t_id HAVING count(*) >= $ContamMinShared),
          clean AS (SELECT * FROM uniq
            WHERE doc_id NOT IN (SELECT t_id FROM contaminated)),
          pk AS (SELECT doc_id, source, n_tokens,
              ${sqlHash60("CAST(doc_id AS VARCHAR) || ':flag'")} AS ph
            FROM clean),
          pc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
              ORDER BY ph, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM pk),
          st AS (SELECT doc_id, source, n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS st0
                 FROM pc WHERE n_tokens > 0),
          sp AS (SELECT doc_id, source, n_tokens, st0,
                   unnest(range(st0 // $PackBudget,
                     (st0 + n_tokens - 1) // $PackBudget + 1)) AS chunk_id
                 FROM st),
          spans AS (SELECT source, chunk_id,
              greatest(st0, chunk_id * $PackBudget) - st0 AS doc_off,
              least(st0 + n_tokens, (chunk_id + 1) * $PackBudget)
                - greatest(st0, chunk_id * $PackBudget) AS span_len
            FROM sp),
          chunks AS (SELECT source, CAST(chunk_id AS BIGINT) AS chunk_id,
              count(*) AS n_spans,
              CAST(sum(CASE WHEN doc_off > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_carried,
              CAST(sum(span_len) AS BIGINT) AS chunk_tokens,
              (CAST(chunk_id AS DOUBLE) + 1)
                / (1 + CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 3)
                AS sched_vt
            FROM spans GROUP BY source, chunk_id),
          shardkeys AS (SELECT sched_vt AS k FROM chunks),
          sv AS ($svCte)
        SELECT c.source, c.chunk_id, c.n_spans, c.n_carried,
          c.chunk_tokens, c.sched_vt, sv.shard
        FROM chunks c JOIN (SELECT DISTINCT k, shard FROM sv) sv
          ON c.sched_vt = sv.k"""
  }

  private def sqlLshPairsCtesFrom(from: String): String = {
    val hs = sqlShingleHashes("toks", ShingleN)
    val bandSelects = (0 until NumBands).map { b =>
      val key = (0 until RowsPerBand)
        .map(r => s"CAST(sig[${b * RowsPerBand + r + 1}] AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM s"
    }.mkString(" UNION ALL ")
    s"""t AS (SELECT doc_id, $sqlToks AS toks FROM $from),
          h AS (SELECT doc_id, $hs AS hs FROM t),
          s AS (SELECT doc_id, ${sqlMinhashSignature("hs", NumHashes)} AS sig
                FROM h WHERE len(hs) > 0),
          bands AS ($bandSelects),
          pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                    FROM bands a JOIN bands b
                      ON a.band = b.band AND a.band_key = b.band_key
                     AND a.doc_id < b.doc_id),
          sets AS (SELECT doc_id, list_distinct(hs) AS shset FROM h)"""
  }

  private lazy val sqlLshPairsCtes: String = sqlLshPairsCtesFrom("documents")

  val all: Map[String, Query] = Map(

    // ---- exact dedup: ONE shuffle keyed on the 32-byte content digest,
    // never on the text itself (the 100 TB rule: shuffle digests, not
    // documents). Catches word-order/whitespace permutations too.
    "q24_exact_dedup" -> Query(
      (s, dir) => Dedup.exactGroups(docs(s, dir), col("doc_id"),
          Dedup.contentKey(col("text")))
        .select(col("dup_key"), col("keeper_id"), col("n_docs")),
      Some(s"""SELECT md5(array_to_string(list_sort(list_distinct($sqlToks)), ' ')) AS dup_key,
          min(doc_id) AS keeper_id, count(*) AS n_docs
        FROM documents
        GROUP BY 1""")),

    // ---- MinHash-LSH near-dup: banded signatures, join only within
    // (band, band_key) buckets, then exact shingle-set Jaccard on the
    // candidates. 16 hashes / 4 bands / 4 rows.
    "q25_minhash_lsh" -> Query(
      (s, dir) => {
        val d = docs(s, dir)
        val sigs = Dedup.minhashSignatures(d, col("doc_id"), col("text"),
          ShingleN, NumHashes)
        val pairs = Dedup.lshCandidatePairs(sigs, NumBands, RowsPerBand)
        val sets = Dedup.shingleSets(d, col("doc_id"), col("text"), ShingleN)
        Dedup.jaccardVerify(pairs, sets)
          .select(col("doc_a"), col("doc_b"),
            col("n_common").cast("long").as("n_common"),
            col("n_union").cast("long").as("n_union"), col("jaccard"))
      },
      Some {
        s"""WITH $sqlLshPairsCtes
          SELECT doc_a, doc_b,
            CAST(len(list_intersect(sa.shset, sb.shset)) AS BIGINT) AS n_common,
            CAST(len(sa.shset) + len(sb.shset)
                 - len(list_intersect(sa.shset, sb.shset)) AS BIGINT) AS n_union,
            len(list_intersect(sa.shset, sb.shset))::DOUBLE
              / (len(sa.shset) + len(sb.shset)
                 - len(list_intersect(sa.shset, sb.shset))) AS jaccard
          FROM pairs JOIN sets sa ON pairs.doc_a = sa.doc_id
                     JOIN sets sb ON pairs.doc_b = sb.doc_id"""
      }),

    // ---- SimHash: per-row 32-bit signature (map-side only; near-dup
    // banding then reuses the LSH join shape on signature bytes).
    "q26_simhash" -> Query(
      (s, dir) => Dedup.simhashes(docs(s, dir), col("doc_id"), col("text"))
        .select(col("doc_id"), col("simhash")),
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          h AS (SELECT doc_id,
                  list_transform(toks, t -> ${sqlHash60("t")}) AS hs FROM t)
          SELECT doc_id, ${sqlSimhash32("hs")} AS simhash FROM h""")),

    // ---- blocked n-gram Jaccard via the INVERTED-INDEX join (never
    // pairwise array intersection): explode distinct shingles, drop
    // stop-shingles (doc frequency > MaxShingleDf within the block),
    // equi-join on (block, shingle) to count co-occurrences, derive
    // Jaccard from the capped set sizes. Linear in corpus +
    // co-occurrence rows — the quadratic all-pairs set intersection
    // (measured 26 s at sf0.1) never runs, and the frequency cap bounds
    // the remaining hazard: a shingle shared by every doc in a block
    // would still make co-occurrence quadratic WITHIN the block; capped,
    // each (block, shingle) contributes at most MaxShingleDf·(D-1)/2
    // pairs (VERDICT r3 #5). Dropping block-ubiquitous shingles is the
    // standard stop-word move — they carry no near-dup signal anyway.
    // Blocking key = source; cross-block near-dups are MinHash-LSH (q25).
    // ---- the 100 TB DRESS-REHEARSAL flagship (VERDICT r8 #5): one DAG
    // chaining the full curation line — L19/L42 scrub → L8 quality
    // gate → L1 exact dedup → L2 MinHash-LSH near-dedup → L22
    // decontamination vs the eval source → L21 sequence packing per
    // source → L41 chunk-level weighted-round-robin mixture schedule →
    // L117 deterministic range-shard layout over the schedule's
    // virtual time (chunks that train together land in the same shard
    // file). Every stage is the SAME operator the stage's own gate
    // pins (q50/q24/q25/q88/q143/q77/q164 semantics), composed; what
    // this gate adds is the COMPOSITION: survivors of each stage feed
    // the next, and the oracle replays the entire line as one CTE
    // chain — a drop lost or duplicated anywhere breaks the hash.
    // Plan shape pinned in PlanContractSpec (total exchange budget, no
    // SinglePartition, no NLJ).
    "q167_curation_flagship" -> Query(
      // r16: fan the narrow corpus scan out before the scrub/tokenize/
      // minhash map stages (one-task otherwise on the single-file
      // driver layout; no-op at production scan parallelism). q199
      // reaches curationShards through its robots aggregate, which is
      // already exchange-parallel — no spread needed there.
      (s, dir) => curationShards(Tables.spread(
        docs(s, dir).select(col("doc_id"), col("source"), col("text")))),
      Some(sqlCurationOracle(
        """evd AS (SELECT * FROM documents WHERE source = 'src0'),
          trd AS (SELECT * FROM documents WHERE source <> 'src0')"""))),

    // ---- the SHARED q27/q139 capped-index build as an EXPLICIT gated
    // stage (VERDICT r8 #4): the memoized pair-stats frame used to be
    // built by whichever consumer the sweep ran first (q139 by sort
    // order), so that query's in-sweep scale ratio carried ~20 s of
    // somebody else's work and flagged super-linear when the build
    // landed on a noisy heap. Named q00 so it sorts FIRST: the build
    // cost is measured once, on its own, right after warm-up — and
    // q27/q139 measure what they are, map+filter consumers. The gate
    // pins the stage's own semantics (the ni/sizes join both consumers
    // trust) bit-for-bit.
    "q00_pair_index_stage" -> Query(
      (s, dir) => graft.operators.Dedup.cappedPostingCounts(
        docs(s, dir), col("doc_id"), col("source"), col("text"),
        2, MaxShingleDf),
      Some(s"""WITH sets AS (SELECT doc_id, source,
            list_distinct(${sqlShingleHashes(sqlToks, 2)}) AS shset FROM documents),
          ex AS (SELECT doc_id, source, unnest(shset) AS h FROM sets),
          capped AS (SELECT doc_id, source, h FROM
            (SELECT *, count(*) OVER (PARTITION BY source, h) AS df FROM ex)
            WHERE df <= $MaxShingleDf),
          sizes AS (SELECT doc_id, count(*) AS nset FROM capped GROUP BY doc_id),
          ni AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
                 FROM capped a JOIN capped b
                   ON a.source = b.source AND a.h = b.h AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
          SELECT doc_a, doc_b, ni, sa.nset AS na, sb.nset AS nb
          FROM ni JOIN sizes sa ON ni.doc_a = sa.doc_id
                  JOIN sizes sb ON ni.doc_b = sb.doc_id""")),

    "q27_ngram_jaccard" -> Query(
      (s, dir) => {
        // ONE exchange builds the whole capped inverted index, and
        // since r8 the fully-joined PAIR-STATS frame is materialized
        // once per run and memoized across q27/q139 (measured history
        // at sf5: 212 s (AQE reuse missed), 90 s (reuse hit), 63 s
        // (checkpointed window form), ~40 s (shared-pipeline form),
        // ~22 s combined (memoized pair frame)); the pipeline is the
        // SHARED Dedup.cappedPostingCounts — one definition of the
        // posting-set semantics for q27 and q139, now also one
        // execution.
        graft.operators.Dedup.cappedPostingCounts(
          docs(s, dir), col("doc_id"), col("source"), col("text"),
          2, MaxShingleDf)
          .select(col("doc_a"), col("doc_b"),
            (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
          .filter(col("jaccard") >= 0.05)
      },
      Some(s"""WITH sets AS (SELECT doc_id, source,
            list_distinct(${sqlShingleHashes(sqlToks, 2)}) AS shset FROM documents),
          ex AS (SELECT doc_id, source, unnest(shset) AS h FROM sets),
          capped AS (SELECT doc_id, source, h FROM
            (SELECT *, count(*) OVER (PARTITION BY source, h) AS df FROM ex)
            WHERE df <= $MaxShingleDf),
          sizes AS (SELECT doc_id, count(*) AS nset FROM capped GROUP BY doc_id),
          ni AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
                 FROM capped a JOIN capped b
                   ON a.source = b.source AND a.h = b.h AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
          SELECT doc_a, doc_b,
            ni::DOUBLE / (sa.nset + sb.nset - ni) AS jaccard
          FROM ni JOIN sizes sa ON ni.doc_a = sa.doc_id
                  JOIN sizes sb ON ni.doc_b = sb.doc_id
          WHERE ni::DOUBLE / (sa.nset + sb.nset - ni) >= 0.05""")),

    // ---- shingle containment (L99): asymmetric near-dup — C = |∩| /
    // min(|A|,|B|) flags a short doc pasted inside a longer one, which
    // Jaccard structurally misses (tiny |∩|/|∪|). Same capped inverted
    // index as q27 (one exchange, df-capped posting sets, bounded pair
    // fan-out); output oriented small→big with low-id tie-break.
    "q139_containment" -> Query(
      (s, dir) => Dedup.shingleContainment(docs(s, dir), col("doc_id"),
        col("source"), col("text"), 2, MaxShingleDf, 0.6),
      Some(s"""WITH sets AS (SELECT doc_id, source,
            list_distinct(${sqlShingleHashes(sqlToks, 2)}) AS shset FROM documents),
          ex AS (SELECT doc_id, source, unnest(shset) AS h FROM sets),
          capped AS (SELECT doc_id, source, h FROM
            (SELECT *, count(*) OVER (PARTITION BY source, h) AS df FROM ex)
            WHERE df <= $MaxShingleDf),
          sizes AS (SELECT doc_id, count(*) AS nset FROM capped GROUP BY doc_id),
          ni AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
                 FROM capped a JOIN capped b
                   ON a.source = b.source AND a.h = b.h AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
          SELECT CASE WHEN sa.nset <= sb.nset THEN doc_a ELSE doc_b END
              AS doc_small,
            CASE WHEN sa.nset <= sb.nset THEN doc_b ELSE doc_a END
              AS doc_big,
            ni AS n_common, least(sa.nset, sb.nset) AS n_small,
            greatest(sa.nset, sb.nset) AS n_big,
            ni::DOUBLE / least(sa.nset, sb.nset) AS containment
          FROM ni JOIN sizes sa ON ni.doc_a = sa.doc_id
                  JOIN sizes sb ON ni.doc_b = sb.doc_id
          WHERE ni::DOUBLE / least(sa.nset, sb.nset) >= 0.6""")),

    // ---- brute-force cosine top-k: broadcast probes, map-side scoring,
    // per-probe rank window (no global sort). The correctness baseline
    // for q29's bucketed ANN.
    "q28_cosine_topk" -> Query(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(emb, emb.filter(isProbeId(col("vec_id"))), TopK)
          .select(col("probe_id"), col("rk").cast("long").as("rk"),
            col("cand_id"), col("cos"))
      },
      Some(s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
                FROM embeddings WHERE ${sqlProbeId}),
          scored AS (SELECT probe_id, vec_id AS cand_id,
                ${Similarity.sqlCosine("pe", "embedding", Dim)} AS cos
              FROM p, embeddings WHERE vec_id <> probe_id),
          r AS (SELECT *, row_number() OVER
                  (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                FROM scored)
          SELECT probe_id, rk, cand_id, cos FROM r WHERE rk <= $TopK""")),

    // ---- LSH-bucketed ANN: 8 hyperplane sign bits → 256 buckets; probes
    // meet only their bucket's corpus rows (~n/256 candidates at scale).
    "q29_ann_lsh" -> Query(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopK(emb, emb.filter(isProbeId(col("vec_id"))),
            3, NumPlanes, Dim)
          .select(col("probe_id"), col("bucket"),
            col("rk").cast("long").as("rk"), col("cand_id"), col("cos"))
      },
      Some(s"""WITH b AS (SELECT vec_id, embedding,
               ${Similarity.sqlLshBucket("embedding", NumPlanes, Dim)} AS bucket
             FROM embeddings),
          p AS (SELECT vec_id AS probe_id, embedding AS pe, bucket
                FROM b WHERE ${sqlProbeId}),
          cand AS (SELECT p.probe_id, p.bucket, b.vec_id AS cand_id,
                ${Similarity.sqlCosine("p.pe", "b.embedding", Dim)} AS cos
              FROM p JOIN b ON p.bucket = b.bucket AND b.vec_id <> p.probe_id),
          r AS (SELECT *, row_number() OVER
                  (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                FROM cand)
          SELECT probe_id, bucket, rk, cand_id, cos FROM r WHERE rk <= 3""")),

    // ---- IVF-style ANN: deterministic coarse-quantizer cells (corpus
    // rows vec_id%125==7 stand in for trained centroids), nearest-cell
    // assignment, probes search their 2 nearest cells. The second scale
    // path next to q29's hyperplane LSH.
    "q40_ann_ivf" -> Query(
      (s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir),
          isProbe = isProbeId(col("vec_id")),
          isCentroid = col("vec_id") % 125 === 7,
          k = TopK, nProbe = 2)
        .select(col("probe_id"), col("cell"),
          col("rk").cast("long").as("rk"), col("cand_id"), col("cos")),
      Some {
        val simEC = s"(${Similarity.sqlDotD("e.embedding", "c.cemb", Dim)} / sqrt(e.nn * c.cn))"
        val simPC = s"(${Similarity.sqlDotD("p.pe", "cl.ce", Dim)} / sqrt(p.pn * cl.cn2))"
        s"""WITH e AS (SELECT vec_id, embedding,
               ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
             FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb, nn AS cn
                FROM e WHERE vec_id % 125 = 7),
          a0 AS (SELECT e.vec_id, e.embedding, e.nn, c.cent_id,
                   $simEC AS csim
                 FROM e, c),
          a AS (SELECT *, row_number() OVER
                  (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crk
                FROM a0),
          cl AS (SELECT vec_id AS cand_id, cent_id AS cell,
                   embedding AS ce, nn AS cn2 FROM a WHERE crk = 1),
          p AS (SELECT vec_id AS probe_id, cent_id AS cell,
                  embedding AS pe, nn AS pn
                FROM a WHERE ${sqlProbeId} AND crk <= 2),
          cand AS (SELECT p.probe_id, p.cell, cl.cand_id, $simPC AS cos
                   FROM p JOIN cl ON p.cell = cl.cell
                    AND cl.cand_id <> p.probe_id),
          r AS (SELECT *, row_number() OVER
                  (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                FROM cand)
          SELECT probe_id, cell, rk, cand_id, cos FROM r WHERE rk <= $TopK"""
      }),

    // ---- retrieval QUALITY gate for the hyperplane-LSH ANN path: the
    // q29 hash gate proves determinism (its oracle mirrors the same
    // bucketing), not that buckets find true neighbors. This query
    // scores the bucketed search as recall@$TopK against the exact q28
    // search per probe (the q66 pattern), at the DATA-SIZED config:
    // planes ≈ log2(n / target bucket size) → 3 planes for this corpus,
    // plus Hamming-1 multi-probe. Measured floor on the driver data:
    // min 0.6 / mean 0.64 at sf0.01. The mis-sized plain 8-plane config
    // q29 pins (256 buckets over 500 vectors → ~2-row buckets) measures
    // ~0 recall on this near-random corpus — random embeddings are
    // LSH's worst case; the sizing rule and multi-probe are the knobs.
    "q73_lsh_recall" -> Query(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val probes = emb.where(isProbeId(col("vec_id")))
        val approx = Similarity.lshTopK(emb, probes, TopK, MpPlanes, Dim,
            multiProbe = true)
          .select(col("probe_id"), col("cand_id"))
        val exact = Similarity.bruteForceTopK(emb, probes, TopK)
          .select(col("probe_id"), col("cand_id"))
        val common = approx.join(exact, Seq("probe_id", "cand_id"))
          .groupBy(col("probe_id")).agg(count(lit(1)).as("n_common"))
        probes.select(col("vec_id").as("probe_id"))
          .join(common, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("n_common"), lit(0L)).as("n_common"),
            (coalesce(col("n_common"), lit(0L)).cast("double") / TopK).as("recall"))
      },
      Some(s"""WITH b AS (SELECT vec_id, embedding,
               ${Similarity.sqlLshBucket("embedding", MpPlanes, Dim)} AS bucket
             FROM embeddings),
          p AS (SELECT vec_id AS probe_id, embedding AS pe, bucket
                FROM b WHERE ${sqlProbeId}),
          px AS (SELECT probe_id, pe,
                   unnest(list_prepend(bucket, list_transform(
                     range(0, $MpPlanes),
                     pl -> xor(bucket, 1::BIGINT << pl)))) AS bucket
                 FROM p),
          cand AS (SELECT px.probe_id, b.vec_id AS cand_id,
                ${Similarity.sqlCosine("px.pe", "b.embedding", Dim)} AS cos
              FROM px JOIN b ON px.bucket = b.bucket AND b.vec_id <> px.probe_id),
          ar AS (SELECT probe_id, cand_id, row_number() OVER
                   (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                 FROM cand),
          e0 AS (SELECT vec_id, embedding,
                   ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
                 FROM embeddings),
          p2 AS (SELECT vec_id AS probe_id, embedding AS pe,
                   ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS pn
                 FROM embeddings WHERE ${sqlProbeId}),
          exx AS (SELECT p2.probe_id, e.vec_id AS cand_id,
                    (${Similarity.sqlDotD("p2.pe", "e.embedding", Dim)}
                      / sqrt(p2.pn * e.nn)) AS cos
                  FROM p2, e0 e WHERE e.vec_id <> p2.probe_id),
          er AS (SELECT probe_id, cand_id, row_number() OVER
                   (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                 FROM exx),
          j AS (SELECT a.probe_id, count(*) AS n_common
                FROM (SELECT * FROM ar WHERE rk <= $TopK) a
                JOIN (SELECT * FROM er WHERE rk <= $TopK) e
                  ON a.probe_id = e.probe_id AND a.cand_id = e.cand_id
                GROUP BY a.probe_id)
          SELECT p2.probe_id, CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
            CAST(coalesce(n_common, 0) AS DOUBLE) / $TopK AS recall
          FROM p2 LEFT JOIN j ON p2.probe_id = j.probe_id""")),

    // ---- retrieval QUALITY gate for q40's IVF ANN: recall@$TopK of the
    // nProbe=2 inverted-file search against the exact q28 search.
    // Measured floor on the driver data: min 0.2 / mean 0.48 at sf0.01
    // (probing 2 of the 4 cells on a near-random corpus — IVF degrades
    // gracefully where the same-budget LSH config drops to ~0; see
    // q73). `nProbe` and the cell count are the recall knobs; real
    // clustered embeddings push this toward 1.0 at the same budget.
    "q74_ivf_recall" -> Query(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val probes = emb.where(isProbeId(col("vec_id")))
        val approx = Similarity.ivfTopK(emb,
            isProbe = isProbeId(col("vec_id")),
            isCentroid = col("vec_id") % 125 === 7,
            k = TopK, nProbe = 2)
          .select(col("probe_id"), col("cand_id"))
        val exact = Similarity.bruteForceTopK(emb, probes, TopK)
          .select(col("probe_id"), col("cand_id"))
        val common = approx.join(exact, Seq("probe_id", "cand_id"))
          .groupBy(col("probe_id")).agg(count(lit(1)).as("n_common"))
        probes.select(col("vec_id").as("probe_id"))
          .join(common, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("n_common"), lit(0L)).as("n_common"),
            (coalesce(col("n_common"), lit(0L)).cast("double") / TopK).as("recall"))
      },
      Some {
        val simEC = s"(${Similarity.sqlDotD("e.embedding", "c.cemb", Dim)} / sqrt(e.nn * c.cn))"
        val simPC = s"(${Similarity.sqlDotD("p.pe", "cl.ce", Dim)} / sqrt(p.pn * cl.cn2))"
        s"""WITH e AS (SELECT vec_id, embedding,
               ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
             FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb, nn AS cn
                FROM e WHERE vec_id % 125 = 7),
          a0 AS (SELECT e.vec_id, e.embedding, e.nn, c.cent_id,
                   $simEC AS csim
                 FROM e, c),
          a AS (SELECT *, row_number() OVER
                  (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crk
                FROM a0),
          cl AS (SELECT vec_id AS cand_id, cent_id AS cell,
                   embedding AS ce, nn AS cn2 FROM a WHERE crk = 1),
          p AS (SELECT vec_id AS probe_id, cent_id AS cell,
                  embedding AS pe, nn AS pn
                FROM a WHERE ${sqlProbeId} AND crk <= 2),
          cand AS (SELECT p.probe_id, cl.cand_id, $simPC AS cos
                   FROM p JOIN cl ON p.cell = cl.cell
                    AND cl.cand_id <> p.probe_id),
          ar AS (SELECT probe_id, cand_id, row_number() OVER
                   (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                 FROM cand),
          exx AS (SELECT px.probe_id, e.vec_id AS cand_id,
                    (${Similarity.sqlDotD("px.pe", "e.embedding", Dim)}
                      / sqrt(px.pn * e.nn)) AS cos
                  FROM (SELECT vec_id AS probe_id, embedding AS pe, nn AS pn
                        FROM e WHERE ${sqlProbeId}) px, e
                  WHERE e.vec_id <> px.probe_id),
          er AS (SELECT probe_id, cand_id, row_number() OVER
                   (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                 FROM exx),
          j AS (SELECT a.probe_id, count(*) AS n_common
                FROM (SELECT * FROM ar WHERE rk <= $TopK) a
                JOIN (SELECT * FROM er WHERE rk <= $TopK) x
                  ON a.probe_id = x.probe_id AND a.cand_id = x.cand_id
                GROUP BY a.probe_id)
          SELECT probe_id, CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
            CAST(coalesce(n_common, 0) AS DOUBLE) / $TopK AS recall
          FROM (SELECT vec_id AS probe_id FROM embeddings WHERE ${sqlProbeId}) pp
          LEFT JOIN j USING (probe_id)"""
      }),

    // ---- embedding-cosine near-dup: bucketed self-join (the LSH shape
    // again) + exact cosine threshold — the embedding analog of q25.
    "q38_embed_neardup" -> Query(
      (s, dir) => Similarity.cosineNearDupPairs(
          Tables.embeddings(s, dir), 0.25, NumPlanes, Dim)
        .select(col("vec_a"), col("vec_b"), col("bucket"), col("cos")),
      Some(s"""WITH b AS (SELECT vec_id, embedding,
               ${Similarity.sqlLshBucket("embedding", NumPlanes, Dim)} AS bucket
             FROM embeddings),
          p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.bucket,
                  ${Similarity.sqlCosine("x.embedding", "y.embedding", Dim)} AS cos
                FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
          SELECT vec_a, vec_b, bucket, cos FROM p WHERE cos >= 0.25""")),

    // ---- text stats + quality score: pure per-row column math; every
    // ratio is an exact small-int division (engine-portable doubles).
    // Token counts both ways: whitespace split AND a BPE-ish regex
    // (word pieces + standalone non-word glyphs — the usual pre-tokenizer
    // shape; identical RE semantics on ASCII in both engines).
    "q30_text_stats" -> Query(
      (s, dir) => {
        val toks = col("toks")
        val nTok = size(toks)
        val sumLen = aggregate(toks, lit(0), (acc, t) => acc + length(t))
        val stop = size(filter(toks, t => t.isin("the", "a", "of", "and")))
        docs(s, dir)
          .select(col("doc_id"), length(col("text")).as("len_c"),
            tokens(col("text")).as("toks"),
            size(regexp_extract_all(col("text"),
              lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).as("n_bpeish"))
          .select(
            col("doc_id"),
            nTok.cast("long").as("n_tokens"),
            col("n_bpeish").cast("long").as("n_bpeish"),
            col("len_c").cast("long").as("n_chars_m"),
            (sumLen.cast("double") / nTok).as("avg_token_len"),
            (stop.cast("double") / nTok).as("stop_ratio"),
            (least(nTok, lit(100)).cast("double") / 100
              + stop.cast("double") / nTok).as("quality"))
      },
      Some(s"""SELECT doc_id,
          CAST(len($sqlToks) AS BIGINT) AS n_tokens,
          CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpeish,
          CAST(length(text) AS BIGINT) AS n_chars_m,
          list_sum(list_transform($sqlToks, t -> length(t)))::DOUBLE
            / len($sqlToks) AS avg_token_len,
          len(list_filter($sqlToks, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
            / len($sqlToks) AS stop_ratio,
          least(len($sqlToks), 100)::DOUBLE / 100
            + len(list_filter($sqlToks, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
              / len($sqlToks) AS quality
        FROM documents""")),

    // ---- language ID: keyword-profile scores + first-max argmax. The
    // profiles are config (Scala literals interpolated into both sides).
    "q31_langid" -> Query(
      (s, dir) => {
        val toks = col("toks")
        val scores = LangProfiles.map { case (_, words) =>
          size(filter(toks, t => t.isin(words: _*)))
        }
        val best = greatest(scores: _*)
        // reversed foldLeft of when-chains gives FIRST max in profile order
        val predFirst = LangProfiles.map(_._1).zip(scores)
          .reverse
          .foldLeft(lit(null).cast("string")) { case (acc, (name, sc)) =>
            when(sc === best, lit(name)).otherwise(acc)
          }
        docs(s, dir)
          .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("lang"),
            predFirst.as("pred_lang"),
            (col("lang") === predFirst).cast("long").as("is_match"))
      },
      Some {
        val scoreSql = LangProfiles.map { case (name, words) =>
          val in = words.map(w => s"'$w'").mkString(", ")
          s"len(list_filter(toks, t -> t IN ($in))) AS s_$name"
        }.mkString(", ")
        val names = LangProfiles.map(_._1)
        val bestSql = s"greatest(${names.map("s_" + _).mkString(", ")})"
        val predSql = names.init.foldRight(s"'${names.last}'") { (n, acc) =>
          s"CASE WHEN s_$n = best THEN '$n' ELSE $acc END"
        }
        s"""WITH t AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents),
          sc AS (SELECT doc_id, lang, $scoreSql FROM t),
          b AS (SELECT *, $bestSql AS best FROM sc)
          SELECT doc_id, lang, $predSql AS pred_lang,
            CAST(CASE WHEN lang = $predSql THEN 1 ELSE 0 END AS BIGINT) AS is_match
          FROM b"""
      }),

    // ---- winnowing fingerprints: min shingle-hash per sliding window,
    // deduped + sorted — per-row, zero shuffle; downstream near-dup =
    // explode(fps) + self-join on fp (same banded-join shape as LSH).
    // The fingerprint set is emitted as a ','-joined string: the driver's
    // compare harness sorts/hashes cell values and cannot hash ndarray
    // cells (CORRECTNESS_r02 err on the bare array column); longs
    // serialize identically in both engines, so the join is bit-exact.
    "q32_fingerprint" -> Query(
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shingleHashes(col("toks"), ShingleN).as("hs"))
        .select(col("doc_id"), winnow(col("hs"), WinnowW).as("fps"))
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
          array_join(transform(col("fps"), _.cast("string")), ",").as("fps_s")),
      Some {
        val hs = sqlShingleHashes("toks", ShingleN)
        s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          h AS (SELECT doc_id, $hs AS hs FROM t),
          w AS (SELECT doc_id, ${sqlWinnow("hs", WinnowW)} AS fps FROM h)
          SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
            array_to_string(fps, ',') AS fps_s FROM w"""
      }),

    // ---- the imperative decode stage (mapPartitions over raw payload
    // bytes — the real-decoder integration point) oracle-gated: the
    // decoder's L1-normalized float32 16-bin byte histogram is inverted
    // back to exact integer counts (round(f_j · byte_len) — the float
    // division's relative error is ≤ 2⁻²⁴·count, far below the 0.5
    // rounding margin), which DuckDB reproduces by counting high-nibble
    // hex chars of the same payload. Proves the Dataset/mapPartitions
    // plumbing end to end, not just the codegen'd columns of q33.
    "q46_decode_features" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.asMediaTable(docs(s, dir))
        val ds = media.select(col("media_id"), col("payload"))
          .as[(Long, Array[Byte])]
        Multimodal.decodeFeatures(ds).toDF()
          .select(col("media_id") +: col("byte_len").cast("long").as("byte_len") +:
            (0 until 16).map(j =>
              round(element_at(col("features"), j + 1).cast("double") * col("byte_len"))
                .cast("long").as("h%02d".format(j))): _*)
      },
      Some {
        val bins = (0 until 16).map { j =>
          val c = "0123456789abcdef"(j)
          s"""CAST(len(list_filter(range(0, byte_len),
              i -> substr(hx, CAST(2*i + 1 AS BIGINT), 1) = '$c')) AS BIGINT)
              AS h${"%02d".format(j)}"""
        }.mkString(", ")
        s"""WITH m AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx,
              CAST(octet_length(encode(text)) AS BIGINT) AS byte_len FROM documents)
          SELECT media_id, byte_len, $bins FROM m"""
      }),

    // ---- multimodal binary plumbing: payload as opaque bytes + typed
    // metadata; digest, header probe, and strided byte sampling all stay
    // in codegen. (The imperative decode stub lives in
    // operators/Multimodal.decodeFeatures — oracle-gated by
    // q46_decode_features, unit-pinned in TextDedupSpec.)
    "q33_multimodal" -> Query(
      (s, dir) => {
        val media = Multimodal.asMediaTable(docs(s, dir))
        media.select(
          col("media_id"),
          col("meta.width").cast("long").as("width"),
          length(col("payload")).cast("long").as("byte_len"),
          sha2(col("payload"), 256).as("digest"),
          lower(hex(substring(col("payload"), 1, 8))).as("header"),
          // strided 1-in-16 byte sampling as ONE codegen'd regex pass
          // (every 16-char block → its first char). The transform() HOF
          // it replaces was CodegenFallback AND re-evaluated the
          // payload→string cast inside the lambda per element — the
          // quadratic embedded-subtree trap TextFns documents.
          regexp_replace(col("payload").cast("string"),
            "(?s)(.).{0,15}", "$1").as("thumb"))
      },
      Some("""SELECT doc_id AS media_id,
          CAST(n_chars AS BIGINT) AS width,
          CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          sha256(text) AS digest,
          lower(hex(encode(substr(text, 1, 8)))) AS header,
          regexp_replace(text, '(?s)(.).{0,15}', '\1', 'g') AS thumb
        FROM documents""")),

    // ---- dedup-cluster resolution (L17): near-dup PAIRS (the q25
    // MinHash-LSH output, Jaccard >= 1/2 as the integer-pure
    // 2·|∩| >= |∪|) → connected components via alternating
    // large-star/small-star → one (doc, cluster, cluster size) row per
    // clustered doc, keeper = the component-min id. The oracle computes
    // the same components by recursive-CTE transitive closure — a
    // different algorithm entirely, so the fixpoint contraction is
    // cross-checked, not mirrored.
    "q47_dedup_clusters" -> Query(
      (s, dir) => {
        val d = docs(s, dir)
        val sigs = Dedup.minhashSignatures(d, col("doc_id"), col("text"),
          ShingleN, NumHashes)
        val pairs = Dedup.lshCandidatePairs(sigs, NumBands, RowsPerBand)
        val sets = Dedup.shingleSets(d, col("doc_id"), col("text"), ShingleN)
        val nearDup = Dedup.jaccardVerify(pairs, sets)
          .where(lit(2) * col("n_common") >= col("n_union"))
          .select(col("doc_a"), col("doc_b"))
        val comp = Dedup.connectedComponents(nearDup)
        val sizes = comp.groupBy("component")
          .agg(count(lit(1)).as("n_members"))
        comp.join(broadcast(sizes), "component")
          .select(col("node").as("doc_id"), col("component"),
            col("n_members"))
      },
      Some {
        s"""WITH RECURSIVE $sqlLshPairsCtes,
          verified AS (SELECT doc_a, doc_b,
              len(list_intersect(sa.shset, sb.shset)) AS n_common,
              len(sa.shset) + len(sb.shset)
                - len(list_intersect(sa.shset, sb.shset)) AS n_union
            FROM pairs JOIN sets sa ON pairs.doc_a = sa.doc_id
                       JOIN sets sb ON pairs.doc_b = sb.doc_id),
          edges AS (SELECT doc_a AS u, doc_b AS v FROM verified
                    WHERE 2 * n_common >= n_union),
          sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
          nodes AS (SELECT DISTINCT u AS node FROM sym),
          reach(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.node, s2.v FROM reach r JOIN sym s2 ON s2.u = r.lbl),
          comp AS (SELECT node, min(lbl) AS component FROM reach
                   GROUP BY node)
          SELECT c.node AS doc_id, c.component, n.n_members
          FROM comp c JOIN (SELECT component, count(*) AS n_members
                            FROM comp GROUP BY component) n
            USING (component)"""
      }),

    // ---- deterministic stratified sample (L18a): per-lang Bernoulli
    // rates keyed on the salted md5 slot — a pure map-side filter (no
    // shuffle, no RNG state), reproducible across engines; the oracle
    // recomputes the identical slot.
    "q48_stratified_sample" -> Query(
      (s, dir) => Sampling.stratifiedSample(docs(s, dir), col("lang"),
          col("doc_id"), SampleRates, SampleDefault, "s42")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      Some {
        val cases = SampleRates.map { case (k, v) => s"WHEN '$k' THEN $v" }
          .mkString(" ")
        s"""SELECT doc_id, lang, source, n_chars FROM documents
          WHERE ${Sampling.sqlSlot("doc_id", "s42")}
            < CASE lang $cases ELSE $SampleDefault END"""
      }),

    // ---- exact-n-per-stratum sample (L18b): the 7 smallest salted
    // hashes per lang — deterministic sampling without replacement; one
    // hash-shuffle on the stratum key, rank window over ~n rows after
    // the (optional) rate pre-filter at scale.
    "q49_sample_exact_n" -> Query(
      (s, dir) => Sampling.exactNPerStratum(docs(s, dir), col("lang"),
          col("doc_id"), 7, "s7")
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some {
        s"""WITH r AS (SELECT doc_id, lang, n_chars,
            row_number() OVER (PARTITION BY lang
              ORDER BY ${sqlHash60("CAST(doc_id AS VARCHAR) || ':s7'")},
                       doc_id) AS rk
          FROM documents)
          SELECT doc_id, lang, n_chars FROM r WHERE rk <= 7"""
      }),

    // ---- L112: EXACT-TOTAL proportional allocation (completes the
    // sampling family: q48 is rate-based, q49 exact-n-per-stratum —
    // this one hits an exact GLOBAL budget, allocated across langs by
    // size with largest-remainder rounding; en's 218/500 share of 120
    // is 52.32, so the fractional parts genuinely compete for the
    // top-ups). All-integer arithmetic, salted-hash fill — the oracle
    // recomputes the allocation and the pick independently.
    "q158_proportional_sample" -> Query(
      (s, dir) => Sampling.proportionalSample(docs(s, dir), col("lang"),
          col("doc_id"), total = 120L, salt = "prop")
        .select(col("doc_id"), col("lang")),
      Some {
        s"""WITH c AS (SELECT lang AS st, count(*) AS n
              FROM documents GROUP BY 1),
            tt AS (SELECT sum(n) AS ntot FROM c),
            q0 AS (SELECT st, n, (120 * n) // ntot AS base,
                (120 * n) % ntot AS rem FROM c, tt),
            d AS (SELECT 120 - sum(base) AS def FROM q0),
            q AS (SELECT st, base + CASE
                WHEN row_number() OVER (ORDER BY rem DESC, st) <= def
                THEN 1 ELSE 0 END AS quota FROM q0, d),
            rk AS (SELECT doc_id, lang,
                row_number() OVER (PARTITION BY lang ORDER BY
                  ${sqlHash60("CAST(doc_id AS VARCHAR) || ':prop'")},
                  doc_id) AS rk
              FROM documents)
          SELECT rk.doc_id, rk.lang FROM rk
          JOIN q ON rk.lang = q.st WHERE rk.rk <= q.quota"""
      }),

    // ---- L116: ANALYZE-style table statistics — per-column row/null
    // counts, lexicographic min/max over the stringified values, and an
    // HLL distinct estimate, all from ONE corpus scan (the long-format
    // explode + single register aggregation tree; a per-column
    // count(distinct) would scan and shuffle the table once PER COLUMN
    // — the CBO-stats anti-pattern at 100 TB). The oracle recomputes
    // every column's stats independently with the q58 register replay.
    "q163_table_stats" -> Query(
      (s, dir) => graft.operators.Analyze.columnStats(
        docs(s, dir), Seq("doc_id", "lang", "source", "n_chars")),
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS col_name,
            (SELECT count(*) FROM documents) AS n,
            (SELECT count(*) - count(CAST($c AS VARCHAR)) FROM documents)
              AS n_nulls,
            (SELECT CASE WHEN v_empty > 0 AND est_raw <= CAST(640.0 AS DOUBLE)
                   THEN CAST(256.0 AS DOUBLE)
                     * ln(CAST(256.0 AS DOUBLE) / v_empty)
                   ELSE est_raw END
             FROM (SELECT CAST(${graft.operators.Analyze.HllNum} AS DOUBLE)
                     / CAST(sum_scaled AS DOUBLE) AS est_raw,
                   256 - n_hit AS v_empty
               FROM (SELECT CAST(count(*) AS BIGINT) AS n_hit,
                     CAST(sum(CAST(1 AS BIGINT) << (53 - mj))
                       + (256 - count(*)) * ${1L << 53} AS BIGINT)
                       AS sum_scaled
                 FROM (SELECT h % 256 AS bucket,
                       max(CASE WHEN h // 256 = 0 THEN 53
                           ELSE 53 - length(bin(h // 256)) END) AS mj
                   FROM (SELECT ${sqlHash60(s"'an:' || CAST($c AS VARCHAR)")} AS h
                         FROM documents WHERE $c IS NOT NULL)
                   GROUP BY 1)))) AS n_distinct_est,
            (SELECT min(CAST($c AS VARCHAR)) FROM documents) AS min_s,
            (SELECT max(CAST($c AS VARCHAR)) FROM documents) AS max_s"""
        Seq("doc_id", "lang", "source", "n_chars").map(one)
          .mkString(" UNION ALL ")
      }),

    // ---- L117: deterministic range-shard layout (the ordered-layout
    // sibling of q69's Z-order): shard ids from exact integer ranks
    // over the VALUE histogram — never repartitionByRange, whose
    // RangePartitioner samples with an RDD-id-seeded RNG (the round-2
    // lost-rows lesson: two evaluations of one subtree saw different
    // bounds). Gated output is the per-shard envelope (count + value
    // range); the oracle recomputes the shard-of-value rule
    // independently. Envelope disjointness/order is spec-pinned.
    "q164_range_shards" -> Query(
      (s, dir) => graft.operators.Layout.rangeShards(
          docs(s, dir).select(col("doc_id"), col("n_chars")),
          col("n_chars"), 16)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("n_chars")).as("min_key"),
          max(col("n_chars")).as("max_key")),
      Some {
        val sv = graft.operators.Layout
          .sqlRangeShardOfValue("documents", "n_chars", 16)
        s"""WITH sv AS ($sv)
          SELECT sv.shard, count(*) AS n_rows,
            min(d.n_chars) AS min_key, max(d.n_chars) AS max_key
          FROM documents d JOIN sv ON d.n_chars = sv.n_chars
          GROUP BY 1"""
      }),

    // ---- end-to-end corpus curation flagship (the LLM-side analogue of
    // q34's scene pipeline): denylist scrub → token/quality gate →
    // exact-dedup keeper (single window shuffle on the content key) →
    // deterministic stratified sample. One scan, two shuffles total
    // (ckey window + none for the map-side scrub/gate/sample).
    "q50_curate_corpus" -> Query(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scrub = docs(s, dir).select(
          col("doc_id"), col("lang"), col("source"),
          Dedup.contentKey(col("text")).as("ckey"),
          TextFns.redactCount(col("text"), DenyTerms).as("n_redacted"),
          tokens(TextFns.redactDenylist(col("text"), DenyTerms, ScrubToken))
            .as("toks"))
        val stats = scrub.select(
          col("doc_id"), col("lang"), col("source"), col("ckey"),
          col("n_redacted"), size(col("toks")).as("n_tokens"),
          size(filter(col("toks"), t => t.isin(StopWords: _*))).as("stops"))
        val gated = stats.where(col("n_tokens") >= CurateMinTokens &&
          col("stops") * 50 >= col("n_tokens"))
        val keepers = gated
          .withColumn("_keep",
            min(col("doc_id")).over(Window.partitionBy(col("ckey"))))
          .where(col("doc_id") === col("_keep"))
        Sampling.stratifiedSample(keepers, col("lang"), col("doc_id"),
            SampleRates, SampleDefault, "cur")
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_tokens").cast("long").as("n_tokens"),
            col("n_redacted").cast("long").as("n_redacted"))
      },
      Some {
        val stopsIn = StopWords.map(w => s"'$w'").mkString(", ")
        val cases = SampleRates.map { case (k, v) => s"WHEN '$k' THEN $v" }
          .mkString(" ")
        s"""WITH s0 AS (SELECT doc_id, lang, source,
              md5(array_to_string(list_sort(list_distinct($sqlToks)), ' ')) AS ckey,
              ${sqlRedactCount("text", DenyTerms)} AS n_redacted,
              string_split_regex(trim(${sqlRedactDenylist("text", DenyTerms, ScrubToken)}),
                '\\s+') AS toks
            FROM documents),
          s1 AS (SELECT doc_id, lang, source, ckey, n_redacted,
              len(toks) AS n_tokens,
              len(list_filter(toks, t -> t IN ($stopsIn))) AS stops
            FROM s0),
          s2 AS (SELECT * FROM s1
            WHERE n_tokens >= $CurateMinTokens AND stops * 50 >= n_tokens),
          s3 AS (SELECT *, min(doc_id) OVER (PARTITION BY ckey) AS keep
            FROM s2)
          SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens,
            CAST(n_redacted AS BIGINT) AS n_redacted
          FROM s3
          WHERE doc_id = keep
            AND ${Sampling.sqlSlot("doc_id", "cur")}
              < CASE lang $cases ELSE $SampleDefault END"""
      }),

    // ---- exact per-stratum length quantiles (curation cut-points).
    // Spark `percentile` and DuckDB `quantile_cont` share the same
    // (n-1)·p linear-interpolation definition, so the doubles match
    // bit-for-bit (verified — no trig-style libm divergence). Scale
    // note: Spark's exact percentile buffers a value→count map per
    // group, so state is O(distinct lengths), not O(rows) — fine at
    // 100 TB for bounded measures like document length; for unbounded
    // ones swap in approx_percentile (same plan shape).
    "q51_length_quantiles" -> Query(
      (s, dir) => docs(s, dir).groupBy(col("lang")).agg(
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"),
        expr("percentile(n_chars, 0.99)").as("p99"),
        count(lit(1)).as("n")),
      Some("""SELECT lang, quantile_cont(n_chars, 0.5) AS p50,
          quantile_cont(n_chars, 0.9) AS p90,
          quantile_cont(n_chars, 0.99) AS p99,
          count(*) AS n
        FROM documents GROUP BY lang""")),

    // ---- sequence packing (L21): assign docs to fixed-token-budget
    // training chunks — concatenation order is the salted hash (the
    // deterministic shuffle), chunk id and intra-chunk offset fall out
    // of a per-stratum cumulative token sum. Docs straddle chunk
    // boundaries exactly as pretraining packing does (concat then split
    // at budget multiples). One partitioned window shuffle; never a
    // global (SinglePartition) cumsum — packing is per-stratum by
    // construction, which is also what a mixture-weighted loader wants.
    "q52_pack_chunks" -> Query(
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).as("n_toks"))
        Packing.packChunks(d, col("lang"), col("doc_id"), col("n_toks"),
            PackBudget, "pack")
          .select(col("doc_id"), col("lang"),
            col("n_toks").cast("long").as("n_toks"),
            col("chunk_id"), col("chunk_off"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang,
            len($sqlToks) AS n_toks,
            ${sqlHash60("CAST(doc_id AS VARCHAR) || ':pack'")} AS h
          FROM documents),
        c AS (SELECT *, sum(n_toks) OVER (PARTITION BY lang
            ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
        SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks,
          CAST((cum - n_toks) // $PackBudget AS BIGINT) AS chunk_id,
          CAST((cum - n_toks) % $PackBudget AS BIGINT) AS chunk_off
        FROM c""")),

    // ---- packed-span manifest (L101): the q52 packing resolved to the
    // per-(doc, chunk) span table a packed-training loader consumes —
    // docs crossing budget boundaries emit one row per occupied chunk
    // with in-chunk position, in-doc offset, and span length (the
    // attention-mask construction inputs). Same single stratum window
    // as q52 + a map-side generator.
    "q143_pack_spans" -> Query(
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).as("n_toks"))
        Packing.packSpans(d, col("lang"), col("doc_id"), col("n_toks"),
            PackBudget, "pack")
          .select(col("doc_id"), col("lang"), col("chunk_id"),
            col("span_off"), col("doc_off"), col("span_len"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang,
            len($sqlToks) AS n_toks,
            ${sqlHash60("CAST(doc_id AS VARCHAR) || ':pack'")} AS h
          FROM documents),
        c AS (SELECT *, sum(n_toks) OVER (PARTITION BY lang
            ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t),
        st AS (SELECT doc_id, lang, n_toks,
                 CAST(cum - n_toks AS BIGINT) AS s0
               FROM c WHERE n_toks > 0),
        sp AS (SELECT doc_id, lang, n_toks, s0,
                 unnest(range(s0 // $PackBudget,
                   (s0 + n_toks - 1) // $PackBudget + 1)) AS chunk_id
               FROM st)
        SELECT doc_id, lang, CAST(chunk_id AS BIGINT) AS chunk_id,
          CAST(greatest(s0, chunk_id * $PackBudget)
            - chunk_id * $PackBudget AS BIGINT) AS span_off,
          CAST(greatest(s0, chunk_id * $PackBudget) - s0 AS BIGINT) AS doc_off,
          CAST(least(s0 + n_toks, (chunk_id + 1) * $PackBudget)
            - greatest(s0, chunk_id * $PackBudget) AS BIGINT) AS span_len
        FROM sp""")),

    // ---- eval-set decontamination (L22): which eval docs (source src0)
    // share >= ContamMinShared distinct shingles with a train doc? The
    // same inverted-index equi-join shape as q27 — explode distinct
    // shingle hashes, df-cap the train posting lists (a stop-shingle
    // carries no contamination signal but makes the join quadratic),
    // join on the hash, count per (eval, train) pair. Never an all-pairs
    // set intersection.
    "q53_contamination" -> Query(
      (s, dir) => {
        val d = docs(s, dir)
        Dedup.contaminationReport(
          d.where(col("source") === "src0"),
          d.where(col("source") =!= "src0"),
          col("doc_id"), col("text"), ShingleN, MaxShingleDf,
          ContamMinShared)
      },
      Some(s"""WITH t AS (SELECT doc_id, source, $sqlToks AS toks FROM documents),
          hh AS (SELECT doc_id, source,
              ${sqlShingleHashes("toks", ShingleN)} AS hs FROM t),
          sets AS (SELECT doc_id, source, list_distinct(hs) AS shset FROM hh),
          ev AS (SELECT doc_id AS e_id, unnest(shset) AS h FROM sets
                 WHERE source = 'src0'),
          tra AS (SELECT doc_id AS t_id, unnest(shset) AS h FROM sets
                  WHERE source <> 'src0'),
          tr AS (SELECT t_id, h FROM (SELECT t_id, h,
                   count(*) OVER (PARTITION BY h) AS df FROM tra)
                 WHERE df <= $MaxShingleDf),
          p AS (SELECT e_id, t_id, count(*) AS n_common
                FROM ev JOIN tr USING (h)
                GROUP BY e_id, t_id HAVING count(*) >= $ContamMinShared)
          SELECT e_id, count(*) AS n_contaminated, max(n_common) AS max_common
          FROM p GROUP BY e_id""")),

    // ---- repetition / boilerplate signals (L23): the Gopher-style
    // within-document quality rules — duplicate n-gram fraction and
    // mode-token coverage — as pure map-side math (no shuffle, no
    // per-document grouping; the document never leaves its scan task).
    // All ratios are exact small-int divisions; the gate itself is
    // integer-pure (a·k > b) so the flag can't wobble on fp rounding.
    // The n-grams are counted through the native shingle_hashes kernel
    // (60-bit md5 prefixes — a collision merging two distinct n-grams
    // is ~n²/2³¹ per doc, deterministic, and mirrored exactly in the
    // oracle) and the mode through the native mode_count kernel, so the
    // whole query stays inside whole-stage codegen: the interpreted
    // string-shingle + nested-filter formulation ran 5.3 s at sf0.1,
    // this shape runs sub-second.
    "q54_repetition" -> Query(
      (s, dir) => {
        val toks = col("toks")
        val nTok = size(toks)
        val dup2 = size(col("g2")) - size(array_distinct(col("g2")))
        val dup3 = size(col("g3")) - size(array_distinct(col("g3")))
        docs(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .withColumn("g2", shingleHashes(toks, 2))
          .withColumn("g3", shingleHashes(toks, 3))
          .withColumn("mode_n", modeCount(toks))
          .select(col("doc_id"),
            nTok.cast("long").as("n_tokens"),
            size(col("g2")).cast("long").as("n_2grams"),
            dup2.cast("long").as("n_dup_2grams"),
            dup3.cast("long").as("n_dup_3grams"),
            col("mode_n").cast("long").as("mode_tok_n"),
            when(size(col("g2")) > 0,
              dup2.cast("double") / size(col("g2"))).otherwise(0.0)
              .as("dup_2gram_frac"),
            when(nTok > 0,
              col("mode_n").cast("double") / nTok).otherwise(0.0)
              .as("mode_frac"),
            when(dup2 * Dup2Den > size(col("g2"))
              || col("mode_n") * ModeDen > nTok, 1L).otherwise(0L)
              .as("repetitive"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          g AS (SELECT doc_id, toks,
              ${sqlShingleHashes("toks", 2)} AS g2,
              ${sqlShingleHashes("toks", 3)} AS g3,
              ${sqlModeCount("toks")} AS mode_n FROM t)
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(len(g2) AS BIGINT) AS n_2grams,
          CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) AS n_dup_2grams,
          CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) AS n_dup_3grams,
          CAST(mode_n AS BIGINT) AS mode_tok_n,
          CASE WHEN len(g2) > 0 THEN
            (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2)
            ELSE 0.0 END AS dup_2gram_frac,
          CASE WHEN len(toks) > 0 THEN mode_n::DOUBLE / len(toks)
            ELSE 0.0 END AS mode_frac,
          CAST(CASE WHEN (len(g2) - len(list_distinct(g2))) * $Dup2Den > len(g2)
              OR mode_n * $ModeDen > len(toks)
            THEN 1 ELSE 0 END AS BIGINT) AS repetitive
        FROM g""")),

    // ---- temperature / importance resampling (L24): mixture
    // reweighting of a multilingual corpus — integral copies plus a
    // salted-hash fractional acceptance, expanded map-side by one
    // generator per row (no shuffle, no join, no RNG; the blow-up IS
    // the configured mixture weight). `copy_idx` is 1-based.
    "q55_temperature_resample" -> Query(
      (s, dir) => Sampling.temperatureResample(
          docs(s, dir).select(col("doc_id"), col("lang")),
          col("lang"), col("doc_id"), ResampleFactors, ResampleDefault, "temp")
        .select(col("doc_id"), col("lang"), col("copy").as("copy_idx")),
      Some {
        val cases = ResampleFactors
          .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
        s"""WITH m AS (SELECT doc_id, lang,
              CASE lang $cases ELSE $ResampleDefault END AS f,
              ${Sampling.sqlSlot("doc_id", "temp")} AS sl FROM documents),
            x AS (SELECT doc_id, lang,
              f // 1000 + CASE WHEN sl < f % 1000 THEN 1 ELSE 0 END AS mult
              FROM m)
          SELECT doc_id, lang, CAST(ci AS BIGINT) AS copy_idx
          FROM (SELECT doc_id, lang, unnest(generate_series(1, mult)) AS ci
                FROM x WHERE mult > 0)"""
      }),

    // ---- rare-token scoring (L25): the KenLM-free quality proxy — how
    // much of a document falls outside the corpus vocabulary. Two-pass
    // by construction: (1) token document-frequency aggregate (map-side
    // combinable, one shuffle on the token), cut scale-relatively at
    // df × $RareDfRatio ≥ |docs| (the scalar doc count rides a keyless
    // global agg — a one-row exchange, exempted by the plan contract);
    // (2) the tiny in-vocab table broadcasts back onto the exploded
    // token stream as a LEFT ANTI join (rare = out-of-vocab), then one
    // per-doc count. At 100 TB the vocab cut keeps the broadcast small
    // by construction (common tokens only); if the in-vocab set ever
    // outgrew a broadcast, the same plan degrades gracefully to a
    // shuffle join — or a Bloom filter on the vocab — without changing
    // the query.
    "q56_rare_tokens" -> Query(
      (s, dir) => {
        val d = docs(s, dir)
        val tok = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val nDocs = d.agg(count(lit(1)).as("n_docs"))
        val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .where(col("df") * RareDfRatio >= col("n_docs"))
          .select(col("tok"))
        val rare = tok.join(broadcast(vocab), Seq("tok"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_rare"))
        // no broadcast hint on `rare`: its size tracks the corpus (one
        // row per doc with an out-of-vocab token) — AQE promotes the
        // join to broadcast at runtime whenever it IS small.
        d.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
          .join(rare, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_rare"), lit(0L)).as("n_rare"),
            when(col("n_tokens") > 0,
              coalesce(col("n_rare"), lit(0L)).cast("double") / col("n_tokens"))
              .otherwise(0.0).as("rare_frac"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
          vocab AS (SELECT tok FROM tok GROUP BY tok
            HAVING count(*) * $RareDfRatio >= (SELECT count(*) FROM documents)),
          rare AS (SELECT doc_id, count(*) AS n_rare FROM tok
            WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY doc_id)
        SELECT d.doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens,
          CAST(coalesce(r.n_rare, 0) AS BIGINT) AS n_rare,
          CASE WHEN len($sqlToks) > 0 THEN
            coalesce(r.n_rare, 0)::DOUBLE / len($sqlToks)
            ELSE 0.0 END AS rare_frac
        FROM documents d LEFT JOIN rare r USING (doc_id)""")),

    // ---- BM25 keyword relevance (L26): the classic probabilistic
    // retrieval score for a fixed query-term set. Scale shape: ONE scan
    // of `documents` — the scan task reduces each doc to a narrow
    // (doc_id, dl, query-term-filtered toks) row (≤ |terms| array
    // entries/doc), localCheckpoint materializes that slim frame once,
    // and tf, df/idf AND the corpus length scalars all derive from it
    // (the r4 form re-scanned documents for the scalars and again for
    // the idf branch — SURVEY §7.5 #4; measured at sf0.1 both forms are
    // within run-to-run noise, ~1.4–1.6 s isolated, so the scan count —
    // 1 vs 3 of the corpus at 100 TB — decides). The df/idf table is |terms|
    // rows and broadcasts; corpus scalars (N, Σdl) ride a one-row
    // exchange. The per-doc term-score sum is a FIXED-ORDER chain of
    // the pivoted per-term columns — never a float sum() whose
    // partial-agg order could vary. ln() is bit-identical across the
    // JVM and DuckDB for these arguments (both correctly-rounded here;
    // verified empirically by the gate at both SFs — the idf inputs are
    // a handful of distinct rationals).
    "q57_bm25" -> Query(
      (s, dir) => {
        val base = docs(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).as("dl"),
            filter(col("toks"), t => t.isin(Bm25Terms: _*)).as("toks"))
          .localCheckpoint()
        val tok = base
          .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
        val tf = tok.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
        val scal = base.agg(count(lit(1)).as("n_docs"),
          sum(col("dl").cast("long")).as("sum_dl"))
        val idfs = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(scal))
          .select(col("tok"),
            log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
              + lit(1.0)).as("idf"))
        val scored = tf.join(broadcast(idfs), Seq("tok"))
          .crossJoin(broadcast(scal))
          .select(col("doc_id"), col("tok"), col("tf"),
            ((col("idf") * (col("tf") * lit(Bm25K1p1)))
              / (col("tf") + lit(Bm25K1) * (lit(Bm25OneMinusB)
                + (lit(Bm25B) * col("dl"))
                  / (col("sum_dl").cast("double") / col("n_docs")))))
              .as("score"))
        val perTerm = Bm25Terms.map(t =>
          max(when(col("tok") === t, col("score"))).as(s"s_$t"))
        val aggs = Seq(sum(col("tf")).as("tf_total"),
          count(lit(1)).as("n_terms_hit")) ++ perTerm
        scored.groupBy(col("doc_id"))
          .agg(aggs.head, aggs.tail: _*)
          .select(col("doc_id"), col("tf_total"), col("n_terms_hit"),
            Bm25Terms.map(t => coalesce(col(s"s_$t"), lit(0.0)))
              .reduce(_ + _).as("score"))
      },
      Some {
        val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
        val pivot = Bm25Terms
          .map(t => s"coalesce(max(CASE WHEN tok = '$t' THEN score END), CAST(0.0 AS DOUBLE))")
          .mkString(" + ")
        // every fp constant CAST to DOUBLE: a bare literal like 0.5 is
        // DECIMAL in DuckDB, and decimal-promoted arithmetic rounds
        // differently from the double math the Spark plan performs
        // (measured: 1-ulp score drift on ~10% of docs)
        def d(x: Double): String = s"CAST($x AS DOUBLE)"
        s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          base AS (SELECT doc_id, len(toks) AS dl, toks FROM t),
          tok AS (SELECT doc_id, dl, unnest(toks) AS tok FROM base),
          tf AS (SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
                 FROM tok WHERE tok IN ($termList) GROUP BY doc_id, tok),
          scal AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base),
          idfs AS (SELECT tok,
                     ln((n_docs - count(*) + ${d(0.5)}) / (count(*) + ${d(0.5)})
                        + ${d(1.0)}) AS idf
                   FROM tf, scal GROUP BY tok, n_docs),
          sc AS (SELECT doc_id, tf.tok AS tok, tf,
                   (idf * (tf * ${d(Bm25K1p1)}))
                     / (tf + ${d(Bm25K1)} * (${d(Bm25OneMinusB)}
                       + (${d(Bm25B)} * dl) / (CAST(sum_dl AS DOUBLE) / n_docs))) AS score
                 FROM tf, idfs, scal WHERE tf.tok = idfs.tok)
          SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf_total,
            count(*) AS n_terms_hit, ($pivot) AS score
          FROM sc GROUP BY doc_id"""
      }),

    // ---- one Lloyd refinement iteration for the IVF codebook (L27):
    // the missing "train the coarse quantizer" step next to q40's
    // search. Assignment is the same map-side codegen'd nearest_cells
    // argmax q40 uses (the corpus is never row-multiplied by the cell
    // count); the centroid update is a per-(cell, dim) mean over
    // component values QUANTIZED to 2^-$LloydQuantBits fixed-point —
    // scaling by an exact power of two is a float-exponent shift (no
    // rounding) and floor() is engine-identical, so the update sum is
    // exact integer math that no partial-agg order can perturb (a raw
    // double sum would be order-sensitive). The explode shuffles
    // n×dim quantized longs pre-combined map-side to ≤ cells×dim rows
    // per task — the classic map-combinable mean shape.
    // Assignment is the TWO-LEVEL hierarchical-IVF rule since r7 (the
    // codebook here is elected as a corpus FRACTION, so the flat
    // O(C·dim)-per-row argmax made total Lloyd work superlinear — the
    // steepest curve of the r6 scale audit at 18× for 50× data). The
    // oracle mirrors the hierarchy rule-for-rule: supers = every
    // stride-th cell of the id-ascending codebook, cells join their
    // nearest super, rows pick nearest super then nearest member cell
    // — every argmax `row_number() OVER (csim DESC, id)` on the same
    // left-fold dots the kernel computes.
    "q60_lloyd_refine" -> Query(
      (s, dir) => Similarity.lloydRefine(Tables.embeddings(s, dir),
          isCentroid = col("vec_id") % 125 === 7, LloydQuantBits,
          twoLevel = true)
        .select(col("cell"), col("d"), col("n_members"), col("sum_q"),
          col("c_new")),
      Some {
        val q = (1L << LloydQuantBits).toDouble
        s"""WITH e AS (SELECT vec_id, embedding,
               ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
             FROM embeddings),
          c0 AS (SELECT vec_id AS cent_id, embedding AS cemb, nn AS cn
                FROM e WHERE vec_id % 125 = 7),
          cpos AS (SELECT *, row_number() OVER (ORDER BY cent_id) - 1 AS pos
                   FROM c0),
          prm AS (SELECT CAST(ceil(CAST(count(*) AS DOUBLE)
                    / ceil(sqrt(CAST(count(*) AS DOUBLE)))) AS BIGINT)
                    AS stride FROM c0),
          sup AS (SELECT cent_id AS sup_id, cemb AS semb, cn AS sn
                  FROM cpos, prm WHERE pos % prm.stride = 0),
          cs0 AS (SELECT cp.cent_id, s.sup_id,
                   (${Similarity.sqlDotD("cp.cemb", "s.semb", Dim)}
                     / sqrt(cp.cn * s.sn)) AS csim
                 FROM cpos cp, sup s),
          cs AS (SELECT cent_id, sup_id FROM
                  (SELECT *, row_number() OVER
                     (PARTITION BY cent_id ORDER BY csim DESC, sup_id) AS rk
                   FROM cs0) WHERE rk = 1),
          rs0 AS (SELECT e.vec_id, s.sup_id,
                   (${Similarity.sqlDotD("e.embedding", "s.semb", Dim)}
                     / sqrt(e.nn * s.sn)) AS csim
                 FROM e, sup s),
          rs AS (SELECT vec_id, sup_id FROM
                  (SELECT *, row_number() OVER
                     (PARTITION BY vec_id ORDER BY csim DESC, sup_id) AS rk
                   FROM rs0) WHERE rk = 1),
          a0 AS (SELECT e.vec_id, e.embedding, cc.cent_id,
                   (${Similarity.sqlDotD("e.embedding", "cc.cemb", Dim)}
                     / sqrt(e.nn * cc.cn)) AS csim
                 FROM e JOIN rs ON e.vec_id = rs.vec_id
                   JOIN cs ON cs.sup_id = rs.sup_id
                   JOIN c0 cc ON cc.cent_id = cs.cent_id),
          a AS (SELECT *, row_number() OVER
                  (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crk
                FROM a0),
          n AS (SELECT vec_id, embedding, cent_id AS cell FROM a WHERE crk = 1),
          x AS (SELECT cell,
                  unnest(range(0, $Dim)) AS d,
                  unnest(list_transform(range(0, $Dim), i ->
                    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * $q) AS BIGINT)))
                    AS qx
                FROM n)
          SELECT cell, CAST(d AS BIGINT) AS d, count(*) AS n_members,
            CAST(sum(qx) AS BIGINT) AS sum_q,
            (CAST(sum(qx) AS DOUBLE) / count(*)) / $q AS c_new
          FROM x GROUP BY cell, d"""
      }),

    // ---- sliding-window token chunking with overlap (L30): split each
    // document into $ChunkSize-token windows every $ChunkStride tokens —
    // the context-window chunking step of RAG/embedding pipelines (and
    // of long-doc training prep). Pure map-side: one generator per doc
    // emits ceil((n-size)/stride)+1 chunk rows; no shuffle, no join —
    // documents never leave their scan task, and the blow-up factor is
    // exactly size/stride. The chunk content hash gives downstream
    // dedup/lookup a 32-char key without re-tokenizing.
    "q61_chunk_windows" -> Query(
      (s, dir) => {
        val n = size(col("toks"))
        // k_max = (n <= size) ? 0 : ceil((n - size) / stride), integer-pure
        val kMax = when(n <= ChunkSize, lit(0))
          .otherwise(((n - ChunkSize + (ChunkStride - 1)) / ChunkStride)
            .cast("int"))
        docs(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0), kMax)).as("k"))
          .select(col("doc_id"), col("k").cast("long").as("chunk_idx"),
            concat_ws(" ", slice(col("toks"), col("k") * ChunkStride + 1,
              lit(ChunkSize))).as("chunk_text"))
          .select(col("doc_id"), col("chunk_idx"),
            size(tokens(col("chunk_text"))).cast("long").as("n_chunk_toks"),
            md5(col("chunk_text")).as("chunk_key"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          g AS (SELECT doc_id, toks,
                  CASE WHEN len(toks) <= $ChunkSize THEN 0
                       ELSE (len(toks) - $ChunkSize + ${ChunkStride - 1}) // $ChunkStride
                  END AS k_max
                FROM t),
          x AS (SELECT doc_id, toks, unnest(range(0, k_max + 1)) AS k FROM g),
          c AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
                  array_to_string(list_slice(toks, k * $ChunkStride + 1,
                    k * $ChunkStride + $ChunkSize), ' ') AS chunk_text
                FROM x)
          SELECT doc_id, chunk_idx,
            CAST(len(${sqlTokens("chunk_text")}) AS BIGINT) AS n_chunk_toks,
            md5(chunk_text) AS chunk_key
          FROM c""")),

    // ---- hierarchical corpus stats via ROLLUP (L32): per (lang,
    // source), per lang, and grand-total document/char counts in ONE
    // aggregation — the dataset-card reporting surface. Spark's
    // `rollup` compiles to a single Expand + hash aggregate: the input
    // is scanned once and each row feeds all three grouping levels as
    // map-side partials, so the shuffle carries ≤ 3×|groups| combined
    // rows. NULL group markers denote rolled-up levels on both engines.
    "q63_rollup_stats" -> Query(
      (s, dir) => docs(s, dir)
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .select(col("lang"), col("source"), col("n_docs"), col("sum_chars")),
      Some("""SELECT lang, source, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS sum_chars
          FROM documents GROUP BY ROLLUP (lang, source)""")),

    // ---- int8 scalar quantization of embeddings (L33): per-dimension
    // corpus min/max → each component floored onto the [0, 254] grid —
    // the 4× storage-compression step for 100 TB embedding tables
    // (search then runs on the quantized codes; q40/q60 consume them
    // unchanged). Two passes by construction: (1) the per-dim stats agg
    // map-combines n×dim exploded rows to ≤ dim rows per task before a
    // dim-keyed exchange; (2) the 64-row stats table broadcasts back
    // onto the exploded stream — the corpus itself never shuffles.
    // min/max are SELECTION aggregates (no fp accumulation), and the
    // quantize expression `floor((x-mn)·254/(mx-mn))` is mirrored
    // textually, so parity is exact at any partitioning.
    "q64_quantize_embed" -> Query(
      (s, dir) => {
        val x = Tables.embeddings(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "xf")))
          .select(col("vec_id"), col("d"), col("xf").cast("double").as("xd"))
        val st = x.groupBy(col("d"))
          .agg(min(col("xd")).as("mn"), max(col("xd")).as("mx"))
        x.join(broadcast(st), Seq("d"))
          .select(col("vec_id"), col("d").cast("long").as("d"),
            when(col("mx") === col("mn"), lit(0L))
              .otherwise(floor((col("xd") - col("mn")) * lit(254.0)
                / (col("mx") - col("mn"))).cast("long")).as("qx"))
      },
      Some(s"""WITH x AS (SELECT vec_id,
              unnest(range(0, $Dim)) AS d,
              unnest(list_transform(range(0, $Dim), i ->
                CAST(embedding[i + 1] AS DOUBLE))) AS xd
            FROM embeddings),
          st AS (SELECT d, min(xd) AS mn, max(xd) AS mx FROM x GROUP BY d)
          SELECT vec_id, CAST(x.d AS BIGINT) AS d,
            CASE WHEN mx = mn THEN 0
                 ELSE CAST(floor((xd - mn) * CAST(254.0 AS DOUBLE) / (mx - mn))
                      AS BIGINT) END AS qx
          FROM x, st WHERE x.d = st.d""")),

    // ---- quantized-search recall (L35): the evaluation loop a
    // production ANN pipeline runs after compressing its corpus — the
    // q64 int8 quantization dequantized back onto the [mn, mx] grid,
    // searched asymmetrically (float probes against the quantized
    // corpus — ADC style) and scored as recall@k against the exact
    // float search. Rank ties from the coarser quantized cosine break
    // on cand_id identically in both engines, so recall is exact, not
    // statistical. Scale shape: the per-dim (min, max) grid is a
    // codebook-sized driver artifact (collected once, like the IVF
    // centroid table) baked into the codegen'd dequantize_grid kernel,
    // so the quantized corpus comes straight off the SCAN — no
    // explode, no stats join, no repack shuffle (the previous
    // formulation put every vector through a (vec_id)-keyed exchange
    // just to reassemble arrays). Both searches are the q28
    // broadcast-probe story; the recall join touches 2×k rows/probe.
    "q66_quantized_recall" -> Query(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // per-dim stats: selection aggs (exact), 64 rows -> driver
        val statRows = emb
          .select(posexplode(col("embedding")).as(Seq("d", "xf")))
          .select(col("d"), col("xf").cast("double").as("xd"))
          .groupBy(col("d"))
          .agg(min(col("xd")).as("mn"), max(col("xd")).as("mx"))
          .collect()
          .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
          .sortBy(_._1)
        val packed = emb.select(col("vec_id"),
          graft.functions.VecFns.dequantizeGrid(col("embedding"),
            statRows.map(_._2), statRows.map(_._3), 254.0).as("embedding"))
        val probes = emb.where(isProbeId(col("vec_id")))
          .select(col("vec_id"), col("embedding"))
        val approx = Similarity.bruteForceTopK(packed, probes, TopK)
          .select(col("probe_id"), col("cand_id"))
        val exact = Similarity.bruteForceTopK(emb, probes, TopK)
          .select(col("probe_id"), col("cand_id"))
        val common = approx.join(exact, Seq("probe_id", "cand_id"))
          .groupBy(col("probe_id")).agg(count(lit(1)).as("n_common"))
        probes.select(col("vec_id").as("probe_id"))
          .join(common, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("n_common"), lit(0L)).as("n_common"),
            (coalesce(col("n_common"), lit(0L)).cast("double") / TopK).as("recall"))
      },
      Some {
        val q = "CAST(254.0 AS DOUBLE)"
        s"""WITH x AS (SELECT vec_id, unnest(range(0, $Dim)) AS d,
              unnest(list_transform(range(0, $Dim), i ->
                CAST(embedding[i + 1] AS DOUBLE))) AS xd
            FROM embeddings),
          st AS (SELECT d, min(xd) AS mn, max(xd) AS mx FROM x GROUP BY d),
          deq AS (SELECT vec_id, x.d AS d,
                CASE WHEN mx = mn THEN mn
                     ELSE mn + floor((xd - mn) * $q / (mx - mn))
                          * (mx - mn) / $q END AS xq
              FROM x, st WHERE x.d = st.d),
          packed AS (SELECT vec_id, list(xq ORDER BY d) AS qe
                     FROM deq GROUP BY vec_id),
          cand AS (SELECT vec_id AS cand_id, qe AS ce,
                     ${Similarity.sqlDotD("qe", "qe", Dim)} AS cn FROM packed),
          p AS (SELECT vec_id AS probe_id, embedding AS pe,
                  ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS pn
                FROM embeddings WHERE ${sqlProbeId}),
          ax AS (SELECT probe_id, cand_id,
                   (${Similarity.sqlDotD("pe", "ce", Dim)} / sqrt(pn * cn)) AS cos
                 FROM p, cand WHERE cand_id <> probe_id),
          ar AS (SELECT probe_id, cand_id, row_number() OVER
                   (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                 FROM ax),
          e0 AS (SELECT vec_id, embedding,
                   ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
                 FROM embeddings),
          exx AS (SELECT p.probe_id, e.vec_id AS cand_id,
                    (${Similarity.sqlDotD("p.pe", "e.embedding", Dim)}
                      / sqrt(p.pn * e.nn)) AS cos
                  FROM p, e0 e WHERE e.vec_id <> p.probe_id),
          er AS (SELECT probe_id, cand_id, row_number() OVER
                   (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rk
                 FROM exx),
          j AS (SELECT a.probe_id, count(*) AS n_common
                FROM (SELECT * FROM ar WHERE rk <= $TopK) a
                JOIN (SELECT * FROM er WHERE rk <= $TopK) e
                  ON a.probe_id = e.probe_id AND a.cand_id = e.cand_id
                GROUP BY a.probe_id)
          SELECT p.probe_id, CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
            CAST(coalesce(n_common, 0) AS DOUBLE) / $TopK AS recall
          FROM p LEFT JOIN j ON p.probe_id = j.probe_id"""
      }),

    // ---- binary frame sampling (L36): the video frame-sample step of
    // the multimodal family (L11) with a bytes-level frame model —
    // every 4th 16-byte frame of each payload, keyed by content md5.
    // The Spark side slices the BINARY payload (real media plumbing:
    // Column.substr on bytes, generator emits only sampled frames,
    // payload never shuffles); the oracle mirrors on the text side,
    // exact because the synthetic payloads are ASCII (byte positions =
    // char positions) and md5(string) hashes the same bytes.
    "q67_frame_sample" -> Query(
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.asMediaTable(docs(s, dir)), frameBytes = 16, everyK = 4),
      Some("""WITH f AS (SELECT doc_id AS media_id,
              unnest(range(0, length(text) // 16)) AS f, text
            FROM documents)
          SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
            CAST(16 AS BIGINT) AS frame_len,
            md5(substring(text, f * 16 + 1, 16)) AS frame_key
          FROM f WHERE f % 4 = 0""")),

    // ---- snapshot diff (L39): the data-versioning staple — classify
    // every document as added / removed / changed / unchanged between
    // two corpus snapshots by FULL OUTER joining on doc_id and
    // comparing content digests. Content keys are md5 (32 bytes), so
    // the join carries digests, never text; the "new" snapshot here is
    // derived deterministically from the same table (id%7==0 dropped =
    // removed, id%5==0 text-amended = changed, ids shifted past
    // max(doc_id) = added) so the gate exercises all four classes. The
    // added-id offset is max(doc_id)+1 FROM THE DATA (a broadcast
    // one-row scalar, not a constant) so synthetic ids can never
    // collide with real ones at any scale factor. One digest-keyed
    // shuffle per side at any scale.
    "q70_snapshot_diff" -> Query(
      (s, dir) => {
        val off = broadcast(
          docs(s, dir).agg((max(col("doc_id")) + 1).as("_off")))
        val old = docs(s, dir)
          .select(col("doc_id"), md5(col("text")).as("old_key"))
        val nw = docs(s, dir)
          .where(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("new_key"))
          .unionByName(docs(s, dir).where(col("doc_id") % 11 === 0)
            .crossJoin(off)
            .select((col("doc_id") + col("_off")).as("doc_id"),
              md5(col("text")).as("new_key")))
        old.join(nw, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("old_key").isNull, lit("added"))
              .otherwise(when(col("new_key").isNull, lit("removed"))
                .otherwise(when(col("old_key") === col("new_key"), lit("unchanged"))
                  .otherwise(lit("changed")))).as("status"))
          .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
      },
      Some("""WITH old AS (SELECT doc_id, md5(text) AS old_key FROM documents),
          nw AS (SELECT doc_id,
                   md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
                     AS new_key
                 FROM documents WHERE doc_id % 7 <> 0
                 UNION ALL
                 SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
                     AS doc_id,
                   md5(text) AS new_key
                 FROM documents WHERE doc_id % 11 = 0)
        SELECT CASE WHEN old_key IS NULL THEN 'added'
                    WHEN new_key IS NULL THEN 'removed'
                    WHEN old_key = new_key THEN 'unchanged'
                    ELSE 'changed' END AS status,
          count(*) AS n_docs
        FROM old FULL OUTER JOIN nw USING (doc_id)
        GROUP BY status""")),

    // ---- vocabulary induction (L31): the top-$VocabK corpus tokens by
    // occurrence with doc-frequency — the vocab-building step ahead of
    // rare-token scoring (q56) and tokenizer training. The global top-K
    // compiles to TakeOrderedAndProject: each task keeps its local K
    // candidates and only those merge — there is NO single-partition
    // sort of the full token table (the scalable top-k shape; ties at
    // the K boundary break deterministically on the token text).
    "q62_vocab_topk" -> Query(
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occ").desc, col("tok"))
        .limit(VocabK),
      Some(s"""SELECT tok, CAST(count(*) AS BIGINT) AS n_occ,
            CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM (SELECT doc_id, unnest($sqlToks) AS tok FROM documents)
          GROUP BY tok ORDER BY n_occ DESC, tok LIMIT $VocabK""")),

    // ---- bigram collocation mining (phrase-vocabulary induction): the
    // top adjacent token pairs by LIFT = P(w1,w2) / (P(w1)·P(w2)) =
    // c_ab·N / (c_a·c_b) — the association score behind phrase merging
    // in tokenizer/vocab pipelines (pointwise mutual information is
    // log(lift); log is monotone, so ranking by the RATIONAL lift keeps
    // the ordering while avoiding libm log() parity risk: every value
    // here is one integer product divided by another, and IEEE division
    // of exactly-representable integers is correctly rounded in both
    // engines). Scale shape: bigrams via a length-guarded slice zip
    // (NEVER sequence(1, size-1) — Spark's sequence DESCENDS when
    // size = 1, fabricating bogus pairs), one shuffle each for bigram
    // and unigram counts, unigram/total frames broadcast (vocabulary-
    // sized; a natural-language vocab is millions of rows at 100 TB —
    // still broadcastable; beyond that drop the hint and let the
    // planner shuffle-join), global top-K via orderBy+limit =
    // TakeOrderedAndProject (local K per task, no global sort).
    "q76_bigram_lift" -> Query(
      (s, dir) => {
        val toks = docs(s, dir).select(tokens(col("text")).as("t"))
        val bi = toks
          .select(explode(expr(
            "transform(slice(t, 2, size(t) - 1), (w, i) -> struct(t[i] AS w1, w AS w2))")).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
        val uni = toks.select(explode(col("t")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val n = toks.agg(sum(size(col("t"))).as("n_tok"))
        bi
          .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c_a"))), "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c_b"))), "w2")
          .crossJoin(broadcast(n))
          .filter(col("c_ab") >= MinBigramCount)
          .select(col("w1"), col("w2"), col("c_ab"),
            ((col("c_ab") * col("n_tok")).cast("double") /
              (col("c_a") * col("c_b")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("w1"), col("w2"))
          .limit(BigramK)
      },
      Some(s"""WITH t AS (SELECT $sqlToks AS t FROM documents),
          bi AS (SELECT unnest(list_transform(range(1, len(t)),
                   i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b FROM t),
          bc AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_ab
                 FROM bi GROUP BY 1, 2),
          u AS (SELECT unnest(t) AS w FROM t),
          uc AS (SELECT w, count(*) AS c FROM u GROUP BY w),
          n AS (SELECT count(*) AS n_tok FROM u)
        SELECT w1, w2, c_ab,
          CAST(c_ab * n_tok AS DOUBLE) / CAST(a.c * b.c AS DOUBLE) AS lift
        FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w, n
        WHERE c_ab >= $MinBigramCount
        ORDER BY lift DESC, w1, w2 LIMIT $BigramK""")),

    // ---- deterministic mixture scheduling (data mixing): interleave
    // sources into one training order so that at every prefix each
    // source's share tracks its weight — classic weighted round-robin
    // by VIRTUAL TIME (the k-th doc of source s runs at vt = (k+1)/w_s;
    // emitting by ascending vt yields the weighted interleave, the same
    // scheme fair queueing uses). Weights derive deterministically from
    // the source id (1 + num % 3). Scale shape: the per-source sequence
    // is a window PARTITIONED BY source (parallel across sources — no
    // global rank), vt is exact double arithmetic (small-integer
    // divisors, correctly-rounded IEEE division on both engines), and
    // the schedule head is orderBy+limit = TakeOrderedAndProject. A
    // whole-corpus schedule at 100 TB would range-partition by vt and
    // write sorted files instead of taking a head.
    "q77_mixture_schedule" -> Query(
      (s, dir) => {
        val w = (lit(1) + regexp_extract(col("source"), "([0-9]+)", 1)
          .cast("int") % 3).cast("double")
        docs(s, dir)
          .select(col("doc_id"), col("source"), w.as("w"))
          .withColumn("k", row_number().over(
            Window.partitionBy(col("source")).orderBy(col("doc_id"))))
          .select(col("doc_id"), col("source"),
            (col("k").cast("double") / col("w")).as("vt"))
          .orderBy(col("vt"), col("source"), col("doc_id"))
          .limit(MixN)
      },
      Some(s"""WITH d AS (SELECT doc_id, source,
            CAST(1 + CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 3
              AS DOUBLE) AS w,
            row_number() OVER (PARTITION BY source ORDER BY doc_id) AS k
          FROM documents)
        SELECT doc_id, source, CAST(k AS DOUBLE) / w AS vt
        FROM d ORDER BY vt, source, doc_id LIMIT $MixN""")),

    // ---- PII detection + redaction (L42): the scrub stage ahead of
    // every other curation step. The synthetic corpus carries no PII,
    // so the query PLANTS it deterministically from doc_id (emails on
    // id%3, one or two IPv4s on id%4/id%8, phones on id%5 — the q70
    // derive-from-the-data pattern) and then detects/redacts with the
    // shared Java∩RE2 patterns in [[graft.operators.Pii]]. The planted
    // mix exercises 0-, 1- and 2-match rows per category and overlap
    // of all three in one doc (id%120). Pure per-row regex column work
    // — scan-speed at 100 TB, no shuffle; output carries counts + the
    // redacted-text digest, never the text.
    "q79_pii_scrub" -> Query(
      (s, dir) => {
        val aug = concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example"))).otherwise(lit("")),
          when(col("doc_id") % 4 === 0,
            concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
              lit(".0."), (col("doc_id") % 250).cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 8 === 0,
            concat(lit(" and 192.168."), (col("doc_id") % 100).cast("string"),
              lit(".7"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" tel 555-"),
              (lit(1000) + col("doc_id") % 9000).cast("string")))
            .otherwise(lit("")))
        val staged = docs(s, dir).select(col("doc_id"), aug.as("aug_text"))
        Pii.report(staged, col("aug_text"))
          .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
            md5(col("redacted")).as("red_key"))
      },
      Some(s"""WITH a AS (SELECT doc_id, text
            || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                 || CAST(doc_id AS VARCHAR) || '@mail.example' ELSE '' END
            || CASE WHEN doc_id % 4 = 0 THEN ' from 10.'
                 || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                 || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
            || CASE WHEN doc_id % 8 = 0 THEN ' and 192.168.'
                 || CAST(doc_id % 100 AS VARCHAR) || '.7' ELSE '' END
            || CASE WHEN doc_id % 5 = 0 THEN ' tel 555-'
                 || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END
            AS aug_text FROM documents)
        SELECT doc_id,
          ${Pii.sqlCount("aug_text", Pii.EmailPattern)} AS n_email,
          ${Pii.sqlCount("aug_text", Pii.Ipv4Pattern)} AS n_ip,
          ${Pii.sqlCount("aug_text", Pii.PhonePattern)} AS n_phone,
          md5(${Pii.sqlRedact("aug_text")}) AS red_key
        FROM a""")),

    // ---- unigram-LM quality scoring (L43): the perplexity-style
    // filter — train a unigram LM on the corpus itself (token counts /
    // total), score each doc by mean negative log-likelihood, flag the
    // high-NLL tail. Production swaps in a KenLM-grade model; the
    // unigram embodiment keeps the exact plan shape: ONE token-keyed
    // map-combined count aggregate (vocabulary-sized result), log-probs
    // broadcast back onto the token stream (the corpus never shuffles),
    // one doc-keyed aggregate. Parity: ln on both engines (the q57
    // precedent), per-token values quantized to DECIMAL(18,9) before
    // the per-doc sum so partial-agg order can't perturb it (the dsum
    // rule; a raw double sum would be order-sensitive).
    "q80_unigram_nll" -> Query(
      (s, dir) => {
        val tok = docs(s, dir)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val uc = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val n = uc.agg(sum(col("c")).as("n_tok"))
        val lp = uc.crossJoin(broadcast(n))
          .select(col("tok"),
            (log(col("c").cast("double")) - log(col("n_tok").cast("double")))
              .as("lp"))
        tok.join(broadcast(lp), Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"), (-Q.dsum(col("lp"), 9)).as("nll"))
          .select(col("doc_id"), col("n_toks"), col("nll"),
            (col("nll") / col("n_toks")).as("nll_per_tok"),
            when(col("nll") > col("n_toks") * lit(NllFlagNats), 1L)
              .otherwise(0L).as("low_quality"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS tok
              FROM documents),
          uc AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
          n AS (SELECT sum(c) AS n_tok FROM uc),
          lp AS (SELECT tok, ln(CAST(c AS DOUBLE)) - ln(CAST(n_tok AS DOUBLE))
                   AS lp FROM uc, n),
          d AS (SELECT doc_id, count(*) AS n_toks,
                  -(CAST(sum(CAST(lp AS DECIMAL(18,9))) AS DOUBLE)) AS nll
                FROM tok JOIN lp USING (tok) GROUP BY doc_id)
        SELECT doc_id, n_toks, nll, nll / n_toks AS nll_per_tok,
          CAST(CASE WHEN nll > n_toks * CAST($NllFlagNats AS DOUBLE)
            THEN 1 ELSE 0 END AS BIGINT) AS low_quality
        FROM d""")),

    // ---- duplicate-span detection (L44): substring-level dedup (the
    // Lee et al. 2022 "Deduplicating Training Data" signal) — find the
    // maximal token spans whose every $DupSpanN-gram occurs elsewhere
    // in the corpus (another doc OR another position of the same doc).
    // Shape: position-ordered 60-bit shingle hashes off the native
    // kernel (the 31-bit MinHash universe would birthday-collide at
    // corpus scale), ONE hash-keyed map-combined count to find
    // duplicated shingles, an equi-join back on the 8-byte hash
    // (digests shuffle, text never does), then gaps-and-islands per
    // doc — adjacent duplicated positions merge into maximal spans via
    // the p − row_number() island key, a doc-partitioned window (no
    // global sort). The span list is what surgical span-removal (vs
    // whole-doc drop) consumes downstream.
    "q81_dup_spans" -> Query(
      (s, dir) => Dedup.duplicateSpans(docs(s, dir), col("doc_id"),
        col("text"), DupSpanN),
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          hh AS (SELECT doc_id, ${sqlShingleHashes60("toks", DupSpanN)} AS hs
                 FROM t),
          sh AS (SELECT doc_id, unnest(range(1, len(hs) + 1)) AS p,
                   unnest(hs) AS h FROM hh),
          dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= 2),
          g AS (SELECT doc_id, p,
                  p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
                    AS grp
                FROM sh JOIN dup USING (h))
        SELECT doc_id, min(p) AS span_start,
          max(p) + ${DupSpanN - 1} AS span_end, count(*) AS n_shingles
        FROM g GROUP BY doc_id, grp""")),

    // ---- per-source token profiles (L45): the top-$TopTokK tokens of
    // every source — the per-domain vocabulary fingerprint that drives
    // mixture design and source-level drift monitoring. ONE
    // map-combined (source, token) count aggregate; the rank window
    // partitions by source over the VOCABULARY-sized count frame
    // (parallel across sources, never a global sort; ties break on the
    // token text).
    "q82_source_toptok" -> Query(
      (s, dir) => docs(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n_occ"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("n_occ").desc, col("tok"))))
        .where(col("rk") <= TopTokK)
        .select(col("source"), col("tok"), col("n_occ"),
          col("rk").cast("long").as("rk")),
      Some(s"""WITH c AS (SELECT source, tok, count(*) AS n_occ
            FROM (SELECT source, unnest($sqlToks) AS tok FROM documents)
            GROUP BY source, tok),
          r AS (SELECT source, tok, n_occ,
                  row_number() OVER (PARTITION BY source
                    ORDER BY n_occ DESC, tok) AS rk
                FROM c)
        SELECT source, tok, n_occ, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= $TopTokK""")),

    // ---- TextRank keyword extraction (L48): weighted PageRank over
    // the symmetrized token-adjacency graph — the graph-centrality
    // keyword/quality signal (the same operator ranks a URL link graph
    // for crawl-quality weighting). Ranks are DETERMINISTIC: every
    // per-node sum floors its contributions to 2^-40 fixed point first
    // (exact integer math, order-independent — see GraphRank's
    // determinism contract; a decimal CAST would tie-break differently
    // across engines on dyadic products). Per iteration: ONE v-keyed
    // map-combined aggregate; the node-sized rank frame broadcasts
    // onto the edge frame (drop the hint for corpus-scale node sets —
    // same plan, shuffle join). Head via TakeOrderedAndProject.
    "q85_textrank" -> Query(
      (s, dir) => {
        val toks = docs(s, dir).select(tokens(col("text")).as("t"))
        val bi = toks
          .select(explode(expr(
            "transform(slice(t, 2, size(t) - 1), (w, i) -> struct(t[i] AS w1, w AS w2))")).as("b"))
          .select(col("b.w1").as("u"), col("b.w2").as("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        val sym = bi.unionByName(
          bi.select(col("v").as("u"), col("u").as("v"), col("w")))
        GraphRank.pageRank(sym, TextRankIters, TextRankDamping)
          .orderBy(col("r").desc, col("node"))
          .limit(TextRankK)
          .select(col("node").as("tok"), col("r").as("rank"))
      },
      Some(s"""WITH t AS (SELECT $sqlToks AS t FROM documents),
          bi0 AS (SELECT unnest(list_transform(range(1, len(t)),
                    i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
                  FROM t),
          bc AS (SELECT b.w1 AS u, b.w2 AS v, count(*) AS w
                 FROM bi0 GROUP BY 1, 2),
          sym0 AS (SELECT u, v, w FROM bc
                   UNION ALL SELECT v AS u, u AS v, w FROM bc),
          sym AS (SELECT u, v, sum(w) AS w FROM sym0 GROUP BY u, v),
          ${GraphRank.sqlPageRank(TextRankIters, TextRankDamping)}
        SELECT node AS tok, r AS rank FROM r$TextRankIters
        ORDER BY rank DESC, tok LIMIT $TextRankK""")),

    // ---- embedding label-purity diagnostics (L49): per-vector cosine
    // margin between the own-label centroid and the best other-label
    // centroid — negative margin = mislabel/boundary candidate, the
    // embedding-level label-noise audit a labeled training set runs.
    // Centroids follow the q60 quantized-mean rule (exact integer
    // sums), assemble into per-label arrays on an order-pinned dim
    // sort, and BROADCAST — the scoring pass never shuffles the
    // corpus; cosines ride the native left-fold vec_dot kernel.
    "q86_label_purity" -> Query(
      (s, dir) => Similarity.labelPurity(Tables.embeddings(s, dir),
          col("vec_id"), col("label"), col("embedding"), PurityQuantBits)
        .select(col("id").as("vec_id"), col("label"), col("own_cos"),
          col("best_other"), col("margin"), col("misaligned")),
      Some {
        val q = (1L << PurityQuantBits).toDouble.toString
        s"""WITH x AS (SELECT label AS c_label,
              unnest(range(0, $Dim)) AS d,
              unnest(list_transform(range(0, $Dim), i ->
                CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * $q) AS BIGINT)))
                AS qx
            FROM embeddings),
          cl AS (SELECT c_label, d, count(*) AS n, sum(qx) AS sum_q
                 FROM x GROUP BY c_label, d),
          cdt AS (SELECT c_label, d, (CAST(sum_q AS DOUBLE) / n) / $q AS cd
                  FROM cl),
          cent AS (SELECT c_label,
                     list_transform(list_sort(list(struct_pack(d := d, cd := cd))),
                       s2 -> s2.cd) AS cvec
                   FROM cdt GROUP BY c_label),
          cc AS (SELECT c_label, cvec,
                   ${Similarity.sqlDotD("cvec", "cvec", Dim)} AS cn FROM cent),
          v AS (SELECT vec_id, label, embedding AS e,
                  ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS vn
                FROM embeddings),
          sc AS (SELECT vec_id, label, c_label,
                   ${Similarity.sqlDotD("e", "cvec", Dim)} / sqrt(vn * cn)
                     AS cos
                 FROM v, cc),
          p AS (SELECT vec_id, label,
                  max(CASE WHEN c_label = label THEN cos END) AS own_cos,
                  max(CASE WHEN c_label <> label THEN cos END) AS best_other
                FROM sc GROUP BY vec_id, label)
        SELECT vec_id, label, own_cos, best_other,
          own_cos - best_other AS margin,
          CAST(CASE WHEN best_other > own_cos THEN 1 ELSE 0 END AS BIGINT)
            AS misaligned
        FROM p"""
      }),

    // ---- bloom-pruned reverse decontamination (L50): which TRAIN docs
    // carry eval (src0) content? The eval shingle set is aggregated into
    // a BloomFilterAggregate sketch (one map-combined agg over the small
    // side; numBits/8 bytes on the driver regardless of cardinality) and
    // probed with might_contain in the TRAIN scan stage, so the confirm
    // join's corpus-side shuffle carries only bloom-surviving shingles.
    // Exact output — the sketch has no false negatives and the confirm
    // join removes the false positives — so the oracle is the plain
    // exact overlap SQL with no bloom anywhere.
    "q88_bloom_decontam" -> Query(
      (s, dir) => {
        val d = docs(s, dir)
        BloomPrune.contaminatedTrainDocs(
          d.where(col("source") === "src0"),
          d.where(col("source") =!= "src0"),
          col("doc_id"), col("text"), ShingleN, ContamMinShared)
      },
      Some(s"""WITH t AS (SELECT doc_id, source, $sqlToks AS toks FROM documents),
          hh AS (SELECT doc_id, source,
              list_distinct(${sqlShingleHashes("toks", ShingleN)}) AS shset
            FROM t),
          ev AS (SELECT DISTINCT unnest(shset) AS h FROM hh
                 WHERE source = 'src0'),
          tr AS (SELECT doc_id AS t_id, unnest(shset) AS h FROM hh
                 WHERE source <> 'src0')
        SELECT t_id, count(*) AS n_shared
        FROM tr JOIN ev USING (h)
        GROUP BY t_id HAVING count(*) >= $ContamMinShared""")),

    // ---- two-pass exact heavy hitters (L51): tokens covering ≥ 1% of
    // all occurrences. Pass 1 is the Misra-Gries sketch (a GLOBAL agg
    // whose shuffled partials are ≤capacity entries per map task — the
    // key universe never shuffles); pass 2 broadcast-joins the ≤capacity
    // candidates into the scan and exactly counts only those. Output is
    // exact (capacity+1 > den ⇒ the sketch can't lose a qualifying key),
    // so the oracle is the plain groupBy-having SQL with no sketch.
    "q90_heavy_hitters" -> Query(
      (s, dir) => HeavyHitters.heavyHitters(
        docs(s, dir).select(explode(tokens(col("text"))).as("k")),
        col("k"), capacity = 128, minFracDen = 100L),
      Some(s"""WITH tk AS (SELECT unnest($sqlToks) AS k FROM documents),
          tot AS (SELECT count(*) AS n_total FROM tk)
        SELECT k AS token, count(*) AS n_occ
        FROM tk, tot GROUP BY k, n_total
        HAVING count(*) * 100 >= n_total""")),

    // ---- hard-negative mining (L54): per anchor, the max-cosine
    // OTHER-label vector among its LSH-bucket peers — contrastive
    // training-pair prep without an all-pairs scan (bucketed self-join,
    // rank-1 WindowGroupLimit; see Similarity.hardNegatives). The plane
    // count is AUTO-SIZED from the corpus row count (planesFor — the
    // r6 sf5 gate measured the old pinned-4-plane config at 50× for 5×
    // data: 16 buckets over 250k vectors is ~n²/16 pair work); the
    // oracle computes the identical count with the bit-shift-loop
    // mirror and masks its plane terms, so one static SQL text tracks
    // the dynamic sizing at any SF up to 125·2^16 rows.
    "q92_hard_negatives" -> Query(
      (s, dir) => Similarity.hardNegativesAutoSized(
        Tables.embeddings(s, dir), Dim, HnTargetBucket),
      Some(s"""WITH pl AS (SELECT ${Similarity.sqlPlanesFor(
                "(SELECT count(*) FROM embeddings)", HnTargetBucket)} AS np),
          v AS (SELECT vec_id, label, embedding AS e,
              ${Similarity.sqlLshBucketDyn("embedding", 16, Dim,
                "(SELECT np FROM pl)")} AS bucket,
              ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
            FROM embeddings),
          c AS (SELECT a.vec_id, a.label, b.vec_id AS neg_id,
                  b.label AS neg_label,
                  ${Similarity.sqlDotD("a.e", "b.e", Dim)} / sqrt(a.nn * b.nn)
                    AS neg_cos
                FROM v a JOIN v b
                  ON a.bucket = b.bucket AND a.label <> b.label),
          r AS (SELECT *, row_number() OVER
                  (PARTITION BY vec_id ORDER BY neg_cos DESC, neg_id) AS rn
                FROM c)
        SELECT vec_id, label, neg_id, neg_label, neg_cos
        FROM r WHERE rn = 1""")),

    // ---- SemDeDup semantic dedup (L55): cluster-then-prune — map-side
    // nearest-cell assignment (q40's codegen'd kernel + centroid
    // convention), within-cell cosine-threshold pairs (one cell-keyed
    // shuffle, never all-pairs — the paper's reason for clustering
    // first), connected components (q47's machinery) → group keepers.
    // The oracle mirrors assignment with the all-pairs crk=1 rank and
    // components with the recursive-CTE reachability closure.
    "q93_semantic_dedup" -> Query(
      (s, dir) => Similarity.semanticDedup(Tables.embeddings(s, dir),
        isCentroid = col("vec_id") % 125 === 7, threshold = 0.4),
      Some {
        val simEC = s"(${Similarity.sqlDotD("e.embedding", "c.cemb", Dim)} / sqrt(e.nn * c.cn))"
        val simXY = s"(${Similarity.sqlDotD("x.embedding", "y.embedding", Dim)} / sqrt(x.nn * y.nn))"
        s"""WITH RECURSIVE e AS (SELECT vec_id, embedding,
               ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
             FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb, nn AS cn
                FROM e WHERE vec_id % 125 = 7),
          a0 AS (SELECT e.vec_id, e.embedding, e.nn, c.cent_id,
                   $simEC AS csim
                 FROM e, c),
          asn AS (SELECT vec_id, embedding, nn, cent_id AS cell FROM
                  (SELECT *, row_number() OVER
                     (PARTITION BY vec_id ORDER BY csim DESC, cent_id)
                     AS crk FROM a0)
                  WHERE crk = 1),
          edges AS (SELECT x.vec_id AS u, y.vec_id AS v
                    FROM asn x JOIN asn y
                      ON x.cell = y.cell AND x.vec_id < y.vec_id
                    WHERE $simXY >= 0.4),
          sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
          nodes AS (SELECT DISTINCT u AS node FROM sym),
          reach(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.node, s2.v FROM reach r JOIN sym s2 ON s2.u = r.lbl),
          comp AS (SELECT node, min(lbl) AS component FROM reach
                   GROUP BY node)
        SELECT a.vec_id, a.cell,
          COALESCE(c2.component, a.vec_id) AS group_id,
          CAST(CASE WHEN COALESCE(c2.component, a.vec_id) = a.vec_id
               THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
        FROM asn a LEFT JOIN comp c2 ON a.vec_id = c2.node"""
      }),

    // ---- incremental corpus-append triage (L56): the nightly-crawl
    // admission decision — each new-batch doc (doc_id % 5 == 4 stands in
    // for the arriving batch) classified exact_dup / near_dup / clean
    // against the existing corpus. Digest SEMI join for the exact arm
    // (32-byte keys both ways); the near arm reuses the banded-LSH
    // candidate join + Jaccard ≥ 1/2 gate and keeps CROSS pairs only.
    "q94_append_triage" -> Query(
      (s, dir) => Dedup.appendTriage(docs(s, dir),
        isNew = col("doc_id") % 5 === 4, col("doc_id"), col("text"),
        ShingleN, NumHashes, NumBands, RowsPerBand),
      Some {
        s"""WITH $sqlLshPairsCtes,
          verified AS (SELECT doc_a, doc_b,
              len(list_intersect(sa.shset, sb.shset)) AS n_common,
              len(sa.shset) + len(sb.shset)
                - len(list_intersect(sa.shset, sb.shset)) AS n_union
            FROM pairs JOIN sets sa ON pairs.doc_a = sa.doc_id
                       JOIN sets sb ON pairs.doc_b = sb.doc_id),
          cross_p AS (SELECT CASE WHEN doc_a % 5 = 4 THEN doc_a
                             ELSE doc_b END AS doc_id
                      FROM verified
                      WHERE 2 * n_common >= n_union
                        AND ((doc_a % 5 = 4) <> (doc_b % 5 = 4))),
          near AS (SELECT doc_id, count(*) AS n_near FROM cross_p
                   GROUP BY doc_id),
          k AS (SELECT doc_id,
                  md5(array_to_string(list_sort(list_distinct($sqlToks)), ' '))
                    AS ckey
                FROM documents),
          ex AS (SELECT doc_id FROM k WHERE doc_id % 5 = 4 AND ckey IN
                 (SELECT ckey FROM k WHERE doc_id % 5 <> 4))
        SELECT d.doc_id,
          CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
            AS is_exact_dup,
          CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near_dup,
          CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
               WHEN COALESCE(n.n_near, 0) > 0 THEN 'near_dup'
               ELSE 'clean' END AS verdict
        FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 4) d
        LEFT JOIN ex e ON d.doc_id = e.doc_id
        LEFT JOIN near n ON d.doc_id = n.doc_id"""
      }),

    // ---- persisted dedup-signature LEDGER lifecycle (L119, VERDICT
    // r8 #6): the old side's digests + MinHash signatures are SAVED as
    // a parquet artifact, and the nightly append-triage runs against
    // the LOADED artifact — old TEXT never exists in the job. The near
    // verdict is therefore the MinHash ESTIMATOR (2·matching signature
    // components ≥ numHashes ⇒ estimated Jaccard ≥ 1/2) — exactly the
    // swap a production ledger forces, replayed by the oracle from
    // first principles (tokens → shingles → permuted minima →
    // band-bucket pairs → component agreement). AppendTriageSpec pins
    // persisted ≡ in-memory bit-equality through the parquet round
    // trip.
    "q168_dedup_ledger" -> Query(
      (s, dir) => {
        // per-run artifact path (the q142/q146 rule: no cross-run race)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_ledger_" +
          s.sparkContext.applicationId + "_" + dirMd5(dir)
        // r16: spread — both ledger arms tokenize/minhash map-side
        val d = Tables.spread(
          docs(s, dir).select(col("doc_id"), col("text")))
        Dedup.saveDedupLedger(d.where(col("doc_id") % 5 =!= 4),
          col("doc_id"), col("text"), ShingleN, NumHashes, base)
        Dedup.appendTriageLedger(d.where(col("doc_id") % 5 === 4),
          Dedup.loadDedupLedger(s, base), col("doc_id"), col("text"),
          ShingleN, NumHashes, NumBands, RowsPerBand)
      },
      Some {
        s"""WITH $sqlLshPairsCtes,
          est AS (SELECT doc_a, doc_b,
              len(list_filter(range($NumHashes), i ->
                sa.sig[CAST(i + 1 AS INT)] = sb.sig[CAST(i + 1 AS INT)]))
                AS n_match
            FROM pairs JOIN s sa ON pairs.doc_a = sa.doc_id
                       JOIN s sb ON pairs.doc_b = sb.doc_id
            WHERE (doc_a % 5 = 4) <> (doc_b % 5 = 4)),
          near AS (SELECT CASE WHEN doc_a % 5 = 4 THEN doc_a
                          ELSE doc_b END AS doc_id,
                   count(*) AS n_near
                   FROM est WHERE 2 * n_match >= $NumHashes
                   GROUP BY 1),
          k AS (SELECT doc_id,
                  md5(array_to_string(list_sort(list_distinct($sqlToks)), ' '))
                    AS ckey
                FROM documents),
          ex AS (SELECT doc_id FROM k WHERE doc_id % 5 = 4 AND ckey IN
                 (SELECT ckey FROM k WHERE doc_id % 5 <> 4))
        SELECT d.doc_id,
          CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
            AS is_exact_dup,
          CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near_dup,
          CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
               WHEN COALESCE(n.n_near, 0) > 0 THEN 'near_dup'
               ELSE 'clean' END AS verdict
        FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 4) d
        LEFT JOIN ex e ON d.doc_id = e.doc_id
        LEFT JOIN near n ON d.doc_id = n.doc_id"""
      }),

    // ---- boilerplate n-gram report (L57): the C4/RefinedWeb template
    // signal — a gram in ≥ 1/10 of a source's docs is boilerplate; each
    // doc reports its boilerplate-gram coverage. Gram occurrences shuffle
    // ONCE as 8-byte hash60 keys for the df aggregate; the (by
    // construction tiny) boilerplate set broadcasts back onto the gram
    // stream, so the coverage pass never re-shuffles it. Threshold
    // compare is integer cross-multiplication on both engines.
    "q95_boilerplate" -> Query(
      // r16: spread — the gram-hash map stage was one-task
      (s, dir) => Curation.boilerplateReport(
        Tables.spread(docs(s, dir)
          .select(col("doc_id"), col("source"), col("text"))),
        col("doc_id"), col("source"), col("text"), BoilerN, BoilerNum,
        BoilerDen),
      Some(s"""WITH t AS (SELECT doc_id, source, $sqlToks AS toks
              FROM documents),
          b AS (SELECT doc_id, source,
                  ${sqlShingleHashes60("toks", BoilerN)} AS hs FROM t),
          bb AS (SELECT * FROM b WHERE len(hs) > 0),
          g AS (SELECT doc_id, source, CAST(len(hs) AS BIGINT) AS n_grams,
                  unnest(hs) AS h FROM bb),
          sc AS (SELECT source, count(*) AS n_src FROM bb GROUP BY source),
          bp AS (SELECT g.source, g.h
                 FROM g JOIN sc USING (source)
                 GROUP BY g.source, g.h, sc.n_src
                 HAVING count(DISTINCT g.doc_id) * $BoilerDen
                        >= n_src * $BoilerNum)
        SELECT g.doc_id, max(g.n_grams) AS n_grams,
          CAST(sum(CASE WHEN bp.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_boiler,
          CAST(sum(CASE WHEN bp.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / max(g.n_grams) AS boiler_frac
        FROM g LEFT JOIN bp ON g.source = bp.source AND g.h = bp.h
        GROUP BY g.doc_id""")),

    // ---- per-source document cap (L58): keep the best $CapK docs per
    // source (n_chars desc, doc_id tie-break) — the RefinedWeb/FineWeb
    // domain-cap step. `row_number ≤ k` compiles to WindowGroupLimit:
    // each task keeps its local top-k per source BEFORE the single
    // source-keyed exchange, so the shuffle carries ≤ k·sources·tasks
    // rows — a hot domain is bounded at k per task, not its crawl share.
    "q96_source_caps" -> Query(
      (s, dir) => Curation.capPerGroup(
          docs(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
          col("source"), Seq(col("n_chars").desc, col("doc_id")), CapK)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("rnk").cast("long").as("rnk")),
      Some(s"""SELECT doc_id, source, n_chars, rnk FROM (
          SELECT doc_id, source, n_chars, row_number() OVER
              (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
          FROM documents) WHERE rnk <= $CapK""")),

    // ---- dedup-weighted token accounting (L60): per source, raw vs
    // effective (each exact-dup cluster counted once, at its min-id
    // keeper) doc and token counts — the "how many unique tokens do I
    // actually have" number behind epoch math. One digest-keyed
    // map-combined aggregate + a digest-keyed join carrying (digest, id,
    // n_toks) triples; every counter is an integer.
    "q98_effective_tokens" -> Query(
      (s, dir) => Curation.effectiveTokens(docs(s, dir), col("doc_id"),
        col("text"), col("source")),
      Some(s"""WITH d AS (SELECT doc_id, source,
              md5(array_to_string(list_sort(list_distinct($sqlToks)), ' '))
                AS ckey,
              CAST(len($sqlToks) AS BIGINT) AS n_toks FROM documents),
          k AS (SELECT ckey, min(doc_id) AS keeper_id FROM d GROUP BY ckey)
        SELECT source, count(*) AS n_docs,
          CAST(sum(n_toks) AS BIGINT) AS raw_tokens,
          CAST(sum(CASE WHEN doc_id = keeper_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unique_docs,
          CAST(sum(CASE WHEN doc_id = keeper_id THEN n_toks ELSE 0 END)
            AS BIGINT) AS unique_tokens
        FROM d JOIN k USING (ckey) GROUP BY source""")),

    // ---- balanced shard plan (L61): round-robin over the size-
    // descending global rank (longest-first — the classic balance
    // heuristic for writing ~equal-budget training shards). The rank is
    // the q15 two-pass (per-bucket row_number + broadcast offsets over
    // equal-width size buckets), never an unpartitioned window; the
    // oracle's single-window ORDER BY is the semantics, not the plan.
    "q99_shard_plan" -> Query(
      (s, dir) => Curation.shardPlan(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        col("n_chars"), col("doc_id"), NumShards),
      Some(s"""SELECT doc_id, CAST(n_chars AS BIGINT) AS sz,
          row_number() OVER (ORDER BY n_chars DESC, doc_id) AS g_rank,
          (row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1)
            % $NumShards AS shard
        FROM documents""")),

    // ---- balanced shard SINK (L100): q99's plan materialized as a
    // real partitioned parquet layout, manifest read back FROM THE
    // WRITTEN FILES — the gate proves the physical round trip (what the
    // plan assigned is what a reader of shard=K sees). Deterministic
    // per-input-dir output path, deleted before each run (the q35
    // side-effecting precedent).
    "q142_shard_sink" -> Query(
      (s, dir) => {
        // Keyed by (applicationId, input dir): deterministic WITHIN a
        // run (same path on re-execution, so the delete-then-write
        // stays idempotent) but disjoint ACROSS concurrent harness
        // runs over the same data dir — two drivers racing on a shared
        // delete-then-write path would corrupt each other's manifest
        // (ADVICE r7).
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_shards_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
        val plan = Curation.shardPlan(d, col("n_chars"), col("doc_id"),
          NumShards)
        Curation.writeShards(d, plan, col("doc_id"), col("n_chars"), base)
      },
      Some(s"""WITH plan AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS sz,
            (row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1)
              % $NumShards AS shard
          FROM documents)
        SELECT shard, count(*) AS n_docs, CAST(sum(sz) AS BIGINT) AS sum_sz,
          min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM plan GROUP BY shard""")),

    // ---- codebook persistence round trip (L103): the elected codebook
    // saved as a parquet ARTIFACT, reloaded, and used for cell
    // assignment — per-cell member counts from the PERSISTED codebook
    // must equal the oracle's from the live election (bit-exact through
    // the float round trip: parquet stores the same float32s). The
    // retrain→publish→assign lifecycle every IVF deployment runs.
    "q146_codebook_roundtrip" -> Query(
      (s, dir) => {
        // Per-run path (q142 rationale): concurrent runs must not race
        // on the codebook artifact's delete-then-write.
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_cb_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        val emb = Tables.embeddings(s, dir)
        Similarity.saveCodebook(emb, col("vec_id") % 125 === 7, base)
        Similarity.assignCells(emb, Similarity.loadCodebook(s, base))
          .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding,
               ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
             FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb, nn AS cn
                FROM e WHERE vec_id % 125 = 7),
          a0 AS (SELECT e.vec_id, c.cent_id,
                   (${Similarity.sqlDotD("e.embedding", "c.cemb", Dim)}
                     / sqrt(e.nn * c.cn)) AS csim
                 FROM e, c),
          asn AS (SELECT vec_id, cent_id AS cell FROM
              (SELECT *, row_number() OVER
                 (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk
               FROM a0) WHERE rk = 1)
        SELECT cell, count(*) AS n_members FROM asn GROUP BY cell""")),

    // ---- cluster quality metrics (L62): per-cell member count and
    // inertia under the shared cosine-nearest assignment (q40/q60/q93's
    // one kernel, one convention) — the codebook-tuning number for
    // IVF/SemDeDup (elbow curves, split decisions, retrain drift).
    // Per-point d² = ‖x‖² − 2x·c + ‖c‖² is quantized to 2^-20 fixed
    // point before the cell sum (the q60 rule) so the aggregate is exact
    // integer math; assignment is map-side, the centroid payload is a
    // broadcast codebook, and the only exchange carries ≤ cells
    // map-combined partial rows per task.
    "q100_cluster_metrics" -> Query(
      (s, dir) => Similarity.clusterMetrics(Tables.embeddings(s, dir),
        isCentroid = col("vec_id") % 125 === 7, LloydQuantBits),
      Some {
        val q = (1L << LloydQuantBits).toDouble
        s"""WITH e AS (SELECT vec_id, embedding,
               ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
             FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb, nn AS cn
                FROM e WHERE vec_id % 125 = 7),
          a0 AS (SELECT e.vec_id, e.embedding, e.nn, c.cent_id, c.cemb,
                   c.cn,
                   (${Similarity.sqlDotD("e.embedding", "c.cemb", Dim)}
                     / sqrt(e.nn * c.cn)) AS csim
                 FROM e, c),
          asn AS (SELECT * FROM
                  (SELECT *, row_number() OVER
                     (PARTITION BY vec_id ORDER BY csim DESC, cent_id)
                     AS crk FROM a0)
                  WHERE crk = 1),
          dd AS (SELECT cent_id AS cell,
                   CAST(floor((nn - 2 *
                     ${Similarity.sqlDotD("embedding", "cemb", Dim)}
                     + cn) * $q) AS BIGINT) AS dq
                 FROM asn)
        SELECT cell, count(*) AS n_vectors,
          CAST(sum(dq) AS BIGINT) AS inertia_q,
          CAST(sum(dq) AS DOUBLE) / $q AS inertia,
          (CAST(sum(dq) AS DOUBLE) / $q) / count(*) AS mean_sq_dist
        FROM dd GROUP BY cell"""
      }),

    // ---- dimension-truncation recall (L63): exact search over the
    // first 16/32 of 64 embedding components vs the full-dim exact
    // search — the Matryoshka-compression eval that decides how hard an
    // embedding column can be truncated (storage/IO at 100 TB is linear
    // in kept dims). Both searches are the q28 broadcast-probe shape;
    // ranks tie-break on cand_id so recall is exact.
    "q101_trunc_recall" -> Query(
      (s, dir) => {
        // r16: spread the narrow embeddings scan — the per-arm cosine
        // sweeps ran over a one-task candidate side
        val emb = Tables.spread(Tables.embeddings(s, dir))
        TruncDims.map(d => Similarity.truncatedRecall(emb,
          isProbeId(col("vec_id")), TopK, d)).reduce(_ unionAll _)
      },
      Some {
        def topkCte(tag: String, d: Int) =
          s"""s$tag AS (SELECT probe_id, vec_id AS cand_id,
                ${Similarity.sqlCosine("pe", "embedding", d)} AS cos
              FROM p, embeddings WHERE vec_id <> probe_id),
            t$tag AS (SELECT probe_id, cand_id FROM
                (SELECT *, row_number() OVER
                   (PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                   AS rk FROM s$tag)
                WHERE rk <= $TopK)"""
        val arms = TruncDims.map { d =>
          s"""SELECT p.probe_id, CAST($d AS BIGINT) AS trunc_dim,
              CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
              CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / $TopK AS recall
            FROM p LEFT JOIN
              (SELECT f.probe_id, count(*) AS n_hit
               FROM tfull f JOIN td$d t
                 ON f.probe_id = t.probe_id AND f.cand_id = t.cand_id
               GROUP BY f.probe_id) h
              ON p.probe_id = h.probe_id"""
        }.mkString(" UNION ALL ")
        s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
                FROM embeddings WHERE ${sqlProbeId}),
          ${topkCte("full", Dim)},
          ${TruncDims.map(d => topkCte(s"d$d", d)).mkString(",\n          ")}
        $arms"""
      }),

    // ---- leakage-safe split (L64): train/heldout assigned by the
    // CONTENT digest, not the row id — exact duplicates can never
    // straddle the boundary and leak eval text into training. Pure
    // map-side salted-hash math (the shared slot derivation); pass a
    // near-dup cluster id instead to harden to near-dup level.
    "q102_leakage_split" -> Query(
      (s, dir) => Sampling.leakageSafeSplit(
        docs(s, dir).select(col("doc_id"),
          Dedup.contentKey(col("text")).as("ckey")),
        col("ckey"), SplitPerMille, SplitSalt),
      Some {
        val ckey = s"md5(array_to_string(list_sort(list_distinct($sqlToks)), ' '))"
        s"""SELECT doc_id, $ckey AS ckey,
            CASE WHEN ${Sampling.sqlSlot(ckey, SplitSalt)} < $SplitPerMille
                 THEN 'train' ELSE 'heldout' END AS split
          FROM documents"""
      }),

    // ---- cross-source overlap matrix (L65): distinct shared shingles
    // per source pair — the leakage heat-map generalizing eval-vs-train
    // decontamination to all corpus slices (mirror/re-crawl detection).
    // The (source, shingle) frame is ONE distinct aggregate over 8-byte
    // keys; ubiquitous shingles (> $MaxOverlapSources sources) drop
    // before the shingle-keyed pair join, bounding per-key fanout; the
    // matrix aggregate map-combines to ≤ sources² rows per task.
    "q103_source_overlap" -> Query(
      // r16: spread — the tokenize+shingle stage was one-task
      (s, dir) => Dedup.sourceOverlapMatrix(
        Tables.spread(docs(s, dir)
          .select(col("doc_id"), col("source"), col("text"))),
        col("source"), col("text"), ShingleN, MaxOverlapSources),
      Some(s"""WITH t AS (SELECT doc_id, source, $sqlToks AS toks
              FROM documents),
          g AS (SELECT DISTINCT source, h FROM
                (SELECT source, unnest(${sqlShingleHashes60("toks", ShingleN)})
                   AS h FROM t)),
          ns AS (SELECT h FROM g GROUP BY h
                 HAVING count(*) BETWEEN 2 AND $MaxOverlapSources),
          k AS (SELECT g.source, g.h FROM g JOIN ns USING (h)),
          sz AS (SELECT source, count(*) AS n_shingles FROM g
                 GROUP BY source)
        SELECT a.source AS source_a, b.source AS source_b,
          count(*) AS n_shared,
          CAST(count(*) AS DOUBLE) / least(za.n_shingles, zb.n_shingles)
            AS overlap
        FROM k a JOIN k b ON a.h = b.h AND a.source < b.source
        JOIN sz za ON za.source = a.source
        JOIN sz zb ON zb.source = b.source
        GROUP BY a.source, b.source, za.n_shingles, zb.n_shingles""")),

    // ---- corpus-wide block dedup + reassembly (L66): the C4/RefinedWeb
    // line-dedup step at fixed token-block granularity — first global
    // occurrence of each block survives, documents are rebuilt from
    // their surviving blocks. Election is ONE rank over the 8-byte
    // block hash (uniform keys, skew-free); reassembly one doc-keyed
    // exchange. Both engines partition by the SAME hash60, so even a
    // hash collision (merging two distinct blocks) stays definitionally
    // identical across the gate.
    "q105_block_dedup" -> Query(
      (s, dir) => Curation.blockDedup(docs(s, dir), col("doc_id"),
        col("text"), BlockTok),
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          bi AS (SELECT doc_id, toks,
                   unnest(range((len(toks) - 1) // $BlockTok + 1)) AS i
                 FROM t),
          b AS (SELECT doc_id, CAST(i AS BIGINT) AS block_idx,
                  array_to_string(
                    toks[(CAST(i AS BIGINT) * $BlockTok + 1):
                         (CAST(i AS BIGINT) * $BlockTok + $BlockTok)],
                    ' ') AS btext
                FROM bi),
          r AS (SELECT doc_id, block_idx, btext, row_number() OVER
                  (PARTITION BY ${sqlHash60("btext")}
                   ORDER BY doc_id, block_idx) AS rk
                FROM b),
          k AS (SELECT doc_id, count(*) AS n_kept,
                  string_agg(btext, ' ' ORDER BY block_idx) AS text_dedup
                FROM r WHERE rk = 1 GROUP BY doc_id)
        SELECT t.doc_id,
          CAST((len(t.toks) - 1) // $BlockTok + 1 AS BIGINT) AS n_blocks,
          CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
          coalesce(k.text_dedup, '') AS text_dedup
        FROM t LEFT JOIN k ON t.doc_id = k.doc_id""")),

    // ---- vocabulary coverage / OOV audit (L67): top-K corpus vocab
    // (count desc, token asc — the q62 boundary tie-break) broadcast
    // back over the token stream; per-doc OOV mass and type counts.
    "q106_vocab_coverage" -> Query(
      (s, dir) => Curation.vocabCoverage(docs(s, dir), col("doc_id"),
        col("text"), OovVocabK),
      Some(s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS tok
              FROM documents),
          v AS (SELECT tok FROM
                  (SELECT tok, count(*) AS c FROM tok GROUP BY tok
                   ORDER BY c DESC, tok LIMIT $OovVocabK)),
          j AS (SELECT tok.doc_id, tok.tok, v.tok AS vtok
                FROM tok LEFT JOIN v ON tok.tok = v.tok)
        SELECT doc_id, count(*) AS n_toks,
          CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_oov,
          count(DISTINCT CASE WHEN vtok IS NULL THEN tok END)
            AS n_oov_types,
          CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*) AS oov_rate
        FROM j GROUP BY doc_id""")),

    // ---- per-source mix drift (L68): total-variation distance of each
    // source's unigram distribution vs the corpus, integer-exact
    // numerator (the L53 stance — no ln, no float sum); absent-token
    // mass telescopes so only existing (source, token) pairs
    // materialize. One token-keyed exchange; top drifted term via
    // rank-1 window.
    "q107_source_drift" -> Query(
      (s, dir) => Drift.sourceMixDrift(docs(s, dir), col("source"),
        col("text")),
      Some(s"""WITH tok AS (SELECT source, unnest($sqlToks) AS tok
              FROM documents),
          st AS (SELECT source, tok, count(*) AS c_st FROM tok
                 GROUP BY source, tok),
          ct AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st
                 GROUP BY tok),
          ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st
                 GROUP BY source),
          n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_tot FROM ct),
          terms AS (SELECT st.source, st.tok, st.c_st, ct.c_t, ns.n_s,
                  n.n_tot,
                  abs(CAST(st.c_st AS DECIMAL(38,0)) * n.n_tot
                    - CAST(ct.c_t AS DECIMAL(38,0)) * ns.n_s) AS num
                FROM st JOIN ct USING (tok) JOIN ns USING (source), n),
          top AS (SELECT source, tok AS top_tok,
                  CAST(num AS BIGINT) AS top_tok_num FROM
                    (SELECT *, row_number() OVER (PARTITION BY source
                       ORDER BY num DESC, tok) AS rk FROM terms)
                  WHERE rk = 1),
          agg AS (SELECT source, max(n_s) AS n_toks_src, max(n_tot) AS _n,
                  CAST(sum(num) AS DECIMAL(38,0)) AS _present,
                  CAST(sum(c_t) AS BIGINT) AS _cov
                FROM terms GROUP BY source)
        SELECT a.source, a.n_toks_src,
          CAST(a._present + CAST(a.n_toks_src AS DECIMAL(38,0))
               * (a._n - a._cov) AS BIGINT) AS tv_num,
          CAST(a._present + CAST(a.n_toks_src AS DECIMAL(38,0))
               * (a._n - a._cov) AS DOUBLE)
            / ((CAST(2.0 AS DOUBLE) * a.n_toks_src) * a._n) AS tv,
          t.top_tok, t.top_tok_num
        FROM agg a JOIN top t USING (source)""")),

    // ---- ROC-AUC classifier audit (L70): Mann-Whitney AUC with exact
    // tie correction — does doc length predict English-ness? The score
    // (n_chars) is integer and heavily tied, so the average-rank tie
    // path is actually exercised. Rank is the q15 two-pass, never an
    // unpartitioned window; u2 accumulates in DECIMAL(38,0).
    "q108_roc_auc" -> Query(
      (s, dir) => Curation.rocAuc(docs(s, dir), col("n_chars"),
        col("lang") === "en", col("doc_id")),
      Some("""WITH r AS (SELECT n_chars AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rk
             FROM documents),
          g AS (SELECT s, CAST(sum(y) AS BIGINT) AS n_pos_s,
                  min(rk) AS min_rk, max(rk) AS max_rk
                FROM r GROUP BY s),
          a AS (SELECT CAST(sum(n_pos_s) AS BIGINT) AS n_pos,
                  CAST(sum(max_rk - min_rk + 1 - n_pos_s) AS BIGINT) AS n_neg,
                  CAST(sum(CAST(min_rk + max_rk AS HUGEINT) * n_pos_s)
                    AS HUGEINT) AS rk2
                FROM g)
        SELECT n_pos, n_neg,
          CAST(rk2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT) AS u2,
          CAST(rk2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
            / (2.0 * n_pos * n_neg) AS auc
        FROM a""")),

    // ---- calibration audit (L71): reliability bins of a length-based
    // "probability of English" against the actual label — support,
    // positive count, decimal-exact mean prediction, empirical rate,
    // |gap| per bin. ONE map-combined groupBy.
    "q109_calibration" -> Query(
      (s, dir) => Curation.calibrationReport(docs(s, dir),
        least(col("n_chars"), lit(1000L)).cast("double") / 1000.0,
        col("lang") === "en", CalibBins),
      Some(s"""WITH d AS (SELECT least(n_chars, 1000) / 1000.0 AS p,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             FROM documents),
          b AS (SELECT CAST(least(floor(p * $CalibBins), ${CalibBins - 1})
                  AS BIGINT) AS bin, p, y FROM d)
        SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
          (${Q.sqlSum("p", 6)} / count(*)) AS mean_pred,
          CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate,
          abs(${Q.sqlSum("p", 6)} / count(*)
            - CAST(sum(y) AS DOUBLE) / count(*)) AS gap
        FROM b GROUP BY bin""")),

    // ---- cluster-agreement ARI (L69): does the q100 quantizer's cell
    // assignment reproduce the embedding labels? Chance-corrected,
    // permutation-invariant — the codebook-retrain regression gate.
    // Same fixed centroid election as q100 so the oracle mirrors the
    // assignment in plain SQL.
    "q110_cluster_ari" -> Query(
      (s, dir) => Similarity.clusterAgreement(Tables.embeddings(s, dir),
        col("label"), col("vec_id") % 125 === 7),
      Some(s"""WITH e AS (SELECT vec_id, embedding, label,
               ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
             FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb, nn AS cn
                FROM e WHERE vec_id % 125 = 7),
          a0 AS (SELECT e.vec_id, e.label, c.cent_id,
                   (${Similarity.sqlDotD("e.embedding", "c.cemb", Dim)}
                     / sqrt(e.nn * c.cn)) AS csim
                 FROM e, c),
          asn AS (SELECT label AS truth, cent_id AS cell FROM
                  (SELECT *, row_number() OVER
                     (PARTITION BY vec_id ORDER BY csim DESC, cent_id)
                     AS crk FROM a0)
                  WHERE crk = 1),
          cont AS (SELECT truth, cell, count(*) AS n_ij FROM asn
                   GROUP BY truth, cell),
          s1 AS (SELECT CAST(sum(CAST(n_ij AS HUGEINT) * (n_ij - 1) // 2)
                    AS HUGEINT) AS sij,
                  CAST(sum(n_ij) AS BIGINT) AS n FROM cont),
          s2 AS (SELECT CAST(sum(CAST(a_i AS HUGEINT) * (a_i - 1) // 2)
                    AS HUGEINT) AS sa FROM
                  (SELECT CAST(sum(n_ij) AS BIGINT) AS a_i FROM cont
                   GROUP BY truth)),
          s3 AS (SELECT CAST(sum(CAST(b_j AS HUGEINT) * (b_j - 1) // 2)
                    AS HUGEINT) AS sb FROM
                  (SELECT CAST(sum(n_ij) AS BIGINT) AS b_j FROM cont
                   GROUP BY cell))
        SELECT n, CAST(sij AS BIGINT) AS sum_comb_cells,
          CAST(sa AS BIGINT) AS sum_comb_truth,
          CAST(sb AS BIGINT) AS sum_comb_assigned,
          (CAST(sij AS DOUBLE) - CAST(sa AS DOUBLE) * sb
             / CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS DOUBLE))
          / ((CAST(sa AS DOUBLE) + sb) / 2 - CAST(sa AS DOUBLE) * sb
             / CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS DOUBLE)) AS ari
        FROM s1, s2, s3""")),

    // ---- DSIR importance weights (L72): hashed-unigram probability
    // ratio of the English slice vs the raw corpus, integer-quantized
    // (log-free — ln is not bit-portable across libm builds). Bucket
    // counts aggregate to $DsirBuckets rows, the weight table
    // broadcasts back, per-doc score is one doc-keyed exchange.
    "q111_dsir_weights" -> Query(
      (s, dir) => Curation.importanceWeights(docs(s, dir), col("doc_id"),
        col("text"), col("lang") === "en", DsirBuckets),
      Some(s"""WITH tok AS (SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
               (${sqlHash60("tk")} % $DsirBuckets) AS b
             FROM (SELECT doc_id, lang, unnest($sqlToks) AS tk
                   FROM documents)),
          c AS (SELECT b, count(*) AS c_all,
                  CAST(sum(t) AS BIGINT) AS c_tgt FROM tok GROUP BY b),
          tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_all,
                  CAST(sum(c_tgt) AS BIGINT) AS n_tgt FROM c),
          w AS (SELECT b, CAST((CAST(c_tgt + 1 AS HUGEINT)
                    * (n_all + $DsirBuckets) * 1000000)
                  // (CAST(c_all + 1 AS HUGEINT) * (n_tgt + $DsirBuckets))
                  AS BIGINT) AS w
                FROM c, tot)
        SELECT doc_id, count(*) AS n_toks,
          CAST(sum(w.w) AS BIGINT) AS dsir_score,
          CAST(sum(w.w) AS DOUBLE) / count(*) AS dsir_mean
        FROM tok JOIN w USING (b) GROUP BY doc_id""")),

    // ---- content-defined chunking (L74): FastCDC/rsync boundaries at
    // token grain — a boundary after every token whose hash ≡ 0 mod m,
    // so chunk identity survives insertions that shift every fixed
    // block of q105. is_first = 0 rows are the shift-resistant
    // duplicate mass.
    "q113_cdc_chunks" -> Query(
      (s, dir) => Curation.cdcChunks(docs(s, dir), col("doc_id"),
        col("text"), CdcModulus),
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          tk AS (SELECT doc_id, unnest(toks) AS tok,
                   generate_subscripts(toks, 1) - 1 AS pos FROM t),
          b AS (SELECT doc_id, pos, tok,
                  CASE WHEN (${sqlHash60("tok")} % $CdcModulus) = 0
                    THEN 1 ELSE 0 END AS bnd
                FROM tk),
          c AS (SELECT doc_id, pos, tok,
                  coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS chunk_idx
                FROM b),
          ch AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                   CAST(min(pos) AS BIGINT) AS chunk_start,
                   count(*) AS n_toks,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_key
                 FROM c GROUP BY doc_id, chunk_idx)
        SELECT doc_id, chunk_idx, chunk_start, n_toks, chunk_key,
          CAST(CASE WHEN row_number() OVER (PARTITION BY chunk_key
              ORDER BY doc_id, chunk_idx) = 1 THEN 1 ELSE 0 END AS BIGINT)
            AS is_first
        FROM ch""")),

    // ---- interpolated bigram-LM scoring (L75): per-doc mean NLL under
    // p(w2|w1) = λ·c12/c1 + (1-λ)·c2/N trained on the corpus itself —
    // the KenLM-shaped upgrade of q80's unigram filter. The bigram
    // probability table is corpus-sized, so it JOINS on the bigram key
    // (never broadcasts); per-bigram log-probs quantize to
    // DECIMAL(18,9) before the doc sum (the q80 parity rule).
    "q114_bigram_nll" -> Query(
      (s, dir) => {
        // r16: spread the narrow scan — both tokenize passes (unigram
        // and bigram arms) were single-task stages
        val base = Tables.spread(docs(s, dir)
            .select(col("doc_id"), col("text")))
          .select(col("doc_id"), tokens(col("text")).as("toks"))
        val tok = base.select(explode(col("toks")).as("tok"))
        // uc feeds the total AND the prob join; bc feeds the context
        // counts AND the prob join — both vocabulary-sized, pinned so
        // neither consumer re-tokenizes the corpus (the q27 lesson)
        val uc = tok.groupBy(col("tok")).agg(count(lit(1)).as("c2"))
          .localCheckpoint()
        val nTot = uc.agg(sum(col("c2")).as("nn"))
        val bg = base.where(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2")))).as("pr"))
          .select(col("doc_id"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
          .localCheckpoint()
        val c1t = bc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        val lp = bc.join(c1t, Seq("w1"))
          .join(uc.withColumnRenamed("tok", "w2"), Seq("w2"))
          .crossJoin(broadcast(nTot))
          .select(col("w1"), col("w2"),
            log(lit(BigramLambda) * col("c12") / col("c1")
              + lit(1 - BigramLambda) * col("c2") / col("nn")).as("lp"))
        bg.join(lp, Seq("w1", "w2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            (-Q.dsum(col("lp"), 9)).as("nll"))
          .withColumn("nll_per_bigram", col("nll") / col("n_bigrams"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
          bg AS (SELECT doc_id, toks[CAST(i AS BIGINT)] AS w1,
                   toks[CAST(i AS BIGINT) + 1] AS w2
                 FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)
                 WHERE len(toks) >= 2),
          bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
          c1t AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc
                  GROUP BY w1),
          uc AS (SELECT tok AS w2, count(*) AS c2 FROM
                   (SELECT unnest($sqlToks) AS tok FROM documents)
                 GROUP BY tok),
          nt AS (SELECT CAST(sum(c2) AS BIGINT) AS nn FROM uc),
          lp AS (SELECT bc.w1, bc.w2,
                   ln($BigramLambda * c12 / c1
                     + ${1 - BigramLambda} * c2 / nn) AS lp
                 FROM bc JOIN c1t USING (w1) JOIN uc USING (w2), nt),
          d AS (SELECT doc_id, count(*) AS n_bigrams,
                  -(CAST(sum(CAST(lp AS DECIMAL(18,9))) AS DOUBLE)) AS nll
                FROM bg JOIN lp USING (w1, w2) GROUP BY doc_id)
        SELECT doc_id, n_bigrams, nll, nll / n_bigrams AS nll_per_bigram
        FROM d""")),

    // ---- per-source exact quantiles (L76): discrete p50/p90/p99 of
    // doc length per source — every output is an actual input value at
    // integer rank ceil(q·n), so the result is hash-stable where
    // approx_percentile is not. Partition-parallel per-source windows.
    "q115_group_quantiles" -> Query(
      (s, dir) => Curation.groupQuantiles(docs(s, dir), col("source"),
        col("n_chars"), col("doc_id")),
      Some("""WITH r AS (SELECT source AS group_key, n_chars AS v, doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars, doc_id) AS rk,
               count(*) OVER (PARTITION BY source) AS n
             FROM documents)
        SELECT group_key, count(*) AS n,
          max(CASE WHEN rk = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
            THEN v END) AS p50,
          max(CASE WHEN rk = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
            THEN v END) AS p90,
          max(CASE WHEN rk = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
            THEN v END) AS p99
        FROM r GROUP BY group_key""")),

    // ---- Count-Min sketch audit (L77): deterministic CMS (hash60 with
    // per-row salts) vs exact counts for the top tokens — the
    // width-vs-error measurement that sizes a production CMS. The
    // counter table is depth*width rows by construction; est >= true
    // always (the CMS guarantee, visible in the overestimate column).
    "q116_cms_audit" -> Query(
      (s, dir) => HeavyHitters.countMinAudit(
        docs(s, dir).select(explode(tokens(col("text"))).as("tok")),
        col("tok"), CmsDepth, CmsWidth, CmsAuditK),
      Some {
        def b(kExpr: String, jExpr: String) =
          s"(${sqlHash60(s"CAST($jExpr AS VARCHAR) || '_' || $kExpr")} % $CmsWidth)"
        s"""WITH ks AS (SELECT unnest($sqlToks) AS k FROM documents),
          ex AS (SELECT k, CAST(j AS BIGINT) AS j FROM ks,
                 LATERAL (SELECT unnest(range($CmsDepth)) AS j)),
          cnt AS (SELECT j, ${b("k", "j")} AS bucket, count(*) AS c
                  FROM ex GROUP BY j, bucket),
          top AS (SELECT k, count(*) AS n_true FROM ks GROUP BY k
                  ORDER BY n_true DESC, k LIMIT $CmsAuditK),
          est AS (SELECT t.k, t.n_true, min(c.c) AS n_est
                  FROM top t JOIN cnt c
                    ON c.bucket = ${b("t.k", "c.j")}
                  GROUP BY t.k, t.n_true)
        SELECT k AS token, n_true, n_est, n_est - n_true AS overestimate
        FROM est"""
      }),

    // ---- reciprocal-rank fusion (L78): fuse two quality signals with
    // incomparable scales (char length, token count) by rank only —
    // score = 1/(k+rank_a) + 1/(k+rank_b), canonical k=60. Integer
    // ranks make the float fusion engine-exact; both global ranks are
    // the q15 two-pass.
    "q117_rrf_fusion" -> Query(
      (s, dir) => Curation.rrfFuse(docs(s, dir), col("doc_id"),
        col("n_chars"), size(tokens(col("text"))), RrfK, RrfTopN),
      Some(s"""WITH r AS (SELECT doc_id,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank_a,
               row_number() OVER (ORDER BY len($sqlToks) DESC, doc_id)
                 AS rank_b
             FROM documents)
        SELECT doc_id AS id, rank_a, rank_b,
          1e0 / ($RrfK + rank_a) + 1e0 / ($RrfK + rank_b) AS rrf
        FROM r ORDER BY rrf DESC, doc_id LIMIT $RrfTopN""")),

    // ---- dominant principal component (L79): 3-round power iteration
    // on the second-moment matrix — the embedding-anisotropy audit.
    // M is built in ONE corpus scan (dim² map-combined partial sums);
    // iterations are driver-side on the 64×64 matrix. Fixed-point
    // quantization (floor at 2^30 — exact in IEEE) before every sum
    // makes each iterate bit-identical across engines.
    "q118_dominant_component" -> Query(
      (s, dir) => Spectral.dominantComponent(Tables.embeddings(s, dir),
        Dim, iters = 3),
      Some(Spectral.sqlDominantComponent("embeddings", "embedding",
        Dim, iters = 3))),

    // ---- per-label centroid-similarity matrix (L80): cosine between
    // label mean-embeddings (cosine is scale-invariant, so exact
    // quantized SUMS substitute for means) — the embedding-space
    // redundancy map one level above q103's lexical overlap.
    "q119_centroid_sim" -> Query(
      (s, dir) => Spectral.centroidSimilarity(Tables.embeddings(s, dir),
        col("label")),
      Some {
        val qL = Spectral.Q.toLong
        // centroids re-quantize to 2^20 by integer division so every
        // int near a double stays below 2^53 (exact conversion — the
        // DuckDB wide-decimal→double cast is not correctly rounded)
        s"""WITH s AS (SELECT label AS lbl, dd.d AS d, count(*) AS n,
              CAST(sum(CAST(floor(CAST(embedding[dd.d + 1] AS DOUBLE)
                * $qL) AS BIGINT)) AS HUGEINT) // (count(*) * 1024) AS c
            FROM embeddings, LATERAL (SELECT unnest(range($Dim)) AS d) dd
            GROUP BY label, dd.d),
          p AS (SELECT a.lbl AS label_a, b.lbl AS label_b,
                  a.n AS n_a, b.n AS n_b,
                  CAST(sum(a.c * b.c) AS BIGINT) AS ab,
                  CAST(sum(a.c * a.c) AS BIGINT) AS aa,
                  CAST(sum(b.c * b.c) AS BIGINT) AS bb
                FROM s a JOIN s b ON a.d = b.d AND a.lbl <= b.lbl
                GROUP BY a.lbl, b.lbl, a.n, b.n)
        SELECT label_a, label_b, n_a, n_b,
          CAST(ab AS DOUBLE) / sqrt(CAST(aa AS DOUBLE) * CAST(bb AS DOUBLE))
            AS cos_sim
        FROM p"""
      }),

    // ---- priority sampling (L82): weighted sampling without
    // replacement (Duffield/Lund/Thorup) — deterministic uniform from
    // the salted hash, priority w/u, keep the n largest. No RNG; the
    // top-n cut is TakeOrderedAndProject.
    "q121_priority_sample" -> Query(
      (s, dir) => Sampling.prioritySample(docs(s, dir), col("doc_id"),
          col("n_chars"), PrioN, PrioSalt)
        .select(col("doc_id"), col("n_chars"), col("priority")),
      Some(s"""SELECT doc_id, n_chars, pr AS priority FROM
          (SELECT doc_id, n_chars,
             ${Sampling.sqlPriority("n_chars", "doc_id", PrioSalt)} AS pr
           FROM documents ORDER BY pr DESC, doc_id LIMIT $PrioN)""")),

    // ---- JL projection distortion audit (L83): Achlioptas ±1/√K sign
    // projection 64 → 8 dims, map-side only (literal sign vectors fold
    // into the plan); per-probe-pair original vs projected squared
    // distance. The basis-free cousin of q101's Matryoshka truncation.
    "q122_jl_distortion" -> Query(
      (s, dir) => Spectral.jlDistortion(Tables.embeddings(s, dir),
        col("vec_id") < JlProbes, Dim, JlK),
      Some {
        val ys = (0 until JlK).map(k =>
          s"${Spectral.sqlJlComponent("embedding", Dim, JlK, k)} AS y$k")
          .mkString(",\n              ")
        val d2p = (0 until JlK).map(k =>
          s"(a.y$k - b.y$k) * (a.y$k - b.y$k)").mkString(" + ")
        s"""WITH pr AS (SELECT vec_id, embedding,
              $ys,
              ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
            FROM embeddings WHERE vec_id < $JlProbes)
        SELECT id_a, id_b, d2_orig, d2_proj, d2_proj / d2_orig AS ratio
        FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                (a.nn - 2.0 *
                  ${Similarity.sqlDotD("a.embedding", "b.embedding", Dim)}
                  + b.nn) AS d2_orig,
                ($d2p) AS d2_proj
              FROM pr a JOIN pr b ON a.vec_id < b.vec_id)"""
      }),

    // ---- LSH pair precision/recall eval (L84): on a FIXED 200-doc
    // sample, the production band join's candidate pairs vs exact
    // all-pairs Jaccard >= 1/4 ground truth — the near-dup twin of the
    // q73/q74 ANN recall gates, measured on the production code path.
    "q123_lsh_pair_eval" -> Query(
      (s, dir) => Dedup.lshPairEval(docs(s, dir), col("doc_id"),
        col("text"), col("doc_id") < EvalSampleN, ShingleN, NumHashes,
        NumBands, RowsPerBand, EvalJacNum, EvalJacDen),
      Some(s"""WITH ${sqlLshPairsCtesFrom(
            s"(SELECT * FROM documents WHERE doc_id < $EvalSampleN)")},
          ne AS (SELECT doc_id, shset FROM sets WHERE len(shset) > 0),
          ap AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.shset, b.shset)) AS n_common,
                   len(a.shset) + len(b.shset)
                     - len(list_intersect(a.shset, b.shset)) AS n_union
                 FROM ne a JOIN ne b ON a.doc_id < b.doc_id),
          truth AS (SELECT doc_a, doc_b FROM ap
                    WHERE n_common * $EvalJacDen >= n_union * $EvalJacNum),
          hit AS (SELECT t.doc_a FROM truth t
                  JOIN pairs p ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b),
          nt AS (SELECT count(*) AS n_truth FROM truth),
          nc AS (SELECT count(*) AS n_cand FROM pairs),
          nh AS (SELECT count(*) AS n_hit FROM hit)
        SELECT n_truth, n_cand, n_hit,
          CASE WHEN n_cand > 0
            THEN CAST(n_hit AS DOUBLE) / n_cand END AS precision,
          CASE WHEN n_truth > 0
            THEN CAST(n_hit AS DOUBLE) / n_truth END AS recall
        FROM nt, nc, nh""")),

    // ---- per-source data card (L85): the corpus summary a training
    // run documents and tunes its mixture from — doc/token/char
    // counts, language diversity + dominant language, exact-dup rate
    // (the L1 digest measure), mean doc length. Three passes, each
    // collapsing map-side to <= sources rows.
    "q124_data_card" -> Query(
      (s, dir) => Curation.dataCard(docs(s, dir), col("source"),
        col("doc_id"), col("text"), col("lang")),
      Some(s"""WITH base AS (SELECT source, doc_id, lang, text,
               $sqlToks AS toks FROM documents),
          wide AS (SELECT source, count(*) AS n_docs,
                   CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars,
                   count(DISTINCT lang) AS n_langs
                 FROM base GROUP BY source),
          tl AS (SELECT source, lang AS top_lang, c AS top_lang_docs FROM
                  (SELECT source, lang, count(*) AS c, row_number() OVER
                     (PARTITION BY source ORDER BY count(*) DESC, lang)
                     AS rk
                   FROM base GROUP BY source, lang)
                 WHERE rk = 1),
          dd AS (SELECT source, count(DISTINCT
                   md5(array_to_string(list_sort(list_distinct(toks)), ' ')))
                   AS n_distinct
                 FROM base GROUP BY source)
        SELECT w.source, n_docs, n_tokens, n_chars, n_langs,
          top_lang, top_lang_docs,
          CAST(top_lang_docs AS DOUBLE) / n_docs AS top_lang_share,
          n_distinct,
          CAST(n_docs - n_distinct AS DOUBLE) / n_docs AS dup_rate,
          CAST(n_tokens AS DOUBLE) / n_docs AS mean_doc_tokens
        FROM wide w JOIN tl USING (source) JOIN dd USING (source)""")),

    // ---- per-label embedding outliers (L86): the topK vectors
    // furthest from their own label's centroid — the mislabel/poison
    // shortlist, ranked complement of q86's aggregate purity. Centroid
    // broadcast, distance map-side, top-k via WindowGroupLimit.
    "q125_centroid_outliers" -> Query(
      (s, dir) => Spectral.centroidOutliers(Tables.embeddings(s, dir),
        col("label"), OutlierK),
      Some {
        val qL = Spectral.Q.toLong
        s"""WITH s AS (SELECT label AS lbl, dd.d AS d,
              CAST(sum(CAST(floor(CAST(embedding[dd.d + 1] AS DOUBLE)
                * $qL) AS BIGINT)) AS HUGEINT) // (count(*) * 1024) AS c
            FROM embeddings, LATERAL (SELECT unnest(range($Dim)) AS d) dd
            GROUP BY label, dd.d),
          ca AS (SELECT lbl, list(CAST(c AS DOUBLE) / 1048576.0
                   ORDER BY d) AS carr
                 FROM s GROUP BY lbl),
          dist AS (SELECT e.label, e.vec_id,
              (${Similarity.sqlDotD("e.embedding", "e.embedding", Dim)}
                - 2.0 * ${Similarity.sqlDotD("e.embedding", "ca.carr", Dim)}
                + ${Similarity.sqlDotD("ca.carr", "ca.carr", Dim)}) AS d2
            FROM embeddings e JOIN ca ON e.label = ca.lbl)
        SELECT label, vec_id, d2, CAST(rk AS INT) AS rk FROM
          (SELECT *, row_number() OVER
             (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rk
           FROM dist)
        WHERE rk <= $OutlierK"""
      }),

    // ---- PCM window energy (L87): the payload interpreted as LE
    // int16 samples, exact integer energy + RMS per 4-sample window —
    // the multimodal compute path that is NOT a stub (PCM is
    // arithmetic, not a format). Decode rides hex() so both engines
    // compute identical samples.
    "q126_pcm_energy" -> Query(
      (s, dir) => Multimodal.pcmWindowEnergy(
        Multimodal.asMediaTable(docs(s, dir)), PcmWin),
      Some {
        val w = PcmWin
        def nib(pos: String) =
          s"(strpos('0123456789ABCDEF', substr(hx, CAST($pos AS INT), 1)) - 1)"
        val u = s"""((((${nib(s"(win * $w + i) * 4 + 3")} * 16
             + ${nib(s"(win * $w + i) * 4 + 4")}) * 16
             + ${nib(s"(win * $w + i) * 4 + 1")}) * 16)
             + ${nib(s"(win * $w + i) * 4 + 2")})"""
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
              octet_length(encode(text)) AS blen FROM documents),
          wins AS (SELECT media_id, hx, CAST(wv AS BIGINT) AS win
                   FROM m, LATERAL (SELECT unnest(range(blen // ${2 * w}))
                     AS wv)),
          e AS (SELECT media_id, win,
                  CAST(list_sum(list_transform(range(0, $w), i ->
                    CASE WHEN $u >= 32768
                      THEN ($u - 65536) * ($u - 65536)
                      ELSE $u * $u END)) AS BIGINT) AS energy
                FROM wins)
        SELECT media_id, win AS win_idx, energy,
          sqrt(CAST(energy AS DOUBLE) / $w) AS rms
        FROM e"""
      }),

    // ---- WAV container decode (L95, the de-stubbed L11 decode): each
    // doc's bytes are wrapped into a REAL RIFF/WAVE container (PCM fmt
    // chunk + a variable-length junk LIST chunk + data chunk — built in
    // pure codegen by Multimodal.wavPayload), then parsed back by the
    // imperative mapPartitions chunk-walker Multimodal.decodeWav. The
    // oracle emits the TRUTH fields the container was synthesized from
    // (the q45 round-trip pattern): sample rate / channels from the
    // doc_id formulas, data offset from the junk-chunk length (so a
    // parser that does not actually read the length fields cannot
    // match), and the data-chunk int16 energy via the q126 hex trick.
    "q134_wav_decode" -> Query(
      (s, dir) => {
        import s.implicits._
        val tb = col("text").cast("binary")
        val dataBytes = tb.substr(lit(1), (length(tb) / 2).cast("int") * 2)
        val media = docs(s, dir).select(col("doc_id").as("media_id"),
          Multimodal.wavPayload(dataBytes,
            lit(8000) + (col("doc_id") % 5) * 1000,
            (lit(1) + col("doc_id") % 2).cast("int"),
            lit(1) + col("doc_id") % 7).as("payload"))
        Multimodal.decodeWav(media.as[(Long, Array[Byte])]).toDF()
          .select(col("media_id"),
            col("fmt_code").cast("long").as("fmt_code"),
            col("channels").cast("long").as("channels"),
            col("sample_rate"),
            col("bits").cast("long").as("bits"),
            col("n_chunks").cast("long").as("n_chunks"),
            col("data_off"), col("n_samples"), col("energy"),
            when(col("n_samples") > 0,
              sqrt(col("energy").cast("double") / col("n_samples"))).as("rms"),
            col("valid"))
      },
      Some {
        def nib(pos: String) =
          s"(strpos('0123456789ABCDEF', substr(hx, CAST($pos AS INT), 1)) - 1)"
        val u = s"""((((${nib("i * 4 + 3")} * 16
             + ${nib("i * 4 + 4")}) * 16
             + ${nib("i * 4 + 1")}) * 16)
             + ${nib("i * 4 + 2")})"""
        s"""WITH m AS (SELECT doc_id AS media_id,
              1 + doc_id % 2 AS channels,
              8000 + (doc_id % 5) * 1000 AS sample_rate,
              1 + doc_id % 7 AS junk,
              hex(encode(text)) AS hx,
              (octet_length(encode(text)) // 2) * 2 AS dlen
            FROM documents),
          e AS (SELECT media_id, channels, sample_rate, junk, dlen,
              COALESCE(CAST(list_sum(list_transform(range(dlen // 2), i ->
                CASE WHEN $u >= 32768
                  THEN ($u - 65536) * ($u - 65536)
                  ELSE $u * $u END)) AS BIGINT), 0) AS energy
            FROM m)
        SELECT media_id, CAST(1 AS BIGINT) AS fmt_code,
          CAST(channels AS BIGINT) AS channels,
          CAST(sample_rate AS BIGINT) AS sample_rate,
          CAST(16 AS BIGINT) AS bits, CAST(3 AS BIGINT) AS n_chunks,
          CAST(52 + junk + junk % 2 AS BIGINT) AS data_off,
          CAST(dlen // 2 AS BIGINT) AS n_samples, energy,
          CASE WHEN dlen > 0
            THEN sqrt(CAST(energy AS DOUBLE) / (dlen // 2)) END AS rms,
          true AS valid
        FROM e"""
      }),

    // ---- PNG image decode (VERDICT r7 #2 — L95 extended to images):
    // each doc's bytes become the 8-bit gray raster of a REAL PNG
    // (signature, IHDR, one store-mode-deflate IDAT with real chunk
    // CRCs + Adler-32, IEND — with scanline filter r % 5 so all five
    // PNG filters appear), then parsed back by Multimodal.decodePng:
    // chunk walk + CRC verify + JDK-Inflater inflate + per-scanline
    // unfilter. The oracle emits the TRUTH pixel sums the raster was
    // synthesized from — filters 1–4 make filtered-byte sums diverge
    // from raw sums, so a parser that skips inflate or unfilter
    // cannot hash-match.
    //
    // SYNTHESIS moved to the imperative seam in r9 (VERDICT r8 #8):
    // the codegen hex-assembly form (conv + filter HOFs + a quadratic
    // hex-concat aggregate) cost a fixed ~2.7 s at sf0.1 even with the
    // raster capped at 200 bytes — the sweep's single biggest
    // constant. Multimodal.pngPayloadBytes builds the byte-identical
    // container inside the SAME mapPartitions pass the decoder already
    // runs in (the q153/q166 pattern), which let the raster cap rise
    // 200 → 2000 bytes (400 scanlines, every filter 80×) while
    // CUTTING wall time. The codegen form stays in-tree as the
    // engine-portability witness; PngSpec pins the two byte-identical.
    "q149_png_decode" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = docs(s, dir)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val tb = text.getBytes("UTF-8")
              val dlen5 = math.min(tb.length / 5 * 5, 2000)
              val raw = Array.tabulate(dlen5)(i => tb(i) & 0xff)
              (id, Multimodal.pngPayloadBytes(raw, 5))
            }
          }
        Multimodal.decodePng(media).toDF()
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("bit_depth").cast("long").as("bit_depth"),
            col("color_type").cast("long").as("color_type"),
            col("n_chunks").cast("long").as("n_chunks"),
            col("idat_len"), col("px_sum"), col("px_energy"),
            col("valid"))
      },
      Some {
        def nib(pos: String) =
          s"(strpos('0123456789ABCDEF', substr(hx, CAST($pos AS INT), 1)) - 1)"
        val u = s"(${nib("i * 2 + 1")} * 16 + ${nib("i * 2 + 2")})"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
              least((octet_length(encode(text)) // 5) * 5, 2000) AS dlen
            FROM documents),
          e AS (SELECT media_id, dlen,
              COALESCE(CAST(list_sum(list_transform(range(dlen), i ->
                $u)) AS BIGINT), 0) AS px_sum,
              COALESCE(CAST(list_sum(list_transform(range(dlen), i ->
                $u * $u)) AS BIGINT), 0) AS px_energy
            FROM m)
        SELECT media_id, CAST(5 AS BIGINT) AS width,
          CAST(dlen // 5 AS BIGINT) AS height,
          CAST(8 AS BIGINT) AS bit_depth, CAST(0 AS BIGINT) AS color_type,
          CAST(3 AS BIGINT) AS n_chunks,
          CAST(11 + (dlen // 5) * 6 AS BIGINT) AS idat_len,
          px_sum, px_energy, true AS valid
        FROM e"""
      }),

    // ---- REAL BPE tokenizer application (VERDICT r7 #7 — L8's
    // "BPE-ish" counts upgraded to actual token ids): greedy leftmost-
    // best-pair merging per whitespace word against the BpeMerges
    // fixture (a synthesized small-vocab merges artifact, Scala
    // literals interpolated into both engines). The oracle replays the
    // SAME one-merge-per-step loop as a DuckDB recursive CTE over the
    // token-list state, so the long-format (doc, word, pos, token, id)
    // output hash-matches only if every merge decision — rank
    // priority, leftmost tie-break, fixpoint — agrees step for step.
    "q150_bpe_tokenize" -> Query(
      (s, dir) => {
        import s.implicits._
        Bpe.tokenize(
          docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)],
          BpeMerges).toDF()
          .select(col("doc_id"),
            col("word_idx").cast("long").as("word_idx"),
            col("pos").cast("long").as("pos"),
            col("token"), col("token_id"))
      },
      Some {
        s"""$sqlBpeFinCte
        SELECT doc_id, CAST(wi AS BIGINT) AS word_idx,
          CAST(i + 1 AS BIGINT) AS pos, tok AS token,
          CAST($sqlBpeIdCase AS BIGINT) AS token_id
        FROM (SELECT doc_id, wi, seq[CAST(i + 1 AS INT)] AS tok, i
              FROM fin, LATERAL (SELECT unnest(range(len(seq))) AS i))"""
      }),

    // ---- tokenizer ARTIFACT lifecycle (the L103 codebook precedent
    // applied to BPE): the merges table saved as a rank-ordered parquet
    // artifact, reloaded, and APPLIED — per-doc token accounting from
    // the PERSISTED merges must equal the oracle's from the literal
    // fixture. The train→publish→apply lifecycle every production
    // tokenizer deployment runs; a rank permutation or string mangle in
    // the round trip would flip merge priorities and change counts.
    "q151_bpe_artifact" -> Query(
      (s, dir) => {
        import s.implicits._
        // per-run artifact path (the q142/q146 rule: no cross-run race)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_merges_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        Bpe.saveMerges(s, BpeMerges, base)
        val loaded = Bpe.loadMerges(s, base)
        Bpe.tokenize(
          docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)],
          loaded).toDF()
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("word_idx")).as("n_words"),
            count(lit(1)).as("n_tokens"),
            sum(when(length(col("token")) > 1, 1L).otherwise(0L))
              .as("n_merged"),
            sum(col("token_id")).as("sum_ids"))
      },
      Some {
        s"""$sqlBpeFinCte,
          tokrows AS (SELECT doc_id, wi, seq[CAST(i + 1 AS INT)] AS tok
                FROM fin, LATERAL (SELECT unnest(range(len(seq))) AS i))
        SELECT doc_id, CAST(count(DISTINCT wi) AS BIGINT) AS n_words,
          CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN length(tok) > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_merged,
          CAST(sum($sqlBpeIdCase) AS BIGINT) AS sum_ids
        FROM tokrows GROUP BY doc_id"""
      }),

    // ---- L111: BPE merge TRAINING (the train side of q150/q151's
    // apply): learn BpeTrainN merges from the documents corpus —
    // per-round weighted pair counts over the distinct-word vocab,
    // global argmax with the (count DESC, left, right) tie-break,
    // incremental merge application (Bpe.trainMerges). The oracle
    // replays the ENTIRE loop in DuckDB with one unrolled CTE block
    // per round, so the output hash-matches only if every round's
    // counts, tie-break, and left-to-right application agree — the
    // train→publish→apply lifecycle is then closed end-to-end by
    // q151's artifact gate on the apply side.
    "q157_bpe_train" -> Query(
      (s, dir) => {
        import s.implicits._
        val merges = graft.operators.Bpe.trainMerges(
          docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)],
          BpeTrainN)
        merges.map { case (k, l, r, c) => (k.toLong, l, r, c) }
          .toDF("merge_rank", "pair_left", "pair_right", "pair_count")
      },
      Some(sqlBpeTrainOracle(BpeTrainN))),

    // ---- baseline JPEG decode (L107 — the format the blocked list
    // carried since r6): fixtures are ENCODED by the JDK's own codec
    // (javax.imageio — an independent implementation producing a real
    // entropy-coded stream: Huffman tables, quantization, bit-stuffed
    // scan data), then parsed by the hand-rolled Jpeg decoder (marker
    // walk + canonical Huffman + dequant + IDCT). The oracle emits the
    // STRUCTURAL truth the synthesis fixed (dimensions from doc_id
    // formulas, the JDK gray-encoder's constant table/sampling layout,
    // MCU arithmetic); pixel fidelity is differentially pinned against
    // the JDK DECODER in JpegSpec (±1/sample — T.81 allows IDCT
    // variance, so there is no bit-exact truth to oracle).
    "q153_jpeg_decode" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = docs(s, dir)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions { it =>
            System.setProperty("java.awt.headless", "true")
            // ImageIO defaults to a DISK-backed stream cache — one temp
            // file created+deleted per encoded image, which went
            // super-linear under fs pressure at sf20 (5.8× for 4× docs
            // isolated; in-memory streams restore linearity)
            javax.imageio.ImageIO.setUseCache(false)
            it.map { case (id, text) =>
              val w = 8 + (id % 12).toInt * 4
              val h = 8 + (id % 7).toInt * 8
              val tb = text.getBytes("UTF-8")
              val px = Array.tabulate(w * h)(i =>
                if (tb.isEmpty) 0 else tb(i % tb.length) & 0xff)
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              img.getRaster.setPixels(0, 0, w, h, px)
              val bo = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "jpg", bo)
              (id, bo.toByteArray)
            }
          }
        Jpeg.decodeJpeg(media).toDF()
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_components").cast("long").as("n_components"),
            col("precision").cast("long").as("bits"),
            col("h_max").cast("long").as("h_max"),
            col("v_max").cast("long").as("v_max"),
            col("n_quant_tables").cast("long").as("n_quant_tables"),
            col("n_huff_tables").cast("long").as("n_huff_tables"),
            col("restart_interval").cast("long").as("restart_interval"),
            col("n_mcus"), col("valid"))
      },
      Some {
        // encoder-layout fields (table counts, sampling, DRI) are
        // VENDOR behavior, not truth — probe the actual JDK encoder
        // once at oracle-build time (ADVICE r8) instead of freezing
        // one JDK version's constants into the gate
        val (nQ, nH, hM, vM, dri) = jdkGrayJpegLayout
        s"""SELECT doc_id AS media_id,
          CAST(8 + (doc_id % 12) * 4 AS BIGINT) AS width,
          CAST(8 + (doc_id % 7) * 8 AS BIGINT) AS height,
          CAST(1 AS BIGINT) AS n_components,
          CAST(8 AS BIGINT) AS bits,
          CAST($hM AS BIGINT) AS h_max, CAST($vM AS BIGINT) AS v_max,
          CAST($nQ AS BIGINT) AS n_quant_tables,
          CAST($nH AS BIGINT) AS n_huff_tables,
          CAST($dri AS BIGINT) AS restart_interval,
          CAST((((8 + (doc_id % 12) * 4) + 8 * $hM - 1) // (8 * $hM))
             * (((8 + (doc_id % 7) * 8) + 8 * $vM - 1) // (8 * $vM)) AS BIGINT)
            AS n_mcus,
          true AS valid
        FROM documents"""
      }),

    // ---- MP3 SIDE-INFORMATION layer (r9 — one layer below q154's
    // frame walk): each doc becomes a REAL mono MPEG-1 Layer III
    // stream whose 17-byte side info is bit-packed from deterministic
    // per-(frame, granule) formulas (imperative seam), then bit-DECODED
    // by Mp3.parseSideInfo — part2_3_length, big_values, global_gain,
    // window-switching block types, preflag, with the CRC-presence
    // offset honored and the big_values ≤ 288 / block-type-0-forbidden
    // validity rules a real decoder applies. A parser with any bit
    // offset wrong in the 136-bit layout cannot match the oracle's
    // formula replay. Only the Huffman spectral payload beyond the
    // side info remains out of scope.
    "q169_mp3_sideinfo" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions { it =>
            it.map { id =>
              (id, Mp3.mp3PayloadSideInfo((3 + id % 12).toInt,
                (id % 14).toInt, (id % 3).toInt))
            }
          }
        Mp3.decodeMp3SideInfo(media).toDF()
          .select(col("media_id"), col("n_frames"), col("sum_part23"),
            col("sum_big_values"), col("max_gain"),
            col("n_short_granules"), col("n_preflag"), col("valid"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
              3 + doc_id % 12 AS n, doc_id % 14 AS seed
            FROM documents),
          fg AS (SELECT media_id, n, seed, i, g
            FROM m, LATERAL (SELECT unnest(range(n)) AS i),
                 LATERAL (SELECT unnest(range(2)) AS g)),
          v AS (SELECT media_id, n,
              100 + ((seed + i) * 7 + g * 13) % 300 AS p23,
              ((seed + i) * 5 + g * 11) % 288 AS bv,
              ((seed + i) * 3 + g) % 256 AS gg,
              CASE WHEN (i + g) % 3 = 0 THEN 1 ELSE 0 END AS sh,
              (seed + i + g) % 2 AS pre
            FROM fg)
        SELECT media_id, CAST(max(n) AS BIGINT) AS n_frames,
          CAST(sum(p23) AS BIGINT) AS sum_part23,
          CAST(sum(bv) AS BIGINT) AS sum_big_values,
          CAST(max(gg) AS BIGINT) AS max_gain,
          CAST(sum(sh) AS BIGINT) AS n_short_granules,
          CAST(sum(pre) AS BIGINT) AS n_preflag,
          true AS valid
        FROM v GROUP BY media_id""")),

    // ---- distributed suffix array by prefix doubling (L121, r9): the
    // EXACT index behind substring-level training-data dedup — global
    // lexicographic rank of every suffix (capped at SaCap chars, the
    // duplication threshold that bounds the rounds at log2 SaCap).
    // Each round is a per-doc lead(h) window + a distinct over
    // (rank, rank@+h) pairs + the scale-safe bucketed two-pass rank +
    // an equi join back — NO unpartitioned window at any point. The
    // oracle materializes every capped suffix STRING and sorts; the
    // engine never materializes a suffix at all (the whole point at
    // 100 TB: ranks are longs, suffixes are not).
    "q171_suffix_array" -> Query(
      (s, dir) => SuffixArray.suffixRanks(docs(s, dir), "doc_id", "text",
        SaCap),
      Some(s"""WITH c AS (SELECT doc_id, substr(text, 1, $SaCap) AS t
              FROM documents),
          s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                substr(t, CAST(i + 1 AS INT)) AS suf
              FROM c, LATERAL (SELECT unnest(range(length(t))) AS i))
        SELECT doc_id, pos,
          CAST(row_number() OVER (ORDER BY suf, doc_id, pos) AS BIGINT)
            AS sa_rank
        FROM s""")),

    // ---- blocked fuzzy self-join (L122): all distinct word-bigram
    // phrases within Levenshtein distance FuzzyK of each other — the
    // entity-resolution / spelling-variant primitive. Candidates come
    // from an EQUI join on the FastSS <=k-deletion neighborhood
    // (complete by the edit-script decomposition), verified with the
    // exact levenshtein; the oracle runs the O(V^2) exact product the
    // engine exists to avoid (V is oracle-scale-bounded; the ENGINE
    // never forms it).
    "q173_fuzzy_join" -> Query(
      (s, dir) => {
        val phrases = docs(s, dir).select(tokens(col("text")).as("t"))
          .select(explode(expr(
            "transform(slice(t, 2, size(t) - 1), (w, i) -> concat(t[i], ' ', w))"))
            .as("p"))
          .distinct()
        FuzzyJoin.selfJoin(phrases, "p", FuzzyK)
          .select(col("s_a").as("phrase_a"), col("s_b").as("phrase_b"),
            col("dist"))
      },
      Some(s"""WITH t AS (SELECT $sqlToks AS t FROM documents),
          p AS (SELECT DISTINCT unnest(list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i + 1])) AS p FROM t)
        SELECT a.p AS phrase_a, b.p AS phrase_b,
          CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
        FROM p a JOIN p b
        ON a.p < b.p AND levenshtein(a.p, b.p) <= $FuzzyK""")),

    // ---- suffix-array duplicate spans (L121's dedup application —
    // the exact-substring method of arXiv:2107.06499): SA-adjacent
    // suffix pairs sharing >= SaDupMin chars mark substrings occurring
    // elsewhere in the corpus. Candidates come from ADJACENCY in
    // suffix order (never an all-pairs product); the LCP is an exact
    // map-side prefix compare over two <= SaCap-char windows. L44's
    // q81 finds spans via fixed-width shingle hashes; this is the
    // exact-index counterpart with per-pair exact match lengths.
    "q172_sa_dup_spans" -> Query(
      (s, dir) => SuffixArray.duplicateSpans(docs(s, dir), "doc_id",
        "text", SaCap, SaDupMin),
      Some(s"""WITH c AS (SELECT doc_id, substr(text, 1, $SaCap) AS t
              FROM documents),
          s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                substr(t, CAST(i + 1 AS INT)) AS suf
              FROM c, LATERAL (SELECT unnest(range(length(t))) AS i)),
          -- adjacency as ONE lead() pass over the sorted stream (the
          -- earlier r-JOIN-r-ON-rk+1 form intermittently produced a
          -- different pair set in DuckDB — a ~1-in-15 flip caught by
          -- the r9 sf0.1 cross-check; a single window sort is stable)
          r AS (SELECT doc_id, pos, suf,
                lead(doc_id) OVER w AS nbr_doc_id,
                lead(pos) OVER w AS nbr_pos,
                lead(suf) OVER w AS nbr_suf
              FROM s WINDOW w AS (ORDER BY suf, doc_id, pos)),
          p AS (SELECT doc_id, pos, nbr_doc_id, nbr_pos,
                CAST(list_sum(list_transform(
                  range(least(length(suf), length(nbr_suf))), k ->
                    CASE WHEN substr(suf, 1, CAST(k + 1 AS INT))
                           = substr(nbr_suf, 1, CAST(k + 1 AS INT))
                      THEN 1 ELSE 0 END)) AS BIGINT) AS lcp
              FROM r WHERE nbr_doc_id IS NOT NULL)
        SELECT doc_id, pos, nbr_doc_id, nbr_pos, lcp
        FROM p WHERE lcp >= $SaDupMin""")),

    // ---- duplicate-span REMOVAL (L121's closing step — the "remove"
    // of arXiv:2107.06499 §4): excise the union of marked spans from
    // each doc, keeping the (doc_id, pos)-earliest occurrence (only
    // the LATER side of each SA-adjacent pair is cut). Interval union
    // + excision run as one codegen `aggregate` HOF over the per-doc
    // sorted span list (doc-bounded — never a global window); the
    // oracle replays it as gaps-and-islands SQL + ordered string_agg.
    "q174_sa_span_removal" -> Query(
      (s, dir) => SuffixArray.removeDuplicateSpans(docs(s, dir), "doc_id",
        "text", SaCap, SaDupMin),
      Some(s"""WITH c AS (SELECT doc_id, substr(text, 1, $SaCap) AS t,
                substr(text, ${SaCap + 1}) AS tail FROM documents),
          s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                substr(t, CAST(i + 1 AS INT)) AS suf
              FROM c, LATERAL (SELECT unnest(range(length(t))) AS i)),
          -- lead() adjacency, not r-JOIN-r (the q172 stability note)
          r AS (SELECT doc_id, pos, suf,
                lead(doc_id) OVER w AS nbr_doc_id,
                lead(pos) OVER w AS nbr_pos,
                lead(suf) OVER w AS nbr_suf
              FROM s WINDOW w AS (ORDER BY suf, doc_id, pos)),
          p AS (SELECT doc_id, pos, nbr_doc_id, nbr_pos,
                CAST(list_sum(list_transform(
                  range(least(length(suf), length(nbr_suf))), k ->
                    CASE WHEN substr(suf, 1, CAST(k + 1 AS INT))
                           = substr(nbr_suf, 1, CAST(k + 1 AS INT))
                      THEN 1 ELSE 0 END)) AS BIGINT) AS lcp
              FROM r WHERE nbr_doc_id IS NOT NULL),
          sp0 AS (SELECT CASE WHEN doc_id > nbr_doc_id
                  OR (doc_id = nbr_doc_id AND pos > nbr_pos)
                  THEN doc_id ELSE nbr_doc_id END AS d,
                CASE WHEN doc_id > nbr_doc_id
                  OR (doc_id = nbr_doc_id AND pos > nbr_pos)
                  THEN pos ELSE nbr_pos END AS st0,
                lcp FROM p WHERE lcp >= $SaDupMin),
          -- DISTINCT is load-bearing: duplicate (st, e) spans tie in
          -- the island windows, and the `fresh` pass and the `isl`
          -- running sum may order ties DIFFERENTLY (legal for any SQL
          -- engine), occasionally splitting one island in two — the
          -- ~1-in-10 flip the r9 sf0.1 cross-check caught
          sp AS (SELECT DISTINCT d AS doc_id, st0 AS st, st0 + lcp AS e
              FROM sp0),
          g AS (SELECT *, CASE WHEN st > coalesce(max(e) OVER (
                  PARTITION BY doc_id ORDER BY st, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS fresh FROM sp),
          gi AS (SELECT *, sum(fresh) OVER (PARTITION BY doc_id
                  ORDER BY st, e ROWS UNBOUNDED PRECEDING) AS isl
              FROM g),
          m AS (SELECT doc_id, isl, min(st) AS ms, max(e) AS me
              FROM gi GROUP BY doc_id, isl),
          kk AS (SELECT doc_id, ms, me, coalesce(lag(me) OVER (
                  PARTITION BY doc_id ORDER BY ms), 0) AS pe FROM m),
          cl AS (SELECT doc_id,
                string_agg(substr(t, CAST(pe + 1 AS INT),
                  CAST(ms - pe AS INT)), '' ORDER BY ms)
                  || substr(t, CAST(max(me) + 1 AS INT)) AS o,
                count(*) AS k, sum(me - ms) AS rem
              FROM kk JOIN c USING (doc_id) GROUP BY doc_id, t)
        SELECT c.doc_id, coalesce(cl.o, c.t) || c.tail AS clean_text,
          CAST(coalesce(cl.rem, 0) AS BIGINT) AS removed_chars,
          CAST(coalesce(cl.k, 0) AS BIGINT) AS n_islands
        FROM c LEFT JOIN cl USING (doc_id)""")),

    // ---- MP4 / ISO-BMFF box walk + keyframe index (the media
    // family's VIDEO entry): each doc becomes a spec-compliant minimal
    // MP4 whose moov sample tables (stts RLE, stsz, stss, multi-entry
    // stsc, stco) the decoder must walk and CROSS-VALIDATE — keyframe
    // offsets are prefix sums rederived from the chunk map, keyframe
    // byte sums read mdat through the resolved ranges, so a parser
    // with any table walk wrong cannot match the oracle's formula
    // replay. Frame-sampling a video corpus at 100 TB is exactly this
    // walk: resolve stss keyframes to byte ranges, read only those.
    "q175_mp4_index" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Mp4.mp4Payload((3 + id % 9).toInt, (id % 11).toInt))))
        Mp4.decodeMp4(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
              3 + doc_id % 9 AS n, doc_id % 11 AS seed FROM documents),
          e AS (SELECT media_id, n, seed,
              600 + 100 * (seed % 5) AS ts,
              2 + seed % 3 AS ke,
              2 + (seed // 3) % 4 AS spc FROM m),
          s AS (SELECT media_id, n, seed, ts, ke, spc, i,
              40 + 10 * ((i // 3) % 2) AS delta,
              20 + ((seed + 7 * i) % 50) AS sz,
              CASE WHEN i % ke = 0 THEN 1 ELSE 0 END AS isk
            FROM e, LATERAL (SELECT unnest(range(n)) AS i)),
          s2 AS (SELECT *, coalesce(sum(sz) OVER (PARTITION BY media_id
              ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS pre FROM s)
        SELECT media_id,
          CAST(max(n) AS BIGINT) AS n_samples,
          CAST(max(ts) AS BIGINT) AS timescale,
          CAST(sum(delta) AS BIGINT) AS duration,
          CAST(sum(isk) AS BIGINT) AS n_keyframes,
          CAST(max((n + spc - 1) // spc) AS BIGINT) AS n_chunks,
          CAST(sum(sz) AS BIGINT) AS sum_bytes,
          CAST(max(sz) AS BIGINT) AS max_sample,
          CAST(sum(CASE WHEN isk = 1 THEN pre ELSE 0 END) AS BIGINT)
            AS sum_key_rel_off,
          CAST(sum(CASE WHEN isk = 1 THEN list_sum(list_transform(
              range(sz), j -> (seed + i + j) % 256)) ELSE 0 END)
            AS BIGINT) AS sum_key_bytes,
          true AS valid
        FROM s2 GROUP BY media_id""")),

    // ---- WARC / multi-member gzip web-archive walk (the Common
    // Crawl ingestion container — where a web-scale text corpus
    // physically BEGINS): each doc becomes a real `.warc.gz` whose
    // members are independently level-6-DEFLATE-compressed (file
    // bytes ≠ record bytes — only a real inflate + CRC-32 verify
    // reproduces the payload sums), each holding one WARC/1.0 record
    // whose header block the parser must walk for the type, the
    // Content-Length framing, and the target-URI host. The oracle
    // replays the record-content formulas; a parser with the member
    // walk, the FNAME skip, the trailer check or the record framing
    // wrong cannot match it.
    "q178_warc_scan" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Warc.warcPayload((2 + id % 7).toInt, (id % 13).toInt))))
        Warc.decodeWarc(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
              2 + doc_id % 7 AS n, doc_id % 13 AS seed FROM documents),
          r AS (SELECT media_id, n, seed, i,
              CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END AS isresp,
              30 + ((seed + 11 * i) % 170) AS clen,
              (seed + i) % 5 AS host
            FROM m, LATERAL (SELECT unnest(range(n)) AS i))
        SELECT media_id,
          CAST(max(n) AS BIGINT) AS n_records,
          CAST(sum(isresp) AS BIGINT) AS n_response,
          CAST(sum(clen) AS BIGINT) AS sum_content_len,
          CAST(max(clen) AS BIGINT) AS max_content_len,
          CAST(sum(list_sum(list_transform(range(clen),
              j -> (seed + 3 * i + j) % 256))) AS BIGINT)
            AS sum_payload_bytes,
          CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
          true AS valid
        FROM r GROUP BY media_id""")),

    // ---- HTML visible-text extraction (the WET step that follows
    // the q178 WARC walk — what a crawl corpus actually trains on):
    // each doc becomes a deterministic page whose VISIBLE text the
    // parser must reconstruct through tag stripping, script/style/
    // comment removal, entity decoding (decimal AND hex forms), and
    // whitespace collapse, with attribute quoting that hides '>'
    // inside values. The oracle rebuilds the exact visible string
    // from the synthesis formulas and measures its length and byte
    // sum — a parser with the entity decode, the script skip, the
    // quote handling or the collapse wrong cannot match it.
    "q179_html_extract" -> Query(
      (s, dir) => {
        import s.implicits._
        val pages = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Html.htmlPayload((2 + id % 5).toInt, (1 + id % 4).toInt,
              id % 1000))))
        Html.decodeHtml(pages).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 5 AS n,
              1 + doc_id % 4 AS k, doc_id % 1000 AS s FROM documents),
          p AS (SELECT media_id, i, 'para ' || i || ' of doc ' || s ||
                ': & A word' || ((s + i) % 13) AS ptxt
            FROM m, LATERAL (SELECT unnest(range(n)) AS i)),
          l AS (SELECT media_id, j, 'link ' || j AS ltxt,
                (s + j) % 5 AS host
            FROM m, LATERAL (SELECT unnest(range(k)) AS j)),
          pa AS (SELECT media_id, string_agg(ptxt, ' ' ORDER BY i)
                AS ptxts FROM p GROUP BY media_id),
          la AS (SELECT media_id, string_agg(ltxt, ' ' ORDER BY j)
                AS ltxts, count(DISTINCT host) AS nh
            FROM l GROUP BY media_id),
          v AS (SELECT m.media_id, m.n, m.k, nh,
              length('Doc ' || s || ' t' || (s % 7)) AS tl,
              'Heading ' || s || ' ' || ptxts || ' ' || ltxts AS vis
            FROM m JOIN pa ON m.media_id = pa.media_id
                   JOIN la ON m.media_id = la.media_id)
        SELECT media_id,
          CAST(tl AS BIGINT) AS title_len,
          CAST(n AS BIGINT) AS n_paragraphs,
          CAST(k AS BIGINT) AS n_links,
          CAST(nh AS BIGINT) AS n_hosts,
          CAST(length(vis) AS BIGINT) AS text_len,
          CAST(list_sum(list_transform(range(length(vis)),
              i -> ascii(substring(vis, CAST(i + 1 AS INTEGER), 1))))
            AS BIGINT) AS sum_text_bytes,
          true AS valid
        FROM v""")),

    // ---- URL canonicalization (the crawl-frontier dedup key): each
    // doc gets a deterministically MESSY url — mixed-case scheme and
    // host, a default-or-kept port, percent-escapes in both decode
    // (%41→A) and keep-uppercase (%2f→%2F) regimes, ./.. dot-segments,
    // tracking params, unsorted query, a fragment — and the native
    // url_canon kernel must land on the one canonical spelling the
    // oracle constructs from the formulas. A canonicalizer with the
    // port rule, the escape split, the dot-segment resolution, the
    // param sort or the tracking drop wrong cannot match it.
    "q180_url_canon" -> Query(
      (s, dir) => {
        import graft.functions.UrlFns
        val d = docs(s, dir)
        val m = (k: Int) => (col("doc_id") % k).cast("string")
        val raw = concat(
          when(col("doc_id") % 2 === 0, lit("HTTP://"))
            .otherwise(lit("https://")),
          lit("WwW.H"), m(7), lit(".Example"),
          when(col("doc_id") % 3 === 0,
            when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")))
            .when(col("doc_id") % 3 === 1, lit(":8080"))
            .otherwise(lit("")),
          lit("/Dir%41/./x"), m(5), lit("/../p%2fq/e"), m(11),
          lit("?utm_source=tw&B=2&a=%41"), m(13),
          lit("&fbclid=zz#Sec"), col("doc_id").cast("string"))
        d.select(col("doc_id"), UrlFns.urlCanon(raw).as("url"))
      },
      Some("""SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
          || '://www.h' || (doc_id % 7) || '.example'
          || (CASE WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
          || '/DirA/p%2Fq/e' || (doc_id % 11)
          || '?B=2&a=A' || (doc_id % 13) AS url
        FROM documents""")),

    // ---- robots.txt frontier filtering (RFC 9309 — the politeness
    // gate between URL canonicalization and the fetch): each host gets
    // a deterministic robots.txt whose rule groups the parser must
    // walk (specific-agent group TAKES OVER from `*` when present,
    // comments and out-of-subset fields tolerated, empty Disallow is a
    // no-op), and each URL takes its longest-matching rule — `*`
    // wildcards, `$` end anchors, Allow-wins-ties — via the codegen
    // robots_match kernel over a broadcast rules frame. The oracle
    // replays the per-(group, path-kind) truth table; a parser with
    // the group selection, the glob, the anchor or the precedence
    // wrong cannot match it.
    "q181_robots_filter" -> Query(
      (s, dir) => {
        import s.implicits._
        import graft.functions.RobotsFns.robotsMatch
        val d = docs(s, dir)
          .select(col("doc_id"), (col("doc_id") % 50).as("host"))
        val pk = col("doc_id") % 5
        val m = (c: Column, k: Int) => (c % k).cast("string")
        val urls = d.withColumn("path",
          when(pk === 0, concat(lit("/a"), m(col("host"), 4),
            lit("/page"), m(col("doc_id"), 7)))
            .when(pk === 1, concat(lit("/a"), m(col("host"), 4),
              lit("/pub/page"), m(col("doc_id"), 7)))
            .when(pk === 2, concat(lit("/d"), m(col("doc_id"), 7),
              lit("/tmp/f")))
            .when(pk === 3, lit("/priv"))
            .otherwise(lit("/priv/deep")))
        // rules parse on the HOSTS frame (bounded: one row per host),
        // then broadcast to the frontier
        val rules = urls.select(col("host")).distinct().as[Long]
          .flatMap(h => Robots.parseRules(Robots.robotsPayload(h),
            "graftbot").map(r =>
            (h, r.allow, r.pattern, Robots.matchLen(r.pattern).toLong)))
          .toDF("rhost", "allow", "pattern", "plen")
        urls.join(broadcast(rules), col("host") === col("rhost") &&
            robotsMatch(col("path"), col("pattern")), "left")
          .select(col("doc_id"), col("host"),
            coalesce(col("plen"), lit(-1L)).as("plen0"),
            coalesce(col("allow"), lit(true)).as("allow0"))
          .groupBy(col("doc_id"), col("host"))
          .agg(max(struct(col("plen0"), col("allow0"))).as("best"))
          .select(col("doc_id"), col("host"),
            col("best.allow0").as("allowed"),
            greatest(col("best.plen0"), lit(0L)).as("match_len"))
      },
      Some("""WITH u AS (SELECT doc_id, doc_id % 50 AS host,
              doc_id % 5 AS pk, (doc_id % 50) % 3 AS hg FROM documents)
        SELECT doc_id, CAST(host AS BIGINT) AS host,
          CASE WHEN hg = 0 THEN pk != 3
               ELSE pk = 1 OR pk = 4 END AS allowed,
          CAST(CASE WHEN hg = 0 THEN
                CASE WHEN pk = 3 THEN 5 WHEN pk = 4 THEN 10 ELSE 1 END
              ELSE CASE WHEN pk = 0 THEN 3 WHEN pk = 1 THEN 7
                        WHEN pk = 2 THEN 6 WHEN pk = 3 THEN 5
                        ELSE 0 END END AS BIGINT) AS match_len
        FROM u""")),

    // ---- USTAR tar container walk (the bundle format public text/
    // image datasets ship in — WebDataset-style loaders walk exactly
    // this layout): each doc becomes a real multi-entry archive whose
    // headers the decoder must verify (checksum over all 512 bytes
    // with the chksum field as spaces, octal fields, ustar magic) and
    // whose entry OFFSETS are a running sum of 512-rounded sizes — the
    // payload byte sum reads data through the resolved ranges, so a
    // walker with any size parse, rounding or checksum rule wrong
    // cannot match the oracle's formula replay.
    "q182_tar_scan" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Tar.tarPayload((3 + id % 8).toInt, (id % 13).toInt))))
        Tar.decodeTar(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 3 + doc_id % 8 AS n,
              doc_id % 13 AS seed FROM documents),
          e AS (SELECT media_id, n, seed, i, (i % 4 = 3) AS isdir,
              CASE WHEN i % 4 = 3 THEN 0
                   ELSE 30 + ((seed + 11 * i) % 470) END AS sz
            FROM m, LATERAL (SELECT unnest(range(n)) AS i))
        SELECT media_id,
          CAST(count(*) AS BIGINT) AS n_entries,
          CAST(sum(CASE WHEN isdir THEN 0 ELSE 1 END) AS BIGINT)
            AS n_files,
          CAST(sum(CASE WHEN isdir THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dirs,
          CAST(sum(sz) AS BIGINT) AS sum_size,
          CAST(max(sz) AS BIGINT) AS max_size,
          CAST(sum(CASE WHEN isdir THEN 0 ELSE list_sum(list_transform(
              range(sz), j -> (seed + 5 * i + j) % 256)) END) AS BIGINT)
            AS sum_payload_bytes,
          CAST(sum(CASE WHEN isdir THEN 3
              ELSE 8 + length(CAST(i AS VARCHAR)) END) AS BIGINT)
            AS n_name_chars,
          true AS valid
        FROM e GROUP BY media_id""")),

    // ---- public-suffix registered-domain extraction (eTLD+1 — the
    // grain crawl corpora key their quotas, dedup scopes and
    // contamination audits on): hosts exercising every PSL rule kind
    // (normal 1- and 2-label suffixes, the `*.ck` wildcard, the
    // `!www.ck` exception, and an UNLISTED TLD falling to the
    // implicit default rule), resolved by candidate-suffix explode +
    // one broadcast equi join + longest-match aggregate. The oracle
    // replays the per-kind truth table; an extractor with the
    // wildcard form, the exception override or the default rule
    // wrong cannot match it.
    "q183_reg_domain" -> Query(
      (s, dir) => {
        val pk = col("doc_id") % 5
        val m = (k: Int) => (col("doc_id") % k).cast("string")
        val hosts = docs(s, dir).select(col("doc_id"),
          when(pk === 0, concat(lit("x"), m(7), lit(".sub"), m(9),
            lit(".com")))
            .when(pk === 1, concat(lit("y"), m(7), lit(".co.uk")))
            .when(pk === 2, concat(lit("z"), m(7), lit(".w"), m(9),
              lit(".zz")))
            .when(pk === 3, concat(lit("a"), m(7), lit(".b"), m(9),
              lit(".ck")))
            .otherwise(lit("www.ck")).as("host"))
        DomainSuffix.registeredDomain(hosts, "host",
          Seq("com", "org", "uk", "co.uk", "jp", "ac.jp",
            "*.ck", "!www.ck"))
      },
      Some("""WITH u AS (SELECT doc_id, doc_id % 5 AS pk,
              doc_id % 7 AS m7, doc_id % 9 AS m9 FROM documents)
        SELECT doc_id,
          CASE pk WHEN 0 THEN 'x' || m7 || '.sub' || m9 || '.com'
            WHEN 1 THEN 'y' || m7 || '.co.uk'
            WHEN 2 THEN 'z' || m7 || '.w' || m9 || '.zz'
            WHEN 3 THEN 'a' || m7 || '.b' || m9 || '.ck'
            ELSE 'www.ck' END AS host,
          CASE pk WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
            WHEN 2 THEN 'zz' WHEN 3 THEN 'b' || m9 || '.ck'
            ELSE 'ck' END AS public_suffix,
          CASE pk WHEN 0 THEN 'sub' || m9 || '.com'
            WHEN 1 THEN 'y' || m7 || '.co.uk'
            WHEN 2 THEN 'w' || m9 || '.zz'
            WHEN 3 THEN 'a' || m7 || '.b' || m9 || '.ck'
            ELSE 'www.ck' END AS reg_domain
        FROM u""")),

    // ---- crawl front-end flagship (the acquisition composition the
    // r9 curation flagship q167 starts FROM): ONE DAG chaining the
    // L126 WARC member walk → per-record URI extraction → L128 URL
    // canonicalization (the native kernel on the REAL extracted URIs)
    // → L129 robots filtering (wildcard+anchor rule via the codegen
    // glob, longest-match precedence) → per-host politeness schedule
    // (FIFO sequence × crawl delay; fetcher = portable-hash bucket so
    // one host NEVER spans two fetchers). The oracle replays the whole
    // chain as one CTE — a record lost, a URI mangled, a verdict or a
    // sequence slot wrong anywhere breaks the hash.
    "q184_crawl_flagship" -> Query(
      (s, dir) => {
        import s.implicits._
        import graft.functions.{RobotsFns, UrlFns}
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Warc.warcPayload((2 + id % 7).toInt, (id % 13).toInt))))
        val recs = Warc.records(media).toDF()
        val canon = recs
          .withColumn("url", UrlFns.urlCanon(col("uri")))
          .withColumn("host",
            regexp_extract(col("url"), "^https?://([^/]+)", 1))
          .withColumn("path",
            regexp_extract(col("url"), "^https?://[^/]+(/.*)$", 1))
        val rules = Robots.parseRules(
          "User-agent: *\nDisallow: /p/*3$\nAllow: /p/\n", "graftbot")
          .map(r => (r.allow, r.pattern, Robots.matchLen(r.pattern).toLong))
          .toDF("allow", "pattern", "plen")
        val allowed = canon
          .join(broadcast(rules),
            RobotsFns.robotsMatch(col("path"), col("pattern")), "left")
          .select(col("media_id"), col("rec_idx"), col("host"),
            col("content_len"),
            coalesce(col("plen"), lit(-1L)).as("plen0"),
            coalesce(col("allow"), lit(true)).as("allow0"))
          .groupBy("media_id", "rec_idx", "host", "content_len")
          .agg(max(struct(col("plen0"), col("allow0"))).as("best"))
          .filter(col("best.allow0"))
        val sched = allowed
          .withColumn("seq", row_number().over(Window.partitionBy("host")
            .orderBy(col("media_id"), col("rec_idx"))).cast("long"))
          .withColumn("fetch_at", col("seq") * (lit(1L) +
            regexp_extract(col("host"), "^h([0-9])", 1).cast("long") % 3))
          .withColumn("fetcher", TextFns.hash60(col("host")) % 4)
        sched.groupBy(col("host"), col("fetcher"))
          .agg(count(lit(1)).as("n_urls"), max(col("seq")).as("max_seq"),
            sum(col("fetch_at")).as("sum_fetch_at"),
            sum(col("content_len")).as("sum_clen"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 7 AS n,
              doc_id % 13 AS seed FROM documents),
          r AS (SELECT media_id, i,
              'h' || ((seed + i) % 5) || '.example' AS host,
              (seed + i) % 5 AS hn,
              30 + ((seed + 11 * i) % 170) AS clen
            FROM m, LATERAL (SELECT unnest(range(n)) AS i)
            WHERE i % 10 != 3),
          s AS (SELECT *, row_number() OVER (PARTITION BY host
                ORDER BY media_id, i) AS seq,
              1 + hn % 3 AS delay FROM r)
        SELECT host,
          CAST('0x' || substr(md5(host), 1, 15) AS BIGINT) % 4 AS fetcher,
          CAST(count(*) AS BIGINT) AS n_urls,
          CAST(max(seq) AS BIGINT) AS max_seq,
          CAST(sum(seq * delay) AS BIGINT) AS sum_fetch_at,
          CAST(sum(clen) AS BIGINT) AS sum_clen
        FROM s GROUP BY host""")),

    // ---- HTTP responses inside WARC records (the L126→L127 seam —
    // crawl `response` records carry full HTTP MESSAGES, and the text
    // pipeline must strip the transport layer before HTML extraction
    // sees a byte): one map-side pass runs member inflate + WARC
    // framing + HTTP framing; status line, header walk (Content-Type
    // media/charset split, Content-Length REQUIRED and exact), body
    // reduced to (len, sum) in place. Every (seed+i)%4==0 response
    // ships its body `Content-Encoding: gzip` (r10): Content-Length
    // counts the ENCODED bytes while the oracle's body stats are the
    // DECODED formulas — only a full member decode (CRC+ISIZE exact)
    // reproduces them. A parser with the framing, the header fold,
    // the charset split or the gunzip wrong cannot match.
    "q185_warc_http" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Http.warcHttpPayload((2 + id % 7).toInt, (id % 13).toInt))))
        Http.decodeWarcHttp(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 7 AS n,
              doc_id % 13 AS seed FROM documents),
          r AS (SELECT media_id, seed, i
            FROM m, LATERAL (SELECT unnest(range(n)) AS i)
            WHERE i % 3 = 0)
        SELECT media_id, CAST(i AS BIGINT) AS rec_idx,
          CAST(CASE (seed + i) % 3 WHEN 0 THEN 200 WHEN 1 THEN 301
            ELSE 404 END AS BIGINT) AS status,
          CASE WHEN i % 2 = 0 THEN 'text/html' ELSE 'text/plain' END
            AS media_type,
          CASE WHEN i % 2 = 0 THEN 'utf-8' ELSE '' END AS charset,
          CAST(4 + (seed + i) % 3
            + CASE WHEN (seed + i) % 4 = 0 THEN 1 ELSE 0 END AS BIGINT)
            AS n_headers,
          CAST(20 + ((seed + 7 * i) % 120) AS BIGINT) AS body_len,
          CAST(list_sum(list_transform(range(20 + ((seed + 7 * i) % 120)),
              j -> (seed + 2 * i + j) % 256)) AS BIGINT) AS body_sum,
          true AS valid
        FROM r""")),

    // ---- CDX-style SURT index keys (the crawl INDEX format: every
    // `.warc.gz` ships with a CDX index whose lines key on the SURT —
    // Sort-friendly URI Reordering Transform — so that one sorted
    // index serves host-, domain- and prefix-scoped lookups): per
    // record, canonicalize the REAL extracted URI with the L128
    // kernel, reverse the host labels comma-joined, append `)` + the
    // canonical path. The member byte ranges a CDX line points at
    // (member_off/member_len on the record surface) are NOT formula-
    // replayable (running sums of level-6 DEFLATE member sizes), so
    // they are pinned by WarcSpec's seekability law instead: a slice
    // of those bytes re-inflates as a complete one-record archive.
    "q186_cdx_surt" -> Query(
      (s, dir) => {
        import s.implicits._
        import graft.functions.UrlFns
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Warc.warcPayload((2 + id % 7).toInt, (id % 13).toInt))))
        val recs = Warc.records(media).toDF()
        val url = UrlFns.urlCanon(col("uri"))
        val host = regexp_extract(url, "^https?://([^/]+)", 1)
        val rest = regexp_extract(url, "^https?://[^/]+(/.*)$", 1)
        recs.select(col("media_id"), col("rec_idx"),
          concat(array_join(reverse(split(host, "\\.")), ","),
            lit(")"), rest).as("surt"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 7 AS n,
              doc_id % 13 AS seed FROM documents)
        SELECT media_id, CAST(i AS BIGINT) AS rec_idx,
          'example,h' || ((seed + i) % 5) || ')/p/' || i AS surt
        FROM m, LATERAL (SELECT unnest(range(n)) AS i)""")),

    // ---- charset decoding (the bytes→text seam after the L133
    // transport strip — a multilingual crawl is NOT all UTF-8): the
    // SAME formula text encodes into four different byte strings
    // (utf-8 / latin-1 / utf-16be / utf-16le by doc), and the decoder
    // must honor the declared label STRICTLY to land every doc on the
    // one codepoint surface the oracle replays — count, sum and
    // non-ASCII tally all change if any charset arm (or byte order)
    // is wrong.
    "q187_charset_decode" -> Query(
      (s, dir) => {
        import s.implicits._
        val rows = mediaIds(s, dir)
          .mapPartitions(_.map { id =>
            val (b, label) =
              CharsetDecode.encodedBody((id % 4).toInt, id % 13)
            (id, b, label)
          })
        CharsetDecode.decodeText(rows).toDF()
      },
      Some("""WITH t AS (SELECT doc_id AS media_id,
              'd' || (doc_id % 13) || ' é ñ x' || ((doc_id % 13) % 7)
                AS txt FROM documents)
        SELECT media_id,
          CAST(length(txt) AS BIGINT) AS n_chars,
          CAST(list_sum(list_transform(range(length(txt)),
              i -> ascii(substring(txt, CAST(i + 1 AS INTEGER), 1))))
            AS BIGINT) AS sum_codepoints,
          CAST(2 AS BIGINT) AS n_nonascii,
          true AS valid
        FROM t""")),

    // ---- sitemap XML walk (sitemaps.org — the crawl SEED source,
    // upstream of the whole L126–L134 chain): each doc becomes a
    // protocol-shaped sitemap whose strict-XML parse the oracle
    // replays — `<loc>` entities decoded (`&amp;` is load-bearing in
    // every URL), exactly-one-loc enforced, optional lastmod/priority
    // folded, the tenths-grid priority parse, host distinct-count.
    "q188_sitemap_scan" -> Query(
      (s, dir) => {
        import s.implicits._
        val pages = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Sitemap.sitemapPayload((2 + id % 9).toInt, id % 13))))
        Sitemap.decodeSitemap(pages).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 9 AS n,
              doc_id % 13 AS seed FROM documents),
          e AS (SELECT media_id, i, (seed + i) % 5 AS hn,
              CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END AS lm,
              CASE WHEN i % 3 != 1 THEN (seed + i) % 10 ELSE 0 END AS pr,
              28 + length(CAST(i AS VARCHAR)) AS lc
            FROM m, LATERAL (SELECT unnest(range(n)) AS i))
        SELECT media_id,
          CAST(count(*) AS BIGINT) AS n_urls,
          CAST(count(DISTINCT hn) AS BIGINT) AS n_hosts,
          CAST(sum(lm) AS BIGINT) AS n_lastmod,
          CAST(sum(pr) AS BIGINT) AS sum_prio_tenths,
          CAST(sum(lc) AS BIGINT) AS sum_loc_chars,
          true AS valid
        FROM e GROUP BY media_id""")),

    // ---- conditional recrawl triage (the S5-ledger lifecycle applied
    // to the L136 seed scan — what a CONTINUOUS crawl does nightly):
    // yesterday's (url, lastmod) state persists as a parquet ledger
    // artifact; today's sitemap entries triage against the LOADED
    // artifact — absent → new, lastmod advanced → changed, else
    // unchanged — so only new+changed URLs spend fetch budget. The
    // load is load-bearing: the changed/unchanged split compares
    // today's values against ones that exist only in the artifact.
    // At 100 TB the ledger IS corpus-sized: the triage is ONE hash
    // join on the url key, the state the join carries is (url, day) —
    // never a document.
    "q190_recrawl_triage" -> Query(
      (s, dir) => {
        // applicationId-keyed artifact path (the q142/ADVICE-r7 rule)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_recrawl_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        val today = docs(s, dir).select(col("doc_id"),
            explode(sequence(lit(0), lit(2) + col("doc_id") % 6)).as("i"))
          .withColumn("seed", col("doc_id") % 13)
          .withColumn("url", concat(lit("http://h"),
            ((col("seed") + col("i")) % 5).cast("string"),
            lit(".example/d/"), col("doc_id").cast("string"),
            lit("/s/"), col("i").cast("string")))
          .withColumn("lm_new", (col("seed") + col("i")) % 9 +
            when(col("i") % 3 === 0, 1L).otherwise(0L))
        today.where(col("i") % 5 =!= 4)
          .select(col("url"), ((col("seed") + col("i")) % 9).as("lm_old"))
          .write.mode("overwrite").parquet(s"$base/ledger")
        val ledger = s.read.parquet(s"$base/ledger")
        today.join(ledger, Seq("url"), "left")
          .withColumn("status", when(col("lm_old").isNull, "new")
            .when(col("lm_new") > col("lm_old"), "changed")
            .otherwise("unchanged"))
          .groupBy(col("doc_id"))
          .agg(
            sum(when(col("status") === "new", 1L).otherwise(0L))
              .as("n_new"),
            sum(when(col("status") === "changed", 1L).otherwise(0L))
              .as("n_changed"),
            sum(when(col("status") === "unchanged", 1L).otherwise(0L))
              .as("n_unchanged"))
      },
      Some("""WITH e AS (SELECT doc_id, i FROM documents,
              LATERAL (SELECT unnest(range(3 + doc_id % 6)) AS i))
        SELECT doc_id,
          CAST(sum(CASE WHEN i % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_new,
          CAST(sum(CASE WHEN i % 5 != 4 AND i % 3 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_changed,
          CAST(sum(CASE WHEN i % 5 != 4 AND i % 3 != 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unchanged
        FROM e GROUP BY doc_id""")),

    // ---- GIF / LZW decode (the media family's third still-image
    // codec, after PNG and baseline JPEG): each doc becomes a real
    // multi-frame GIF whose pixel indices are LZW-COMPRESSED by a
    // real dictionary encoder — file bytes share no structure with
    // the pixel formula, so only a correct LZW expansion (variable
    // code widths, dictionary growth, KwKwK, the 4096 reset)
    // reproduces the oracle's index sums.
    "q191_gif_decode" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Gif.gifPayload((6 + id % 8).toInt, (5 + id % 6).toInt,
              (1 + id % 3).toInt, (id % 13).toInt))))
        Gif.decodeGif(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 6 + doc_id % 8 AS w,
              5 + doc_id % 6 AS h, 1 + doc_id % 3 AS nf,
              doc_id % 13 AS seed FROM documents),
          fp AS (SELECT media_id, w, h, nf, f,
              list_sum(list_transform(range(w * h),
                p -> (seed + 3 * f + p) % 4)) AS fsum,
              list_max(list_transform(range(w * h),
                p -> (seed + 3 * f + p) % 4)) AS fmax
            FROM m, LATERAL (SELECT unnest(range(nf)) AS f))
        SELECT media_id,
          CAST(max(w) AS BIGINT) AS width,
          CAST(max(h) AS BIGINT) AS height,
          CAST(max(nf) AS BIGINT) AS n_frames,
          CAST(1 AS BIGINT) AS n_ext_blocks,
          CAST(4 AS BIGINT) AS gct_colors,
          CAST(sum(fsum) AS BIGINT) AS sum_pixel_indices,
          CAST(max(fmax) AS BIGINT) AS max_index,
          true AS valid
        FROM fp GROUP BY media_id""")),

    // ---- PDF structural walk + text extraction (the document
    // family's entry — after web crawls, PDFs are the largest public
    // text source): each doc becomes a spec-compliant minimal PDF
    // whose classic xref table the parser must WALK AND VERIFY (every
    // in-use offset must point at its declared object header — the
    // writer computes offsets in a second pass, so a parser that
    // skips the xref can't verify them), whose /Length-exact content
    // streams hold `(string) Tj` text operators with the `\( \) \\`
    // escape subset decoded. Every EVEN doc ships its content streams
    // `/Filter /FlateDecode` zlib-compressed (r10 — how real PDFs
    // ship), so half the corpus reaches the Tj scan only through a
    // real inflate. The oracle replays the per-page text formulas
    // (identical under compression); a walker with the xref, the
    // Length-framed stream, the inflate or the escape decode wrong
    // cannot match it.
    "q192_pdf_extract" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Pdf.pdfPayload((1 + id % 5).toInt, id % 13,
              flate = id % 2 == 0))))
        Pdf.decodePdf(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 1 + doc_id % 5 AS np,
              doc_id % 13 AS seed FROM documents),
          pg AS (SELECT media_id, np, i,
              'Doc ' || seed || ' page ' || i AS t1,
              'w' || ((seed + i) % 7) || ' (x)' AS t2
            FROM m, LATERAL (SELECT unnest(range(np)) AS i))
        SELECT media_id,
          CAST(2 + 2 * max(np) AS BIGINT) AS n_objects,
          CAST(max(np) AS BIGINT) AS n_pages,
          CAST(2 * max(np) AS BIGINT) AS n_text_ops,
          CAST(sum(length(t1) + length(t2)) AS BIGINT) AS text_len,
          CAST(sum(
              list_sum(list_transform(range(length(t1)),
                k -> ascii(substring(t1, CAST(k + 1 AS INTEGER), 1))))
              + list_sum(list_transform(range(length(t2)),
                k -> ascii(substring(t2, CAST(k + 1 AS INTEGER), 1)))))
            AS BIGINT) AS sum_text_bytes,
          true AS valid
        FROM pg GROUP BY media_id""")),

    // ---- politeness fetch-time recurrence (the crawl queue's
    // t_k = max(arr_k, t_{k-1} + delay) — a SEQUENTIAL stateful scan
    // re-expressed as the closed form k·d + running_max(arr_j − j·d):
    // a rank + prefix-max over one host-partitioned sort, ONE
    // exchange. The output folds the order-sensitive queueing WAIT
    // (fetch − arrival), so a scheduler with the recurrence, the
    // ordering or the prefix algebra wrong cannot match the oracle's
    // identical window replay.
    "q193_politeness_schedule" -> Query(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select((col("user_id") % 20).as("host"),
            unix_micros(col("ts")).as("arr_us"), col("event_id"))
          .withColumn("delay_us",
            (lit(1L) + col("host") % 3) * lit(1000000L))
        graft.operators.Politeness.schedule(ev, col("host"),
            col("arr_us"), col("event_id"), col("delay_us"))
          .groupBy(col("host"))
          .agg(count(lit(1)).as("n_reqs"),
            max(col("fetch_at_us")).as("last_fetch_us"),
            sum(col("fetch_at_us") - col("arr_us")).as("sum_wait_us"))
      },
      Some("""WITH e AS (SELECT user_id % 20 AS host, epoch_us(ts) AS arr,
              (1 + (user_id % 20) % 3) * 1000000 AS d, event_id
            FROM events),
          r AS (SELECT host, arr, d, event_id, row_number() OVER
                (PARTITION BY host ORDER BY arr, event_id) - 1 AS k
            FROM e),
          f AS (SELECT host, arr, d * k + max(arr - d * k) OVER
                (PARTITION BY host ORDER BY arr, event_id
                 ROWS UNBOUNDED PRECEDING) AS f_us
            FROM r)
        SELECT host, CAST(count(*) AS BIGINT) AS n_reqs,
          CAST(max(f_us) AS BIGINT) AS last_fetch_us,
          CAST(sum(f_us - arr) AS BIGINT) AS sum_wait_us
        FROM f GROUP BY host""")),

    // ---- WAT-style host link graph (Common Crawl's THIRD artifact —
    // WARC carries the bytes (L126), WET the text (L127), WAT the
    // metadata, above all the LINK GRAPH the ranking/spam/seed
    // machinery runs on): extract every body anchor's href from the
    // real parsed pages (the q179 walker's link seam), key source
    // pages to their fetch host, and aggregate per TARGET host —
    // in-links, distinct source pages, distinct source hosts. The
    // oracle replays the page formulas; an extractor that miscounts
    // anchors, leaks script/comment pseudo-links or mangles hrefs
    // cannot match it.
    "q194_wat_link_graph" -> Query(
      (s, dir) => {
        import s.implicits._
        // r16: not spread — same light HTML synth as q195 (q.v.)
        val pages = docs(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, Html.htmlPayload((2 + id % 5).toInt, (1 + id % 4).toInt,
              id % 1000))))
        Html.links(pages).toDF("page_id", "href")
          .withColumn("src_host",
            concat(lit("h"), (col("page_id") % 7).cast("string"),
              lit(".example")))
          .withColumn("dst_host",
            regexp_extract(col("href"), "^https?://([^/]+)", 1))
          .groupBy(col("dst_host"))
          .agg(count(lit(1)).as("n_inlinks"),
            countDistinct(col("page_id")).as("n_src_pages"),
            countDistinct(col("src_host")).as("n_src_hosts"))
      },
      Some("""WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS k,
              doc_id % 1000 AS s FROM documents),
          l AS (SELECT doc_id, 'h' || ((s + j) % 5) || '.example'
                AS dst_host, 'h' || (doc_id % 7) || '.example'
                AS src_host
            FROM m, LATERAL (SELECT unnest(range(k)) AS j))
        SELECT dst_host, CAST(count(*) AS BIGINT) AS n_inlinks,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_src_pages,
          CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
        FROM l GROUP BY dst_host""")),

    // ---- host-graph PageRank (the crawl-quality weight: seed
    // selection, spam demotion and fetch-budget allocation all rank
    // the WAT host graph — the L142∘L48 composition): the q194 edges
    // (real parsed anchors keyed to fetch hosts) feed the exact
    // fixed-point PageRank kernel; the oracle unrolls the identical
    // 12 iterations over the identical edge aggregate (bit-exact by
    // GraphRank's 2^-40 quantized-contribution determinism contract).
    "q195_host_pagerank" -> Query(
      (s, dir) => {
        import s.implicits._
        // r16: deliberately NOT mediaIds/spread — the HTML synth here
        // is light and the pagerank loop dominates; the fan-out
        // measured q195 3.9 → 4.7 s in same-protocol A/B
        val pages = docs(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, Html.htmlPayload((2 + id % 5).toInt, (1 + id % 4).toInt,
              id % 1000))))
        val edges = Html.links(pages).toDF("page_id", "href")
          .select(concat(lit("h"), (col("page_id") % 7).cast("string"),
              lit(".example")).as("u"),
            regexp_extract(col("href"), "^https?://([^/]+)", 1).as("v"),
            lit(1L).as("w"))
        GraphRank.pageRank(edges, 12, 0.85)
          .select(col("node").as("host"), col("r").as("rank"))
      },
      Some(s"""WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS k,
              doc_id % 1000 AS s FROM documents),
          l AS (SELECT 'h' || (doc_id % 7) || '.example' AS u,
                'h' || ((s + j) % 5) || '.example' AS v
            FROM m, LATERAL (SELECT unnest(range(k)) AS j)),
          sym AS (SELECT u, v, count(*) AS w FROM l GROUP BY u, v),
          ${GraphRank.sqlPageRank(12, 0.85)}
        SELECT node AS host, r AS rank FROM r12""")),

    // ---- TIFF IFD walk (the scientific-imagery container — the
    // reference pipeline's own domain ships GeoTIFF rasters): each
    // doc becomes a multi-page gray TIFF in a BYTE ORDER picked by
    // the seed (every integer in the file flips with the header),
    // with strictly-ascending IFD tags, inline vs pointer strip
    // arrays (both paths exercised by the page sizes), and pixel
    // sums read through the resolved strip ranges — a walker with
    // the endianness, the inline packing or the strip arithmetic
    // wrong cannot match the oracle's formula replay.
    "q196_tiff_index" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Tiff.tiffPayload((1 + id % 6).toInt, (id % 13).toInt))))
        Tiff.decodeTiff(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 1 + doc_id % 6 AS np,
              doc_id % 13 AS seed FROM documents),
          pg AS (SELECT media_id, seed, f, 5 + (seed + f) % 6 AS w,
              4 + f % 5 AS h
            FROM m, LATERAL (SELECT unnest(range(np)) AS f)),
          px AS (SELECT media_id, w, h, (h + 3) // 4 AS ns,
              list_sum(list_transform(range(w * h),
                j -> (seed + 5 * f + j) % 256)) AS pix
            FROM pg)
        SELECT media_id,
          CAST(count(*) AS BIGINT) AS n_pages,
          CAST(sum(w) AS BIGINT) AS sum_width,
          CAST(sum(h) AS BIGINT) AS sum_height,
          CAST(sum(ns) AS BIGINT) AS n_strips,
          CAST(sum(pix) AS BIGINT) AS sum_pixels,
          true AS valid
        FROM px GROUP BY media_id""")),

    // ---- robots Crawl-delay → politeness schedule (r10: the field
    // q183 used to tolerate-and-ignore now SCHEDULES — the real crawl
    // semantics): each host's robots.txt is parsed map-side on the
    // bounded per-HOST frame (specific `graftbot` group delay wins
    // over `*`, exactly like its rules), the per-host delay broadcast
    // onto the frontier, and the q193 max-plus closed form runs with
    // the PER-ROW delay column — one host exchange, no new shuffle.
    // The oracle replays the group-election formula and the identical
    // window algebra; a scheduler with the group precedence, the
    // delay parse or the prefix-max wrong cannot match it.
    "q197_crawl_delay_schedule" -> Query(
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select((col("user_id") % 20).as("host"),
            unix_micros(col("ts")).as("arr_us"), col("event_id"))
        val delays = ev.select(col("host")).distinct().as[Long]
          .mapPartitions(_.map { h =>
            val d = Robots.crawlDelaySecs(Robots.robotsPayload(h),
              "graftbot")
            (h, d.getOrElse(1L) * 1000000L)
          }).toDF("host", "delay_us")
        graft.operators.Politeness.schedule(
            ev.join(broadcast(delays), "host"),
            col("host"), col("arr_us"), col("event_id"), col("delay_us"))
          .groupBy(col("host"))
          .agg(count(lit(1)).as("n_reqs"),
            max(col("fetch_at_us")).as("last_fetch_us"),
            sum(col("fetch_at_us") - col("arr_us")).as("sum_wait_us"))
      },
      Some("""WITH e AS (SELECT user_id % 20 AS host, epoch_us(ts) AS arr,
              event_id FROM events),
          d AS (SELECT DISTINCT host,
              (CASE WHEN host % 3 = 0 THEN 2 + host % 5
               ELSE 1 + host % 4 END) * 1000000 AS del FROM e),
          r AS (SELECT e.host, arr, del, event_id, row_number() OVER
                (PARTITION BY e.host ORDER BY arr, event_id) - 1 AS k
            FROM e JOIN d ON e.host = d.host),
          f AS (SELECT host, arr, del * k + max(arr - del * k) OVER
                (PARTITION BY host ORDER BY arr, event_id
                 ROWS UNBOUNDED PRECEDING) AS f_us
            FROM r)
        SELECT host, CAST(count(*) AS BIGINT) AS n_reqs,
          CAST(max(f_us) AS BIGINT) AS last_fetch_us,
          CAST(sum(f_us - arr) AS BIGINT) AS sum_wait_us
        FROM f GROUP BY host""")),

    // ---- persisted suffix-array ARTIFACT lifecycle (r10, VERDICT r9
    // #5 — the L103/L106/L119 pattern applied to the suite's most
    // expensive build): the suffix ranks are SAVED as a parquet
    // artifact and the span consumer runs against the LOADED frame —
    // how production amortizes a nightly substring-dedup index across
    // jobs. The artifact rows are three longs; the doubling loop never
    // runs in the consumer job. Output: per-doc span statistics from
    // the loaded index; the oracle replays the whole chain (suffix
    // sort → adjacency → LCP → threshold → per-doc rollup) from the
    // raw text, so a drifted artifact cannot match.
    "q198_sa_artifact" -> Query(
      (s, dir) => {
        // per-run artifact path (the q142/q146 rule: no cross-run race)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sa_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        val d = docs(s, dir)
        SuffixArray.saveSuffixRanks(d, "doc_id", "text", SaCap, base)
        SuffixArray.duplicateSpansFrom(
            SuffixArray.loadSuffixRanks(s, base), d, "doc_id", "text",
            SaCap, SaDupMin)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_dup_spans"),
            sum(col("lcp")).as("sum_lcp"), max(col("lcp")).as("max_lcp"))
      },
      Some(s"""WITH c AS (SELECT doc_id, substr(text, 1, $SaCap) AS t
              FROM documents),
          s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                substr(t, CAST(i + 1 AS INT)) AS suf
              FROM c, LATERAL (SELECT unnest(range(length(t))) AS i)),
          r AS (SELECT doc_id, pos, suf,
                lead(doc_id) OVER w AS nbr_doc_id,
                lead(pos) OVER w AS nbr_pos,
                lead(suf) OVER w AS nbr_suf
              FROM s WINDOW w AS (ORDER BY suf, doc_id, pos)),
          p AS (SELECT doc_id, pos, nbr_doc_id, nbr_pos,
                CAST(list_sum(list_transform(
                  range(least(length(suf), length(nbr_suf))), k ->
                    CASE WHEN substr(suf, 1, CAST(k + 1 AS INT))
                           = substr(nbr_suf, 1, CAST(k + 1 AS INT))
                      THEN 1 ELSE 0 END)) AS BIGINT) AS lcp
              FROM r WHERE nbr_doc_id IS NOT NULL)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
          CAST(sum(lcp) AS BIGINT) AS sum_lcp,
          CAST(max(lcp) AS BIGINT) AS max_lcp
        FROM p WHERE lcp >= $SaDupMin GROUP BY doc_id""")),

    // ---- the BYTES→SHARDS mega-flagship (r10, VERDICT r9 #1): the
    // actual Common Crawl pipeline end to end in ONE DAG — archive
    // BYTES to training shards. Each doc ships as a `.warc.gz` (its
    // text embedded in an HTML page inside an HTTP 200 inside a gzip
    // member, charset by doc%4, plus a metadata member the HTTP stage
    // must skip); ONE map-side pass behind the imperative codec seam
    // derives the WET text (L126→L133→L135→L127 — inflate, WARC/HTTP
    // framing, strict charset decode, entity-decoding visible-text
    // walk); the `url_canon` kernel (L128) normalizes the messy
    // target URIs, provenance = the canonical HOST (as in a real
    // crawl), the robots gate (L129, broadcast rules + best-match
    // verdict) drops `/d/*3?` paths; survivors feed the EXACT q167
    // curation DAG (scrub → gate → exact+LSH dedup → decontaminate →
    // pack → mixture schedule → range shards). The oracle replays the
    // whole chain as one CTE stack: the WET derivation is identity on
    // the corpus text (WetSpec pins it), the robots gate is the
    // doc-id formula, and the curation tail is the shared q167
    // oracle over the gated corpus.
    "q199_bytes_to_shards" -> Query(
      (s, dir) => {
        import s.implicits._
        import graft.functions.{RobotsFns, UrlFns}
        val media = docs(s, dir)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
          .mapPartitions(_.map { case (id, src, text) =>
            (id, Wet.wetArchivePayload(id, src, text))
          })
        val wet = Wet.wetFromArchives(media).toDF()
        val url = UrlFns.urlCanon(col("uri"))
        val canon = wet.select(col("media_id").as("doc_id"), col("text"),
            url.as("url"))
          .withColumn("host",
            regexp_extract(col("url"), "^https?://([^/]+)", 1))
          .withColumn("path",
            regexp_extract(col("url"), "^https?://[^/]+(/.*)$", 1))
          .withColumn("source",
            regexp_extract(col("host"), "^([^.]+)\\.", 1))
        val rules = Robots.parseRules(
          "User-agent: *\nDisallow: /d/*3?\nAllow: /d/\n", "graftbot")
          .map(r => (r.allow, r.pattern, Robots.matchLen(r.pattern).toLong))
          .toDF("allow", "pattern", "plen")
        val allowed = canon
          .join(broadcast(rules),
            RobotsFns.robotsMatch(col("path"), col("pattern")), "left")
          .groupBy(col("doc_id"))
          .agg(max(struct(coalesce(col("plen"), lit(-1L)).as("plen0"),
              coalesce(col("allow"), lit(true)).as("allow0"))).as("best"),
            first(col("source")).as("source"), first(col("text")).as("text"))
          .filter(col("best.allow0"))
          .select(col("doc_id"), col("source"), col("text"))
        curationShards(allowed)
      },
      Some(sqlCurationOracle(
        """crawl AS (SELECT * FROM documents
            WHERE CAST(doc_id AS VARCHAR) NOT LIKE '%3'),
          evd AS (SELECT * FROM crawl WHERE source = 'src0'),
          trd AS (SELECT * FROM crawl WHERE source <> 'src0')"""))),

    // ---- MP3 SYNTHESIS layer (r10, VERDICT r9 #8 — the "pure
    // arithmetic postprocessing of the decoded spectrum"): the engine
    // walks REAL bits (frame headers → side info → Huffman spectra in
    // the q170 subset, LONG blocks only) and then runs requantization
    // → IMDCT → sine window → overlap-add ACROSS granules → frequency
    // inversion → polyphase matrixing. The oracle never sees the
    // bitstream: it replays the synthesis formulas and the SAME
    // arithmetic with every transcendental constant (IMDCT cosines,
    // window, matrixing cosines, both gain ladders, band maps) handed
    // over as literal doubles — cross-engine equality rests only on
    // IEEE mul/add order, which both sides fix ascending. Outputs are
    // 1e-9-quantized integer sums per stream; the 512-tap synthesis-
    // window FIR beyond the matrixed V stage is the documented
    // boundary (its coefficients are spec-tabulated, not derivable).
    "q200_mp3_synth" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map { id =>
            (id, Mp3.mp3PayloadSpectral((2 + id % 4).toInt,
              (id % 14).toInt, (id % 3).toInt, longOnly = true))
          })
        Mp3.decodeMp3Synth(media).toDF()
      },
      Some(sqlMp3SynthOracle("0"))),

    // ---- MP3 SHORT-block synthesis (r11 — the r10 verdict's #4 ask:
    // the synthesis chain stopped at long-block granules). The same
    // fixture writer now emits its MIXED long/short streams (granule
    // (i+g)%3==0 is block-type-2 short with real 3-bit subblock
    // gains), and parseSynth carries short granules through the
    // full hybrid chain: per-window subblock-gain requantization
    // (2^(−2·sbg), exact powers of two), the (sfb, window, line) →
    // (subband, window, line) REORDER (ISO decode order is band-major
    // window-minor), three 12-point IMDCTs per subband windowed by
    // sin(π/12·(n+½)) into the 36-sample grid at offsets 6/12/18, and
    // the shared overlap-add/inversion/matrixing tail — so long and
    // short granules' tails CROSS (a long granule overlap-adds a
    // short predecessor's windowed tail and vice versa, which is the
    // part a per-type decoder gets wrong). One oracle definition
    // serves q200 and this gate. Mixed/start/stop blocks remain the
    // documented out-of-subset edge.
    "q223_mp3_short_synth" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map { id =>
            (id, Mp3.mp3PayloadSpectral((2 + id % 4).toInt,
              (id % 14).toInt, (id % 3).toInt, longOnly = false))
          })
        Mp3.decodeMp3Synth(media).toDF()
      },
      Some(sqlMp3SynthOracle(
        "CASE WHEN (i + g) % 3 = 0 THEN 2 ELSE 0 END"))),

    // ---- MP3 window-switching FULL CYCLE (r11 follow-through: after
    // q223's pure-short arm, the START (type 1) and STOP (type 3)
    // transition blocks — LONG-shaped 36-point transforms under the
    // asymmetric transition windows (long-sine rise / flat / short-
    // sine fall, and its mirror), long-layout scalefactors, pretab
    // honored, subblock gains present in the layout but inert. The
    // fixture's granules cycle long→start→short→stop, so every
    // transition adjacency a real encoder emits (long→start,
    // start→short, short→stop, stop→long) crosses the overlap-add
    // buffer in sequence. Mixed blocks remain the one documented
    // out-of-subset window shape.
    "q225_mp3_block_cycle" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map { id =>
            (id, Mp3.mp3PayloadSpectral((2 + id % 4).toInt,
              (id % 14).toInt, (id % 3).toInt, blockMode = 1))
          })
        Mp3.decodeMp3Synth(media).toDF()
      },
      Some(sqlMp3SynthOracle("(i + g) % 4"))),

    // ---- MP3 MIXED blocks (r11 — the last window shape): block
    // type 2 with mixed_block_flag = 1 splits one granule's spectrum
    // into a LONG region (bands 0..7 = the first 36 lines = subbands
    // 0..1, long scalefactors, normal long window) and a SHORT
    // region (sfb 3..12 × 3 windows, per-window frequency lines
    // starting at 12, subblock gains, short IMDCTs) — the hybrid of
    // hybrids a transient-in-bass encoder emits. The decoder splits
    // scalefactor reads (8 long slen1 + 9 short slen1 + 18 short
    // slen2), requantizes each region by its own rule, and runs LONG
    // transforms for subbands 0..1 and SHORT for the rest INSIDE ONE
    // granule. With this, every ISO window shape decodes; the entropy
    // boundary (linbits / non-table-1 Huffman) is the only remaining
    // documented edge of the MP3 family.
    "q226_mp3_mixed_blocks" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map { id =>
            (id, Mp3.mp3PayloadSpectral((2 + id % 4).toInt,
              (id % 14).toInt, (id % 3).toInt, blockMode = 2))
          })
        Mp3.decodeMp3Synth(media).toDF()
      },
      Some(sqlMp3SynthOracle(
        "CASE WHEN (i + g) % 3 = 0 THEN 4 ELSE 0 END"))),

    // ---- MP3 SCFSI — scalefactor sharing between granules (r11:
    // the last non-entropy side-info semantic; after this only the
    // linbits/non-table-1 Huffman tables remain). When a frame's
    // 4-bit scfsi selects a band group (0–5, 6–10, 11–15, 16–20),
    // granule 1 carries NO scalefactor bits for it and REUSES granule
    // 0's values — requantizing them under its OWN scalefac_scale and
    // global gain. The fixture emits scfsi = (seed+i)%16 on all-long
    // streams; a decoder that reads the skipped bits anyway cannot
    // land on part2_3_length, and one that reuses the wrong granule's
    // values cannot match the requant sums. Sharing with any
    // window-switching granule strict-rejects (the ISO contract).
    "q232_mp3_scfsi" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map { id =>
            (id, Mp3.mp3PayloadSpectral((2 + id % 4).toInt,
              (id % 14).toInt, (id % 3).toInt, blockMode = 3))
          })
        Mp3.decodeMp3Synth(media).toDF()
      },
      Some(sqlMp3SynthOracle("0", scfsiExpr = "(seed + i) % 16"))),

    // ---- Avro OCF WRITER (r11 — the row-format mirror of q216: the
    // engine PRODUCES container files dependency-free, and the
    // differential runs INSIDE the query: avro-java's own
    // DataFileReader consumes our bytes on executors). Our encoder
    // writes the magic + metadata map + schema JSON + deterministic
    // sync, frames records into 2-record blocks, and raw-DEFLATES
    // even groups (the inverse of the reader's raw Inflater). The
    // record formulas are q215's, so the SAME oracle gates bytes from
    // the real writer (q215) and from ours — an encoder with the
    // zigzag, the union branch, the block framing, the codec or the
    // sync discipline wrong cannot match. AvroWriterSpec adds the
    // own-reader cross-check and corruption rejection on both
    // readers.
    "q227_avro_writer" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = docs(s, dir)
          .select((col("doc_id") / 64).cast("long").as("g"),
            col("doc_id")).as[(Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            (g, Avro.ownOcfGroupPayload(g, it.map(_._2).toArray.sorted))
          }
        Avro.decodeWithAvroJava(media).toDF()
      },
      Some("""WITH p AS (SELECT doc_id // 64 AS media_id, doc_id AS d,
              CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE (7 * doc_id) % 50 END AS v,
              repeat('s', CAST(1 + doc_id % 4 AS INT)) || doc_id AS s
            FROM documents)
        SELECT media_id,
          CAST((count(*) + 1) // 2 AS BIGINT) AS n_blocks,
          CAST(count(*) AS BIGINT) AS n_records,
          CAST(sum(d) + coalesce(sum(v), 0) AS BIGINT) AS sum_long,
          CAST(count(*) - count(v) AS BIGINT) AS n_nulls,
          CAST(sum(strlen(s)) AS BIGINT) AS sum_slen,
          CAST(sum(list_sum(list_transform(range(1, len(s) + 1),
            i -> ord(s[i])))) AS BIGINT) AS sum_sbytes,
          true AS valid
        FROM p GROUP BY media_id""")),

    // ---- WARC revisit-record resolution (r10 — the crawl's OWN dedup
    // mechanism: Common Crawl stores a re-fetched unchanged page as a
    // `revisit` record carrying only the payload digest of the
    // original capture; a consumer must resolve revisits BY DIGEST to
    // reconstruct content). Map-side, each record emits its declared
    // digest AND the sha1 computed over its actual payload (verified
    // originals = the two agree); the canonical original per digest
    // is the (media_id, rec_idx)-earliest capture (exactly the
    // crawl's earliest-capture-wins convention), elected with ONE
    // digest-keyed aggregate; revisits LEFT-join it on the digest.
    // The oracle never sees a digest: it replays the REFERENCE
    // formulas (digest equality ⟺ identical payload formulas ⟺ same
    // (seed, rec) pair — proven injective over the fixture grid), so
    // an engine with the inflate, the digest header, the sha1, or the
    // min-election wrong cannot match.
    "q201_warc_revisit" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Warc.warcRevisitPayload((3 + id % 6).toInt,
              (id % 13).toInt))))
        val rows = Warc.revisitRecords(media).toDF()
        val originals = rows
          .filter(col("warc_type") === "response" &&
            col("declared_digest") === col("payload_sha1") &&
            col("declared_digest") =!= "")
          .groupBy(col("declared_digest").as("digest"))
          .agg(min(struct(col("media_id"), col("rec_idx"),
            col("content_len"))).as("o"))
          .select(col("digest"), col("o.media_id").as("orig_media"),
            col("o.content_len").as("orig_len"))
        val revisits = rows.filter(col("warc_type") === "revisit")
          .select(col("media_id"), col("rec_idx"),
            col("declared_digest").as("digest"))
        revisits.join(originals, Seq("digest"), "left")
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_revisits"),
            count(col("orig_len")).as("n_resolved"),
            coalesce(sum(col("orig_len")), lit(0L)).as("sum_orig_len"),
            coalesce(sum(col("orig_media")), lit(0L)).as("sum_orig_media"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 3 + doc_id % 6 AS n,
              doc_id % 13 AS seed FROM documents),
          mn AS (SELECT doc_id % 13 AS seed, min(doc_id) AS om
              FROM documents GROUP BY 1),
          rev AS (SELECT media_id, seed, j,
              CASE WHEN (seed + j) % 5 = 0 THEN NULL
                ELSE (seed + j) % 2 END AS jp
            FROM m, LATERAL (SELECT unnest(range(n)) AS j) jj
            WHERE j % 3 = 2)
        SELECT rev.media_id,
          CAST(count(*) AS BIGINT) AS n_revisits,
          CAST(count(rev.jp) AS BIGINT) AS n_resolved,
          CAST(coalesce(sum(30 + ((rev.seed + 11 * rev.jp) % 170)), 0)
            AS BIGINT) AS sum_orig_len,
          CAST(coalesce(sum(CASE WHEN rev.jp IS NOT NULL THEN mn.om END), 0)
            AS BIGINT) AS sum_orig_media
        FROM rev LEFT JOIN mn ON rev.seed = mn.seed
        GROUP BY rev.media_id""")),

    // ---- Parquet FOOTER walk (r10 — the lakehouse container itself:
    // at 100 TB the footer is the scan planner's whole world — row-
    // group pruning, min/max predicate skipping and split planning
    // read ONLY this structure): Spark's REAL writer produces the
    // artifact (snappy, small block size → several row groups at
    // sf0.1), and the dependency-free Thrift compact-protocol codec
    // (`ParquetFile.scala`) walks it back — per-column value counts
    // and INT64 min/max statistics aggregated across row groups. The
    // oracle replays the same statistics from the source table, so a
    // walk with the varint zigzag, the field-delta state, the list
    // headers, the schema-tree flattening or the little-endian stats
    // decode wrong cannot match. This is a Spark-writer-vs-our-reader
    // DIFFERENTIAL on real files (the Jpeg-vs-JDK stance); the spec
    // additionally pins every decoded field against parquet-mr's own
    // reader.
    "q202_parquet_footer" -> Query(
      (s, dir) => {
        import s.implicits._
        // per-run artifact path (the q142/q146 rule: no cross-run race)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_pqf_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        docs(s, dir).select(col("doc_id"), col("lang"),
            col("n_chars").cast("long").as("n_chars"))
          .repartition(1).sortWithinPartitions("doc_id")
          .write.option("compression", "snappy")
          .option("parquet.block.size", (256 * 1024).toString)
          .parquet(base)
        val media = s.read.format("binaryFile").load(base)
          .filter(col("path").endsWith(".parquet"))
          .select(lit(0L), col("content")).as[(Long, Array[Byte])]
        ParquetFile.decodeFooters(media).toDF()
          .where(col("valid"))
          .groupBy(col("col_path"))
          .agg(sum(col("n_values")).as("n_values"),
            min(when(col("has_stats"), col("min_long"))).as("min_v"),
            max(when(col("has_stats"), col("max_long"))).as("max_v"))
      },
      Some("""SELECT 'doc_id' AS col_path,
          CAST(count(*) AS BIGINT) AS n_values,
          CAST(min(doc_id) AS BIGINT) AS min_v,
          CAST(max(doc_id) AS BIGINT) AS max_v FROM documents
        UNION ALL SELECT 'lang', CAST(count(*) AS BIGINT), NULL, NULL
          FROM documents
        UNION ALL SELECT 'n_chars', CAST(count(*) AS BIGINT),
          CAST(min(n_chars) AS BIGINT), CAST(max(n_chars) AS BIGINT)
          FROM documents""")),

    // ---- Parquet DATA-PAGE decode (r10 — the reader below the
    // footer: V1 pages, PLAIN + dictionary encodings, definition
    // levels, per-page CRC32; q203 = uncompressed/no-dictionary
    // layout, q204 = Spark's DEFAULT layout, snappy pages + dict-
    // encoded low-cardinality columns with parquet-mr's PLAIN
    // fallback on the all-unique key). Spark's own writer produces
    // the bytes; our codec reads the VALUES back (sums, null counts,
    // byte lengths, unsigned byte sums) and the oracle replays them
    // from the source table — a reader with the RLE/bit-packed
    // hybrid, the def-level prefix, the dict indices, the snappy
    // frames or the CRC wrong cannot match.
    "q203_parquet_pages" -> Query(
      (s, dir) => parquetPages(s, dir, "plain", "uncompressed",
        dict = false),
      Some(ParquetPagesOracle)),
    "q204_parquet_default" -> Query(
      (s, dir) => parquetPages(s, dir, "dflt", "snappy", dict = true),
      Some(ParquetPagesOracle)),

    // ---- Parquet GZIP pages (r10 — the codec matrix's third leg:
    // every page a complete RFC 1952 member, CRC-32 + ISIZE exact):
    // same oracle as q203/q204, so the three layouts must agree
    // through three entirely different byte paths.
    "q207_parquet_gzip" -> Query(
      (s, dir) => parquetPages(s, dir, "gz", "gzip", dict = true),
      Some(ParquetPagesOracle)),

    // ---- Parquet row-group STATS PRUNING (r10 — the scan planner's
    // actual job run by OUR codec: the artifact is sorted by doc_id,
    // so row-group [min,max] footer statistics carve the key range;
    // groups that cannot intersect [101, 487] are skipped without
    // touching a page, surviving groups decode the KEY chunk row-wise
    // and mask the VALUE chunk positionally — def-level alignment and
    // all). The oracle replays the filtered count and sums; a pruner
    // that skips a group it needed, misaligns the mask, or trusts a
    // stale stat cannot match.
    "q208_parquet_pruned" -> Query(
      (s, dir) => {
        val media = parquetArtifactMedia(s, dir, "prn", "snappy",
          dict = true, blockSize = 16 * 1024)
        ParquetFile.decodePrunedSum(media, "doc_id", "n_chars",
            101L, 487L).toDF()
          .where(col("valid"))
          .select(col("n_rows_matched"), col("sum_key"), col("sum_val"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows_matched,
          CAST(sum(doc_id) AS BIGINT) AS sum_key,
          CAST(sum(n_chars) AS BIGINT) AS sum_val
        FROM documents WHERE doc_id BETWEEN 101 AND 487""")),

    // ---- Parquet V2 writer layout (r10 — the format's OTHER data
    // page: DataPageHeaderV2 with raw uncompressed levels and a
    // values-only compression window, and the V2 writer's native
    // encodings — DELTA_BINARY_PACKED for the integers (block/
    // miniblock headers, zigzag min deltas, LSB-first packed
    // miniblocks with trailing padding) and DELTA_BYTE_ARRAY front
    // coding for the strings (prefix lengths + suffix stream, each
    // value sharing its head with the previous one)): the SAME
    // q203/q204 oracle, so a fourth entirely different byte path
    // must land on identical sums.
    "q210_parquet_v2" -> Query(
      (s, dir) => {
        val media = parquetArtifactMedia(s, dir, "v2", "snappy",
          dict = false, blockSize = 256 * 1024,
          writerVersion = "PARQUET_2_0")
        ParquetFile.decodeColumnSums(media).toDF()
          .where(col("valid"))
          .groupBy(col("col_path"))
          .agg(sum(col("n_values")).as("n_values"),
            sum(col("n_nonnull")).as("n_nonnull"),
            sum(col("sum_long")).as("sum_long"),
            sum(col("sum_blen")).as("sum_blen"),
            sum(col("sum_bytes")).as("sum_bytes"))
      },
      Some(ParquetPagesOracle)),

    // ---- Parquet PAGE-level pruning via the ColumnIndex/OffsetIndex
    // (r10 — what the page index exists for, run by OUR codec): row
    // groups prune on chunk stats first; inside survivors the key
    // column's ColumnIndex prunes PAGES, surviving key pages decode
    // into a row bitmap anchored by the OffsetIndex first-row
    // indices, and only value pages whose row span intersects the
    // bitmap are ever touched. The index decode itself is gated
    // field-by-field against parquet-mr's own index reader in the
    // spec; the oracle here replays the filtered count and sums — a
    // reader with the index offsets, the bound decode, the first-row
    // anchoring or the bitmap intersection wrong cannot match.
    "q209_parquet_page_pruned" -> Query(
      (s, dir) => {
        val media = parquetArtifactMedia(s, dir, "ppx", "snappy",
          dict = true, blockSize = 16 * 1024)
        ParquetFile.decodePagePrunedSum(media, "doc_id", "n_chars",
            57L, 441L).toDF()
          .where(col("valid"))
          .select(col("n_rows_matched"), col("sum_key"), col("sum_val"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows_matched,
          CAST(sum(doc_id) AS BIGINT) AS sum_key,
          CAST(sum(n_chars) AS BIGINT) AS sum_val
        FROM documents WHERE doc_id BETWEEN 57 AND 441""")),

    // ---- Transaction-log snapshot resolution (r10 — the lakehouse
    // TABLE-FORMAT layer above the parquet reader: a Delta-protocol-
    // style JSON action log written to disk as REAL files, one
    // commit directory per version, resolved by the protocol's rule —
    // per path the highest-version action wins, the path exists iff
    // it is an add; includes the add-after-remove case a naive
    // resolver gets wrong). q212 resolves the LATEST snapshot; q213
    // TIME-TRAVELS to commit 6 over the same log (the version bound
    // changes every doc's fate arithmetic).
    "q212_txlog_snapshot" -> Query(
      (s, dir) => deltaSnapshot(s, dir, "full", -1L),
      Some(deltaOracle(-1L)),
      prepare = Some((s, d) =>
        deltaLogTemplate(s, d, 12, onePerCommit = false): Unit)),
    "q213_txlog_time_travel" -> Query(
      (s, dir) => deltaSnapshot(s, dir, "asof", 6L),
      Some(deltaOracle(6L)),
      prepare = Some((s, d) =>
        deltaLogTemplate(s, d, 12, onePerCommit = false): Unit)),

    // ---- Transaction-log CHECKPOINTING (r11 — the r10 verdict's #1
    // ask: q212/q213 replay EVERY commit to resolve a snapshot, a cost
    // that grows with table HISTORY, not table size). A 48-commit log
    // (4× the q212 history, one atomic JSON file per commit) gets a
    // compacted checkpoint every 10 versions (9/19/29/39, adds +
    // remove TOMBSTONES) plus a `_last_checkpoint` pointer; resolution
    // reads pointer → checkpoint 39 → the 8-commit tail — O(cadence)
    // files however long the table has lived — and folds ONCE with the
    // same latest-wins rule. The oracle replays the FULL 48-commit
    // history: matching it proves checkpoint∪tail ≡ replay
    // bit-identically. TxLogSpec pins the file-count evidence, time
    // travel through OLDER checkpoints, and the pre-first-checkpoint
    // fallback.
    "q217_txlog_checkpoint" -> Query(
      (s, dir) => {
        // r16: the 48-commit log is the shared memoized fixture (the
        // prepare hook builds it untimed); per-run state is only the
        // checkpoint dir this gate's OPERATOR writes — checkpoint
        // writing + pointer→checkpoint→tail resolution stay timed.
        val log = deltaLogTemplate(s, dir, 48, onePerCommit = true)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_ckpt_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        log.foreach { lg =>
          Seq(9L, 19L, 29L, 39L).foreach(v =>
            TxLog.writeCheckpoint(s, lg, s"$base/ckpt", v))
        }
        TxLog.resolve(s, log.getOrElse(s"$base/log"), s"$base/ckpt",
            -1L).state
          .where(col("is_add"))
          .agg(count(lit(1)).as("n_files"),
            sum(col("add_size")).as("sum_size"),
            sum(regexp_extract(col("path"), "part-(\\d+)", 1)
              .cast("long")).as("sum_doc"))
      },
      Some(deltaOracle(-1L, 48)),
      prepare = Some((s, d) =>
        deltaLogTemplate(s, d, 48, onePerCommit = true): Unit)),

    // ---- Incremental log TAILING (r11 — the streaming arm of the same
    // ask): a file source + streaming checkpoint tails the 48-commit
    // log in micro-batches (maxFilesPerTrigger=8 forces several), and
    // EVERY batch folds its action slice into the previous compacted
    // state and persists the result — each micro-batch writes a
    // checkpoint, exactly how a production log keeps `_last_checkpoint`
    // fresh. Latest-wins is associative, so the drained state is
    // bit-identical to full replay (the oracle) regardless of how the
    // source batched the commits.
    "q218_txlog_tail" -> Query(
      (s, dir) => {
        import s.implicits._
        // r16 (VERDICT r15 #9's named prepare-hook candidate): the
        // 48-commit log is the shared memoized fixture; the per-run
        // dirs are only the streaming state + checkpoint the TAIL —
        // the operator under test — writes per micro-batch.
        val log = deltaLogTemplate(s, dir, 48, onePerCommit = true)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_tail_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        val state = log.flatMap(lg =>
          TxLog.tailOnce(s, lg, s"$base/state",
            s"$base/sckpt", filesPerTrigger = 8))
        state.getOrElse(
            Seq.empty[(Long, String, Boolean, Long)]
              .toDF("version", "path", "is_add", "add_size"))
          .where(col("is_add"))
          .agg(count(lit(1)).as("n_files"),
            sum(col("add_size")).as("sum_size"),
            sum(regexp_extract(col("path"), "part-(\\d+)", 1)
              .cast("long")).as("sum_doc"))
      },
      Some(deltaOracle(-1L, 48)),
      prepare = Some((s, d) =>
        deltaLogTemplate(s, d, 48, onePerCommit = true): Unit)),

    // ---- NESTED parquet read: Dremel repetition-level assembly (r11
    // — the r10 verdict's #2 ask: the flat-only page decoder could
    // not round-trip the engine's own array<float> embedding tables).
    // The embeddings table — with injected NULL rows (%13), EMPTY
    // lists (%11) and a NULL first element (%7), exercising every def
    // level of the 3-level list shape — is written by SPARK's writer,
    // then read back through OUR page decoder: rep levels splice
    // elements into rows, def levels classify null-row/empty/null-
    // element/value, FLOAT elements quantize via floor(x·512) (a
    // power-of-two scale is exact on the float mantissa, so both
    // engines see identical longs). ParquetListSpec additionally pins
    // V2 pages, gzip, array<long>/array<double>, and required
    // elements.
    "q219_parquet_list_read" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_plist_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        Tables.embeddings(s, dir).select(col("vec_id"),
            when(col("vec_id") % 13 === 0,
              lit(null).cast("array<float>"))
              .when(col("vec_id") % 11 === 0,
                array().cast("array<float>"))
              .otherwise(transform(col("embedding"), (x, i) =>
                when(col("vec_id") % 7 === 0 && i === 0,
                  lit(null).cast("float")).otherwise(x)))
              .as("emb"))
          .repartition(4, col("vec_id"))
          .write.option("compression", "snappy").parquet(s"$base/data")
        val files = s.read.format("binaryFile").load(s"$base/data")
          .filter(col("path").endsWith(".parquet"))
          .select(lit(0L), col("content")).as[(Long, Array[Byte])]
        ParquetFile.decodeListSums(files, "emb.list.element", 512.0)
          .toDF()
          .where(col("valid"))
          .agg(
            coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
            coalesce(sum(col("n_null_rows")), lit(0L))
              .as("n_null_rows"),
            coalesce(sum(col("n_empty")), lit(0L)).as("n_empty"),
            coalesce(sum(col("n_null_elems")), lit(0L))
              .as("n_null_elems"),
            coalesce(sum(col("n_elems")), lit(0L)).as("n_elems"),
            coalesce(sum(col("sum_q")), lit(0L)).as("sum_q"))
      },
      Some("""WITH e AS (SELECT vec_id,
            CASE WHEN vec_id % 13 = 0 THEN NULL
                 WHEN vec_id % 11 = 0 THEN CAST([] AS FLOAT[])
                 ELSE list_transform(embedding, (x, i) ->
                   CASE WHEN vec_id % 7 = 0 AND i = 1 THEN NULL
                        ELSE x END) END AS emb
          FROM embeddings)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) FILTER (WHERE emb IS NULL) AS BIGINT)
            AS n_null_rows,
          CAST(count(*) FILTER (WHERE len(emb) = 0) AS BIGINT)
            AS n_empty,
          CAST(coalesce(sum(list_sum(list_transform(emb, x ->
              CASE WHEN x IS NULL THEN 1 ELSE 0 END))), 0) AS BIGINT)
            AS n_null_elems,
          CAST(coalesce(sum(list_sum(list_transform(emb, x ->
              CASE WHEN x IS NULL THEN 0 ELSE 1 END))), 0) AS BIGINT)
            AS n_elems,
          CAST(coalesce(sum(coalesce(list_sum(list_transform(emb, x ->
              CASE WHEN x IS NULL THEN 0
                   ELSE CAST(floor(CAST(x AS DOUBLE) * 512) AS BIGINT)
              END)), 0)), 0) AS BIGINT) AS sum_q
        FROM e""")),

    // ---- LAKEHOUSE end-to-end scan (r10 capstone — every layer this
    // round built, composed in the order a real lakehouse reader runs
    // them): the table is laid out as 12 range-bucketed parquet files;
    // per-file doc_id min/max stats come from OUR footer codec; a
    // single-commit JSON transaction log carries path + stats (the
    // Delta adds-with-stats shape); the SNAPSHOT resolve + LOG-level
    // stats pruning select the files a predicate can touch; ONLY those
    // paths are loaded (true file skipping — the pruned paths never
    // reach the scan); inside each survivor the q208 row-group-pruned
    // reader masks the value column by the key predicate. The oracle
    // replays the filtered sums — a mistake in ANY layer (footer
    // stats, log round-trip, file pruning, rg pruning, def-level
    // alignment) breaks the hash.
    "q214_lakehouse_scan" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lake_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"))
        // bounded scalar probe (the Curation/Drift precedent): the
        // bucket width both sides derive from max(doc_id); an empty
        // corpus has no max → the empty selective scan, no layout
        val mxRow = d.agg(max(col("doc_id"))).head()
        def zeros: DataFrame = Seq.empty[(Long, Long, Long)]
          .toDF("n_rows_matched", "sum_key", "sum_val")
          .agg(coalesce(sum(col("n_rows_matched")), lit(0L))
            .as("n_rows_matched"),
            coalesce(sum(col("sum_key")), lit(0L)).as("sum_key"),
            coalesce(sum(col("sum_val")), lit(0L)).as("sum_val"))
        if (mxRow.isNullAt(0)) zeros
        else {
          val mx = mxRow.getLong(0)
          val width = mx / 12 + 1
          d.withColumn("b", (col("doc_id") / width).cast("int"))
            .repartition(col("b")).sortWithinPartitions("doc_id")
            .write.partitionBy("b").option("compression", "snappy")
            .parquet(s"$base/data")
          // per-file stats via OUR footer codec, distributed
          val files = s.read.format("binaryFile").load(s"$base/data/b=*")
            .filter(col("path").endsWith(".parquet"))
            .select(col("path"), col("content"))
            .as[(String, Array[Byte])]
          val adds = files.mapPartitions(_.map { case (p, bytes) =>
            val rows = ParquetFile.parse(0L, bytes)
            val dc = rows.filter(r => r.valid && r.col_path == "doc_id" &&
              r.has_stats)
            if (dc.isEmpty) (p, 0L, -1L) // poisoned stats → never pruned
            else (p, dc.map(_.min_long).min, dc.map(_.max_long).max)
          }).toDF("path", "min_doc", "max_doc")
          // single-commit JSON log with adds-carry-stats, as REAL files
          adds.select(lit(0L).as("version"), to_json(struct(
              struct(col("path"), col("min_doc"), col("max_doc"))
                .as("add"))).as("value"))
            .write.partitionBy("version").text(s"$base/log")
          val lo = 120L; val hi = 260L
          val live = s.read.text(s"$base/log/version=*")
            .select(
              get_json_object(col("value"), "$.add.path").as("path"),
              get_json_object(col("value"), "$.add.min_doc")
                .cast("long").as("min_doc"),
              get_json_object(col("value"), "$.add.max_doc")
                .cast("long").as("max_doc"))
            .where(col("max_doc") >= lo && col("min_doc") <= hi ||
              col("max_doc") < col("min_doc")) // statless files must scan
          // TRUE file skipping: only surviving paths reach the scan
          // (bounded artifact collect — ≤ 12 paths)
          val paths = live.select(col("path")).as[String].collect().sorted
          if (paths.isEmpty) zeros
          else {
            val surviving = s.read.format("binaryFile")
              .load(paths.toIndexedSeq: _*)
              .select(lit(0L), col("content")).as[(Long, Array[Byte])]
            ParquetFile.decodePrunedSum(surviving, "doc_id", "n_chars",
                lo, hi).toDF()
              .where(col("valid"))
              .agg(coalesce(sum(col("n_rows_matched")), lit(0L))
                .as("n_rows_matched"),
                coalesce(sum(col("sum_key")), lit(0L)).as("sum_key"),
                coalesce(sum(col("sum_val")), lit(0L)).as("sum_val"))
          }
        }
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows_matched,
          CAST(sum(doc_id) AS BIGINT) AS sum_key,
          CAST(sum(n_chars) AS BIGINT) AS sum_val
        FROM documents WHERE doc_id BETWEEN 120 AND 260""")),

    // ---- Parquet WRITER round trip (r10 — the inverse differential:
    // the engine PRODUCES lakehouse files without parquet-mr, and
    // SPARK'S OWN READER consumes them): docs group into 256-doc
    // files (the q215 container-grain lesson), each serialized by
    // `ParquetWrite.writeFile` — V1 pages, PLAIN or dictionary (the
    // r11 writer auto-chooses per chunk), REQUIRED columns,
    // UTF8-annotated strings, real INT64 statistics, a full Thrift
    // compact footer — written from executors, then read back with
    // `spark.read.parquet` and aggregated. The oracle replays the
    // sums from the source table; a writer with the zigzag, the
    // field-delta state, the schema tree, the page framing or the
    // offsets wrong produces files Spark cannot read (or reads to
    // different sums). The spec additionally pins parquet-mr's
    // reader (footer + stats + pages) and our own reader's round
    // trip incl. stats pruning over our files.
    "q216_parquet_writer" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_pqw_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(base).mkdirs()
        docs(s, dir).select((col("doc_id") / 256).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("source"))
          .as[(Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._2)
            (g, graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._2)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rows.map(_._3)),
              graft.operators.ParquetWrite.StrCol("source",
                rows.map(_._4)))))
          }
          .foreachPartition { it: Iterator[(Long, Array[Byte])] =>
            it.foreach { case (g, bytes) =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$base/part-$g.parquet"),
                bytes): Unit
            }
          }
        // empty corpus → no files were written → the empty aggregate
        // (Spark cannot infer a schema from an empty directory)
        val wrote = Option(new java.io.File(base).listFiles())
          .exists(_.exists(_.getName.endsWith(".parquet")))
        val read =
          if (wrote) s.read.parquet(base) // Spark's OWN reader, OUR bytes
          else Seq.empty[(Long, Long, String)]
            .toDF("doc_id", "n_chars", "source")
        read.agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_doc"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("source"))).as("sum_srclen"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(doc_id) AS BIGINT) AS sum_doc,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST(sum(len(source)) AS BIGINT) AS sum_srclen
        FROM documents""")),

    // ---- Parquet writer, full surface (r11 — the r10 verdict's #3
    // ask: the q216 writer was REQUIRED/PLAIN/one-row-group, too
    // narrow to write the engine's real tables). Files carry OPTIONAL
    // columns (definition levels on the wire: n_chars nulled for
    // doc_id%9, source for %5), a dictionary-encoded string column
    // (lang — few distinct values), and EIGHT row groups per file
    // (rowsPerGroup=128 over 1024-doc files, rows sorted by doc_id so
    // per-group stats are tight ranges). Spark's own reader then runs
    // a SELECTIVE scan over our bytes — nulls, dict indices, def
    // levels and multi-group assembly all land in the aggregate; the
    // spec additionally proves Spark PRUNES row groups on our written
    // stats (scan rows < file rows under the pushed predicate).
    "q220_parquet_writer_v2" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_pqw2_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(base).mkdirs()
        docs(s, dir).select((col("doc_id") / 1024).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("source"), col("lang"))
          .as[(Long, Long, Long, String, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._2)
            (g, graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._2)),
              graft.operators.ParquetWrite.OptLongCol("n_chars",
                rows.map(r => if (r._2 % 9 == 0) null
                  else java.lang.Long.valueOf(r._3))),
              graft.operators.ParquetWrite.OptStrCol("source",
                rows.map(r => if (r._2 % 5 == 0) null else r._4)),
              graft.operators.ParquetWrite.StrCol("lang",
                rows.map(_._5))),
              rowsPerGroup = 128))
          }
          .foreachPartition { it: Iterator[(Long, Array[Byte])] =>
            it.foreach { case (g, bytes) =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$base/part-$g.parquet"),
                bytes): Unit
            }
          }
        val wrote = Option(new java.io.File(base).listFiles())
          .exists(_.exists(_.getName.endsWith(".parquet")))
        val read =
          if (wrote) s.read.parquet(base) // Spark's OWN reader
          else Seq.empty[(Long, java.lang.Long, String, String)]
            .toDF("doc_id", "n_chars", "source", "lang")
        read.where(col("doc_id").between(300L, 1700L))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id")).as("sum_doc"),
            sum(col("n_chars")).as("sum_chars"),
            (count(lit(1)) - count(col("n_chars"))).as("n_null_chars"),
            sum(length(col("source"))).as("sum_srclen"),
            (count(lit(1)) - count(col("source"))).as("n_null_src"),
            count(col("lang")).as("n_lang"))
      },
      Some("""WITH d AS (SELECT doc_id,
            CASE WHEN doc_id % 9 = 0 THEN NULL ELSE n_chars END AS nc,
            CASE WHEN doc_id % 5 = 0 THEN NULL ELSE source END AS src,
            lang
          FROM documents WHERE doc_id BETWEEN 300 AND 1700)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(doc_id) AS BIGINT) AS sum_doc,
          CAST(sum(nc) AS BIGINT) AS sum_chars,
          CAST(count(*) - count(nc) AS BIGINT) AS n_null_chars,
          CAST(sum(len(src)) AS BIGINT) AS sum_srclen,
          CAST(count(*) - count(src) AS BIGINT) AS n_null_src,
          CAST(count(lang) AS BIGINT) AS n_lang
        FROM d""")),

    // ---- Avro Object Container File walk (r10 — the ROW-format
    // counterpart to the parquet reader: Kafka archives, CDC dumps
    // and ingest staging ship OCF): fixtures come from avro-java's
    // REAL DataFileWriter (deflate blocks for even doc_ids — file
    // bytes share no structure with the record formulas; explicit
    // sync() every two records pins the block boundaries so even
    // n_blocks replays); our dependency-free reader parses the
    // schema from the header (a JSON walk, not an assumption),
    // verifies every block's sync marker against the header's, and
    // decodes the zigzag/length-prefixed/union wire format. The
    // oracle replays record/block counts, integer sums, union null
    // tallies and string byte sums — a reader with the varint, the
    // union branch, the block framing or the inflate wrong cannot
    // match.
    "q215_avro_scan" -> Query(
      (s, dir) => {
        import s.implicits._
        // one OCF per 64-doc group — the realistic many-records-per-
        // container shape (per-doc files made the avro-java WRITER
        // objects, not the reader, the measured sf20 cost); the group
        // shuffle is the fixture-build stage, the decode is map-side
        val media = docs(s, dir)
          .select((col("doc_id") / 64).cast("long").as("g"),
            col("doc_id")).as[(Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            (g, Avro.avroGroupPayload(g, it.map(_._2).toArray.sorted))
          }
        Avro.decodeAvro(media).toDF()
      },
      Some("""WITH p AS (SELECT doc_id // 64 AS media_id, doc_id AS d,
              CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE (7 * doc_id) % 50 END AS v,
              repeat('s', CAST(1 + doc_id % 4 AS INT)) || doc_id AS s
            FROM documents)
        SELECT media_id,
          CAST((count(*) + 1) // 2 AS BIGINT) AS n_blocks,
          CAST(count(*) AS BIGINT) AS n_records,
          CAST(sum(d) + coalesce(sum(v), 0) AS BIGINT) AS sum_long,
          CAST(count(*) - count(v) AS BIGINT) AS n_nulls,
          CAST(sum(strlen(s)) AS BIGINT) AS sum_slen,
          CAST(sum(list_sum(list_transform(range(1, len(s) + 1),
            i -> ord(s[i])))) AS BIGINT) AS sum_sbytes,
          true AS valid
        FROM p GROUP BY media_id""")),

    // ---- Avro DEEP decode (r11 — the r10 verdict's #5 ask: real CDC
    // dumps carry records-in-records and arrays, and Kafka-ecosystem
    // OCFs default to snappy). Fixtures come from avro-java's REAL
    // writer over a nested schema — a sub-record (string + nullable
    // long), an array<long> (empty for d%4==0), and a NULLABLE
    // array<string> — with the `snappy` codec (raw block + big-endian
    // CRC32 suffix, decoded by the q204 Snappy engine) on even groups
    // and `deflate` on odd, so both compressed paths run every time.
    // The recursive schema walker parses the type TREE (unions at any
    // depth, either null order); the decoder walks values by that
    // tree. The oracle replays every aggregate including array-item
    // counts — a reader with the union branch, the array block runs,
    // the CRC or the nesting wrong cannot match.
    "q221_avro_deep" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = docs(s, dir)
          .select((col("doc_id") / 64).cast("long").as("g"),
            col("doc_id")).as[(Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            (g, Avro.avroDeepGroupPayload(g, it.map(_._2).toArray.sorted))
          }
        Avro.decodeAvroDeep(media).toDF()
      },
      Some("""WITH p AS (SELECT doc_id // 64 AS media_id, doc_id AS d,
              CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE (7 * doc_id) % 50 END AS score,
              CASE WHEN doc_id % 4 = 0 THEN 0
                ELSE 3 END AS ntoks,
              CASE WHEN doc_id % 4 = 0 THEN 0
                ELSE doc_id % 10 + doc_id % 7 + doc_id % 3 END AS toksum,
              CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END AS tagnull
            FROM documents)
        SELECT media_id,
          CAST((count(*) + 1) // 2 AS BIGINT) AS n_blocks,
          CAST(count(*) AS BIGINT) AS n_records,
          CAST(sum(d) + coalesce(sum(score), 0) + sum(toksum)
            AS BIGINT) AS sum_long,
          CAST(count(*) - count(score) + sum(tagnull) AS BIGINT)
            AS n_nulls,
          CAST(sum(ntoks) + sum(1 - tagnull) AS BIGINT) AS n_items,
          CAST(sum(2 + 2 * (1 - tagnull)) AS BIGINT) AS sum_slen,
          CAST(sum(163 + d % 5 + (1 - tagnull) * (164 + d % 2))
            AS BIGINT) AS sum_sbytes,
          true AS valid
        FROM p GROUP BY media_id""")),

    // ---- COMMIT PROVENANCE / DESCRIBE HISTORY (r13 — Delta's
    // commitInfo): every engine write path stamps its operation name
    // into its own commit; `TxLog.historyLocal` reads back (version,
    // op, rows added). The gate scripts bootstrap (hand commit — no
    // provenance, the pre-r13 shape), a connector APPEND, an
    // insert-only MERGE and an OPTIMIZE, then aggregates the history
    // per op — commit counts and per-op row totals must replay from
    // the data alone; a mislabeled or double-stamped commit shifts a
    // row.
    "q254_lake_history" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakeh_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val boot = d.where(col("doc_id") % 2 === 0)
          .as[(Long, Long, String)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(String, Long, Long)]
            .toDF("op", "n_commits", "rows_added")
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("doc_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("n_chars",
              boot.map(_._2)),
            graft.operators.ParquetWrite.StrCol("lang",
              boot.map(_._3))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          d.where(col("doc_id") % 2 === 1).coalesce(1)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          // insert-only merge: 16 keys beyond every file window
          val mx = d.agg(max(col("doc_id"))).head().getLong(0)
          graft.operators.LakeMaintenance.merge(s, base,
            (1L to 16L).map(i => (mx + i,
              Array[Any](java.lang.Long.valueOf(mx + i),
                java.lang.Long.valueOf(7L), "zz"))),
            "doc_id"): Unit
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 1 << 22): Unit
          val h = graft.operators.TxLog.historyLocal(s"$base/log")
            .map { case (v, op, rows) =>
              (v, op.getOrElse("UNKNOWN"), rows)
            }
          s.createDataFrame(h).toDF("version", "op", "rows")
            .groupBy(col("op"))
            .agg(count(lit(1)).as("n_commits"),
              sum(col("rows")).as("rows_added"))
        }
      },
      Some("""WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ev
          FROM documents)
        SELECT 'UNKNOWN' AS op, CAST(1 AS BIGINT) AS n_commits,
          ev AS rows_added FROM t
        UNION ALL SELECT 'APPEND', CAST(1 AS BIGINT), n - ev FROM t
        UNION ALL SELECT 'MERGE', CAST(1 AS BIGINT),
          CAST(16 AS BIGINT) FROM t
        UNION ALL SELECT 'OPTIMIZE', CAST(1 AS BIGINT), n + 16
          FROM t""")),

    // ---- CHECK CONSTRAINTS (r13 — Delta's table constraints): ADD
    // validates the expression against the schema AND the existing
    // rows; every subsequent append evaluates it per row at the
    // write path and FALSE fails the job before any commit (NULL
    // passes — the SQL CHECK rule); constraints fold into format-2
    // checkpoints so enforcement survives log expiry. The gate
    // bootstraps, adds a constraint, lands one valid append, then
    // proves the enforcement RELATIONALLY: a violating append is
    // attempted and must leave no trace — the final aggregate equals
    // the valid subset alone, and one leaked row shifts a count.
    // LakeMaintenanceSpec pins the add-time validation, the
    // streaming-epoch arm, the expiry fold and the drop.
    "q251_lake_constraints" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakecn_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val boot = d.where(col("doc_id") < 256)
          .as[(Long, Long, String)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("doc_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("n_chars",
              boot.map(_._2)),
            graft.operators.ParquetWrite.StrCol("lang",
              boot.map(_._3))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          graft.sources.LakeSource.addConstraint(s, base,
            "chars_sane", "n_chars >= 0 AND doc_id >= 0"): Unit
          d.where(col("doc_id") >= 256)
            .repartition(2)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          // the violating append MUST fail loudly and leave no trace.
          // Classification is NARROW (ADVICE r14): only a failure
          // whose cause chain names the CHECK constraint counts as
          // the expected rejection — an infrastructure failure
          // (commit collision, I/O fault) rethrows as itself, and a
          // silently-succeeding append trips the None arm.
          val probe: Option[Throwable] =
            try {
              d.where(col("doc_id") >= 256).limit(7)
                .select(col("doc_id"), lit(-1L).as("n_chars"),
                  col("lang"))
                .coalesce(1)
                .write.format("graft-lake").option("path", base)
                .mode("append").save()
              None
            } catch { case e: Throwable => Some(e) }
          probe match {
            case None => throw new IllegalStateException(
              "constraint violation silently committed")
            case Some(e) =>
              val msgs = Iterator.iterate(e)(_.getCause)
                .takeWhile(_ != null).take(20)
                .map(t => Option(t.getMessage).getOrElse(""))
              if (!msgs.exists(_.contains(
                  "CHECK constraint chars_sane"))) throw e
          }
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang""")),

    // ---- PARTITION-AWARE compaction + OPTIMIZE WHERE (r13): bins
    // never cross partitionValues groups, rewritten adds KEEP their
    // part and inherit the union skey window (before this, compaction
    // merged partitions and the rewritten files lost q237/q238
    // pruning), and `partition=Some(p)` maintains one hot partition
    // without touching the cold ones. The gate litters one file per
    // (lang, bucket) through the partitioned connector write, runs
    // OPTIMIZE WHERE on one lang then a full compaction, and the
    // partition-filtered aggregate must replay — a bin that crossed
    // values, dropped a part, or double-counted a row cannot match.
    // LakeMaintenanceSpec pins the file counts and pruning shapes.
    "q252_lake_compact_where" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakecw_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val adds = d
          .withColumn("g", (col("doc_id") / 256).cast("long"))
          .as[(Long, Long, String, Long)]
          .groupByKey(r => (r._3, r._4))
          .mapGroups { (k, it) =>
            val rs = it.toArray.sortBy(_._1)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rs.map(_._1)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rs.map(_._2)),
              graft.operators.ParquetWrite.StrCol("lang",
                rs.map(_._3))))
            val p = s"$base/data/part-${k._1}-${k._2}.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            ((k._1, k._2),
              s"""{"add":{"path":"$p","size":${rs.length}""" +
              s""","min_key":${rs.head._1},"max_key":${rs.last._1}""" +
              s""","part":"${k._1}"}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 1 << 20, partition = Some("en")): Unit
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 1 << 20): Unit
          s.read.format("graft-lake").option("path", base)
            .option("partitionBy", "lang").load()
            .where(col("lang").isin("en", "de", "zh"))
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE lang IN ('en', 'de', 'zh')
        GROUP BY lang""")),

    // ---- TIMESTAMP time travel (r13 — Delta's asOfTimestamp):
    // `asOfTs` resolves to the newest commit whose directory mtime is
    // ≤ it (pinned deterministically by the fixture); the gated read
    // aggregates the PRE-append snapshot through the timestamp while
    // the table's head already carries the append — a resolver that
    // read the head, mis-ordered the mtimes, or off-by-one'd the
    // boundary cannot match the oracle.
    "q253_lake_time_travel_ts" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_laketts_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val boot = d.where(col("doc_id") % 2 === 0)
          .as[(Long, Long, String)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("doc_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("n_chars",
              boot.map(_._2)),
            graft.operators.ParquetWrite.StrCol("lang",
              boot.map(_._3))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          d.where(col("doc_id") % 2 === 1).repartition(2)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          // deterministic mtimes: v0 at T, v1 a minute later
          val t0 = 1700000000000L
          new java.io.File(s"$base/log/version=0")
            .setLastModified(t0): Unit
          new java.io.File(s"$base/log/version=1")
            .setLastModified(t0 + 60000L): Unit
          s.read.format("graft-lake").option("path", base)
            .option("asOfTs", t0 + 30000L).load() // the v0 snapshot
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE doc_id % 2 = 0 GROUP BY lang""")),

    // ---- LOG EXPIRY (r13 — Delta's log retention; before this the
    // commit history only ever grew): the table bootstraps, merges
    // (update+delete with cdc sidecars), takes a FORMAT-2 checkpoint
    // (folded file/schema/txn state), EXPIRES everything behind the
    // head, then keeps appending through the connector. The gated
    // read runs entirely over checkpoint + post-expiry tail — a
    // resolver that silently lost pre-checkpoint adds, a version
    // counter that reused a folded number, or a schema lookup that
    // needed the expired metaData action cannot match the oracle.
    // LakeMaintenanceSpec pins the loud behind-horizon failure.
    "q250_lake_log_expiry" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakexp_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val adds = d.where(col("doc_id") % 2 === 0)
          .withColumn("g", (col("doc_id") / 128).cast("long"))
          .as[(Long, Long, String, Long)]
          .groupByKey(_._4)
          .mapGroups { (g, it) =>
            val rs = it.toArray.sortBy(_._1)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rs.map(_._1)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rs.map(_._2)),
              graft.operators.ParquetWrite.StrCol("lang",
                rs.map(_._3))))
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            (g, s"""{"add":{"path":"$p","size":${rs.length}""" +
              s""","min_key":${rs.head._1},"max_key":${rs.last._1}}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          val evens = d.where(col("doc_id") % 2 === 0)
            .select(col("doc_id")).as[Long].collect()
          val updates = evens
            .filter(k => k % 10 == 0 && k % 13 != 0).sorted.map { k =>
              (k, Array[Any](java.lang.Long.valueOf(k),
                java.lang.Long.valueOf(k * 7), "xx"))
            }.toSeq
          val deletes = evens.filter(_ % 13 == 0).sorted.toSeq
          graft.operators.LakeMaintenance.merge(s, base, updates,
            "doc_id", deletes = deletes): Unit
          val head = graft.operators.TxLog
            .commitVersions(s"$base/log").max
          graft.operators.TxLog.writeCheckpoint(s,
            s"$base/log", s"$base/ckpt", head)
          graft.operators.LakeMaintenance.expireLog(base,
            keepVersions = 0): Unit
          // life goes on over checkpoint + tail alone
          d.where(col("doc_id") % 2 === 1).repartition(2)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT)
              AS n_chars, lang FROM documents),
          m AS (SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 AND doc_id % 10 = 0
                    AND doc_id % 13 <> 0 THEN doc_id * 7
                   ELSE n_chars END AS n_chars,
              CASE WHEN doc_id % 2 = 0 AND doc_id % 10 = 0
                    AND doc_id % 13 <> 0 THEN 'xx'
                   ELSE lang END AS lang
            FROM d WHERE NOT (doc_id % 2 = 0 AND doc_id % 13 = 0))
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM m GROUP BY lang""")),

    // ---- MERGE over the WIDENED type surface (r13 — the r12
    // verdict's #1 gap: the engine's flagship `array<float>`
    // embeddings tables could be compacted and z-ordered but not
    // CDC-merged; `readFileCells` failed loudly on lists). The table
    // is the q233 embeddings shape (long, long, array<float>,
    // double); one merge applies updates (new score + list), deletes
    // (every 13th key) and inserts (16 fresh keys) in ONE commit
    // through `readFileColumns`' typed column templates. The oracle
    // replays the changeset relationally over quantized element
    // sums — a merge that drops a list element, coerces a float
    // through double arithmetic, or resurrects a deleted row cannot
    // match. LakeMaintenanceSpec pins null lists/elements/NaN.
    "q244_lake_merge_embeddings" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakeme_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val e = Tables.embeddings(s, dir).select(col("vec_id"),
          col("label").cast("long").as("label"),
          col("embedding"),
          (col("vec_id") * 0.25 - 3.0).as("score"))
        val adds = e
          .withColumn("g", (col("vec_id") / 128).cast("long"))
          .as[(Long, Long, Array[Float], Double, Long)]
          .groupByKey(_._5)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._1)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("vec_id",
                rows.map(_._1)),
              graft.operators.ParquetWrite.LongCol("label",
                rows.map(_._2)),
              graft.operators.ParquetWrite.FloatListCol("embedding",
                rows.map(_._3.map(java.lang.Float.valueOf))),
              graft.operators.ParquetWrite.DoubleCol("score",
                rows.map(_._4))),
              rowsPerGroup = 64)
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            (g, s"""{"add":{"path":"$p","size":${rows.length}""" +
              s""","min_key":${rows.head._1}""" +
              s""","max_key":${rows.last._1}}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(Long, Long, Long, Long, Long)]
            .toDF("label", "n", "n_elems", "sum_q", "sum_sq")
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          // the changeset: bounded key collects — the CDC-batch
          // shape merge broadcasts anyway
          val ids = e.select(col("vec_id")).as[Long].collect()
          val mx = ids.max
          val updates =
            ids.filter(k => k % 10 == 0 && k % 13 != 0).sorted.map {
              k => (k, Array[Any](java.lang.Long.valueOf(k),
                java.lang.Long.valueOf(k % 4 + 10),
                Array[java.lang.Float](
                  java.lang.Float.valueOf(k.toFloat / 4f),
                  java.lang.Float.valueOf(k.toFloat / 8f)),
                java.lang.Double.valueOf(k * 0.5)))
            }.toSeq ++
            (1L to 16L).map { i =>
              val k = mx + i
              (k, Array[Any](java.lang.Long.valueOf(k),
                java.lang.Long.valueOf(k % 4 + 20),
                Array[java.lang.Float](
                  java.lang.Float.valueOf(k.toFloat / 4f)),
                java.lang.Double.valueOf(k * 0.5)))
            }
          val deletes = ids.filter(_ % 13 == 0).sorted.toSeq
          graft.operators.LakeMaintenance.merge(s, base, updates,
            "vec_id", deletes = deletes): Unit
          s.read.format("graft-lake").option("path", base)
            .option("statsCol", "vec_id").load()
            .select(col("label"),
              aggregate(transform(col("embedding"), x =>
                  floor(x.cast("double") * 1024.0).cast("long")),
                lit(0L), (acc, x) => acc + x).as("q"),
              size(col("embedding")).as("ne"),
              floor(col("score") * 4.0).cast("long").as("sq"))
            .groupBy(col("label"))
            .agg(count(lit(1)).as("n"),
              sum(col("ne")).cast("long").as("n_elems"),
              sum(col("q")).as("sum_q"),
              sum(col("sq")).as("sum_sq"))
        }
      },
      Some("""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
            embedding, vec_id * 0.25 - 3.0 AS score FROM embeddings),
          mx AS (SELECT max(vec_id) AS m FROM embeddings),
          merged AS (
            SELECT vec_id,
              CASE WHEN vec_id % 10 = 0 THEN vec_id % 4 + 10
                   ELSE label END AS label,
              CASE WHEN vec_id % 10 = 0 THEN
                  [CAST(vec_id AS REAL) / 4, CAST(vec_id AS REAL) / 8]
                ELSE embedding END AS embedding,
              CASE WHEN vec_id % 10 = 0 THEN vec_id * 0.5
                   ELSE score END AS score
            FROM e WHERE vec_id % 13 <> 0
            UNION ALL
            SELECT m + i, (m + i) % 4 + 20,
              [CAST(m + i AS REAL) / 4], (m + i) * 0.5
            FROM mx, range(1, 17) t(i))
        SELECT CAST(label AS BIGINT) AS label,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(len(embedding)) AS BIGINT) AS n_elems,
          CAST(sum(list_sum(list_transform(embedding,
            x -> floor(CAST(x AS DOUBLE) * 1024)))) AS BIGINT) AS sum_q,
          CAST(sum(floor(score * 4)) AS BIGINT) AS sum_sq
        FROM merged GROUP BY label""")),

    // ---- ROW-LEVEL change feed (r13 — Delta CDF's cdc actions; the
    // r12 feed was add-level, so a MERGE's deletes/updates were
    // invisible without a re-diff). MERGE writes cdc sidecar files
    // (table columns + _change_type) into its commit; the streaming
    // source's changeFeed mode serves sidecar versions row-exactly,
    // add versions as injected inserts, and maintenance rewrites not
    // at all. The gate drains three phases (bootstrap / merge /
    // compact+append) into a side table and aggregates per change
    // type — one missed pre-image or re-emitted rewrite shifts a
    // count. The oracle replays the diff relationally.
    "q245_lake_cdc_rows" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakecr_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val adds = d.where(col("doc_id") % 2 === 0)
          .withColumn("g", (col("doc_id") / 128).cast("long"))
          .as[(Long, Long, String, Long)]
          .groupByKey(_._4)
          .mapGroups { (g, it) =>
            val rs = it.toArray.sortBy(_._1)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rs.map(_._1)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rs.map(_._2)),
              graft.operators.ParquetWrite.StrCol("lang",
                rs.map(_._3))))
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            (g, s"""{"add":{"path":"$p","size":${rs.length}""" +
              s""","min_key":${rs.head._1},"max_key":${rs.last._1}}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long, Long)]
            .toDF("change", "n", "sum_id", "sum_chars")
            .groupBy(col("change"))
            .agg(count(lit(1)).as("n"), sum(col("sum_id")).as("sum_id"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          val sink = s"$base/feed"
          def drain(): Unit = {
            val q = s.readStream.format("graft-lake")
              .option("path", base).option("changeFeed", "true").load()
              .writeStream
              .trigger(org.apache.spark.sql.streaming.Trigger
                .AvailableNow())
              .option("checkpointLocation", s"$base/ck")
              .foreachBatch { (b: org.apache.spark.sql.DataFrame,
                  id: Long) =>
                b.write.mode("append").parquet(sink)
              }
              .start()
            q.awaitTermination()
          }
          drain() // phase 1: bootstrap inserts
          val evens = d.where(col("doc_id") % 2 === 0)
            .select(col("doc_id")).as[Long].collect()
          val updates = evens
            .filter(k => k % 10 == 0 && k % 13 != 0).sorted.map { k =>
              (k, Array[Any](java.lang.Long.valueOf(k),
                java.lang.Long.valueOf(k * 7), "xx"))
            }.toSeq ++
            d.where(col("doc_id") % 2 === 1 &&
                col("doc_id") % 11 === 3)
              .select(col("doc_id")).as[Long].collect().sorted
              .map { k =>
                (k, Array[Any](java.lang.Long.valueOf(k),
                  java.lang.Long.valueOf(k * 7), "xx"))
              }
          val deletes = evens.filter(_ % 13 == 0).sorted.toSeq
          graft.operators.LakeMaintenance.merge(s, base, updates,
            "doc_id", deletes = deletes): Unit
          drain() // phase 2: the row-level diff
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 1 << 20): Unit
          d.where(col("doc_id") % 2 === 1 &&
              col("doc_id") % 11 =!= 3).repartition(2)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          drain() // phase 3: rewrite silent, append as inserts
          s.read.parquet(sink)
            .groupBy(col("_change_type").as("change"))
            .agg(count(lit(1)).as("n"),
              sum(col("doc_id")).as("sum_id"),
              sum(col("n_chars")).as("sum_chars"))
            .select(col("change"), col("n"), col("sum_id"),
              col("sum_chars"))
        }
      },
      Some("""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT)
              AS n_chars, lang FROM documents),
          evens AS (SELECT * FROM d WHERE doc_id % 2 = 0),
          dels AS (SELECT * FROM evens WHERE doc_id % 13 = 0),
          upds AS (SELECT * FROM evens
            WHERE doc_id % 10 = 0 AND doc_id % 13 <> 0),
          insodd AS (SELECT doc_id FROM d
            WHERE doc_id % 2 = 1 AND doc_id % 11 = 3),
          apodd AS (SELECT * FROM d
            WHERE doc_id % 2 = 1 AND doc_id % 11 <> 3),
          feed AS (
            SELECT 'insert' AS change, doc_id, n_chars FROM evens
            UNION ALL SELECT 'delete', doc_id, n_chars FROM dels
            UNION ALL SELECT 'update_preimage', doc_id, n_chars
              FROM upds
            UNION ALL SELECT 'update_postimage', doc_id, doc_id * 7
              FROM upds
            UNION ALL SELECT 'insert', doc_id, doc_id * 7 FROM insodd
            UNION ALL SELECT 'insert', doc_id, n_chars FROM apodd)
        SELECT change, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(doc_id) AS BIGINT) AS sum_id,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM feed GROUP BY change""")),

    // ---- COLUMN MAPPING: RENAME + DROP + re-ADD through the log
    // (r13 — Delta's column-mapping mechanism; r12 could only ADD).
    // The bootstrap lands with (doc_id, n_chars, lang); the table
    // then renames n_chars→chars (pure metadata — files keep the
    // physical name, readers map), drops lang, and re-adds a column
    // NAMED lang (fresh physical name — the dropped bytes must never
    // resurrect); the second half appends through the connector
    // carrying the post-evolution schema. The gated read groups by
    // the re-added lang: old rows NULL, new rows populated, chars
    // preserved across the rename — the oracle replays the split
    // relationally. LakeSourceSpec pins the no-rewrite, physical-
    // name and no-resurrection laws.
    "q246_lake_column_mapping" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakemap_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val boot = d.where(col("doc_id") < 256)
          .as[(Long, Long, String)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("doc_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("n_chars",
              boot.map(_._2)),
            graft.operators.ParquetWrite.StrCol("lang",
              boot.map(_._3))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          graft.sources.LakeSource.renameColumn(base,
            "n_chars", "chars"): Unit
          graft.sources.LakeSource.dropColumn(base, "lang"): Unit
          graft.sources.LakeSource.addColumn(base,
            "lang", "string"): Unit
          d.where(col("doc_id") >= 256)
            .select(col("doc_id"), col("n_chars").as("chars"),
              col("lang"))
            .repartition(2)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("chars")).as("sum_chars"))
        }
      },
      Some("""WITH d AS (SELECT CASE WHEN doc_id < 256 THEN NULL
              ELSE lang END AS lang, n_chars FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM d GROUP BY lang""")),

    // ---- GROUP BY partition-column aggregate pushdown (r13 — the
    // r12 verdict's #5 ask: q243's pushdown required no grouping,
    // but per-partition COUNT/MIN/MAX is ALSO pure log metadata once
    // q237's partitionValues exist). The table is built FULLY
    // partitioned by lang through the connector write path; the
    // gated read groups by lang over COUNT/MIN/MAX(doc_id), answered
    // from the grouped adds in one metadata partition
    // (LakeSourceSpec pins the plan shape and the partless-file
    // decline). The oracle replays the same aggregates from the
    // source — a partitionValues mix-up or a lying window cannot
    // match.
    "q247_lake_agg_groupby" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakegb_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        // bootstrap: one file PER lang (each add carries its part
        // value — the whole table must be partitioned for the
        // grouped pushdown to engage)
        val adds = d.where(col("doc_id") < 256)
          .as[(Long, Long, String)]
          .groupByKey(_._3)
          .mapGroups { (lang, it) =>
            val rs = it.toArray.sortBy(_._1)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rs.map(_._1)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rs.map(_._2)),
              graft.operators.ParquetWrite.StrCol("lang",
                rs.map(_._3))))
            val p = s"$base/data/boot-$lang.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            (lang, s"""{"add":{"path":"$p","size":${rs.length}""" +
              s""","min_key":${rs.head._1},"max_key":${rs.last._1}""" +
              s""","part":"$lang"}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long, Long)]
            .toDF("lang", "n", "min_id", "max_id")
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          d.where(col("doc_id") >= 256)
            .write.format("graft-lake").option("path", base)
            .option("partitionBy", "lang").mode("append").save()
          s.read.format("graft-lake").option("path", base)
            .option("partitionBy", "lang").load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              min(col("doc_id")).as("min_id"),
              max(col("doc_id")).as("max_id"))
        }
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(min(doc_id) AS BIGINT) AS min_id,
          CAST(max(doc_id) AS BIGINT) AS max_id
        FROM documents GROUP BY lang""")),

    // ---- Multi-dimensional Z-ORDER with a STRING dimension (r13 —
    // generalizing q242's two-long-column rewrite): the table
    // clusters by (doc_id, h, lang) where lang is a low-cardinality
    // string bucketed by exact rank; the layout is DETERMINISTIC
    // (exact z-prefix histogram cuts, no sampled repartitionByRange —
    // the r12 flake's fix), per-file key windows are measured on the
    // readers' statsCol, and each add carries the lang skey window
    // (LakeMaintenanceSpec pins the pruning efficacy and the twin-
    // table determinism). The gated read filters an h-window and a
    // lang equality THROUGH the rewritten layout and aggregates — a
    // rewrite that drops/duplicates a row, mis-buckets a string rank,
    // or installs a wrong window that survives the residual filters
    // cannot match the oracle.
    "q248_lake_zorder_multi" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakezm_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val adds = docs(s, dir)
          .select((col("doc_id") / 256).cast("long").as("g"),
            col("doc_id"),
            ((col("doc_id") * 797) % 4096).as("h"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .as[(Long, Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rs = it.toArray.sortBy(_._2)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rs.map(_._2)),
              graft.operators.ParquetWrite.LongCol("h", rs.map(_._3)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rs.map(_._4)),
              graft.operators.ParquetWrite.StrCol("lang",
                rs.map(_._5))), rowsPerGroup = 128)
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            (g, s"""{"add":{"path":"$p","size":${rs.length}""" +
              s""","min_key":${rs.head._2},"max_key":${rs.last._2}}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          graft.operators.LakeMaintenance.zorder(s, base,
            Seq("doc_id", "h", "lang"), targetRows = 1024,
            rowsPerGroup = 128, statsCol = "doc_id",
            strStatsCol = Some("lang")): Unit
          s.read.format("graft-lake").option("path", base)
            .option("strStatsCol", "lang").load()
            .where(col("h").between(1000L, 1999L) ||
              col("lang") === "zh")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""WITH d AS (SELECT lang, n_chars,
            (doc_id * 797) % 4096 AS h FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM d WHERE (h BETWEEN 1000 AND 1999) OR lang = 'zh'
        GROUP BY lang""")),

    // ---- CONCURRENT writers (r13 — the optimistic-concurrency law):
    // two appends race into the same table from parallel threads; the
    // atomic version rename makes the collision loud, and the blind-
    // append retry re-resolves and lands the loser at the next
    // version — never a lost add (TxLog.commitVersionWithRetry;
    // LakeSourceSpec pins append-vs-append, LakeMaintenanceSpec
    // append-vs-compact). The gated read aggregates the union of
    // both changesets plus the bootstrap — a lost or doubled commit
    // shifts every count.
    "q249_lake_concurrent_append" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakecc_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val boot = d.where(col("doc_id") < 256)
          .as[(Long, Long, String)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("doc_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("n_chars",
              boot.map(_._2)),
            graft.operators.ParquetWrite.StrCol("lang",
              boot.map(_._3))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration._
          import scala.concurrent.ExecutionContext.Implicits.global
          def append(parity: Int): Unit =
            d.where(col("doc_id") >= 256 &&
                col("doc_id") % 2 === parity)
              .coalesce(1)
              .write.format("graft-lake").option("path", base)
              .mode("append").save()
          val f0 = Future(append(0))
          val f1 = Future(append(1))
          Await.result(f0, 300.seconds)
          Await.result(f1, 300.seconds)
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang""")),

    // ---- Aggregate PUSHDOWN from log metadata (r12 — the lakehouse
    // analog of Parquet's footer-only count): an unfiltered
    // COUNT(*)/MIN/MAX(statsCol) over a graft-lake table is answered
    // from the resolved snapshot's adds — writer-measured row counts
    // and key windows — in ONE metadata partition, zero data files
    // opened (LakeSourceSpec pins the plan shape, the filtered/
    // non-stats fallbacks to the row path, and the statless-add
    // decline). The oracle replays the same aggregates from the
    // source table; a log whose sizes or windows lied anywhere in the
    // write/compact/merge paths cannot match.
    "q243_lake_agg_pushdown" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakeagg_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val adds = docs(s, dir)
          .select((col("doc_id") / 512).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("lang"))
          .as[(Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rs = it.toArray.sortBy(_._2)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rs.map(_._2)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rs.map(_._3)),
              graft.operators.ParquetWrite.StrCol("lang",
                rs.map(_._4))))
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            (g, s"""{"add":{"path":"$p","size":${rs.length}""" +
              s""","min_key":${rs.head._2},"max_key":${rs.last._2}}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(Long, Long, Long)].toDF("n", "min_id", "max_id")
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          // exercise the stats paths maintenance writes too: compact
          // then merge — the pushed answer must survive both
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 4096): Unit
          val mx = docs(s, dir).agg(max(col("doc_id"))).head().getLong(0)
          graft.operators.LakeMaintenance.merge(s, base,
            Seq((mx + 100L, Array[Any](
              java.lang.Long.valueOf(mx + 100L),
              java.lang.Long.valueOf(7L), "zz"))), "doc_id"): Unit
          s.read.format("graft-lake").option("path", base).load()
            .agg(count(lit(1)).as("n"),
              min(col("doc_id")).as("min_id"),
              max(col("doc_id")).as("max_id"))
        }
      },
      Some("""WITH d AS (SELECT doc_id FROM documents
          UNION ALL SELECT max(doc_id) + 100 FROM documents)
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(min(doc_id) AS BIGINT) AS min_id,
          CAST(max(doc_id) AS BIGINT) AS max_id
        FROM d""")),

    // ---- Z-ORDER clustering rewrite (r12 — Delta/Iceberg's
    // multi-column OPTIMIZE): the table bootstraps key-sorted by
    // doc_id (so the scatter column h's per-file windows span the
    // whole domain), then rewrites clustered by the bit-interleaved
    // (doc_id, h) Z-value — ONE commit, remove(all)+add(new, measured
    // stats, dataChange=false). The gated read filters an h-WINDOW
    // and aggregates per lang: after the rewrite that window touches
    // a bounded fraction of row groups (LakeMaintenanceSpec pins the
    // scan-rows drop from whole-table to Z-local), and the content
    // must replay relationally — a rewrite that drops/duplicates a
    // row or mis-clusters in a way that breaks residual filters
    // cannot match the oracle.
    "q242_lake_zorder" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakez_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val adds = docs(s, dir)
          .select((col("doc_id") / 256).cast("long").as("g"),
            col("doc_id"),
            ((col("doc_id") * 797) % 4096).as("h"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .as[(Long, Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rs = it.toArray.sortBy(_._2)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rs.map(_._2)),
              graft.operators.ParquetWrite.LongCol("h", rs.map(_._3)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rs.map(_._4)),
              graft.operators.ParquetWrite.StrCol("lang",
                rs.map(_._5))), rowsPerGroup = 128)
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            (g, s"""{"add":{"path":"$p","size":${rs.length}""" +
              s""","min_key":${rs.head._2},"max_key":${rs.last._2}}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          graft.operators.LakeMaintenance.zorder(s, base,
            Seq("doc_id", "h"), targetRows = 1024,
            rowsPerGroup = 128): Unit
          s.read.format("graft-lake").option("path", base).load()
            .where(col("h").between(1000L, 1999L))
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""WITH d AS (SELECT lang, n_chars,
            (doc_id * 797) % 4096 AS h FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM d WHERE h BETWEEN 1000 AND 1999 GROUP BY lang""")),

    // ---- SCHEMA EVOLUTION: ADD COLUMN through the log's metaData
    // action (r12 — the Delta mechanism; before this the first live
    // file's footer was the schema authority and a table could never
    // grow a column). The bootstrap half is written with THREE
    // columns; `LakeSource.addColumn` commits a metaData action
    // extending the schema with a nullable double; the second half
    // appends THROUGH the connector carrying the new column. The
    // gated read sees old rows NULL-FILLED and new rows populated —
    // the oracle replays the same split relationally; a reader that
    // fails on the missing chunk, fills the wrong default, or lets
    // the old footer win the schema cannot match.
    "q241_lake_add_column" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakeevo_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        val boot = d.where(col("doc_id") < 256)
          .as[(Long, Long, String)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(String, Long, Long, Long)]
            .toDF("lang", "n", "n_scored", "sum_q")
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("doc_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("n_chars",
              boot.map(_._2)),
            graft.operators.ParquetWrite.StrCol("lang",
              boot.map(_._3))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          graft.sources.LakeSource.addColumn(base, "score", "double"): Unit
          d.where(col("doc_id") >= 256)
            .select(col("doc_id"), col("n_chars"), col("lang"),
              (col("doc_id") * 0.25 - 3.0).as("score"))
            .repartition(2)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              count(col("score")).as("n_scored"),
              sum(floor(col("score") * 4.0).cast("long")).as("sum_q"))
        }
      },
      Some("""WITH d AS (SELECT lang,
            CASE WHEN doc_id < 256 THEN NULL
                 ELSE doc_id * 0.25 - 3.0 END AS score
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(count(score) AS BIGINT) AS n_scored,
          CAST(sum(floor(score * 4)) AS BIGINT) AS sum_q
        FROM d GROUP BY lang""")),

    // ---- CDC-grade streaming tail across MAINTENANCE (r12 — fixing
    // the r11-documented wart: the change feed re-emitted compaction
    // rewrites). Compaction adds now carry Delta's dataChange=false
    // and the micro-batch source SKIPS them, so the drained feed is
    // the TRUE change stream: v0's files once, the compaction commit
    // not at all, a post-compaction append once. The gate drains
    // through a foreachBatch accumulator INTO a parquet side table
    // across three phases (drain / compact+drain / append+drain) and
    // aggregates the union — one re-emitted row shifts a count.
    "q240_lake_cdc_tail" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakecdc_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        // bootstrap: EVEN ids as small per-bucket files (the
        // compaction fodder), committed at v0
        val adds = d.where(col("doc_id") % 2 === 0)
          .withColumn("g", (col("doc_id") / 128).cast("long"))
          .as[(Long, Long, String, Long)]
          .groupByKey(_._4)
          .mapGroups { (g, it) =>
            val rs = it.toArray.sortBy(_._1)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rs.map(_._1)),
              graft.operators.ParquetWrite.LongCol("n_chars",
                rs.map(_._2)),
              graft.operators.ParquetWrite.StrCol("lang",
                rs.map(_._3))))
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            (g, s"""{"add":{"path":"$p","size":${rs.length}""" +
              s""","min_key":${rs.head._1},"max_key":${rs.last._1}}}""")
          }.collect().toSeq.sortBy(_._1)
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          graft.operators.TxLog.commitVersion(s"$base/log", 0L,
            adds.map(_._2))
          val sink = s"$base/feed"
          def drain(): Unit = {
            val q = s.readStream.format("graft-lake")
              .option("path", base).load()
              .writeStream
              .trigger(org.apache.spark.sql.streaming.Trigger
                .AvailableNow())
              .option("checkpointLocation", s"$base/ck")
              .foreachBatch { (b: org.apache.spark.sql.DataFrame,
                  id: Long) =>
                b.write.mode("append").parquet(sink)
              }
              .start()
            q.awaitTermination()
          }
          drain() // phase 1: the bootstrap files, once
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 1 << 20): Unit
          drain() // phase 2: the rewrite must NOT re-emit
          d.where(col("doc_id") % 2 === 1).repartition(2)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          drain() // phase 3: the append, once
          s.read.parquet(sink)
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang""")),

    // ---- Lake maintenance over the WIDENED type surface (r12 —
    // closing the loop the q233 types opened: OPTIMIZE/compaction now
    // rewrites `array<float>` + double columns through
    // readFileColumns, not just long/string). The embeddings table
    // lands as one file per 64 vec_ids through the CONNECTOR write
    // path, gets compacted into key-ordered bins, and the read-back
    // (quantized element sums, the q233 gate shape) must be
    // bit-invariant — a compactor that drops a null element, reorders
    // a list or round-trips a float through double arithmetic shifts
    // a sum. LakeMaintenanceSpec pins the file-count drop.
    "q239_lake_compact_embeddings" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakece_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val e = Tables.embeddings(s, dir).select(col("vec_id"),
          col("label").cast("long").as("label"),
          col("embedding"),
          (col("vec_id") * 0.25 - 3.0).as("score"))
        // bootstrap: vec_id < 32 in one own-codec file + v0 commit
        val boot = e.where(col("vec_id") < 32)
          .as[(Long, Long, Array[Float], Double)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(Long, Long, Long, Long, Long)]
            .toDF("label", "n", "n_elems", "sum_q", "sum_sq")
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("vec_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("label",
              boot.map(_._2)),
            graft.operators.ParquetWrite.FloatListCol("embedding",
              boot.map(_._3.map(java.lang.Float.valueOf))),
            graft.operators.ParquetWrite.DoubleCol("score",
              boot.map(_._4))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          // the rest in one-file-per-64-ids appends (small files —
          // the compaction fixture), through the connector
          e.where(col("vec_id") >= 32)
            .withColumn("b", (col("vec_id") / 64).cast("long"))
            .repartition(col("b")).drop("b")
            .sortWithinPartitions(col("vec_id"))
            .write.format("graft-lake").option("path", base)
            .option("statsCol", "vec_id").mode("append").save()
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 1 << 20): Unit
          s.read.format("graft-lake").option("path", base)
            .option("statsCol", "vec_id").load()
            .select(col("label"),
              aggregate(transform(col("embedding"), x =>
                  floor(x.cast("double") * 1024.0).cast("long")),
                lit(0L), (acc, x) => acc + x).as("q"),
              size(col("embedding")).as("ne"),
              floor(col("score") * 4.0).cast("long").as("sq"))
            .groupBy(col("label"))
            .agg(count(lit(1)).as("n"),
              sum(col("ne")).cast("long").as("n_elems"),
              sum(col("q")).as("sum_q"),
              sum(col("sq")).as("sum_sq"))
        }
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding,
            vec_id * 0.25 - 3.0 AS score FROM embeddings)
        SELECT CAST(label AS BIGINT) AS label,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(len(embedding)) AS BIGINT) AS n_elems,
          CAST(sum(list_sum(list_transform(embedding,
            x -> floor(CAST(x AS DOUBLE) * 1024)))) AS BIGINT) AS sum_q,
          CAST(sum(floor(score * 4)) AS BIGINT) AS sum_sq
        FROM e GROUP BY label""")),

    // ---- graft-lake PARTITION COLUMNS (r12 — the r11 verdict's #6
    // ask): `partitionBy=source` on the connector write makes each
    // task write one file PER source value it saw, and the add
    // carries Delta-style `"part":"srcN"` — so a partition predicate
    // prunes files from log METADATA alone, before any stats or
    // footer I/O. The bootstrap file carries no part value and must
    // always scan (conservative law, LakeSourceSpec pins the planned
    // counts); the gated read filters one source and aggregates per
    // lang — the oracle replays it from the source table.
    "q237_lake_partition" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakep_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"),
          col("lang"), col("source"))
        // bootstrap: doc_id < 64 in ONE own-codec file, no part value
        val boot = d.where(col("doc_id") < 64)
          .as[(Long, Long, String, String)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("doc_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("n_chars",
              boot.map(_._2)),
            graft.operators.ParquetWrite.StrCol("lang",
              boot.map(_._3)),
            graft.operators.ParquetWrite.StrCol("source",
              boot.map(_._4))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          d.where(col("doc_id") >= 64)
            .repartition(4, col("source"))
            .write.format("graft-lake").option("path", base)
            .option("partitionBy", "source").mode("append").save()
          s.read.format("graft-lake").option("path", base)
            .option("partitionBy", "source").load()
            .where(col("source") === "src3")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE source = 'src3' GROUP BY lang""")),

    // ---- graft-lake STRING STATS (r12 — the r11 verdict's #7 ask:
    // adds carried only long min_key/max_key; real pruning needs
    // string windows). `strStatsCol=lang` makes each written file's
    // add carry unsigned-lexicographic `min_skey`/`max_skey` over
    // lang; the append is repartitioned BY lang so files get tight
    // windows, and the gated read's RANGE predicate ('es' ≤ lang <
    // 'fr') prunes files from log metadata. The statless bootstrap
    // file always scans; results replay relationally (DuckDB's
    // default binary collation = the same byte order).
    "q238_lake_string_stats" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakess_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"),
          col("lang"), col("source"))
        val boot = d.where(col("doc_id") < 64)
          .as[(Long, Long, String, String)].collect().sortBy(_._1)
        if (boot.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("source", "n", "sum_chars")
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          val bytes = graft.operators.ParquetWrite.writeFile(Seq(
            graft.operators.ParquetWrite.LongCol("doc_id",
              boot.map(_._1)),
            graft.operators.ParquetWrite.LongCol("n_chars",
              boot.map(_._2)),
            graft.operators.ParquetWrite.StrCol("lang",
              boot.map(_._3)),
            graft.operators.ParquetWrite.StrCol("source",
              boot.map(_._4))))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"$base/data/boot.parquet"), bytes): Unit
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
            s"""{"add":{"path":"$base/data/boot.parquet",""" +
              s""""size":${boot.length},"min_key":${boot.head._1},""" +
              s""""max_key":${boot.last._1}}}"""))
          d.where(col("doc_id") >= 64)
            .repartition(8, col("lang"))
            .write.format("graft-lake").option("path", base)
            .option("strStatsCol", "lang").mode("append").save()
          s.read.format("graft-lake").option("path", base)
            .option("strStatsCol", "lang").load()
            .where(col("lang") >= "es" && col("lang") < "fr")
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE lang >= 'es' AND lang < 'fr'
        GROUP BY source""")),

    // ---- graft-lake STREAMING SINK (r12 — the r11 verdict's #5 ask:
    // the connector read streams and batch-writes; now
    // `writeStream.format("graft-lake")` commits ONE log version per
    // epoch with a Delta-style txn fence). The fixture is a
    // lake-to-lake pipeline: the SOURCE table's odd docs land in four
    // separate commit versions, `versionsPerTrigger=1` forces four
    // micro-batches, and each epoch commits exactly one version into
    // the SINK table (bootstrapped with the even half). The gated
    // read-back over the sink must equal the full documents table —
    // a dropped epoch, a double-committed replay, or a fence mix-up
    // shifts a count. LakeSinkSpec pins the exactly-once laws
    // (replayed-epoch no-op, restart idempotence, fence scoping).
    "q236_lake_stream_sink" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakes_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        val src = s"$base/src"; val dst = s"$base/dst"
        new java.io.File(s"$src/data").mkdirs()
        new java.io.File(s"$dst/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        // writes one table's files under root/data, one file per
        // (bucket of 256 ids) group, returning the add lines
        def build(root: String, rows: org.apache.spark.sql.DataFrame)
            : Seq[(Long, String)] =
          rows.withColumn("g", (col("doc_id") / 256).cast("long"))
            .as[(Long, Long, String, Long)]
            .groupByKey(_._4)
            .mapGroups { (g, it) =>
              val rs = it.toArray.sortBy(_._1)
              val bytes = graft.operators.ParquetWrite.writeFile(Seq(
                graft.operators.ParquetWrite.LongCol("doc_id",
                  rs.map(_._1)),
                graft.operators.ParquetWrite.OptLongCol("n_chars",
                  rs.map(r => if (r._1 % 9 == 0) null
                    else java.lang.Long.valueOf(r._2))),
                graft.operators.ParquetWrite.StrCol("lang",
                  rs.map(_._3))))
              val p = s"$root/data/part-$g.parquet"
              java.nio.file.Files.write(
                java.nio.file.Paths.get(p), bytes): Unit
              val st = graft.operators.ParquetFile.parse(g, bytes)
                .filter(r => r.valid && r.col_path == "doc_id" &&
                  r.has_stats)
              (g, s"""{"add":{"path":"$p","size":${rs.length}""" +
                s""","min_key":${st.map(_.min_long).min}""" +
                s""","max_key":${st.map(_.max_long).max}}}""")
            }.collect().toSeq.sortBy(_._1)
        val srcAdds = build(src, d.where(col("doc_id") % 2 === 1))
        val dstAdds = build(dst, d.where(col("doc_id") % 2 === 0))
        if (srcAdds.isEmpty || dstAdds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          // SOURCE: a FIXED number of commit versions (4) regardless
          // of SF — each holds 1/4 of the files, so the per-epoch
          // WORK grows with data while the EPOCH COUNT stays
          // constant. (The first r12 sweep committed one version per
          // file: at sf5 that meant ~96 epochs × fixed micro-batch
          // overhead = 262 s of pure harness cost — an epoch ladder,
          // not a data ladder. Epochs are an operational cadence, not
          // a data axis; a real ingest commits batches, not files.)
          val nVersions = math.min(4, srcAdds.size)
          srcAdds.zipWithIndex
            .groupBy(_._2 % nVersions).toSeq.sortBy(_._1)
            .foreach { case (v, grp) =>
              graft.operators.TxLog.commitVersion(s"$src/log",
                v.toLong, grp.map(_._1._2))
            }
          // SINK bootstrap: one commit with the even half
          graft.operators.TxLog.commitVersion(s"$dst/log", 0L,
            dstAdds.map(_._2))
          val q = s.readStream.format("graft-lake")
            .option("path", src).option("versionsPerTrigger", 1)
            .load()
            .writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger
              .AvailableNow())
            .option("checkpointLocation", s"$base/ck")
            .format("graft-lake").option("path", dst)
            .start()
          q.awaitTermination()
          s.read.format("graft-lake").option("path", dst).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""WITH d AS (SELECT lang,
            CASE WHEN doc_id % 9 = 0 THEN NULL ELSE n_chars END AS nc
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(nc) AS BIGINT) AS sum_chars
        FROM d GROUP BY lang""")),

    // ---- Avro DEEP writer (r12 — the r11 verdict's #4 ask: the
    // writer was flat/null-deflate-only while the reader decoded
    // nested + snappy). OUR encoder now serializes the q221 record
    // tree — nested record, array<long> blocks, the nullable
    // array<string> union — under snappy (even groups, OUR raw-block
    // compressor + the spec's CRC32-of-uncompressed suffix) and
    // deflate (odd groups), and the gate is the strongest
    // differential: avro-java's DataFileReader consumes our bytes on
    // executors and the SAME q221 oracle replays every aggregate.
    // One wrong union branch, array block count, varint or snappy
    // element shifts a sum or kills the file.
    "q235_avro_deep_write" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = docs(s, dir)
          .select((col("doc_id") / 64).cast("long").as("g"),
            col("doc_id")).as[(Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            (g, Avro.ownOcfDeepGroupPayload(g,
              it.map(_._2).toArray.sorted))
          }
        Avro.decodeDeepWithAvroJava(media).toDF()
      },
      Some("""WITH p AS (SELECT doc_id // 64 AS media_id, doc_id AS d,
              CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE (7 * doc_id) % 50 END AS score,
              CASE WHEN doc_id % 4 = 0 THEN 0
                ELSE 3 END AS ntoks,
              CASE WHEN doc_id % 4 = 0 THEN 0
                ELSE doc_id % 10 + doc_id % 7 + doc_id % 3 END AS toksum,
              CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END AS tagnull
            FROM documents)
        SELECT media_id,
          CAST((count(*) + 1) // 2 AS BIGINT) AS n_blocks,
          CAST(count(*) AS BIGINT) AS n_records,
          CAST(sum(d) + coalesce(sum(score), 0) + sum(toksum)
            AS BIGINT) AS sum_long,
          CAST(count(*) - count(score) + sum(tagnull) AS BIGINT)
            AS n_nulls,
          CAST(sum(ntoks) + sum(1 - tagnull) AS BIGINT) AS n_items,
          CAST(sum(2 + 2 * (1 - tagnull)) AS BIGINT) AS sum_slen,
          CAST(sum(163 + d % 5 + (1 - tagnull) * (164 + d % 2))
            AS BIGINT) AS sum_sbytes,
          true AS valid
        FROM p GROUP BY media_id""")),

    // ---- Parquet writer PAGE INDEX (r11 — the q209 symmetry: the
    // engine has read OffsetIndex/ColumnIndex since r10; now it
    // WRITES them). Files carry ONE row group split into 128-row V1
    // pages; per-page min/max/null-count land in a ColumnIndex and
    // page locations in an OffsetIndex (full Thrift compact encode,
    // written between the data and the footer, chunk fields 4–7
    // pointing at them). The gate reads the files back through
    // Spark's reader under a selective predicate — with one row
    // group, only PAGE-level skipping can cut below the file grain,
    // and ParquetWriteSpec proves it does (scan metric ≤ 2 of 16
    // pages; parquet-mr's own index reader and our q209 decoder both
    // verify the structures field by field).
    "q231_parquet_page_write" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_pqpi_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(base).mkdirs()
        docs(s, dir).select((col("doc_id") / 2048).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("source"))
          .as[(Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._2)
            (g, graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._2)),
              graft.operators.ParquetWrite.OptLongCol("n_chars",
                rows.map(r => if (r._2 % 9 == 0) null
                  else java.lang.Long.valueOf(r._3))),
              graft.operators.ParquetWrite.StrCol("source",
                rows.map(_._4))),
              rowsPerGroup = Int.MaxValue, pageRows = 128))
          }
          .foreachPartition { it: Iterator[(Long, Array[Byte])] =>
            it.foreach { case (g, bytes) =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$base/part-$g.parquet"),
                bytes): Unit
            }
          }
        val wrote = Option(new java.io.File(base).listFiles())
          .exists(_.exists(_.getName.endsWith(".parquet")))
        val read =
          if (wrote) s.read.parquet(base)
          else Seq.empty[(Long, java.lang.Long, String)]
            .toDF("doc_id", "n_chars", "source")
        read.where(col("doc_id").between(500L, 900L))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id")).as("sum_doc"),
            sum(col("n_chars")).as("sum_chars"),
            sum(length(col("source"))).as("sum_srclen"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(doc_id) AS BIGINT) AS sum_doc,
          CAST(sum(CASE WHEN doc_id % 9 = 0 THEN NULL
            ELSE n_chars END) AS BIGINT) AS sum_chars,
          CAST(sum(len(source)) AS BIGINT) AS sum_srclen
        FROM documents WHERE doc_id BETWEEN 500 AND 900""")),

    // ---- Lakehouse COMPACTION / OPTIMIZE (r11 — the maintenance op
    // that completes the table lifecycle: streaming appends litter a
    // table with small files; OPTIMIZE bin-packs them into rewritten
    // files, clustering bins by key range so file pruning stays
    // selective, and commits remove+add in ONE log version; old files
    // stay on disk for time travel, deletion is VACUUM's job). The
    // fixture writes the documents table as 64-doc files (the
    // small-file litter), compacts to 1024-row targets — each bin is
    // rewritten ON AN EXECUTOR through our page decoder and re-encoded
    // by our writer, the new adds carrying stats from the REWRITTEN
    // file's own footer — then reads the snapshot back through the
    // connector. The oracle replays the full table: compaction must
    // change the FILES and nothing else. LakeMaintenanceSpec pins the
    // file-count drop, pre-compaction time travel, pruning
    // selectivity, and idempotence.
    "q228_lake_compact" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakeo_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val adds = docs(s, dir)
          .select((col("doc_id") / 64).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("lang"))
          .as[(Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._2)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._2)),
              graft.operators.ParquetWrite.OptLongCol("n_chars",
                rows.map(r => if (r._2 % 9 == 0) null
                  else java.lang.Long.valueOf(r._3))),
              graft.operators.ParquetWrite.StrCol("lang",
                rows.map(_._4))))
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            val st = graft.operators.ParquetFile.parse(g, bytes)
              .filter(r => r.valid && r.col_path == "doc_id" &&
                r.has_stats)
            (p, st.map(_.min_long).min, st.map(_.max_long).max,
              rows.length.toLong)
          }
          .toDF("path", "min_key", "max_key", "size")
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          adds.select(lit(0L).as("version"), to_json(struct(
              struct(col("path"), col("min_key"), col("max_key"),
                col("size")).as("add"))).as("value"))
            .coalesce(1)
            .write.partitionBy("version").text(s"$base/log")
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 1024): Unit
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""WITH d AS (SELECT lang,
            CASE WHEN doc_id % 9 = 0 THEN NULL ELSE n_chars END AS nc
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(nc) AS BIGINT) AS sum_chars
        FROM d GROUP BY lang""")),

    // ---- Lakehouse MERGE / upsert (r11 — the CDC workhorse: a
    // bounded changeset against a huge table). Matched keys REPLACE
    // their stored rows (candidate files pre-pruned by log stats,
    // rewritten map-side through our codecs with the changeset
    // riding as a broadcast map); unmatched keys INSERT as one
    // key-sorted file; ONE commit carries remove+add. The changeset
    // updates every doc_id%10==0 row (n_chars := doc_id, lang :=
    // 'xx') and inserts 100 brand-new keys past max(doc_id) (lang
    // 'zz') — the oracle replays both arms over the source table; a
    // merge that misses a match, rewrites a wrong row, or drops an
    // insert cannot group-by-lang to the same sums.
    "q230_lake_merge" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakem_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val adds = docs(s, dir)
          .select((col("doc_id") / 1024).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("lang"))
          .as[(Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._2)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._2)),
              graft.operators.ParquetWrite.OptLongCol("n_chars",
                rows.map(r => if (r._2 % 9 == 0) null
                  else java.lang.Long.valueOf(r._3))),
              graft.operators.ParquetWrite.StrCol("lang",
                rows.map(_._4))))
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            val st = graft.operators.ParquetFile.parse(g, bytes)
              .filter(r => r.valid && r.col_path == "doc_id" &&
                r.has_stats)
            (p, st.map(_.min_long).min, st.map(_.max_long).max,
              rows.length.toLong)
          }
          .toDF("path", "min_key", "max_key", "size")
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          adds.select(lit(0L).as("version"), to_json(struct(
              struct(col("path"), col("min_key"), col("max_key"),
                col("size")).as("add"))).as("value"))
            .coalesce(1)
            .write.partitionBy("version").text(s"$base/log")
          // the CDC changeset: bounded driver-side collect is the
          // operator's documented broadcast contract
          val upd = docs(s, dir).where(col("doc_id") % 10 === 0)
            .select(col("doc_id")).as[Long].collect().sorted
            .map(k => (k, Array[Any](java.lang.Long.valueOf(k),
              java.lang.Long.valueOf(k), "xx")))
          val mx = docs(s, dir).agg(max(col("doc_id"))).head().getLong(0)
          val ins = (0 until 100).map { i =>
            val k = mx + 1 + i
            (k, Array[Any](java.lang.Long.valueOf(k),
              java.lang.Long.valueOf(k * 2), "zz"))
          }
          graft.operators.LakeMaintenance.merge(s, base,
            (upd ++ ins).toSeq, "doc_id"): Unit
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
          d AS (SELECT
              CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang,
              CASE WHEN doc_id % 10 = 0 THEN doc_id
                   WHEN doc_id % 9 = 0 THEN NULL
                   ELSE n_chars END AS nc
            FROM documents
            UNION ALL
            SELECT 'zz', (m + 1 + i) * 2
            FROM mx, LATERAL (SELECT unnest(range(100)) AS i) ii)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(nc) AS BIGINT) AS sum_chars
        FROM d GROUP BY lang""")),

    // ---- MERGE with the DELETE arm (r12 — the r11 verdict's #3 ask:
    // real CDC feeds carry deletes). One changeset updates (%10),
    // inserts (50 fresh keys) AND deletes — every doc_id < 256 (so
    // the first bootstrap file dies ENTIRELY and commits as a
    // remove-only tombstone, never an empty file) plus every
    // doc_id%7==3 (scattered single-row deletes through surviving
    // files). The read-back per-lang aggregate over the merged table
    // replays in DuckDB from the source rows with the same
    // update/insert/delete semantics applied relationally — a row
    // that survives a delete it shouldn't (or dies when it
    // shouldn't) shifts a count. LakeMaintenanceSpec pins the
    // remove-only commit shape and the disjointness guard.
    "q234_lake_merge_delete" -> Query(
      (s, dir) => {
        import s.implicits._
        val lines = lakemdTemplate(s, dir)
        if (lines.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          // per-RUN table: a UUID child under a stable parent, with
          // an AGE-BASED sweep of finished siblings (review r15 pass
          // 2: a bare stable path wiped at entry deleted a CONCURRENT
          // run's live table mid-merge; a bare UUID path leaked
          // forever — the sweep keeps recent runs alive and bounds
          // the leak). v0 references the shared immutable template
          // files; the merge commits its rewrites under this run's
          // own data dir.
          val parent = s"${System.getProperty("java.io.tmpdir")}/graft_lakemd_" +
            s.sparkContext.applicationId + "_" +
            java.lang.Integer.toHexString(dir.hashCode)
          def del(f: java.io.File): Unit = {
            if (f.isDirectory)
              Option(f.listFiles()).toSeq.flatten.foreach(del)
            f.delete(): Unit
          }
          new java.io.File(parent).mkdirs()
          Option(new java.io.File(parent).listFiles()).toSeq.flatten
            .filter(f => f.isDirectory &&
              System.currentTimeMillis - f.lastModified > 30L * 60000L)
            .foreach(del)
          val base = s"$parent/run-" +
            java.util.UUID.randomUUID().toString.take(8)
          new java.io.File(s"$base/data").mkdirs()
          graft.operators.TxLog.commitVersion(s"$base/log", 0L, lines)
          // bounded CDC changeset (the documented broadcast contract)
          val dels = docs(s, dir)
            .where(col("doc_id") < 256 || col("doc_id") % 7 === 3)
            .select(col("doc_id")).as[Long].collect().sorted.toSeq
          val delSet = dels.toSet
          val upd = docs(s, dir).where(col("doc_id") % 10 === 0)
            .select(col("doc_id")).as[Long].collect().sorted
            .filterNot(delSet) // update/delete keys must be disjoint
            .map(k => (k, Array[Any](java.lang.Long.valueOf(k),
              java.lang.Long.valueOf(k), "xx")))
          val mx = docs(s, dir).agg(max(col("doc_id"))).head().getLong(0)
          val ins = (0 until 50).map { i =>
            val k = mx + 1 + i
            (k, Array[Any](java.lang.Long.valueOf(k),
              java.lang.Long.valueOf(k * 2), "zz"))
          }
          graft.operators.LakeMaintenance.merge(s, base,
            (upd ++ ins).toSeq, "doc_id", deletes = dels): Unit
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
          d AS (SELECT
              CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang,
              CASE WHEN doc_id % 10 = 0 THEN doc_id
                   WHEN doc_id % 9 = 0 THEN NULL
                   ELSE n_chars END AS nc
            FROM documents
            WHERE NOT (doc_id < 256 OR doc_id % 7 = 3)
            UNION ALL
            SELECT 'zz', (m + 1 + i) * 2
            FROM mx, LATERAL (SELECT unnest(range(50)) AS i) ii)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(nc) AS BIGINT) AS sum_chars
        FROM d GROUP BY lang"""),
      prepare = Some((s, d) => { lakemdTemplate(s, d): Unit })),

    // ---- Lakehouse VACUUM (r11 — compaction's companion: removes
    // leave tombstoned files ON DISK for time travel; VACUUM reclaims
    // every data file not referenced by any snapshot inside the
    // retention window, and sweeps crashed-writer ORPHANS the log
    // never learned about). The fixture litters a table (64-doc
    // files + one orphan), compacts, then vacuums with retention 0 —
    // only the latest snapshot's files survive on disk, and the
    // connector read over what remains must still replay the FULL
    // table (a vacuum that deletes a live file cannot match).
    // LakeMaintenanceSpec pins the disk-level deletions, orphan
    // sweep, retention-window protection and idempotence.
    "q229_lake_vacuum" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakev_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val adds = docs(s, dir)
          .select((col("doc_id") / 64).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("lang"))
          .as[(Long, Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._2)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._2)),
              graft.operators.ParquetWrite.OptLongCol("n_chars",
                rows.map(r => if (r._2 % 9 == 0) null
                  else java.lang.Long.valueOf(r._3))),
              graft.operators.ParquetWrite.StrCol("lang",
                rows.map(_._4))))
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            val st = graft.operators.ParquetFile.parse(g, bytes)
              .filter(r => r.valid && r.col_path == "doc_id" &&
                r.has_stats)
            (p, st.map(_.min_long).min, st.map(_.max_long).max,
              rows.length.toLong)
          }
          .toDF("path", "min_key", "max_key", "size")
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"))
        else {
          adds.select(lit(0L).as("version"), to_json(struct(
              struct(col("path"), col("min_key"), col("max_key"),
                col("size")).as("add"))).as("value"))
            .coalesce(1)
            .write.partitionBy("version").text(s"$base/log")
          // a crashed writer's orphan — vacuum must sweep it
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$base/data/orphan.parquet"),
            Array[Byte](1, 2, 3)): Unit
          graft.operators.LakeMaintenance.compact(s, base,
            targetRows = 1024): Unit
          // graceMs=0: the orphan was synthesized an instant ago and
          // no writer is concurrently in flight in this harness
          graft.operators.LakeMaintenance.vacuum(base,
            retainVersions = 0, graceMs = 0L): Unit
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"))
        }
      },
      Some("""WITH d AS (SELECT lang,
            CASE WHEN doc_id % 9 = 0 THEN NULL ELSE n_chars END AS nc
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(nc) AS BIGINT) AS sum_chars
        FROM d GROUP BY lang""")),

    // ---- graft-lake DSv2 connector (r11 — the r10 verdict's #8 ask:
    // the lakehouse family ran as hand-composed functions over
    // binaryFile rows; here it is a real `format("graft-lake")`
    // under Catalyst). The TABLE is the full own-write/own-read loop:
    // data files from OUR writer (multi-row-group, OPTIONAL + dict
    // columns, q220's surface), a transaction log whose adds carry
    // per-file key stats measured by OUR footer codec, a TxLog
    // CHECKPOINT + `_last_checkpoint` pointer (the connector resolves
    // through the pointer fast path). The query projects three of four
    // columns (column pruning), filters a doc_id range (file pruning
    // from log stats + row-group pruning from footer stats) and
    // aggregates per lang (dictionary decode) — the oracle replays it
    // all from the source table. LakeSourceSpec pins the connector
    // LAWS (pruning counts, time travel, runtime filtering).
    "q222_lake_connector" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakec_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        // write files on executors; return (path, min, max) for the log
        val adds = docs(s, dir)
          .select((col("doc_id") / 1024).cast("long").as("g"),
            col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            col("source"), col("lang"))
          .as[(Long, Long, Long, String, String)]
          .groupByKey(_._1)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._2)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._2)),
              graft.operators.ParquetWrite.OptLongCol("n_chars",
                rows.map(r => if (r._2 % 9 == 0) null
                  else java.lang.Long.valueOf(r._3))),
              graft.operators.ParquetWrite.OptStrCol("source",
                rows.map(r => if (r._2 % 5 == 0) null else r._4)),
              graft.operators.ParquetWrite.StrCol("lang",
                rows.map(_._5))),
              rowsPerGroup = 128)
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            // per-file key stats from OUR footer codec (not trusted
            // from the build-side sort): the log is the reader's only
            // source of file-level pruning truth
            val st = graft.operators.ParquetFile.parse(g, bytes)
              .filter(r => r.valid && r.col_path == "doc_id" &&
                r.has_stats)
            (p, st.map(_.min_long).min, st.map(_.max_long).max,
              rows.length.toLong)
          }
          .toDF("path", "min_key", "max_key", "size")
        if (adds.isEmpty) // empty corpus: no table to register
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"),
              count(lit(1)).as("n_src"))
        else {
          adds.select(lit(0L).as("version"), to_json(struct(
              struct(col("path"), col("min_key"), col("max_key"),
                col("size")).as("add"))).as("value"))
            .coalesce(1)
            .write.partitionBy("version").text(s"$base/log")
          // checkpoint + pointer: the connector resolves through the
          // fast path, proving stats survive checkpointing
          TxLog.writeCheckpoint(s, s"$base/log", s"$base/ckpt", 0L)
          s.read.format("graft-lake").option("path", base).load()
            .where(col("doc_id").between(300L, 1700L))
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"),
              count(col("source")).as("n_src"))
        }
      },
      Some("""WITH d AS (SELECT doc_id, lang,
            CASE WHEN doc_id % 9 = 0 THEN NULL ELSE n_chars END AS nc,
            CASE WHEN doc_id % 5 = 0 THEN NULL ELSE source END AS src
          FROM documents WHERE doc_id BETWEEN 300 AND 1700)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(nc) AS BIGINT) AS sum_chars,
          CAST(count(src) AS BIGINT) AS n_src
        FROM d GROUP BY lang""")),

    // ---- graft-lake WRITE path (r11 — the connector loop closes:
    // `df.write.format("graft-lake").mode("append")`). The table
    // bootstraps from the EVEN doc_ids (our writer's files + a
    // version-0 log whose adds carry footer-codec stats); the ODD
    // half is then appended THROUGH the connector — executors write
    // one own-codec file per partition, the driver commits ONE new
    // log version with the writers' measured key stats. The read
    // (also through the connector) must see the union, with nulls,
    // dictionary strings and per-lang grouping intact — and the
    // appended files participate in file pruning like bootstrapped
    // ones (LakeSourceSpec pins that, plus checkpoint maintenance at
    // the 10-commit cadence and abort/mismatch safety).
    "q224_lake_append" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakew_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"),
          col("source"), col("lang"))
        val adds = d.where(col("doc_id") % 2 === 0)
          .withColumn("g", (col("doc_id") / 1024).cast("long"))
          .as[(Long, Long, String, String, Long)]
          .groupByKey(_._5)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._1)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("doc_id",
                rows.map(_._1)),
              graft.operators.ParquetWrite.OptLongCol("n_chars",
                rows.map(r => if (r._1 % 9 == 0) null
                  else java.lang.Long.valueOf(r._2))),
              graft.operators.ParquetWrite.OptStrCol("source",
                rows.map(r => if (r._1 % 5 == 0) null else r._3)),
              graft.operators.ParquetWrite.StrCol("lang",
                rows.map(_._4))),
              rowsPerGroup = 128)
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            val st = graft.operators.ParquetFile.parse(g, bytes)
              .filter(r => r.valid && r.col_path == "doc_id" &&
                r.has_stats)
            (p, st.map(_.min_long).min, st.map(_.max_long).max,
              rows.length.toLong)
          }
          .toDF("path", "min_key", "max_key", "size")
        if (adds.isEmpty)
          Seq.empty[(String, Long, Long)].toDF("lang", "n", "sum_chars")
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("sum_chars")).as("sum_chars"),
              count(lit(1)).as("n_src"))
        else {
          adds.select(lit(0L).as("version"), to_json(struct(
              struct(col("path"), col("min_key"), col("max_key"),
                col("size")).as("add"))).as("value"))
            .coalesce(1)
            .write.partitionBy("version").text(s"$base/log")
          // the ODD half goes THROUGH the connector's write path
          d.where(col("doc_id") % 2 === 1)
            .select(col("doc_id"),
              when(col("doc_id") % 9 === 0, lit(null).cast("long"))
                .otherwise(col("n_chars")).as("n_chars"),
              when(col("doc_id") % 5 === 0, lit(null).cast("string"))
                .otherwise(col("source")).as("source"),
              col("lang"))
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
          s.read.format("graft-lake").option("path", base).load()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars")).as("sum_chars"),
              count(col("source")).as("n_src"))
        }
      },
      Some("""WITH d AS (SELECT doc_id, lang,
            CASE WHEN doc_id % 9 = 0 THEN NULL ELSE n_chars END AS nc,
            CASE WHEN doc_id % 5 = 0 THEN NULL ELSE source END AS src
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(nc) AS BIGINT) AS sum_chars,
          CAST(count(src) AS BIGINT) AS n_src
        FROM d GROUP BY lang""")),

    // ---- graft-lake TYPE SURFACE widening (r12 — the r11 verdict's
    // #1 ask): the engine's flagship data — `array<float>` embeddings
    // and double scores — lives in a graft-lake table. The EVEN
    // vec_ids bootstrap as own-codec files whose list columns carry
    // rep/def levels on the wire (ParquetWrite r12); the ODD half is
    // appended THROUGH the connector (InternalRow arrays → FloatListCol
    // buffers); the read path materializes GenericArrayData rows from
    // OUR Dremel cell assembly (ParquetFile.readListCells). The gate
    // quantizes every float element (floor(e·2¹⁰), exact on the
    // mantissa) and replays per-label counts/sums in DuckDB from the
    // SOURCE table — one wrong rep level, def fate, element order or
    // float bit pattern anywhere in the loop shifts a sum.
    "q233_lake_embeddings" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakee_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        // score: exact binary arithmetic (0.25 steps) so the oracle's
        // double math replays bit-identically
        val e = Tables.embeddings(s, dir).select(col("vec_id"),
          col("label").cast("long").as("label"),
          col("embedding"),
          (col("vec_id") * 0.25 - 3.0).as("score"))
        val adds = e.where(col("vec_id") % 2 === 0)
          .withColumn("g", (col("vec_id") / 128).cast("long"))
          .as[(Long, Long, Array[Float], Double, Long)]
          .groupByKey(_._5)
          .mapGroups { (g, it) =>
            val rows = it.toArray.sortBy(_._1)
            val bytes = graft.operators.ParquetWrite.writeFile(Seq(
              graft.operators.ParquetWrite.LongCol("vec_id",
                rows.map(_._1)),
              graft.operators.ParquetWrite.LongCol("label",
                rows.map(_._2)),
              graft.operators.ParquetWrite.FloatListCol("embedding",
                rows.map(_._3.map(java.lang.Float.valueOf))),
              graft.operators.ParquetWrite.DoubleCol("score",
                rows.map(_._4))),
              rowsPerGroup = 64)
            val p = s"$base/data/part-$g.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), bytes): Unit
            val st = graft.operators.ParquetFile.parse(g, bytes)
              .filter(r => r.valid && r.col_path == "vec_id" &&
                r.has_stats)
            (p, st.map(_.min_long).min, st.map(_.max_long).max,
              rows.length.toLong)
          }
          .toDF("path", "min_key", "max_key", "size")
        if (adds.isEmpty)
          Seq.empty[(Long, Long, Long, Long, Long)]
            .toDF("label", "n", "n_elems", "sum_q", "sum_sq")
        else {
          adds.select(lit(0L).as("version"), to_json(struct(
              struct(col("path"), col("min_key"), col("max_key"),
                col("size")).as("add"))).as("value"))
            .coalesce(1)
            .write.partitionBy("version").text(s"$base/log")
          // ODD half through the connector's write path — arrays and
          // doubles ride the DSv2 writer into own-codec list files
          e.where(col("vec_id") % 2 === 1)
            .select(col("vec_id"), col("label"), col("embedding"),
              col("score"))
            .write.format("graft-lake").option("path", base)
            .option("statsCol", "vec_id").mode("append").save()
          s.read.format("graft-lake").option("path", base)
            .option("statsCol", "vec_id").load()
            .select(col("label"),
              aggregate(transform(col("embedding"), x =>
                  floor(x.cast("double") * 1024.0).cast("long")),
                lit(0L), (acc, x) => acc + x).as("q"),
              size(col("embedding")).as("ne"),
              floor(col("score") * 4.0).cast("long").as("sq"))
            .groupBy(col("label"))
            .agg(count(lit(1)).as("n"),
              sum(col("ne")).cast("long").as("n_elems"),
              sum(col("q")).as("sum_q"),
              sum(col("sq")).as("sum_sq"))
        }
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding,
            vec_id * 0.25 - 3.0 AS score FROM embeddings)
        SELECT CAST(label AS BIGINT) AS label,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(len(embedding)) AS BIGINT) AS n_elems,
          CAST(sum(list_sum(list_transform(embedding,
            x -> floor(CAST(x AS DOUBLE) * 1024)))) AS BIGINT) AS sum_q,
          CAST(sum(floor(score * 4)) AS BIGINT) AS sum_sq
        FROM e GROUP BY label""")),

    // ---- Parquet split-block BLOOM filter (r10 — the format's
    // point-lookup pruner: a missing key skips the whole row group
    // without touching a page OR the column index): the artifact is
    // written with the filter enabled on doc_id; OUR xxHash64 (seed
    // 0, the spec's mandate) and SBBF block/salt check probe a fixed
    // grid, presence is established independently by a broadcast
    // join against the table, and the gate exploits the structure's
    // ONE hard guarantee — no false negatives: every present probe
    // must test might=true, so n_false_neg is identically 0 and
    // n_present/sum_present replay exactly. (False-positive counts
    // are layout-dependent and stay out of the gated output; the
    // spec pins the hash and the check bit-for-bit against
    // parquet-mr's own filter object.)
    "q211_parquet_bloom" -> Query(
      (s, dir) => {
        val media = parquetArtifactMedia(s, dir, "blm", "snappy",
          dict = true, blockSize = 64 * 1024,
          extraOpts = Map("parquet.bloom.filter.enabled#doc_id" -> "true"))
        val probes = 0L until 2000L by 7L
        val rows = ParquetFile.decodeBloomProbes(media, "doc_id",
          probes).toDF().where(col("valid"))
        val present = docs(s, dir).select(col("doc_id")).distinct()
        rows.join(broadcast(present),
            rows("probe") === present("doc_id"), "left")
          .agg(count(lit(1)).as("n_probes"),
            count(col("doc_id")).as("n_present"),
            coalesce(sum(when(col("doc_id").isNotNull &&
              !col("might"), 1L)), lit(0L)).as("n_false_neg"),
            coalesce(sum(when(col("doc_id").isNotNull, col("probe"))),
              lit(0L)).as("sum_present"))
      },
      Some("""WITH p AS (SELECT unnest(range(0, 2000, 7)) AS probe),
          d AS (SELECT DISTINCT doc_id FROM documents)
        SELECT CAST(count(*) AS BIGINT) AS n_probes,
          CAST(count(d.doc_id) AS BIGINT) AS n_present,
          CAST(0 AS BIGINT) AS n_false_neg,
          CAST(coalesce(sum(CASE WHEN d.doc_id IS NOT NULL
            THEN probe END), 0) AS BIGINT) AS sum_present
        FROM p LEFT JOIN d ON p.probe = d.doc_id""")),

    // ---- ZIP container walk (r10 — the OTHER bundle format public
    // datasets ship in; tar covers the unix lineage, q182): the REAL
    // JDK writer produces the archives (deflate means file bytes
    // share no structure with the payload formulas), and the
    // dependency-free walk starts from the EOCD backward scan,
    // resolves the authoritative central directory, matches every
    // local header, inflates method-8 entries exactly and verifies
    // each CRC-32 — the payload byte sum the oracle replays cannot
    // be produced with any of those steps wrong.
    "q205_zip_scan" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Zip.zipPayload((1 + id % 6).toInt, (id % 13).toInt))))
        Zip.decodeZip(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 1 + doc_id % 6 AS ne,
              doc_id % 13 AS seed FROM documents),
          e AS (SELECT media_id, seed, f, 20 + (seed + f) % 50 AS len,
              CASE WHEN (seed + f) % 2 = 0 THEN 0 ELSE 1 END AS defl
            FROM m, LATERAL (SELECT unnest(range(ne)) AS f)),
          p AS (SELECT media_id, len, defl,
              list_sum(list_transform(range(len),
                j -> (seed + 3 * f + j) % 256)) AS psum,
              strlen('e' || f || '_' || seed || '.txt') AS nlen
            FROM e)
        SELECT media_id, CAST(count(*) AS BIGINT) AS n_entries,
          CAST(sum(defl) AS BIGINT) AS n_deflated,
          CAST(sum(len) AS BIGINT) AS sum_usize,
          CAST(sum(psum) AS BIGINT) AS sum_payload,
          CAST(sum(nlen) AS BIGINT) AS sum_name_len,
          true AS valid
        FROM p GROUP BY media_id""")),

    // ---- HTTP chunked transfer-encoding (r10 — RAW captures keep
    // the wire framing; q185's stored-body subset now widens to all
    // four transport framings: plain CL, gzip+CL, chunked, and gzip
    // UNDER chunked in the wire's own layering — CE applied first,
    // TE framing outermost): hex-size lines with CRLF framing per
    // chunk, zero-chunk terminator, no trailers, landing exactly on
    // the record end; both framings together reject (the smuggling
    // shape). The oracle replays the transport-INDEPENDENT decoded
    // formulas, so a decoder with the hex walk, the terminator, or
    // the CE/TE order wrong cannot match.
    "q206_http_chunked" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions(_.map(id =>
            (id, Http.warcChunkedPayload((2 + id % 7).toInt,
              (id % 13).toInt))))
        Http.decodeWarcHttp(media).toDF()
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 7 AS n,
              doc_id % 13 AS seed FROM documents),
          r AS (SELECT media_id, seed, i
            FROM m, LATERAL (SELECT unnest(range(n)) AS i)
            WHERE i % 3 = 0)
        SELECT media_id, CAST(i AS BIGINT) AS rec_idx,
          CAST(CASE (seed + i) % 3 WHEN 0 THEN 200 WHEN 1 THEN 301
            ELSE 404 END AS BIGINT) AS status,
          CASE WHEN i % 2 = 0 THEN 'text/html' ELSE 'text/plain' END
            AS media_type,
          CASE WHEN i % 2 = 0 THEN 'utf-8' ELSE '' END AS charset,
          CAST(4 + (seed + i) % 3
            + CASE WHEN (seed + i) % 4 IN (1, 3) THEN 1 ELSE 0 END
            AS BIGINT) AS n_headers,
          CAST(20 + ((seed + 7 * i) % 120) AS BIGINT) AS body_len,
          CAST(list_sum(list_transform(range(20 + ((seed + 7 * i) % 120)),
              j -> (seed + 2 * i + j) % 256)) AS BIGINT) AS body_sum,
          true AS valid
        FROM r""")),

    // ---- multinomial Naive Bayes quality classifier (closed-form
    // train + apply — the CCNet/fastText quality-filter shape): train
    // on the doc_id%3!=0 subset weak-labeled by token count >= median,
    // score EVERY doc. NB training is exactly two aggregations (no
    // gradient loop, no driver iteration): token-keyed map-combined
    // counts, scalar Laplace priors, the vocabulary-sized llk table
    // broadcast back onto the token stream — the corpus never
    // shuffles. Scores sum per-token llks through dsum (9-decimal
    // quantized, order-independent) and the priors land on the same
    // grid, so the result is bit-stable under any partitioning.
    "q176_nb_quality" -> Query(
      (s, dir) => {
        val lab = when(col("doc_id") % 3 =!= 0,
          when(size(tokens(col("text"))) >= NbMinToks, 1L).otherwise(0L))
        // r16: spread — the tokenize/label map stage was one-task
        NaiveBayes.classify(
          Tables.spread(docs(s, dir).select(col("doc_id"), col("text"))),
          "doc_id", tokens(col("text")), lab)
      },
      Some(s"""WITH d AS (SELECT doc_id, $sqlToks AS t FROM documents),
          lab AS (SELECT doc_id, t, CASE WHEN doc_id % 3 <> 0 THEN
              (CASE WHEN len(t) >= $NbMinToks THEN 1 ELSE 0 END)
            END AS lab FROM d),
          tok AS (SELECT doc_id, lab, unnest(t) AS tok FROM lab),
          cnt AS (SELECT tok, lab, count(*) AS c FROM tok
              WHERE lab IS NOT NULL GROUP BY tok, lab),
          tot AS (SELECT lab, sum(c) AS tt FROM cnt GROUP BY lab),
          vocab AS (SELECT DISTINCT tok FROM cnt),
          vn AS (SELECT count(*) AS v FROM vocab),
          grid AS (SELECT tok, l AS lab FROM vocab,
              (SELECT unnest([0, 1]) AS l)),
          llk AS (SELECT g.tok, g.lab,
              ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE))
                - ln(CAST(coalesce(tt.tt, 0) + vn.v AS DOUBLE)) AS lp
            FROM grid g LEFT JOIN cnt c ON g.tok = c.tok AND g.lab = c.lab
              LEFT JOIN tot tt ON g.lab = tt.lab, vn),
          piv AS (SELECT tok, max(CASE WHEN lab = 1 THEN lp END) AS lp1,
              max(CASE WHEN lab = 0 THEN lp END) AS lp0
            FROM llk GROUP BY tok),
          pri AS (SELECT
              CAST(CAST(ln(CAST(n1 + 1 AS DOUBLE))
                - ln(CAST(n + 2 AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE)
                AS p1,
              CAST(CAST(ln(CAST(n - n1 + 1 AS DOUBLE))
                - ln(CAST(n + 2 AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE)
                AS p0
            FROM (SELECT sum(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS n1,
                sum(CASE WHEN lab IS NOT NULL THEN 1 ELSE 0 END) AS n
              FROM lab)),
          sums AS (SELECT t.doc_id, count(*) AS n_known,
              CAST(sum(CAST(lp1 AS DECIMAL(18,9))) AS DOUBLE) AS s1d,
              CAST(sum(CAST(lp0 AS DECIMAL(18,9))) AS DOUBLE) AS s0d
            FROM tok t JOIN piv USING (tok) GROUP BY t.doc_id)
        SELECT l.doc_id,
          p.p1 + coalesce(s.s1d, 0) AS s1,
          p.p0 + coalesce(s.s0d, 0) AS s0,
          CAST(coalesce(s.n_known, 0) AS BIGINT) AS n_known,
          CAST(CASE WHEN p.p1 + coalesce(s.s1d, 0)
              > p.p0 + coalesce(s.s0d, 0) THEN 1 ELSE 0 END AS BIGINT)
            AS pred,
          CAST(CASE WHEN l.lab IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
            AS is_train
        FROM lab l LEFT JOIN sums s USING (doc_id), pri p""")),

    // ---- Unicode-canonical exact dedup (the multilingual-corpus
    // gap in digest dedup): composed U+00E1 vs decomposed a+U+0301 vs
    // case vs spacing variants of the SAME text are byte-distinct, so
    // L1's digest groups split real duplicates. canonKey (NFC →
    // lower → strip accents → collapse whitespace → trim; the two
    // Unicode steps are native codegen kernels — no Spark built-in
    // exists) lands all of them on one key. The corpus is planted:
    // groups of 4 consecutive ids share a base text, each id carrying
    // a different byte-variant — any kernel/ordering mismatch splits
    // a group and breaks the hash. Only 32-char digests + ids shuffle.
    "q177_canon_dedup" -> Query(
      (s, dir) => {
        // r16: fan the narrow scan out before the canonKey/md5 map
        // work — both 1.9 s single-task stages (probe-side keying and
        // the broadcast build) were this query's whole cost
        val d = Tables.spread(
          docs(s, dir).select(col("doc_id"), col("text")))
        val base = d.select(col("doc_id").as("base_id"),
          col("text").as("base_text"))
        val j = d.select(col("doc_id"),
            (col("doc_id") - col("doc_id") % 4).as("base_id"))
          .join(base, "base_id")
        val aug = when(col("doc_id") % 4 === 0,
            regexp_replace(col("base_text"), "a", "á"))
          .when(col("doc_id") % 4 === 1,
            regexp_replace(col("base_text"), "a", "á"))
          .when(col("doc_id") % 4 === 2, upper(col("base_text")))
          .otherwise(regexp_replace(col("base_text"), " ", "  "))
        val keyed = j.select(col("doc_id"), md5(canonKey(aug)).as("ckey"))
        // r16: group stats as a window over ONE ckey exchange — the
        // old groupBy+join recomputed the canonKey/md5 pass on both
        // SortMergeJoin inputs (the partial agg below one exchange
        // defeats exchange reuse), doubling the query's only real work.
        // The NULL-ckey filter preserves the old equi-join's semantics
        // (NULL never joins; the oracle's `USING (ckey)` drops NULLs
        // too) — without it the window would emit NULL-text rows the
        // oracle lacks.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ckey"))
        keyed
          .where(col("ckey").isNotNull)
          .withColumn("group_size", count(lit(1)).over(w))
          .withColumn("_k", min(col("doc_id")).over(w))
          .select(col("doc_id"), col("ckey"), col("group_size"),
            when(col("doc_id") === col("_k"), 1L).otherwise(0L)
              .as("is_keeper"))
      },
      Some("""WITH j AS (SELECT d.doc_id, b.text AS base_text
              FROM documents d JOIN documents b
              ON b.doc_id = d.doc_id - d.doc_id % 4),
          a AS (SELECT doc_id, CASE doc_id % 4
              WHEN 0 THEN replace(base_text, 'a', chr(225))
              WHEN 1 THEN replace(base_text, 'a', 'a' || chr(769))
              WHEN 2 THEN upper(base_text)
              ELSE replace(base_text, ' ', '  ') END AS aug FROM j),
          k AS (SELECT doc_id, md5(trim(regexp_replace(strip_accents(
              lower(nfc_normalize(aug))), '\s+', ' ', 'g'))) AS ckey
            FROM a),
          g AS (SELECT ckey, count(*) AS group_size, min(doc_id) AS kp
            FROM k GROUP BY ckey)
        SELECT k.doc_id, k.ckey, g.group_size,
          CAST(CASE WHEN k.doc_id = g.kp THEN 1 ELSE 0 END AS BIGINT)
            AS is_keeper
        FROM k JOIN g USING (ckey)""")),

    // ---- MP3 ENTROPY layer (r9 — the blocked list's LAST undecoded
    // layer): each doc becomes a mono stream whose main data carries
    // REAL Huffman-coded spectral content in the documented subset
    // (ISO table 1 for big values, table B for count1, no bit
    // reservoir), synthesized on the imperative seam with the side
    // info's part2_3_length set to the EXACT coded bit count — then
    // FULLY entropy-decoded by Mp3.parseSpectral: slen-driven
    // scalefactor read, table-1 pair walk with sign bits, table-B
    // count1 quadruples terminated exactly at the part2_3 boundary.
    // A decoder with any code length, sign position or slen table
    // entry wrong cannot land on the boundary, let alone match the
    // oracle's formula replay of every decoded value.
    "q170_mp3_spectral" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = mediaIds(s, dir)
          .mapPartitions { it =>
            it.map { id =>
              // every EVEN doc packs its frames through the BIT
              // RESERVOIR (r10): same granule content, different byte
              // layout — the oracle formulas only match through a
              // reservoir-aware walk
              (id, Mp3.mp3PayloadSpectral((2 + id % 8).toInt,
                (id % 14).toInt, (id % 3).toInt,
                reservoir = id % 2 == 0))
            }
          }
        Mp3.decodeMp3Spectral(media).toDF()
          .select(col("media_id"), col("n_frames"), col("sum_scalefac"),
            col("sum_abs"), col("n_neg"), col("n_count1"),
            col("sum_part23"), col("valid"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
              2 + doc_id % 8 AS n, doc_id % 14 AS seed FROM documents),
          fg AS (SELECT media_id, n, seed, i, g,
              (i + g) % 16 AS sfc,
              CASE WHEN (i + g) % 3 = 0 THEN 1 ELSE 0 END AS wsf,
              2 + ((seed + i) * 5 + g * 7) % 24 AS bv,
              1 + (seed + i + g) % 6 AS n1
            FROM m, LATERAL (SELECT unnest(range(n)) AS i),
                 LATERAL (SELECT unnest(range(2)) AS g)),
          sl AS (SELECT *,
              CASE sfc WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 0
                WHEN 3 THEN 0 WHEN 4 THEN 3 WHEN 5 THEN 1 WHEN 6 THEN 1
                WHEN 7 THEN 1 WHEN 8 THEN 2 WHEN 9 THEN 2 WHEN 10 THEN 2
                WHEN 11 THEN 3 WHEN 12 THEN 3 WHEN 13 THEN 3
                ELSE 4 END AS s1,
              CASE sfc WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2
                WHEN 3 THEN 3 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 2
                WHEN 7 THEN 3 WHEN 8 THEN 1 WHEN 9 THEN 2 WHEN 10 THEN 3
                WHEN 11 THEN 1 WHEN 12 THEN 2 WHEN 13 THEN 3
                WHEN 14 THEN 2 ELSE 3 END AS s2
            FROM fg),
          v AS (SELECT media_id, n, n1,
              CASE WHEN wsf = 1 THEN
                  list_sum(list_transform(range(18), k ->
                    (seed + i + g + k) % (1 << s1)))
                + list_sum(list_transform(range(18), k ->
                    (seed + i + g + 18 + k) % (1 << s2)))
                ELSE
                  list_sum(list_transform(range(11), k ->
                    (seed + i + g + k) % (1 << s1)))
                + list_sum(list_transform(range(10), k ->
                    (seed + i + g + 11 + k) % (1 << s2)))
              END AS sf_sum,
              list_sum(list_transform(range(bv), k ->
                (seed + i + g + k) % 2 + (seed + 2 * i + g + k) % 2))
                AS abs_big,
              list_sum(list_transform(range(bv), k ->
                  ((seed + i + g + k) % 2) * ((seed + k) % 2)
                + ((seed + 2 * i + g + k) % 2) * ((i + k) % 2)))
                AS neg_big,
              list_sum(list_transform(range(bv), k ->
                  (CASE WHEN (seed + i + g + k) % 2 = 0
                          AND (seed + 2 * i + g + k) % 2 = 0 THEN 1
                        WHEN (seed + i + g + k) % 2 = 1
                          AND (seed + 2 * i + g + k) % 2 = 0 THEN 2
                        ELSE 3 END)
                + (seed + i + g + k) % 2 + (seed + 2 * i + g + k) % 2))
                AS bits_big,
              list_sum(list_transform(range(n1), k ->
                  (seed + i + k) % 2 + (i + g + k) % 2
                + (seed + g + k) % 2 + (seed + i + g + k) % 2))
                AS abs_c1,
              list_sum(list_transform(range(n1), k ->
                  ((seed + i + k) % 2) * ((seed + k) % 2)
                + ((i + g + k) % 2) * ((i + k) % 2)
                + ((seed + g + k) % 2) * ((g + k) % 2)
                + ((seed + i + g + k) % 2) * (k % 2)))
                AS neg_c1,
              list_sum(list_transform(range(n1), k ->
                  4 + (seed + i + k) % 2 + (i + g + k) % 2
                + (seed + g + k) % 2 + (seed + i + g + k) % 2))
                AS bits_c1,
              CASE WHEN wsf = 1 THEN 18 * (s1 + s2)
                   ELSE 11 * s1 + 10 * s2 END AS part2
            FROM sl)
        SELECT media_id, CAST(max(n) AS BIGINT) AS n_frames,
          CAST(sum(sf_sum) AS BIGINT) AS sum_scalefac,
          CAST(sum(abs_big + abs_c1) AS BIGINT) AS sum_abs,
          CAST(sum(neg_big + neg_c1) AS BIGINT) AS n_neg,
          CAST(sum(n1) AS BIGINT) AS n_count1,
          CAST(sum(part2 + bits_big + bits_c1) AS BIGINT) AS sum_part23,
          true AS valid
        FROM v GROUP BY media_id""")),

    // ---- MP3 frame-layer walk (L108 — the blocked list's last entry,
    // at the container level): a REAL MPEG-1 Layer III frame sequence
    // is synthesized in pure codegen (Mp3.mp3Payload — every frame's
    // length, and therefore every frame's OFFSET, is header arithmetic
    // over the bitrate/samplerate/padding bits), then walked by the
    // imperative parser Mp3.parseFrames. The oracle replays the same
    // length arithmetic from the doc_id formulas — a parser that does
    // not decode the header bits cannot land on frame 2, let alone
    // match total_bytes/max_frame_len. The entropy layer (Huffman
    // spectral data → PCM) stays documented out of scope.
    "q154_mp3_frames" -> Query(
      (s, dir) => {
        import s.implicits._
        val media = docs(s, dir).select(col("doc_id").as("media_id"),
          Mp3.mp3Payload(
            (lit(3) + col("doc_id") % 20).cast("int"),
            (col("doc_id") % 14).cast("int"),
            (col("doc_id") % 3).cast("int")).as("payload"))
        Mp3.decodeMp3(media.as[(Long, Array[Byte])]).toDF()
          .select(col("media_id"), col("n_frames"), col("total_bytes"),
            col("n_padded"), col("n_bitrates"), col("sample_rate"),
            col("total_samples"), col("max_frame_len"), col("valid"))
      },
      Some {
        val brCase = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
          224, 256, 320).zipWithIndex
          .map { case (br, k) => s"WHEN ${k + 1} THEN $br" }
          .mkString("CASE ((seed + i) % 14) + 1 ", " ", " END")
        s"""WITH m AS (SELECT doc_id, 3 + doc_id % 20 AS n,
              doc_id % 14 AS seed, doc_id % 3 AS si FROM documents),
          e AS (SELECT doc_id, n, seed,
              CASE WHEN si = 0 THEN 44100 WHEN si = 1 THEN 48000
                   ELSE 32000 END AS sr FROM m),
          f AS (SELECT doc_id, n, seed, sr,
              list_transform(range(n), i ->
                (144 * ($brCase) * 1000) // sr + (seed + i) % 2) AS lens
            FROM e)
        SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_frames,
          CAST(list_sum(lens) AS BIGINT) AS total_bytes,
          CAST(list_sum(list_transform(range(n), i -> (seed + i) % 2))
            AS BIGINT) AS n_padded,
          CAST(least(n, 14) AS BIGINT) AS n_bitrates,
          CAST(sr AS BIGINT) AS sample_rate,
          CAST(n * 1152 AS BIGINT) AS total_samples,
          CAST(list_max(lens) AS BIGINT) AS max_frame_len,
          true AS valid
        FROM f"""
      }),

    // ---- product-quantization encode (L96): per-subspace cosine
    // assignment against sub-codebooks sliced from the q40/q60 elected
    // rows; output = the m-part code plus the cosine between each
    // vector and its PQ reconstruction (the compression-fidelity
    // number). The oracle mirrors the per-subspace argmax with offset
    // dot folds and rebuilds the same reconstruction by list-slice
    // concatenation, so recon_cos is a continuous left fold on BOTH
    // engines (per-subspace partial sums would round differently).
    "q135_pq_encode" -> Query(
      (s, dir) => {
        val sub = Dim / PqM
        Similarity.pqEncode(Tables.embeddings(s, dir),
            col("vec_id") % 125 === 7, PqM)
          .select(col("vec_id"),
            concat_ws("-", (0 until PqM).map(i =>
              col(s"code_$i").cast("string")): _*).as("code"),
            (Similarity.dotD(col("embedding"), col("recon"))
              / sqrt(Similarity.dotD(col("embedding"), col("embedding"))
                * Similarity.dotD(col("recon"), col("recon"))))
              .as("recon_cos"))
          .withColumn("sub_dim", lit(sub.toLong))
      },
      Some {
        val sub = Dim / PqM
        val (winCtes, wJoins, reconExpr) = sqlPqFragments
        val codeExpr = (0 until PqM).map(m => s"w$m.cent_id::VARCHAR")
          .mkString(" || '-' || ")
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb
                FROM embeddings WHERE vec_id % 125 = 7),
          $winCtes,
          r AS (SELECT e.vec_id, e.embedding, $codeExpr AS code,
                  $reconExpr AS recon
                FROM e $wJoins)
        SELECT vec_id, code,
          (${Similarity.sqlDotD("embedding", "recon", Dim)}
            / sqrt(${Similarity.sqlDotD("embedding", "embedding", Dim)}
              * ${Similarity.sqlDotD("recon", "recon", Dim)})) AS recon_cos,
          CAST($sub AS BIGINT) AS sub_dim
        FROM r"""
      }),

    // ---- PQ ADC recall (L96 eval arm): rank candidates by the cosine
    // of each probe against candidate PQ reconstructions (the ADC
    // score, written on the decoded vector so both engines fold
    // identically), recall@k vs the exact q28 search — the number a PQ
    // compression config is accepted on (same gate pattern as
    // q73 LSH / q74 IVF).
    "q136_pq_recall" -> Query(
      (s, dir) => Similarity.pqRecall(Tables.embeddings(s, dir),
        isProbeId(col("vec_id")), col("vec_id") % 125 === 7, PqM, TopK),
      Some {
        val (winCtes, wJoins, reconExpr) = sqlPqFragments
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb
                FROM embeddings WHERE vec_id % 125 = 7),
          $winCtes,
          r AS (SELECT e.vec_id, e.embedding, $reconExpr AS recon
                FROM e $wJoins),
          cand AS (SELECT vec_id AS cand_id, recon,
                ${Similarity.sqlDotD("recon", "recon", Dim)} AS rr
              FROM r),
          p AS (SELECT vec_id AS probe_id, embedding AS pe,
                ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS pn
              FROM embeddings WHERE $sqlProbeId),
          adc AS (SELECT probe_id, cand_id FROM
              (SELECT p.probe_id, cand.cand_id, row_number() OVER
                 (PARTITION BY p.probe_id ORDER BY
                   (${Similarity.sqlDotD("p.pe", "cand.recon", Dim)}
                     / sqrt(p.pn * cand.rr)) DESC, cand.cand_id) AS rk
               FROM p, cand WHERE cand.cand_id <> p.probe_id)
            WHERE rk <= $TopK),
          e0 AS (SELECT vec_id, embedding,
                ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
              FROM embeddings),
          exx AS (SELECT probe_id, cand_id FROM
              (SELECT p.probe_id, e0.vec_id AS cand_id, row_number() OVER
                 (PARTITION BY p.probe_id ORDER BY
                   (${Similarity.sqlDotD("p.pe", "e0.embedding", Dim)}
                     / sqrt(p.pn * e0.nn)) DESC, e0.vec_id) AS rk
               FROM p, e0 WHERE e0.vec_id <> p.probe_id)
            WHERE rk <= $TopK),
          hit AS (SELECT adc.probe_id, count(*) AS n_hit
                  FROM adc JOIN exx ON adc.probe_id = exx.probe_id
                    AND adc.cand_id = exx.cand_id
                  GROUP BY adc.probe_id)
        SELECT p.probe_id, CAST($PqM AS BIGINT) AS n_subspaces,
          coalesce(hit.n_hit, 0) AS n_hit,
          coalesce(hit.n_hit, 0) / CAST($TopK AS DOUBLE) AS recall
        FROM p LEFT JOIN hit ON p.probe_id = hit.probe_id"""
      }),

    // ---- IVF-PQ recall (L102, the production ANN composition): the
    // coarse quantizer restricts each probe to nProbe cells' candidate
    // lists (q40's assignment), candidates scored by PQ-reconstruction
    // cosine (q136's ADC formulation), recall@k vs exact — the
    // acceptance gate for an IVF-PQ index config (FAISS's default
    // shape). One oracle combines the q40 cell CTEs with the q135
    // recon CTEs.
    "q145_ivfpq_recall" -> Query(
      (s, dir) => Similarity.ivfPqRecall(Tables.embeddings(s, dir),
        isProbeId(col("vec_id")), col("vec_id") % 125 === 7, PqM, TopK,
        nProbe = 2),
      Some {
        val (winCtes, wJoins, reconExpr) = sqlPqFragments
        s"""WITH e AS (SELECT vec_id, embedding,
               ${Similarity.sqlDotD("embedding", "embedding", Dim)} AS nn
             FROM embeddings),
          c AS (SELECT vec_id AS cent_id, embedding AS cemb, nn AS cn
                FROM e WHERE vec_id % 125 = 7),
          $winCtes,
          r AS (SELECT e.vec_id, $reconExpr AS recon FROM e $wJoins),
          asn0 AS (SELECT e.vec_id, c.cent_id,
                 (${Similarity.sqlDotD("e.embedding", "c.cemb", Dim)}
                   / sqrt(e.nn * c.cn)) AS csim
               FROM e, c),
          asn AS (SELECT vec_id, cent_id AS cell FROM
              (SELECT *, row_number() OVER
                 (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rk
               FROM asn0) WHERE rk = 1),
          cand AS (SELECT r.vec_id AS cand_id, asn.cell, r.recon,
                ${Similarity.sqlDotD("r.recon", "r.recon", Dim)} AS rr
              FROM r JOIN asn ON asn.vec_id = r.vec_id),
          p0 AS (SELECT vec_id AS probe_id, embedding AS pe, nn AS pn
              FROM e WHERE $sqlProbeId),
          pcell AS (SELECT probe_id, pe, pn, cent_id AS cell FROM
              (SELECT p0.probe_id, p0.pe, p0.pn, c.cent_id, row_number()
                 OVER (PARTITION BY p0.probe_id ORDER BY
                   (${Similarity.sqlDotD("p0.pe", "c.cemb", Dim)}
                     / sqrt(p0.pn * c.cn)) DESC, c.cent_id) AS rk
               FROM p0, c) WHERE rk <= 2),
          adc AS (SELECT probe_id, cand_id FROM
              (SELECT pc.probe_id, cand.cand_id, row_number() OVER
                 (PARTITION BY pc.probe_id ORDER BY
                   (${Similarity.sqlDotD("pc.pe", "cand.recon", Dim)}
                     / sqrt(pc.pn * cand.rr)) DESC, cand.cand_id) AS rk
               FROM pcell pc JOIN cand ON cand.cell = pc.cell
               WHERE cand.cand_id <> pc.probe_id)
            WHERE rk <= $TopK),
          exx AS (SELECT probe_id, cand_id FROM
              (SELECT p0.probe_id, e.vec_id AS cand_id, row_number() OVER
                 (PARTITION BY p0.probe_id ORDER BY
                   (${Similarity.sqlDotD("p0.pe", "e.embedding", Dim)}
                     / sqrt(p0.pn * e.nn)) DESC, e.vec_id) AS rk
               FROM p0, e WHERE e.vec_id <> p0.probe_id)
            WHERE rk <= $TopK),
          hit AS (SELECT adc.probe_id, count(*) AS n_hit
                  FROM adc JOIN exx ON adc.probe_id = exx.probe_id
                    AND adc.cand_id = exx.cand_id
                  GROUP BY adc.probe_id)
        SELECT p0.probe_id, CAST(2 AS BIGINT) AS n_probe_cells,
          CAST($PqM AS BIGINT) AS n_subspaces,
          coalesce(hit.n_hit, 0) AS n_hit,
          coalesce(hit.n_hit, 0) / CAST($TopK AS DOUBLE) AS recall
        FROM p0 LEFT JOIN hit ON p0.probe_id = hit.probe_id"""
      }),

    // ---- histogram-quantile sketch + error audit (L97): the MERGEABLE
    // quantile path (per-partition bin counts just add) with its
    // |est − exact| ≤ bin-width guarantee measured against the exact
    // rank-ceil value — the audit that lets the sketch replace the
    // exact pass at 100 TB. Width/estimate arithmetic is written with
    // the identical expression shape on both engines, so the doubles
    // are bit-equal.
    "q137_hist_quantiles" -> Query(
      (s, dir) => Curation.histogramQuantiles(docs(s, dir), col("n_chars"),
        Seq(5, 25, 50, 75, 95), 64),
      Some("""WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents),
          mm AS (SELECT min(v) AS lo, max(v) AS hi, count(*) AS n FROM v),
          t AS (SELECT CAST(p.pct AS BIGINT) AS pct,
                  greatest(1, CAST(ceil(p.pct / 100.0 * mm.n) AS BIGINT))
                    AS target
                FROM (VALUES (5), (25), (50), (75), (95)) p(pct), mm),
          h AS (SELECT CASE WHEN mm.hi = mm.lo THEN 0
                  ELSE least(CAST(floor((v.v - mm.lo)
                    / ((mm.hi - mm.lo) / 64.0)) AS BIGINT), 63) END AS bin,
                  count(*) AS c
                FROM v, mm GROUP BY 1),
          hc AS (SELECT bin, CAST(sum(c) OVER (ORDER BY bin) AS BIGINT)
                   AS cum FROM h),
          est AS (SELECT t.pct, mm.lo + (min(hc.bin) + 1)
                    * ((mm.hi - mm.lo) / 64.0) AS est
                  FROM t, hc, mm WHERE hc.cum >= t.target
                  GROUP BY t.pct, mm.lo, mm.hi),
          d AS (SELECT v, count(*) AS c FROM v GROUP BY v),
          dc AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
                   AS cum FROM d),
          ex AS (SELECT t.pct, min(dc.v) AS exact FROM t, dc
                 WHERE dc.cum >= t.target GROUP BY t.pct)
        SELECT est.pct, mm.n, mm.lo, mm.hi, est.est, ex.exact,
          abs(est.est - ex.exact) AS abs_err,
          CASE WHEN mm.hi = mm.lo THEN 0.0
            ELSE (mm.hi - mm.lo) / 64.0 END AS bound
        FROM est JOIN ex ON est.pct = ex.pct, mm""")),

    // ---- precision/recall threshold sweep (L98): one exact PR point
    // per distinct score threshold — the operating-point curve the L70
    // ROC summary hides; same quality signal as q109's calibration
    // (capped length vs lang='en'). The sweep frame is distinct-score-
    // sized (bounded by the score quantization contract), the corpus
    // is touched by ONE map-combined groupBy.
    "q138_pr_curve" -> Query(
      (s, dir) => Curation.prCurve(docs(s, dir),
        least(col("n_chars"), lit(1000L)), col("lang") === "en"),
      Some("""WITH b AS (SELECT least(n_chars, 1000) AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             FROM documents),
          g AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos,
                  count(*) AS cnt FROM b GROUP BY s),
          c AS (SELECT s,
                  CAST(sum(pos) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
                  CAST(sum(cnt) OVER (ORDER BY s DESC) AS BIGINT) AS n_ge,
                  CAST(sum(pos) OVER () AS BIGINT) AS p_all
                FROM g)
        SELECT CAST(s AS BIGINT) AS threshold, tp, n_ge - tp AS fp,
          p_all - tp AS fn,
          CAST(tp AS DOUBLE) / n_ge AS prec,
          CAST(tp AS DOUBLE) / p_all AS recall,
          CASE WHEN CAST(tp AS DOUBLE) / n_ge
              + CAST(tp AS DOUBLE) / p_all > 0.0
            THEN 2.0 * (CAST(tp AS DOUBLE) / n_ge)
              * (CAST(tp AS DOUBLE) / p_all)
              / (CAST(tp AS DOUBLE) / n_ge + CAST(tp AS DOUBLE) / p_all)
            ELSE 0.0 END AS f1
        FROM c""")),

    // ---- per-source percentile normalization (L88): raw quality
    // scores mapped to within-source percentile ranks so thresholds
    // compare across sources with different scales. Exact small-int
    // ratio; singleton groups at 0.5.
    "q127_pct_normalize" -> Query(
      (s, dir) => Curation.percentileNormalize(docs(s, dir), col("source"),
        col("n_chars"), col("doc_id")),
      Some("""WITH r AS (SELECT source AS group_key, doc_id AS id,
               n_chars AS value,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars, doc_id) AS rk,
               count(*) OVER (PARTITION BY source) AS n
             FROM documents)
        SELECT group_key, id, value,
          CASE WHEN n = 1 THEN 0.5
               ELSE CAST(rk - 1 AS DOUBLE) / (n - 1) END AS pct_rank
        FROM r""")),

    // ---- embedding mean-pooling (L89): passage->document pooling —
    // vector groups collapsed to fixed-point-exact mean vectors with
    // member count and L2 norm; the L80 centroid derivation applied
    // per group, with a group-keyed array rebuild.
    // Gate shape note (r7): the operator's natural output is one
    // array<double> vector per group, but the driver's pandas comparator
    // cannot sort/hash multi-row array columns (r6's only harness err).
    // The GATED projection is therefore long format — (group_id, d,
    // component) plus the scalar n_members/norm — which is the identical
    // computation under a comparator-safe shape; API callers still get
    // the array from [[Spectral.meanPool]].
    "q128_mean_pool" -> Query(
      (s, dir) => Spectral.meanPool(Tables.embeddings(s, dir),
          expr(s"vec_id div $PoolGroup"))
        .select(col("group_id"), col("n_members"), col("norm"),
          posexplode(col("pooled")).as(Seq("d", "component")))
        .select(col("group_id"), col("d").cast("long").as("d"),
          col("component"), col("n_members"), col("norm")),
      Some {
        val qL = Spectral.Q.toLong
        s"""WITH s AS (SELECT vec_id // $PoolGroup AS g, dd.d AS d,
              count(*) AS n,
              CAST(CAST(sum(CAST(floor(CAST(embedding[dd.d + 1] AS DOUBLE)
                  * $qL) AS BIGINT)) AS HUGEINT)
                // (count(*) * 1024) AS DOUBLE) / 1048576.0 AS cv
            FROM embeddings, LATERAL (SELECT unnest(range($Dim)) AS d) dd
            GROUP BY g, dd.d),
          p AS (SELECT g AS group_id, max(n) AS n_members,
                  list(cv ORDER BY d) AS pooled
                FROM s GROUP BY g),
          nrm AS (SELECT group_id, n_members, pooled,
                  sqrt(${Similarity.sqlDotD("pooled", "pooled", Dim)}) AS norm
                FROM p)
        SELECT group_id, CAST(dd.d AS BIGINT) AS d,
          pooled[dd.d + 1] AS component, n_members, norm
        FROM nrm, LATERAL (SELECT unnest(range($Dim)) AS d) dd"""
      }),

    // ---- bootstrap CI for a corpus metric (L90): B deterministic
    // with-replacement resamples of a FIXED sample, exact decimal
    // means, rank-exact 5-95% interval — the error bar on a data-card
    // number. Draw (b, d) picks index hash60(b:d:salt) % n: no RNG.
    "q129_bootstrap_ci" -> Query(
      (s, dir) => Curation.bootstrapCi(docs(s, dir),
        col("doc_id") < BootSampleN, col("doc_id"), col("n_chars"),
        BootB, BootLo, BootHi, BootSalt),
      Some {
        def rankOf(pct: Int): Long =
          math.max(1L, math.ceil(pct / 100.0 * BootB).toLong)
        s"""WITH s AS (SELECT doc_id AS _id, n_chars AS v,
              row_number() OVER (ORDER BY doc_id) - 1 AS idx
            FROM documents WHERE doc_id < $BootSampleN),
          nn AS (SELECT count(*) AS n FROM s),
          draws AS (SELECT t.b,
              (${sqlHash60(s"CAST(t.b AS VARCHAR) || ':' || " +
                s"CAST(dd.d AS VARCHAR) || ':$BootSalt'")} % nn.n) AS idx
            FROM range($BootB) t(b), nn,
              LATERAL (SELECT unnest(range(nn.n)) AS d) dd),
          means AS (SELECT b,
              CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS m
            FROM draws JOIN s USING (idx) GROUP BY b),
          r AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rk
                FROM means),
          f AS (SELECT CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE)
                  / count(*) AS mean_full FROM s)
        SELECT (SELECT n FROM nn) AS n_sample,
          CAST($BootB AS BIGINT) AS n_resamples, mean_full,
          (SELECT max(CASE WHEN rk = ${rankOf(BootLo)} THEN m END) FROM r)
            AS ci_lo,
          (SELECT max(CASE WHEN rk = ${rankOf(BootHi)} THEN m END) FROM r)
            AS ci_hi
        FROM f"""
      }),

    // ---- padding-waste audit (L94): length-bucketed batching
    // efficiency — per bucket ceil(len/32)*32: support, real vs padded
    // token mass, waste, efficiency. ONE map-combined groupBy; the
    // number that justifies sequence packing (q52) over naive padding.
    "q133_padding_waste" -> Query(
      (s, dir) => Packing.paddingWaste(docs(s, dir), col("doc_id"),
        col("text"), 32),
      Some(s"""WITH d AS (SELECT ((len($sqlToks) + 31) // 32) * 32 AS bucket,
               CAST(len($sqlToks) AS BIGINT) AS len
             FROM documents)
        SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
          CAST(sum(len) AS BIGINT) AS real_tokens,
          CAST(bucket * count(*) AS BIGINT) AS padded_tokens,
          CAST(bucket * count(*) - sum(len) AS BIGINT) AS pad_waste,
          CAST(sum(len) AS DOUBLE) / (bucket * count(*)) AS efficiency
        FROM d GROUP BY bucket""")),

    // ---- exact two-sample KS statistic (L93): the max ECDF gap
    // between two corpus slices' length distributions, integer-exact
    // numerator via cross-multiplication — WHERE the distributions
    // diverge, with the textbook null distribution.
    "q132_ks_statistic" -> Query(
      (s, dir) => Drift.ksStatistic(
        docs(s, dir).where(col("doc_id") % 3 === 0),
        docs(s, dir).where(col("doc_id") % 3 =!= 0),
        col("n_chars")),
      Some("""WITH ca AS (SELECT n_chars AS v, count(*) AS c_a
             FROM documents WHERE doc_id % 3 = 0 GROUP BY v),
          cb AS (SELECT n_chars AS v, count(*) AS c_b
             FROM documents WHERE doc_id % 3 <> 0 GROUP BY v),
          m AS (SELECT coalesce(ca.v, cb.v) AS v,
                  coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
                FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
          t AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
                  CAST(sum(c_b) AS BIGINT) AS n_b FROM m),
          f AS (SELECT v,
                  CAST(sum(c_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS f_a,
                  CAST(sum(c_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS f_b
                FROM m),
          g AS (SELECT v, abs(CAST(f_a AS HUGEINT) * t.n_b
                  - CAST(f_b AS HUGEINT) * t.n_a) AS num, t.n_a, t.n_b
                FROM f, t)
        SELECT n_a, n_b, CAST(num AS BIGINT) AS ks_num,
          CAST(num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b) AS ks,
          v AS at_value
        FROM g ORDER BY num DESC, v LIMIT 1""")),

    // ---- CUSUM rate-change alarms (L91): hourly event-rate buckets
    // (empty buckets materialize), one-sided CUSUM of integer
    // deviations via the prefix-minus-running-min identity, alarms at
    // 2% of total mass — the ingest monitor, exactly.
    "q130_cusum_alarms" -> Query(
      (s, dir) => Drift.cusumAlarms(Tables.events(s, dir), col("ts"),
        CusumBucketSec, CusumThrNum, CusumThrDen),
      Some(s"""WITH cc AS (SELECT epoch_ns(ts) // ${CusumBucketSec}000000000
               AS b, count(*) AS c
             FROM events GROUP BY b),
          mm AS (SELECT min(b) AS lo, max(b) AS hi,
                  CAST(sum(c) AS BIGINT) AS n FROM cc),
          grid AS (SELECT CAST(g AS BIGINT) + mm.lo AS b FROM mm,
                   LATERAL (SELECT unnest(range(mm.hi - mm.lo + 1)) AS g)),
          f AS (SELECT grid.b, coalesce(cc.c, 0) AS c
                FROM grid LEFT JOIN cc USING (b)),
          p AS (SELECT b, c, CAST(sum(c * (SELECT hi - lo + 1 FROM mm)
                  - (SELECT n FROM mm)) OVER (ORDER BY b
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
                FROM f),
          st AS (SELECT b, c, p,
                  p - least(0, min(p) OVER (ORDER BY b
                    ROWS UNBOUNDED PRECEDING)) AS cusum
                 FROM p)
        SELECT b * $CusumBucketSec AS bucket_ts,
          CAST(c AS BIGINT) AS n_events, CAST(cusum AS BIGINT) AS cusum,
          CAST(CASE WHEN cusum * $CusumThrDen
              > $CusumThrNum * (SELECT n * (hi - lo + 1) FROM mm)
            THEN 1 ELSE 0 END AS BIGINT) AS is_alarm
        FROM st""")),

    // ---- SQL/CATALOG SURFACE (r14 — the r13 verdict's #1 ask): the
    // lakehouse driven entirely by SQL TEXT through the LakeCatalog
    // (`spark.sql.catalog.<name> = graft.sources.LakeCatalog`). Each
    // gate bootstraps its own warehouse, issues pure SQL, and the
    // final aggregate must match DuckDB over the source table — a
    // catalog that resolved the wrong snapshot, dropped an insert, or
    // mis-routed a merge cannot match. LakeCatalogSpec pins the
    // operator laws (CTAS, SHOW/DROP, partitioning, path
    // equivalence); these gates pin the end-to-end SQL loop.
    "q255_lake_sql_catalog" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw255_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c255", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q255_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c255.db"): Unit
        s.sql("""CREATE TABLE graft_c255.db.docs (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake`"""): Unit
        s.sql("INSERT INTO graft_c255.db.docs " +
          "SELECT doc_id, n_chars, lang FROM q255_src"): Unit
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
          FROM graft_c255.db.docs GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang""")),

    // ---- SQL MERGE INTO (r14): the flagship upsert (UPDATE SET * +
    // INSERT *) and the delete arm, as pure SQL, routed through
    // LakeMaintenance.merge (stats-pruned rewrite, CDC sidecars,
    // optimistic commit). The oracle replays the same changeset
    // relationally — a merge that updated the wrong rows, inserted a
    // matched key, or resurrected a deleted row cannot match.
    "q256_lake_sql_merge" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw256_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c256", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q256_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c256.db"): Unit
        s.sql("""CREATE TABLE graft_c256.db.t (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake`"""): Unit
        s.sql("INSERT INTO graft_c256.db.t " +
          "SELECT doc_id, n_chars, lang FROM q256_src " +
          "WHERE doc_id % 2 = 0"): Unit
        // upsert: doubles n_chars for matched evens, inserts the odds
        s.sql("""MERGE INTO graft_c256.db.t AS t
          USING (SELECT doc_id, n_chars * 2 AS n_chars, lang
                 FROM q256_src WHERE doc_id % 3 = 0) AS src
          ON t.doc_id = src.doc_id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *"""): Unit
        // delete arm: every key divisible by 7 dies
        s.sql("""MERGE INTO graft_c256.db.t AS t
          USING (SELECT doc_id FROM q256_src WHERE doc_id % 7 = 0) AS src
          ON t.doc_id = src.doc_id
          WHEN MATCHED THEN DELETE"""): Unit
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
          FROM graft_c256.db.t GROUP BY lang""")
      },
      Some("""WITH t0 AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
            lang FROM documents WHERE doc_id % 2 = 0),
          u AS (SELECT doc_id, CAST(n_chars * 2 AS BIGINT) AS n_chars,
            lang FROM documents WHERE doc_id % 3 = 0),
          merged AS (
            SELECT t0.doc_id,
              CASE WHEN u.doc_id IS NOT NULL THEN u.n_chars
                ELSE t0.n_chars END AS n_chars,
              CASE WHEN u.doc_id IS NOT NULL THEN u.lang
                ELSE t0.lang END AS lang
            FROM t0 LEFT JOIN u USING (doc_id)
            UNION ALL
            SELECT u.doc_id, u.n_chars, u.lang FROM u
            WHERE u.doc_id NOT IN (SELECT doc_id FROM t0))
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM merged WHERE doc_id % 7 <> 0 GROUP BY lang""")),

    // ---- SQL time travel + schema evolution (r14): VERSION AS OF
    // reads historical snapshots by SQL; ALTER TABLE ADD/RENAME
    // COLUMN are one-metadata-file operations whose effects the final
    // aggregate proves (the renamed column still reads batch-3's
    // values; pre-evolution snapshots count only their own rows).
    "q257_lake_sql_timetravel" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw257_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c257", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q257_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c257.db"): Unit
        s.sql("""CREATE TABLE graft_c257.db.tt (
          doc_id BIGINT NOT NULL, lang STRING) USING `graft-lake`"""): Unit
        s.sql("INSERT INTO graft_c257.db.tt SELECT doc_id, lang " +
          "FROM q257_src WHERE doc_id % 3 = 0"): Unit // v1
        s.sql("INSERT INTO graft_c257.db.tt SELECT doc_id, lang " +
          "FROM q257_src WHERE doc_id % 3 = 1"): Unit // v2
        s.sql("ALTER TABLE graft_c257.db.tt ADD COLUMN score BIGINT"): Unit
        s.sql("INSERT INTO graft_c257.db.tt SELECT doc_id, lang, n_chars " +
          "FROM q257_src WHERE doc_id % 3 = 2"): Unit // v4
        s.sql("ALTER TABLE graft_c257.db.tt RENAME COLUMN score TO points"): Unit
        s.sql("""SELECT 'v1' AS snap, count(*) AS n,
            CAST(NULL AS BIGINT) AS pts
          FROM graft_c257.db.tt VERSION AS OF 1
          UNION ALL SELECT 'v2', count(*), CAST(NULL AS BIGINT)
          FROM graft_c257.db.tt VERSION AS OF 2
          UNION ALL SELECT 'head', count(*), sum(points)
          FROM graft_c257.db.tt""")
      },
      Some("""SELECT 'v1' AS snap,
          CAST((SELECT count(*) FROM documents WHERE doc_id % 3 = 0)
            AS BIGINT) AS n, CAST(NULL AS BIGINT) AS pts
        UNION ALL SELECT 'v2',
          CAST((SELECT count(*) FROM documents WHERE doc_id % 3 <= 1)
            AS BIGINT), CAST(NULL AS BIGINT)
        UNION ALL SELECT 'head',
          CAST((SELECT count(*) FROM documents) AS BIGINT),
          CAST((SELECT sum(n_chars) FROM documents WHERE doc_id % 3 = 2)
            AS BIGINT)""")),

    // ---- SQL DELETE FROM (r14): key predicates route through the
    // merge delete arm (stats-pruned rewrite + CDC, `SupportsDelete`);
    // the oracle replays the same key set. A delete that missed an
    // occurrence, touched a neighbor, or rewrote the wrong file
    // cannot match.
    "q258_lake_sql_delete" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw258_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c258", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q258_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c258.db"): Unit
        s.sql("""CREATE TABLE graft_c258.db.d (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake`"""): Unit
        s.sql("INSERT INTO graft_c258.db.d " +
          "SELECT doc_id, n_chars, lang FROM q258_src"): Unit
        s.sql(s"DELETE FROM graft_c258.db.d WHERE doc_id IN " +
          s"(${SqlDeleteKeys.mkString(",")})"): Unit
        s.sql("DELETE FROM graft_c258.db.d WHERE doc_id = 1"): Unit
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
          FROM graft_c258.db.d GROUP BY lang""")
      },
      Some(s"""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE doc_id NOT IN (${SqlDeleteKeys.mkString(",")})
          AND doc_id <> 1
        GROUP BY lang""")),

    // ---- GENERAL DATA SKIPPING (r14 — the r13 verdict's #2 ask):
    // every add carries per-column min/max/nullCount for the leading
    // columns (Delta's rule), written by EVERY path and pruned on for
    // any pushed predicate — non-key longs, doubles, strings — not
    // just the statsCol. The gate builds a multi-file table through
    // the connector, filters on a non-key long AND a double AND a
    // string, and compacts mid-way so the aggregate also proves the
    // stats survive maintenance. LakeStatsSpec pins the plan shapes
    // (fewer LakePartitions) and the all-null-window law.
    "q259_lake_data_skipping" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakeds_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
          graft.operators.TxLog.metaDataLine(Seq(
            graft.operators.TxLog.MetaCol("doc_id", "long",
              nullable = false),
            graft.operators.TxLog.MetaCol("n_chars", "long",
              nullable = true),
            graft.operators.TxLog.MetaCol("score", "double",
              nullable = true),
            graft.operators.TxLog.MetaCol("lang", "string",
              nullable = true))),
          graft.operators.TxLog.commitInfoLine("CREATE TABLE")))
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"),
          (col("n_chars").cast("double") / lit(4.0)).as("score"),
          col("lang"))
        (0 until 4).foreach { b =>
          d.where((col("doc_id") / 128).cast("long") % 4 === b)
            .coalesce(1)
            .write.format("graft-lake").option("path", base)
            .mode("append").save()
        }
        graft.operators.LakeMaintenance.compact(s, base,
          targetRows = 256): Unit
        s.read.format("graft-lake").option("path", base).load()
          .where(col("n_chars") >= 100L && col("n_chars") < 2000L &&
            col("score") <= 300.0 && col("lang") >= "d")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"))
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE n_chars >= 100 AND n_chars < 2000
          AND n_chars / 4.0 <= 300.0 AND lang >= 'd'
        GROUP BY lang""")),

    // ---- DELETION VECTORS (r14 — the r13 verdict's #3 ask:
    // merge-on-read deletes): a small MERGE delete writes a row-
    // ordinal sidecar instead of rewriting the file — the gate PROVES
    // no rewrite relationally (the live data-file set must be
    // unchanged, enforced with a loud in-query check) and the final
    // aggregate must match the relational replay; the unfiltered
    // count flows through the COUNT(*) pushdown, which must subtract
    // the DV. LakeStatsSpec pins the lifecycle (reader application,
    // CDC exactness, compaction materialization, vacuum retention).
    "q260_lake_deletion_vectors" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakedv_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
          graft.operators.TxLog.metaDataLine(Seq(
            graft.operators.TxLog.MetaCol("doc_id", "long",
              nullable = false),
            graft.operators.TxLog.MetaCol("n_chars", "long",
              nullable = true),
            graft.operators.TxLog.MetaCol("lang", "string",
              nullable = true))),
          graft.operators.TxLog.commitInfoLine("CREATE TABLE")))
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang"))
        d.coalesce(1)
          .write.format("graft-lake").option("path", base)
          .mode("append").save()
        val keys = d.where(col("doc_id") % 97 === 0)
          .select(col("doc_id")).as[Long].collect().toSeq.sorted
        val liveBefore = graft.operators.TxLog
          .resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
          .map(_.path).toSet
        if (keys.nonEmpty)
          graft.operators.LakeMaintenance.merge(s, base, Seq.empty,
            "doc_id", deletes = keys): Unit
        val after = graft.operators.TxLog
          .resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
        // the no-rewrite law, enforced IN the gate: the data-file set
        // must be unchanged (merge-on-read), with a DV registered
        if (keys.nonEmpty) {
          require(after.map(_.path).toSet == liveBefore,
            "small delete must not rewrite any data file")
          require(after.exists(_.dvRows == keys.size.toLong),
            "the deletion vector must carry exactly the deleted rows")
        }
        val t = s.read.format("graft-lake").option("path", base).load()
        // the unfiltered count rides the COUNT(*) pushdown (which
        // must subtract the DV); the grouped aggregate rides the row
        // path (which must apply it) — both must agree with DuckDB
        val total = t.agg(count(lit(1)).as("n")).as[Long].head()
        t.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"))
          .withColumn("total", lit(total))
      },
      Some("""WITH kept AS (SELECT * FROM documents
            WHERE doc_id % 97 <> 0)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST((SELECT count(*) FROM kept) AS BIGINT) AS total
        FROM kept GROUP BY lang""")),

    // ---- SQL MAINTENANCE surface (r14 — Spark 4's ProcedureCatalog,
    // the Iceberg CALL pattern): OPTIMIZE, checkpointing and
    // DESCRIBE HISTORY driven as `CALL graft.system.*` SQL text. The
    // gate litters a table through SQL inserts, CALLs optimize +
    // checkpoint, and the final aggregate must replay over the
    // compacted table — with the OPTIMIZE commit count read back
    // through CALL describe_history (a compaction that lost or
    // duplicated a row, or a history that mis-stamped the op, cannot
    // match). LakeCatalogSpec pins the other procedures (vacuum,
    // constraints as CALLs, loud unknown-procedure rejection).
    "q261_lake_sql_call" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw261_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c261", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q261_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c261.db"): Unit
        s.sql("""CREATE TABLE graft_c261.db.m (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake`"""): Unit
        (0 until 3).foreach { b =>
          s.sql("INSERT INTO graft_c261.db.m " +
            s"SELECT doc_id, n_chars, lang FROM q261_src " +
            s"WHERE doc_id % 3 = $b"): Unit
        }
        s.sql("CALL graft_c261.system.optimize(table => 'db.m', " +
          "target_rows => 1000000)"): Unit
        s.sql("CALL graft_c261.system.checkpoint(table => 'db.m', " +
          "parts => 2)"): Unit
        val nOpt = s.sql("CALL graft_c261.system.describe_history(" +
            "table => 'db.m')")
          .where(col("op") === "OPTIMIZE").count()
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
            FROM graft_c261.db.m GROUP BY lang""")
          .withColumn("n_optimize", lit(nOpt))
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST(1 AS BIGINT) AS n_optimize
        FROM documents GROUP BY lang""")),

    // ---- SQL UPDATE + predicate DELETE (r14): UPDATE evaluates its
    // assignments over the OLD rows (partial SET — `n_chars + 5`
    // reads the stored value) and routes the bounded changeset
    // through the merge machinery; DELETE with a NON-key predicate
    // scans once (file-pruned), collects the matched keys under the
    // whole-key guard, and rides the merge delete arm. The oracle
    // replays both mutations relationally. LakeCatalogSpec pins the
    // per-occurrence-rejection guards and key reassignment.
    "q262_lake_sql_update" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw262_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c262", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q262_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c262.db"): Unit
        s.sql("""CREATE TABLE graft_c262.db.u (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake`"""): Unit
        s.sql("INSERT INTO graft_c262.db.u " +
          "SELECT doc_id, n_chars, lang FROM q262_src"): Unit
        s.sql("UPDATE graft_c262.db.u SET n_chars = n_chars + 5 " +
          "WHERE doc_id % 5 = 0"): Unit
        s.sql("UPDATE graft_c262.db.u SET lang = 'xx' " +
          "WHERE lang = 'de'"): Unit
        s.sql("DELETE FROM graft_c262.db.u WHERE n_chars < 200"): Unit
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
          FROM graft_c262.db.u GROUP BY lang""")
      },
      Some("""WITH u1 AS (SELECT doc_id,
            CAST(n_chars + CASE WHEN doc_id % 5 = 0 THEN 5 ELSE 0 END
              AS BIGINT) AS n_chars, lang FROM documents),
          u2 AS (SELECT doc_id, n_chars,
            CASE WHEN lang = 'de' THEN 'xx' ELSE lang END AS lang
            FROM u1),
          f AS (SELECT * FROM u2
            WHERE n_chars >= 200 OR n_chars IS NULL)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM f GROUP BY lang""")),

    // ---- DISTRIBUTED join-based MERGE (r15 — the r14 verdict's #1
    // ask: remove the driver-collect changeset bound). The gate
    // lowers the collect bound so the whole changeset routes through
    // the join path — the key PROBE over the stats-pruned candidate
    // scan, per-touched-file rewrite tasks, executor-side key-sorted
    // insert files, one optimistic commit — then a distributed
    // predicate UPDATE and DELETE ride the same machinery. The
    // oracle replays all three mutations relationally; the driver
    // never collects a source row (LakeDistributedMergeSpec pins the
    // result-bytes contract and the broadcast-path bit-identity).
    "q263_lake_merge_distributed" -> Query(
      (s, dir) => {
        // fixture table = metadata clone of the immutable template
        // (see sqlw263Template) — the timed region holds the three
        // DML statements under test + the read-back, not the bootstrap
        // INSERT's full table write
        val tpl = sqlw263Template(s, dir)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw263_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c263", base)
        sqlwCloneMeta(tpl, base, "db/t")
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q263_src")
        s.conf.set("spark.graft.lake.mergeCollectBound", "50")
        try {
          // mixed arms over the bound → distributed probe + rewrite
          s.sql("""MERGE INTO graft_c263.db.t AS t
            USING (SELECT doc_id, n_chars * 2 AS n_chars, lang
                   FROM q263_src WHERE doc_id % 3 = 0) AS src
            ON t.doc_id = src.doc_id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *"""): Unit
          // distributed predicate UPDATE (whole-key guard included)
          s.sql("UPDATE graft_c263.db.t SET n_chars = n_chars + 1 " +
            "WHERE doc_id % 5 = 0"): Unit
          // distributed predicate DELETE (delete-arm route)
          s.sql("DELETE FROM graft_c263.db.t " +
            "WHERE n_chars < 400"): Unit
        } finally
          s.conf.unset("spark.graft.lake.mergeCollectBound")
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
          FROM graft_c263.db.t GROUP BY lang""")
      },
      Some("""WITH t0 AS (SELECT doc_id, CAST(n_chars AS BIGINT)
              AS n_chars, lang FROM documents WHERE doc_id % 2 = 0),
          u AS (SELECT doc_id, CAST(n_chars * 2 AS BIGINT) AS n_chars,
            lang FROM documents WHERE doc_id % 3 = 0),
          merged AS (
            SELECT t0.doc_id,
              CASE WHEN u.doc_id IS NOT NULL THEN u.n_chars
                ELSE t0.n_chars END AS n_chars,
              CASE WHEN u.doc_id IS NOT NULL THEN u.lang
                ELSE t0.lang END AS lang
            FROM t0 LEFT JOIN u USING (doc_id)
            UNION ALL
            SELECT u.doc_id, u.n_chars, u.lang FROM u
            WHERE u.doc_id NOT IN (SELECT doc_id FROM t0)),
          upd AS (SELECT doc_id,
            CAST(n_chars + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
              AS BIGINT) AS n_chars, lang FROM merged),
          f AS (SELECT * FROM upd
            WHERE n_chars >= 400 OR n_chars IS NULL)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM f GROUP BY lang"""),
      prepare = Some((s, d) => { sqlw263Template(s, d): Unit })),

    // ---- INSERT OVERWRITE / dynamic partition overwrite (r15 — the
    // r14 verdict's #2 ask: the second-most-common write verb after
    // append). The gate drives all three overwrite shapes as SQL over
    // a PARTITIONED lake table — a static partition-scoped overwrite
    // (only 'de' replaced), a dynamic overwrite (exactly the written
    // partitions replaced), then a full overwrite — and reads a
    // pre-overwrite snapshot back through time travel, proving the
    // overwrite is one remove+add commit, never a data loss. The
    // oracle replays the partition arithmetic relationally.
    "q264_lake_insert_overwrite" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw264_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c264", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q264_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c264.db"): Unit
        s.sql("""CREATE TABLE graft_c264.db.t (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake` PARTITIONED BY (lang)"""): Unit
        s.sql("INSERT INTO graft_c264.db.t " +
          "SELECT doc_id, n_chars, lang FROM q264_src"): Unit // v1
        // static partition overwrite: 'de' docs halve their n_chars
        s.sql("""INSERT OVERWRITE graft_c264.db.t PARTITION (lang = 'de')
          SELECT doc_id, CAST(n_chars / 2 AS BIGINT) FROM q264_src
          WHERE lang = 'de'"""): Unit // v2
        // dynamic overwrite: 'en' replaced by its doubled rows; every
        // other partition must survive untouched
        s.conf.set("spark.sql.sources.partitionOverwriteMode",
          "dynamic")
        try
          s.sql("""INSERT OVERWRITE graft_c264.db.t
            SELECT doc_id, n_chars * 2, lang FROM q264_src
            WHERE lang = 'en'"""): Unit // v3
        finally
          s.conf.unset("spark.sql.sources.partitionOverwriteMode")
        val headAgg = s.sql("""SELECT lang, count(*) AS n,
          sum(n_chars) AS sum_chars FROM graft_c264.db.t
          GROUP BY lang""")
        // time travel across BOTH overwrites: v1 is the raw insert
        // (an EMPTY source commits no v1 — time travel then resolves
        // v0's empty live set; null-safe reads keep the empty-input
        // law)
        val maxV = graft.operators.TxLog
          .commitVersions(s"$base/db/t/log").max
        val v1 = s.sql(s"""SELECT count(*) AS n0, sum(n_chars) AS s0
          FROM graft_c264.db.t VERSION AS OF ${math.min(1L, maxV)}""")
          .head()
        headAgg.withColumn("pre_n", lit(v1.getLong(0)))
          .withColumn("pre_sum",
            if (v1.isNullAt(1)) lit(null).cast("long")
            else lit(v1.getLong(1)))
      },
      Some("""WITH t AS (SELECT doc_id,
            CAST(CASE WHEN lang = 'de' THEN n_chars // 2
                      WHEN lang = 'en' THEN n_chars * 2
                      ELSE n_chars END AS BIGINT) AS n_chars, lang
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST((SELECT count(*) FROM documents) AS BIGINT) AS pre_n,
          CAST((SELECT sum(n_chars) FROM documents) AS BIGINT)
            AS pre_sum
        FROM t GROUP BY lang""")),

    // ---- SCAN STATISTICS → Catalyst (r15 — the r14 verdict's #3
    // ask): the lake scan reports exact post-pruning row counts and
    // width-scaled sizes via SupportsReportStatistics, so a small
    // lake dim table broadcast-joins a big probe frame at PLAN time —
    // no first-shuffle-then-AQE-rescue. The gate builds a lake dim,
    // joins the documents probe with AQE OFF, REQUIRES the initial
    // physical plan to carry a BroadcastHashJoin (in-query plan law),
    // and the join aggregate must match DuckDB's replay.
    "q265_lake_report_statistics" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakest_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
          graft.operators.TxLog.metaDataLine(Seq(
            graft.operators.TxLog.MetaCol("doc_id", "long",
              nullable = false),
            graft.operators.TxLog.MetaCol("w", "long",
              nullable = true))),
          graft.operators.TxLog.commitInfoLine("CREATE TABLE")))
        // the dim: one weight row per distinct lang bucket key
        docs(s, dir).select((col("doc_id") % 64).as("doc_id"))
          .distinct()
          .select(col("doc_id"), (col("doc_id") * 7 + 1).as("w"))
          .coalesce(1)
          .write.format("graft-lake").option("path", base)
          .mode("append").save()
        val dim = s.read.format("graft-lake").option("path", base)
          .load()
        val probe = docs(s, dir).select(col("doc_id"),
          (col("doc_id") % 64).as("k"),
          col("n_chars").cast("long").as("n_chars"))
        s.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val j = probe.join(dim.select(col("doc_id").as("k"),
            col("w")), Seq("k"))
          // the plan law, enforced IN the gate: statistics must make
          // the lake side broadcast at PLAN time (AQE is off — there
          // is no rescue)
          val plan = j.queryExecution.executedPlan.toString
          require(plan.contains("BroadcastHashJoin"),
            "lake scan statistics did not produce a plan-time " +
              "broadcast join:\n" + plan)
          j.groupBy((col("k") % 8).as("bucket"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_chars") * col("w")).as("weighted"))
        } finally s.conf.unset("spark.sql.adaptive.enabled")
      },
      Some("""WITH dim AS (SELECT DISTINCT doc_id % 64 AS k,
            (doc_id % 64) * 7 + 1 AS w FROM documents)
        SELECT d.doc_id % 64 % 8 AS bucket,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(d.n_chars * dim.w) AS BIGINT) AS weighted
        FROM documents d JOIN dim ON d.doc_id % 64 = dim.k
        GROUP BY 1""")),

    // ---- RESTORE TABLE (r15 — the r14 verdict's #4 ask: Delta's
    // version rollback). The gate mutates a table through insert →
    // UPDATE → DELETE → OPTIMIZE, CALLs graft.system.restore back to
    // the pre-mutation version, and proves (a) the restored head
    // reads bit-identically to VERSION AS OF n (compared IN the gate
    // via a relational anti-join that must be empty), (b) DESCRIBE
    // HISTORY stamps the RESTORE, (c) the pre-restore head is still
    // time-travelable — history only grows. The final aggregate is
    // the restored (= original) table, replayed by DuckDB.
    "q266_lake_restore" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw266_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c266", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q266_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c266.db"): Unit
        s.sql("""CREATE TABLE graft_c266.db.r (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake`"""): Unit
        s.sql("INSERT INTO graft_c266.db.r " +
          "SELECT doc_id, n_chars, lang FROM q266_src"): Unit // v1
        s.sql("UPDATE graft_c266.db.r SET n_chars = n_chars * 10 " +
          "WHERE doc_id % 4 = 0"): Unit // v2
        s.sql("DELETE FROM graft_c266.db.r " +
          "WHERE n_chars < 150"): Unit // v3
        s.sql("CALL graft_c266.system.optimize(table => 'db.r', " +
          "target_rows => 1000000)"): Unit // v4 (or no-op)
        val preRestoreHead = s.sql(
          "SELECT count(*) FROM graft_c266.db.r").head().getLong(0)
        s.sql("CALL graft_c266.system.restore(table => 'db.r', " +
          "version => 1)"): Unit
        // law (a): restored head ≡ VERSION AS OF 1, row-exact
        val diff = s.sql("""SELECT * FROM graft_c266.db.r
            EXCEPT ALL
            SELECT * FROM graft_c266.db.r VERSION AS OF 1
          UNION ALL
            SELECT * FROM graft_c266.db.r VERSION AS OF 1
            EXCEPT ALL SELECT * FROM graft_c266.db.r""").count()
        require(diff == 0L,
          s"restored head differs from VERSION AS OF 1 by $diff rows")
        // law (b): the history stamps the restore
        val nRestore = s.sql("CALL graft_c266.system.describe_history(" +
            "table => 'db.r')")
          .where(col("op") === "RESTORE").count()
        require(nRestore == 1L, "history must stamp RESTORE")
        // law (c): the pre-restore head still time-travels
        val stillThere = s.sql("""SELECT count(*) FROM
          graft_c266.db.r VERSION AS OF 3""").head().getLong(0)
        require(stillThere == preRestoreHead,
          "pre-restore snapshot must stay readable")
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
          FROM graft_c266.db.r GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang""")),

    // ---- CATALOG-NAME STREAMING (r15 — the r14 verdict's #5 ask:
    // streaming consumers had to know the warehouse path, bypassing
    // the catalog). `spark.readStream.table("cat.db.t")` composes
    // with `startingVersion` (reader options now flow through
    // `newScanBuilder` into a derived table) and
    // `writeStream.toTable` appends through the same exactly-once
    // epoch-fenced sink — all by NAME. The gate streams src→dst
    // starting at version 2 (v1 must be skipped), then appends v3 to
    // src and RESUMES from the same checkpoint (only v3's rows may
    // arrive — offsets survive). The oracle replays the v2+v3 slice.
    "q267_lake_stream_by_name" -> Query(
      (s, dir) => {
        // appId-stable base, NO dir hash (the catalog instance is
        // CACHED per session with its first warehouse — a dir-varying
        // base desyncs the cached catalog from the wiped directory)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw267_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c267", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q267_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c267.db"): Unit
        Seq("src", "dst").foreach { t =>
          s.sql(s"""CREATE TABLE graft_c267.db.$t (
            doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
            USING `graft-lake`"""): Unit
        }
        (0 until 2).foreach { b => // v1, v2
          s.sql("INSERT INTO graft_c267.db.src " +
            s"SELECT doc_id, n_chars, lang FROM q267_src " +
            s"WHERE doc_id % 3 = $b"): Unit
        }
        val ck = s"$base/ck267"
        def drain(): Unit = {
          val q = s.readStream
            .option("startingVersion", 2) // v1 (doc_id%3=0) skipped
            .table("graft_c267.db.src")
            .writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger
              .AvailableNow())
            .option("checkpointLocation", ck)
            .toTable("graft_c267.db.dst")
          q.awaitTermination()
        }
        drain() // emits v2 (doc_id%3=1)
        s.sql("INSERT INTO graft_c267.db.src " +
          "SELECT doc_id, n_chars, lang FROM q267_src " +
          "WHERE doc_id % 3 = 2"): Unit // v3
        drain() // checkpoint resume: only v3 arrives
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
          FROM graft_c267.db.dst GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE doc_id % 3 IN (1, 2)
        GROUP BY lang""")),

    // ---- DELETION-VECTOR UPDATE (r15 — the r14 verdict's #6 ask:
    // small updates still rewrote whole files). A 1-row SQL UPDATE of
    // a large file now expresses as DV + re-insert — the gate PROVES
    // no-rewrite relationally (the original data file must still be
    // live, with exactly one dead ordinal, plus one 1-row add) and
    // the final aggregate + the COUNT(*) pushdown (which must
    // subtract the DV) replay in DuckDB.
    "q268_lake_dv_update" -> Query(
      (s, dir) => {
        import s.implicits._
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakedvu_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        new java.io.File(s"$base/data").mkdirs()
        graft.operators.TxLog.commitVersion(s"$base/log", 0L, Seq(
          graft.operators.TxLog.metaDataLine(Seq(
            graft.operators.TxLog.MetaCol("doc_id", "long",
              nullable = false),
            graft.operators.TxLog.MetaCol("n_chars", "long",
              nullable = true),
            graft.operators.TxLog.MetaCol("lang", "string",
              nullable = true))),
          graft.operators.TxLog.commitInfoLine("CREATE TABLE")))
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .coalesce(1)
          .write.format("graft-lake").option("path", base)
          .mode("append").save()
        val liveBefore = graft.operators.TxLog
          .resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
          .map(_.path).toSet
        // the 1-row update, through the merge machinery
        graft.operators.LakeMaintenance.merge(s, base,
          Seq((42L, Array[Any](java.lang.Long.valueOf(42L),
            java.lang.Long.valueOf(123456L), "zz"))),
          "doc_id", insertUnmatched = false): Unit
        val after = graft.operators.TxLog
          .resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
        // the no-rewrite law, enforced IN the gate
        require(liveBefore.subsetOf(after.map(_.path).toSet),
          "a 1-row UPDATE must not rewrite the large file")
        require(after.exists(f => liveBefore(f.path) &&
            f.dvRows == 1L),
          "the original file must carry a 1-ordinal deletion vector")
        require(after.exists(f => !liveBefore(f.path) && f.size == 1L),
          "the updated row must re-insert as one small add")
        val t = s.read.format("graft-lake").option("path", base).load()
        val total = t.agg(count(lit(1)).as("n")).as[Long].head()
        t.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"))
          .withColumn("total", lit(total))
      },
      Some("""WITH t AS (SELECT doc_id,
            CASE WHEN doc_id = 42 THEN 123456
              ELSE n_chars END AS n_chars,
            CASE WHEN doc_id = 42 THEN 'zz' ELSE lang END AS lang
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST((SELECT count(*) FROM t) AS BIGINT) AS total
        FROM t GROUP BY lang""")),

    // ---- SHALLOW CLONE (r15 — Delta's CREATE TABLE … SHALLOW
    // CLONE): `CALL graft.system.clone(source, target)` materializes
    // a new table whose v0 references the source's live files — ZERO
    // data files copy (the gate enforces an empty clone data dir
    // in-query), then the clone mutates independently (UPDATE +
    // DELETE) while the source must read back bit-unchanged. The
    // oracle replays the clone's mutations AND the source's
    // untouched aggregate in one frame.
    "q269_lake_clone" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_sqlw269_" +
          s.sparkContext.applicationId
        sqlLakeReset(s, "graft_c269", base)
        docs(s, dir).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars"), col("lang"))
          .createOrReplaceTempView("q269_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_c269.db"): Unit
        s.sql("""CREATE TABLE graft_c269.db.src (
          doc_id BIGINT NOT NULL, n_chars BIGINT, lang STRING)
          USING `graft-lake`"""): Unit
        s.sql("INSERT INTO graft_c269.db.src " +
          "SELECT doc_id, n_chars, lang FROM q269_src"): Unit
        s.sql("CALL graft_c269.system.clone(source => 'db.src', " +
          "target => 'db.dst')"): Unit
        // the no-copy law, enforced IN the gate
        val copied = Option(new java.io.File(s"$base/db/dst/data")
          .listFiles()).toSeq.flatten.count(_.isFile)
        require(copied == 0,
          s"shallow clone copied $copied data files")
        // the clone mutates independently…
        s.sql("UPDATE graft_c269.db.dst SET n_chars = n_chars * 2 " +
          "WHERE doc_id % 3 = 0"): Unit
        s.sql("DELETE FROM graft_c269.db.dst WHERE n_chars < 400"): Unit
        // …while the source stays bit-identical (empty symmetric diff)
        val diff = s.sql("""SELECT doc_id, n_chars, lang
            FROM graft_c269.db.src
          EXCEPT ALL SELECT doc_id, n_chars, lang FROM q269_src
          UNION ALL
          SELECT doc_id, n_chars, lang FROM q269_src
          EXCEPT ALL SELECT doc_id, n_chars, lang
            FROM graft_c269.db.src""").count()
        require(diff == 0L, s"clone mutation leaked into the source")
        s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
          FROM graft_c269.db.dst GROUP BY lang""")
      },
      Some("""WITH u AS (SELECT doc_id,
            CAST(n_chars * CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END
              AS BIGINT) AS n_chars, lang FROM documents),
          f AS (SELECT * FROM u
            WHERE n_chars >= 400 OR n_chars IS NULL)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM f GROUP BY lang""")),

    // ---- CONVERT in place (r15 — Delta's CONVERT TO DELTA): an
    // existing directory of SPARK-WRITTEN parquet files (snappy,
    // dictionary pages — the external world's encodings, decoded
    // through our codec seam) registers as a lake table with ONE
    // metadata commit and zero rewrites; the gate then proves full
    // lake citizenship by running a row-level DELETE over the
    // converted files and time-traveling back across it. The oracle
    // replays both states.
    "q270_lake_convert" -> Query(
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_lakecv_" +
          s.sparkContext.applicationId + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        def del(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(del)
          f.delete(): Unit
        }
        del(new java.io.File(base))
        // typed Dataset: the encoder's primitive Long makes doc_id
        // REQUIRED in the written files (a plain DataFrame write
        // marks every column optional, and the merge key must be a
        // required long)
        locally {
          import s.implicits._
          docs(s, dir).select(col("doc_id"),
              col("n_chars").cast("long").as("n_chars"), col("lang"))
            .as[(Long, Option[Long], String)]
            .map(identity) // encoder round-trip: non-null _1 schema
            .toDF("doc_id", "n_chars", "lang")
            .repartitionByRange(4, col("doc_id"))
            .sortWithinPartitions(col("doc_id"))
            .write.option("compression", "snappy")
            .parquet(s"$base/data")
        }
        val r = graft.operators.LakeMaintenance.convert(s, base)
        require(r.files > 0 && r.version == 0L, "convert failed")
        // full citizenship: a row-level delete over converted files
        s.read.format("graft-lake").option("path", base).load()
          .createOrReplaceTempView("q270_t")
        graft.operators.LakeMaintenance.merge(s, base, Seq.empty,
          "doc_id", deletes = docs(s, dir)
            .where(col("doc_id") % 11 === 0)
            .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
          ): Unit
        val t = s.read.format("graft-lake").option("path", base).load()
        val pre = s.read.format("graft-lake").option("path", base)
          .option("asOf", "0").load().count() // time travel across it
        t.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"))
          .withColumn("pre_delete", lit(pre))
      },
      Some("""WITH kept AS (SELECT * FROM documents
            WHERE doc_id % 11 <> 0)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST((SELECT count(*) FROM documents) AS BIGINT)
            AS pre_delete
        FROM kept GROUP BY lang"""))
  )
}
