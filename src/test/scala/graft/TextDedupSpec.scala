package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Dedup, Multimodal, Similarity}

/** LLM-data-pipeline operators: portable hashing, MinHash/SimHash/
  * winnowing determinism, dedup + similarity semantics. Expected values
  * are computed independently in plain Scala (MessageDigest md5) — the
  * same derivation the DuckDB oracle uses, so these tests pin the
  * cross-engine contract. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reimplementation of TextFns.hash60. */
  private def h60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("hash60 matches an independent md5-prefix derivation") {
    val words = Seq("hello", "spark table join", "a", "")
    val got = words.toDF("s").select(TextFns.hash60(col("s")).as("h"))
      .as[Long].collect()
    got shouldBe words.map(h60).toArray
  }

  test("tokens + shingles: 'a b c d' -> 3-gram shingles [a b c, b c d]") {
    val out = Seq("  a b  c d ").toDF("text")
      .select(TextFns.shingles(TextFns.tokens(col("text")), 3).as("sh"))
      .as[Seq[String]].head()
    out shouldBe Seq("a b c", "b c d")
  }

  test("shingles: doc shorter than n yields empty array") {
    Seq("a b").toDF("text")
      .select(TextFns.shingles(TextFns.tokens(col("text")), 3).as("sh"))
      .as[Seq[String]].head() shouldBe Seq.empty
  }

  test("minhashSignatures equals brute-force min over permuted shingle hashes") {
    val docs = Seq((1L, "a b c d e f"), (2L, "x y z w v")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def expected(text: String): Seq[Long] = {
      val toks = text.trim.split("\\s+")
      val hs = toks.sliding(3).map(_.mkString(" ")).map(h60(_) % TextFns.HashMod).toSeq
      (0 until 4).map(i => hs.map(h =>
        (TextFns.permA(i) * h + TextFns.permB(i)) % TextFns.HashMod).min)
    }
    sigs(1L) shouldBe expected("a b c d e f")
    sigs(2L) shouldBe expected("x y z w v")
  }

  test("exactGroups: bag-of-words permutations share a dup_key") {
    val docs = Seq((1L, "spark is fast"), (2L, "fast is spark"),
      (3L, "fast is  spark "), (4L, "something else"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs, col("doc_id"), Dedup.contentKey(col("text")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    groups.toSet shouldBe Set((1L, 3L), (4L, 1L)) // keeper 1 w/ 3 dups; keeper 4 alone
  }

  test("LSH candidate pairs: identical docs always collide; disjoint docs never") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "completely different words with nothing shared here at all"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16)
    val pairs = Dedup.lshCandidatePairs(sigs, 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 3L))
    pairs should not contain ((2L, 3L))
  }

  test("jaccardVerify: identical docs -> 1.0; half-overlap computed exactly") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c e"))
      .toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs, col("doc_id"), col("text"), 2)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.jaccardVerify(pairs, sets)
      .select("doc_a", "doc_b", "jaccard")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    out((1L, 2L)) shouldBe 1.0
    // 2-gram sets {ab,bc,cd} vs {ab,bc,ce}: 2 common, 4 union
    out((1L, 3L)) shouldBe 0.5
  }

  test("simhash: single-token doc -> low 32 bits of the token hash") {
    val out = Dedup.simhashes(Seq((1L, "hello")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).as[(Long, Long)].head()
    out._2 shouldBe (h60("hello") & 0xffffffffL)
  }

  test("simhash: near-identical docs agree on most bits, disjoint docs do not") {
    val docs = Seq(
      (1L, "spark query engine with fast joins and aggregation pipelines"),
      (2L, "spark query engine with fast joins and aggregation pipeline"),
      (3L, "zebra yak xylophone wombat vulture unicorn tapir snake rabbit"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhashes(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    hamming(sh(1L), sh(2L)) should be < hamming(sh(1L), sh(3L))
  }

  test("winnow: hand-computed window minima, deduped + sorted") {
    // hs = [5, 3, 9, 1, 7], w = 3 -> window mins [3, 1, 1] -> [1, 3]
    val hs = Seq((1L, Seq(5L, 3L, 9L, 1L, 7L))).toDF("id", "hs")
    hs.select(TextFns.winnow(col("hs"), 3).as("fps"))
      .as[Seq[Long]].head() shouldBe Seq(1L, 3L)
  }

  test("winnow: fewer shingles than the window -> global min; empty -> empty") {
    Seq((1L, Seq(9L, 4L))).toDF("id", "hs")
      .select(TextFns.winnow(col("hs"), 5).as("f")).as[Seq[Long]].head() shouldBe Seq(4L)
    Seq((1L, Seq.empty[Long])).toDF("id", "hs")
      .select(TextFns.winnow(col("hs"), 5).as("f")).as[Seq[Long]].head() shouldBe Seq.empty
  }

  test("cosine: identical vectors -> 1, orthogonal -> 0") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c")).as[Double].collect()
    out(0) shouldBe 1.0 +- 1e-12
    out(1) shouldBe 0.0
  }

  test("bruteForceTopK: correct neighbours, rank order, self excluded") {
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0.1f)), (2L, Seq(0.5f, 0.5f)),
      (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), 3)
      .orderBy("rk").select("cand_id").as[Long].collect()
    out shouldBe Array(1L, 2L, 3L) // by descending cosine to (1,0)
  }

  test("lshTopK: bucketed results carry correct exact cosines (vs brute force)") {
    val vecs = (0L until 50L).map { i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 7 + j * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 3)
    val lsh = Similarity.lshTopK(vecs, probes, 3, 4, 8)
      .select("probe_id", "cand_id", "cos")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val brute = Similarity.bruteForceTopK(vecs, probes, 49)
      .select("probe_id", "cand_id", "cos")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    lsh should not be empty
    lsh.foreach { case (k, c) => c shouldBe brute(k) +- 1e-12 }
  }

  test("ivfTopK: cell-restricted results carry exact cosines (vs brute force)") {
    val vecs = (0L until 60L).map { i =>
      (i, Seq.tabulate(8)(j => math.cos(i * 5 + j * 2).toFloat))
    }.toDF("vec_id", "embedding")
    val ivf = Similarity.ivfTopK(vecs,
        isProbe = col("vec_id") < 3, isCentroid = col("vec_id") % 20 === 1,
        k = 3, nProbe = 2)
      .select("probe_id", "cand_id", "cos")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 3), 59)
      .select("probe_id", "cand_id", "cos")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivf should not be empty
    ivf.foreach { case (k2, c) => c shouldBe brute(k2) +- 1e-12 }
  }

  test("multimodal decode stub: byte histogram is normalized and deterministic") {
    val media = Seq((1L, Array[Byte](0, 0, 16, 32, -1))).toDS()
    val out = Multimodal.decodeFeatures(media).collect().head
    out.media_id shouldBe 1L
    out.byte_len shouldBe 5
    out.features.sum shouldBe 1.0f +- 1e-6f
    out.features(0) shouldBe 0.4f // two 0x0* bytes of five
    out.features(15) shouldBe 0.2f // 0xff
  }

  test("asMediaTable: payload bytes + typed metadata struct") {
    val docs = Seq((7L, "abc", 3L)).toDF("doc_id", "text", "n_chars")
    val m = Multimodal.asMediaTable(docs).collect().head
    m.getAs[Array[Byte]]("payload") shouldBe "abc".getBytes("UTF-8")
    m.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") shouldBe 3
  }

  test("pcmWindowEnergy: hand-computed LE int16 energies; tail dropped") {
    // samples [1, -1, 256, 0] -> LE bytes 01 00 FF FF 00 01 00 00,
    // then a 9th byte that forms no full window with w=4.
    val payload = Array[Byte](0x01, 0x00, 0xFF.toByte, 0xFF.toByte,
      0x00, 0x01, 0x00, 0x00, 0x7F)
    val media = Seq((5L, payload)).toDF("media_id", "payload")
    val out = Multimodal.pcmWindowEnergy(media, 4).collect()
    out.length shouldBe 1 // partial tail window dropped
    out.head.getLong(1) shouldBe 0L
    out.head.getLong(2) shouldBe (1L + 1L + 65536L + 0L) // 1^2+(-1)^2+256^2
    out.head.getDouble(3) shouldBe math.sqrt(65538.0 / 4) +- 1e-12
  }

  test("pcmWindowEnergy kernel matches the hex+HOF witness on varied payloads") {
    val rnd = new scala.util.Random(31)
    val media = (0 until 40).map { i =>
      (i.toLong, Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte))
    }.toDF("media_id", "payload")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    rows(Multimodal.pcmWindowEnergy(media, 4)) shouldBe
      rows(Multimodal.pcmWindowEnergyHof(media, 4))
    rows(Multimodal.pcmWindowEnergy(media, 7)) shouldBe
      rows(Multimodal.pcmWindowEnergyHof(media, 7))
  }

  test("decodeWav round-trips wavPayload: fields, chunk-walked offset, exact energy") {
    // samples [1, -1, 256] -> LE bytes 01 00 FF FF 00 01
    val data = Array[Byte](0x01, 0x00, 0xFF.toByte, 0xFF.toByte, 0x00, 0x01)
    val media = Seq((9L, data)).toDF("media_id", "data")
      .select(col("media_id"), Multimodal.wavPayload(col("data"),
        lit(11025L), lit(2), lit(5)).as("payload")) // odd junk -> pad byte
    val out = Multimodal.decodeWav(media.as[(Long, Array[Byte])])
      .collect().head
    out.valid shouldBe true
    out.fmt_code shouldBe 1
    out.channels shouldBe 2
    out.sample_rate shouldBe 11025L
    out.bits shouldBe 16
    out.n_chunks shouldBe 3 // fmt, LIST, data — all walked
    out.data_off shouldBe (52L + 5 + 1) // junk 5 + RIFF pad byte
    out.n_samples shouldBe 3L
    out.energy shouldBe (1L + 1L + 65536L)
  }

  test("parseWav: hand-assembled container (independent of wavPayload) parses") {
    // Minimal canonical 44-byte WAV + 2 bytes of data: sample [-2]
    def le16(x: Int) = Array[Byte]((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)
    def le32(x: Int) = Array[Byte]((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
      ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
    val bytes = "RIFF".getBytes ++ le32(38) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(2) ++ le16(0xFFFE) // -2 as LE int16
    val out = Multimodal.parseWav(3L, bytes)
    out.valid shouldBe true
    out.channels shouldBe 1
    out.sample_rate shouldBe 8000L
    out.n_chunks shouldBe 2
    out.data_off shouldBe 44L
    out.n_samples shouldBe 1L
    out.energy shouldBe 4L
  }

  test("parseWav: malformed payloads yield valid=false, never throw") {
    import Multimodal.parseWav
    parseWav(1L, Array[Byte]()).valid shouldBe false            // empty
    parseWav(2L, "RIFX1234WAVE".getBytes).valid shouldBe false  // bad magic
    parseWav(3L, "RIFF\u0000\u0000\u0000\u0000WAVE".getBytes)
      .valid shouldBe false                                     // riff size lies
    // declared chunk size overruns the buffer -> truncated, invalid
    // (riff size field itself is consistent: 20 bytes total - 8 = 12)
    val truncated = "RIFF".getBytes ++
      Array[Byte](12, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ Array[Byte](99, 0, 0, 0)
    parseWav(4L, truncated).valid shouldBe false
  }

  test("shingleContainment flags a short doc pasted inside a long one; Jaccard misses it") {
    import graft.operators.Dedup
    // doc 0: 40 tokens; doc 1 = doc 0's middle 8 tokens verbatim;
    // doc 2: unrelated. Containment(1 in 0) = 1.0, Jaccard tiny.
    val long = (0 until 40).map(i => s"w$i").mkString(" ")
    val short = (16 until 24).map(i => s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"x$i").mkString(" ")
    val df = Seq((0L, "s", long), (1L, "s", short), (2L, "s", other))
      .toDF("doc_id", "source", "text")
    val out = Dedup.shingleContainment(df, col("doc_id"), col("source"),
        col("text"), 2, maxDf = 25, minContainment = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    out.length shouldBe 1
    val (small, big, common, nSmall, _, c) = out.head
    small shouldBe 1L // the contained side
    big shouldBe 0L
    common shouldBe nSmall // every short-doc shingle is in the long doc
    c shouldBe 1.0
    // the same pair under the Jaccard rule scores far below any
    // near-dup threshold — the asymmetric signal is the point
    (common.toDouble / (39 + nSmall - common)) should be < 0.2
  }

  test("redactDenylist: word-boundary scrub and hit count") {
    val terms = Seq("customer", "supplier")
    val out = Seq("customer a customers supplier customer")
      .toDF("text")
      .select(
        TextFns.redactDenylist(col("text"), terms, "<ent>").as("s"),
        TextFns.redactCount(col("text"), terms).as("n"))
      .as[(String, Int)].head()
    // "customers" survives: \b requires a non-word char after the term
    out._1 shouldBe "<ent> a customers <ent> <ent>"
    out._2 shouldBe 3
  }

  test("modeCount: most-frequent-token occurrences; 0 on an empty array") {
    val out = Seq(
      Seq("a", "b", "a", "c", "a", "b"), // a×3
      Seq("x"),                          // x×1
      Seq.empty[String])                 // no tokens
      .toDF("toks")
      .select(TextFns.modeCount(col("toks")).as("m"))
      .as[Int].collect()
    out.toSeq shouldBe Seq(3, 1, 0)
  }

  test("connectedComponents: chain + clique + pair, dup/self edges tolerated") {
    // chain 1-2-3-4-5 (worst case for naive propagation), clique
    // {10,11,12}, pair {20,21} given in both directions, self-loop 7.
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L), (20L, 21L), (7L, 7L))
      .toDF("u", "v")
    val got = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
  }

  test("connectedComponents matches union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // reference union-find; attaching the larger root under the smaller
    // keeps every root the minimum of its component.
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(v => edges.exists(e => (e._1 == v || e._2 == v) && e._1 != e._2))
      .map(v => v -> find(v.toInt).toLong).toMap
    val got = Dedup.connectedComponents(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    got shouldBe expected
  }

  test("duplicateSpans: cross-doc shared run merges into one maximal span") {
    // docs 1 and 2 share the 5-token run "p q r s t" (positions 3..7 in
    // doc 1, 1..5 in doc 2); with n=3 the duplicated shingles are the
    // three 3-grams inside the run — adjacent positions, one island.
    val docs = Seq(
      (1L, "a b p q r s t u v w"),
      (2L, "p q r s t x y z zz"),
      (3L, "m n o mm nn oo pp qq")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, col("doc_id"), col("text"), n = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 1: shingle positions 3,4,5 -> span tokens 3..7; doc 2: 1,2,3
    // -> tokens 1..5; doc 3: nothing duplicated.
    got shouldBe Array((1L, 3L, 7L, 3L), (2L, 1L, 5L, 3L))
  }

  test("duplicateSpans: within-doc repetition counts as duplication") {
    val docs = Seq(
      (1L, "x y z k1 k2 x y z k3"),
      (2L, "totally different words here")).toDF("doc_id", "text")
    // "x y z" occurs twice inside doc 1 (positions 1 and 6).
    val got = Dedup.duplicateSpans(docs, col("doc_id"), col("text"), n = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    got shouldBe Array((1L, 1L, 3L, 1L), (1L, 6L, 8L, 1L))
  }

  test("duplicateSpans: disjoint duplicated runs stay separate islands") {
    val docs = Seq(
      (1L, "a b c GAP1 GAP2 d e f"),
      (2L, "a b c OTHER d e f")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, col("doc_id"), col("text"), n = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    got shouldBe Array(
      (1L, 1L, 3L, 1L), (1L, 6L, 8L, 1L),
      (2L, 1L, 3L, 1L), (2L, 5L, 7L, 1L))
  }
}
