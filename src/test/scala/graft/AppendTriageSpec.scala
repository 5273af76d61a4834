package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** [[Dedup.appendTriage]] — verdict semantics on a constructed batch:
  * exact-dup (identical content, also whitespace/order permutations of
  * the token set), near-dup (small edit passing the Jaccard gate),
  * clean, and the cross-only rule (a new doc duplicating another NEW
  * doc is NOT flagged against the corpus). */
class AppendTriageSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  private lazy val corpus = Seq(
    // existing corpus (is_new = false): ids 1-3
    (1L, base, false),
    (2L, "completely different words one two three four five six seven eight nine ten eleven twelve", false),
    (3L, "another unrelated corpus document with its own vocabulary here today", false),
    // new batch: ids 11-15
    (11L, base, true),                                   // exact dup of 1
    (12L, base.replace("upsilon", "OMEGA"), true),       // near dup of 1
    (13L, "fresh unseen content nothing like the corpus at all rows cols", true), // clean
    (14L, "clone of a new doc not in corpus aa bb cc dd ee ff gg hh", true),
    (15L, "clone of a new doc not in corpus aa bb cc dd ee ff gg hh", true)  // dup of 14 (both NEW)
  ).toDF("doc_id", "text", "is_new")

  private lazy val verdicts = Dedup.appendTriage(corpus, col("is_new"),
      col("doc_id"), col("text"),
      shingleN = 3, numHashes = 16, numBands = 4, rowsPerBand = 4)
    .select("doc_id", "verdict").as[(Long, String)].collect().toMap

  test("identical content is exact_dup; exact wins over near") {
    verdicts(11L) shouldBe "exact_dup"
  }

  test("small edit is near_dup via the LSH + Jaccard gate") {
    verdicts(12L) shouldBe "near_dup"
  }

  test("unseen content is clean") {
    verdicts(13L) shouldBe "clean"
  }

  test("duplicates WITHIN the new batch do not flag against the corpus") {
    verdicts(14L) shouldBe "clean"
    verdicts(15L) shouldBe "clean"
  }

  test("every new doc gets exactly one verdict; old docs get none") {
    verdicts.keySet shouldBe Set(11L, 12L, 13L, 14L, 15L)
  }

  test("token-permuted content is exact_dup (content key is the sorted token set)") {
    val perm = base.split(" ").reverse.mkString(" ")
    val v = Dedup.appendTriage(
      corpus.union(Seq((16L, perm, true)).toDF("doc_id", "text", "is_new")),
      col("is_new"), col("doc_id"), col("text"), 3, 16, 4, 4)
      .where(col("doc_id") === 16L).select("verdict").as[String].head()
    v shouldBe "exact_dup"
  }

  test("ledger lifecycle (L119): triage against the LOADED parquet artifact " +
      "is bit-equal to triage against the in-memory ledger") {
    val dir = java.nio.file.Files.createTempDirectory("dedup_ledger").toString
    val old = corpus.where(!col("is_new")).select(col("doc_id"), col("text"))
    val neu = corpus.where(col("is_new")).select(col("doc_id"), col("text"))
    Dedup.saveDedupLedger(old, col("doc_id"), col("text"), 3, 16, s"$dir/led")
    val persisted = Dedup.appendTriageLedger(neu,
        Dedup.loadDedupLedger(spark, s"$dir/led"),
        col("doc_id"), col("text"), 3, 16, 4, 4)
      .collect().map(_.toSeq).toSet
    val live = Dedup.appendTriageLedger(neu,
        Dedup.dedupLedger(old, col("doc_id"), col("text"), 3, 16),
        col("doc_id"), col("text"), 3, 16, 4, 4)
      .collect().map(_.toSeq).toSet
    persisted shouldBe live
    persisted.size shouldBe 5
  }

  test("ledger triage semantics match the live-corpus triage on this batch " +
      "(the signature estimator agrees with exact Jaccard here)") {
    // on this constructed batch the MinHash estimate and the exact
    // Jaccard land on the same side of 1/2 for every pair, so the two
    // formulations give identical verdicts — the estimator swap is the
    // only semantic difference between appendTriage and the ledger arm
    val old = corpus.where(!col("is_new")).select(col("doc_id"), col("text"))
    val neu = corpus.where(col("is_new")).select(col("doc_id"), col("text"))
    val ledgerVerdicts = Dedup.appendTriageLedger(neu,
        Dedup.dedupLedger(old, col("doc_id"), col("text"), 3, 16),
        col("doc_id"), col("text"), 3, 16, 4, 4)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    ledgerVerdicts shouldBe verdicts
  }
}
