package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Sampling}

/** End-to-end curation pipeline integration: the L-family operators
  * composed the way a real training-data run chains them —
  * data card → exact dedup keepers → DSIR importance scoring →
  * leakage-safe split → per-source caps — with the cross-stage
  * invariants asserted (conservation, no-straddle, cap bounds), not
  * just per-operator outputs. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // 60 docs over 3 sources; ids 50/51 and 52/53 are exact dup pairs
    // across sources; a planted en-heavy slice drives DSIR.
    val rows = (0 until 50).map { i =>
      val src = s"s${i % 3}"
      val lang = if (i % 4 == 0) "en" else "de"
      val text = (0 until 5 + i % 7).map(t => s"w${(i * 3 + t) % 17}").mkString(" ")
      (i.toLong, src, lang, text)
    } ++ Seq(
      (50L, "s0", "en", "dup alpha beta gamma"),
      (51L, "s1", "en", "dup alpha beta gamma"),
      (52L, "s2", "de", "dup delta epsilon"),
      (53L, "s0", "de", "dup delta epsilon"),
      (54L, "s1", "en", "unique closing doc words"))
    rows.toDF("doc_id", "source", "lang", "text")
  }

  test("datacard totals reconcile with the corpus and the dedup stage") {
    val docs = corpus
    val card = Curation.dataCard(docs, col("source"), col("doc_id"),
      col("text"), col("lang")).collect()
    card.map(_.getLong(1)).sum shouldBe 55L // n_docs sums to corpus size
    // distinct keys per source reconcile with exactGroups over the slice
    val keepers = Dedup.exactGroups(docs, col("doc_id"),
      Dedup.contentKey(col("text")))
    // global distinct (53 = 55 - one dup in each planted pair)
    keepers.count() shouldBe 53L
  }

  test("leakage-safe split never straddles a dup pair; caps bound per-source") {
    val docs = corpus
    val scored = Curation.importanceWeights(docs, col("doc_id"), col("text"),
      col("lang") === "en", 64)
    scored.count() shouldBe 55L // every doc scored
    val split = Sampling.leakageSafeSplit(
      docs.withColumn("ckey", Dedup.contentKey(col("text"))),
      col("ckey"), trainPerMille = 700, salt = "pipe")
    // content-keyed split: both members of each planted dup pair land
    // on the SAME side — the invariant that makes heldout sets honest
    val sides = split.select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sides(50L) shouldBe sides(51L)
    sides(52L) shouldBe sides(53L)
    split.count() shouldBe 55L // conservation
    // per-source cap on the scored train side: at most 10 survive/source
    val train = split.where(col("split") === "train")
      .join(scored.select(col("doc_id"), col("dsir_score")), "doc_id")
    val capped = Curation.capPerGroup(train, col("source"),
      Seq(col("dsir_score").desc, col("doc_id")), k = 10)
    val bySrc = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.values.foreach(_ should be <= 10L)
    // determinism of the whole chain under repartitioning
    val again = Curation.capPerGroup(
      Sampling.leakageSafeSplit(
        docs.repartition(7).withColumn("ckey", Dedup.contentKey(col("text"))),
        col("ckey"), 700, "pipe")
        .where(col("split") === "train")
        .join(scored.select(col("doc_id"), col("dsir_score")), "doc_id"),
      col("source"), Seq(col("dsir_score").desc, col("doc_id")), k = 10)
    again.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      capped.select("doc_id").collect().map(_.getLong(0)).sorted
  }
}
