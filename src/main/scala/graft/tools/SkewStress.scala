package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Hot-key stress for the block/CDC dedup family (VERDICT r6 #6): a
  * boilerplate-heavy corpus — 90% of documents are ONE identical
  * disclaimer — concentrates a single block hash / chunk key on ~90% of
  * all block/chunk rows. SURVEY's "first-occurrence election is
  * uniform, skew-free" claim assumed near-unique content keys; this
  * fixture is the adversarial case that assumption ignored.
  *
  * Measures BOTH election shapes ([[Curation.blockDedup]] /
  * [[Curation.cdcChunks]] `skewSafe` flag) on the hot fixture AND on a
  * uniform (all-unique) fixture of the same size, checks the two
  * elections agree bit-for-bit, and prints one JSON line — the numbers
  * behind the SCALE.md r7 decision rule: window election (default) for
  * near-unique keys, map-combined MIN_BY for boilerplate-heavy corpora
  * where a window's single-task per-key sort is the cluster-death mode.
  *
  * Usage: spark-submit --class graft.tools.SkewStress <jar> [nDocs]
  */
object SkewStress {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = SparkSession.builder()
      .appName("graft-skew-stress")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, n) finally spark.stop()
  }

  /** hotShare of the docs are one 24-token disclaimer (3 identical
    * 8-token blocks, a few identical CDC chunks); the rest carry
    * disjoint per-doc tokens. hotShare = 0 → the uniform fixture. */
  def corpus(spark: SparkSession, n: Int, hotPerTen: Int): DataFrame = {
    val disclaimer = (0 until 24).map(j => s"term$j").mkString(" ")
    spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 10 < hotPerTen, lit(disclaimer))
        .otherwise(array_join(transform(sequence(lit(0), lit(23)),
          j => concat(lit("u"), (col("id") * 31 + j))), " ")).as("text"))
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def run(spark: SparkSession, n: Int): Unit = {
    def blockDigest(df: DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("n_kept")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    def cdcDigest(df: DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("is_first")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val out = for ((label, hotPerTen) <- Seq("hot90" -> 9, "uniform" -> 0)) yield {
      val docs = corpus(spark, n, hotPerTen).localCheckpoint() // freeze fixture
      // warm ALL FOUR code paths before timing any of them — the A/B is
      // meaningless if one arm pays first-run JIT/plan compilation (the
      // repo's bench-noise invariant: never act on unwarmed numbers)
      blockDigest(Curation.blockDedup(docs, col("doc_id"), col("text"), 8))
      blockDigest(Curation.blockDedup(docs, col("doc_id"), col("text"), 8,
        skewSafe = true))
      cdcDigest(Curation.cdcChunks(docs, col("doc_id"), col("text"), 16))
      cdcDigest(Curation.cdcChunks(docs, col("doc_id"), col("text"), 16,
        skewSafe = true))
      val (bw, bwSec) = time(blockDigest(
        Curation.blockDedup(docs, col("doc_id"), col("text"), 8)))
      val (bs, bsSec) = time(blockDigest(
        Curation.blockDedup(docs, col("doc_id"), col("text"), 8, skewSafe = true)))
      require(bw == bs, s"$label block election diverged: window=$bw min_by=$bs")
      val (cw, cwSec) = time(cdcDigest(
        Curation.cdcChunks(docs, col("doc_id"), col("text"), 16)))
      val (cs, csSec) = time(cdcDigest(
        Curation.cdcChunks(docs, col("doc_id"), col("text"), 16, skewSafe = true)))
      require(cw == cs, s"$label cdc election diverged: window=$cw min_by=$cs")
      s""""$label":{"block_window_sec":$bwSec,"block_minby_sec":$bsSec,""" +
        s""""cdc_window_sec":$cwSec,"cdc_minby_sec":$csSec,""" +
        s""""block_rows":${bw._2},"block_kept":${bw._1},""" +
        s""""cdc_rows":${cw._2},"cdc_first":${cw._1}}"""
    }
    println(s"""{"fixture_docs":$n,${out.mkString(",")}}""")
  }
}
