package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Similarity}

/** L63/L64/L65 — truncation recall bounds and self-consistency,
  * leakage-safe split invariants, and the overlap matrix vs a
  * brute-force set intersection. */
class LeakageOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("truncatedRecall: full-dim truncation is recall 1.0 everywhere") {
    val vecs = (0L until 40L).map { i =>
      i -> (0 until 8).map(j => math.sin(i * 2.3 + j).toFloat)
    }.toDF("vec_id", "embedding")
    val out = Similarity.truncatedRecall(vecs, col("vec_id") % 10 === 0,
      k = 3, truncDim = 8)
    out.count() shouldBe 4
    out.select("recall").as[Double].collect().foreach(_ shouldBe 1.0)
  }

  test("truncatedRecall: recall in [0,1], n_hit consistent, probes all present") {
    val vecs = (0L until 60L).map { i =>
      i -> (0 until 8).map(j =>
        (math.sin(i * 2.3 + j) + math.cos(i * 0.7 * j)).toFloat)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.truncatedRecall(vecs, col("vec_id") % 12 === 0,
        k = 5, truncDim = 2)
      .select("probe_id", "n_hit", "recall").as[(Long, Long, Double)].collect()
    rows.map(_._1).sorted shouldBe Array(0L, 12L, 24L, 36L, 48L)
    rows.foreach { case (_, nHit, recall) =>
      nHit should (be >= 0L and be <= 5L)
      recall shouldBe nHit / 5.0
    }
  }

  test("leakageSafeSplit: same key always lands on the same side") {
    val df = (0L until 300L).map(i => (i, s"content${i % 40}"))
      .toDF("id", "ckey")
    val out = Sampling.leakageSafeSplit(df, col("ckey"), 700, "s1")
    // a key maps to exactly one split — the no-leakage invariant
    out.groupBy("ckey").agg(countDistinct(col("split")).as("n"))
      .where(col("n") > 1).count() shouldBe 0
    // both sides populated at 70/30 over 40 keys
    val sides = out.select("split").distinct().as[String].collect().toSet
    sides shouldBe Set("train", "heldout")
  }

  test("leakageSafeSplit rejects an out-of-range share") {
    val df = Seq((1L, "k")).toDF("id", "ckey")
    an[IllegalArgumentException] should be thrownBy
      Sampling.leakageSafeSplit(df, col("ckey"), 1001, "s1")
  }

  test("sourceOverlapMatrix matches a brute-force set intersection") {
    // Three sources with engineered overlap; shingleN=2 over short docs.
    val docs = Seq(
      (0L, "a", "x y z w"), (1L, "a", "p q r"),
      (2L, "b", "x y z k"), (3L, "b", "m n o"),
      (4L, "c", "m n o p")).toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlapMatrix(docs, col("source"), col("text"),
        shingleN = 2, maxSources = 3)
      .select("source_a", "source_b", "n_shared")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    // a: {xy, yz, zw, pq, qr}; b: {xy, yz, zk, mn, no}; c: {mn, no, op}
    out(("a", "b")) shouldBe 2L // xy, yz
    out(("b", "c")) shouldBe 2L // mn, no
    out.get(("a", "c")) shouldBe None // no shared 2-grams
  }

  test("sourceOverlapMatrix drops corpus-ubiquitous shingles at the cap") {
    val docs = Seq(
      (0L, "a", "u v extra1"), (1L, "b", "u v extra2"),
      (2L, "c", "u v extra3"), (3L, "a", "s t"), (4L, "b", "s t"))
      .toDF("doc_id", "source", "text")
    // "u v" spans 3 sources; cap 2 drops it, keeping only "s t" (a, b)
    val out = Dedup.sourceOverlapMatrix(docs, col("source"), col("text"),
        shingleN = 2, maxSources = 2)
      .select("source_a", "source_b", "n_shared")
      .as[(String, String, Long)].collect()
    out.toSeq shouldBe Seq(("a", "b", 1L))
  }
}
