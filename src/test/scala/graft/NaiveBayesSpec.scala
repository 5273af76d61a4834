package graft

import org.apache.spark.sql.functions._

import graft.operators.NaiveBayes

/** Closed-form multinomial NB (q176): brute-force replay differential,
  * unseen-token and empty-class edges, partitioning invariance. */
class NaiveBayesSpec extends SparkSpec {

  /** Independent replay: Laplace-1 priors + likelihoods, per-token llk
    * quantized to 9 decimals (HALF_UP — the dsum cast) before summing. */
  private def brute(docs: Seq[(Long, Seq[String], Option[Int])])
      : Map[Long, (Double, Double, Long, Long, Long)] = {
    val tr = docs.filter(_._3.isDefined)
    val n = tr.size; val n1 = tr.count(_._3.contains(1))
    val p1 = math.log(n1 + 1.0) - math.log(n + 2.0)
    val p0 = math.log(n - n1 + 1.0) - math.log(n + 2.0)
    val cnt = scala.collection.mutable.Map.empty[(String, Int), Long]
      .withDefaultValue(0L)
    tr.foreach { case (_, ts, l) => ts.foreach(w => cnt((w, l.get)) += 1) }
    val vocab = tr.flatMap(_._2).toSet
    val tot = Map(
      0 -> cnt.collect { case ((_, 0), c) => c }.sum,
      1 -> cnt.collect { case ((_, 1), c) => c }.sum)
    def llk(w: String, c: Int): Double =
      math.log(cnt((w, c)) + 1.0) - math.log(tot(c) + vocab.size.toDouble)
    def q(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    docs.map { case (id, ts, lab) =>
      val known = ts.filter(vocab)
      // same op shape as the engine: quantized prior (one toDouble) +
      // quantized llk sum (one toDouble), then a single double add
      val s1 = q(p1).toDouble + known.map(w => q(llk(w, 1))).sum.toDouble
      val s0 = q(p0).toDouble + known.map(w => q(llk(w, 0))).sum.toDouble
      id -> (s1, s0, known.size.toLong, if (s1 > s0) 1L else 0L,
        if (lab.isDefined) 1L else 0L)
    }.toMap
  }

  private def run(docs: Seq[(Long, Seq[String], Option[Int])], parts: Int = 1)
      : Map[Long, (Double, Double, Long, Long, Long)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "toks", "lab").repartition(parts)
    NaiveBayes.classify(df, "doc_id", col("toks"), col("lab"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
  }

  private val corpus = Seq(
    (1L, Seq("good", "clean", "prose", "good"), Some(1)),
    (2L, Seq("spam", "spam", "buy", "now"), Some(0)),
    (3L, Seq("clean", "text", "good", "prose"), Some(1)),
    (4L, Seq("buy", "spam", "cheap"), Some(0)),
    (5L, Seq("good", "spam", "clean"), None),       // apply-only
    (6L, Seq("unseen", "words", "only"), None),     // all out-of-vocab
    (7L, Seq.empty[String], None))                  // zero tokens

  test("matches the brute-force NB replay, including priors-only docs") {
    run(corpus) shouldBe brute(corpus)
  }

  test("apply-side tokens outside the train vocabulary are ignored") {
    val got = run(corpus)
    got(6L)._3 shouldBe 0L // n_known
    // priors-only score == the zero-token doc's score
    got(6L)._1 shouldBe got(7L)._1
    got(6L)._2 shouldBe got(7L)._2
  }

  test("a labeled class with no documents stays finite (Laplace priors)") {
    val oneSided = corpus.map { case (id, ts, l) =>
      (id, ts, l.map(_ => 1)) // every train doc labeled 1
    }
    val got = run(oneSided)
    got.values.foreach { case (s1, s0, _, _, _) =>
      assert(!s1.isInfinite && !s0.isInfinite && !s1.isNaN && !s0.isNaN)
    }
    got shouldBe brute(oneSided)
  }

  test("scores are bit-stable under repartitioning (dsum law)") {
    run(corpus, parts = 7) shouldBe run(corpus, parts = 1)
  }
}
