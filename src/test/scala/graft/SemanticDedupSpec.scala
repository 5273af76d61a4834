package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.semanticDedup]] — cluster-then-prune semantics on a
  * constructed corpus: near-identical vectors group under one keeper,
  * distinct vectors stay singleton keepers, groups never span cells.
  * Plus the [[Similarity.planesFor]] sizing rule (the fix for the
  * measured q92 sf5 blow-up). */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Two well-separated directions; duplicates are tiny perturbations. */
  private def unit(axis: Int): Seq[Float] =
    (0 until dim).map(j => if (j == axis) 1f else 0f)
  private def near(axis: Int, eps: Float): Seq[Float] =
    (0 until dim).map(j => if (j == axis) 1f else eps)

  private lazy val corpus = Seq(
    (0L, unit(0)),            // centroid A (vec_id % 4 == 0 below)
    (4L, unit(5)),            // centroid B
    (1L, near(0, 0.01f)),     // dup of 2 (same direction as axis 0)
    (2L, near(0, 0.02f)),
    (5L, near(5, 0.01f)),     // dup of 6
    (6L, near(5, 0.015f)),
    (3L, (0 until dim).map(j => if (j < 2) 0.7f else -0.7f))  // loner near A? distinct
  ).toDF("vec_id", "embedding")

  private lazy val result = Similarity.semanticDedup(corpus,
      isCentroid = col("vec_id") % 4 === 0, threshold = 0.95)
    .orderBy("vec_id").cache()

  test("near-identical vectors share a group with the min-id keeper") {
    val groups = result.select("vec_id", "group_id")
      .as[(Long, Long)].collect().toMap
    // the exact centroid vectors sit in the same direction as their
    // perturbed copies, so they join the groups: {0,1,2} and {4,5,6}
    groups(0L) shouldBe 0L
    groups(1L) shouldBe 0L
    groups(2L) shouldBe 0L
    groups(5L) shouldBe 4L
    groups(6L) shouldBe 4L
  }

  test("exactly one keeper per group; singletons keep themselves") {
    val byGroup = result.select("group_id", "is_keeper")
      .as[(Long, Long)].collect().groupBy(_._1)
    byGroup.values.foreach(g => g.count(_._2 == 1L) shouldBe 1)
    // the loner is its own keeper
    result.where(col("vec_id") === 3L).select("is_keeper")
      .as[Long].head() shouldBe 1L
  }

  test("groups never span cells (within-cell join only)") {
    val cells = result.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    result.select("group_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).values.foreach { members =>
        members.map(m => cells(m._2)).distinct.length shouldBe 1
      }
  }

  test("every input row appears exactly once") {
    result.count() shouldBe 7L
    result.select("vec_id").distinct().count() shouldBe 7L
  }

  test("autoCodebook: cell count follows the corpus (linear pair volume)") {
    // the quadratic failure mode this pins out: a caller-pinned codebook
    // keeps cells constant while n grows, so ~n²/cells pairs go
    // quadratic. Hash election at a fixed stride keeps expected cell
    // POPULATION constant — centroid count must scale ~linearly with n.
    def centroids(n: Int): Long =
      (0L until n.toLong).map(i => (i, Array.fill(4)(0.1f)))
        .toDF("vec_id", "embedding")
        .where(Similarity.autoCodebook(targetCell = 64L)).count()
    val c1k = centroids(1000)
    val c10k = centroids(10000)
    assert(c1k > 0, "a 1k corpus must elect at least one centroid")
    // 10× the corpus → ~10× the cells (Poisson tolerance, seed-free)
    assert(c10k > c1k * 5 && c10k < c1k * 20,
      s"cells must grow with n: $c1k @1k vs $c10k @10k")
  }

  test("semanticDedupAutoSized matches semanticDedup on its own election") {
    val auto = Similarity.semanticDedupAutoSized(corpus, threshold = 0.95,
      targetCell = 3L).orderBy("vec_id").collect()
    val manual = Similarity.semanticDedup(corpus,
      Similarity.autoCodebook(3L), threshold = 0.95)
      .orderBy("vec_id").collect()
    auto shouldBe manual
    auto.length shouldBe 7
  }

  test("planesFor: bit-search sizing rule") {
    Similarity.planesFor(500L, 125L) shouldBe 2
    Similarity.planesFor(5000L, 125L) shouldBe 6
    Similarity.planesFor(250000L, 125L) shouldBe 11
    Similarity.planesFor(10L, 125L) shouldBe 1          // floor at 1
    // monotonic in n
    val ps = Seq(100L, 1000L, 10000L, 100000L, 1000000L)
      .map(Similarity.planesFor(_, 125L))
    ps shouldBe ps.sorted
    // bucket expectation: n / 2^p ≤ target
    Seq(500L, 5000L, 250000L, 12345678L).foreach { n =>
      val p = Similarity.planesFor(n, 125L)
      (n >> p) should be <= 125L
    }
  }
}
