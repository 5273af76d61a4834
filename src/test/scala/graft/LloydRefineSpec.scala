package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[graft.operators.Similarity.lloydRefine]] — the refined centroid of
  * each cell equals the quantized mean of exactly the members a
  * brute-force cosine argmax assigns to it. */
class LloydRefineSpec extends SparkSpec {
  import spark.implicits._

  private val QBits = 20
  private val Q = (1L << QBits).toDouble

  test("refined centroids are the quantized means of brute-force-nearest members") {
    val rnd = new scala.util.Random(31)
    val dim = 8
    // two well-separated directions + noise
    def vec(base: Array[Double]): Seq[Float] =
      base.map(b => (b + rnd.nextGaussian() * 0.05).toFloat).toSeq
    val aBase = Array.fill(dim)(1.0)
    val bBase = Array(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    val rows = (0L until 40L).map { i =>
      (i, vec(if (i % 2 == 0) aBase else bBase))
    }
    val df = rows.toDF("vec_id", "embedding")
    // centroid convention: ids 0 and 1 (one from each direction)
    val out = Similarity.lloydRefine(df, col("vec_id") < 2, QBits)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

    // brute-force reference in plain Scala (same fold order as VecDot)
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val cents = rows.take(2)
    def nearest(v: Seq[Float]): Long =
      cents.map { case (cid, cv) =>
        (cid, dot(v, cv) / math.sqrt(dot(v, v) * dot(cv, cv)))
      }.maxBy { case (cid, sim) => (sim, -cid) }._1
    val members = rows.groupBy { case (_, v) => nearest(v) }
    members.foreach { case (cell, ms) =>
      (0 until dim).foreach { d =>
        val qs = ms.map { case (_, v) => math.floor(v(d).toDouble * Q).toLong }
        val (n, sumQ, cNew) = out((cell, d.toLong))
        n shouldBe ms.size.toLong
        sumQ shouldBe qs.sum
        cNew shouldBe (qs.sum.toDouble / ms.size) / Q
      }
    }
    // every (cell, dim) row accounted for
    out.keySet.map(_._1) shouldBe members.keySet
  }

  test("hll estimate lands within the sketch's error envelope; bm25 scores are sane") {
    val dir = "/root/testdata/sf0.001"
    // m=256 registers -> relative error ~1.04/sqrt(256) = 6.5%; allow 3x
    SparkEntry.queries("q58_hll_distinct")(spark, dir).collect().foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(exact > 0 && math.abs(est - exact) / exact < 0.20,
        s"${r.getAs[String]("event_type")}: est $est vs exact $exact")
    }
    val bm = SparkEntry.queries("q57_bm25")(spark, dir).collect()
    assert(bm.nonEmpty)
    bm.foreach { r =>
      assert(r.getAs[Double]("score") > 0.0)
      val hits = r.getAs[Long]("n_terms_hit")
      assert(hits >= 1L && hits <= 4L)
    }
  }
}
