package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** [[Similarity.pqEncode]] / [[Similarity.pqRecall]] — product
  * quantization laws: codes come from the elected codebook, the
  * reconstruction is the concatenation of the chosen sub-centroids, a
  * centroid row reconstructs itself exactly, and electing EVERY row
  * degenerates ADC search to the exact search (recall = 1). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def corpus(n: Int) = (0L until n.toLong).map { id =>
    (id, Array.tabulate(dim)(j =>
      (math.sin(id * 2.3 + j * 1.1) * 3 + (id % 5)).toFloat))
  }.toDF("vec_id", "embedding")

  test("codes are elected ids; recon concatenates the chosen sub-centroids") {
    val df = corpus(30)
    val out = Similarity.pqEncode(df, col("vec_id") % 10 === 1, 2)
    val centIds = Set(1L, 11L, 21L)
    val rows = out.collect()
    rows.length shouldBe 30
    rows.foreach { r =>
      val c0 = r.getAs[Long]("code_0"); val c1 = r.getAs[Long]("code_1")
      centIds should contain(c0)
      centIds should contain(c1)
      r.getSeq[Double](r.fieldIndex("recon")).length shouldBe dim
    }
    // a centroid row picks itself in every subspace and reconstructs
    // itself exactly (float-widened)
    val cent = rows.find(_.getLong(0) == 11L).get
    cent.getAs[Long]("code_0") shouldBe 11L
    cent.getAs[Long]("code_1") shouldBe 11L
    val emb = cent.getSeq[Float](1).map(_.toDouble)
    cent.getSeq[Double](cent.fieldIndex("recon")) shouldBe emb
  }

  test("electing every row makes ADC search exact: recall = 1.0 per probe") {
    val df = corpus(40)
    val out = Similarity.pqRecall(df, isProbe = col("vec_id") % 13 === 0,
        isCentroid = lit(true), m = 2, k = 3)
      .collect()
    out.length shouldBe 4 // probes 0, 13, 26, 39
    out.foreach { r =>
      r.getAs[Long]("n_hit") shouldBe 3L
      r.getAs[Double]("recall") shouldBe 1.0
    }
  }

  test("ivfPqRecall with nProbe = nCells degenerates to plain PQ recall") {
    val df = corpus(60)
    val isProbe = col("vec_id") % 20 === 0
    val isCent = col("vec_id") % 10 === 1 // 6 cells
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("probe_id", "n_hit", "recall")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val full = rows(Similarity.ivfPqRecall(df, isProbe, isCent,
      m = 2, k = 3, nProbe = 6))
    val pq = rows(Similarity.pqRecall(df, isProbe, isCent, m = 2, k = 3))
    full shouldBe pq
    // narrowing nProbe is well-formed and keeps the probe frame intact
    // (hit counts are NOT monotone in nProbe in general — dropping a
    // wrong high-ADC candidate can admit a right one — so only shape
    // and bounds are law)
    val narrow = rows(Similarity.ivfPqRecall(df, isProbe, isCent,
      m = 2, k = 3, nProbe = 1))
    narrow.map(_._1) shouldBe full.map(_._1)
    narrow.foreach { case (_, h, rec) =>
      h should be >= 0L
      h should be <= 3L
      rec shouldBe h.toDouble / 3 +- 1e-15
    }
  }

  test("codebook save/load round trip: assignment from the artifact is bit-exact") {
    val df = corpus(50)
    val isCent = col("vec_id") % 10 === 1
    val path = java.nio.file.Files.createTempDirectory("graft_cb").toString
    Similarity.saveCodebook(df, isCent, path)
    val fromDisk = Similarity.assignCells(df, Similarity.loadCodebook(spark, path))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val live = Similarity.assignCells(df, df.filter(isCent))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fromDisk shouldBe live
    // the artifact is ONE small parquet file
    new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet")) shouldBe 1
  }

  test("recall is monotone-bounded and deterministic under repartitioning") {
    val df = corpus(60)
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqRecall(d, col("vec_id") % 20 === 0,
          col("vec_id") % 7 === 1, m = 2, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    val a = run(df)
    a.foreach { case (_, nHit, rec) =>
      nHit should be >= 0L
      nHit should be <= 3L
      rec shouldBe nHit.toDouble / 3 +- 1e-15
    }
    run(df.repartition(7)) shouldBe a
  }
}
