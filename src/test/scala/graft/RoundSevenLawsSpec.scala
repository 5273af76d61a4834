package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Multimodal, Packing}

/** Randomized laws for the round-7 operators — properties that must
  * hold on ANY input, checked on seeded random data (the fixed-seed
  * differential-fuzz convention). */
class RoundSevenLawsSpec extends SparkSpec {
  import spark.implicits._

  test("histogramQuantiles: |est - exact| <= bound on random data, any bin count") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 4) {
      val n = 200 + rnd.nextInt(400)
      val vals = (0 until n).map(_ => (rnd.nextInt(5000) - 1000).toLong)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val bins = Seq(4, 32, 256)(trial % 3)
      val out = Curation.histogramQuantiles(df, col("v"),
        Seq(1, 10, 50, 90, 99), bins).collect()
      out.length shouldBe 5
      out.foreach { r =>
        val (pct, est, exact, err, bound) =
          (r.getLong(0), r.getDouble(4), r.getDouble(5), r.getDouble(6),
            r.getDouble(7))
        withClue(s"trial $trial bins $bins pct $pct: ") {
          err should be <= bound + 1e-9
          // exact is a real data value; est is within one bin above it
          vals.map(_.toDouble) should contain(exact)
          est should be >= exact - 1e-9
        }
      }
    }
  }

  test("packSpans: random weights (incl. zeros) tile docs and chunks") {
    val rnd = new scala.util.Random(101)
    for (_ <- 1 to 3) {
      val b = 20L + rnd.nextInt(60)
      val docs = (0L until 80L).map(id =>
        (id, s"s${id % 4}", rnd.nextInt(3) match {
          case 0 => 0L // zero-weight docs must vanish, not crash
          case _ => 1L + rnd.nextInt(100)
        })).toDF("doc_id", "stratum", "w")
      val sp = Packing.packSpans(docs, col("stratum"), col("doc_id"),
        col("w"), b, "s")
      // per-doc tiling
      val perDoc = sp.groupBy("doc_id").agg(sum("span_len").as("t"))
        .join(docs, "doc_id").collect()
      perDoc.foreach(r =>
        r.getAs[Long]("t") shouldBe r.getAs[Long]("w"))
      // zero-weight docs emit nothing
      sp.join(docs.where(col("w") === 0), "doc_id").count() shouldBe 0L
      // per-(stratum, chunk) mass never exceeds the budget
      sp.groupBy("stratum", "chunk_id").agg(sum("span_len").as("m"))
        .collect().foreach(r => r.getAs[Long]("m") should be <= b)
    }
  }

  test("wavPayload/decodeWav: extreme rates and channel counts round-trip") {
    val cases = Seq(
      (1L, Array[Byte](1, 0), 192000L, 255),  // high rate, many channels
      (2L, Array[Byte](), 8000L, 1),          // empty data chunk
      (3L, Array.fill(64)(0x7F.toByte), 4000000000L % 65536, 2)) // small rate
    val media = cases.toDF("media_id", "data", "rate", "ch")
      .select(col("media_id"), Multimodal.wavPayload(col("data"),
        col("rate"), col("ch"), lit(3L)).as("payload"))
    val got = Multimodal.decodeWav(media.as[(Long, Array[Byte])])
      .collect().map(w => w.media_id -> w).toMap
    cases.foreach { case (id, data, rate, ch) =>
      val w = got(id)
      withClue(s"case $id: ") {
        w.valid shouldBe true
        w.sample_rate shouldBe rate
        w.channels shouldBe ch
        w.n_samples shouldBe data.length / 2
      }
    }
  }

  test("shingleContainment: orientation and range laws on random corpora") {
    val rnd = new scala.util.Random(103)
    val docs = (0L until 30L).map { id =>
      val n = 4 + rnd.nextInt(30)
      (id, s"s${id % 2}", (0 until n).map(_ => s"t${rnd.nextInt(20)}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = Dedup.shingleContainment(docs, col("doc_id"), col("source"),
        col("text"), 2, maxDf = 8, minContainment = 0.1)
      .collect()
    out.foreach { r =>
      val (small, big, common, nSmall, nBig, c) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))
      withClue(s"pair ($small,$big): ") {
        small should not be big
        nSmall should be <= nBig
        common should be >= 1L
        common should be <= nSmall // intersection bounded by smaller set
        c shouldBe common.toDouble / nSmall +- 1e-12
        c should be <= 1.0 + 1e-12
      }
    }
  }
}
