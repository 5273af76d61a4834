package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** [[Packing.packSpans]] tiling laws — the invariants a packed-training
  * loader depends on, independent of the DuckDB oracle (q143 pins
  * engine parity; these pin GEOMETRY):
  *  - per doc, span (doc_off, span_len) rows tile [0, weight) exactly;
  *  - per (stratum, chunk), spans tile [0, budget) with no overlap
  *    (ragged only on the stratum's last chunk);
  *  - span chunk/offset agree with packChunks' chunk_id/chunk_off on
  *    the doc's FIRST span. */
class PackSpansSpec extends SparkSpec {
  import spark.implicits._

  private val B = 50L

  private def docs = (0L until 60L)
    .map(id => (id, s"s${id % 3}", 1L + (id * 17) % 120)) // some > B
    .toDF("doc_id", "stratum", "w")

  test("per-doc spans tile the document exactly") {
    val sp = Packing.packSpans(docs, col("stratum"), col("doc_id"),
      col("w"), B, "s")
    val perDoc = sp.groupBy("doc_id")
      .agg(sum("span_len").as("tot"), min("doc_off").as("mn"),
        max(col("doc_off") + col("span_len")).as("mx"),
        count(lit(1)).as("n_spans"))
      .join(docs, "doc_id").collect()
    perDoc.foreach { r =>
      val w = r.getAs[Long]("w")
      r.getAs[Long]("tot") shouldBe w
      r.getAs[Long]("mn") shouldBe 0L
      r.getAs[Long]("mx") shouldBe w
      // span count depends on alignment, but is bounded by the
      // doc/budget ratio plus the two boundary chunks
      r.getAs[Long]("n_spans") should be >= 1L
      r.getAs[Long]("n_spans") should be <= (w / B + 2)
    }
  }

  test("per-chunk spans tile [0, budget) without overlap; full chunks sum to budget") {
    val sp = Packing.packSpans(docs, col("stratum"), col("doc_id"),
      col("w"), B, "s").collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("span_off"), r.getAs[Long]("span_len")))
    sp.groupBy(t => (t._1, t._2)).foreach { case ((st, ck), rows) =>
      val sorted = rows.sortBy(_._3)
      // no overlap, no gap: each span starts where the previous ended
      sorted.head._3 shouldBe 0L
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => withClue(s"$st chunk $ck: ") {
          b._3 shouldBe a._3 + a._4
        }
        case _ => ()
      }
      val tot = rows.map(_._4).sum
      tot should be <= B
      // every chunk except the stratum's last is exactly full
      val lastCk = sp.filter(_._1 == st).map(_._2).max
      if (ck < lastCk) withClue(s"$st chunk $ck: ") { tot shouldBe B }
    }
  }

  test("first span of each doc agrees with packChunks chunk_id/chunk_off") {
    val chunks = Packing.packChunks(docs, col("stratum"), col("doc_id"),
        col("w"), B, "s")
      .select(col("doc_id"), col("chunk_id").as("pc"), col("chunk_off").as("po"))
    val firstSpan = Packing.packSpans(docs, col("stratum"), col("doc_id"),
        col("w"), B, "s")
      .where(col("doc_off") === 0)
      .select(col("doc_id"), col("chunk_id"), col("span_off"))
    firstSpan.join(chunks, "doc_id")
      .where(col("chunk_id") =!= col("pc") || col("span_off") =!= col("po"))
      .count() shouldBe 0L
  }
}
