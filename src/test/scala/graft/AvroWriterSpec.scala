package graft

import graft.operators.Avro

/** Our OCF WRITER (q227): avro-java's own reader consumes our bytes;
  * our own reader cross-checks; framing corruption rejects. */
class AvroWriterSpec extends SparkSpec {

  private def recs(n: Int): Seq[(Long, Option[Long], String)] =
    (0 until n).map { i =>
      (i.toLong * 3, if (i % 3 == 0) None else Some(i * 7L),
        "x" * (1 + i % 4) + i)
    }

  private val sync: Array[Byte] =
    Array.tabulate(16)(i => (i * 17 + 3).toByte)

  test("avro-java's DataFileReader consumes our bytes: records, " +
      "values, nulls, strings — both codecs") {
    for (deflate <- Seq(false, true)) {
      val rs = recs(11)
      val b = Avro.writeOcf(rs, sync, deflate, perBlock = 2)
      val r = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(b),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Option[Long], String)]
      while (r.hasNext) {
        val rec = r.next()
        got += ((rec.get("id").asInstanceOf[Long],
          Option(rec.get("v")).map(_.asInstanceOf[Long]),
          rec.get("s").toString))
      }
      r.close()
      got.toSeq shouldBe rs
    }
  }

  test("our own reader closes the loop on our writer's bytes") {
    val b = Avro.ownOcfGroupPayload(4L, Array(1L, 2L, 3L, 4L, 5L))
    val own = Avro.parse(4L, b)
    own.valid shouldBe true
    own.n_records shouldBe 5L
    own.n_blocks shouldBe 3L // blocks of 2 -> ceil(5/2)
    // and the in-query avro-java arm agrees field by field
    import spark.implicits._
    val viaJava = Avro.decodeWithAvroJava(
      spark.createDataset(Seq((4L, b)))).collect().head
    viaJava shouldBe own
  }

  test("r12 DEEP writer: avro-java and our own deep reader both " +
      "consume our nested + snappy/deflate bytes and agree") {
    import spark.implicits._
    for (g <- Seq(6L, 7L)) { // snappy (even) and deflate (odd)
      val ids = (g * 64 until g * 64 + 40).toArray
      val b = Avro.ownOcfDeepGroupPayload(g, ids)
      val own = Avro.parseDeep(g, b)
      own.valid shouldBe true
      val viaJava = Avro.decodeDeepWithAvroJava(
        spark.createDataset(Seq((g, b)))).collect().head
      viaJava shouldBe own
      // and the aggregates equal the REAL writer's for the same ids
      val ref = Avro.parseDeep(g, Avro.avroDeepGroupPayload(g, ids))
      ref.valid shouldBe true
      own.copy(media_id = 0L) shouldBe ref.copy(media_id = 0L)
    }
    // empty arrays / all-null fates round the tree: one record each
    val one = Avro.writeOcfDeep(Seq(
      Avro.DeepRec(1L, "", None, Seq.empty, None),
      Avro.DeepRec(2L, "zz", Some(-5L), Seq(0L, -1L),
        Some(Seq.empty))), Array.fill[Byte](16)(3), "snappy")
    val got = Avro.decodeDeepWithAvroJava(
      spark.createDataset(Seq((9L, one)))).collect().head
    got.valid shouldBe true
    got.n_records shouldBe 2L
    got.n_nulls shouldBe 2L // one null score + one null tags
    got.sum_long shouldBe (1L + 2L - 5L + 0L - 1L)
    got.n_items shouldBe 2L // the two toks of record 2
  }

  test("framing corruption rejects on both readers: sync flip, " +
      "truncation, random flips never throw") {
    val b = Avro.ownOcfGroupPayload(2L, Array(10L, 11L, 12L))
    // flip a byte of the FINAL block's sync marker
    val m = b.clone()
    m(m.length - 3) = (m(m.length - 3) ^ 0x20).toByte
    Avro.parse(2L, m).valid shouldBe false
    import spark.implicits._
    Avro.decodeWithAvroJava(spark.createDataset(Seq((2L, m))))
      .collect().head.valid shouldBe false
    Avro.parse(2L, java.util.Arrays.copyOf(b, b.length - 5))
      .valid shouldBe false
    val rnd = new scala.util.Random(47)
    for (_ <- 0 until 300) {
      val x = b.clone()
      x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      Avro.parse(2L, x) // never throws
    }
  }
}
