package graft

import graft.operators.Avro

/** Avro OCF walk (q215): differential against avro-java's writer AND
  * reader, schema-subset strictness, framing laws, never-throw. */
class AvroSpec extends SparkSpec {

  private def expected(id: Long, d: Long): Avro.AvroInfo = {
    val n = (3 + d % 7).toInt
    val recs = (0 until n).map { j =>
      val v = if (j % 3 == 0) None else Some((d + j) % 50)
      val s = "s" * (1 + j % 4) + j
      (100L * d + j, v, s)
    }
    Avro.AvroInfo(id, (n + 1) / 2, n.toLong,
      recs.map(_._1).sum + recs.flatMap(_._2).sum,
      recs.count(_._2.isEmpty).toLong,
      recs.map(_._3.length.toLong).sum,
      recs.map(_._3.getBytes("UTF-8").map(b => (b & 0xff).toLong).sum).sum,
      valid = true)
  }

  test("round-trip differential vs avro-java over the grid, both " +
      "codecs (d even = deflate, odd = null)") {
    for (d <- 0L until 30L) {
      val b = Avro.avroPayload(d)
      Avro.parse(d, b) shouldBe expected(d, d)
    }
  }

  test("avro-java's own reader agrees on the record stream") {
    val b = Avro.avroPayload(8L)
    val rdr = new org.apache.avro.file.DataFileReader(
      new org.apache.avro.file.SeekableByteArrayInput(b),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    var n = 0; var sumId = 0L
    while (rdr.hasNext) {
      val rec = rdr.next()
      sumId += rec.get("id").asInstanceOf[Long]
      n += 1
    }
    rdr.close()
    n shouldBe 4 // 3 + 8%7
    val mine = Avro.parse(8L, b)
    mine.n_records shouldBe n.toLong
    // our sum_long also folds the non-null v values
    mine.sum_long should be >= sumId
  }

  test("schema is parsed, not assumed: unsupported types reject") {
    // a float field is out of subset → the whole file is invalid
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"x","fields":[
        |{"name":"f","type":"float"}]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, out)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("f", java.lang.Float.valueOf(1.5f))
    w.append(rec)
    w.close()
    Avro.parse(1L, out.toByteArray).valid shouldBe false
    // but boolean + double + nullable string all decode
    val schema2 = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"y","fields":[
        |{"name":"b","type":"boolean"},
        |{"name":"d","type":"double"},
        |{"name":"s","type":["null","string"]}]}""".stripMargin)
    val out2 = new java.io.ByteArrayOutputStream()
    val w2 = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema2))
    w2.create(schema2, out2)
    for (i <- 0 until 5) {
      val rec2 = new org.apache.avro.generic.GenericData.Record(schema2)
      rec2.put("b", java.lang.Boolean.valueOf(i % 2 == 0))
      rec2.put("d", java.lang.Double.valueOf(i * 1.5))
      rec2.put("s", if (i % 2 == 0) null else "x" * i)
      w2.append(rec2)
    }
    w2.close()
    val info = Avro.parse(2L, out2.toByteArray)
    info.valid shouldBe true
    info.n_records shouldBe 5L
    info.sum_long shouldBe 3L // the three true booleans
    info.n_nulls shouldBe 3L
    info.sum_slen shouldBe 1L + 3L // "x", "xxx"
  }

  test("framing laws: magic, sync marker, block sizes, truncation") {
    val b = Avro.avroPayload(5L)
    def mut(f: Array[Byte] => Unit): Boolean = {
      val m = b.clone(); f(m); Avro.parse(1L, m).valid
    }
    mut(_ => ()) shouldBe true
    mut(m => m(0) = 'X') shouldBe false           // magic
    mut(m => m(3) = 2) shouldBe false             // version
    mut(m => m(m.length - 1) = (m(m.length - 1) ^ 1).toByte) shouldBe
      false // last sync byte diverges from the header's
    // OCF has no trailer: truncation at a BLOCK boundary is a valid
    // shorter file (fewer blocks); any mid-structure cut rejects.
    val full = Avro.parse(0L, b)
    for (keep <- 0 until b.length by 5) {
      val t = Avro.parse(2L, java.util.Arrays.copyOf(b, keep))
      if (t.valid) t.n_blocks should be < full.n_blocks
    }
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 500) {
      val m = b.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Avro.parse(3L, m) // must not throw
    }
  }

  test("decodeAvro runs map-side over a Dataset") {
    import spark.implicits._
    val ds = spark.createDataset(Seq((9L, Avro.avroPayload(9L))))
    Avro.decodeAvro(ds).collect().toSeq shouldBe Seq(expected(9L, 9L))
  }
}
