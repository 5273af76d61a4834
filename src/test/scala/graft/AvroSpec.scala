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

  // ---- r11 deep decoder: nested records, arrays, snappy (q221) ----

  private def deepExpected(g: Long, ids: Array[Long]): Avro.AvroDeepInfo = {
    var sumLong = 0L; var nNulls = 0L; var nItems = 0L
    var sumSlen = 0L; var sumSbytes = 0L
    ids.foreach { d =>
      sumLong += d
      if (d % 3 == 0) nNulls += 1 else sumLong += (7 * d) % 50
      if (d % 4 != 0) {
        sumLong += d % 10 + d % 7 + d % 3; nItems += 3
      }
      val src = "s" + (d % 5)
      sumSlen += src.length
      sumSbytes += src.getBytes("UTF-8").map(b => (b & 0xff).toLong).sum
      if (d % 6 == 0) nNulls += 1
      else {
        val tag = "t" + (d % 2)
        nItems += 1
        sumSlen += tag.length
        sumSbytes += tag.getBytes("UTF-8").map(b => (b & 0xff).toLong).sum
      }
    }
    Avro.AvroDeepInfo(g, (ids.length + 1L) / 2, ids.length.toLong,
      sumLong, nNulls, nItems, sumSlen, sumSbytes, valid = true)
  }

  test("deep decode differential vs avro-java over nested schema, " +
      "snappy AND deflate codecs") {
    for (g <- 0L until 6L) { // even g = snappy, odd = deflate
      val ids = (g * 17 until g * 17 + 13).toArray
      val b = Avro.avroDeepGroupPayload(g, ids)
      Avro.parseDeep(g, b) shouldBe deepExpected(g, ids)
      // avro-java's own reader agrees the stream is intact
      val r = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(b),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      var n = 0
      while (r.hasNext) { r.next(); n += 1 }
      r.close()
      n shouldBe ids.length
    }
  }

  test("union order matters on the wire: [T,\"null\"] decodes with " +
      "the right branch index") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"u","fields":[
        |{"name":"v","type":["long","null"]}]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, out)
    for (i <- 0 until 6) {
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("v", if (i % 2 == 0) java.lang.Long.valueOf(i * 10L)
                   else null)
      w.append(rec)
    }
    w.close()
    val info = Avro.parseDeep(1L, out.toByteArray)
    info.valid shouldBe true
    info.n_records shouldBe 6L
    info.sum_long shouldBe 0L + 20L + 40L
    info.n_nulls shouldBe 3L
  }

  test("deep strictness: nested float rejects, corrupted snappy CRC " +
      "rejects, random flips never throw") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"x","fields":[
        |{"name":"inner","type":{"type":"record","name":"i","fields":[
        |  {"name":"f","type":"float"}]}}]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, out)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    val inner = new org.apache.avro.generic.GenericData.Record(
      schema.getField("inner").schema())
    inner.put("f", java.lang.Float.valueOf(2.5f))
    rec.put("inner", inner)
    w.append(rec)
    w.close()
    Avro.parseDeep(1L, out.toByteArray).valid shouldBe false

    val good = Avro.avroDeepGroupPayload(0L, Array(1L, 2L, 3L)) // snappy
    Avro.parseDeep(0L, good).valid shouldBe true
    // flip a byte in the last 4 (the big-endian CRC32 suffix of the
    // final block, just before the trailing 16-byte sync)
    val m = good.clone()
    m(m.length - 18) = (m(m.length - 18) ^ 0x01).toByte
    Avro.parseDeep(0L, m).valid shouldBe false
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 500) {
      val x = good.clone()
      x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      Avro.parseDeep(0L, x) // must not throw
    }
  }

  test("decodeAvroDeep runs map-side over a Dataset") {
    import spark.implicits._
    val ids = Array(5L, 6L, 7L, 8L)
    val ds = spark.createDataset(
      Seq((4L, Avro.avroDeepGroupPayload(4L, ids))))
    Avro.decodeAvroDeep(ds).collect().toSeq shouldBe
      Seq(deepExpected(4L, ids))
  }
}
