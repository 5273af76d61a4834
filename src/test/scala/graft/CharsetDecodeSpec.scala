package graft

import graft.operators.CharsetDecode

/** Charset decoding (q187): per-charset byte layouts, strict-decode
  * rejection, label handling, and the formula round-trip. */
class CharsetDecodeSpec extends SparkSpec {

  private def expected(id: Long, seed: Long): CharsetDecode.TextInfo = {
    val t = s"d$seed é ñ x${seed % 7}"
    CharsetDecode.TextInfo(id, t.length.toLong,
      t.map(_.toLong).sum, 2L, valid = true)
  }

  test("the same text, four byte layouts, one decoded surface") {
    for (seed <- 0L until 13L; kind <- 0 until 4) {
      val (b, label) = CharsetDecode.encodedBody(kind, seed)
      CharsetDecode.parse(1L, b, label) shouldBe expected(1L, seed)
    }
    // the byte strings really differ per charset
    val bodies = (0 until 4).map(k => CharsetDecode.encodedBody(k, 5)._1)
    bodies.map(_.toSeq).distinct.size shouldBe 4
    bodies(0).length should be < bodies(2).length // utf-8 vs utf-16
  }

  test("byte order is load-bearing: BE bytes under an LE label differ") {
    val (be, _) = CharsetDecode.encodedBody(2, 3)
    val r = CharsetDecode.parse(1L, be, "utf-16le")
    // every char's bytes swap: either rejected or a different surface
    if (r.valid) r should not be expected(1L, 3)
  }

  test("strict decode: malformed utf-8 rejected, not replaced") {
    CharsetDecode.parse(1L, Array(0xE9.toByte), "utf-8")
      .valid shouldBe false // lone latin-1 é is invalid utf-8
    CharsetDecode.parse(1L, Array(0xC3.toByte), "utf-8")
      .valid shouldBe false // truncated 2-byte sequence
    // ...but the same byte IS valid latin-1
    val r = CharsetDecode.parse(1L, Array(0xE9.toByte), "iso-8859-1")
    r.valid shouldBe true
    r.sum_codepoints shouldBe 233L
    r.n_nonascii shouldBe 1L
    // odd-length utf-16 input is malformed
    CharsetDecode.parse(1L, Array(0x00.toByte, 0x61.toByte, 0x00.toByte),
      "utf-16be").valid shouldBe false
  }

  test("labels: case-insensitive, aliases, unknown rejected") {
    val (b, _) = CharsetDecode.encodedBody(0, 2)
    CharsetDecode.parse(1L, b, "UTF-8") shouldBe expected(1L, 2L)
    CharsetDecode.parse(1L, b, "utf8") shouldBe expected(1L, 2L)
    val (l1, _) = CharsetDecode.encodedBody(1, 2)
    CharsetDecode.parse(1L, l1, "latin-1") shouldBe expected(1L, 2L)
    CharsetDecode.parse(1L, b, "koi8-r").valid shouldBe false
    CharsetDecode.parse(1L, b, null).valid shouldBe false
    CharsetDecode.parse(1L, null, "utf-8").valid shouldBe false
  }

  test("supplementary codepoints count once") {
    val emoji = "😀" // U+1F600, a surrogate pair
    val r = CharsetDecode.parse(1L,
      emoji.getBytes(java.nio.charset.StandardCharsets.UTF_8), "utf-8")
    r.n_chars shouldBe 1L
    r.sum_codepoints shouldBe 0x1F600L
    r.n_nonascii shouldBe 1L
  }

  test("decodeText runs map-side over a Dataset") {
    import spark.implicits._
    val rows = (0L until 8L).map { i =>
      val (b, l) = CharsetDecode.encodedBody((i % 4).toInt, i % 13)
      (i, b, l)
    }
    val got = CharsetDecode.decodeText(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    for (r <- got) r shouldBe expected(r.media_id, r.media_id % 13)
  }
}
