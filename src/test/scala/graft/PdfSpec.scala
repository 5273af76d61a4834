package graft

import graft.operators.Pdf

/** PDF walk + text extraction (q192): formula round-trip, xref offset
  * verification, stream framing, escape decoding, never-throw. */
class PdfSpec extends SparkSpec {

  private def expected(id: Long, np: Int, seed: Long): Pdf.PdfInfo = {
    val texts = (0 until np).flatMap(i =>
      Seq(s"Doc $seed page $i", s"w${(seed + i) % 7} (x)"))
    Pdf.PdfInfo(id, 2L + 2 * np, np.toLong, 2L * np,
      texts.map(_.length.toLong).sum,
      texts.map(_.map(_.toLong).sum).sum, valid = true)
  }

  test("round-trip differential over the (nPages, seed) grid") {
    for (np <- Seq(1, 2, 3, 5, 12); seed <- 0L until 13L)
      Pdf.parse(np * 100L + seed, Pdf.pdfPayload(np, seed))
        .shouldBe(expected(np * 100L + seed, np, seed))
  }

  test("xref offsets are verified: shifting any in-use entry rejects") {
    val b = Pdf.pdfPayload(2, 3)
    val s = new String(b, "ISO-8859-1")
    val xref = s.indexOf("xref\n")
    // first in-use entry starts after "xref\n0 N\n" + 20 (free entry)
    val entry = s.indexOf('\n', s.indexOf('\n', xref) + 1) + 1 + 20
    val m = b.clone()
    m(entry + 9) = (((b(entry + 9) - '0' + 1) % 10) + '0').toByte
    Pdf.parse(1L, m).valid shouldBe false
    // and corrupting startxref itself
    val sx = s.lastIndexOf("startxref\n") + 10
    val m2 = b.clone()
    m2(sx) = (((b(sx) - '0' + 1) % 10) + '0').toByte
    Pdf.parse(1L, m2).valid shouldBe false
  }

  test("stream framing: /Length must be exact") {
    val b = Pdf.pdfPayload(1, 0)
    val s = new String(b, "ISO-8859-1")
    // lengthen the declared /Length by one
    val at = s.indexOf("/Length ")
    val d = b.clone()
    d(at + 8) = (((b(at + 8) - '0' + 1) % 10) + '0').toByte
    Pdf.parse(1L, d).valid shouldBe false
  }

  test("escape subset decodes; out-of-subset escapes reject") {
    val good = Pdf.pdfPayload(1, 5)
    val r = Pdf.parse(1L, good)
    r.valid shouldBe true
    // decoded text carries literal parens: "w5 (x)" ends the op list
    r.text_len shouldBe expected(1L, 1, 5).text_len
    // inject an unsupported escape \n into the stream text
    val s = new String(good, "ISO-8859-1")
    val bad = s.replace("\\(x\\)", "\\nx").getBytes("ISO-8859-1")
    // /Length now mismatches too — both rules reject
    Pdf.parse(1L, bad).valid shouldBe false
  }

  test("FlateDecode streams: inflate-then-scan matches the raw result (r10)") {
    for (np <- Seq(1, 2, 3, 5, 12); seed <- 0L until 13L) {
      val flate = Pdf.pdfPayload(np, seed, flate = true)
      Pdf.parse(np * 100L + seed, flate)
        .shouldBe(expected(np * 100L + seed, np, seed))
      // the compression is real: encoded bytes differ from the ops text
      new String(flate, "ISO-8859-1").contains(s"Doc $seed page 0") shouldBe false
    }
  }

  test("FlateDecode rejections: corrupt zlib, unknown filter, framing (r10)") {
    val b = Pdf.pdfPayload(2, 3, flate = true)
    val s = new String(b, "ISO-8859-1")
    // corrupt one byte INSIDE the first compressed body (after stream\n)
    val at = s.indexOf("stream\n") + 7 + 4
    val m = b.clone()
    m(at) = (m(at) ^ 0x55).toByte
    Pdf.parse(1L, m).valid shouldBe false
    // an unknown filter name rejects (same length → framing intact)
    Pdf.parse(1L, s.replace("/Filter /FlateDecode", "/Filter /FlateDecodX")
      .getBytes("ISO-8859-1")).valid shouldBe false
    // perturbing the declared /Length mis-frames the zlib body → reject
    val lenAt = s.indexOf("/Length ") + 8
    val t = b.clone()
    t(lenAt) = (((t(lenAt) - '0' + 1) % 10) + '0').toByte
    Pdf.parse(1L, t).valid shouldBe false
  }

  test("header, trailer and page-count rules") {
    val b = Pdf.pdfPayload(2, 1)
    Pdf.parse(1L, "junk".getBytes("ISO-8859-1")).valid shouldBe false
    Pdf.parse(1L, b.dropRight(2)).valid shouldBe false // no %%EOF
    val s = new String(b, "ISO-8859-1")
    Pdf.parse(1L, s.replace("/Size 7", "/Size 9")
      .getBytes("ISO-8859-1")).valid shouldBe false
    // /Type /Pages must NOT count as a page: 2 pages, not 3
    Pdf.parse(1L, b).n_pages shouldBe 2L
  }

  test("random corruption and garbage never throw") {
    val rnd = new scala.util.Random(20260815)
    for (b <- Seq(Pdf.pdfPayload(3, 7), Pdf.pdfPayload(3, 7, flate = true));
         _ <- 0 until 500) {
      val m = b.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      noException should be thrownBy Pdf.parse(1L, m)
    }
    for (_ <- 0 until 200) {
      val g = Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte)
      noException should be thrownBy Pdf.parse(1L, g)
    }
  }

  test("decodePdf runs map-side over a Dataset") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      (1L, Pdf.pdfPayload(2, 4)), (2L, Pdf.pdfPayload(4, 9))))
    val got = Pdf.decodePdf(ds).collect().sortBy(_.media_id)
    got(0) shouldBe expected(1L, 2, 4)
    got(1) shouldBe expected(2L, 4, 9)
  }
}
