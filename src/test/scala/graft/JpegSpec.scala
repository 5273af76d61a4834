package graft

import java.awt.image.BufferedImage

import graft.operators.Jpeg

/** Baseline JPEG decode, DIFFERENTIALLY gated against the JDK's own
  * independent codec (`javax.imageio`): the JDK both ENCODES the
  * fixtures (a real entropy-coded stream our parser must Huffman-
  * decode) and DECODES them for comparison (a second, unrelated
  * implementation of dequant+IDCT+upsample). T.81 permits IDCT
  * variance, so grayscale gates at ±1 per sample and color at a small
  * chroma tolerance — there is no bit-exact truth to pin, which is
  * exactly why this family is spec-differential rather than
  * DuckDB-oracled (q153 oracles the structural layer). */
class JpegSpec extends SparkSpec {

  System.setProperty("java.awt.headless", "true")

  private def encodeGray(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setPixels(0, 0, w, h, px)
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bo))
    bo.toByteArray
  }

  private def encodeRgb(rgb: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w)
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bo))
    bo.toByteArray
  }

  private def imageioGray(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    img.getRaster.getPixels(0, 0, w, h, out)
    (w, h, out)
  }

  private def gradient(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i % w) * 3 + (i / w) * 5) % 256)

  test("grayscale: full decode matches the JDK codec within ±1 per sample") {
    for ((w, h) <- Seq((8, 8), (16, 16), (24, 16), (17, 13), (40, 25))) {
      val src = gradient(w, h)
      val jpg = encodeGray(src, w, h)
      val mine = Jpeg.decode(jpg).getOrElse(fail(s"decode failed ${w}x$h"))
      mine.width shouldBe w
      mine.height shouldBe h
      mine.planes.length shouldBe 1
      val (jw, jh, jpx) = imageioGray(jpg)
      (jw, jh) shouldBe ((w, h))
      val diffs = mine.planes(0).zip(jpx).map { case (a, b) => math.abs(a - b) }
      withClue(s"${w}x$h max diff ${diffs.max}: ") { diffs.max should be <= 1 }
    }
  }

  test("grayscale flat + random-smooth: ±1 vs JDK, and close to the source") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val w = 8 + rnd.nextInt(40); val h = 8 + rnd.nextInt(40)
      // smooth field: JPEG quantization keeps smooth content near-exact
      val base = rnd.nextInt(200)
      val src = Array.tabulate(w * h)(i =>
        math.min(255, base + (i % w) / 4 + (i / w) / 4))
      val jpg = encodeGray(src, w, h)
      val mine = Jpeg.decode(jpg).getOrElse(fail(s"trial $trial failed"))
      val (_, _, jpx) = imageioGray(jpg)
      mine.planes(0).zip(jpx).map { case (a, b) => math.abs(a - b) }.max should be <= 1
      // and the decode is a faithful image decode, not just JDK-parity:
      // smooth content must come back near the source values
      mine.planes(0).zip(src).map { case (a, b) => math.abs(a - b) }.max should be <= 8
    }
  }

  test("color (YCbCr, subsampled): structure exact, pixels within chroma tolerance") {
    val (w, h) = (32, 24)
    val rgb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 4 + 40) << 16) | ((y * 5 + 30) << 8) | ((x + y) * 2 + 60)
    }
    val jpg = encodeRgb(rgb, w, h)
    val mine = Jpeg.decode(jpg).getOrElse(fail("color decode failed"))
    mine.width shouldBe w
    mine.height shouldBe h
    mine.planes.length shouldBe 3
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val dr = math.abs(((p >> 16) & 0xff) - mine.planes(0)(y * w + x))
      val dg = math.abs(((p >> 8) & 0xff) - mine.planes(1)(y * w + x))
      val db = math.abs((p & 0xff) - mine.planes(2)(y * w + x))
      maxDiff = math.max(maxDiff, math.max(dr, math.max(dg, db)))
      sumDiff += dr + dg + db
    }
    // chroma upsample filters legitimately differ (replication here vs
    // the JDK's interpolating upsampler); smooth content bounds it
    withClue(s"maxDiff=$maxDiff: ") { maxDiff should be <= 12 }
    (sumDiff.toDouble / (3 * w * h)) should be <= 2.0
  }

  test("structural metadata: parseInfo fields and MCU arithmetic") {
    val jpg = encodeGray(gradient(50, 30), 50, 30)
    val info = Jpeg.parseInfo(9L, jpg)
    info.valid shouldBe true
    info.width shouldBe 50
    info.height shouldBe 30
    info.n_components shouldBe 1
    info.precision shouldBe 8
    info.n_mcus shouldBe math.ceil(50 / (8.0 * info.h_max)).toLong *
      math.ceil(30 / (8.0 * info.v_max)).toLong
    info.n_quant_tables should be >= 1
    info.n_huff_tables should be >= 2 // one DC + one AC at minimum
    info.y_sum shouldBe Jpeg.decode(jpg).get.planes(0).map(_.toLong).sum
  }

  test("progressive / truncation / corruption / fuzz: invalid, never an exception") {
    val good = encodeGray(gradient(16, 16), 16, 16)
    Jpeg.parseInfo(1L, good).valid shouldBe true
    // truncations at every prefix length: no exceptions; anything cut
    // inside the header or entropy data is invalid (a prefix keeping
    // the complete scan and dropping only EOI bytes decodes — all
    // entropy data is present, which is the correct call)
    (0 until good.length by 7).foreach { n =>
      noException should be thrownBy Jpeg.parseInfo(1L, good.take(n))
      if (n <= good.length - 10)
        Jpeg.parseInfo(1L, good.take(n)).valid shouldBe false
    }
    // flip SOF0 -> SOF2 (progressive): cleanly rejected
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    Jpeg.parseInfo(1L, good.updated(sofAt + 1, 0xc2.toByte)).valid shouldBe false
    // random byte fuzz
    val rnd = new scala.util.Random(20260814)
    (0 until 300).foreach { _ =>
      val n = rnd.nextInt(400)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (rnd.nextBoolean() && n >= 2) { b(0) = 0xff.toByte; b(1) = 0xd8.toByte }
      noException should be thrownBy Jpeg.parseInfo(0L, b)
    }
    // corrupt entropy bytes of a valid stream: must not throw
    (0 until 50).foreach { k =>
      val b = good.clone()
      val at = good.length / 2 + k
      if (at < b.length) b(at) = (b(at) ^ 0x55).toByte
      noException should be thrownBy Jpeg.parseInfo(0L, b)
    }
  }

  test("distributed decode through the seam") {
    import spark.implicits._
    val rows = (0L until 6L).map { id =>
      val w = 8 + id.toInt * 4
      (id, encodeGray(gradient(w, 16), w, 16))
    }
    val out = Jpeg.decodeJpeg(rows.toDF("media_id", "payload")
        .as[(Long, Array[Byte])])
      .collect().sortBy(_.media_id)
    out.map(_.width).toSeq shouldBe (0 until 6).map(8 + _ * 4)
    all(out.map(_.valid)) shouldBe true
  }
}
