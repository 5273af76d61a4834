package graft

import graft.operators.Gif

/** GIF / LZW codec (q191): encode→decode round trip across dictionary
  * width boundaries, structural strictness, and never-throw. */
class GifSpec extends SparkSpec {

  private def expected(id: Long, w: Int, h: Int, nf: Int,
                       seed: Int): Gif.GifInfo = {
    val idx = for (f <- 0 until nf; p <- 0 until w * h)
      yield (seed + 3 * f + p) % 4
    Gif.GifInfo(id, w.toLong, h.toLong, nf.toLong, 1L, 4L,
      idx.map(_.toLong).sum, idx.max.toLong, valid = true)
  }

  test("round-trip differential across LZW width-bump boundaries") {
    // w*h from tiny (no bump) through hundreds (several bumps) to
    // tens of thousands (12-bit width and the 4096 dictionary reset)
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 5), (16, 16), (60, 50),
           (200, 160), (512, 300)); seed <- Seq(0, 3, 7)) {
      val b = Gif.gifPayload(w, h, 1, seed)
      Gif.parse(1L, b) shouldBe expected(1L, w, h, 1, seed)
    }
  }

  test("multi-frame archives decode frame by frame") {
    for (nf <- Seq(2, 3, 5); seed <- Seq(1, 9)) {
      val b = Gif.gifPayload(20, 10, nf, seed)
      Gif.parse(2L, b) shouldBe expected(2L, 20, 10, nf, seed)
    }
  }

  test("compression is real: the pixel formula is invisible in the bytes") {
    val b = Gif.gifPayload(50, 40, 1, 5)
    // 2000 2-bit pixels LZW-compress far below 1 byte/pixel
    b.length should be < 1000
  }

  test("structural strictness") {
    val b = Gif.gifPayload(8, 8, 1, 2)
    def mut(f: Array[Byte] => Unit): Boolean = {
      val m = b.clone(); f(m); Gif.parse(1L, m).valid
    }
    mut(_ => ()) shouldBe true
    mut(m => m(0) = 'X') shouldBe false              // header magic
    mut(m => m(4) = '6') shouldBe false              // bad version
    Gif.parse(1L, b.dropRight(1)).valid shouldBe false // missing trailer
    Gif.parse(1L, b :+ 0x00.toByte).valid shouldBe false // slack
    Gif.parse(1L, Array.empty[Byte]).valid shouldBe false
    // an image descriptor outside the logical screen is rejected
    val big = Gif.gifPayload(8, 8, 1, 2).clone()
    // set frame width (bytes at descriptor offset) beyond screen:
    // descriptor starts after 13-byte LSD + 12-byte GCT + extension
    val desc = big.indexOf(0x2C.toByte)
    big(desc + 5) = 9; big(desc + 6) = 0
    Gif.parse(1L, big).valid shouldBe false
  }

  test("LZW integrity: corrupted code streams reject, never throw") {
    val b = Gif.gifPayload(30, 20, 1, 4)
    val rnd = new scala.util.Random(20260815)
    var rejected = 0
    for (_ <- 0 until 500) {
      val m = b.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      noException should be thrownBy Gif.parse(1L, m)
      val r = Gif.parse(1L, m)
      // a flip may land on a don't-care byte; if it decodes, it must
      // still satisfy the structural laws (pixel count == w*h did)
      if (!r.valid) rejected += 1
    }
    rejected should be > 250 // most flips break SOMETHING
    for (_ <- 0 until 200) {
      val g = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      noException should be thrownBy Gif.parse(1L, g)
    }
  }

  test("pixel-count law: truncated or padded code streams reject") {
    // decoding must produce EXACTLY w*h pixels — a stream for 8x8
    // presented as 8x9 (or 8x7) must fail
    val b = Gif.gifPayload(8, 8, 1, 2)
    val tall = b.clone(); val desc = tall.indexOf(0x2C.toByte)
    tall(desc + 7) = 9 // frame height 9 (within a 9-high screen? no —
    Gif.parse(1L, tall).valid shouldBe false // also outside screen
    val short = b.clone(); short(desc + 7) = 7
    Gif.parse(1L, short).valid shouldBe false // 56 < 64 decoded pixels
  }

  test("decodeGif runs map-side over a Dataset") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      (1L, Gif.gifPayload(10, 8, 1, 3)), (2L, Gif.gifPayload(6, 6, 2, 11))))
    val got = Gif.decodeGif(ds).collect().sortBy(_.media_id)
    got(0) shouldBe expected(1L, 10, 8, 1, 3)
    got(1) shouldBe expected(2L, 6, 6, 2, 11)
  }
}
