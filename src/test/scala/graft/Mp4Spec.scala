package graft

import graft.operators.Mp4

/** MP4 / ISO-BMFF box-walk codec (q175): round-trip differential
  * against an independent formula replay, the uniform-stsz + free-box
  * path, and the never-throw contract under truncation/corruption. */
class Mp4Spec extends SparkSpec {

  /** Independent replay of the writer's documented formulas. */
  private def expected(id: Long, n: Int, seed: Int): Mp4.Mp4Info = {
    val ts = 600 + 100 * (seed % 5)
    val deltas = Array.tabulate(n)(i => 40 + 10 * ((i / 3) % 2))
    val sizes = Array.tabulate(n)(i => 20 + ((seed + 7 * i) % 50))
    val keyEvery = 2 + seed % 3
    val keys = (0 until n).filter(_ % keyEvery == 0)
    val spc = 2 + (seed / 3) % 4
    val nChunks = (n + spc - 1) / spc
    val prefix = sizes.scanLeft(0L)((a, s) => a + s)
    val sumKeyBytes = keys.map { i =>
      (0 until sizes(i)).map(j => ((seed + i + j) % 256).toLong).sum
    }.sum
    Mp4.Mp4Info(id, n.toLong, ts.toLong, deltas.map(_.toLong).sum,
      keys.length.toLong, nChunks.toLong, sizes.map(_.toLong).sum,
      sizes.max.toLong, keys.map(prefix(_)).sum, sumKeyBytes,
      valid = true)
  }

  test("round-trip differential over the (n, seed) grid") {
    for (n <- Seq(1, 2, 3, 5, 8, 11, 24); seed <- 0 until 12) {
      val b = Mp4.mp4Payload(n, seed)
      Mp4.parse(n * 100L + seed, b) shouldBe expected(n * 100L + seed, n, seed)
    }
  }

  test("every truncation parses to valid=false without throwing") {
    val b = Mp4.mp4Payload(7, 5)
    for (len <- 0 until b.length) {
      val r = Mp4.parse(1L, b.take(len))
      r.valid shouldBe false
    }
  }

  test("random single-byte corruption never throws") {
    val b = Mp4.mp4Payload(9, 3)
    val rnd = new scala.util.Random(20260815)
    for (_ <- 0 until 500) {
      val m = b.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      noException should be thrownBy Mp4.parse(1L, m)
    }
  }

  test("garbage and empty input are invalid, not exceptions") {
    Mp4.parse(1L, Array.empty[Byte]).valid shouldBe false
    Mp4.parse(1L, Array.fill(64)(0x41.toByte)).valid shouldBe false
  }

  test("uniform stsz (sample_size != 0) with a free box is accepted") {
    val n = 6; val seed = 4
    val b = Mp4.mp4Payload(n, seed)
    // locate the stsz box and replace its per-sample table with the
    // uniform form, padding the freed bytes with a spec-legal 'free'
    // box so sibling sizes stay intact
    val tagIdx = (0 until b.length - 4).find(i =>
      b(i) == 's'.toByte && b(i + 1) == 't'.toByte &&
        b(i + 2) == 's'.toByte && b(i + 3) == 'z'.toByte).get
    val boxStart = tagIdx - 4
    val oldSize = ((b(boxStart) & 0xff) << 24) |
      ((b(boxStart + 1) & 0xff) << 16) | ((b(boxStart + 2) & 0xff) << 8) |
      (b(boxStart + 3) & 0xff)
    val m = b.clone()
    def put32(o: Int, v: Int): Unit = {
      m(o) = ((v >> 24) & 0xff).toByte; m(o + 1) = ((v >> 16) & 0xff).toByte
      m(o + 2) = ((v >> 8) & 0xff).toByte; m(o + 3) = (v & 0xff).toByte
    }
    put32(boxStart, 20)          // uniform stsz is 20 bytes
    put32(boxStart + 8, 0)       // verflags
    put32(boxStart + 12, 20)     // sample_size = 20 (<= every real size)
    put32(boxStart + 16, n)      // sample_count
    put32(boxStart + 20, oldSize - 20) // free box over the old table
    m(boxStart + 24) = 'f'.toByte; m(boxStart + 25) = 'r'.toByte
    m(boxStart + 26) = 'e'.toByte; m(boxStart + 27) = 'e'.toByte
    val r = Mp4.parse(9L, m)
    r.valid shouldBe true
    r.n_samples shouldBe n.toLong
    r.sum_bytes shouldBe n * 20L
    r.max_sample shouldBe 20L
    r.n_keyframes shouldBe expected(9L, n, seed).n_keyframes
  }

  test("decodeMp4 runs map-side over a Dataset") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      (1L, Mp4.mp4Payload(4, 1)), (2L, Mp4.mp4Payload(6, 8))))
    val got = Mp4.decodeMp4(ds).collect().sortBy(_.media_id)
    got(0) shouldBe expected(1L, 4, 1)
    got(1) shouldBe expected(2L, 6, 8)
  }
}
