package graft

import org.apache.spark.sql.functions._

import graft.operators.Mp3

/** MP3 frame-layer walk (L108): hand-built frame sequences (plain
  * Scala, independent of the codegen synthesis q154 gates), structural
  * corruption, and fuzz safety. */
class Mp3Spec extends SparkSpec {

  /** Independent spec-side frame builder. */
  private def frame(brIdx: Int, srIdx: Int, pad: Int): Array[Byte] = {
    val br = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
      256, 320)(brIdx)
    val sr = Seq(44100, 48000, 32000)(srIdx)
    val len = 144 * br * 1000 / sr + pad
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte; b(1) = 0xfa.toByte
    b(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    b(3) = 0xc0.toByte
    b
  }

  test("golden walk: counts, bytes, padding, VBR set, duration") {
    val stream = frame(9, 0, 1) ++ frame(14, 0, 0) ++ frame(9, 0, 0) ++
      frame(1, 0, 1)
    val info = Mp3.parseFrames(7L, stream)
    info.valid shouldBe true
    info.n_frames shouldBe 4L
    info.total_bytes shouldBe stream.length.toLong
    info.n_padded shouldBe 2L
    info.n_bitrates shouldBe 3L // 128 kb/s twice, 320, 32
    info.sample_rate shouldBe 44100L
    info.total_samples shouldBe 4L * 1152
    info.max_frame_len shouldBe (144 * 320 * 1000 / 44100).toLong
  }

  test("corruption: bad sync, free format, bad samplerate, truncation, rate switch") {
    val good = frame(5, 1, 0) ++ frame(6, 1, 1)
    Mp3.parseFrames(1L, good).valid shouldBe true
    Mp3.parseFrames(1L, Array.empty[Byte]).valid shouldBe false
    // corrupt the SECOND frame's sync: the walk must land exactly there
    val len0 = 144 * 64 * 1000 / 48000
    val badSync = good.clone(); badSync(len0) = 0x00.toByte
    Mp3.parseFrames(1L, badSync).valid shouldBe false
    // free-format (brIdx 0) and reserved bitrate (15) are rejected
    Mp3.parseFrames(1L, frame(1, 0, 0).clone().updated(2, (0 << 4 | 0 << 2).toByte))
      .valid shouldBe false
    val b15 = frame(1, 0, 0).clone(); b15(2) = (15 << 4).toByte
    Mp3.parseFrames(1L, b15).valid shouldBe false
    // reserved samplerate index 3
    val sr3 = frame(1, 0, 0).clone(); sr3(2) = ((1 << 4) | (3 << 2)).toByte
    Mp3.parseFrames(1L, sr3).valid shouldBe false
    // truncated final frame
    Mp3.parseFrames(1L, good.dropRight(1)).valid shouldBe false
    // mid-stream sample-rate switch
    Mp3.parseFrames(1L, frame(5, 1, 0) ++ frame(5, 2, 0)).valid shouldBe false
  }

  test("fuzz: no payload throws") {
    val rnd = new scala.util.Random(20260814)
    (0 until 500).foreach { _ =>
      val n = rnd.nextInt(600)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (rnd.nextBoolean() && n >= 2) { b(0) = 0xff.toByte; b(1) = 0xfa.toByte }
      noException should be thrownBy Mp3.parseFrames(0L, b)
    }
  }

  test("codegen synthesis parses back with the formula truth (the q154 path, locally)") {
    import spark.implicits._
    val out = Seq(0L, 1L, 5L, 13L, 19L).toDF("doc_id")
      .select(col("doc_id"), Mp3.mp3Payload(
        (lit(3) + col("doc_id") % 20).cast("int"),
        (col("doc_id") % 14).cast("int"),
        (col("doc_id") % 3).cast("int")).as("payload"))
      .as[(Long, Array[Byte])]
    val infos = Mp3.decodeMp3(out).collect().sortBy(_.media_id)
    all(infos.map(_.valid)) shouldBe true
    infos.map(_.n_frames).toSeq shouldBe Seq(0L, 1L, 5L, 13L, 19L)
      .map(id => 3L + id % 20)
    infos.map(_.sample_rate).toSeq shouldBe Seq(0L, 1L, 5L, 13L, 19L)
      .map(id => Seq(44100L, 48000L, 32000L)((id % 3).toInt))
  }

  test("side info (r9): bit-packed fields decode back to the synthesis formulas") {
    for (seed <- 0 until 5; sr <- 0 until 3) {
      val n = 3 + seed
      val info = Mp3.parseSideInfo(1L, Mp3.mp3PayloadSideInfo(n, seed, sr))
      info.valid shouldBe true
      info.n_frames shouldBe n.toLong
      val fg = for (i <- 0 until n; g <- 0 until 2) yield (i, g)
      info.sum_part23 shouldBe fg.map { case (i, g) =>
        (100 + ((seed + i) * 7 + g * 13) % 300).toLong }.sum
      info.sum_big_values shouldBe fg.map { case (i, g) =>
        (((seed + i) * 5 + g * 11) % 288).toLong }.sum
      info.max_gain shouldBe fg.map { case (i, g) =>
        (((seed + i) * 3 + g) % 256).toLong }.max
      info.n_short_granules shouldBe fg.count { case (i, g) => (i + g) % 3 == 0 }.toLong
      info.n_preflag shouldBe fg.count { case (i, g) => (seed + i + g) % 2 == 1 }.toLong
    }
  }

  test("side info: CRC-present frames shift the side-info offset by two bytes") {
    // take a protection-off stream, flip the protection bit (0xFB ->
    // 0xFA) and splice two CRC bytes after each header — a parser
    // ignoring the protection bit reads the CRC as side info
    val plain = Mp3.mp3PayloadSideInfo(3, 2, 1)
    val sr = 48000
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < plain.length) {
      val brIdx = (plain(off + 2) >> 4) & 0xf
      val pad = (plain(off + 2) >> 1) & 0x1
      val len = 144 * Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320)(brIdx) * 1000 / sr + pad
      out.write(plain(off)); out.write(0xfa) // protection ON
      out.write(plain(off + 2)); out.write(plain(off + 3))
      out.write(0); out.write(0)             // CRC placeholder
      // frame length is UNCHANGED (CRC lives inside it) — drop the
      // last two payload-zero bytes to keep the arithmetic exact
      out.write(plain, off + 4, len - 6)
      off += len
    }
    val shifted = Mp3.parseSideInfo(2L, out.toByteArray)
    val base = Mp3.parseSideInfo(2L, plain)
    shifted.valid shouldBe true
    shifted.copy(media_id = base.media_id) shouldBe base
  }

  test("spectral (r9): full entropy decode matches the synthesis formulas") {
    for (seed <- 0 until 5; sr <- 0 until 3) {
      val n = 2 + seed
      val info = Mp3.parseSpectral(1L, Mp3.mp3PayloadSpectral(n, seed, sr))
      info.valid shouldBe true
      info.n_frames shouldBe n.toLong
      val slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
      val slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)
      var sumSf = 0L; var sumAbs = 0L; var nNeg = 0L
      var nC1 = 0L; var sumP23 = 0L
      for (i <- 0 until n; g <- 0 until 2) {
        val sfc = (i + g) % 16
        val s1 = slen1(sfc); val s2 = slen2(sfc)
        val wsf = (i + g) % 3 == 0
        val (n1c, n2c, off2) = if (wsf) (18, 18, 18) else (11, 10, 11)
        sumSf += (0 until n1c).map(k => (seed + i + g + k) % (1 << s1)).sum
        sumSf += (0 until n2c).map(k => (seed + i + g + off2 + k) % (1 << s2)).sum
        val bv = 2 + ((seed + i) * 5 + g * 7) % 24
        var bitsBig = 0
        for (k <- 0 until bv) {
          val x = (seed + i + g + k) % 2; val y = (seed + 2 * i + g + k) % 2
          sumAbs += x + y
          nNeg += x * ((seed + k) % 2) + y * ((i + k) % 2)
          bitsBig += (if (x == 0 && y == 0) 1 else if (x == 1 && y == 0) 2 else 3) + x + y
        }
        val n1 = 1 + (seed + i + g) % 6
        var bitsC1 = 0
        for (k <- 0 until n1) {
          val v = (seed + i + k) % 2; val w = (i + g + k) % 2
          val x = (seed + g + k) % 2; val yq = (seed + i + g + k) % 2
          sumAbs += v + w + x + yq
          nNeg += v * ((seed + k) % 2) + w * ((i + k) % 2) +
            x * ((g + k) % 2) + yq * (k % 2)
          bitsC1 += 4 + v + w + x + yq
        }
        nC1 += n1
        sumP23 += (if (wsf) 18 * (s1 + s2) else 11 * s1 + 10 * s2) +
          bitsBig + bitsC1
      }
      info.sum_scalefac shouldBe sumSf
      info.sum_abs shouldBe sumAbs
      info.n_neg shouldBe nNeg
      info.n_count1 shouldBe nC1
      info.sum_part23 shouldBe sumP23
    }
  }

  test("spectral: subset boundaries and the part2_3 landing rule reject crafted streams") {
    def withBits(b: Array[Byte], startBit: Int, v: Int, n: Int): Array[Byte] = {
      val c = b.clone()
      var i = 0
      while (i < n) {
        val bit = startBit + i
        val mask = 1 << (7 - (bit & 7))
        val set = ((v >> (n - 1 - i)) & 1) == 1
        c(bit >> 3) = (if (set) c(bit >> 3) | mask else c(bit >> 3) & ~mask).toByte
        i += 1
      }
      c
    }
    val good = Mp3.mp3PayloadSpectral(2, 3, 0)
    Mp3.parseSpectral(1L, good).valid shouldBe true
    val siBit = 4 * 8
    // nonzero main_data_begin: bit reservoir is out of subset
    Mp3.parseSpectral(1L, withBits(good, siBit, 5, 9)).valid shouldBe false
    // nonzero scfsi: scalefactor sharing is out of subset
    Mp3.parseSpectral(1L, withBits(good, siBit + 14, 3, 4)).valid shouldBe false
    // part2_3_length off by one bit: count1 cannot land on the boundary
    // (granule 0's p23 field starts at side-info bit 18)
    val p23 = {
      val r = (good(4 + 2) & 0xff) << 8 | (good(4 + 3) & 0xff)
      (r >> 2) & 0xfff // bits 18..29 of the side info
    }
    Mp3.parseSpectral(1L, withBits(good, siBit + 18, p23 + 1, 12)).valid shouldBe false
    Mp3.parseSpectral(1L, withBits(good, siBit + 18, p23 - 1, 12)).valid shouldBe false
    // a table_select other than 1: granule 0 of frame 0 is SHORT
    // ((i+g)%3=0) — fields run p23@18 bv@30 gg@39 sfc@47 wsf@51
    // block_type@52 mixed@54, so table_select 0 starts at si bit 55
    Mp3.parseSpectral(1L, withBits(good, siBit + 55, 7, 5)).valid shouldBe false
    // flipping a main-data bit inside granule 0's big-value region
    // changes decoded sums (or kills the boundary landing)
    val mainBit = (4 + 17) * 8
    val flipped = Mp3.parseSpectral(1L,
      withBits(good, mainBit + 40, 1 - ((good(21 + 5) >> 7) & 1), 1))
    val base = Mp3.parseSpectral(1L, good)
    assert(!flipped.valid || flipped != base)
  }

  test("spectral: fuzz never throws") {
    val rnd = new scala.util.Random(20260815)
    (0 until 300).foreach { _ =>
      val n = rnd.nextInt(400)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (rnd.nextBoolean() && n >= 2) { b(0) = 0xff.toByte; b(1) = 0xfb.toByte }
      noException should be thrownBy Mp3.parseSpectral(0L, b)
    }
  }

  test("side info: decoder-grade validity rules reject crafted fields") {
    val good = Mp3.mp3PayloadSideInfo(2, 1, 0)
    // big_values > 288: frame 0 granule 0's 9-bit big_values field
    // starts at side-info bit 30 (9+5+4+12); write 289
    def withBits(b: Array[Byte], startBit: Int, v: Int, n: Int): Array[Byte] = {
      val c = b.clone()
      var i = 0
      while (i < n) {
        val bit = startBit + i
        val mask = 1 << (7 - (bit & 7))
        val set = ((v >> (n - 1 - i)) & 1) == 1
        c(bit >> 3) = (if (set) c(bit >> 3) | mask else c(bit >> 3) & ~mask).toByte
        i += 1
      }
      c
    }
    val siBit = 4 * 8 // side info starts right after the header (no CRC)
    Mp3.parseSideInfo(3L, withBits(good, siBit + 30, 289, 9)).valid shouldBe false
    // windows_switching set with block type 0 (forbidden): wsf is bit
    // 30+9+8+4 = 51 into the side info; block type is the next 2 bits
    val wsfPos = siBit + 18 + 12 + 9 + 8 + 4
    val crafted = withBits(withBits(good, wsfPos, 1, 1), wsfPos + 1, 0, 2)
    Mp3.parseSideInfo(4L, crafted).valid shouldBe false
  }

  test("synthesis (r10): long-only streams decode; the chain is deterministic") {
    for (seed <- 0 until 14; sr <- 0 until 3) {
      val b = Mp3.mp3PayloadSpectral(3, seed, sr, longOnly = true)
      val r = Mp3.parseSynth(100L * seed + sr, b)
      r.valid shouldBe true
      r.n_frames shouldBe 3L
      // deterministic: a second decode lands on the same quantized sums
      Mp3.parseSynth(100L * seed + sr, b) shouldBe r
    }
    // spectral layer still accepts the same stream (subset compatible)
    Mp3.parseSpectral(1L, Mp3.mp3PayloadSpectral(2, 5, 1,
      longOnly = true)).valid shouldBe true
  }

  test("synthesis: the overlap-add carries across granules and frames") {
    // the tail of granule G leaks into G+1: decoding frames [0,1]
    // together must NOT equal the sum of decoding them separately
    val both = Mp3.mp3PayloadSpectral(2, 3, 0, longOnly = true)
    val r2 = Mp3.parseSynth(1L, both)
    val f1 = Mp3.mp3PayloadSpectral(1, 3, 0, longOnly = true)
    val r1 = Mp3.parseSynth(1L, f1)
    r2.valid shouldBe true
    r1.valid shouldBe true
    // frame 2 alone (seed shifted so its content equals both's frame 2)
    // can't be synthesized standalone — instead pin the weaker law:
    // td sums are NOT additive across a split stream (the carry is real)
    val f2only = Mp3.mp3PayloadSpectral(1, 4, 0, longOnly = true)
    val r2only = Mp3.parseSynth(1L, f2only)
    (r1.sum_td_q + r2only.sum_td_q) should not be r2.sum_td_q
  }

  test("synthesis (r11): SHORT-block granules decode through the " +
      "hybrid chain; mixed streams are deterministic") {
    // the default spectral fixture emits short granules ((i+g)%3==0)
    var anyDiffer = false
    for (seed <- 0 until 14; sr <- 0 until 3) {
      val b = Mp3.mp3PayloadSpectral(4, seed, sr)
      val r = Mp3.parseSynth(100L * seed + sr, b)
      withClue(s"seed=$seed sr=$sr: ") { r.valid shouldBe true }
      r.n_frames shouldBe 4L
      Mp3.parseSynth(100L * seed + sr, b) shouldBe r
      // short granules change the synthesis output vs a long-only
      // stream of the same seed (different windows, gains, reorder) —
      // per-seed the 1e-9-quantized sums CAN coincide (most gains are
      // ≪ 1e-9, so floor lands on 0/−1 either way); over the grid
      // they must differ somewhere
      val long = Mp3.parseSynth(1L,
        Mp3.mp3PayloadSpectral(4, seed, sr, longOnly = true))
      long.valid shouldBe true
      if (r.sum_td_q != long.sum_td_q || r.sum_v_q != long.sum_v_q)
        anyDiffer = true
    }
    anyDiffer shouldBe true
  }

  test("synthesis (r11): long and short granules' tails CROSS — the " +
      "overlap-add carries a short tail into a long granule") {
    // (i+g)%3==0 short: frame 0 = (short, long), frame 1 =
    // (long, short) — every adjacency direction occurs; truncating
    // to one frame changes the second frame's overlap history, so
    // the two-frame sums are NOT the concatenation of independents
    val both = Mp3.mp3PayloadSpectral(2, 3, 0)
    val r2 = Mp3.parseSynth(1L, both)
    r2.valid shouldBe true
    val f1 = {
      val one = Mp3.mp3PayloadSpectral(1, 3, 0)
      Mp3.parseSynth(1L, one)
    }
    f1.valid shouldBe true
    // the first frame's contribution inside the 2-frame stream equals
    // the standalone 1-frame decode (prefix property)…
    // …but the second frame's does not equal ITS standalone decode
    // (its overlap buffer saw frame 0's windowed tails)
    val f2Standalone = {
      // same content as frame index 1 cannot be synthesized standalone
      // (fixture formulas are index-based), so assert via sums:
      r2.sum_xr_q should not be f1.sum_xr_q
      r2.sum_td_q should not be f1.sum_td_q
      r2
    }
    f2Standalone.n_frames shouldBe 2L
  }

  test("synthesis (r11): the full block-type cycle decodes — " +
      "start/short/stop windows in sequence; MIXED stays out of subset") {
    // blockMode 1: granule types cycle long/start/short/stop, so
    // every transition adjacency crosses the overlap buffer
    for (seed <- 0 until 14; sr <- 0 until 3) {
      val b = Mp3.mp3PayloadSpectral(4, seed, sr, blockMode = 1)
      val r = Mp3.parseSynth(100L * seed + sr, b)
      withClue(s"seed=$seed sr=$sr: ") { r.valid shouldBe true }
      r.n_frames shouldBe 4L
      Mp3.parseSynth(100L * seed + sr, b) shouldBe r
      Mp3.parseSpectral(1L, b).valid shouldBe true
    }
    // the asymmetric windows are not interchangeable: zeroing the
    // start/stop distinction must change the synthesis sums somewhere
    // on the grid (compare the cycle against the pure-short fixture)
    val cyc = Mp3.parseSynth(1L, Mp3.mp3PayloadSpectral(4, 3, 0, blockMode = 1))
    val sho = Mp3.parseSynth(1L, Mp3.mp3PayloadSpectral(4, 3, 0))
    cyc should not be sho
    // MIXED blocks (r11, q226) decode too — the full grid
    for (seed <- 0 until 14; sr <- 0 until 3) {
      val bm = Mp3.mp3PayloadSpectral(4, seed, sr, blockMode = 2)
      val r = Mp3.parseSynth(200L * seed + sr, bm)
      withClue(s"mixed seed=$seed sr=$sr: ") { r.valid shouldBe true }
      Mp3.parseSpectral(1L, bm).valid shouldBe true
      // mixed differs from pure short of the same seed somewhere on
      // the grid (different scalefactor split + long region)
    }
    val mix = Mp3.parseSynth(1L, Mp3.mp3PayloadSpectral(4, 3, 0, blockMode = 2))
    val sho2 = Mp3.parseSynth(1L, Mp3.mp3PayloadSpectral(4, 3, 0))
    mix should not be sho2
    // the remaining STRUCTURAL reject: mixed_block_flag with a
    // non-short block type (ISO forbids it). blockMode 1 frame 0
    // granule 1 is START (bt 1); its mixed bit sits at side-info bit
    // 113 (18 head + 59 granule-0 + 12+9+8+4+1+2)
    val b1 = Mp3.mp3PayloadSpectral(3, 0, 0, blockMode = 1)
    Mp3.parseSynth(1L, b1).valid shouldBe true
    val m = b1.clone()
    val bitOff = 4 * 8 + 113 // header 4 bytes, no CRC
    m(bitOff / 8) = (m(bitOff / 8) ^ (0x80 >> (bitOff % 8))).toByte
    Mp3.parseSynth(1L, m).valid shouldBe false
    Mp3.parseSpectral(1L, m).valid shouldBe false
  }

  test("scfsi (r11): shared scalefactor groups decode; sharing with " +
      "window switching rejects") {
    for (seed <- 0 until 14; sr <- 0 until 3) {
      val b = Mp3.mp3PayloadSpectral(4, seed, sr, blockMode = 3)
      val r = Mp3.parseSynth(100L * seed + sr, b)
      withClue(s"seed=$seed sr=$sr: ") { r.valid shouldBe true }
      Mp3.parseSynth(100L * seed + sr, b) shouldBe r
      Mp3.parseSpectral(1L, b).valid shouldBe true
    }
    // a frame with scfsi = 15 shares everything: granule 1 carries
    // ZERO scalefactor bits, and its requant uses granule 0's values
    // under its own gain — which must differ from the longOnly stream
    // of the same seed somewhere on the grid
    // (the 1e-9-quantized synth sums can coincide — the q223 lesson —
    // so pin divergence on the spectral layer's EXACT integers: the
    // effective scalefactor sum and the shrunken part2_3 budget)
    var differSf = false; var differP23 = false
    for (seed <- 0 until 14; sr <- 0 until 3) {
      val a = Mp3.parseSpectral(1L,
        Mp3.mp3PayloadSpectral(4, seed, sr, blockMode = 3))
      val b = Mp3.parseSpectral(1L,
        Mp3.mp3PayloadSpectral(4, seed, sr, longOnly = true))
      a.valid shouldBe true
      if (a.sum_scalefac != b.sum_scalefac) differSf = true
      if (a.sum_part23 != b.sum_part23) differP23 = true
    }
    differSf shouldBe true
    differP23 shouldBe true
    // scfsi != 0 with a window-switching granule is an ISO violation:
    // flip a scfsi bit on the DEFAULT fixture (its granules include
    // short blocks) — strict-reject
    val m = Mp3.mp3PayloadSpectral(3, 1, 0) // granule (i+g)%3==0 short
    Mp3.parseSynth(1L, m).valid shouldBe true
    val x = m.clone()
    val bitOff = 4 * 8 + 14 // scfsi bits at side-info offset 14..17
    x(bitOff / 8) = (x(bitOff / 8) ^ (0x80 >> (bitOff % 8))).toByte
    Mp3.parseSynth(1L, x).valid shouldBe false
    Mp3.parseSpectral(1L, x).valid shouldBe false
  }

  test("bit reservoir (r10): spilled layout decodes to the same sums") {
    for (seed <- 0 until 14; sr <- 0 until 3) {
      val plain = Mp3.mp3PayloadSpectral(5, seed, sr)
      val packed = Mp3.mp3PayloadSpectral(5, seed, sr, reservoir = true)
      // same granule content, different byte layout
      java.util.Arrays.equals(plain, packed) shouldBe false
      val a = Mp3.parseSpectral(1L, plain)
      val b = Mp3.parseSpectral(1L, packed)
      a.valid shouldBe true
      b shouldBe a
    }
    // the pointer is real: frame 1's main_data_begin is nonzero
    val p = Mp3.mp3PayloadSpectral(3, 2, 0, reservoir = true)
    // frame 0 length: brIdx = 1+2 = 3 → 48 kbps @44.1k, pad 0
    val f0len = 144 * 48 * 1000 / 44100 + 0
    val mdb = ((p(f0len + 4) & 0xff) << 1) | ((p(f0len + 5) & 0xff) >> 7)
    mdb should be > 0
    // a pointer past the accumulated reservoir rejects: frame 0 can
    // never carry a nonzero main_data_begin
    val m = Mp3.mp3PayloadSpectral(2, 2, 0)
    m(4) = 0x01.toByte // mdb high bits of frame 0
    Mp3.parseSpectral(1L, m).valid shouldBe false
  }

  test("synthesis: fuzz never throws") {
    val rnd = new scala.util.Random(20260815)
    val good = Mp3.mp3PayloadSpectral(2, 7, 0, longOnly = true)
    (0 until 300).foreach { _ =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      noException should be thrownBy Mp3.parseSynth(0L, b)
    }
  }
}
