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
}
