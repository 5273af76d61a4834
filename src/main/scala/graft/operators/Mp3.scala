package graft.operators

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** MP3 (MPEG-1 Layer III) FRAME-layer codec — the container walk the
  * blocked list's last entry still admits dependency-free: an MP3 file
  * is a sequence of self-describing frames whose length is pure header
  * arithmetic (`144·bitrate/samplerate + padding` for MPEG-1 L3), so
  * frame counting, duration accounting, VBR detection and byte-exact
  * frame offsets are all implementable and GATEABLE exactly like the
  * RIFF/WAVE chunk walk (L95): a parser that does not read the
  * bitrate/samplerate/padding bits cannot land on the next frame. The
  * ENTROPY layer (Huffman spectral data → IMDCT → synthesis filterbank
  * → PCM) stays documented as out of scope — that is the one remaining
  * undecoded layer in the media family.
  *
  * 100 TB shape: pure map-side behind the imperative codec seam;
  * payload bytes never shuffle. */
object Mp3 {

  /** MPEG-1 Layer III bitrate table (kbit/s), index 1–14; 0 = free
    * format (rejected — frame length is then not self-describing),
    * 15 = invalid. */
  private val Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, index 0–2; 3 = invalid. */
  private val SampleRates = Array(44100, 48000, 32000)

  final case class Mp3Info(media_id: Long, n_frames: Long, total_bytes: Long,
                           n_padded: Long, n_bitrates: Long,
                           sample_rate: Long, total_samples: Long,
                           max_frame_len: Long, valid: Boolean)

  /** Walk the frame sequence from offset 0 (the q134 stance: container
    * structure, not sync-hunting — a real ingest pipeline trims ID3
    * upstream). Every frame must be MPEG-1 Layer III with a valid
    * bitrate/samplerate; the stream must end exactly on a frame
    * boundary. Malformed → all-zero `valid=false`, never a throw. */
  private[graft] def parseFrames(id: Long, b: Array[Byte]): Mp3Info = {
    val invalid = Mp3Info(id, 0L, 0L, 0L, 0L, 0L, 0L, 0L, valid = false)
    var off = 0
    var nFrames = 0L
    var nPadded = 0L
    var maxLen = 0L
    var sampleRate = -1
    val seenBitrates = scala.collection.mutable.BitSet.empty
    while (off < b.length) {
      if (off + 4 > b.length) return invalid
      val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
      val b2 = b(off + 2) & 0xff
      // 11-bit sync + version 11 (MPEG-1) + layer 01 (III)
      if (b0 != 0xff || (b1 & 0xfe) != 0xfa) return invalid
      val brIdx = (b2 >> 4) & 0xf
      val srIdx = (b2 >> 2) & 0x3
      val padding = (b2 >> 1) & 0x1
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return invalid
      val sr = SampleRates(srIdx)
      if (sampleRate < 0) sampleRate = sr
      else if (sampleRate != sr) return invalid // mid-stream rate switch
      val frameLen = 144 * Bitrates(brIdx) * 1000 / sr + padding
      if (off + frameLen > b.length) return invalid // truncated final frame
      nFrames += 1
      nPadded += padding
      maxLen = math.max(maxLen, frameLen)
      seenBitrates += brIdx
      off += frameLen
    }
    if (nFrames == 0) invalid
    else Mp3Info(id, nFrames, off.toLong, nPadded, seenBitrates.size.toLong,
      sampleRate.toLong, nFrames * 1152L, maxLen, valid = true)
  }

  /** Distributed frame walk (the L95/L104/L107 seam). */
  def decodeMp3(media: Dataset[(Long, Array[Byte])]): Dataset[Mp3Info] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map { case (id, bytes) => parseFrames(id, bytes) })
  }

  // ------------------------------------------------------------------
  // Side-information layer (r9): one layer below the frame walk — the
  // 17-byte (mono) Layer III side info whose bit fields drive the
  // entropy decode: main_data_begin, scfsi, and per granule
  // part2_3_length / big_values / global_gain / scalefac_compress /
  // window switching (block type, table selects, subblock gains) /
  // region counts / preflag / scalefac_scale / count1table_select.
  // Parsing it is pure bit arithmetic over documented offsets; only
  // the HUFFMAN SPECTRAL payload beyond it stays out of scope.
  // ------------------------------------------------------------------

  private final class BitReader(b: Array[Byte], var bitPos: Int) {
    def read(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val byteI = bitPos >> 3
        if (byteI >= b.length) throw new IndexOutOfBoundsException
        v = (v << 1) | ((b(byteI) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1; i += 1
      }
      v
    }
  }

  private final class BitWriter(capacityBytes: Int) {
    val buf = new Array[Byte](capacityBytes)
    var bitPos = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        if (((v >> i) & 1) == 1)
          buf(bitPos >> 3) = (buf(bitPos >> 3) | (1 << (7 - (bitPos & 7)))).toByte
        bitPos += 1; i -= 1
      }
    }
  }

  final case class Mp3SideInfo(media_id: Long, n_frames: Long,
                               sum_part23: Long, sum_big_values: Long,
                               max_gain: Long, n_short_granules: Long,
                               n_preflag: Long, valid: Boolean)

  /** Walk frames AND bit-decode each frame's mono side info (skipping
    * the 2-byte CRC when the protection bit says one is present).
    * Validation: big_values ≤ 288 (the spectral line bound) and a set
    * windows-switching flag must carry a nonzero block type — both
    * malformed states a real decoder rejects. Malformed → all-zero
    * `valid=false`, never a throw. */
  private[graft] def parseSideInfo(id: Long, b: Array[Byte]): Mp3SideInfo = {
    val invalid = Mp3SideInfo(id, 0L, 0L, 0L, 0L, 0L, 0L, valid = false)
    try {
      var off = 0
      var nFrames = 0L; var sumP23 = 0L; var sumBv = 0L
      var maxGain = 0L; var nShort = 0L; var nPre = 0L
      var sampleRate = -1
      while (off < b.length) {
        if (off + 4 > b.length) return invalid
        val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
        val b2 = b(off + 2) & 0xff; val b3 = b(off + 3) & 0xff
        if (b0 != 0xff || (b1 & 0xfe) != 0xfa) return invalid
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        val padding = (b2 >> 1) & 0x1
        val mode = (b3 >> 6) & 0x3
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return invalid
        if (mode != 3) return invalid // side-info gate covers mono
        val sr = SampleRates(srIdx)
        if (sampleRate < 0) sampleRate = sr
        else if (sampleRate != sr) return invalid
        val frameLen = 144 * Bitrates(brIdx) * 1000 / sr + padding
        if (off + frameLen > b.length) return invalid
        val crcBytes = if ((b1 & 1) == 0) 2 else 0
        val siStart = off + 4 + crcBytes
        if (siStart + 17 > off + frameLen) return invalid
        val r = new BitReader(b, siStart * 8)
        r.read(9)  // main_data_begin
        r.read(5)  // private bits (mono)
        r.read(4)  // scfsi
        var g = 0
        while (g < 2) {
          val p23 = r.read(12)
          val bv = r.read(9)
          val gg = r.read(8)
          r.read(4) // scalefac_compress
          val wsf = r.read(1)
          if (wsf == 1) {
            val blockType = r.read(2)
            if (blockType == 0) return invalid // forbidden with wsf set
            r.read(1)              // mixed_block_flag
            r.read(5); r.read(5)   // table_select × 2
            r.read(3); r.read(3); r.read(3) // subblock_gain × 3
          } else {
            r.read(5); r.read(5); r.read(5) // table_select × 3
            r.read(4); r.read(3)            // region0/region1 counts
          }
          val pre = r.read(1)
          r.read(1) // scalefac_scale
          r.read(1) // count1table_select
          if (bv > 288) return invalid
          sumP23 += p23; sumBv += bv
          maxGain = math.max(maxGain, gg)
          nShort += wsf; nPre += pre
          g += 1
        }
        nFrames += 1
        off += frameLen
      }
      if (nFrames == 0) invalid
      else Mp3SideInfo(id, nFrames, sumP23, sumBv, maxGain, nShort, nPre,
        valid = true)
    } catch {
      case _: IndexOutOfBoundsException => invalid
    }
  }

  /** Distributed side-info decode (the codec seam). */
  def decodeMp3SideInfo(media: Dataset[(Long, Array[Byte])]): Dataset[Mp3SideInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map { case (id, bytes) => parseSideInfo(id, bytes) })
  }

  /** Synthesize a frame sequence with REAL bit-packed mono side info
    * (imperative seam — the r9 q149/q153/q166 pattern): frame i keeps
    * q154's length arithmetic (bitrate 1+(seed+i)%14, padding
    * (seed+i)%2, constant srIdx) with protection OFF (no CRC), and
    * granule g of frame i carries deterministic side-info fields the
    * oracle replays:
    *   part2_3_length = 100 + ((seed+i)·7 + g·13) % 300
    *   big_values     = ((seed+i)·5 + g·11) % 288
    *   global_gain    = ((seed+i)·3 + g) % 256
    *   short windows  ⇔ (i+g) % 3 = 0 (block type 2)
    *   preflag        = (seed+i+g) % 2
    * plus scalefac_compress/table_select/subblock_gain/region-count
    * fields from similar mixes, so every bit position in the 17-byte
    * layout is load-bearing. Main data stays zero (entropy layer out
    * of scope). */
  def mp3PayloadSideInfo(nFrames: Int, seed: Int, srIdx: Int): Array[Byte] = {
    require(nFrames >= 1 && srIdx >= 0 && srIdx <= 2 && seed >= 0,
      s"bad synthesis params n=$nFrames seed=$seed sr=$srIdx")
    val sr = SampleRates(srIdx)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < nFrames) {
      val brIdx = 1 + (seed + i) % 14
      val pad = (seed + i) % 2
      val frameLen = 144 * Bitrates(brIdx) * 1000 / sr + pad
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // MPEG-1 L3, protection off (no CRC)
      frame(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
      frame(3) = 0xc0.toByte // mono
      val w = new BitWriter(17)
      w.write(0, 9) // main_data_begin: self-contained frames
      w.write(0, 5)
      w.write(0, 4) // scfsi
      var g = 0
      while (g < 2) {
        w.write(100 + ((seed + i) * 7 + g * 13) % 300, 12)
        w.write(((seed + i) * 5 + g * 11) % 288, 9)
        w.write(((seed + i) * 3 + g) % 256, 8)
        w.write((i + g) % 16, 4)
        val wsf = if ((i + g) % 3 == 0) 1 else 0
        w.write(wsf, 1)
        if (wsf == 1) {
          w.write(2, 2) // block type 2: short windows
          w.write(0, 1)
          w.write(((seed + i) * 2 + g) % 32, 5)
          w.write(((seed + i) * 3 + g) % 32, 5)
          w.write((seed + i) % 8, 3)
          w.write((seed + i + 1) % 8, 3)
          w.write((seed + i + 2) % 8, 3)
        } else {
          w.write(((seed + i) * 2 + g) % 32, 5)
          w.write(((seed + i) * 3 + g) % 32, 5)
          w.write(((seed + i) * 4 + g) % 32, 5)
          w.write((seed + i + g) % 16, 4)
          w.write((seed + g) % 8, 3)
        }
        w.write((seed + i + g) % 2, 1)
        w.write((seed + g) % 2, 1)
        w.write((i + g) % 2, 1)
        g += 1
      }
      System.arraycopy(w.buf, 0, frame, 4, 17)
      out.write(frame, 0, frameLen)
      i += 1
    }
    out.toByteArray
  }

  /** Synthesize a REAL MPEG-1 Layer III frame sequence in pure codegen
    * (the wavPayload pattern): `nFrames` frames where frame i carries
    * bitrate index `1 + (seed + i) % 14`, the stream-constant sample
    * rate `srIdx`, and padding `(seed + i) % 2` — so every frame's
    * length (and therefore every frame's OFFSET) depends on header
    * bits the parser must actually decode. Payload bytes are zeros.
    *
    * 100 TB shape: map-side column expression — no shuffle, no UDF. */
  def mp3Payload(nFrames: Column, seed: Column, srIdx: Column): Column = {
    def hx(x: Column): Column = lpad(hex(x.cast("long") % 256), 2, "0")
    val sr = when(srIdx === 0, SampleRates(0))
      .when(srIdx === 1, SampleRates(1)).otherwise(SampleRates(2))
    val frames = transform(sequence(lit(0), nFrames - 1), i => {
      val brIdx = pmod(seed + i, lit(14)) + 1
      val pad = pmod(seed + i, lit(2))
      val br = (1 to 14).foldLeft(lit(0)) { (acc, k) =>
        when(brIdx === k, lit(Bitrates(k))).otherwise(acc)
      }
      val frameLen = floor(lit(144) * br * 1000 / sr).cast("int") + pad
      concat(lit("FFFA"),
        hx(shiftleft(brIdx, 4) + srIdx * 4 + pad * 2),
        lit("C0"),
        repeat(lit("00"), frameLen - 4))
    })
    unhex(aggregate(frames, lit(""), (acc, f) => concat(acc, f)))
  }
}
