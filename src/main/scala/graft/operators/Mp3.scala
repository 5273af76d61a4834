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
  * bitrate/samplerate/padding bits cannot land on the next frame.
  * Above the frame walk, the ENTROPY layer is decoded for a documented
  * SUBSET (r9): [[parseSideInfo]] reads the 136-bit mono side-info
  * block bit-exactly, and [[parseSpectral]] Huffman-decodes big-values
  * region ISO table 1 + count1 table B, landing part2_3_length-exact;
  * the BIT RESERVOIR (r10) is honored — each frame's main data starts
  * `main_data_begin` bytes back inside the accumulated reservoir of
  * previous frames' main-data slots. Streams outside the subset
  * (other Huffman tables, linbits) → `valid=false`,
  * never wrong. The r10 SYNTHESIS layer ([[parseSynth]]) postprocesses
  * the decoded spectrum — requantization, IMDCT, windowing,
  * overlap-add, frequency inversion, polyphase matrixing — for EVERY
  * ISO window shape (r11): long, SHORT (per-window subblock gains,
  * the (sfb, window, line) → (subband, window, line) reorder, three
  * 12-point IMDCTs into the hybrid 36-sample grid), START/STOP
  * transition windows, and MIXED blocks (long bands 0..7 + short
  * sfb 3..12 inside one granule). It stops at the documented
  * 512-tap-FIR boundary; the entropy layer's linbits/non-table-1
  * Huffman tables are the remaining documented edge — DELIBERATELY
  * (r12): the 32 big-value tables are pure published DATA
  * (ISO 11172-3 Annex B), and this environment carries no MP3
  * reference implementation or MPEG-1 real-encoder fixture to
  * verify a transcription against (the lone real file on the
  * machine is MPEG-2 LSF, a different side-info profile). A
  * self-consistent synthesize-and-decode gate cannot detect a
  * mistranscribed code table — encoder and decoder would share the
  * error — which is below the codec family's differential standard
  * (avro-java consumes q227/q235 bytes; Spark's reader consumes
  * q220/q231 bytes). Shipping unverifiable spec data as "done"
  * would be worse than the boundary.
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

  // ------------------------------------------------------------------
  // ENTROPY layer (r9, second half): the Huffman spectral decode the
  // blocked list carried as its last undecoded layer. Scope is the
  // documented SUBSET a self-contained stream can use — the baseline-
  // JPEG stance (L107): main_data_begin = 0 (no bit reservoir; r10
  // honors it), scfsi honored (r11: granule 1 reuses granule 0's
  // scalefactors in the selected groups — long granules only, the
  // ISO contract), all big-value regions coded with ISO/IEC 11172-3
  // Huffman table 1 (the 2×2 table; codes 1 / 01 / 001 / 000 for
  // (0,0) / (1,0) / (0,1) / (1,1), no linbits) and count1 coded with
  // table B (4-bit code = 15 − (v·8+w·4+x·2+y)). Within that subset
  // the decode is COMPLETE and real: slen-table-driven scalefactor
  // read (long 11+10 bands, short 6+6 bands × 3 windows), sign-coded
  // big-value pairs, count1 quadruples terminated EXACTLY at the
  // side-info's part2_3_length boundary, and the 576-line bound.
  // Streams outside the subset (other Huffman tables, linbits)
  // → valid=false, never a wrong answer.
  // ------------------------------------------------------------------

  /** ISO 11172-3 scalefac_compress → (slen1, slen2). */
  private[graft] val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private[graft] val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  final case class Mp3Spectral(media_id: Long, n_frames: Long,
                               sum_scalefac: Long, sum_abs: Long,
                               n_neg: Long, n_count1: Long,
                               sum_part23: Long, valid: Boolean)

  /** Decode one granule's Huffman table-1 big-value pair. Table 1 is a
    * complete prefix code over {0,1}²: 1 → (0,0), 01 → (1,0),
    * 001 → (0,1), 000 → (1,1). */
  private def readPair1(r: BitReader): (Int, Int) =
    if (r.read(1) == 1) (0, 0)
    else if (r.read(1) == 1) (1, 0)
    else if (r.read(1) == 1) (0, 1)
    else (1, 1)

  /** Walk frames and FULLY entropy-decode each mono granule within the
    * documented subset. Malformed or out-of-subset → all-zero
    * `valid=false`, never a throw. */
  private[graft] def parseSpectral(id: Long, b: Array[Byte]): Mp3Spectral = {
    val invalid = Mp3Spectral(id, 0L, 0L, 0L, 0L, 0L, 0L, valid = false)
    try {
      var off = 0
      var nFrames = 0L; var sumSf = 0L; var sumAbs = 0L
      var nNeg = 0L; var nC1 = 0L; var sumP23 = 0L
      var sampleRate = -1
      var resv = Array.emptyByteArray // bit-reservoir tail (≤ 511 bytes)
      while (off < b.length) {
        if (off + 4 > b.length) return invalid
        val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
        val b2 = b(off + 2) & 0xff; val b3 = b(off + 3) & 0xff
        if (b0 != 0xff || (b1 & 0xfe) != 0xfa) return invalid
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        val padding = (b2 >> 1) & 0x1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return invalid
        if (((b3 >> 6) & 0x3) != 3) return invalid // mono subset
        val sr = SampleRates(srIdx)
        if (sampleRate < 0) sampleRate = sr
        else if (sampleRate != sr) return invalid
        val frameLen = 144 * Bitrates(brIdx) * 1000 / sr + padding
        if (off + frameLen > b.length) return invalid
        val crcBytes = if ((b1 & 1) == 0) 2 else 0
        val siStart = off + 4 + crcBytes
        if (siStart + 17 > off + frameLen) return invalid

        val r = new BitReader(b, siStart * 8)
        // main_data_begin: the BIT RESERVOIR pointer (r10 — the r9
        // subset required 0). A frame's main data starts mdb bytes
        // BEFORE this frame's own slot, inside the accumulated
        // reservoir of previous frames' main-data bytes; a pointer
        // past the accumulated reservoir is malformed.
        val mdb = r.read(9)
        if (mdb > resv.length) return invalid
        r.read(5)
        val scfsi = r.read(4) // sharing honored below (r11, q232)
        // side info first (both granules), THEN the main data
        final case class Gr(p23: Int, bv: Int, sfc: Int, bt: Int,
                            mixed: Int, c1tab: Int)
        val grs = new Array[Gr](2)
        var g = 0
        while (g < 2) {
          val p23 = r.read(12)
          val bv = r.read(9)
          r.read(8) // global_gain
          val sfc = r.read(4)
          val wsf = r.read(1)
          var bt = 0
          var mixed = 0
          if (wsf == 1) {
            bt = r.read(2)
            if (bt == 0) return invalid
            mixed = r.read(1)
            if (mixed == 1 && bt != 2) return invalid // ISO: mixed ⇒ short
            if (r.read(5) != 1 || r.read(5) != 1) return invalid // table 1 only
            r.read(3); r.read(3); r.read(3)
          } else {
            if (r.read(5) != 1 || r.read(5) != 1 || r.read(5) != 1)
              return invalid // table 1 only
            r.read(4); r.read(3)
          }
          r.read(1) // preflag
          r.read(1) // scalefac_scale
          val c1tab = r.read(1)
          if (c1tab != 1) return invalid // count1 table B only
          if (bv > 288) return invalid
          grs(g) = Gr(p23, bv, sfc, bt, mixed, c1tab)
          g += 1
        }
        // scfsi shares scalefactors ACROSS granules: only meaningful
        // (and only emitted by encoders) when both granules are long
        if (scfsi != 0 && (grs(0).bt != 0 || grs(1).bt != 0))
          return invalid
        // main data: the last mdb reservoir bytes, then this frame's
        // own slot — one contiguous buffer (reading can never overrun
        // into the NEXT frame's header: those bytes are not in it)
        val slot = java.util.Arrays.copyOfRange(b, siStart + 17,
          off + frameLen)
        val mbuf = new Array[Byte](mdb + slot.length)
        System.arraycopy(resv, resv.length - mdb, mbuf, 0, mdb)
        System.arraycopy(slot, 0, mbuf, mdb, slot.length)
        val m = new BitReader(mbuf, 0)
        val sfPrev = new Array[Int](21) // granule 0's long scalefactors
        g = 0
        while (g < 2) {
          val gr = grs(g)
          val grStart = m.bitPos
          // part2: scalefactors
          val s1 = Slen1(gr.sfc); val s2 = Slen2(gr.sfc)
          if (gr.bt == 2 && gr.mixed == 1) { // mixed: 8 long + 9 short
            var k = 0
            while (k < 17) { sumSf += m.read(s1); k += 1 }
            k = 0
            while (k < 18) { sumSf += m.read(s2); k += 1 }
          } else if (gr.bt == 2) { // pure short
            var k = 0
            while (k < 18) { sumSf += m.read(s1); k += 1 }
            k = 0
            while (k < 18) { sumSf += m.read(s2); k += 1 }
          } else {
            // long (and start/stop): banded read; scfsi-shared bands
            // of granule 1 REUSE granule 0's value (nothing on the
            // wire) — sumSf accounts the EFFECTIVE scalefactors
            var band = 0
            while (band < 21) {
              val sl = if (band < 11) s1 else s2
              val shared = scfsi != 0 && g == 1 &&
                ((scfsi >> (3 - (if (band < 6) 0 else if (band < 11) 1
                  else if (band < 16) 2 else 3))) & 1) == 1
              val v = if (shared) sfPrev(band) else m.read(sl)
              if (g == 0) sfPrev(band) = v
              sumSf += v
              band += 1
            }
          }
          // part3: big_values pairs (table 1 + sign bits)
          var k = 0
          while (k < gr.bv) {
            val (x, y) = readPair1(m)
            if (x != 0) { sumAbs += x; nNeg += m.read(1) }
            if (y != 0) { sumAbs += y; nNeg += m.read(1) }
            k += 1
          }
          // count1: table-B quadruples until EXACTLY part2_3_length
          var lines = gr.bv * 2
          while (m.bitPos - grStart < gr.p23) {
            if (m.bitPos - grStart + 4 > gr.p23) return invalid
            val n = 15 - m.read(4)
            val v = (n >> 3) & 1; val w = (n >> 2) & 1
            val x = (n >> 1) & 1; val y = n & 1
            if (v != 0) { sumAbs += v; nNeg += m.read(1) }
            if (w != 0) { sumAbs += w; nNeg += m.read(1) }
            if (x != 0) { sumAbs += x; nNeg += m.read(1) }
            if (y != 0) { sumAbs += y; nNeg += m.read(1) }
            if (m.bitPos - grStart > gr.p23) return invalid
            lines += 4
            nC1 += 1
          }
          if (lines > 576) return invalid
          sumP23 += gr.p23
          g += 1
        }
        // roll the reservoir forward: keep the last 511 slot bytes
        // (the 9-bit pointer can never reach further back)
        resv =
          if (slot.length >= 511) java.util.Arrays.copyOfRange(slot,
            slot.length - 511, slot.length)
          else {
            val keep = math.min(511 - slot.length, resv.length)
            val nr = new Array[Byte](keep + slot.length)
            System.arraycopy(resv, resv.length - keep, nr, 0, keep)
            System.arraycopy(slot, 0, nr, keep, slot.length)
            nr
          }
        nFrames += 1
        off += frameLen
      }
      if (nFrames == 0) invalid
      else Mp3Spectral(id, nFrames, sumSf, sumAbs, nNeg, nC1, sumP23,
        valid = true)
    } catch {
      case _: IndexOutOfBoundsException => invalid
    }
  }

  /** Distributed entropy-layer decode (the codec seam). */
  def decodeMp3Spectral(media: Dataset[(Long, Array[Byte])]): Dataset[Mp3Spectral] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map { case (id, bytes) => parseSpectral(id, bytes) })
  }

  /** Synthesize a frame sequence whose main data carries REAL
    * Huffman-coded spectral content in the documented subset
    * (imperative seam): granule g of frame i codes
    *   big_values   = 2 + ((seed+i)·5 + g·7) % 24 table-1 pairs with
    *                  x = (seed+i+g+k) % 2, y = (seed+2i+g+k) % 2,
    *                  sign bits (seed+k) % 2 / (i+k) % 2,
    *   scalefactors = (seed+i+g+b) % 2^slen (long: 11+10 bands;
    *                  short: 6+6 bands × 3 windows, (i+g)%3=0 ⇒ short),
    *   count1       = 1 + (seed+i+g) % 6 table-B quadruples with
    *                  v,w,x,y = mod-2 mixes and per-nonzero sign bits,
    * and the side info's part2_3_length is the EXACT bit count of what
    * was written — a decoder with any code length wrong cannot land on
    * the count1 boundary. With `reservoir` (r10), consecutive frames
    * spill each M_k's head into the previous frame's slot and point
    * back at it with a real `main_data_begin` — same decoded content,
    * different byte layout, so only a reservoir-aware walk matches. */
  def mp3PayloadSpectral(nFrames: Int, seed: Int, srIdx: Int,
                         longOnly: Boolean = false,
                         reservoir: Boolean = false,
                         blockMode: Int = 0): Array[Byte] = {
    require(nFrames >= 1 && srIdx >= 0 && srIdx <= 2 && seed >= 0,
      s"bad synthesis params n=$nFrames seed=$seed sr=$srIdx")
    val sr = SampleRates(srIdx)
    // ---- pass 1: per frame, header + side info (mdb patched in pass
    // 2) + the byte-padded main-data block M_i
    final case class F(hdr: Array[Byte], si: Array[Byte],
                       m: Array[Byte], frameLen: Int)
    val fr = new Array[F](nFrames)
    var i = 0
    while (i < nFrames) {
      val brIdx = 1 + (seed + i) % 14
      val pad = (seed + i) % 2
      val frameLen = 144 * Bitrates(brIdx) * 1000 / sr + pad
      val hdr = Array[Byte](0xff.toByte, 0xfb.toByte,
        ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte, 0xc0.toByte)
      val si = new BitWriter(17)
      val main = new BitWriter(frameLen - 21)
      // blockMode 3 (r11, q232): long granules with SCFSI sharing —
      // granule 1 reuses granule 0's scalefactors in the set groups
      // and writes NOTHING for them
      val scfsi = if (blockMode == 3) (seed + i) % 16 else 0
      si.write(0, 9) // main_data_begin (patched in pass 2)
      si.write(0, 5)
      si.write(scfsi, 4) // scfsi
      var g = 0
      while (g < 2) {
        val grStart = main.bitPos
        val sfc = (i + g) % 16
        val s1 = Slen1(sfc); val s2 = Slen2(sfc)
        // blockMode 1 (r11, q225): granule block type cycles
        // long/start/short/stop; blockMode 2 (q226): the short
        // granules are MIXED (long bands 0..7 + short sfb 3..12);
        // the legacy modes keep their exact bit layouts
        // (q170/q200/q223 fixtures are byte-stable)
        val bt = if (blockMode == 1) (i + g) % 4
                 else if (blockMode == 3) 0 // scfsi mode: all long
                 else if (!longOnly && (i + g) % 3 == 0) 2 else 0
        val mixed = if (blockMode == 2 && bt == 2) 1 else 0
        val wsf = if (bt == 0) 0 else 1
        // part2 (start/stop are LONG-shaped: 11+10 bands;
        // mixed: 8 long + 9 short slen1, then 18 short slen2)
        if (bt == 2 && mixed == 1) {
          var k = 0
          while (k < 17) { main.write((seed + i + g + k) % (1 << s1), s1); k += 1 }
          k = 0
          while (k < 18) { main.write((seed + i + g + 17 + k) % (1 << s2), s2); k += 1 }
        } else if (bt == 2) {
          var k = 0
          while (k < 18) { main.write((seed + i + g + k) % (1 << s1), s1); k += 1 }
          k = 0
          while (k < 18) { main.write((seed + i + g + 18 + k) % (1 << s2), s2); k += 1 }
        } else {
          var band = 0
          while (band < 21) { // value for band b: (seed+i+g+b) mod 2^sl
            val sl = if (band < 11) s1 else s2
            val shared = scfsi != 0 && g == 1 &&
              ((scfsi >> (3 - (if (band < 6) 0 else if (band < 11) 1
                else if (band < 16) 2 else 3))) & 1) == 1
            if (!shared)
              main.write((seed + i + g + band) % (1 << sl), sl)
            band += 1
          }
        }
        // part3: big values, table 1
        val bv = 2 + ((seed + i) * 5 + g * 7) % 24
        var k = 0
        while (k < bv) {
          val x = (seed + i + g + k) % 2
          val y = (seed + 2 * i + g + k) % 2
          (x, y) match {
            case (0, 0) => main.write(1, 1)
            case (1, 0) => main.write(1, 2)
            case (0, 1) => main.write(1, 3)
            case _      => main.write(0, 3)
          }
          if (x != 0) main.write((seed + k) % 2, 1)
          if (y != 0) main.write((i + k) % 2, 1)
          k += 1
        }
        // count1: table B
        val n1 = 1 + (seed + i + g) % 6
        k = 0
        while (k < n1) {
          val v = (seed + i + k) % 2; val w = (i + g + k) % 2
          val x = (seed + g + k) % 2; val y = (seed + i + g + k) % 2
          main.write(15 - (v * 8 + w * 4 + x * 2 + y), 4)
          if (v != 0) main.write((seed + k) % 2, 1)
          if (w != 0) main.write((i + k) % 2, 1)
          if (x != 0) main.write((g + k) % 2, 1)
          if (y != 0) main.write((k) % 2, 1)
          k += 1
        }
        val p23 = main.bitPos - grStart
        require(p23 < 4096, s"part2_3_length $p23 overflows 12 bits")
        // side info for this granule, with the REAL part2_3_length
        si.write(p23, 12)
        si.write(bv, 9)
        si.write(((seed + i) * 3 + g) % 256, 8) // global_gain
        si.write(sfc, 4)
        si.write(wsf, 1)
        if (wsf == 1) {
          si.write(bt, 2) // block type 1/2/3
          si.write(mixed, 1)
          si.write(1, 5); si.write(1, 5) // table 1, both regions
          si.write((seed + i + g) % 8, 3)
          si.write((seed + i + g + 1) % 8, 3)
          si.write((seed + i + g + 2) % 8, 3)
        } else {
          si.write(1, 5); si.write(1, 5); si.write(1, 5) // table 1 x 3
          si.write(3, 4); si.write(3, 3) // region counts
        }
        si.write((seed + i + g) % 2, 1) // preflag
        si.write((seed + g) % 2, 1)     // scalefac_scale
        si.write(1, 1)                  // count1 table B
        g += 1
      }
      // M_i: the granule bits padded to a byte boundary (ancillary
      // zeros) -- main_data_begin is a BYTE pointer, so every frame's
      // main data starts byte-aligned in the reservoir stream
      val mBytes = java.util.Arrays.copyOf(main.buf, (main.bitPos + 7) / 8)
      require(mBytes.length <= frameLen - 21,
        s"main data ${mBytes.length} B overflows frame $frameLen")
      fr(i) = F(hdr, si.buf, mBytes, frameLen)
      i += 1
    }
    // ---- pass 2: reservoir packing (r10). With `reservoir`, frame
    // k's first mdb_k bytes ride at the very END of frame k-1's slot
    // (the bit-reservoir spill a real encoder performs); without it
    // every M_k sits in its own slot (mdb = 0, the r9 layout).
    val caps = fr.map(_.frameLen - 21)
    val slots = caps.map(new Array[Byte](_))
    var prevFree = 0
    i = 0
    while (i < nFrames) {
      val mk = fr(i).m
      val mdb =
        if (!reservoir || i == 0) 0
        else math.min(math.min(prevFree, mk.length), 511)
      if (mdb > 0)
        System.arraycopy(mk, 0, slots(i - 1), caps(i - 1) - mdb, mdb)
      System.arraycopy(mk, mdb, slots(i), 0, mk.length - mdb)
      prevFree = caps(i) - (mk.length - mdb)
      // patch the 9-bit mdb into the side info's first two bytes
      fr(i).si(0) = (mdb >> 1).toByte
      fr(i).si(1) = ((fr(i).si(1) & 0x7f) | ((mdb & 1) << 7)).toByte
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    i = 0
    while (i < nFrames) {
      out.write(fr(i).hdr); out.write(fr(i).si); out.write(slots(i))
      i += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // SYNTHESIS layer (r10, VERDICT r9 #8): requantization → IMDCT →
  // sine windowing → overlap-add → frequency inversion → polyphase
  // MATRIXING, for LONG-block mono granules in the q170 entropy
  // subset. Everything here is pure arithmetic postprocessing of the
  // Huffman-decoded spectrum — no further bitstream structure. The
  // subset's values are all ±1/0 (table 1 + count1 B), so the 4/3
  // power is the identity and requantization reduces to the gain
  // ladder 2^((gg−210)/4) · 2^(−mult·(scalefac + preflag·pretab)).
  // All transcendental constants (IMDCT cosines, sine window,
  // matrixing cosines, the two gain ladders) live in SHARED tables
  // that the oracle receives as literal doubles — cross-engine
  // equality then rests only on IEEE mul/add, never on libm parity.
  // DOCUMENTED BOUNDARY: the final 512-tap synthesis-window FIR
  // (ISO 11172-3 Table B.3) is a fixed convolution with tabulated
  // coefficients that no formula generates; the matrixed V stage is
  // the last structural arithmetic and is where the gate stops.
  // ------------------------------------------------------------------

  /** Long-block scalefactor-band widths per sample rate
    * (ISO 11172-3 Table B.8; 22 bands summing to 576). */
  private[graft] val SfbWidthsLong: Array[Array[Int]] = Array(
    Array(4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 28, 34, 42,
      50, 54, 76, 158), // 44100
    Array(4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10, 12, 16, 18, 22, 28, 34, 40,
      46, 54, 54, 192), // 48000
    Array(4, 4, 4, 4, 4, 4, 6, 6, 8, 10, 12, 16, 20, 24, 30, 38, 46, 56,
      68, 84, 102, 26)) // 32000

  /** line → band map (576 entries per sample rate). */
  private[graft] val BandMap: Array[Array[Int]] =
    SfbWidthsLong.map { ws =>
      val m = new Array[Int](576)
      var b = 0; var p = 0
      while (b < ws.length) {
        var k = 0
        while (k < ws(b)) { m(p) = b; p += 1; k += 1 }
        b += 1
      }
      m
    }

  /** preflag pretab (ISO Table B.6, bands 0..20; band 21 → 0). */
  private[graft] val Pretab: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2)

  /** SHORT-block scalefactor-band widths per sample rate (ISO 11172-3
    * Table B.8; 13 bands summing to 192 per window — r11, q223). */
  private[graft] val SfbWidthsShort: Array[Array[Int]] = Array(
    Array(4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56), // 44100
    Array(4, 4, 4, 4, 6, 6, 10, 12, 14, 16, 20, 26, 66), // 48000
    Array(4, 4, 4, 4, 6, 8, 12, 16, 20, 26, 34, 42, 12)) // 32000

  /** Decode-order maps for pure-short granules: the Huffman stream
    * orders lines (sfb, window, line-in-band) — for each of the 576
    * decode positions these give the window, the scalefactor band and
    * the per-window FREQUENCY line (what the reorder step needs). */
  private[graft] val ShortWinMap: Array[Array[Int]] = shortMaps(0)
  private[graft] val ShortSfbMap: Array[Array[Int]] = shortMaps(1)
  private[graft] val ShortFreqMap: Array[Array[Int]] = shortMaps(2)

  private def shortMaps(which: Int): Array[Array[Int]] =
    SfbWidthsShort.map { ws =>
      val out = new Array[Int](576)
      var p = 0; var ob = 0
      var b = 0
      while (b < ws.length) {
        var w = 0
        while (w < 3) {
          var k = 0
          while (k < ws(b)) {
            out(p) = which match {
              case 0 => w
              case 1 => b
              case _ => ob + k
            }
            p += 1; k += 1
          }
          w += 1
        }
        ob += ws(b)
        b += 1
      }
      out
    }

  /** 12×6 short-block IMDCT cosines: cos(π/24·(2n+7)(2k+1)). */
  private[graft] val ImdctCosS: Array[Double] =
    Array.tabulate(12 * 6) { nk =>
      val n = nk / 6; val k = nk % 6
      math.cos(math.Pi / 24.0 * (2 * n + 7) * (2 * k + 1))
    }

  /** Short-block sine window: sin(π/12·(n+0.5)). */
  private[graft] val SynthWinS: Array[Double] =
    Array.tabulate(12)(n => math.sin(math.Pi / 12.0 * (n + 0.5)))

  /** START window (block type 1, ISO 2.4.3.4.10.3): long sine rise,
    * flat top, short sine fall, zero tail — the long→short
    * transition shape. */
  private[graft] val SynthWinStart: Array[Double] =
    Array.tabulate(36) { n =>
      if (n < 18) math.sin(math.Pi / 36.0 * (n + 0.5))
      else if (n < 24) 1.0
      else if (n < 30) math.sin(math.Pi / 12.0 * (n - 18 + 0.5))
      else 0.0
    }

  /** STOP window (block type 3): the mirror — zero head, short sine
    * rise, flat, long sine fall. */
  private[graft] val SynthWinStop: Array[Double] =
    Array.tabulate(36) { n =>
      if (n < 6) 0.0
      else if (n < 12) math.sin(math.Pi / 12.0 * (n - 6 + 0.5))
      else if (n < 18) 1.0
      else math.sin(math.Pi / 36.0 * (n + 0.5))
    }

  /** 2^(−2·subblock_gain), gain 0..7 — exact powers of two. */
  private[graft] val SbGainTab: Array[Double] =
    Array.tabulate(8)(j => math.pow(2.0, -2.0 * j))

  // ---- MIXED blocks (r11, q226): long bands 0..7 cover the first 36
  // lines (their widths 4·6+6·2 = 36 at every MPEG-1 rate — subbands
  // 0..1), short sfb 3..12 × 3 windows cover the rest. ----

  /** line → long band for the mixed long region (36 lines, bands
    * 0..7 — identical at all three sample rates). */
  private[graft] val MixedLongBand: Array[Int] = {
    val widths = Array(4, 4, 4, 4, 4, 4, 6, 6)
    val m = new Array[Int](36)
    var b = 0; var p = 0
    while (b < widths.length) {
      var k = 0
      while (k < widths(b)) { m(p) = b; p += 1; k += 1 }
      b += 1
    }
    m
  }

  /** Decode-order maps for the mixed SHORT region (540 entries:
    * sfb 3..12, window-minor inside each band; per-window frequency
    * lines start at 12). */
  private[graft] val MixedWinMap: Array[Array[Int]] = mixedMaps(0)
  private[graft] val MixedSfbMap: Array[Array[Int]] = mixedMaps(1)
  private[graft] val MixedFreqMap: Array[Array[Int]] = mixedMaps(2)

  private def mixedMaps(which: Int): Array[Array[Int]] =
    SfbWidthsShort.map { ws =>
      val out = new Array[Int](540)
      var p = 0
      var ob = ws(0) + ws(1) + ws(2) // short region starts at sfb 3
      var b = 3
      while (b < ws.length) {
        var w = 0
        while (w < 3) {
          var k = 0
          while (k < ws(b)) {
            out(p) = which match {
              case 0 => w
              case 1 => b
              case _ => ob + k
            }
            p += 1; k += 1
          }
          w += 1
        }
        ob += ws(b)
        b += 1
      }
      require(p == 540, s"mixed map built $p entries")
      out
    }

  /** 2^((gg−210)/4) for gg 0..255 — the global-gain ladder. */
  private[graft] val GainTab: Array[Double] =
    Array.tabulate(256)(gg => math.pow(2.0, 0.25 * (gg - 210)))

  /** 2^(−mult·k), mult 0.5 (ss=0) / 1.0 (ss=1), k 0..18. */
  private[graft] val SfTab: Array[Array[Double]] =
    Array.tabulate(2, 19)((ss, k) =>
      math.pow(2.0, -(if (ss == 1) 1.0 else 0.5) * k))

  /** 36×18 long-block IMDCT cosines: cos(π/72·(2n+19)(2i+1)). */
  private[graft] val ImdctCos: Array[Double] =
    Array.tabulate(36 * 18) { ni =>
      val n = ni / 18; val i = ni % 18
      math.cos(math.Pi / 72.0 * (2 * n + 19) * (2 * i + 1))
    }

  /** Long-block (type 0) sine window: sin(π/36·(n+0.5)). */
  private[graft] val SynthWin: Array[Double] =
    Array.tabulate(36)(n => math.sin(math.Pi / 36.0 * (n + 0.5)))

  /** 64×32 polyphase matrixing cosines: cos((16+i)(2k+1)π/64). */
  private[graft] val MatrixCos: Array[Double] =
    Array.tabulate(64 * 32) { ik =>
      val i = ik / 32; val k = ik % 32
      math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0)
    }

  final case class Mp3Synth(media_id: Long, n_frames: Long, sum_xr_q: Long,
                            sum_td_q: Long, sum_v_q: Long, valid: Boolean)

  /** Walk frames, entropy-decode each LONG-block mono granule in the
    * q170 subset, then run the synthesis chain. Outputs per-stream
    * 1e-9-quantized sums of (a) the requantized spectrum, (b) the
    * time-domain subband samples after IMDCT + windowing +
    * overlap-add + frequency inversion, (c) the step-0 matrixed V
    * vector of every granule (the matrixing is a fixed linear map —
    * one step per granule pins it over all 32 subband inputs).
    * EVERY ISO window shape synthesizes (r11): long, pure-short
    * (subblock gains, reorder, 12-point IMDCTs), start/stop
    * (asymmetric transition windows), and mixed (long subbands 0..1
    * + short above, inside one granule). Reservoir and non-table-1
    * streams → `valid=false`, never wrong. */
  private[graft] def parseSynth(id: Long, b: Array[Byte]): Mp3Synth = {
    val invalid = Mp3Synth(id, 0L, 0L, 0L, 0L, valid = false)
    try {
      var off = 0
      var nFrames = 0L
      var sumXr = 0L; var sumTd = 0L; var sumV = 0L
      var sampleRate = -1; var srIdx = -1
      // overlap buffer: previous granule's windowed tail, per subband
      val prevTail = Array.ofDim[Double](32, 18)
      def q9(x: Double): Long = math.floor(x * 1e9).toLong
      while (off < b.length) {
        if (off + 4 > b.length) return invalid
        val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
        val b2 = b(off + 2) & 0xff; val b3 = b(off + 3) & 0xff
        if (b0 != 0xff || (b1 & 0xfe) != 0xfa) return invalid
        val brIdx = (b2 >> 4) & 0xf
        val sri = (b2 >> 2) & 0x3
        val padding = (b2 >> 1) & 0x1
        if (brIdx == 0 || brIdx == 15 || sri == 3) return invalid
        if (((b3 >> 6) & 0x3) != 3) return invalid // mono subset
        val sr = SampleRates(sri)
        if (sampleRate < 0) { sampleRate = sr; srIdx = sri }
        else if (sampleRate != sr) return invalid
        val frameLen = 144 * Bitrates(brIdx) * 1000 / sr + padding
        if (off + frameLen > b.length) return invalid
        val crcBytes = if ((b1 & 1) == 0) 2 else 0
        val siStart = off + 4 + crcBytes
        if (siStart + 17 > off + frameLen) return invalid
        val frameEndBit = (off + frameLen) * 8

        val r = new BitReader(b, siStart * 8)
        if (r.read(9) != 0) return invalid // reservoir out of subset
        r.read(5)
        val scfsi = r.read(4) // sharing honored below (r11, q232)
        final case class Gr(p23: Int, bv: Int, gg: Int, sfc: Int,
                            pre: Int, ss: Int, bt: Int, mixed: Int,
                            sbg: Array[Int])
        val grs = new Array[Gr](2)
        var g = 0
        while (g < 2) {
          val p23 = r.read(12)
          val bv = r.read(9)
          val gg = r.read(8)
          val sfc = r.read(4)
          val wsf = r.read(1)
          var sbg: Array[Int] = null
          var bt = 0
          var mixed = 0
          if (wsf == 1) { // window switching: start/short/stop/mixed
            bt = r.read(2)
            if (bt == 0) return invalid
            mixed = r.read(1)
            if (mixed == 1 && bt != 2) return invalid // ISO: mixed ⇒ short
            if (r.read(5) != 1 || r.read(5) != 1)
              return invalid // table 1 only
            // subblock gains are in the layout for every switching
            // type; they REQUANTIZE only type-2 windows
            sbg = Array(r.read(3), r.read(3), r.read(3))
          } else {
            if (r.read(5) != 1 || r.read(5) != 1 || r.read(5) != 1)
              return invalid // table 1 only
            r.read(4); r.read(3)
          }
          val pre = r.read(1)
          val ss = r.read(1)
          if (r.read(1) != 1) return invalid // count1 table B only
          if (bv > 288) return invalid
          grs(g) = Gr(p23, bv, gg, sfc, pre, ss, bt, mixed, sbg)
          g += 1
        }
        if (scfsi != 0 && (grs(0).bt != 0 || grs(1).bt != 0))
          return invalid // sharing is a long-granule contract
        val m = new BitReader(b, (siStart + 17) * 8)
        val sf0 = new Array[Int](21) // granule 0's long scalefactors
        g = 0
        while (g < 2) {
          val gr = grs(g)
          val grStart = m.bitPos
          val s1 = Slen1(gr.sfc); val s2 = Slen2(gr.sfc)
          // part2: scalefactors — long AND start/stop: 11 + 10
          // bands; short (r11): 6 + 6 bands × 3 windows, band-major
          // window-minor
          val sf = new Array[Int](22) // long; band 21 stays 0
          val sfS =
            if (gr.bt == 2) Array.ofDim[Int](3, 13) // band 12 stays 0
            else null
          if (gr.bt == 2 && gr.mixed == 1) {
            // mixed: 8 long bands (slen1), short sfb 3..5 ×3 (slen1),
            // short sfb 6..11 ×3 (slen2) — decode order per ISO
            var bq = 0
            while (bq < 8) { sf(bq) = m.read(s1); bq += 1 }
            bq = 3
            while (bq < 12) {
              val sl = if (bq < 6) s1 else s2
              var w = 0
              while (w < 3) { sfS(w)(bq) = m.read(sl); w += 1 }
              bq += 1
            }
          } else if (gr.bt == 2) {
            var bq = 0
            while (bq < 12) {
              val sl = if (bq < 6) s1 else s2
              var w = 0
              while (w < 3) { sfS(w)(bq) = m.read(sl); w += 1 }
              bq += 1
            }
          } else {
            var band = 0
            while (band < 21) {
              val sl = if (band < 11) s1 else s2
              val shared = scfsi != 0 && g == 1 &&
                ((scfsi >> (3 - (if (band < 6) 0 else if (band < 11) 1
                  else if (band < 16) 2 else 3))) & 1) == 1
              sf(band) = if (shared) sf0(band) else m.read(sl)
              band += 1
            }
            if (g == 0) System.arraycopy(sf, 0, sf0, 0, 21)
          }
          // part3: signed spectral lines
          val is = new Array[Int](576)
          var k = 0
          while (k < gr.bv) {
            val (x, y) = readPair1(m)
            var sx = 0; var sy = 0
            if (x != 0) sx = m.read(1)
            if (y != 0) sy = m.read(1)
            is(2 * k) = if (sx == 1) -x else x
            is(2 * k + 1) = if (sy == 1) -y else y
            k += 1
          }
          var lines = gr.bv * 2
          while (m.bitPos - grStart < gr.p23) {
            if (m.bitPos - grStart + 4 > gr.p23) return invalid
            if (lines + 4 > 576) return invalid
            val n = 15 - m.read(4)
            var q = 0
            while (q < 4) {
              val v = (n >> (3 - q)) & 1
              var sv = 0
              if (v != 0) sv = m.read(1)
              is(lines + q) = if (sv == 1) -v else v
              q += 1
            }
            if (m.bitPos - grStart > gr.p23) return invalid
            lines += 4
          }
          if (m.bitPos > frameEndBit) return invalid
          // ---- requantization (values are ±1/0: the 4/3 power is id)
          val xr = new Array[Double](576)
          if (gr.bt == 2 && gr.mixed == 1) {
            // mixed (r11, q226): lines 0..35 are the LONG region
            // (bands 0..7 — pretab is zero there by table), the rest
            // is the short region reordered like pure short but with
            // per-window frequency lines starting at 12
            val wm = MixedWinMap(srIdx); val bm2 = MixedSfbMap(srIdx)
            val fm = MixedFreqMap(srIdx)
            var idx = 0
            while (idx < 576) {
              val v = is(idx)
              if (v != 0) {
                if (idx < 36) {
                  val bd = MixedLongBand(idx)
                  val fac = GainTab(gr.gg) * SfTab(gr.ss)(sf(bd))
                  val x = v * fac
                  xr(idx) = x
                  sumXr += q9(x)
                } else {
                  val j = idx - 36
                  val w = wm(j); val bd = bm2(j); val f = fm(j)
                  val kexp = if (bd < 12) sfS(w)(bd) else 0
                  val fac = GainTab(gr.gg) * SbGainTab(gr.sbg(w)) *
                    SfTab(gr.ss)(kexp)
                  val x = v * fac
                  xr((f / 6) * 18 + w * 6 + f % 6) = x
                  sumXr += q9(x)
                }
              }
              idx += 1
            }
          } else if (gr.bt == 2) {
            // short (r11): per-window subblock gain + window
            // scalefactors (no pretab), REORDERED from the stream's
            // (sfb, window, line) order to (subband, window, line)
            // for the per-window IMDCT
            val wm = ShortWinMap(srIdx); val bm2 = ShortSfbMap(srIdx)
            val fm = ShortFreqMap(srIdx)
            var idx = 0
            while (idx < 576) {
              val v = is(idx)
              if (v != 0) {
                val w = wm(idx); val bd = bm2(idx); val f = fm(idx)
                val kexp = if (bd < 12) sfS(w)(bd) else 0
                val fac = GainTab(gr.gg) * SbGainTab(gr.sbg(w)) *
                  SfTab(gr.ss)(kexp)
                val x = v * fac
                xr((f / 6) * 18 + w * 6 + f % 6) = x
                sumXr += q9(x)
              }
              idx += 1
            }
          } else {
            val bmap = BandMap(srIdx)
            var idx = 0
            while (idx < 576) {
              val v = is(idx)
              if (v != 0) {
                val bd = bmap(idx)
                val kexp = (if (bd < 21) sf(bd) else 0) +
                  gr.pre * (if (bd < 21) Pretab(bd) else 0)
                val fac = GainTab(gr.gg) * SfTab(gr.ss)(kexp)
                val x = v * fac
                xr(idx) = x
                sumXr += q9(x)
              }
              idx += 1
            }
          }
          // ---- IMDCT + sine window + overlap-add + inversion:
          // long = one 36-point transform; short = three 12-point
          // transforms windowed into the 36-sample grid at offsets
          // 6/12/18 (the hybrid window — edges stay zero)
          val s = new Array[Double](32) // step-0 samples for matrixing
          // start/stop are long-shaped transforms under asymmetric
          // windows — only the window table changes
          val winL =
            if (gr.bt == 1) SynthWinStart
            else if (gr.bt == 3) SynthWinStop
            else SynthWin
          var sb = 0
          while (sb < 32) {
            val z = new Array[Double](36)
            // mixed: the two lowest subbands are LONG transforms under
            // the normal window; everything else follows the type
            if (gr.bt == 2 && !(gr.mixed == 1 && sb < 2)) {
              var w = 0
              while (w < 3) {
                var n = 0
                while (n < 12) {
                  var acc = 0.0
                  var k = 0
                  while (k < 6) {
                    acc += ImdctCosS(n * 6 + k) *
                      xr(sb * 18 + w * 6 + k)
                    k += 1
                  }
                  z(6 + 6 * w + n) += acc * SynthWinS(n)
                  n += 1
                }
                w += 1
              }
            } else {
              var n = 0
              while (n < 36) {
                var acc = 0.0
                var i = 0
                while (i < 18) {
                  acc += ImdctCos(n * 18 + i) * xr(sb * 18 + i)
                  i += 1
                }
                z(n) = acc * winL(n)
                n += 1
              }
            }
            var t = 0
            while (t < 18) {
              var td = z(t) + prevTail(sb)(t)
              if ((sb & 1) == 1 && (t & 1) == 1) td = -td
              sumTd += q9(td)
              if (t == 0) s(sb) = td
              prevTail(sb)(t) = z(18 + t)
              t += 1
            }
            sb += 1
          }
          // ---- polyphase matrixing, step 0 of this granule
          var i64 = 0
          while (i64 < 64) {
            var acc = 0.0
            var k32 = 0
            while (k32 < 32) {
              acc += MatrixCos(i64 * 32 + k32) * s(k32)
              k32 += 1
            }
            sumV += q9(acc)
            i64 += 1
          }
          g += 1
        }
        nFrames += 1
        off += frameLen
      }
      if (nFrames == 0) invalid
      else Mp3Synth(id, nFrames, sumXr, sumTd, sumV, valid = true)
    } catch {
      case _: IndexOutOfBoundsException => invalid
    }
  }

  /** Distributed synthesis decode (the codec seam). */
  def decodeMp3Synth(media: Dataset[(Long, Array[Byte])]): Dataset[Mp3Synth] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map { case (id, bytes) => parseSynth(id, bytes) })
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
