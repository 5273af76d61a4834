package graft.operators

/** Dependency-free Snappy RAW-block decompressor — Parquet's default
  * page codec (what `spark.write.parquet` produces out of the box),
  * from the public format description (`snappy/format_description.txt`):
  *
  *  - preamble: varint (ULEB128) uncompressed length;
  *  - elements: tag byte, low 2 bits select the kind —
  *    `00` literal (6-bit length, 60–63 escape to 1–4 extra LE
  *    length bytes), `01` copy with 3-bit length 4–11 and 11-bit
  *    offset (3 tag bits ++ one byte), `10` copy with 6-bit length
  *    and 2-byte LE offset, `11` copy with 4-byte LE offset;
  *  - copies may SELF-OVERLAP (offset < length — the RLE trick), so
  *    the copy loop is byte-at-a-time; offset 0 or reaching before
  *    the output start is malformed;
  *  - the decoded stream must land EXACTLY on the declared length
  *    (an `expect` cap rejects both overrun and shortfall — the
  *    zip-bomb stance: output is bounded by the caller's declared
  *    size before a byte is decoded).
  *
  * Verified differentially against snappy-java (the reference
  * implementation Spark itself links) — the Jpeg-vs-JDK stance.
  *
  * Throws `Snappy.Malformed` on any structural violation; callers
  * behind the codec seam catch it into their `valid=false` rows. */
object Snappy {

  case object Malformed extends Exception {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  /** Decompress `b[off, off+len)`; `expect >= 0` additionally demands
    * the declared uncompressed length equals it (Parquet pages carry
    * the expected size in their header). */
  def decompress(b: Array[Byte], off: Int, len: Int,
                 expect: Int = -1): Array[Byte] = {
    if (b == null || off < 0 || len < 0 || off + len > b.length) fail()
    var pos = off
    val end = off + len
    def u8(): Int = { if (pos >= end) fail(); val v = b(pos) & 0xff; pos += 1; v }
    // preamble varint
    var outLen = 0L; var sh = 0; var n = 0
    var done = false
    while (!done) {
      if (n >= 5) fail() // 32-bit length ⇒ ≤5 varint bytes
      val x = u8(); outLen |= (x & 0x7fL) << sh
      if ((x & 0x80) == 0) done = true
      sh += 7; n += 1
    }
    if (outLen < 0 || outLen > Int.MaxValue - 8) fail()
    if (expect >= 0 && outLen != expect) fail()
    val out = new Array[Byte](outLen.toInt)
    var w = 0
    def le(nb: Int): Int = {
      var v = 0; var i = 0
      while (i < nb) { v |= u8() << (8 * i); i += 1 }
      v
    }
    while (pos < end) {
      val t = u8()
      (t & 3) match {
        case 0 => // literal
          var l = (t >>> 2) + 1
          // escaped length: the 3/4-byte LE read can wrap negative or
          // to -1; l <= 0 (incl. the format-forbidden zero-length
          // literal) is structurally invalid — strict-reject
          if (l > 60) l = le(l - 60) + 1
          if (l <= 0 || l > end - pos || l > out.length - w) fail()
          System.arraycopy(b, pos, out, w, l)
          pos += l; w += l
        case kind =>
          var l = 0; var o = 0
          if (kind == 1) {
            l = ((t >>> 2) & 7) + 4
            o = ((t >>> 5) << 8) | u8()
          } else if (kind == 2) {
            l = (t >>> 2) + 1; o = le(2)
          } else {
            l = (t >>> 2) + 1; o = le(4)
          }
          if (o <= 0 || o > w || l > out.length - w) fail()
          var i = 0
          while (i < l) { out(w) = out(w - o); w += 1; i += 1 }
      }
    }
    if (w != out.length) fail()
    out
  }
}
