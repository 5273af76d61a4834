package graft.operators

import org.apache.spark.sql.Dataset

/** TIFF 6.0 IFD walk — the scientific-imagery container (satellite
  * scenes, scanned books, GeoTIFF rasters): where PNG/JPEG/GIF cover
  * the web's images, archival and remote-sensing corpora ship TIFF —
  * the very domain of the reference pipeline. Dependency-free subset:
  *
  *  - BOTH byte orders (`II` little-, `MM` big-endian — every integer
  *    in the file flips with the header, the format's signature trap),
  *    magic 42, IFD chain (multi-page) terminated by offset 0;
  *  - IFD entries (tag, type, count, value) with tags STRICTLY
  *    ascending (the spec's requirement); SHORT/LONG types; values
  *    ≤ 4 bytes packed INLINE in the value field, larger arrays
  *    resolved through their offset — inline SHORTs sit in the
  *    field's FIRST two bytes under either order (the classic
  *    packing pitfall, spec-pinned);
  *  - required baseline-gray tags: ImageWidth(256), ImageLength(257),
  *    BitsPerSample(258)=8, Compression(259)=1 (none),
  *    Photometric(262), StripOffsets(273), RowsPerStrip(278),
  *    StripByteCounts(279); strip count must equal
  *    ceil(height / rowsPerStrip); byte counts must tile w·h exactly;
  *    every strip range must lie inside the file.
  *
  * The walk cannot be faked: `sum_pixels` reads the strip bytes
  * through the resolved (offset, count) pairs, so any endianness,
  * inline-packing or strip-arithmetic mistake breaks it.
  *
  * Malformed → all-zero `valid=false`, never a throw (q134); bounds
  * in Long (ADVICE r8); per-file decoded-byte cap (zip-bomb stance).
  *
  * 100 TB shape: pure map-side behind the imperative codec seam. */
object Tiff {

  final case class TiffInfo(media_id: Long, n_pages: Long, sum_width: Long,
                            sum_height: Long, n_strips: Long,
                            sum_pixels: Long, valid: Boolean)

  private case object Malformed extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxDecoded = 1L << 26

  private[graft] def parse(id: Long, b: Array[Byte]): TiffInfo = {
    val invalid = TiffInfo(id, 0L, 0L, 0L, 0L, 0L, valid = false)
    if (b == null || b.length < 8) return invalid
    try {
      def fail(): Nothing = throw Malformed
      val le = (b(0), b(1)) match {
        case ('I', 'I') => true
        case ('M', 'M') => false
        case _          => fail()
      }
      def u8(o: Long): Int = {
        if (o < 0 || o >= b.length) fail(); b(o.toInt) & 0xff
      }
      def u16(o: Long): Int =
        if (le) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
      def u32(o: Long): Long =
        if (le) u16(o).toLong | (u16(o + 2).toLong << 16)
        else (u16(o).toLong << 16) | u16(o + 2).toLong
      if (u16(2) != 42) fail()
      var ifdOff = u32(4)
      var nPages = 0L; var sumW = 0L; var sumH = 0L
      var nStrips = 0L; var sumPix = 0L
      var decoded = 0L
      while (ifdOff != 0) {
        if (ifdOff < 8 || ifdOff + 2 > b.length) fail()
        val nEntries = u16(ifdOff)
        if (nEntries == 0 || nEntries > 4096) fail()
        var width = -1L; var height = -1L; var rowsPerStrip = -1L
        var bits = -1; var compression = -1; var photometric = -1
        var offs: Array[Long] = null; var counts: Array[Long] = null
        var prevTag = -1
        var e = 0
        while (e < nEntries) {
          val eo = ifdOff + 2 + 12L * e
          val tag = u16(eo)
          if (tag <= prevTag) fail() // strictly ascending (TIFF 6.0)
          prevTag = tag
          val typ = u16(eo + 2)
          val count = u32(eo + 4)
          if (typ != 3 && typ != 4) fail() // SHORT / LONG subset
          val elemSize = if (typ == 3) 2 else 4
          // inline when the array fits the 4-byte value field —
          // packed from the field's START under either byte order
          def value(idx: Long): Long = {
            val base =
              if (count * elemSize <= 4) eo + 8
              else {
                val ptr = u32(eo + 8)
                if (ptr + count * elemSize > b.length) fail()
                ptr
              }
            val o = base + idx * elemSize
            if (typ == 3) u16(o).toLong else u32(o)
          }
          def valuesOf(n: Long): Array[Long] = {
            if (n < 1 || n > 65535) fail()
            Array.tabulate(n.toInt)(i => value(i.toLong))
          }
          tag match {
            case 256 => if (count != 1) fail(); width = value(0)
            case 257 => if (count != 1) fail(); height = value(0)
            case 258 => if (count != 1) fail(); bits = value(0).toInt
            case 259 => if (count != 1) fail(); compression = value(0).toInt
            case 262 => if (count != 1) fail(); photometric = value(0).toInt
            case 273 => offs = valuesOf(count)
            case 278 => if (count != 1) fail(); rowsPerStrip = value(0)
            case 279 => counts = valuesOf(count)
            case _   => () // unknown tags tolerated (skipped)
          }
          e += 1
        }
        if (width <= 0 || height <= 0 || bits != 8 || compression != 1 ||
          photometric < 0 || rowsPerStrip <= 0 ||
          offs == null || counts == null) fail()
        val expStrips = (height + rowsPerStrip - 1) / rowsPerStrip
        if (offs.length != expStrips || counts.length != expStrips) fail()
        val total = width * height
        decoded += total
        if (decoded > MaxDecoded) fail()
        var sumCounts = 0L
        var s = 0
        while (s < offs.length) {
          val rows = math.min(rowsPerStrip, height - s.toLong * rowsPerStrip)
          if (counts(s) != rows * width) fail() // exact tiling
          if (offs(s) < 8 || offs(s) + counts(s) > b.length) fail()
          var j = 0L
          while (j < counts(s)) { sumPix += u8(offs(s) + j); j += 1 }
          sumCounts += counts(s)
          s += 1
        }
        if (sumCounts != total) fail()
        nPages += 1; sumW += width; sumH += height
        nStrips += offs.length.toLong
        ifdOff = u32(ifdOff + 2 + 12L * nEntries)
      }
      if (nPages == 0) fail()
      TiffInfo(id, nPages, sumW, sumH, nStrips, sumPix, valid = true)
    } catch {
      case Malformed | _: IndexOutOfBoundsException |
          _: NegativeArraySizeException | _: IllegalArgumentException =>
        invalid
    }
  }

  /** Map-side decode (the q178 pattern). */
  def decodeTiff(media: Dataset[(Long, Array[Byte])]): Dataset[TiffInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { case (id, bytes) => parse(id, bytes) })
  }

  // ---------------------------------------------------------------
  // Writer: spec-compliant multi-page gray TIFF in EITHER byte order.
  // ---------------------------------------------------------------

  /** `nPages` 8-bit gray pages; page f is `(5 + (seed+f)%6) ×
    * (4 + f%5)` with rowsPerStrip 4 and pixel (f, p) =
    * `(seed + 5f + p) % 256`; byte order LE when `seed` is even.
    * Strip-offset/count arrays go inline when one strip, through a
    * pointer otherwise — both paths exercised by the page sizes. */
  def tiffPayload(nPages: Int, seed: Int): Array[Byte] = {
    require(nPages >= 1 && nPages <= 64, s"bad nPages $nPages")
    require(seed >= 0, s"bad seed $seed")
    val le = seed % 2 == 0
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      else { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42)
    // layout: header(8) | per page: [strip data][strip arrays][IFD]
    val rps = 4L
    case class Page(w: Long, h: Long, dataOff: Long, arrOff: Long,
                    ifdOff: Long, nStrips: Int)
    var cursor = 8L
    val pages = (0 until nPages).map { f =>
      val w = 5L + (seed + f) % 6
      val h = 4L + f % 5
      val nStrips = ((h + rps - 1) / rps).toInt
      val dataOff = cursor
      cursor += w * h
      val arrOff = cursor
      if (nStrips > 1) cursor += 8L * nStrips // two LONG arrays
      val ifdOff = cursor
      cursor += 2 + 12 * 8 + 4 // 8 entries + next pointer
      Page(w, h, dataOff, arrOff, ifdOff, nStrips)
    }
    w32(pages.head.ifdOff) // IFD0 pointer
    for ((p, f) <- pages.zipWithIndex) {
      // strip data
      var j = 0L
      while (j < p.w * p.h) {
        out.write(((seed + 5 * f + j) % 256).toInt); j += 1
      }
      // strip arrays (pointer form) — offsets first, then counts
      if (p.nStrips > 1) {
        for (s <- 0 until p.nStrips)
          w32(p.dataOff + s * rps * p.w)
        for (s <- 0 until p.nStrips)
          w32(math.min(rps, p.h - s * rps) * p.w)
      }
      // IFD: 8 entries, tags ascending
      w16(8)
      def entry(tag: Int, typ: Int, count: Long, inline: Long): Unit = {
        w16(tag); w16(typ); w32(count)
        if (typ == 3) { w16(inline.toInt); w16(0) } else w32(inline)
      }
      entry(256, 4, 1, p.w)
      entry(257, 4, 1, p.h)
      entry(258, 3, 1, 8)
      entry(259, 3, 1, 1)
      entry(262, 3, 1, 1)
      if (p.nStrips == 1) entry(273, 4, 1, p.dataOff)
      else entry(273, 4, p.nStrips.toLong, p.arrOff)
      entry(278, 4, 1, rps)
      if (p.nStrips == 1) entry(279, 4, 1, p.w * p.h)
      else entry(279, 4, p.nStrips.toLong, p.arrOff + 4L * p.nStrips)
      w32(if (f + 1 < nPages) pages(f + 1).ifdOff else 0L)
    }
    out.toByteArray
  }
}
