package graft.operators

/** Dependency-free Parquet WRITER — the inverse of `ParquetFile`:
  * the engine can PRODUCE lakehouse files without parquet-mr, and
  * the gate is the strongest differential available — Spark's own
  * reader consumes our bytes (q216/q220), parquet-mr and our reader
  * cross-check them in the spec.
  *
  * Surface (r11 widened from the r10 REQUIRED/PLAIN/one-RG subset):
  *  - REQUIRED and OPTIONAL flat columns — definition levels on the
  *    wire (RLE/bit-packed hybrid, 4-byte-prefixed, exactly the V1
  *    layout the reader decodes);
  *  - INT64 and BYTE_ARRAY (UTF-8-annotated) columns;
  *  - PLAIN and PLAIN_DICTIONARY encodings — the dictionary is
  *    chosen per chunk when values repeat ≥2× (first-occurrence
  *    order, dict page + RLE/bit-packed indices);
  *  - MULTIPLE row groups (`rowsPerGroup`) with REAL per-group
  *    statistics: legacy min/max + min_value/max_value + null_count
  *    for INT64, unsigned-lexicographic min_value/max_value for
  *    strings, plus FileMetaData.column_orders declaring
  *    TypeDefinedOrder — everything a reader needs to PRUNE row
  *    groups on our stats (q220's gate: Spark's scan provably skips
  *    groups of our file);
  *  - a full Thrift compact-protocol FOOTER: flattened schema tree,
  *    row group / column chunk / column metadata, exact offsets;
  *  - `PAR1` magic at both ends, 4-byte LE footer length.
  *
  * Every structure is written from the same public `parquet.thrift`
  * field numbering the reader decodes — but by independent code, so
  * a shared misreading of the spec cannot hide (the reader is
  * additionally pinned against parquet-mr field-by-field).
  *
  * 100 TB shape: file synthesis is per-group map-side work (the
  * container grain amortizes writer state, the q215 lesson); files
  * land wherever the caller's sink puts them; row-group-level stats
  * are what make the q214-style selective scan skip I/O. */
object ParquetWrite {

  // ---- thrift compact-protocol encoder ----
  private final class TWriter {
    val out = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { u8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      u8(v.toInt)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def fieldHeader(lastId: Int, id: Int, tpe: Int): Int = {
      val delta = id - lastId
      if (delta >= 1 && delta <= 15) u8((delta << 4) | tpe)
      else { u8(tpe); zigzag(id.toLong) }
      id
    }
    def i32Field(lastId: Int, id: Int, v: Int): Int = {
      val l = fieldHeader(lastId, id, 5); zigzag(v.toLong); l
    }
    def i64Field(lastId: Int, id: Int, v: Long): Int = {
      val l = fieldHeader(lastId, id, 6); zigzag(v); l
    }
    def binField(lastId: Int, id: Int, b: Array[Byte]): Int = {
      val l = fieldHeader(lastId, id, 8)
      varint(b.length.toLong); out.write(b); l
    }
    def strField(lastId: Int, id: Int, s: String): Int =
      binField(lastId, id, s.getBytes("UTF-8"))
    def listHeader(n: Int, etype: Int): Unit = {
      if (n < 15) u8((n << 4) | etype)
      else { u8(0xf0 | etype); varint(n.toLong) }
    }
    def stop(): Unit = u8(0)
    def bytes: Array[Byte] = out.toByteArray
  }

  private def leLong(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** RLE/bit-packed hybrid encoder (parquet-format Encodings.md):
    * maximal runs of ≥8 equal values become RLE runs; everything else
    * accumulates into bit-packed groups of 8 — mid-stream flushes emit
    * only complete groups (a padded group mid-stream would be consumed
    * as real values), the final group alone is zero-padded. */
  private def rleHybridEncode(vals: Array[Int],
      bitWidth: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vals.length / 4 + 8)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      out.write(v.toInt)
    }
    val byteWidth = (bitWidth + 7) >> 3
    def writeRle(v: Int, run: Int): Unit = {
      varint(run.toLong << 1)
      var k = 0
      while (k < byteWidth) { out.write((v >>> (8 * k)) & 0xff); k += 1 }
    }
    def writeBitPacked(from: Int, count: Int): Unit = {
      val groups = (count + 7) / 8
      varint((groups.toLong << 1) | 1L)
      var bitBuf = 0L; var bits = 0
      var i = 0
      val total = groups * 8
      while (i < total) {
        val v = if (i < count) vals(from + i) else 0
        bitBuf |= (v.toLong & ((1L << bitWidth) - 1)) << bits
        bits += bitWidth
        while (bits >= 8) {
          out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bits -= 8
        }
        i += 1
      }
      // groups*8*bitWidth bits is byte-aligned — nothing remains
    }
    var pendStart = 0; var pendCount = 0
    def flushPending(atEnd: Boolean): Unit = {
      if (pendCount == 0) return
      if (atEnd) { writeBitPacked(pendStart, pendCount); pendCount = 0 }
      else {
        val full = (pendCount / 8) * 8
        if (full > 0) writeBitPacked(pendStart, full)
        var k = pendStart + full
        val end = pendStart + pendCount
        while (k < end) { // short remainder: legal length-<8 RLE runs
          var j = k + 1
          while (j < end && vals(j) == vals(k)) j += 1
          writeRle(vals(k), j - k)
          k = j
        }
        pendCount = 0
      }
    }
    var i = 0
    val n = vals.length
    while (i < n) {
      var j = i + 1
      while (j < n && vals(j) == vals(i)) j += 1
      val run = j - i
      if (run >= 8) {
        flushPending(atEnd = false)
        writeRle(vals(i), run)
      } else {
        if (pendCount == 0) pendStart = i
        pendCount += run
      }
      i = j
    }
    flushPending(atEnd = true)
    out.toByteArray
  }

  /** Column model for one file: name + longs or strings, with `null`
    * entries allowed in the Opt variants (OPTIONAL on the wire). */
  sealed trait Col { def name: String; def n: Int }
  final case class LongCol(name: String, vs: Array[Long]) extends Col {
    def n: Int = vs.length
  }
  final case class StrCol(name: String, vs: Array[String]) extends Col {
    def n: Int = vs.length
  }
  final case class OptLongCol(name: String, vs: Array[java.lang.Long])
      extends Col {
    def n: Int = vs.length
  }
  final case class OptStrCol(name: String, vs: Array[String])
      extends Col {
    def n: Int = vs.length
  }
  final case class DoubleCol(name: String, vs: Array[Double])
      extends Col {
    def n: Int = vs.length
  }
  final case class OptDoubleCol(name: String,
      vs: Array[java.lang.Double]) extends Col {
    def n: Int = vs.length
  }
  final case class FloatCol(name: String, vs: Array[Float])
      extends Col {
    def n: Int = vs.length
  }
  final case class OptFloatCol(name: String,
      vs: Array[java.lang.Float]) extends Col {
    def n: Int = vs.length
  }

  /** `array<T>` columns (r12 — the lakehouse type-surface ask): the
    * standard 3-level LIST shape on the wire — `optional group name
    * (LIST) { repeated group list { optional T element } }` — maxDef 3,
    * maxRep 1, exactly what Spark writes for `array<T>` and what the
    * q219 Dremel reader assembles. A `null` outer entry is a NULL
    * list, an empty array an EMPTY list, a `null` element a NULL
    * element — all four def-level fates land on the wire. */
  sealed trait ListCol extends Col {
    def rows: Array[_ <: Array[_ <: AnyRef]]
    def n: Int = rows.length
  }
  final case class FloatListCol(name: String,
      rows: Array[Array[java.lang.Float]]) extends ListCol
  final case class DoubleListCol(name: String,
      rows: Array[Array[java.lang.Double]]) extends ListCol
  final case class LongListCol(name: String,
      rows: Array[Array[java.lang.Long]]) extends ListCol

  private def isOptional(c: Col): Boolean = c match {
    case _: OptLongCol | _: OptStrCol | _: OptDoubleCol |
        _: OptFloatCol => true
    case _: ListCol => true // outer group is always OPTIONAL
    case _ => false
  }
  private def ptypeOf(c: Col): Int = c match {
    case _: LongCol | _: OptLongCol | _: LongListCol => 2 // INT64
    case _: StrCol | _: OptStrCol => 6 // BYTE_ARRAY
    case _: DoubleCol | _: OptDoubleCol | _: DoubleListCol => 5
    case _: FloatCol | _: OptFloatCol | _: FloatListCol => 4
  }
  private def isFp(c: Col): Boolean = {
    val p = ptypeOf(c); p == 4 || p == 5
  }

  /** Unsigned-lexicographic byte compare — the UTF8 column order
    * (String.compareTo orders by UTF-16 code unit, which diverges on
    * supplementary characters; stats pruning needs the BYTES order). */
  private def bytesLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    val m = math.min(a.length, b.length)
    var i = 0
    while (i < m) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  private def leFloat(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    Array[Byte](bits.toByte, (bits >>> 8).toByte,
      (bits >>> 16).toByte, (bits >>> 24).toByte)
  }
  private def leDouble(v: Double): Array[Byte] =
    leLong(java.lang.Double.doubleToLongBits(v))

  /** Per-page record backing the PAGE INDEX (r11): location, first
    * row, and the slice's stats. */
  private final case class PageMeta(off: Long, size: Int,
      firstRow: Long, nullPage: Boolean, nullCount: Long,
      minL: Long, maxL: Long, minB: Array[Byte], maxB: Array[Byte],
      minD: Double = Double.NaN, maxD: Double = Double.NaN)

  private final case class ChunkMeta(name: String, ptype: Int,
      optional: Boolean, off: Long, dictOff: Long, dataOff: Long,
      bytes: Long,
      numValues: Long, nullCount: Long, dictUsed: Boolean,
      minL: Long, maxL: Long, hasLongStats: Boolean,
      minB: Array[Byte], maxB: Array[Byte],
      pages: Vector[PageMeta],
      pathComponents: Seq[String] = Nil,
      minD: Double = Double.NaN, maxD: Double = Double.NaN,
      hasFpStats: Boolean = false)

  /** Serialize one complete parquet file readable by any conforming
    * reader — Spark, DuckDB, parquet-mr, and `ParquetFile`. Rows split
    * into groups of `rowsPerGroup` (default: one group). */
  def writeFile(cols: Seq[Col],
      rowsPerGroup: Int = Int.MaxValue,
      pageRows: Int = Int.MaxValue): Array[Byte] = {
    require(cols.nonEmpty, "no columns")
    val n = cols.head.n
    require(cols.forall(_.n == n), "ragged columns")
    require(n > 0, "empty file")
    require(rowsPerGroup > 0, "rowsPerGroup must be positive")
    require(pageRows > 0, "pageRows must be positive")
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')

    val groupBounds =
      (0 until n by math.min(rowsPerGroup.toLong, n.toLong).toInt)
        .map(lo => (lo, math.min(lo + rowsPerGroup.toLong, n.toLong).toInt))

    // ---- one column chunk: dict page (optional) + one V1 data page
    def writeChunk(c: Col, lo: Int, hi: Int): ChunkMeta = {
      val rows = hi - lo
      val ptype = ptypeOf(c)
      val optional = isOptional(c)
      val fp = isFp(c)
      // gather non-null values + def levels
      val defs = if (optional) new Array[Int](rows) else null
      var nulls = 0L
      val longVals = new scala.collection.mutable.ArrayBuffer[Long]()
      val binVals = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      // FLOAT values ride as doubles (exact widening); PLAIN encode
      // narrows back for ptype 4 — a lossless round trip
      val dblVals = new scala.collection.mutable.ArrayBuffer[Double]()
      c match {
        case LongCol(_, vs) =>
          var i = lo; while (i < hi) { longVals += vs(i); i += 1 }
        case StrCol(_, vs) =>
          var i = lo
          while (i < hi) {
            require(vs(i) != null, s"null in required column ${c.name}")
            binVals += vs(i).getBytes("UTF-8"); i += 1
          }
        case OptLongCol(_, vs) =>
          var i = lo
          while (i < hi) {
            if (vs(i) == null) { defs(i - lo) = 0; nulls += 1 }
            else { defs(i - lo) = 1; longVals += vs(i).longValue() }
            i += 1
          }
        case OptStrCol(_, vs) =>
          var i = lo
          while (i < hi) {
            if (vs(i) == null) { defs(i - lo) = 0; nulls += 1 }
            else { defs(i - lo) = 1; binVals += vs(i).getBytes("UTF-8") }
            i += 1
          }
        case DoubleCol(_, vs) =>
          var i = lo; while (i < hi) { dblVals += vs(i); i += 1 }
        case FloatCol(_, vs) =>
          var i = lo; while (i < hi) { dblVals += vs(i).toDouble; i += 1 }
        case OptDoubleCol(_, vs) =>
          var i = lo
          while (i < hi) {
            if (vs(i) == null) { defs(i - lo) = 0; nulls += 1 }
            else { defs(i - lo) = 1; dblVals += vs(i).doubleValue() }
            i += 1
          }
        case OptFloatCol(_, vs) =>
          var i = lo
          while (i < hi) {
            if (vs(i) == null) { defs(i - lo) = 0; nulls += 1 }
            else { defs(i - lo) = 1
              dblVals += vs(i).floatValue().toDouble }
            i += 1
          }
        case _: ListCol => throw new IllegalStateException(
          "list columns go through writeListChunk")
      }
      val nonNull =
        if (ptype == 2) longVals.length
        else if (fp) dblVals.length
        else binVals.length

      // stats over non-null values
      var minL = Long.MaxValue; var maxL = Long.MinValue
      longVals.foreach { v =>
        if (v < minL) minL = v
        if (v > maxL) maxL = v
      }
      var minB: Array[Byte] = null; var maxB: Array[Byte] = null
      binVals.foreach { b =>
        if (minB == null || bytesLt(b, minB)) minB = b
        if (maxB == null || bytesLt(maxB, b)) maxB = b
      }
      // fp stats: any NaN poisons ordering — drop stats entirely (the
      // parquet convention readers can always cope with: no bounds)
      var minD = Double.PositiveInfinity
      var maxD = Double.NegativeInfinity
      var fpNaN = false
      dblVals.foreach { v =>
        if (v.isNaN) fpNaN = true
        else {
          if (v < minD) minD = v
          if (v > maxD) maxD = v
        }
      }
      val hasFpStats = fp && nonNull > 0 && !fpNaN

      // dictionary decision: repeats ≥2× and a bounded dict; fp
      // columns stay PLAIN (float dictionaries rarely pay for
      // themselves, and NaN keys break map identity)
      val (dictVals: IndexedSeq[Any], indices: Array[Int]) =
        if (fp) (IndexedSeq.empty[Any], Array.emptyIntArray)
        else {
          val seen = new java.util.LinkedHashMap[Any, Integer]()
          val idx = new Array[Int](nonNull)
          var i = 0
          while (i < nonNull) {
            val key: Any =
              if (ptype == 2) longVals(i)
              else new String(binVals(i), "UTF-8")
            var id = seen.get(key)
            if (id == null) { id = seen.size(); seen.put(key, id) }
            idx(i) = id.intValue()
            i += 1
          }
          (seen.keySet().toArray.toIndexedSeq, idx)
        }
      val useDict = !fp && nonNull > 0 && dictVals.size <= 65536 &&
        dictVals.size.toLong * 2 <= nonNull.toLong

      def plainBytes(longs: Seq[Long], bins: Seq[Array[Byte]],
          dbls: Seq[Double]): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        if (ptype == 2) longs.foreach(v => o.write(leLong(v), 0, 8))
        else if (ptype == 5) dbls.foreach(v => o.write(leDouble(v), 0, 8))
        else if (ptype == 4)
          dbls.foreach(v => o.write(leFloat(v.toFloat), 0, 4))
        else bins.foreach { b =>
          o.write(b.length & 0xff); o.write((b.length >> 8) & 0xff)
          o.write((b.length >> 16) & 0xff); o.write((b.length >> 24) & 0xff)
          o.write(b, 0, b.length)
        }
        o.toByteArray
      }

      val chunkOff = out.size().toLong
      var dictOff = -1L

      if (useDict) { // dictionary page first (PLAIN payload)
        val body =
          if (ptype == 2)
            plainBytes(dictVals.map(_.asInstanceOf[Long]), Nil, Nil)
          else plainBytes(Nil,
            dictVals.map(_.asInstanceOf[String].getBytes("UTF-8")), Nil)
        dictOff = out.size().toLong
        val h = new TWriter
        var last = 0
        last = h.i32Field(last, 1, 2) // type = DICTIONARY_PAGE
        last = h.i32Field(last, 2, body.length)
        last = h.i32Field(last, 3, body.length)
        last = h.fieldHeader(last, 7, 12) // DictionaryPageHeader
        var dl = 0
        dl = h.i32Field(dl, 1, dictVals.size) // num_values
        dl = h.i32Field(dl, 2, 2) // encoding PLAIN_DICTIONARY
        h.stop(); h.stop()
        val hb = h.bytes
        out.write(hb, 0, hb.length)
        out.write(body, 0, body.length)
      }

      // data pages (r11): the chunk's rows split into `pageRows`
      // slices, each page carrying its own def-level run and value
      // slice — plus the per-page metadata the PAGE INDEX serializes
      val pageMetas =
        scala.collection.mutable.ArrayBuffer.empty[PageMeta]
      val bw = if (useDict) math.max(1,
        32 - Integer.numberOfLeadingZeros(math.max(1, dictVals.size - 1)))
        else 0
      var rowAt = 0 // row within chunk
      var vAt = 0 // non-null value index within chunk
      while (rowAt < rows) {
        val pRows = math.min(pageRows, rows - rowAt)
        var pNulls = 0
        if (optional) {
          var i = 0
          while (i < pRows) {
            if (defs(rowAt + i) == 0) pNulls += 1
            i += 1
          }
        }
        val k = pRows - pNulls
        val body = new java.io.ByteArrayOutputStream()
        if (optional) {
          val slice = java.util.Arrays.copyOfRange(defs, rowAt,
            rowAt + pRows)
          val enc = rleHybridEncode(slice, 1)
          body.write(enc.length & 0xff)
          body.write((enc.length >> 8) & 0xff)
          body.write((enc.length >> 16) & 0xff)
          body.write((enc.length >> 24) & 0xff)
          body.write(enc, 0, enc.length)
        }
        if (useDict) {
          body.write(bw)
          val enc = rleHybridEncode(
            java.util.Arrays.copyOfRange(indices, vAt, vAt + k), bw)
          body.write(enc, 0, enc.length)
        } else {
          val pv = plainBytes(longVals.slice(vAt, vAt + k).toSeq,
            binVals.slice(vAt, vAt + k).toSeq,
            dblVals.slice(vAt, vAt + k).toSeq)
          body.write(pv, 0, pv.length)
        }
        val page = body.toByteArray
        val pOff = out.size().toLong
        val h = new TWriter
        var last = 0
        last = h.i32Field(last, 1, 0) // type = DATA_PAGE (V1)
        last = h.i32Field(last, 2, page.length) // uncompressed
        last = h.i32Field(last, 3, page.length) // compressed
        last = h.fieldHeader(last, 5, 12) // DataPageHeader
        var fl = 0
        fl = h.i32Field(fl, 1, pRows) // num_values = LEVEL entries
        fl = h.i32Field(fl, 2, if (useDict) 2 else 0) // encoding
        fl = h.i32Field(fl, 3, 3) // def-level encoding RLE
        fl = h.i32Field(fl, 4, 3) // rep-level encoding RLE
        h.stop(); h.stop()
        val hb = h.bytes
        out.write(hb, 0, hb.length)
        out.write(page, 0, page.length)
        // page stats over the slice's non-null values
        var pMinL = Long.MaxValue; var pMaxL = Long.MinValue
        var pMinB: Array[Byte] = null; var pMaxB: Array[Byte] = null
        var pMinD = Double.PositiveInfinity
        var pMaxD = Double.NegativeInfinity
        var j = 0
        while (j < k) {
          if (ptype == 2) {
            val v = longVals(vAt + j)
            if (v < pMinL) pMinL = v
            if (v > pMaxL) pMaxL = v
          } else if (fp) {
            val v = dblVals(vAt + j)
            if (v < pMinD) pMinD = v
            if (v > pMaxD) pMaxD = v
          } else {
            val bv = binVals(vAt + j)
            if (pMinB == null || bytesLt(bv, pMinB)) pMinB = bv
            if (pMaxB == null || bytesLt(pMaxB, bv)) pMaxB = bv
          }
          j += 1
        }
        pageMetas += PageMeta(pOff, (out.size() - pOff).toInt,
          rowAt.toLong, k == 0, pNulls.toLong,
          pMinL, pMaxL, pMinB, pMaxB, pMinD, pMaxD)
        rowAt += pRows; vAt += k
      }
      ChunkMeta(c.name, ptype, optional, chunkOff,
        dictOff, pageMetas.head.off, out.size().toLong - chunkOff,
        rows.toLong, nulls,
        useDict, minL, maxL, hasLongStats = ptype == 2 && nonNull > 0,
        minB, maxB, pageMetas.toVector, Seq(c.name),
        minD, maxD, hasFpStats)
    }

    // ---- one LIST column chunk (r12): rep+def levels on the wire,
    // PLAIN element values, V1 pages split on ROW boundaries (an
    // entry with rep=0 starts a row — a page must begin at one)
    def writeListChunk(c: ListCol, lo: Int, hi: Int): ChunkMeta = {
      val rows = hi - lo
      val ptype = ptypeOf(c)
      val maxDef = 3 // optional group / repeated node / optional elem
      val reps = new scala.collection.mutable.ArrayBuffer[Int]()
      val defs = new scala.collection.mutable.ArrayBuffer[Int]()
      val longVals = new scala.collection.mutable.ArrayBuffer[Long]()
      val dblVals = new scala.collection.mutable.ArrayBuffer[Double]()
      // entry index where each row's run starts (last = total)
      val rowStart = new Array[Int](rows + 1)
      var nulls = 0L // entries below maxDef (the stats null_count)
      val fp = ptype == 4 || ptype == 5
      def addVal(e: AnyRef): Unit = e match {
        case f: java.lang.Float => dblVals += f.floatValue().toDouble
        case d: java.lang.Double => dblVals += d.doubleValue()
        case l: java.lang.Long => longVals += l.longValue()
        case other => throw new IllegalArgumentException(s"$other")
      }
      var i = lo
      while (i < hi) {
        rowStart(i - lo) = reps.length
        val r = c.rows(i)
        if (r == null) { reps += 0; defs += 0; nulls += 1 }
        else if (r.isEmpty) { reps += 0; defs += 1; nulls += 1 }
        else {
          var j = 0
          while (j < r.length) {
            reps += (if (j == 0) 0 else 1)
            val e: AnyRef = r(j)
            if (e == null) { defs += 2; nulls += 1 }
            else { defs += 3; addVal(e) }
            j += 1
          }
        }
        i += 1
      }
      rowStart(rows) = reps.length
      val nonNull = if (fp) dblVals.length else longVals.length

      var minL = Long.MaxValue; var maxL = Long.MinValue
      longVals.foreach { v =>
        if (v < minL) minL = v
        if (v > maxL) maxL = v
      }
      var minD = Double.PositiveInfinity
      var maxD = Double.NegativeInfinity
      var fpNaN = false
      dblVals.foreach { v =>
        if (v.isNaN) fpNaN = true
        else {
          if (v < minD) minD = v
          if (v > maxD) maxD = v
        }
      }
      val hasFpStats = fp && nonNull > 0 && !fpNaN

      def plainVals(vFrom: Int, vTo: Int): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        var k = vFrom
        while (k < vTo) {
          ptype match {
            case 2 => o.write(leLong(longVals(k)), 0, 8)
            case 5 => o.write(leDouble(dblVals(k)), 0, 8)
            case 4 => o.write(leFloat(dblVals(k).toFloat), 0, 4)
            case _ => throw new IllegalArgumentException(s"$ptype")
          }
          k += 1
        }
        o.toByteArray
      }

      val chunkOff = out.size().toLong
      val pageMetas =
        scala.collection.mutable.ArrayBuffer.empty[PageMeta]
      var rowAt = 0
      var vAt = 0 // non-null element index
      while (rowAt < rows) {
        val pRows = math.min(pageRows, rows - rowAt)
        val eFrom = rowStart(rowAt)
        val eTo = rowStart(rowAt + pRows)
        val nv = eTo - eFrom
        var k = 0 // non-null elements in this page
        var pNulls = 0L
        var e = eFrom
        while (e < eTo) {
          if (defs(e) == maxDef) k += 1 else pNulls += 1
          e += 1
        }
        val body = new java.io.ByteArrayOutputStream()
        def lvlRun(buf: scala.collection.mutable.ArrayBuffer[Int],
            bw: Int): Unit = {
          val slice = new Array[Int](nv)
          var t = 0
          while (t < nv) { slice(t) = buf(eFrom + t); t += 1 }
          val enc = rleHybridEncode(slice, bw)
          body.write(enc.length & 0xff)
          body.write((enc.length >> 8) & 0xff)
          body.write((enc.length >> 16) & 0xff)
          body.write((enc.length >> 24) & 0xff)
          body.write(enc, 0, enc.length)
        }
        lvlRun(reps, 1)
        lvlRun(defs, 2)
        val pv = plainVals(vAt, vAt + k)
        body.write(pv, 0, pv.length)
        val page = body.toByteArray
        val pOff = out.size().toLong
        val h = new TWriter
        var last = 0
        last = h.i32Field(last, 1, 0) // DATA_PAGE (V1)
        last = h.i32Field(last, 2, page.length)
        last = h.i32Field(last, 3, page.length)
        last = h.fieldHeader(last, 5, 12) // DataPageHeader
        var fl = 0
        fl = h.i32Field(fl, 1, nv) // num_values = LEVEL entries
        fl = h.i32Field(fl, 2, 0) // PLAIN
        fl = h.i32Field(fl, 3, 3) // def RLE
        fl = h.i32Field(fl, 4, 3) // rep RLE
        h.stop(); h.stop()
        val hb = h.bytes
        out.write(hb, 0, hb.length)
        out.write(page, 0, page.length)
        var pMinL = Long.MaxValue; var pMaxL = Long.MinValue
        var pMinD = Double.PositiveInfinity
        var pMaxD = Double.NegativeInfinity
        var t = 0
        while (t < k) {
          if (fp) {
            val v = dblVals(vAt + t)
            if (v < pMinD) pMinD = v
            if (v > pMaxD) pMaxD = v
          } else {
            val v = longVals(vAt + t)
            if (v < pMinL) pMinL = v
            if (v > pMaxL) pMaxL = v
          }
          t += 1
        }
        pageMetas += PageMeta(pOff, (out.size() - pOff).toInt,
          rowAt.toLong, k == 0, pNulls, pMinL, pMaxL, null, null,
          pMinD, pMaxD)
        rowAt += pRows; vAt += k
      }
      ChunkMeta(c.name, ptype, optional = true, chunkOff,
        dictOff = -1L, pageMetas.head.off,
        out.size().toLong - chunkOff,
        reps.length.toLong, nulls, dictUsed = false,
        minL, maxL, hasLongStats = ptype == 2 && nonNull > 0,
        null, null, pageMetas.toVector,
        Seq(c.name, "list", "element"), minD, maxD, hasFpStats)
    }

    // ---- data: row groups × columns, written sequentially ----
    val groups = groupBounds.map { case (lo, hi) =>
      (hi - lo, cols.map {
        case lc: ListCol => writeListChunk(lc, lo, hi)
        case c => writeChunk(c, lo, hi)
      })
    }

    // ---- PAGE INDEX (r11): ColumnIndex + OffsetIndex per chunk,
    // written between the data and the footer (the parquet-mr
    // layout) — what page-level skipping reads (q209's decoder and
    // parquet-mr's own index reader both consume these)
    def boundBytes(c: ChunkMeta, pm: PageMeta,
        isMin: Boolean): Array[Byte] = {
      if (pm.nullPage) Array.emptyByteArray
      else if (c.ptype == 2) leLong(if (isMin) pm.minL else pm.maxL)
      else if (c.ptype == 4) leFloat((if (isMin) pm.minD else pm.maxD).toFloat)
      else if (c.ptype == 5) leDouble(if (isMin) pm.minD else pm.maxD)
      else if (isMin) pm.minB
      else pm.maxB
    }
    // (ciOff, ciLen, oiOff, oiLen) per chunk, group-major; an fp chunk
    // with NaN values gets NO page index (its bounds are undefined and
    // a nullPage lie would let readers wrongly skip real data)
    val indexLocs: Seq[Seq[(Long, Int, Long, Int)]] =
      groups.map { case (_, chunks) =>
        chunks.map { c =>
          val fpNoStats = (c.ptype == 4 || c.ptype == 5) &&
            !c.hasFpStats && c.numValues - c.nullCount > 0
          if (fpNoStats) (-1L, -1, -1L, -1)
          else {
          val ci = new TWriter
          var last = 0
          last = ci.fieldHeader(last, 1, 9) // null_pages: list<bool>
          if (c.pages.length < 15) ci.u8((c.pages.length << 4) | 1)
          else { ci.u8(0xf1); ci.varint(c.pages.length.toLong) }
          c.pages.foreach(pm => ci.u8(if (pm.nullPage) 1 else 2))
          last = ci.fieldHeader(last, 2, 9) // min_values: list<binary>
          ci.listHeader(c.pages.length, 8)
          c.pages.foreach { pm =>
            val b = boundBytes(c, pm, isMin = true)
            ci.varint(b.length.toLong); ci.out.write(b, 0, b.length)
          }
          last = ci.fieldHeader(last, 3, 9) // max_values
          ci.listHeader(c.pages.length, 8)
          c.pages.foreach { pm =>
            val b = boundBytes(c, pm, isMin = false)
            ci.varint(b.length.toLong); ci.out.write(b, 0, b.length)
          }
          last = ci.i32Field(last, 4, 0) // boundary_order UNORDERED
          last = ci.fieldHeader(last, 5, 9) // null_counts: list<i64>
          ci.listHeader(c.pages.length, 6)
          c.pages.foreach(pm => ci.zigzag(pm.nullCount))
          ci.stop()
          val cib = ci.bytes
          val ciOff = out.size().toLong
          out.write(cib, 0, cib.length)
          val oi = new TWriter
          val ol = oi.fieldHeader(0, 1, 9) // page_locations
          val _ = ol
          oi.listHeader(c.pages.length, 12)
          c.pages.foreach { pm =>
            var pl = 0
            pl = oi.i64Field(pl, 1, pm.off)
            pl = oi.i32Field(pl, 2, pm.size)
            pl = oi.i64Field(pl, 3, pm.firstRow)
            oi.stop()
          }
          oi.stop()
          val oib = oi.bytes
          val oiOff = out.size().toLong
          out.write(oib, 0, oib.length)
          (ciOff, cib.length, oiOff, oib.length)
          }
        }
      }

    // ---- footer: FileMetaData ----
    val f = new TWriter
    var last = 0
    last = f.i32Field(last, 1, 1) // version
    // field 2: schema (root + per-column elements: one leaf for flat
    // columns, the 3-level LIST group tree for array columns)
    last = f.fieldHeader(last, 2, 9)
    f.listHeader(1 + cols.map {
      case _: ListCol => 3
      case _ => 1
    }.sum, 12)
    locally { // root
      var sl = 0
      sl = f.strField(sl, 4, "graft_schema")
      sl = f.i32Field(sl, 5, cols.length) // num_children (top-level)
      f.stop()
    }
    cols.foreach {
      case c: ListCol =>
        locally { // outer OPTIONAL group, ConvertedType LIST
          var sl = 0
          sl = f.i32Field(sl, 3, 1) // OPTIONAL
          sl = f.strField(sl, 4, c.name)
          sl = f.i32Field(sl, 5, 1) // num_children
          sl = f.i32Field(sl, 6, 3) // ConvertedType LIST
          f.stop()
        }
        locally { // repeated group "list"
          var sl = 0
          sl = f.i32Field(sl, 3, 2) // REPEATED
          sl = f.strField(sl, 4, "list")
          sl = f.i32Field(sl, 5, 1)
          f.stop()
        }
        locally { // OPTIONAL element leaf
          var sl = 0
          sl = f.i32Field(sl, 1, ptypeOf(c))
          sl = f.i32Field(sl, 3, 1) // OPTIONAL (containsNull)
          sl = f.strField(sl, 4, "element")
          f.stop()
        }
      case c =>
        var sl = 0
        sl = f.i32Field(sl, 1, ptypeOf(c)) // type
        sl = f.i32Field(sl, 3, if (isOptional(c)) 1 else 0) // repetition
        sl = f.strField(sl, 4, c.name)
        if (ptypeOf(c) == 6) // BYTE_ARRAY carries text: ConvertedType UTF8
          sl = f.i32Field(sl, 6, 0) // (else Spark reads it as BINARY)
        f.stop()
    }
    last = f.i64Field(last, 3, n.toLong) // num_rows
    // field 4: row_groups
    last = f.fieldHeader(last, 4, 9)
    f.listHeader(groups.length, 12)
    groups.zip(indexLocs).foreach { case ((rgRows, chunks), locs) =>
      var rl = 0
      rl = f.fieldHeader(rl, 1, 9) // field 1: columns
      f.listHeader(chunks.length, 12)
      chunks.zip(locs).foreach { case (c, (ciOff, ciLen, oiOff, oiLen)) =>
        var cl = 0
        cl = f.i64Field(cl, 2, c.off) // file_offset
        cl = f.fieldHeader(cl, 3, 12) // field 3: ColumnMetaData
        var ml = 0
        ml = f.i32Field(ml, 1, c.ptype)
        ml = f.fieldHeader(ml, 2, 9) // encodings
        if (c.dictUsed) {
          f.listHeader(3, 5)
          f.zigzag(0L); f.zigzag(3L); f.zigzag(2L) // PLAIN, RLE, DICT
        } else {
          f.listHeader(2, 5)
          f.zigzag(0L); f.zigzag(3L) // PLAIN, RLE (levels)
        }
        ml = f.fieldHeader(ml, 3, 9) // path_in_schema
        val comps =
          if (c.pathComponents.nonEmpty) c.pathComponents
          else Seq(c.name)
        f.listHeader(comps.length, 8)
        comps.foreach { comp =>
          val nb = comp.getBytes("UTF-8")
          f.varint(nb.length.toLong); f.out.write(nb, 0, nb.length)
        }
        ml = f.i32Field(ml, 4, 0) // codec UNCOMPRESSED
        ml = f.i64Field(ml, 5, c.numValues) // num_values (levels)
        ml = f.i64Field(ml, 6, c.bytes) // total_uncompressed
        ml = f.i64Field(ml, 7, c.bytes) // total_compressed
        ml = f.i64Field(ml, 9, c.dataOff) // data_page_offset
        // (readers locate the chunk start as min(data_page_offset,
        // dictionary_page_offset) — field 11 names the dict page)
        if (c.dictUsed) ml = f.i64Field(ml, 11, c.dictOff)
        // field 12: Statistics — legacy + new-style + null_count
        val hasStats = c.hasLongStats || c.hasFpStats ||
          c.maxB != null || c.nullCount > 0 || c.optional
        if (hasStats) {
          ml = f.fieldHeader(ml, 12, 12)
          var stl = 0
          def fpBytes(v: Double): Array[Byte] =
            if (c.ptype == 4) leFloat(v.toFloat) else leDouble(v)
          if (c.hasLongStats) { // legacy pair (signed order: valid)
            stl = f.binField(stl, 1, leLong(c.maxL))
            stl = f.binField(stl, 2, leLong(c.minL))
          } else if (c.hasFpStats) {
            stl = f.binField(stl, 1, fpBytes(c.maxD))
            stl = f.binField(stl, 2, fpBytes(c.minD))
          }
          stl = f.i64Field(stl, 3, c.nullCount) // null_count
          if (c.hasLongStats) {
            stl = f.binField(stl, 5, leLong(c.maxL)) // max_value
            stl = f.binField(stl, 6, leLong(c.minL)) // min_value
          } else if (c.hasFpStats) {
            stl = f.binField(stl, 5, fpBytes(c.maxD))
            stl = f.binField(stl, 6, fpBytes(c.minD))
          } else if (c.maxB != null) {
            stl = f.binField(stl, 5, c.maxB)
            stl = f.binField(stl, 6, c.minB)
          }
          f.stop()
        }
        f.stop() // ColumnMetaData
        if (ciOff >= 0) { // NaN fp chunks carry no page index
          cl = f.i64Field(cl, 4, oiOff) // offset_index_offset
          cl = f.i32Field(cl, 5, oiLen) // offset_index_length
          cl = f.i64Field(cl, 6, ciOff) // column_index_offset
          cl = f.i32Field(cl, 7, ciLen) // column_index_length
        }
        f.stop() // ColumnChunk
      }
      rl = f.i64Field(rl, 2, chunks.map(_.bytes).sum) // total_byte_size
      rl = f.i64Field(rl, 3, rgRows.toLong) // num_rows
      f.stop() // RowGroup
    }
    last = f.strField(last, 6, "graft parquet writer")
    // field 7: column_orders — TypeDefinedOrder per leaf, which is
    // what tells a reader the min_value/max_value pairs are usable
    last = f.fieldHeader(last, 7, 9)
    f.listHeader(cols.length, 12)
    cols.foreach { _ =>
      val cl = f.fieldHeader(0, 1, 12) // union arm 1: TYPE_ORDER
      val _ = cl
      f.stop() // empty TypeDefinedOrder struct
      f.stop() // ColumnOrder union
    }
    f.stop() // FileMetaData
    val fb = f.bytes
    out.write(fb, 0, fb.length)
    out.write(fb.length & 0xff); out.write((fb.length >> 8) & 0xff)
    out.write((fb.length >> 16) & 0xff); out.write((fb.length >> 24) & 0xff)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    out.toByteArray
  }
}
