package graft.operators

/** Dependency-free Parquet WRITER — the inverse of `ParquetFile`:
  * the engine can PRODUCE lakehouse files without parquet-mr, and
  * the gate is the strongest differential available — Spark's own
  * reader consumes our bytes (q216), parquet-mr and our reader
  * cross-check them in the spec.
  *
  * Subset (deliberately the most portable layout in the format):
  *  - one row group, one V1 data page per column chunk;
  *  - REQUIRED flat columns (no definition levels on the wire —
  *    readers reconstruct non-null), INT64 and BYTE_ARRAY (UTF-8);
  *  - PLAIN encoding, UNCOMPRESSED codec;
  *  - a full Thrift compact-protocol FOOTER: flattened schema tree,
  *    row group / column chunk / column metadata with REAL
  *    statistics (min/max little-endian for INT64, unset for
  *    strings), exact offsets and sizes;
  *  - `PAR1` magic at both ends, 4-byte LE footer length.
  *
  * Every structure is written from the same public `parquet.thrift`
  * field numbering the reader decodes — but by independent code, so
  * a shared misreading of the spec cannot hide (the reader is
  * additionally pinned against parquet-mr field-by-field).
  *
  * 100 TB shape: file synthesis is per-group map-side work (the
  * container grain amortizes writer state, the q215 lesson); files
  * land wherever the caller's sink puts them. */
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

  /** Column model for one file: name + either longs or strings. */
  sealed trait Col { def name: String; def n: Int }
  final case class LongCol(name: String, vs: Array[Long]) extends Col {
    def n: Int = vs.length
  }
  final case class StrCol(name: String, vs: Array[String]) extends Col {
    def n: Int = vs.length
  }

  /** Serialize one complete parquet file (one row group, REQUIRED
    * columns, PLAIN, uncompressed) readable by any conforming
    * reader — Spark, DuckDB, parquet-mr, and `ParquetFile`. */
  def writeFile(cols: Seq[Col]): Array[Byte] = {
    require(cols.nonEmpty, "no columns")
    val n = cols.head.n
    require(cols.forall(_.n == n), "ragged columns")
    require(n > 0, "empty file")
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')

    // per-column: data page at current offset
    final case class ChunkMeta(name: String, ptype: Int, off: Long,
        bytes: Int, minL: Long, maxL: Long, hasStats: Boolean)
    val chunks = cols.map { c =>
      val off = out.size().toLong
      // PLAIN values
      val values = new java.io.ByteArrayOutputStream(n * 8)
      var minL = Long.MaxValue; var maxL = Long.MinValue
      val ptype = c match {
        case LongCol(_, vs) =>
          vs.foreach { v =>
            values.write(leLong(v), 0, 8)
            if (v < minL) minL = v
            if (v > maxL) maxL = v
          }
          2
        case StrCol(_, vs) =>
          vs.foreach { s =>
            val b = s.getBytes("UTF-8")
            val lb = new Array[Byte](4)
            lb(0) = (b.length & 0xff).toByte
            lb(1) = ((b.length >> 8) & 0xff).toByte
            lb(2) = ((b.length >> 16) & 0xff).toByte
            lb(3) = ((b.length >> 24) & 0xff).toByte
            values.write(lb, 0, 4); values.write(b, 0, b.length)
          }
          6
      }
      val page = values.toByteArray
      // PageHeader: DATA_PAGE, unc == cmp (uncompressed), V1 header
      val h = new TWriter
      var last = 0
      last = h.i32Field(last, 1, 0) // type = DATA_PAGE
      last = h.i32Field(last, 2, page.length) // uncompressed
      last = h.i32Field(last, 3, page.length) // compressed
      // field 5: DataPageHeader
      last = h.fieldHeader(last, 5, 12)
      var fl = 0
      fl = h.i32Field(fl, 1, n) // num_values
      fl = h.i32Field(fl, 2, 0) // encoding PLAIN
      fl = h.i32Field(fl, 3, 3) // def-level encoding RLE
      fl = h.i32Field(fl, 4, 3) // rep-level encoding RLE
      h.stop() // DataPageHeader
      h.stop() // PageHeader
      val hb = h.bytes
      out.write(hb, 0, hb.length)
      out.write(page, 0, page.length)
      ChunkMeta(c.name, ptype, off, hb.length + page.length,
        minL, maxL, hasStats = ptype == 2)
    }

    // footer: FileMetaData
    val f = new TWriter
    var last = 0
    last = f.i32Field(last, 1, 1) // version
    // field 2: schema (root + leaves)
    last = f.fieldHeader(last, 2, 9)
    f.listHeader(1 + chunks.length, 12)
    locally { // root
      var sl = 0
      sl = f.strField(sl, 4, "graft_schema")
      sl = f.i32Field(sl, 5, chunks.length) // num_children
      f.stop()
    }
    chunks.foreach { c =>
      var sl = 0
      sl = f.i32Field(sl, 1, c.ptype) // type
      sl = f.i32Field(sl, 3, 0) // repetition REQUIRED
      sl = f.strField(sl, 4, c.name)
      if (c.ptype == 6) // BYTE_ARRAY carries text: ConvertedType UTF8
        sl = f.i32Field(sl, 6, 0) // (else Spark reads it as BINARY)
      f.stop()
    }
    last = f.i64Field(last, 3, n.toLong) // num_rows
    // field 4: row_groups (one)
    last = f.fieldHeader(last, 4, 9)
    f.listHeader(1, 12)
    locally {
      var rl = 0
      // field 1: columns
      rl = f.fieldHeader(rl, 1, 9)
      f.listHeader(chunks.length, 12)
      chunks.foreach { c =>
        var cl = 0
        cl = f.i64Field(cl, 2, c.off) // file_offset
        // field 3: ColumnMetaData
        cl = f.fieldHeader(cl, 3, 12)
        var ml = 0
        ml = f.i32Field(ml, 1, c.ptype)
        ml = f.fieldHeader(ml, 2, 9) // encodings
        f.listHeader(2, 5)
        f.zigzag(0L) // PLAIN
        f.zigzag(3L) // RLE (levels)
        ml = f.fieldHeader(ml, 3, 9) // path_in_schema
        f.listHeader(1, 8)
        val nb = c.name.getBytes("UTF-8")
        f.varint(nb.length.toLong); f.out.write(nb, 0, nb.length)
        ml = f.i32Field(ml, 4, 0) // codec UNCOMPRESSED
        ml = f.i64Field(ml, 5, n.toLong) // num_values
        ml = f.i64Field(ml, 6, c.bytes.toLong) // total_uncompressed
        ml = f.i64Field(ml, 7, c.bytes.toLong) // total_compressed
        ml = f.i64Field(ml, 9, c.off) // data_page_offset
        if (c.hasStats) { // field 12: Statistics (min/max value pair)
          ml = f.fieldHeader(ml, 12, 12)
          var stl = 0
          stl = f.binField(stl, 5, leLong(c.maxL)) // max_value
          stl = f.binField(stl, 6, leLong(c.minL)) // min_value
          f.stop()
        }
        f.stop() // ColumnMetaData
        f.stop() // ColumnChunk
      }
      rl = f.i64Field(rl, 2, chunks.map(_.bytes.toLong).sum) // total sz
      rl = f.i64Field(rl, 3, n.toLong) // num_rows
      f.stop() // RowGroup
    }
    last = f.strField(last, 6, "graft parquet writer")
    f.stop() // FileMetaData
    val fb = f.bytes
    out.write(fb, 0, fb.length)
    out.write(fb.length & 0xff); out.write((fb.length >> 8) & 0xff)
    out.write((fb.length >> 16) & 0xff); out.write((fb.length >> 24) & 0xff)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    out.toByteArray
  }
}
