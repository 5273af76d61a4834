package graft.operators

import org.apache.spark.sql.Dataset

/** Dependency-free Parquet FOOTER walk — the lakehouse container
  * itself. Every table this engine reads or writes is Parquet; at
  * 100 TB the footer is the scan planner's whole world (row-group
  * pruning, predicate min/max skipping, size-based split planning all
  * read ONLY this structure). The codec decodes what `parquet-mr`
  * writes, from the public parquet-format spec:
  *
  *  - file framing: `PAR1` magic at BOTH ends, 4-byte LE footer
  *    length ending 8 bytes before EOF (`format/README.md`);
  *  - the footer itself is a Thrift **compact-protocol** message
  *    (`FileMetaData` in `parquet.thrift`) — short-form field
  *    headers `(idDelta << 4) | type` with per-struct delta state,
  *    long-form headers (zigzag varint id) when the delta overflows
  *    15, booleans carried IN the type nibble, zigzag varints for
  *    all ints, varint-length binaries, size-and-type list headers
  *    with the 15-element escape, and STOP-terminated structs —
  *    UNKNOWN fields are skipped structurally (forward compat, the
  *    protocol's design point), so new writer fields never break
  *    the walk;
  *  - decoded surface: version, num_rows, created_by, the flattened
  *    schema tree (leaf paths via the num_children walk), and per
  *    row group / per column chunk: type, codec, encodings,
  *    num_values, compressed/uncompressed sizes, data/dict page
  *    offsets, and `Statistics.min_value`/`max_value` (field 5/6,
  *    the TYPE_DEFINED_ORDER pair — the deprecated 1/2 pair is
  *    ignored) decoded as little-endian INT32/INT64;
  *  - structural gates: leaf count must match every chunk's
  *    `path_in_schema`, row-group `num_rows` must sum to the file's
  *    `num_rows` — a walk that mis-skips one field fails them.
  *
  * Verification is differential against the REAL writer: the spec
  * and the gated query decode files written by Spark's parquet-mr,
  * not by this codec — the JPEG-vs-JDK stance (`Jpeg.scala`).
  *
  * Malformed → `valid=false`, never a throw (q134). Bounds in Long
  * (ADVICE r8); varints are rejected past 10 bytes; nesting depth
  * capped (zip-bomb stance for recursive skips).
  *
  * 100 TB shape: footers are KBs regardless of file size — the walk
  * is pure map-side over `binaryFile` rows behind the imperative
  * codec seam; page/data bytes are never touched. */
object ParquetFile {

  /** One row per (row group, leaf column chunk); `rg < 0` never
    * happens on valid files. Invalid file → one all-zero row. */
  final case class ColChunkMeta(
      media_id: Long, rg: Int, col_path: String, ptype: Int,
      codec: Int, n_values: Long, total_compressed: Long,
      total_uncompressed: Long, data_page_off: Long,
      dict_page_off: Long, min_long: Long, max_long: Long,
      has_stats: Boolean, rg_rows: Long, file_rows: Long,
      n_rgs: Int, valid: Boolean)

  // ---- decoded model (internal + spec use) ----
  private[graft] final case class Stats(
      minLong: Option[Long], maxLong: Option[Long],
      nullCount: Option[Long])
  private[graft] final case class Chunk(
      path: String, ptype: Int, codec: Int, encodings: Vector[Int],
      numValues: Long, totalCompressed: Long, totalUncompressed: Long,
      dataPageOff: Long, dictPageOff: Long, stats: Stats)
  private[graft] final case class RowGroupMeta(
      numRows: Long, totalByteSize: Long, chunks: Vector[Chunk])
  private[graft] final case class FooterMeta(
      version: Int, numRows: Long, createdBy: String,
      leaves: Vector[(String, Int)], rowGroups: Vector[RowGroupMeta])

  private case object Malformed extends Exception {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw Malformed

  private val MaxDepth = 64

  // ---- Thrift compact-protocol reader ----
  private final class TReader(val raw: Array[Byte], var pos: Int,
                              val end: Int) {
    def u8(): Int = {
      if (pos >= end) fail(); val v = raw(pos) & 0xff; pos += 1; v
    }
    def varint(): Long = { // ULEB128, ≤10 bytes
      var v = 0L; var sh = 0; var n = 0
      while (n < 10) {
        val x = u8(); v |= (x & 0x7fL) << sh
        if ((x & 0x80) == 0) return v
        sh += 7; n += 1
      }
      fail()
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1L) }
    def bytes(): Array[Byte] = {
      val n = varint()
      if (n < 0 || n > end - pos) fail()
      val out = java.util.Arrays.copyOfRange(raw, pos, pos + n.toInt)
      pos += n.toInt; out
    }
    def skipN(n: Int): Unit = { if (n > end - pos) fail(); pos += n }
  }

  // compact type ids
  private val T_BOOL_T = 1; private val T_BOOL_F = 2
  private val T_BYTE = 3; private val T_I16 = 4; private val T_I32 = 5
  private val T_I64 = 6; private val T_DOUBLE = 7; private val T_BIN = 8
  private val T_LIST = 9; private val T_SET = 10; private val T_MAP = 11
  private val T_STRUCT = 12

  private def skipValue(r: TReader, tpe: Int, depth: Int): Unit = {
    if (depth > MaxDepth) fail()
    tpe match {
      case T_BOOL_T | T_BOOL_F => () // value lived in the nibble
      case T_BYTE              => r.skipN(1)
      case T_I16 | T_I32 | T_I64 => r.varint(): Unit
      case T_DOUBLE            => r.skipN(8)
      case T_BIN               => r.bytes(): Unit
      case T_LIST | T_SET =>
        val h = r.u8(); val et = h & 0x0f
        var n = (h >>> 4) & 0x0f
        if (n == 15) {
          val big = r.varint(); if (big < 0 || big > Int.MaxValue) fail()
          n = big.toInt
        }
        var i = 0
        while (i < n) { skipValue(r, et, depth + 1); i += 1 }
      case T_MAP =>
        val n = r.varint(); if (n < 0 || n > Int.MaxValue) fail()
        if (n > 0) {
          val kv = r.u8(); val kt = (kv >>> 4) & 0x0f; val vt = kv & 0x0f
          var i = 0L
          while (i < n) {
            skipValue(r, kt, depth + 1); skipValue(r, vt, depth + 1)
            i += 1
          }
        }
      case T_STRUCT => skipStruct(r, depth + 1)
      case _        => fail()
    }
  }

  private def skipStruct(r: TReader, depth: Int): Unit = {
    if (depth > MaxDepth) fail()
    var lastId = 0L
    var continue = true
    while (continue) {
      val h = r.u8()
      if (h == 0) continue = false
      else {
        val tpe = h & 0x0f; val delta = (h >>> 4) & 0x0f
        lastId = if (delta != 0) lastId + delta else r.zigzag()
        skipValue(r, tpe, depth)
      }
    }
  }

  /** Walk one struct, handing each (fieldId, type) to `f`; `f` must
    * consume the value exactly (or call skip via the reader). */
  private def readStruct(r: TReader, depth: Int)(
      f: (Long, Int) => Unit): Unit = {
    if (depth > MaxDepth) fail()
    var lastId = 0L
    var continue = true
    while (continue) {
      val h = r.u8()
      if (h == 0) continue = false
      else {
        val tpe = h & 0x0f; val delta = (h >>> 4) & 0x0f
        lastId = if (delta != 0) lastId + delta else r.zigzag()
        f(lastId, tpe)
      }
    }
  }

  private def listHeader(r: TReader, expect: Int): Int = {
    val h = r.u8(); val et = h & 0x0f
    if (et != expect) fail()
    var n = (h >>> 4) & 0x0f
    if (n == 15) {
      val big = r.varint(); if (big < 0 || big > Int.MaxValue) fail()
      n = big.toInt
    }
    n
  }

  private def i32Of(r: TReader, tpe: Int): Int = {
    if (tpe != T_I32 && tpe != T_I16 && tpe != T_BYTE) fail()
    if (tpe == T_BYTE) r.u8().toByte.toInt
    else {
      val v = r.zigzag()
      if (v < Int.MinValue || v > Int.MaxValue) fail()
      v.toInt
    }
  }
  private def i64Of(r: TReader, tpe: Int): Long = {
    if (tpe != T_I64 && tpe != T_I32 && tpe != T_I16) fail()
    r.zigzag()
  }
  private def strOf(r: TReader, tpe: Int): String = {
    if (tpe != T_BIN) fail()
    new String(r.bytes(), java.nio.charset.StandardCharsets.UTF_8)
  }

  private def leLong(b: Array[Byte]): Long = {
    var v = 0L; var i = b.length - 1
    while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
    v
  }

  // ---- parquet.thrift structures ----

  private def readStatistics(r: TReader, ptype: Int): Stats = {
    var minL: Option[Long] = None; var maxL: Option[Long] = None
    var nulls: Option[Long] = None
    def decode(raw: Array[Byte]): Option[Long] = ptype match {
      case 1 => if (raw.length != 4) fail()
                Some(leLong(raw).toInt.toLong) // INT32 sign-extends
      case 2 => if (raw.length != 8) fail(); Some(leLong(raw))
      case _ => None
    }
    readStruct(r, 6) { (id, tpe) =>
      id match {
        case 3L => nulls = Some(i64Of(r, tpe))
        case 5L => if (tpe != T_BIN) fail(); maxL = decode(r.bytes())
        case 6L => if (tpe != T_BIN) fail(); minL = decode(r.bytes())
        case _  => skipValue(r, tpe, 6)
      }
    }
    Stats(minL, maxL, nulls)
  }

  private def readColumnMeta(r: TReader): Chunk = {
    var ptype = -1; var codec = -1
    var encodings = Vector.empty[Int]
    var path = Vector.empty[String]
    var numValues = -1L; var totUnc = -1L; var totCmp = -1L
    var dataOff = -1L; var dictOff = -1L
    var statsBytesStart = -1; var statsBytesEnd = -1
    readStruct(r, 5) { (id, tpe) =>
      id match {
        case 1L => ptype = i32Of(r, tpe)
        case 2L =>
          val n = listHeader(r, T_I32)
          var i = 0
          while (i < n) { encodings :+= i32Of(r, T_I32); i += 1 }
        case 3L =>
          val n = listHeader(r, T_BIN)
          var i = 0
          while (i < n) { path :+= strOf(r, T_BIN); i += 1 }
        case 4L => codec = i32Of(r, tpe)
        case 5L => numValues = i64Of(r, tpe)
        case 6L => totUnc = i64Of(r, tpe)
        case 7L => totCmp = i64Of(r, tpe)
        case 9L => dataOff = i64Of(r, tpe)
        case 11L => dictOff = i64Of(r, tpe)
        case 12L =>
          if (tpe != T_STRUCT) fail()
          statsBytesStart = r.pos
          skipStruct(r, 5)
          statsBytesEnd = r.pos
        case _ => skipValue(r, tpe, 5)
      }
    }
    if (ptype < 0 || codec < 0 || numValues < 0 || totUnc < 0 ||
        totCmp < 0 || dataOff < 0 || path.isEmpty) fail()
    // statistics are decoded AFTER type is known (field order in the
    // message is writer's choice; parquet-mr writes type first but
    // the protocol doesn't promise it)
    val stats =
      if (statsBytesStart < 0) Stats(None, None, None)
      else {
        val sr = new TReader(r.raw, statsBytesStart, statsBytesEnd)
        readStatistics(sr, ptype)
      }
    Chunk(path.mkString("."), ptype, codec, encodings, numValues,
      totCmp, totUnc, dataOff, dictOff, stats)
  }

  private def readColumnChunk(r: TReader): Chunk = {
    var meta: Chunk = null
    readStruct(r, 4) { (id, tpe) =>
      id match {
        case 3L =>
          if (tpe != T_STRUCT) fail()
          meta = readColumnMeta(r)
        case _ => skipValue(r, tpe, 4)
      }
    }
    if (meta == null) fail()
    meta
  }

  private def readRowGroup(r: TReader): RowGroupMeta = {
    var chunks = Vector.empty[Chunk]
    var numRows = -1L; var totBytes = -1L
    readStruct(r, 3) { (id, tpe) =>
      id match {
        case 1L =>
          val n = listHeader(r, T_STRUCT)
          var i = 0
          while (i < n) { chunks :+= readColumnChunk(r); i += 1 }
        case 2L => totBytes = i64Of(r, tpe)
        case 3L => numRows = i64Of(r, tpe)
        case _  => skipValue(r, tpe, 3)
      }
    }
    if (numRows < 0 || totBytes < 0 || chunks.isEmpty) fail()
    RowGroupMeta(numRows, totBytes, chunks)
  }

  /** SchemaElement list → leaf (dotted path, ptype) pairs via the
    * num_children depth-first walk. */
  private def readSchema(r: TReader): Vector[(String, Int)] = {
    case class El(name: String, ptype: Int, nChildren: Int)
    val n = listHeader(r, T_STRUCT)
    if (n < 1) fail()
    val els = new scala.collection.mutable.ArrayBuffer[El](n)
    var i = 0
    while (i < n) {
      var name: String = null; var ptype = -1; var kids = 0
      readStruct(r, 3) { (id, tpe) =>
        id match {
          case 1L => ptype = i32Of(r, tpe)
          case 4L => name = strOf(r, tpe)
          case 5L => kids = i32Of(r, tpe)
          case _  => skipValue(r, tpe, 3)
        }
      }
      if (name == null) fail()
      els += El(name, ptype, kids)
      i += 1
    }
    // depth-first reconstruction: root's children count spans the rest
    val leaves = Vector.newBuilder[(String, Int)]
    var idx = 1 // skip root
    def walk(prefix: String, remaining: Int): Unit = {
      var k = 0
      while (k < remaining) {
        if (idx >= els.length) fail()
        val e = els(idx); idx += 1
        val p = if (prefix.isEmpty) e.name else prefix + "." + e.name
        if (e.nChildren == 0) {
          if (e.ptype < 0) fail()
          leaves += ((p, e.ptype))
        } else walk(p, e.nChildren)
        k += 1
      }
    }
    walk("", els(0).nChildren)
    if (idx != els.length) fail()
    leaves.result()
  }

  private[graft] def parseFooterMeta(b: Array[Byte]): FooterMeta = {
    if (b == null || b.length < 12) fail()
    def ascii(off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (ascii(0) != "PAR1" || ascii(b.length - 4) != "PAR1") fail()
    val fl = (b(b.length - 8) & 0xffL) | ((b(b.length - 7) & 0xffL) << 8) |
      ((b(b.length - 6) & 0xffL) << 16) | ((b(b.length - 5) & 0xffL) << 24)
    if (fl <= 0 || fl > b.length - 12) fail()
    val start = b.length - 8 - fl.toInt
    val r = new TReader(b, start, b.length - 8)
    var version = -1; var numRows = -1L; var createdBy = ""
    var leaves: Vector[(String, Int)] = null
    var rgs = Vector.empty[RowGroupMeta]
    readStruct(r, 1) { (id, tpe) =>
      id match {
        case 1L => version = i32Of(r, tpe)
        case 2L =>
          if (tpe != T_LIST) fail()
          leaves = readSchema(r)
        case 3L => numRows = i64Of(r, tpe)
        case 4L =>
          if (tpe != T_LIST) fail()
          val n = listHeader2(r)
          var i = 0
          while (i < n) { rgs :+= readRowGroup(r); i += 1 }
        case 6L => createdBy = strOf(r, tpe)
        case _  => skipValue(r, tpe, 1)
      }
    }
    if (version < 0 || numRows < 0 || leaves == null) fail()
    // structural gates: rg rows sum to the file's; every chunk count
    // matches the leaf count and paths match leaf paths in order
    if (rgs.map(_.numRows).sum != numRows) fail()
    rgs.foreach { rg =>
      if (rg.chunks.length != leaves.length) fail()
      rg.chunks.zip(leaves).foreach { case (c, (path, ptype)) =>
        if (c.path != path || c.ptype != ptype) fail()
      }
    }
    FooterMeta(version, numRows, createdBy, leaves, rgs)
  }

  // list header when field type already consumed as T_LIST but the
  // element-type check differs (row_groups: struct elements)
  private def listHeader2(r: TReader): Int = listHeader(r, T_STRUCT)

  /** Never-throw row API. */
  private[graft] def parse(id: Long, b: Array[Byte]): Seq[ColChunkMeta] = {
    val invalid = ColChunkMeta(id, 0, "", 0, 0, 0L, 0L, 0L, 0L, 0L, 0L,
      0L, has_stats = false, 0L, 0L, 0, valid = false)
    try {
      val m = parseFooterMeta(b)
      m.rowGroups.zipWithIndex.flatMap { case (rg, i) =>
        rg.chunks.map { c =>
          val hs = c.stats.minLong.isDefined && c.stats.maxLong.isDefined
          ColChunkMeta(id, i, c.path, c.ptype, c.codec, c.numValues,
            c.totalCompressed, c.totalUncompressed, c.dataPageOff,
            c.dictPageOff, c.stats.minLong.getOrElse(0L),
            c.stats.maxLong.getOrElse(0L), hs, rg.numRows, m.numRows,
            m.rowGroups.length, valid = true)
        }
      }
    } catch { case _: Throwable => Seq(invalid) }
  }

  /** Map-side decode over (media_id, file bytes) rows. */
  def decodeFooters(
      media: Dataset[(Long, Array[Byte])]): Dataset[ColChunkMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) => parse(id, bytes) })
  }
}
