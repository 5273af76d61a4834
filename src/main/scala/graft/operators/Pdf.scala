package graft.operators

import org.apache.spark.sql.Dataset

/** PDF structural walk + text extraction — the document family's
  * entry: after web crawls, PDFs are the largest public text source
  * (papers, books, reports), and a corpus pipeline must at least walk
  * the cross-reference structure and pull the text operators out of
  * content streams. Dependency-free subset of ISO 32000:
  *
  *  - `%PDF-1.x` header; indirect objects `N 0 obj … endobj`; a
  *    classic `xref` table (20-byte entries, free entry 0) whose
  *    in-use OFFSETS must each point at the declared object header —
  *    the offsets are load-bearing: the writer computes them in a
  *    second pass, and a parser that ignores the xref cannot verify
  *    them; `trailer` dict with `/Size` matching; `startxref` offset
  *    must point at the `xref` keyword; `%%EOF` terminated;
  *  - content STREAMS (`/Length` declared and exact, `stream\n` …
  *    `\nendstream`) hold uncompressed text operators: `(string) Tj`
  *    with the escape subset `\\ \( \)` decoded;
  *  - page count = objects whose dict carries `/Type /Page` (not
  *    `/Pages`).
  *
  * Violations → all-zero `valid=false`, never a throw (q134).
  *
  * 100 TB shape: pure map-side behind the imperative codec seam. */
object Pdf {

  final case class PdfInfo(media_id: Long, n_objects: Long, n_pages: Long,
                           n_text_ops: Long, text_len: Long,
                           sum_text_bytes: Long, valid: Boolean)

  private case object Malformed extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] def parse(id: Long, b: Array[Byte]): PdfInfo = {
    val invalid = PdfInfo(id, 0L, 0L, 0L, 0L, 0L, valid = false)
    if (b == null || b.length < 20) return invalid
    try {
      def fail(): Nothing = throw Malformed
      val s = new String(b, "ISO-8859-1")
      if (!s.startsWith("%PDF-1.")) fail()
      if (!s.endsWith("%%EOF\n") && !s.endsWith("%%EOF")) fail()
      // startxref → the xref table
      val sx = s.lastIndexOf("startxref")
      if (sx < 0) fail()
      val sxEnd = s.indexOf('\n', sx); if (sxEnd < 0) fail()
      val offLine = s.substring(sxEnd + 1,
        s.indexOf('\n', sxEnd + 1) match { case -1 => fail(); case e => e })
        .trim
      if (offLine.isEmpty || !offLine.forall(_.isDigit) ||
        offLine.length > 10) fail()
      val xrefOff = offLine.toInt
      if (xrefOff < 0 || xrefOff >= s.length ||
        !s.startsWith("xref", xrefOff)) fail()
      // subsection header: "0 K"
      var p = s.indexOf('\n', xrefOff) + 1
      val hdrEnd = s.indexOf('\n', p); if (hdrEnd < 0) fail()
      val hdr = s.substring(p, hdrEnd).trim.split(" ")
      if (hdr.length != 2 || hdr(0) != "0" ||
        !hdr(1).forall(_.isDigit)) fail()
      val size = hdr(1).toInt
      if (size < 2 || size > 100000) fail()
      p = hdrEnd + 1
      var nObjects = 0L
      var obj = 0
      while (obj < size) {
        if (p + 20 > s.length) fail()
        val entry = s.substring(p, p + 20)
        val off = entry.substring(0, 10)
        val gen = entry.substring(11, 16)
        val kind = entry.charAt(17)
        if (!off.forall(_.isDigit) || !gen.forall(_.isDigit)) fail()
        if (obj == 0) { if (kind != 'f') fail() }
        else {
          if (kind != 'n') fail()
          // the offset must point at THIS object's header
          val o = off.toInt
          if (o < 0 || o >= s.length ||
            !s.startsWith(s"$obj 0 obj", o)) fail()
          nObjects += 1
        }
        p += 20
        obj += 1
      }
      if (!s.startsWith("trailer", p)) fail()
      val trailerEnd = s.indexOf(">>", p); if (trailerEnd < 0) fail()
      val trailer = s.substring(p, trailerEnd)
      if (!trailer.contains(s"/Size $size")) fail()
      // walk objects: pages and content streams
      var nPages = 0L; var nTextOps = 0L
      var textLen = 0L; var textSum = 0L
      var q = 0
      while ({ q = s.indexOf(" 0 obj", q); q >= 0 && q < xrefOff }) {
        val objStart = q + 6
        val objEnd = s.indexOf("endobj", objStart); if (objEnd < 0) fail()
        val body = s.substring(objStart, objEnd)
        if (body.contains("/Type /Page") &&
          !body.contains("/Type /Pages")) nPages += 1
        val st = body.indexOf("stream\n")
        if (st >= 0) {
          val en = body.indexOf("\nendstream"); if (en < 0) fail()
          val data = body.substring(st + 7, en)
          // declared /Length must be exact
          val lenRe = "/Length ([0-9]+)".r
          val m = lenRe.findFirstMatchIn(body).getOrElse(fail())
          if (m.group(1).toInt != data.length) fail()
          // (string) Tj with the escape subset
          var i = 0
          while (i < data.length) {
            if (data.charAt(i) == '(') {
              val sb = new java.lang.StringBuilder()
              var j = i + 1
              var closed = false
              while (!closed) {
                if (j >= data.length) fail()
                data.charAt(j) match {
                  case '\\' =>
                    if (j + 1 >= data.length) fail()
                    data.charAt(j + 1) match {
                      case '\\' => sb.append('\\')
                      case '('  => sb.append('(')
                      case ')'  => sb.append(')')
                      case _    => fail() // out of escape subset
                    }
                    j += 2
                  case ')' => closed = true; j += 1
                  case c   => sb.append(c); j += 1
                }
              }
              // require " Tj" after the string
              if (!data.startsWith(" Tj", j)) fail()
              nTextOps += 1
              var k = 0
              while (k < sb.length) {
                textLen += 1; textSum += sb.charAt(k) & 0xff; k += 1
              }
              i = j + 3
            } else i += 1
          }
        }
        q = objEnd + 6
      }
      if (nPages == 0 || nObjects == 0) fail()
      PdfInfo(id, nObjects, nPages, nTextOps, textLen, textSum,
        valid = true)
    } catch {
      case Malformed | _: IndexOutOfBoundsException |
          _: NumberFormatException | _: IllegalArgumentException =>
        invalid
    }
  }

  /** Map-side decode (the q178 pattern). */
  def decodePdf(media: Dataset[(Long, Array[Byte])]): Dataset[PdfInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { case (id, bytes) => parse(id, bytes) })
  }

  // ---------------------------------------------------------------
  // Writer: a spec-compliant minimal PDF with real xref offsets
  // (computed in a second pass — the Mp4 stco precedent).
  // ---------------------------------------------------------------

  /** `nPages` pages; page i's content stream draws two text ops:
    * `Doc <seed> page <i>` and `w<(seed+i)%7> \(x\)` (the escape
    * subset is load-bearing — decoded text is `w… (x)`). */
  def pdfPayload(nPages: Int, seed: Long): Array[Byte] = {
    require(nPages >= 1 && nPages <= 256, s"bad nPages $nPages")
    require(seed >= 0, s"bad seed $seed")
    // object 1: catalog; 2: pages; 2k+1: page k; 2k+2: its content
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"<< /Type /Catalog /Pages 2 0 R >>"
    objs += s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
    for (i <- 0 until nPages) {
      objs += s"<< /Type /Page /Parent 2 0 R /Contents ${4 + 2 * i} 0 R >>"
      val ops = s"BT /F1 12 Tf 72 700 Td (Doc $seed page $i) Tj " +
        s"72 680 Td (w${(seed + i) % 7} \\(x\\)) Tj ET"
      objs += s"<< /Length ${ops.length} >>\nstream\n$ops\nendstream"
    }
    val sb = new StringBuilder()
    sb.append("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    for ((o, k) <- objs.zipWithIndex) {
      offsets(k + 1) = sb.length
      sb.append(k + 1).append(" 0 obj\n").append(o).append("\nendobj\n")
    }
    val xrefOff = sb.length
    sb.append("xref\n0 ").append(objs.length + 1).append('\n')
    sb.append("0000000000 65535 f \n")
    for (k <- 1 to objs.length)
      sb.append(f"${offsets(k)}%010d 00000 n \n")
    sb.append("trailer << /Size ").append(objs.length + 1)
      .append(" /Root 1 0 R >>\nstartxref\n").append(xrefOff)
      .append("\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }
}
