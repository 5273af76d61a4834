package graft.operators

import org.apache.spark.sql.Dataset

/** HTTP/1.1 response parsing inside WARC response records — the real
  * middle step of the WET derivation: a crawl's `response` records
  * carry the full HTTP MESSAGE (status line + headers + body), and
  * the text pipeline must strip the transport layer before the HTML
  * layer (L127) ever sees a byte. This is the L126→L127 seam.
  *
  * Subset (RFC 9112): status line `HTTP/1.1 SP 3-digit SP reason
  * CRLF`; header lines `Name: value` (names case-insensitive for the
  * fields read here); `Content-Length` REQUIRED and it must equal the
  * remaining body length exactly (no chunked transfer in the subset —
  * WARC writers store decoded bodies); `Content-Type` split into
  * media type and optional `charset=` parameter. Any framing
  * violation → all-zero `valid=false` row for THAT record, never a
  * throw; non-`response` records are skipped.
  *
  * 100 TB shape: one map-side pass — member inflate, WARC framing and
  * HTTP framing all inside the partition; bodies reduce to (len, sum)
  * in place and never join a row frame. */
object Http {

  final case class HttpInfo(media_id: Long, rec_idx: Long, status: Long,
                            media_type: String, charset: String,
                            n_headers: Long, body_len: Long,
                            body_sum: Long, valid: Boolean)

  private[graft] def parseResponse(id: Long, idx: Long,
                                   b: Array[Byte]): HttpInfo =
    parseResponseBody(id, idx, b)._1

  /** As [[parseResponse]], also returning the body's OFFSET into `b`
    * (−1 when invalid) — the r10 [[Wet]] seam needs the body bytes,
    * not just their (len, sum) reduction. */
  private[operators] def parseResponseBody(id: Long, idx: Long,
                                           b: Array[Byte]): (HttpInfo, Int) = {
    val invalid = (HttpInfo(id, idx, 0L, "", "", 0L, 0L, 0L,
      valid = false), -1)
    try {
      def fail(): Nothing = throw Warc.Malformed
      def lineEnd(from: Int): Int = {
        var i = from
        while (i + 1 < b.length &&
          !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
        if (i + 1 >= b.length) fail()
        i
      }
      var p = lineEnd(0)
      val status = {
        val line = new String(b, 0, p, "ISO-8859-1")
        if (!line.startsWith("HTTP/1.1 ") || line.length < 13) fail()
        val code = line.substring(9, 12)
        if (!code.forall(_.isDigit) || line.charAt(12) != ' ') fail()
        code.toLong
      }
      p += 2
      var mediaType = ""; var charset = ""
      var contentLen = -1L; var nHeaders = 0L
      while (!(p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n')) {
        val e = lineEnd(p)
        val line = new String(b, p, e - p, "ISO-8859-1")
        val c = line.indexOf(": ")
        if (c <= 0) fail()
        nHeaders += 1
        val name = line.substring(0, c).toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 2)
        name match {
          case "content-length" =>
            if (value.isEmpty || !value.forall(_.isDigit) ||
              value.length > 18) fail()
            contentLen = value.toLong
          case "content-type" =>
            val semi = value.indexOf(';')
            mediaType = (if (semi < 0) value
                         else value.substring(0, semi)).trim
            if (semi >= 0) {
              val params = value.substring(semi + 1)
              val cs = params.toLowerCase(java.util.Locale.ROOT)
                .indexOf("charset=")
              if (cs >= 0) {
                var e2 = cs + 8
                while (e2 < params.length && params.charAt(e2) != ';' &&
                  params.charAt(e2) != ' ') e2 += 1
                charset = params.substring(cs + 8, e2)
                  .toLowerCase(java.util.Locale.ROOT)
              }
            }
          case _ => ()
        }
        p = e + 2
      }
      p += 2 // past the blank line
      if (contentLen < 0) fail()
      if (p.toLong + contentLen != b.length) fail() // exact framing
      var sum = 0L
      var j = 0
      while (j < contentLen) { sum += b(p + j) & 0xff; j += 1 }
      (HttpInfo(id, idx, status, mediaType, charset, nHeaders,
        contentLen, sum, valid = true), p)
    } catch {
      case Warc.Malformed | _: IndexOutOfBoundsException |
          _: NegativeArraySizeException | _: IllegalArgumentException =>
        invalid
    }
  }

  /** Map-side: WARC member walk + HTTP response parse in ONE pass;
    * non-response records skipped, malformed archives yield no rows. */
  def decodeWarcHttp(media: Dataset[(Long, Array[Byte])])
      : Dataset[HttpInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      if (bytes == null || bytes.isEmpty) Nil
      else try Warc.walk(id, bytes).collect {
        case r if r.typ == "response" =>
          parseResponse(id, r.idx, r.payload)
      }
      catch {
        case Warc.Malformed | _: IndexOutOfBoundsException |
            _: NegativeArraySizeException | _: IllegalArgumentException =>
          Nil
      }
    })
  }

  // ---------------------------------------------------------------
  // Writer (test/synthesis side)
  // ---------------------------------------------------------------

  /** A `.warc.gz` like [[Warc.warcPayload]] but whose `response`
    * records (i%3==0) carry REAL HTTP messages: status 200/301/404 by
    * (seed+i)%3, `text/html; charset=UTF-8` for even i else
    * `text/plain` (no charset), one formula extension header per
    * record plus 2+(seed+i)%3 filler headers, body length
    * `20 + ((seed + 7i) % 120)`, body byte j `(seed + 2i + j) % 256`.
    * Non-response records keep the q178 opaque-payload formulas. */
  def warcHttpPayload(nRecords: Int, seed: Int): Array[Byte] = {
    require(nRecords >= 1 && nRecords <= 4096, s"bad nRecords $nRecords")
    require(seed >= 0, s"bad seed $seed")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < nRecords) {
      val typ = (i % 3: @unchecked) match {
        case 0 => "response"; case 1 => "request"; case 2 => "metadata"
      }
      val host = (seed + i) % 5
      val payload: Array[Byte] =
        if (typ == "response") {
          val code = ((seed + i) % 3: @unchecked) match {
            case 0 => "200 OK"; case 1 => "301 Moved"; case 2 => "404 NF"
          }
          val sb = new StringBuilder()
          sb.append("HTTP/1.1 ").append(code).append("\r\n")
          sb.append("Content-Type: ")
            .append(if (i % 2 == 0) "text/html; charset=UTF-8"
                    else "text/plain").append("\r\n")
          val nFill = 2 + (seed + i) % 3
          var f = 0
          while (f < nFill) {
            sb.append("X-Fill-").append(f).append(": v").append(f)
              .append("\r\n")
            f += 1
          }
          val blen = 20 + ((seed + 7 * i) % 120)
          sb.append("Content-Length: ").append(blen).append("\r\n\r\n")
          val head = sb.toString.getBytes("ISO-8859-1")
          val body = new Array[Byte](blen)
          var j = 0
          while (j < blen) { body(j) = ((seed + 2 * i + j) % 256).toByte; j += 1 }
          val full = new Array[Byte](head.length + blen)
          System.arraycopy(head, 0, full, 0, head.length)
          System.arraycopy(body, 0, full, head.length, blen)
          full
        } else {
          val clen = 30 + ((seed + 11 * i) % 170)
          val p = new Array[Byte](clen)
          var j = 0
          while (j < clen) { p(j) = ((seed + 3 * i + j) % 256).toByte; j += 1 }
          p
        }
      val head = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append("WARC-Type: ").append(typ).append("\r\n")
        .append("WARC-Record-ID: <urn:uuid:").append(seed).append('-')
        .append(i).append(">\r\n")
        .append("WARC-Target-URI: http://h").append(host)
        .append(".example/p/").append(i).append("\r\n")
        .append("Content-Length: ").append(payload.length)
        .append("\r\n\r\n").toString.getBytes("ISO-8859-1")
      val rec = new Array[Byte](head.length + payload.length + 4)
      System.arraycopy(head, 0, rec, 0, head.length)
      System.arraycopy(payload, 0, rec, head.length, payload.length)
      rec(rec.length - 4) = '\r'; rec(rec.length - 3) = '\n'
      rec(rec.length - 2) = '\r'; rec(rec.length - 1) = '\n'
      out.write(Warc.gzipMember(rec,
        if (i % 4 == 1) Some(s"rec-$i") else None))
      i += 1
    }
    out.toByteArray
  }
}
