package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets, Charset => JCharset}
import org.apache.spark.sql.Dataset

/** Charset decoding — the bytes→text seam between the transport layer
  * (L133 hands over a body and a `charset=` label) and every text
  * stage above it. A multilingual crawl is NOT all UTF-8: legacy
  * pages declare latin-1, feeds ship UTF-16 with byte order in the
  * label — decode with the declared charset, STRICTLY (malformed
  * input or an unmappable sequence → `valid=false`, never silent
  * replacement characters poisoning the corpus; the q134 stance
  * applied to text).
  *
  * Subset: `utf-8`, `iso-8859-1`/`latin-1`, `utf-16be`, `utf-16le`
  * (labels case-insensitive). Unknown label → invalid. Output is
  * decode-derived and cannot be faked from the bytes: codepoint
  * count, codepoint SUM and non-ASCII count all change with the
  * declared charset over the same byte string (a latin-1 `é` is one
  * 0xE9 byte; UTF-8 needs two; UTF-16 two with order mattering).
  *
  * 100 TB shape: pure map-side — one decoder per partition batch,
  * bodies never shuffle. */
object CharsetDecode {

  final case class TextInfo(media_id: Long, n_chars: Long,
                            sum_codepoints: Long, n_nonascii: Long,
                            valid: Boolean)

  private def charsetFor(label: String): JCharset = label
    .toLowerCase(java.util.Locale.ROOT) match {
    case "utf-8" | "utf8"            => StandardCharsets.UTF_8
    case "iso-8859-1" | "latin-1"    => StandardCharsets.ISO_8859_1
    case "utf-16be"                  => StandardCharsets.UTF_16BE
    case "utf-16le"                  => StandardCharsets.UTF_16LE
    case _                           => null
  }

  /** Strict decode of `b` under the declared `label`: None on an
    * unknown label or any malformed/unmappable byte (the WET seam —
    * r10's [[Wet]] pipeline consumes this; [[parse]] wraps it). */
  private[operators] def decodeStrict(b: Array[Byte],
                                      label: String): Option[String] = {
    if (b == null || label == null) return None
    val cs = charsetFor(label)
    if (cs == null) return None
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    } catch {
      case _: java.nio.charset.CharacterCodingException => None
    }
  }

  private[graft] def parse(id: Long, b: Array[Byte],
                           label: String): TextInfo = {
    val invalid = TextInfo(id, 0L, 0L, 0L, valid = false)
    decodeStrict(b, label) match {
      case None => invalid
      case Some(s) =>
      var n = 0L; var sum = 0L; var nonAscii = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        n += 1; sum += cp
        if (cp > 127) nonAscii += 1
        i += Character.charCount(cp)
      }
      TextInfo(id, n, sum, nonAscii, valid = true)
    }
  }

  /** Map-side decode over (id, body, charset-label) rows. */
  def decodeText(rows: Dataset[(Long, Array[Byte], String)])
      : Dataset[TextInfo] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map { case (id, b, label) => parse(id, b, label) })
  }

  /** Writer: the formula text `d<seed> é ñ x<seed%7>` encoded in the
    * charset picked by `kind` (0 utf-8, 1 iso-8859-1, 2 utf-16be,
    * 3 utf-16le) — same TEXT, four different byte strings. */
  def encodedBody(kind: Int, seed: Long): (Array[Byte], String) = {
    require(kind >= 0 && kind < 4, s"bad kind $kind")
    val text = s"d$seed é ñ x${seed % 7}"
    val label = kind match {
      case 0 => "UTF-8"
      case 1 => "ISO-8859-1"
      case 2 => "UTF-16BE"
      case _ => "UTF-16LE"
    }
    (text.getBytes(JCharset.forName(label)), label)
  }
}
