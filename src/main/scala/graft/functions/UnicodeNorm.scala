package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernels for dedup keys. Exact dedup over a
  * multilingual corpus is wrong without them: "café" composed (U+00E9)
  * and decomposed (e + U+0301) are byte-distinct but the same text, so
  * digest-grouping splits a duplicate pair across buckets. The fix is
  * canonical: NFC-normalize (and usually accent-strip + casefold +
  * whitespace-collapse) BEFORE hashing.
  *
  * Two native expressions ([[NfcNormalize]], [[StripAccents]]) — NFC
  * and mark-stripping have no Spark built-in, and the house preference
  * order (SURVEY §2.11) puts a codegen `Expression` above any UDF: one
  * static call per row, null-safe, no closure/encoder overhead. The
  * heavy lifting delegates to `java.text.Normalizer` (the JDK's
  * implementation of UAX #15 — the same Unicode algorithm DuckDB's
  * utf8proc implements, which is what makes the oracle comparable).
  *
  * ASCII fast path: both kernels return the input UNTOUCHED (no copy,
  * no String round-trip) when every byte is < 0x80 — at 100 TB the
  * overwhelmingly-ASCII corpus pays one vectorizable scan, not a
  * per-row `String` allocation. */
object UnicodeNormHelper {
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** NFD + drop marks (Mn/Mc/Me — utf8proc's STRIPMARK categories),
    * no recomposition (matching DuckDB `strip_accents`). */
  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val nfd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK &&
        t != Character.COMBINING_SPACING_MARK &&
        t != Character.ENCLOSING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

private[functions] abstract class UnicodeNormExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  protected def helperMethod: String

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormHelper.$helperMethod($c)")
}

/** Unicode NFC normalization (`string → string`). */
case class NfcNormalize(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormHelper.nfc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
  override protected def helperMethod: String = "nfc"
}

/** Accent stripping: NFD + drop combining marks (`string → string`). */
case class StripAccents(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormHelper.stripAccents(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression)
      : StripAccents = copy(child = newChild)
  override protected def helperMethod: String = "stripAccents"
}
