package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing stage every production
  * training-data pipeline runs before anything else touches the text
  * (the reference corpus is remote-sensing imagery and has no PII
  * stage; this is part of the LLM-pipeline extension surface, SURVEY.md
  * §2.9b).
  *
  * Engine-parity rules (the DuckDB oracle runs the same patterns):
  *  - patterns use only the regex subset where Java's engine (Spark)
  *    and RE2 (DuckDB) agree: character classes, bounded repetition,
  *    `\b` ASCII word boundaries, alternation — no backreferences, no
  *    lookaround (RE2 has neither);
  *  - Spark's `regexp_replace` replaces ALL matches; DuckDB needs the
  *    explicit `'g'` option — the SQL mirrors below carry it;
  *  - counting is `size(regexp_extract_all(...))` vs DuckDB
  *    `len(regexp_extract_all(...))` — same match enumeration
  *    (leftmost, non-overlapping) on both engines.
  *
  * Scale shape: pure per-row column work — whole-stage codegen, no
  * shuffle, no UDF. At 100 TB this runs at scan speed and composes
  * with the q50 curation flagship (scrub before quality-gate).
  */
object Pii {

  /** Email addresses (ASCII local@domain.tld). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Dotted-quad IPv4 literals. */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** North-American-style 555 exchange numbers (the test-data prefix
    * reserved for fiction — matches only deliberately planted numbers,
    * never an incidental digit run). */
  val PhonePattern = "\\b555-\\d{4}\\b"

  val EmailTag = "<EMAIL>"
  val Ipv4Tag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** All three (pattern, replacement) rules, applied in this order.
    * Email first: its character class is the only one that could span
    * text a later rule inspects (the tags themselves contain no digits
    * or `@`, so earlier replacements can never create a later match). */
  val Rules: Seq[(String, String)] = Seq(
    EmailPattern -> EmailTag,
    Ipv4Pattern -> Ipv4Tag,
    PhonePattern -> PhoneTag)

  /** Number of matches of `pattern` in `text`. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** `text` with every match of every rule replaced by its tag. */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (pat, tag)) => regexp_replace(c, pat, tag) }

  /** Per-row PII report: match counts per category plus the redacted
    * text. `textCol` must be an attribute (not an expression tree) so
    * the four regex passes each read a bound reference. */
  def report(df: DataFrame, textCol: Column): DataFrame =
    df.select(
      col("*"),
      countMatches(textCol, EmailPattern).as("n_email"),
      countMatches(textCol, Ipv4Pattern).as("n_ip"),
      countMatches(textCol, PhonePattern).as("n_phone"),
      redact(textCol).as("redacted"))

  // ------------------------------------------------------- SQL mirrors

  def sqlCount(textExpr: String, pattern: String): String =
    s"CAST(len(regexp_extract_all($textExpr, '$pattern')) AS BIGINT)"

  def sqlRedact(textExpr: String): String =
    Rules.foldLeft(textExpr) { case (e, (pat, tag)) =>
      s"regexp_replace($e, '$pat', '$tag', 'g')"
    }
}
