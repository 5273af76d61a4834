package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Unicode canonicalization kernels (q177): NFC/strip-accents
  * semantics vs java.text.Normalizer ground truth, codegen vs
  * interpreted parity, the ASCII fast path, null handling, and the
  * canonKey composition law. */
class UnicodeNormSpec extends SparkSpec {

  private def runOne(c: org.apache.spark.sql.Column,
                     input: String): String = {
    import spark.implicits._
    Seq(Option(input)).toDF("s").select(c.as("r"))
      .collect().head.getString(0)
  }

  test("nfcNormalize composes decomposed sequences") {
    runOne(TextFns.nfcNormalize(col("s")), "a\u0301") shouldBe "\u00e1"
    runOne(TextFns.nfcNormalize(col("s")), "e\u0301cole") shouldBe
      "\u00e9cole"
    // already-composed and pure-ASCII inputs are unchanged
    runOne(TextFns.nfcNormalize(col("s")), "\u00e9cole") shouldBe
      "\u00e9cole"
    runOne(TextFns.nfcNormalize(col("s")), "plain ascii") shouldBe
      "plain ascii"
  }

  test("stripAccents drops marks from composed AND decomposed forms") {
    runOne(TextFns.stripAccents(col("s")), "\u00e9cole") shouldBe "ecole"
    runOne(TextFns.stripAccents(col("s")), "e\u0301cole") shouldBe "ecole"
    runOne(TextFns.stripAccents(col("s")), "ni\u00f1o") shouldBe "nino"
    runOne(TextFns.stripAccents(col("s")), "ascii") shouldBe "ascii"
  }

  test("kernels agree with a java.text.Normalizer brute on random mixed text") {
    import spark.implicits._
    val pool = "abc \u00e1\u00e9\u00f1A\u0301\u0308 \u00fc"
    val rnd = new scala.util.Random(20260815)
    val inputs = (0 until 200).map { _ =>
      (0 until rnd.nextInt(24)).map(_ => pool(rnd.nextInt(pool.length)))
        .mkString
    }
    def bruteNfc(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    def bruteStrip(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .filter { ch =>
          val t = Character.getType(ch)
          t != Character.NON_SPACING_MARK &&
            t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK
        }
    val got = inputs.toDF("s")
      .select(col("s"), TextFns.nfcNormalize(col("s")).as("n"),
        TextFns.stripAccents(col("s")).as("a"))
      .collect()
    got.foreach { r =>
      r.getString(1) shouldBe bruteNfc(r.getString(0))
      r.getString(2) shouldBe bruteStrip(r.getString(0))
    }
  }

  test("null input stays null; interpreted path matches codegen") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("é"), Some("x"))
      .toDF("s")
    val viaCodegen = df.select(TextFns.nfcNormalize(col("s")),
      TextFns.stripAccents(col("s"))).collect()
    viaCodegen(0).isNullAt(0) shouldBe true
    viaCodegen(0).isNullAt(1) shouldBe true
    // interpreted: eval the expressions directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val nfc = graft.functions.NfcNormalize(
      Literal(UTF8String.fromString("é"),
        org.apache.spark.sql.types.StringType))
    nfc.eval(null) shouldBe UTF8String.fromString("\u00e9")
    val strip = graft.functions.StripAccents(
      Literal(UTF8String.fromString("\u00e9"),
        org.apache.spark.sql.types.StringType))
    strip.eval(null) shouldBe UTF8String.fromString("e")
  }

  test("canonKey lands all byte-variants of the same text on one key") {
    val variants = Seq(
      "Caf\u00e9  du  Monde",          // composed + double spaces
      "cafe\u0301 du monde",           // decomposed
      "CAFE\u0301 DU MONDE",           // decomposed + upper
      "  cafe du monde  ")              // accent-free + padding
    val keys = variants.map(v => runOne(TextFns.canonKey(col("s")), v))
    keys.distinct shouldBe Seq("cafe du monde")
  }
}
