package graft

import graft.operators.Html

/** HTML visible-text extraction (q179): round-trip differential against
  * an independent formula replay, subset strictness (quoted attributes,
  * entity forms, script/style/comment removal), and the never-throw
  * contract under truncation/mutation. */
class HtmlSpec extends SparkSpec {

  /** Independent replay of the writer's documented formulas. */
  private def expected(id: Long, nParas: Int, nLinks: Int,
                       seed: Long): Html.HtmlInfo = {
    val paras = (0 until nParas).map(i =>
      s"para $i of doc $seed: & A word${(seed + i) % 13}")
    val links = (0 until nLinks).map(j => s"link $j")
    val visible = (s"Heading $seed" +: (paras ++ links)).mkString(" ")
    Html.HtmlInfo(id, s"Doc $seed t${seed % 7}".length.toLong,
      nParas.toLong, nLinks.toLong,
      (0 until nLinks).map(j => (seed + j) % 5).distinct.length.toLong,
      visible.length.toLong, visible.map(_.toLong).sum, valid = true)
  }

  test("round-trip differential over the (nParas, nLinks, seed) grid") {
    for (n <- Seq(1, 2, 4, 6); k <- Seq(1, 2, 4, 5); seed <- 0L until 13L) {
      val h = Html.htmlPayload(n, k, seed)
      Html.parse(n * 1000L + k, h) shouldBe
        expected(n * 1000L + k, n, k, seed)
    }
  }

  test("script, style and comment bodies never leak into the text") {
    // the writer's page embeds <p> markup in all three; a parser that
    // treats any of them as text changes n_paragraphs or the byte sum
    val h = Html.htmlPayload(2, 1, 3L)
    h should include("<p>not text</p>")   // in <style>
    h should include("<p>nope</p>")       // in <script>
    h should include("<p>fake</p>")       // in the comment
    Html.parse(1L, h) shouldBe expected(1L, 2, 1, 3L)
  }

  test("a '>' inside a quoted attribute value does not end the tag") {
    val h = "<html><body><p class=\"a>b\">x</p></body></html>"
    val r = Html.parse(1L, h)
    r.valid shouldBe true
    r.n_paragraphs shouldBe 1L
    r.text_len shouldBe 1L
    // unquoted attribute values are out of subset
    Html.parse(1L,
      "<html><body><p class=x>y</p></body></html>").valid shouldBe false
  }

  test("entities: named, decimal and hex decode; malformed reject") {
    def vis(bodyText: String): Html.HtmlInfo =
      Html.parse(1L, s"<html><body>$bodyText</body></html>")
    vis("&amp;&lt;&gt;&quot;&apos;").sum_text_bytes shouldBe
      "&<>\"'".map(_.toLong).sum
    vis("&#65;&#x41;&#x61;").sum_text_bytes shouldBe (65L + 65L + 97L)
    vis("&#65;&#x41;&#x61;").text_len shouldBe 3L
    vis("&unknown;").valid shouldBe false
    vis("& bare").valid shouldBe false
    vis("&#;").valid shouldBe false
    vis("&#x;").valid shouldBe false
    vis("&#xZZ;").valid shouldBe false
    vis("&#1114112;").valid shouldBe false // beyond U+10FFFF
    vis("&#128512;").text_len shouldBe 1L  // astral plane counts once
  }

  test("whitespace collapse: runs become one space, ends trimmed") {
    val r = Html.parse(1L,
      "<html><body>\n\t a \n\n b\t\tc \n</body></html>")
    r.valid shouldBe true
    r.text_len shouldBe 5L // "a b c"
    r.sum_text_bytes shouldBe "a b c".map(_.toLong).sum
  }

  test("structure rules: body required, closed once, title balanced") {
    Html.parse(1L, "<html><p>x</p></html>").valid shouldBe false // no body
    Html.parse(1L, "<html><body>x</html>").valid shouldBe false  // unclosed
    Html.parse(1L,
      "<html><body>x</body><body>y</body></html>").valid shouldBe false
    Html.parse(1L,
      "<html><head><title>t</head><body>x</body></html>")
      .valid shouldBe false // title never closed
    Html.parse(1L, "").valid shouldBe false
    Html.parse(1L, null).valid shouldBe false
  }

  test("anchors in body require an href with an authority") {
    Html.parse(1L,
      "<html><body><a>x</a></body></html>").valid shouldBe false
    Html.parse(1L,
      "<html><body><a href=\"nope\">x</a></body></html>")
      .valid shouldBe false
    val r = Html.parse(1L,
      "<html><body><a href=\"http://h.example\">x</a>" +
        "<a href=\"http://h.example/p\">y</a></body></html>")
    r.valid shouldBe true
    r.n_links shouldBe 2L
    r.n_hosts shouldBe 1L // path-less and path forms, same host
  }

  test("unterminated comment, script or quote never throws, is invalid") {
    Html.parse(1L, "<html><body><!-- x</body></html>").valid shouldBe false
    Html.parse(1L,
      "<html><body><script>var x=1;</body></html>").valid shouldBe false
    Html.parse(1L,
      "<html><body><p class=\"x>y</p></body></html>").valid shouldBe false
  }

  test("every truncation and random mutation never throws") {
    val h = Html.htmlPayload(3, 2, 7L)
    for (len <- 0 to h.length)
      noException should be thrownBy Html.parse(1L, h.substring(0, len))
    val rnd = new scala.util.Random(20260815)
    for (_ <- 0 until 500) {
      val pos = rnd.nextInt(h.length)
      val m = h.substring(0, pos) + rnd.nextPrintableChar() +
        h.substring(pos + 1)
      noException should be thrownBy Html.parse(1L, m)
    }
    for (_ <- 0 until 200) {
      val g = new String(Array.fill(rnd.nextInt(200))(
        (rnd.nextInt(95) + 32).toChar))
      noException should be thrownBy Html.parse(1L, g)
    }
  }

  test("links(): every body anchor's href, nothing from script/comments") {
    import spark.implicits._
    val good = Html.htmlPayload(2, 3, 6L)
    val bad = "<html><body><a href=\"nope\">x</a></body></html>"
    val ds = spark.createDataset(Seq((1L, good), (2L, bad)))
    val got = Html.links(ds).collect().sortBy(_._2)
    got.map(_._1).distinct shouldBe Array(1L) // malformed page: no rows
    got.map(_._2) shouldBe (0 until 3)
      .map(j => s"http://h${(6 + j) % 5}.example/p$j").sorted.toArray
  }

  test("decodeHtml runs map-side over a Dataset") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      (1L, Html.htmlPayload(2, 1, 4L)), (2L, Html.htmlPayload(5, 3, 11L))))
    val got = Html.decodeHtml(ds).collect().sortBy(_.media_id)
    got(0) shouldBe expected(1L, 2, 1, 4L)
    got(1) shouldBe expected(2L, 5, 3, 11L)
  }
}
