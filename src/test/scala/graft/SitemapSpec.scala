package graft

import graft.operators.Sitemap

/** Sitemap XML walk (q188): formula round-trip, XML strictness
  * (entities, balance, exactly-one-loc, trailing content), and the
  * never-throw contract. */
class SitemapSpec extends SparkSpec {

  private def expected(id: Long, n: Int, seed: Long): Sitemap.SitemapInfo = {
    val hosts = (0 until n).map(i => (seed + i) % 5).distinct.length
    Sitemap.SitemapInfo(id, n.toLong, hosts.toLong,
      (0 until n).count(_ % 2 == 0).toLong,
      (0 until n).filter(_ % 3 != 1).map(i => (seed + i) % 10).sum,
      (0 until n).map(i => 28L + i.toString.length).sum, valid = true)
  }

  test("round-trip differential over the (n, seed) grid") {
    for (n <- Seq(1, 2, 3, 5, 9, 12); seed <- 0L until 13L)
      Sitemap.parse(n * 100L + seed, Sitemap.sitemapPayload(n, seed))
        .shouldBe(expected(n * 100L + seed, n, seed))
  }

  test("XML strictness: bare ampersand, unbalanced tags, double loc") {
    def wrap(urls: String): String =
      "<?xml version=\"1.0\"?>\n<urlset>\n" + urls + "</urlset>\n"
    Sitemap.parse(1L, wrap(
      "<url><loc>http://h.example/?a=1&b=2</loc></url>"))
      .valid shouldBe false // bare & — XML rejects what HTML tolerates
    Sitemap.parse(1L, wrap(
      "<url><loc>http://h.example/x</loc>")).valid shouldBe false
    Sitemap.parse(1L, wrap(
      "<url><loc>http://a.example/</loc><loc>http://b.example/</loc></url>"))
      .valid shouldBe false
    Sitemap.parse(1L, wrap("<url></url>")).valid shouldBe false // no loc
    Sitemap.parse(1L, wrap(
      "<url><loc>no-authority</loc></url>")).valid shouldBe false
    Sitemap.parse(1L, wrap("") + "trailing").valid shouldBe false
    Sitemap.parse(1L, wrap("")).valid shouldBe false // zero urls
    Sitemap.parse(1L, "").valid shouldBe false
    Sitemap.parse(1L, null).valid shouldBe false
  }

  test("priority grid: 0.d and 1.0 accepted, anything else rejected") {
    def one(prio: String): Sitemap.SitemapInfo = Sitemap.parse(1L,
      "<?xml version=\"1.0\"?><urlset><url>" +
        s"<loc>http://h.example/</loc><priority>$prio</priority>" +
        "</url></urlset>")
    one("0.7").sum_prio_tenths shouldBe 7L
    one("1.0").sum_prio_tenths shouldBe 10L
    one("0.75").valid shouldBe false
    one(".5").valid shouldBe false
    one("2.0").valid shouldBe false
    one("").valid shouldBe false
  }

  test("entities decode in loc; counts use decoded characters") {
    val r = Sitemap.parse(1L,
      "<?xml version=\"1.0\"?><urlset><url>" +
        "<loc>http://h.example/?x=&amp;&#65;</loc>" +
        "</url></urlset>")
    r.valid shouldBe true
    // "http://h.example/?x=&A" = 22 decoded chars
    r.sum_loc_chars shouldBe 22L
  }

  test("truncations and mutations never throw") {
    val x = Sitemap.sitemapPayload(4, 6)
    for (len <- 0 to x.length)
      noException should be thrownBy Sitemap.parse(1L, x.substring(0, len))
    val rnd = new scala.util.Random(20260815)
    for (_ <- 0 until 400) {
      val pos = rnd.nextInt(x.length)
      val m = x.substring(0, pos) + rnd.nextPrintableChar() +
        x.substring(pos + 1)
      noException should be thrownBy Sitemap.parse(1L, m)
    }
  }

  test("decodeSitemap runs map-side over a Dataset") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      (1L, Sitemap.sitemapPayload(3, 2L)),
      (2L, Sitemap.sitemapPayload(7, 11L))))
    val got = Sitemap.decodeSitemap(ds).collect().sortBy(_.media_id)
    got(0) shouldBe expected(1L, 3, 2L)
    got(1) shouldBe expected(2L, 7, 11L)
  }
}
