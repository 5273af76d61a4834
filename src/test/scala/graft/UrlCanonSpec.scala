package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFns

/** URL canonicalization kernel (q180): every RFC 3986 §6.2.2
  * normalization arm, tracking-param removal, malformed → NULL, and
  * codegen/interpreted parity. */
class UrlCanonSpec extends SparkSpec {

  private def runOne(input: String): Option[String] = {
    import spark.implicits._
    val r = Seq(Option(input)).toDF("s")
      .select(UrlFns.urlCanon(col("s")).as("r")).collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("scheme and host lowercase; default port stripped; path added") {
    runOne("HTTP://WwW.X.Com") shouldBe Some("http://www.x.com/")
    runOne("http://x.com:80/a") shouldBe Some("http://x.com/a")
    runOne("https://x.com:443/a") shouldBe Some("https://x.com/a")
    runOne("https://x.com:80/a") shouldBe Some("https://x.com:80/a")
    runOne("http://x.com:08080/a") shouldBe Some("http://x.com:8080/a")
  }

  test("userinfo and fragment are dropped") {
    runOne("http://user:pw@x.com/a#frag") shouldBe Some("http://x.com/a")
    runOne("http://x.com/a#b#c") shouldBe Some("http://x.com/a")
  }

  test("dot-segments resolve per RFC 3986 §5.2.4") {
    runOne("http://x.com/a/./b/../c") shouldBe Some("http://x.com/a/c")
    runOne("http://x.com/../a") shouldBe Some("http://x.com/a")
    runOne("http://x.com/a/..") shouldBe Some("http://x.com/")
    runOne("http://x.com/a/.") shouldBe Some("http://x.com/a/")
    runOne("http://x.com/a/b/") shouldBe Some("http://x.com/a/b/")
    // %2E decodes to '.' (unreserved) BEFORE dot-segment resolution
    runOne("http://x.com/a/%2E%2E/b") shouldBe Some("http://x.com/b")
  }

  test("percent-escapes: unreserved decode, reserved kept uppercase") {
    runOne("http://x.com/%41%2fb") shouldBe Some("http://x.com/A%2Fb")
    runOne("http://x.com/%7e%2D%5F") shouldBe Some("http://x.com/~-_")
    runOne("http://x.com/a%zz") shouldBe None // bad hex
    runOne("http://x.com/a%4") shouldBe None  // dangling
  }

  test("query: tracking params dropped, rest percent-normalized + sorted") {
    runOne("http://x.com/p?utm_source=t&b=2&a=1&fbclid=z&gclid=g&msclkid=m")
      .shouldBe(Some("http://x.com/p?a=1&b=2"))
    runOne("http://x.com/p?b=%41&B=2") shouldBe
      Some("http://x.com/p?B=2&b=A") // code-unit sort, value decoded
    runOne("http://x.com/p?utm_source=t") shouldBe Some("http://x.com/p")
    runOne("http://x.com/p?") shouldBe Some("http://x.com/p")
    runOne("http://x.com/p?a=1&&b=2") shouldBe
      Some("http://x.com/p?a=1&b=2") // empty params dropped
    runOne("http://x.com/p?flag") shouldBe Some("http://x.com/p?flag")
  }

  test("param order never distinguishes two resources") {
    runOne("http://x.com/p?a=1&b=2") shouldBe
      runOne("http://x.com/p?b=2&a=1")
  }

  test("malformed → NULL: bad scheme, empty host, bad port") {
    runOne("ftp://x.com/a") shouldBe None
    runOne("not a url") shouldBe None
    runOne("http://") shouldBe None
    runOne("http://:8080/a") shouldBe None
    runOne("http://x.com:/a") shouldBe None
    runOne("http://x.com:9x/a") shouldBe None
    runOne("http://x.com:0/a") shouldBe None
    runOne("http://x.com:70000/a") shouldBe None
    runOne("") shouldBe None
  }

  test("bracketed IPv6 authorities: inner colons are not a port (ADVICE r9)") {
    runOne("http://[::1]/a") shouldBe Some("http://[::1]/a")
    runOne("HTTP://[2001:DB8::1]/x") shouldBe Some("http://[2001:db8::1]/x")
    runOne("http://[::1]:80/a") shouldBe Some("http://[::1]/a")
    runOne("https://[::1]:443/a") shouldBe Some("https://[::1]/a")
    runOne("http://[::1]:8080/a") shouldBe Some("http://[::1]:8080/a")
    runOne("http://[]/a") shouldBe None        // empty literal
    runOne("http://[::1/a") shouldBe None      // unterminated bracket
    runOne("http://[::1]junk/a") shouldBe None // junk after the bracket
    runOne("http://[zz::1]/a") shouldBe None   // non-hex inside
  }

  test("null stays null; interpreted path matches codegen") {
    import spark.implicits._
    val viaCodegen = Seq[Option[String]](None, Some("HTTP://A.B:80/x"))
      .toDF("s").select(UrlFns.urlCanon(col("s"))).collect()
    viaCodegen(0).isNullAt(0) shouldBe true
    viaCodegen(1).getString(0) shouldBe "http://a.b/x"
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.StringType
    graft.functions.UrlCanonicalize(
      Literal(UTF8String.fromString("HTTP://A.B:80/x"), StringType))
      .eval(null) shouldBe UTF8String.fromString("http://a.b/x")
    graft.functions.UrlCanonicalize(
      Literal(UTF8String.fromString("junk"), StringType))
      .eval(null).asInstanceOf[AnyRef] shouldBe null
  }

  test("canonicalization is idempotent on its own output") {
    val messy = Seq(
      "HTTP://WwW.X.Com:80/Dir%41/./a/../b?utm_source=t&B=2&a=%41#f",
      "https://H.Example:8443/p%2Fq/%2e/r?z=9&y=8",
      "http://x.com/a/b/../../c%7E")
    for (m <- messy) {
      val once = runOne(m)
      once should not be None
      runOne(once.get) shouldBe once
    }
  }
}
