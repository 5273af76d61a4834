package graft

import org.apache.spark.sql.functions._
import graft.operators.Robots
import graft.functions.{RobotsFns, RobotsMatchHelper}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt parsing + glob matching (q181): RFC 9309 group
  * selection, rule subset strictness, wildcard/anchor matching, and
  * the longest-match / Allow-wins-ties precedence. */
class RobotsSpec extends SparkSpec {

  private def m(path: String, pattern: String): Boolean =
    RobotsMatchHelper.matches(UTF8String.fromString(path),
      UTF8String.fromString(pattern))

  test("glob matching: prefix, wildcard, end anchor, backtracking") {
    m("/a/b", "/a") shouldBe true        // prefix
    m("/a/b", "/a/b") shouldBe true      // exact
    m("/a/b", "/a/b/c") shouldBe false   // pattern longer than path
    m("/a/b", "/b") shouldBe false       // anchored at start
    m("/d4/tmp/f", "/*/tmp") shouldBe true
    m("/tmp/f", "/*/tmp") shouldBe false // '*' cannot make '/' vanish... it CAN match empty — see below
    m("/priv", "/priv$") shouldBe true
    m("/priv/deep", "/priv$") shouldBe false
    m("/abc", "/a*$") shouldBe true      // trailing star + anchor
    m("/ab", "/a$") shouldBe false
    m("/x/y/tmp/z/tmp", "/*/tmp$") shouldBe true // backtrack to LAST /tmp
    m("/file.php", "/*.php") shouldBe true
    m("/file.php5", "/*.php$") shouldBe false
    m("/a", "") shouldBe true            // empty pattern matches all
  }

  test("'*' may match the empty string") {
    // "/tmp/f" vs "/*/tmp": '*' matching "" needs "/tmp" at offset 1 —
    // path[1:] is "tmp/f", so NO match; but "//tmp" does match
    m("//tmp", "/*/tmp") shouldBe true
    m("/ab", "/a*b") shouldBe true
  }

  test("group selection: specific agent takes over from '*'") {
    val txt = Robots.robotsPayload(6) // h%3==0 → has a GraftBot group
    val bot = Robots.parseRules(txt, "graftbot") // case-insensitive
    bot shouldBe Seq(Robots.Rule(allow = true, "/"),
      Robots.Rule(allow = false, "/priv"),
      Robots.Rule(allow = true, "/priv/deep$"))
    // another agent falls back to the '*' group
    val other = Robots.parseRules(txt, "otherbot")
    other.map(_.pattern) shouldBe
      Seq("/a2", "/a2/pub", "/priv$", "/*/tmp")
    // a host without the specific group serves '*' to everyone
    Robots.parseRules(Robots.robotsPayload(7), "graftbot")
      .map(_.pattern) shouldBe Seq("/a3", "/a3/pub", "/priv$", "/*/tmp")
  }

  test("Crawl-delay: per-group parse, specific wins, junk → None (r10)") {
    // h=9: graftbot group delay 2+9%5=6, '*' group delay 1+9%4=2
    val txt = Robots.robotsPayload(9)
    Robots.crawlDelaySecs(txt, "graftbot") shouldBe Some(6L)
    Robots.crawlDelaySecs(txt, "otherbot") shouldBe Some(2L)
    // no specific group → '*' delay for everyone (h=7 → 1+7%4=4)
    Robots.crawlDelaySecs(Robots.robotsPayload(7), "graftbot") shouldBe
      Some(4L)
    // absent field / junk values → None
    Robots.crawlDelaySecs("User-agent: *\nDisallow: /x\n", "b") shouldBe None
    Robots.crawlDelaySecs("User-agent: *\nCrawl-delay: fast\n", "b") shouldBe
      None
    Robots.crawlDelaySecs("User-agent: *\nCrawl-delay: 999999\n",
      "b") shouldBe None
    // first delay of the governing group wins; later ones are ignored
    Robots.crawlDelaySecs(
      "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 9\n", "b") shouldBe
      Some(3L)
  }

  test("parser tolerance: comments, unknown fields, empty Disallow") {
    val rules = Robots.parseRules(
      """# header comment
        |User-agent: A
        |User-agent: B
        |Crawl-delay: 7
        |Disallow: /x # trailing comment
        |Disallow:
        |Allow: /x/y
        |""".stripMargin, "b")
    rules shouldBe Seq(Robots.Rule(allow = false, "/x"),
      Robots.Rule(allow = true, "/x/y")) // shared group, no-op dropped
    Robots.parseRules("", "any") shouldBe Nil
    Robots.parseRules(null, "any") shouldBe Nil
    Robots.parseRules("garbage without colons\nmore", "any") shouldBe Nil
  }

  test("adjacent User-agent lines share a group; a rule line closes the run") {
    val txt =
      """User-agent: A
        |Disallow: /only-a
        |User-agent: B
        |Disallow: /only-b
        |""".stripMargin
    Robots.parseRules(txt, "A").map(_.pattern) shouldBe Seq("/only-a")
    Robots.parseRules(txt, "B").map(_.pattern) shouldBe Seq("/only-b")
  }

  test("matchLen excludes the trailing anchor") {
    Robots.matchLen("/priv$") shouldBe 5
    Robots.matchLen("/priv") shouldBe 5
    Robots.matchLen("/*/tmp") shouldBe 6
    Robots.matchLen("") shouldBe 0
  }

  test("precedence: longest match wins, Allow wins ties, no match allows") {
    import spark.implicits._
    // (path, rules) → verdict via the same column algebra as q181
    val rules = Seq(
      (false, "/a"), (true, "/a/pub"), (false, "/a/pub$"))
      .toDF("allow", "pattern")
      .withColumn("plen", org.apache.spark.sql.functions.length(
        regexp_replace(col("pattern"), lit("\\$$"), lit(""))).cast("long"))
    val urls = Seq("/a/x", "/a/pub", "/a/pub/z", "/zzz").toDF("path")
    val got = urls.join(broadcast(rules),
        RobotsFns.robotsMatch(col("path"), col("pattern")), "left")
      .select(col("path"), coalesce(col("plen"), lit(-1L)).as("p"),
        coalesce(col("allow"), lit(true)).as("a"))
      .groupBy("path").agg(max(struct(col("p"), col("a"))).as("b"))
      .select(col("path"), col("b.a").as("allowed"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    got("/a/x") shouldBe false    // only /a matches
    got("/a/pub") shouldBe true   // tie at len 6: Allow beats Disallow$
    got("/a/pub/z") shouldBe true // /a/pub (A,6) beats /a (D,2); $ fails
    got("/zzz") shouldBe true     // no match → allowed
  }
}
