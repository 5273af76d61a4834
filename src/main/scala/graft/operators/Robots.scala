package graft.operators

/** robots.txt (RFC 9309) group parser — the crawl-politeness gate a
  * frontier runs between URL canonicalization (L127/q180) and the
  * fetch: per host, pick the rule GROUP for our user-agent (the
  * specific group if one names us, else the `*` group), then each URL
  * takes the longest-matching rule (Allow wins ties); no match →
  * allowed. (The reference's analogue is the P4 health predicate —
  * a per-file gate evaluated before any work is spent on the file.)
  *
  * Subset: `User-agent` / `Allow` / `Disallow` fields (case-
  * insensitive names), `#` comments, blank-line-tolerant; adjacent
  * `User-agent` lines head one shared group; an empty `Disallow:`
  * value is a no-op rule (allow-all, per the RFC); patterns support
  * `*` and a trailing `$` (matched by the codegen
  * [[graft.functions.RobotsMatch]] kernel); match precedence =
  * pattern length excluding the `$`. The de-facto `Crawl-delay`
  * field (integer seconds; not in RFC 9309 but honored by most
  * crawlers) is parsed per group (r10) and feeds
  * [[Politeness.schedule]]'s per-row delay — the specific group's
  * delay wins exactly like its rules do.
  *
  * 100 TB shape: robots bodies parse map-side on the hosts frame
  * (bounded: one row per HOST, not per URL); the exploded rules frame
  * (hosts × rules) broadcasts to the URL side, the glob match runs
  * inside codegen, and the verdict is one URL-keyed max-struct
  * aggregate — the frontier never shuffles by anything but its own
  * key. */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Rules of the group that governs `agent` (exact case-insensitive
    * product token), falling back to the `*` group; an unparseable or
    * group-less file yields no rules (= everything allowed, the RFC's
    * fail-open for a missing robots.txt). */
  def parseRules(txt: String, agent: String): Seq[Rule] =
    parseGroups(txt, agent)._1

  /** The governing group's `Crawl-delay` in SECONDS (specific group
    * wins over `*`, like its rules); None when absent, unparseable,
    * or out of [0, 86400] — the caller then applies its own default.
    * (r10: the field used to be tolerated-and-ignored; now it feeds
    * [[Politeness.schedule]].) */
  def crawlDelaySecs(txt: String, agent: String): Option[Long] =
    parseGroups(txt, agent)._2

  private def parseGroups(txt: String,
                          agent: String): (Seq[Rule], Option[Long]) = {
    if (txt == null) return (Nil, None)
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val specific = Vector.newBuilder[Rule]
    val wildcard = Vector.newBuilder[Rule]
    var specificDelay: Option[Long] = None
    var wildDelay: Option[Long] = None
    var sawSpecific = false
    // group state: which agents head the CURRENT group
    var groupSpecific = false; var groupWild = false
    var inAgentRun = false // adjacent User-agent lines share one group
    for (raw <- txt.split("\n", -1)) {
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val field = line.substring(0, c).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          field match {
            case "user-agent" =>
              if (!inAgentRun) { // a new group starts
                groupSpecific = false; groupWild = false; inAgentRun = true
              }
              val v = value.toLowerCase(java.util.Locale.ROOT)
              if (v == agentLc) { groupSpecific = true; sawSpecific = true }
              else if (v == "*") groupWild = true
            case "allow" | "disallow" =>
              inAgentRun = false
              if (value.nonEmpty) { // empty Disallow: = allow-all no-op
                val r = Rule(field == "allow", value)
                if (groupSpecific) specific += r
                if (groupWild) wildcard += r
              }
            case "crawl-delay" =>
              inAgentRun = false
              if (value.nonEmpty && value.length <= 5 &&
                value.forall(_.isDigit)) {
                val d = value.toLong
                if (d <= 86400L) {
                  if (groupSpecific && specificDelay.isEmpty)
                    specificDelay = Some(d)
                  if (groupWild && wildDelay.isEmpty) wildDelay = Some(d)
                }
              }
            case _ => inAgentRun = false // unknown field: tolerated
          }
        }
      }
    }
    if (sawSpecific) (specific.result(), specificDelay)
    else (wildcard.result(), wildDelay)
  }

  /** Precedence weight: pattern length, the trailing `$` excluded. */
  def matchLen(pattern: String): Int =
    if (pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$')
      pattern.length - 1
    else pattern.length

  // ---------------------------------------------------------------
  // Writer (test/synthesis side)
  // ---------------------------------------------------------------

  /** Deterministic per-host robots.txt: a `*` group with prefix,
    * anchored and wildcard rules derived from `h`, plus — when
    * `h % 3 == 0` — a `graftbot` group that must TAKE OVER entirely
    * (the RFC's specific-group-wins rule), including its own
    * `Crawl-delay: 2 + h%5`; the `*` group carries
    * `Crawl-delay: 1 + h%4` (r10: the field now schedules). */
  def robotsPayload(h: Long): String = {
    val sb = new StringBuilder()
    sb.append("# robots for host ").append(h).append('\n')
    if (h % 3 == 0)
      sb.append("User-agent: GraftBot\n")
        .append("Crawl-delay: ").append(2 + h % 5).append('\n')
        .append("Allow: /\n")
        .append("Disallow: /priv\n")
        .append("Allow: /priv/deep$\n\n")
    sb.append("User-agent: *\n")
      .append("Crawl-delay: ").append(1 + h % 4).append('\n')
      .append("Disallow: /a").append(h % 4).append('\n')
      .append("Allow: /a").append(h % 4).append("/pub\n")
      .append("Disallow: /priv$\n")
      .append("Disallow: /*/tmp\n")
      .append("Disallow:\n") // empty value: allow-all no-op
    sb.toString
  }
}
