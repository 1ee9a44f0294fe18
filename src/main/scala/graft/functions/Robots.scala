package graft.functions

/** robots.txt evaluation (RFC 9309) — the crawl-politeness gate: a
  * training pipeline that honors robots semantics must be able to
  * re-evaluate allow/deny for every (agent, url) it kept, both at
  * intake and RETROACTIVELY (sites change their robots.txt and
  * takedown requests cite it; the evaluator is what makes the audit
  * answerable). The reference tool never fetches the web; a 100 TB
  * crawl pipeline runs exactly this check per kept URL.
  *
  * Semantics implemented (the RFC 9309 core):
  *   - Groups: consecutive `User-agent:` lines share the rule block
  *     that follows; a crawler matches the group whose agent token
  *     is the LONGEST token contained in its product name
  *     (case-insensitive); `*` is the fallback group only when no
  *     specific token matches. All groups with the winning token
  *     merge.
  *   - Rules: `Allow:` / `Disallow:` path patterns with `*`
  *     wildcards (any octet sequence) and a trailing `$` end
  *     anchor; an empty Disallow value allows everything.
  *   - Decision: the MOST SPECIFIC matching rule wins (longest
  *     pattern in octets); at a tie, Allow wins. No matching rule →
  *     allowed. No matching group → allowed (robots is opt-out).
  *   - Lines are `key: value` with `#` comments stripped; unknown
  *     keys (Crawl-delay, Sitemap) are ignored without breaking the
  *     group structure (the RFC's tolerance rule).
  *
  * Never throws: hostile bytes yield whatever groups parsed.
  */
object Robots {

  final case class Group(agents: Vector[String],
                         rules: Vector[(Boolean, String)],
                         crawlDelay: Option[Double] = None)

  /** Parsed groups in file order. */
  def parse(txt: String): Vector[Group] = {
    if (txt == null) return Vector.empty
    val out = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var delay: Option[Double] = None
    var inAgentRun = false // consecutive User-agent lines accumulate
    def flush(): Unit = {
      if (agents.nonEmpty) out += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
    }
    txt.linesIterator.foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case i => raw.substring(0, i)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) flush()
            agents :+= value.toLowerCase(java.util.Locale.ROOT)
            inAgentRun = true
          case "allow" =>
            inAgentRun = false
            if (agents.nonEmpty) rules :+= ((true, value))
          case "disallow" =>
            inAgentRun = false
            if (agents.nonEmpty) rules :+= ((false, value))
          case "crawl-delay" =>
            // nonstandard but widely served (Bing/Yandex honor it);
            // a member of the group block like allow/disallow —
            // unparsable values are ignored (tolerance), negative
            // ones too (a negative delay is nonsense). Duplicate
            // declarations inside ONE group merge with max, the same
            // politeness-conservative direction [[crawlDelay]] uses
            // across groups (one conflict, one resolution rule)
            inAgentRun = false
            if (agents.nonEmpty)
              delay = value.toDoubleOption.filter(_ >= 0) match {
                case Some(d) => Some(delay.fold(d)(math.max(d, _)))
                case None => delay
              }
          case _ => () // Sitemap/unknown: MUST NOT touch
                       // the group structure (the RFC tolerance rule)
                       // — in particular a Sitemap line BETWEEN two
                       // User-agent lines must not split them into
                       // separate groups, or the first agent ends up
                       // with an empty rule set and everything allowed
        }
      }
    }
    flush()
    out.result()
  }

  /** `pattern` matches `path` under the `*`/`$` grammar: prefix
    * match by default, `*` spans anything, trailing `$` anchors the
    * end. Iterative greedy match with one backtrack point per `*`
    * (the classic wildcard walk — linear in practice, never
    * exponential: a failed segment RESUMES at the star).
    */
  private[functions] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1)
              else pattern
    var p = 0 // pattern cursor
    var s = 0 // path cursor
    var starP = -1
    var starS = -1
    while (s < path.length) {
      // the '*' branch MUST be tried before literal equality: a
      // pattern '*' meeting a literal '*' in the path would otherwise
      // match as a single char WITHOUT recording a backtrack point,
      // and a later mismatch would fail the whole walk (wrongly
      // reporting "allowed" for a Disallow — the compliance-violating
      // direction for a politeness gate)
      if (p < pat.length && pat.charAt(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (p < pat.length &&
          (pat.charAt(p) == path.charAt(s))) { p += 1; s += 1 }
      else if (starP >= 0) {
        starS += 1; s = starS; p = starP + 1
      } else {
        // pattern exhausted without anchor = prefix match satisfied
        return p >= pat.length && !anchored
      }
      // pattern consumed: prefix semantics succeed immediately
      // unless the $ anchor requires the path end too
      if (p >= pat.length && !anchored) return true
    }
    // path exhausted: remaining pattern must be all '*'
    var q = p
    while (q < pat.length && pat.charAt(q) == '*') q += 1
    q >= pat.length
  }

  /** allow/deny for `agent` fetching `path` under `groups`. RFC
    * 9309: an EMPTY path means "/" — a pathless site-root URL is
    * governed by the same rules as "/" (without this, `Disallow: /`
    * would not match "" and a deny-all policy would green-light
    * fetching the host's root — the compliance-violating direction).
    */
  def allowed(groups: Vector[Group], agent: String,
              path: String): Boolean = {
    val p0 =
      if (path == null || path.isEmpty) "/"
      else if (path.charAt(0) != '/') "/" + path // bare "?x=1" too
      else path
    val a = if (agent == null) "" else
      agent.toLowerCase(java.util.Locale.ROOT)
    // the winning agent token: longest specific token contained in
    // the product name; '*' only when nothing specific matches
    var bestToken: String = null
    groups.foreach(_.agents.foreach { t =>
      if (t != "*" && t.nonEmpty && a.contains(t) &&
          (bestToken == null || t.length > bestToken.length))
        bestToken = t
    })
    val token = if (bestToken != null) bestToken else "*"
    val rules = groups.filter(_.agents.contains(token))
      .flatMap(_.rules)
    if (rules.isEmpty) return true
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (allow, pattern) =>
      if (pattern.isEmpty) {
        // empty Disallow = allow everything (matches nothing to deny)
        if (!allow) () else ()
      } else if (matches(pattern, p0)) {
        val len = pattern.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len; bestAllow = allow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  /** One-call form over raw robots.txt content. */
  def allowed(robotsTxt: String, agent: String, path: String): Boolean =
    allowed(parse(robotsTxt), agent, path)

  /** The Crawl-delay the scheduler owes this agent under `groups` —
    * same group selection as [[allowed]] (longest specific token,
    * `*` fallback); when several winning groups declare a delay the
    * MAXIMUM applies (the politeness-conservative merge). None when
    * no winning group declares one.
    */
  def crawlDelay(groups: Vector[Group], agent: String): Option[Double] = {
    val a = if (agent == null) "" else
      agent.toLowerCase(java.util.Locale.ROOT)
    var bestToken: String = null
    groups.foreach(_.agents.foreach { t =>
      if (t != "*" && t.nonEmpty && a.contains(t) &&
          (bestToken == null || t.length > bestToken.length))
        bestToken = t
    })
    val token = if (bestToken != null) bestToken else "*"
    val delays = groups.filter(_.agents.contains(token))
      .flatMap(_.crawlDelay)
    if (delays.isEmpty) None else Some(delays.max)
  }

  def crawlDelay(robotsTxt: String, agent: String): Option[Double] =
    crawlDelay(parse(robotsTxt), agent)
}
