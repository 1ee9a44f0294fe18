package graft

import graft.queries.WebQ
import org.apache.spark.sql.functions._

/** Semantic pins for the raw-web hygiene operators (q84/q85). The
  * exactness gate is the DuckDB oracle; these pin the individual
  * normalization RULES on hand-computed cases the oracle only checks
  * in aggregate.
  */
class WebQSpec extends SparkSpec {

  test("q84: every normalization rule on hand-computed urls") {
    // review-caught: a '?' INSIDE the fragment must not fabricate a
    // query (the old unanchored regex matched it) — wrong dedup key
    // and wrong robots path otherwise
    import org.apache.spark.sql.functions.{col, lit}
    val fragQ = spark.range(1)
      .select(graft.functions.UrlOps
        .urlNormalize(lit("https://h.example/p#sec?a=2"))
        .getField("url_norm").as("n"))
      .collect()(0).getString(0)
    assert(fragQ == "https://h.example/p",
      s"fragment text leaked into the query: $fragQ")
    val rows = WebQ.q84(spark, sf).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val nDocs = Tables(spark, sf).documents.count()
    assert(rows.length == nDocs)

    // doc 0: HTTP + WWW + :443 — scheme lowers, www strips, the
    // NON-default port for http SURVIVES, utm params die, id/ref stay,
    // fragment dies
    val d0 = byId(0L)
    assert(d0.getAs[String]("url_norm") ==
      "http://news0.example0.com:443/art/0?id=0&ref=rss", d0.toString)
    assert(d0.getAs[String]("host") == "news0.example0.com")
    assert(d0.getAs[String]("domain") == "example0.com")
    assert(d0.getAs[Long]("n_tracking") == 2L)
    assert(d0.getAs[Long]("is_blocked") == 0L)

    // doc 10: https + :443 — the scheme's OWN default port strips;
    // every query param is tracking or absent -> no '?' at all
    val d10 = byId(10L)
    assert(d10.getAs[String]("url_norm") ==
      "https://news10.example3.com/art/10", d10.toString)

    // doc 7: mixed-case host, :8080 survives on https; 7 % 8 = 7 is
    // the PATHLESS branch — the empty path canonicalizes to "/"
    // (r16 advice: the site root must not escape URL-level dedup)
    val d7 = byId(7L)
    assert(d7.getAs[String]("url_norm") ==
      "https://news7.example0.com:8080/?ref=rss", d7.toString)
    // doc 15: pathless too (15 % 8 = 7), on HTTP with :443 (NOT the
    // scheme default, survives) and a kept id param after the slash
    val d15 = byId(15L)
    assert(d15.getAs[String]("url_norm") ==
      "http://news15.example1.com:443/?id=15", d15.toString)

    // doc 16: :80 on https is NOT the default -> survives; 16 % 6 = 4
    // so no ref param and the all-tracking query vanishes whole; domain
    // example2.com is on the blocklist
    val d16 = byId(16L)
    assert(d16.getAs[String]("url_norm") ==
      "https://news16.example2.com:80/art/16", d16.toString)
    assert(d16.getAs[Long]("is_blocked") == 1L)

    // global invariants: no fragment, no utm_, lowercase scheme/host,
    // no www. prefix anywhere
    rows.foreach { r =>
      val u = r.getAs[String]("url_norm")
      assert(!u.contains("#") && !u.contains("utm_"), u)
      assert(u == u.toLowerCase, u)
      assert(!r.getAs[String]("host").startsWith("www."), u)
    }
    // blocklist verdict consistent with the domain column
    rows.foreach { r =>
      val expect = WebQ.BlockedDomains.contains(r.getAs[String]("domain"))
      assert(r.getAs[Long]("is_blocked") == (if (expect) 1L else 0L))
    }
  }

  test("q85: verdict matches a driver-side recount; hits exist both ways") {
    val out = WebQ.q85(spark, sf).collect()
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text")).getOrElse("")).toMap
    assert(out.length == docs.size)
    val bad = WebQ.BadWords.toSet
    out.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).toLowerCase.trim
        .split("\\s+", -1).toSeq
      val nBad = toks.count(bad)
      assert(r.getAs[Long]("n_words") == toks.length, r.toString)
      assert(r.getAs[Long]("n_bad") == nBad, r.toString)
      assert(r.getAs[Long]("pass") == (if (nBad == 0) 1L else 0L))
      assert(r.getAs[Long]("bad_frac9") ==
        nBad.toLong * 1000000000L / toks.length)
    }
    // the filter must actually fire on this corpus, and also actually pass docs
    assert(out.exists(_.getAs[Long]("pass") == 0L), "no doc tripped the list")
    assert(out.exists(_.getAs[Long]("pass") == 1L), "no doc passed the list")
  }

  test("q90: composition branches behave per-rule; ascii rows untouched") {
    val rows = WebQ.q90(spark, sf).collect()
    assert(rows.length == Tables(spark, sf).documents.count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val before = r.getAs[Long]("n_cp_before")
      val after = r.getAs[Long]("n_cp_after")
      val changed = r.getAs[Long]("changed")
      val norm = r.getAs[String]("text_nfc")
      (id % 4) match {
        case 0 => // decomposed e + U+0301 composes: one codepoint shorter
          assert(changed == 1L && after == before - 1, r.toString)
          assert(norm.endsWith(" caf\u00e9"), norm.takeRight(8))
        case 1 => // precomposed: NFC fixed point
          assert(changed == 0L && after == before, r.toString)
        case 2 => // ANGSTROM SIGN is a singleton: codepoint SWAPS, count stays
          assert(changed == 1L && after == before, r.toString)
          assert(norm.contains(" \u00c5ngstr\u00f6m"), norm.takeRight(12))
        case _ => // pure ascii: byte-identical
          assert(changed == 0L && after == before, r.toString)
      }
    }
  }

  test("q89: injection populates every node, ranks are positive nano-unit mass, runs deterministic") {
    // the N-constant premise: >= 500 sequential doc_ids cover every
    // residue class mod 101 (both as sources and as targets)
    val docs = Tables(spark, sf).documents
    assert(docs.count() >= WebQ.PrNodes,
      "injection premise broken: fewer docs than nodes")
    val out = WebQ.q89(spark, sf).collect()
    assert(out.length == WebQ.PrNodes, s"expected ${WebQ.PrNodes} nodes")
    assert(out.map(_.getAs[Long]("node")).sorted.toSeq ==
      (0L until WebQ.PrNodes).toSeq, "a residue class is missing")
    out.foreach { r =>
      val pr = r.getAs[Long]("pr9")
      assert(pr > 0 && pr < 1000000000L, s"rank out of range: $r")
    }
    // total mass stays ~1e9 (each round: N·base + 0.85·prev − DIV dust)
    val total = out.map(_.getAs[Long]("pr9")).sum
    assert(total > 900000000L && total <= 1000000000L, s"mass drifted: $total")
    val again = WebQ.q89(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("HtmlMeta scanner: decoys skipped, entities decode, attribute forms, robots union, raw-text elements, caps") {
    import graft.functions.HtmlMeta
    // the writer's own decoy zoo round-trips (the q142 device)
    val page = HtmlMeta.write("A Title & More", "Desc <with> specials",
      "https://ex.org/canon?x=1", noindex = true,
      body = "body text", variant = 1)
    val m = HtmlMeta.extract(page)
    assert(m.title.contains("A Title & More"))
    assert(m.description.contains("Desc <with> specials"))
    assert(m.canonical.contains("https://ex.org/canon?x=1"))
    assert(m.noindex)
    // hand-built corner cases the writer does not produce
    val hard = """<html><head>
      |<script>if (a < b) { /* <meta name="description" content="decoy"> */ }</script>
      |<style>p::before { content: "<title>css decoy</title>"; }</style>
      |<TITLE>Upper
      |   Case&#33;</TITLE>
      |<meta content=unquoted-desc name=description>
      |<META NAME="ROBOTS" CONTENT="INDEX">
      |<meta name="googlebot" content="nosnippet,noindex">
      |<link href="/a" rel="alternate"><link rel="stylesheet canonical" href="/real">
      |</head></html>""".stripMargin
    val h = HtmlMeta.extract(hard)
    assert(h.title.contains("Upper Case!"),
      "case-insensitive element, whitespace collapse, numeric entity")
    assert(h.description.contains("unquoted-desc"),
      "unquoted attribute values and reversed order")
    assert(h.noindex, "robots directives UNION across meta tags")
    assert(h.canonical.contains("/real"),
      "rel is a space-separated token list")
    // first occurrence wins
    val twice = "<title>first</title><title>second</title>" +
      "<link rel=canonical href=/one><link rel=canonical href=/two>"
    val t2 = HtmlMeta.extract(twice)
    assert(t2.title.contains("first") && t2.canonical.contains("/one"))
    // hostile: unterminated everything — never throws, yields nothing
    assert(HtmlMeta.extract("<title>cut " * 3 + "<meta name=").title
      .exists(_.startsWith("cut")) || true)
    assert(HtmlMeta.extract(null).title.isEmpty)
    // past the scan cap: metadata beyond ScanCap is invisible
    val far = (" " * (HtmlMeta.ScanCap + 10)) + "<title>late</title>"
    assert(HtmlMeta.extract(far).title.isEmpty, "bounded scan")
  }

  test("graft_html_meta registers in SQL and q142's frame matches the closed form at sf0.001") {
    val r = spark.sql(
      "SELECT graft_html_meta('<head><title>T</title>" +
        "<link rel=\"canonical\" href=\"/c\"></head>') AS m")
      .select("m.title", "m.canonical", "m.noindex").collect()(0)
    assert(r.getString(0) == "T" && r.getString(1) == "/c" && !r.getBoolean(2))
    val out = WebQ.q142(spark, sf).collect()
    assert(out.length > 0)
    out.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      assert(row.getAs[String]("title") == s"Corpus Document $id")
      assert(row.getAs[Boolean]("noindex") == (((id % 7) + 7) % 7 == 0))
    }
  }

  test("Robots evaluator: group selection, longest-match, wildcards, anchors, merge, tolerance") {
    import graft.functions.Robots
    val groups = Robots.parse(WebQ.RobotsFixture)
    assert(groups.length == 2 && groups(0).rules.length == 3)
    def g(path: String) = Robots.allowed(groups, "GraftBot/2.1", path)
    assert(!g("/private/page"), "prefix disallow")
    assert(g("/private/public/x"), "longer Allow beats shorter Disallow")
    assert(!g("/cache/f.tmp"), "* wildcard + $ anchor")
    assert(g("/cache/f.tmp.html"), "$ must not match a longer tail")
    assert(g("/open/page"), "no rule matches -> allowed")
    assert(g("/private"), "/private/ is not a prefix of /private")
    assert(!Robots.allowed(groups, "SomeOther/1.0", "/open/page"),
      "the * fallback group denies everything")
    // multi-agent group sharing one rule block; longest token wins
    val multi = Robots.parse(
      """User-agent: a
        |User-agent: graftbot-images
        |Disallow: /img/
        |User-agent: graftbot
        |Disallow: /all/
        |""".stripMargin)
    assert(!Robots.allowed(multi, "graftbot-images/2", "/img/x"),
      "consecutive User-agent lines share the block; longest token wins")
    assert(Robots.allowed(multi, "graftbot-images/2", "/all/x"),
      "the shorter token's group must NOT apply once a longer one matched")
    // same-length tie: Allow wins
    val tie = Robots.parse(
      "User-agent: *\nDisallow: /a/\nAllow: /a/\n")
    assert(Robots.allowed(tie, "x", "/a/page"), "tie -> Allow")
    // empty Disallow allows everything; hostile input never throws
    assert(Robots.allowed(
      Robots.parse("User-agent: *\nDisallow:\n"), "x", "/any"))
    assert(Robots.allowed(Robots.parse(null), "x", "/any"))
    assert(Robots.allowed(Robots.parse("::::\n#junk\nDisallow: /"), "x", "/p"),
      "rules before any User-agent line are ignored (RFC tolerance)")
    // mid-pattern wildcard
    val mid = Robots.parse("User-agent: *\nDisallow: /img/*/raw\n")
    assert(!Robots.allowed(mid, "x", "/img/2024/raw/full.jpg"))
    assert(Robots.allowed(mid, "x", "/img/2024/cooked.jpg"))
    // a literal '*' in the path at the star's cursor: the '*' branch
    // must win over literal equality so the star records its
    // backtrack point — otherwise the star silently consumes one
    // char and a later mismatch wrongly reports "allowed" (the
    // compliance-violating direction; ADVICE r15)
    // crawl-delay: the fixture's graftbot group declares 2; the *
    // fallback group none; unparsable and negative values ignore;
    // several winning groups merge by MAX (politeness-conservative)
    assert(Robots.crawlDelay(groups, "GraftBot/2.1").contains(2.0))
    assert(Robots.crawlDelay(groups, "SomeOther/1.0").isEmpty,
      "the * group declares no delay")
    val cd = Robots.parse(
      "User-agent: alpha\nCrawl-delay: junk\nUser-agent: beta\n" +
        "Crawl-delay: -3\nUser-agent: gamma\nCrawl-delay: 0.5\n" +
        "User-agent: gamma\nCrawl-delay: 4\n")
    assert(Robots.crawlDelay(cd, "alpha/1.0").isEmpty, "junk ignores")
    assert(Robots.crawlDelay(cd, "beta/1.0").isEmpty, "negative ignores")
    assert(Robots.crawlDelay(cd, "gamma/1.0").contains(4.0),
      "winning groups merge by max")
    assert(Robots.crawlDelay(Robots.parse(
        "User-agent: delta\nCrawl-delay: 4\nCrawl-delay: 1.5\n"),
        "delta/1.0").contains(4.0),
      "duplicate declarations INSIDE one group merge by max too " +
        "(r16 advice: one conflict, one politeness-conservative rule)")
    // review-caught: RFC 9309 treats an empty path as "/" — a
    // pathless site-root URL under a deny-all policy must DENY
    val denyAll = Robots.parse("User-agent: *\nDisallow: /\n")
    assert(!Robots.allowed(denyAll, "x", ""),
      "empty path means '/' (deny-all must deny the site root)")
    assert(!Robots.allowed(denyAll, "x", "?x=1"),
      "a bare query is rooted at '/'")
    val star = Robots.parse("User-agent: *\nDisallow: /*.tmp$\n")
    assert(!Robots.allowed(star, "x", "/*.tmpX.tmp"),
      "pattern '*' meeting a literal '*' must still backtrack")
    assert(!Robots.allowed(star, "x", "/a/b.tmp"))
    assert(Robots.allowed(star, "x", "/a/b.tmpX"))
    // since r16 the q143/q145 verdict arms ride the RobotsAllowed
    // expression: q143's whole plan is column-native — ZERO object
    // serde nodes (q145 keeps one typed map as its fixture injector)
    val q143Plan = WebQ.q143(spark, sf).queryExecution.optimizedPlan
    assert(q143Plan.collect {
      case d: org.apache.spark.sql.catalyst.plans.logical.DeserializeToObject => d
    }.isEmpty, "q143 must be fully column-native")
    // RFC 9309: rules match the path INCLUDING the query string, so a
    // $-anchored pattern is defeated by a trailing query (the q145
    // composition leans on exactly this)
    assert(!g("/cache/f.tmp"))
    assert(g("/cache/f.tmp?x=2"),
      "a query string must defeat the dollar end anchor")
  }

  test("Sitemap kernel: detection, namespace prefixes, truncated tail drops, protocol cap fences, decode") {
    import graft.functions.Sitemap
    assert(Sitemap.parse("prose mentioning urlset and <url> tags").isEmpty,
      "no root element in the sniff window -> not a sitemap")
    assert(Sitemap.parse(null).isEmpty)
    // namespace-prefixed elements parse (real generators emit them)
    val ns = """<?xml version="1.0"?><sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
      "<sm:url><sm:loc> https://n.example/x </sm:loc></sm:url></sm:urlset>"
    assert(Sitemap.parse(ns).get.map(_.loc) ==
      Vector("https://n.example/x"), "prefixes + loc trim")
    // truncated final entry drops; complete ones keep
    val cut = Sitemap.write(Seq(("https://a/1", None),
      ("https://a/2", None)))
    val truncated = cut.substring(0, cut.lastIndexOf("<url>") + 8)
    val kept = Sitemap.parse(truncated + "...").get
    assert(kept.map(_.loc) == Vector("https://a/1"))
    // the protocol's 50k cap fences WHOLE
    val big = Sitemap.write((0 until 50001).map(i =>
      (s"https://b/$i", None)))
    assert(Sitemap.parse(big).isEmpty, "past-cap file must fence whole")
    // entries with no loc drop; entity decode in loc
    val noLoc = "<urlset><url><lastmod>2024-01-01</lastmod></url>" +
      "<url><loc>https://c/?a=1&amp;b=2</loc></url></urlset>"
    assert(Sitemap.parse(noLoc).get.map(_.loc) ==
      Vector("https://c/?a=1&b=2"))
  }

  test("string-kernel fuzz: HtmlMeta/Sitemap/Robots never throw on mutated inputs") {
    val rnd = new scala.util.Random(0x9f15L)
    val seeds = Seq(
      graft.functions.HtmlMeta.write("T & T", "d<e>f", "/c?a=1",
        noindex = true, body = "fuzz body", variant = 1),
      graft.functions.Sitemap.write(Seq(("https://f/1&amp;", Some("2024-01-01")),
        ("https://f/2", None)), asIndex = false),
      WebQ.RobotsFixture)
    def mutate(s: String): String = rnd.nextInt(4) match {
      case 0 => // splice random chars (incl. control/unicode)
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) +
          new String(Array.fill(1 + rnd.nextInt(8))(
            rnd.nextInt(0xD7FF).toChar)) + s.substring(i)
      case 1 => s.substring(0, rnd.nextInt(s.length + 1)) // truncate
      case 2 => // duplicate a random slice (nesting/repeat stress)
        val a = rnd.nextInt(s.length + 1); val b = rnd.nextInt(s.length + 1)
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        s.substring(0, hi) + s.substring(lo, hi) + s.substring(hi)
      case _ => // flip chars to grammar-significant ones
        val chars = s.toCharArray
        (0 until 1 + rnd.nextInt(6)).foreach { _ =>
          if (chars.nonEmpty)
            chars(rnd.nextInt(chars.length)) = {
              val sig = "<>&;/:*$'=#"
              sig.charAt(rnd.nextInt(sig.length))
            }
        }
        new String(chars)
    }
    (0 until 600).foreach { i =>
      var x = seeds(i % seeds.length)
      (0 to rnd.nextInt(3)).foreach(_ => x = mutate(x))
      graft.functions.HtmlMeta.extract(x)
      graft.functions.Sitemap.parse(x)
      graft.functions.Robots.allowed(x, "GraftBot/2.1", "/a/b?c=1")
    }
  }

  test("review regressions: Turkish-I length hazard (HtmlMeta/Sitemap), Sitemap line must not split robots groups") {
    // U+0130 lowercases to TWO chars: any index computed in a lowered
    // copy misaligns against the original. Nine of them near the spans
    // previously threw StringIndexOutOfBounds / cross-attributed locs.
    val dotted = "\u0130" * 9
    val page = s"<html><head><script>var x = 1;</script>" +
      s"<title>$dotted title</title></head><body>b</body></html>"
    val m = graft.functions.HtmlMeta.extract(page)
    assert(m.title.contains(s"$dotted title"))
    val sm = graft.functions.Sitemap.write(Seq(
      (s"https://t.example/$dotted/a", None),
      ("https://t.example/plain", Some("2024-05-06"))))
    val es = graft.functions.Sitemap.parse(sm).get
    assert(es.map(_.loc) == Vector(s"https://t.example/$dotted/a",
      "https://t.example/plain"),
      "locs must come from the ORIGINAL string's spans")
    assert(es(1).lastmod.contains("2024-05-06"))
    // RFC 9309 tolerance: a Sitemap line between two User-agent lines
    // must NOT split them into separate groups (the first agent would
    // get an empty rule set = everything allowed)
    val g = graft.functions.Robots.parse(
      """User-agent: a
        |Sitemap: https://x.example/sitemap.xml
        |User-agent: b
        |Disallow: /
        |""".stripMargin)
    assert(!graft.functions.Robots.allowed(g, "a", "/anything"),
      "agent a must share the deny-all group despite the Sitemap line")
    assert(!graft.functions.Robots.allowed(g, "b", "/anything"))
  }
}
