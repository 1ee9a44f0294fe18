package graft.queries

import graft.Tables
import graft.functions.TextOps.{normText, tokens}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-web hygiene operators: the URL- and wordlist-level gates a
  * crawl-fed corpus pipeline runs alongside the text-level ones (q76
  * markup strip, q40 langId, q64 quality rules) — URL canonicalization
  * for URL-level dedup/blocklisting (the C4/RefinedWeb/Dolma intake
  * convention) and the C4 "bad words" content filter (Raffel et al.
  * 2020, arXiv:1910.10683 §2.2: pages containing any blocklisted word
  * are dropped whole).
  *
  * House rules apply ([[Q]]): string surgery is regex/substring
  * arithmetic both engines implement identically (no locale, no libm),
  * counts are BIGINT, fractions fixed-point nano-units — so the DuckDB
  * oracles are exact, character for character.
  */
object WebQ {

  private val Scale = 1000000000L

  /** Blocklisted registrable domains for q84 — interpolated into both
    * engines from this ONE definition (the SemDedupThreshold pattern).
    */
  val BlockedDomains: Seq[String] = Seq("example2.com", "example5.com")

  /** Blocklisted words for q85, drawn from the synthetic vocabulary so
    * the filter exercises real hits ("slow", "dup") plus one
    * never-occurring entry ("stale") proving absent terms cost nothing.
    */
  val BadWords: Seq[String] = Seq("slow", "dup", "stale")

  // ---- q84: URL canonicalization + domain blocklist ----

  /** URL normalization chain — moved to [[graft.functions.UrlOps]]
    * (the production [[graft.sources.WarcSource.frontierPlan]] face
    * composes it outside the query registry); kept as a forwarder so
    * the q84/q145 oracle faces read unchanged.
    */
  def urlNormalize(url: Column): Column =
    graft.functions.UrlOps.urlNormalize(url)

  /** q84: URL canonicalization + domain blocklist. The synthetic
    * corpus carries no URL column, so (the q52/q76 injection device)
    * the query first SYNTHESIZES a deterministically messy URL per doc
    * — mixed-case scheme and host, an optional `www.`, default and
    * non-default ports, `utm_*` tracking params interleaved with real
    * ones, an optional fragment, all derived from doc_id — then
    * normalizes it, so the oracle checks every normalization rule
    * character-for-character rather than a no-op. `is_blocked` is the
    * domain-blocklist verdict a crawl intake applies first.
    */
  def q84(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val sStr = (m: Column) => m.cast("string")
    val scheme = when(id % 3 === 0, "HTTP")
      .when(id % 3 === 1, "https").otherwise("HtTpS")
    val dirty = concat(
      scheme, lit("://"),
      when(id % 2 === 0, "WWW.").otherwise(""),
      lit("News"), sStr(id % 40), lit(".Example"), sStr(id % 7), lit(".COM"),
      when(id % 5 === 0, ":443").when(id % 5 === 1, ":80")
        .when(id % 5 === 2, ":8080").otherwise(""),
      // every 8th doc is a PATHLESS root URL — the canonicalizer must
      // emit "/" for it (r16 advice: without this the site root
      // escapes URL-level dedup)
      when(id % 8 === 7, "").otherwise(concat(lit("/art/"), sStr(id))),
      lit("?utm_source=feed"),
      when(id % 3 === 0, concat(lit("&id="), sStr(id))).otherwise(""),
      lit("&utm_campaign=x"),
      when(id % 6 < 3, "&ref=rss").otherwise(""),
      when(id % 4 === 0, "#top").otherwise(""))
    val u = urlNormalize(col("url"))
    Tables(s, dir).documents
      .select(id, dirty.as("url"))
      .select(id, col("url"), u.getField("url_norm").as("url_norm"),
        u.getField("host").as("host"), u.getField("domain").as("domain"),
        u.getField("n_tracking").as("n_tracking"))
      .withColumn("is_blocked",
        col("domain").isin(BlockedDomains: _*).cast("bigint"))
      .orderBy(id)
  }

  val q84Sql: String = {
    val blocked = BlockedDomains.map(d => s"'$d'").mkString(", ")
    s"""WITH dirty AS (
       |  SELECT doc_id,
       |    (CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
       |      ELSE 'HtTpS' END)
       |    || '://'
       |    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
       |    || 'News' || CAST(doc_id % 40 AS VARCHAR)
       |    || '.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
       |    || (CASE doc_id % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
       |        WHEN 2 THEN ':8080' ELSE '' END)
       |    || (CASE WHEN doc_id % 8 = 7 THEN ''
       |        ELSE '/art/' || CAST(doc_id AS VARCHAR) END)
       |    || '?utm_source=feed'
       |    || (CASE WHEN doc_id % 3 = 0
       |        THEN '&id=' || CAST(doc_id AS VARCHAR) ELSE '' END)
       |    || '&utm_campaign=x'
       |    || (CASE WHEN doc_id % 6 < 3 THEN '&ref=rss' ELSE '' END)
       |    || (CASE WHEN doc_id % 4 = 0 THEN '#top' ELSE '' END) AS url
       |  FROM documents),
       |parts AS (
       |  SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
       |    lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport,
       |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS pth,
       |    regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS qs
       |  FROM dirty),
       |norm AS (
       |  SELECT doc_id, url, scheme, pth,
       |    regexp_replace(regexp_replace(hostport, ':[0-9]+$$', ''),
       |      '^www\\.', '') AS host,
       |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
       |    list_filter(string_split(qs, '&'), p -> p <> '') AS params,
       |    list_filter(string_split(qs, '&'),
       |      p -> p <> '' AND substr(p, 1, 4) <> '${graft.functions.UrlOps.TrackPrefix}') AS kept
       |  FROM parts)
       |SELECT doc_id, url,
       |  scheme || '://' || host
       |    || (CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
       |          OR (scheme = 'https' AND port = '443'))
       |        THEN ':' || port ELSE '' END)
       |    || (CASE WHEN pth = '' THEN '/' ELSE pth END)
       |    || (CASE WHEN array_to_string(kept, '&') <> ''
       |        THEN '?' || array_to_string(kept, '&') ELSE '' END) AS url_norm,
       |  host,
       |  array_to_string(list_slice(string_split(host, '.'), -2, -1), '.')
       |    AS domain,
       |  CAST(len(params) - len(kept) AS BIGINT) AS n_tracking,
       |  CAST(array_to_string(list_slice(string_split(host, '.'), -2, -1), '.')
       |    IN ($blocked) AS BIGINT) AS is_blocked
       |FROM norm ORDER BY doc_id""".stripMargin
  }

  // ---- q85: C4 bad-words content filter ----

  /** Blocklisted-token count of a text column — the ONE definition of
    * "contains a bad word" shared by q85 and the CorpusPrep/Streams
    * wordlist gate (stateless, NULL-total: a NULL doc counts 0 hits).
    */
  def badWordCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(normText(coalesce(text, lit("")))),
      w => w.isin(words: _*))).cast("bigint")

  /** q85: wordlist content filter — per doc, how many tokens sit on
    * the blocklist and the C4 verdict (ANY hit ⇒ drop). Differs from
    * q64's quality RULES (threshold signals) in decision semantics:
    * this is the zero-tolerance list filter C4 applies verbatim.
    * NULL-total like q70/q71: text coalesces to '' first, so a NULL
    * doc gets a visible pass=1 row instead of vanishing.
    *
    * Scale shape: one codegen'd projection + the presentation sort —
    * the blocklist is a literal in the plan (a real list is a few
    * thousand words — still a literal array, or a broadcast join if it
    * ever outgrows the task binary).
    */
  def q85(s: SparkSession, dir: String): DataFrame = {
    val arr = tokens(normText(coalesce(col("text"), lit(""))))
    Tables(s, dir).documents
      .select(col("doc_id"),
        size(arr).cast("bigint").as("n_words"),
        badWordCount(col("text"), BadWords).as("n_bad"))
      .select(col("doc_id"), col("n_words"), col("n_bad"),
        expr(s"n_bad * ${Scale}L DIV n_words").as("bad_frac9"),
        (col("n_bad") === 0L).cast("bigint").as("pass"))
      .orderBy(col("doc_id"))
  }

  val q85Sql: String = {
    val bad = BadWords.map(w => s"'$w'").mkString(", ")
    s"""WITH arr AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))),
       |    '\\s+') AS a
       |  FROM documents),
       |sig AS (
       |  SELECT doc_id, CAST(len(a) AS BIGINT) AS n_words,
       |    CAST(len(list_filter(a, w -> list_contains([$bad], w)))
       |      AS BIGINT) AS n_bad
       |  FROM arr)
       |SELECT doc_id, n_words, n_bad,
       |  CAST(n_bad * $Scale // n_words AS BIGINT) AS bad_frac9,
       |  CAST(n_bad = 0 AS BIGINT) AS pass
       |FROM sig ORDER BY doc_id""".stripMargin
  }

  // ---- q89: link-graph PageRank (fixed-point, unrolled) ----

  /** PageRank geometry — ONE definition interpolated into both engines
    * (the SemDedupThreshold pattern). `PrNodes` is part of the edge
    * INJECTION (doc_id modulus), not a data-derived count: with ≥500
    * sequential doc_ids every residue class is populated, which the
    * spec asserts, so N is a constant of the synthetic graph exactly
    * like q84's host moduli.
    */
  val PrNodes = 101
  val PrIters = 6
  private val PrBase: Long = // (1-d)/N in nano-units, d = 0.85
    15L * Scale / (100L * PrNodes)

  /** q89: PageRank over a synthesized link graph — the web-graph
    * centrality signal crawl pipelines use for crawl scheduling and
    * quality weighting (the CommonCrawl harmonic/centrality ranking
    * role; Page et al. 1999). The corpus has no link column, so (the
    * q84 injection device) each doc contributes one deterministic
    * edge u → v between `PrNodes` site-nodes derived from doc_id;
    * multi-edges are real (a site linking twice counts twice), and
    * the modulus guarantees no dangling nodes at ≥500 docs (spec-
    * asserted; the operator itself is total either way via the left
    * join).
    *
    * Arithmetic is nano-unit fixed point, the q70/q86 discipline:
    * per-edge contribution is pr9 DIV outdeg, the damped update is
    * base + (85 · Σcontrib) DIV 100 with the multiply DECIMAL-widened
    * — both engines iterate to bit-identical BIGINT ranks, so the
    * oracle replays the SAME `PrIters` unrolled rounds rather than
    * "converges somewhere close".
    *
    * Scale shape: each round is one equi-join of the (nodes-sized)
    * rank vector against the edge list plus one keyed aggregate —
    * the classic distributed PageRank step. Ranks/degrees are
    * node-table-sized (≪ edges ≪ corpus); AQE broadcasts them while
    * they fit. Rounds are driver-unrolled like q37's k-means (6
    * shuffle-stage rounds, no driver data movement); a production
    * vocab-scale run would checkpoint every few rounds exactly as
    * q53 does.
    */
  def q89(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    val edges = docs.select(
      (col("doc_id") % PrNodes).as("u"),
      ((col("doc_id") * 31 + 7) % PrNodes).as("v"))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node"))).distinct()
    var r = nodes.withColumn("pr9", lit(Scale / PrNodes))
    for (_ <- 1 to PrIters) {
      val ins = edges.join(deg, "u")
        .join(r.withColumnRenamed("node", "u"), "u")
        .select(col("v"), expr("pr9 DIV deg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("ins"))
      r = nodes.join(ins, col("node") === col("v"), "left")
        .select(col("node"), expr(
          s"CAST($PrBase + CAST(coalesce(ins, 0) AS DECIMAL(38,0)) " +
            s"* 85 DIV 100 AS BIGINT)").as("pr9"))
    }
    r.orderBy(col("node"))
  }

  val q89Sql: String = {
    val base =
      s"""e AS (SELECT doc_id % $PrNodes AS u,
         |  (doc_id * 31 + 7) % $PrNodes AS v FROM documents),
         |deg AS (SELECT u, COUNT(*) AS deg FROM e GROUP BY u),
         |n AS (SELECT DISTINCT node FROM (
         |  SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)),
         |r0 AS (SELECT node, CAST(${Scale / PrNodes} AS BIGINT) AS pr9 FROM n)"""
        .stripMargin
    val rounds = (1 to PrIters).map { k =>
      s"""r$k AS (
         |  SELECT n.node,
         |    CAST($PrBase + CAST(coalesce(s.ins, 0) AS HUGEINT)
         |      * 85 // 100 AS BIGINT) AS pr9
         |  FROM n LEFT JOIN (
         |    SELECT e.v, SUM(r.pr9 // deg.deg) AS ins
         |    FROM e JOIN deg USING (u) JOIN r${k - 1} r ON r.node = e.u
         |    GROUP BY e.v) s ON s.v = n.node)""".stripMargin
    }.mkString(",\n")
    s"WITH $base,\n$rounds\nSELECT node, pr9 FROM r$PrIters ORDER BY node"
  }

  // ---- q90: Unicode NFC canonicalization ----

  /** q90: Unicode canonical composition (NFC) — the canonicalization
    * a multilingual corpus runs BEFORE every digest: "é" as
    * e + COMBINING ACUTE versus precomposed "é" is the same text to a
    * reader but different bytes to md5Lower64, so canonically-equal
    * near-copies silently survive exact dedup without this pass. The
    * ASCII synthetic corpus normalizes to itself, so (the q84/q76
    * injection device) each doc gets a deterministic multilingual
    * suffix — decomposed accents, a precomposed control, the
    * ANGSTROM SIGN singleton (U+212B composes to U+00C5 with the
    * codepoint count unchanged), or pure ASCII — and the oracle
    * compares the normalized strings char-for-char (JDK Normalizer vs
    * DuckDB's utf8proc, two independent implementations of UAX #15).
    *
    * Scale shape: one projection through the native [[graft.functions
    * .expressions.TextExprs.nfcNormalize]] kernel (with an
    * isNormalized fast path — ASCII rows allocate nothing) + the
    * presentation sort. No join, no aggregate.
    */
  def q90(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val suffix = when(id % 4 === 0, " cafe\u0301")        // e + COMBINING ACUTE
      .when(id % 4 === 1, " caf\u00e9")         // precomposed, NFC no-op
      .when(id % 4 === 2, " \u212Bngstr\u00f6m") // ANGSTROM SIGN composes to U+00C5
      .otherwise(" ascii")
    val dirty = concat(coalesce(col("text"), lit("")), suffix)
    val norm = graft.functions.expressions.TextExprs.nfcNormalize(col("dirty"))
    Tables(s, dir).documents
      .select(id, dirty.as("dirty"))
      .select(id,
        length(col("dirty")).cast("bigint").as("n_cp_before"),
        length(norm).cast("bigint").as("n_cp_after"),
        (norm =!= col("dirty")).cast("bigint").as("changed"),
        norm.as("text_nfc"))
      .orderBy(id)
  }

  val q90Sql: String =
    """WITH dirtied AS (
      |  SELECT doc_id, coalesce(text, '') ||
      |    (CASE doc_id % 4
      |      WHEN 0 THEN ' cafe' || chr(769)
      |      WHEN 1 THEN ' caf' || chr(233)
      |      WHEN 2 THEN ' ' || chr(8491) || 'ngstr' || chr(246) || 'm'
      |      ELSE ' ascii' END) AS dirty
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(dirty) AS BIGINT) AS n_cp_before,
      |  CAST(length(nfc_normalize(dirty)) AS BIGINT) AS n_cp_after,
      |  CAST(nfc_normalize(dirty) <> dirty AS BIGINT) AS changed,
      |  nfc_normalize(dirty) AS text_nfc
      |FROM dirtied ORDER BY doc_id""".stripMargin

  /** q142: HTML CRAWL-METADATA extraction in the oracle-checked
    * path — title / meta description / canonical URL / robots
    * noindex, the four fields a web pipeline reads off every page
    * it keeps (canonical is the URL-dedup key when the site
    * declares one; noindex pages drop from retrieval corpora). Per
    * doc_id a REAL page is built ([[graft.functions.HtmlMeta
    * .write]] — comment/SVG/script decoys, entity-escaped values,
    * attribute order and quote style flipped by parity) with
    * closed-form fields, then the [[graft.functions.expressions
    * .TextExprs.htmlMeta]] expression must read them back through
    * the real scanner. The oracle recomputes the fields from doc_id
    * arithmetic — decoy-resistance and entity decode are what the
    * hash actually checks.
    */
  def q142(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pages = Tables(s, dir).documents
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        def pmod(m: Long): Long = ((id % m) + m) % m
        val html = graft.functions.HtmlMeta.write(
          title = s"Corpus Document $id",
          description = s"Summary & overview #$id",
          canonical = s"https://example.org/docs/${pmod(100)}",
          noindex = pmod(7) == 0,
          body = t,
          variant = pmod(2).toInt)
        (id, html)
      }
      .toDF("doc_id", "html")
    val m = graft.functions.expressions.TextExprs.htmlMeta(col("html"))
    pages
      .select(col("doc_id"), m.as("m"))
      .select(col("doc_id"),
        col("m.title").as("title"),
        col("m.description").as("description"),
        col("m.canonical").as("canonical"),
        col("m.noindex").as("noindex"))
      .orderBy(col("doc_id"))
  }

  val q142Sql: String =
    """SELECT doc_id,
      |  'Corpus Document ' || doc_id AS title,
      |  'Summary & overview #' || doc_id AS description,
      |  'https://example.org/docs/' || (((doc_id % 100) + 100) % 100)
      |    AS canonical,
      |  ((doc_id % 7) + 7) % 7 = 0 AS noindex
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The q143 policy file — every RFC 9309 feature the evaluator
    * claims, in one fixture: specific-agent group with prefix rules,
    * a longer Allow overriding a Disallow, a `*`+`$` pattern, an
    * ignored unknown key inside the group, and a deny-all fallback
    * group for everyone else.
    */
  private[graft] val RobotsFixture: String =
    """# crawl policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.tmp$
      |Crawl-delay: 2
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  /** The q145 policy file — [[RobotsFixture]]'s rule table plus a
    * crawl-rate table that exercises every Crawl-delay semantic under
    * the oracle: a DUPLICATE declaration inside one group (4 then 1.5
    * — must merge to max 4, not last-wins 1.5), a SECOND group with
    * the same token (3.5 — cross-group max keeps 4), a specific agent
    * whose groups declare NO delay (quietbot → NULL), and a delay on
    * the `*` fallback group (0.5 — fractional, so the ms fixed-point
    * arm is non-trivial). The extra graftbot group carries no rules,
    * so the allow/deny table is exactly [[RobotsFixture]]'s.
    */
  private[graft] val FrontierRobotsFixture: String =
    """# crawl policy with rate limits
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.tmp$
      |Crawl-delay: 4
      |Crawl-delay: 1.5
      |
      |User-agent: graftbot
      |Crawl-delay: 3.5
      |
      |User-agent: quietbot
      |Disallow: /q/
      |
      |User-agent: *
      |Disallow: /
      |Crawl-delay: 0.5
      |""".stripMargin

  /** q143: ROBOTS.TXT EVALUATION in the oracle-checked path — the
    * crawl-politeness gate (RFC 9309): a pipeline honoring robots
    * semantics re-evaluates allow/deny for every (agent, url) it
    * kept, at intake and RETROACTIVELY (sites change their policy;
    * takedowns cite it). Per doc_id a (agent, path) pair drawn from
    * a closed form exercises group selection (specific token vs the
    * `*` fallback), longest-match specificity (a longer Allow
    * overriding a Disallow), `*` wildcards, the `$` end anchor
    * (including the must-NOT-match tail case), and the
    * prefix-semantics corner (`/private` vs `/private/`). The
    * oracle recomputes the verdicts from doc_id arithmetic — the
    * hash only matches if every semantic above is implemented
    * exactly ([[graft.functions.Robots]]).
    */
  def q143(s: SparkSession, dir: String): DataFrame = {
    // fully column-native since r16: the fixture (agent, path) pairs
    // are CASE arithmetic over doc_id and the verdict is the
    // RobotsAllowed expression — one codegen'd projection, no serde
    // boundary anywhere in the query
    val T = graft.functions.expressions.TextExprs
    def pmod(m: Int): Column =
      ((col("doc_id") % m) + m) % m
    val agent = when(pmod(5) === 0, "OtherBot/1.0")
      .otherwise("GraftBot/2.1 (+https://example.org/bot)")
    val path = when(pmod(6) === 0, "/private/page")
      .when(pmod(6) === 1, "/private/public/x")
      .when(pmod(6) === 2, "/cache/f.tmp")
      .when(pmod(6) === 3, "/cache/f.tmp.html")
      .when(pmod(6) === 4, "/open/page")
      .otherwise("/private")
    Tables(s, dir).documents
      .select(col("doc_id"), agent.as("agent"), path.as("path"))
      .withColumn("allowed",
        T.robotsAllowed(lit(RobotsFixture), col("agent"), col("path")))
      .orderBy(col("doc_id"))
  }

  val q143Sql: String =
    """SELECT doc_id,
      |  CASE WHEN ((doc_id % 5) + 5) % 5 = 0 THEN 'OtherBot/1.0'
      |    ELSE 'GraftBot/2.1 (+https://example.org/bot)' END AS agent,
      |  CASE ((doc_id % 6) + 6) % 6
      |    WHEN 0 THEN '/private/page'
      |    WHEN 1 THEN '/private/public/x'
      |    WHEN 2 THEN '/cache/f.tmp'
      |    WHEN 3 THEN '/cache/f.tmp.html'
      |    WHEN 4 THEN '/open/page'
      |    ELSE '/private' END AS path,
      |  ((doc_id % 5) + 5) % 5 <> 0 AND
      |    ((doc_id % 6) + 6) % 6 IN (1, 3, 4, 5) AS allowed
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q144: SITEMAP PARSING in the oracle-checked path — the
    * crawl-frontier read ([[graft.functions.Sitemap]]): per doc_id a
    * REAL sitemap (urlset, or a sitemapindex on every 4th id — the
    * `from_index` flag the scheduler branches on) with 1 + pmod(5)
    * closed-form entries, lastmod present on even ids, an
    * entity-escaped `&` in every loc (the protocol requires escaped
    * URLs — decode is what the hash checks); parsed back through the
    * [[graft.functions.expressions.TextExprs.sitemapEntries]]
    * expression and exploded to per-URL rows. The DuckDB oracle
    * regenerates the rows with a LATERAL range — entry COUNT, order,
    * decoded loc, optional lastmod and the index flag all must
    * match.
    */
  def q144(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pages = Tables(s, dir).documents
      .select(col("doc_id")).as[Long]
      .map { id =>
        def pmod(m: Long): Long = ((id % m) + m) % m
        val n = (1 + pmod(5)).toInt
        val entries = (0 until n).map { i =>
          (s"https://s.example/${id}/p$i?a=1&b=2",
            if (pmod(2) == 0) Some(s"2024-03-0${1 + (i % 9)}") else None)
        }
        (id, graft.functions.Sitemap.write(entries,
          asIndex = pmod(4) == 0))
      }
      .toDF("doc_id", "xml")
    pages
      .select(col("doc_id"),
        posexplode(graft.functions.expressions.TextExprs
          .sitemapEntries(col("xml"))).as(Seq("ord", "e")))
      .select(col("doc_id"), col("ord").cast("long").as("ord"),
        col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
        col("e.from_index").as("from_index"))
      .orderBy(col("doc_id"), col("ord"))
  }

  val q144Sql: String =
    """SELECT d.doc_id, gs.i AS ord,
      |  'https://s.example/' || d.doc_id || '/p' || gs.i || '?a=1&b=2'
      |    AS loc,
      |  CASE WHEN ((d.doc_id % 2) + 2) % 2 = 0
      |    THEN '2024-03-0' || (1 + gs.i % 9) ELSE NULL END AS lastmod,
      |  ((d.doc_id % 4) + 4) % 4 = 0 AS from_index
      |FROM documents d,
      |  LATERAL (SELECT unnest(generate_series(0,
      |    CAST(((d.doc_id % 5) + 5) % 5 AS BIGINT))) AS i) gs
      |ORDER BY doc_id, ord""".stripMargin

  /** q145: the CRAWL-FRONTIER PLAN — the end-to-end composition a
    * refresh scheduler actually runs, with every stage the REAL
    * operator: per doc a sitemap ([[graft.functions.Sitemap.write]])
    * whose entry paths cycle q143's policy table and whose query
    * strings carry a utm tracking parameter; the
    * [[graft.functions.expressions.TextExprs.sitemapEntries]]
    * expression explodes the URLs, [[urlNormalize]] canonicalizes
    * them (tracking param dropped, real params kept), and
    * [[graft.functions.Robots]] issues the fetch verdict per
    * normalized path under the same policy file, and (r16 verdict
    * ask) the [[graft.functions.expressions.TextExprs.robotsCrawlDelay]]
    * arm issues the politeness rate — the agent cycles three
    * identities per doc so the delay column exercises the specific
    * group (within- and cross-group max-merge → 4 s), the
    * no-declaration NULL (quietbot) and the `*` fallback (0.5 s),
    * fixed-pointed to BIGINT milliseconds for an exact hash. One
    * frame: (doc_id, ord, url_norm, n_tracking, agent, allowed,
    * crawl_delay_ms) — discover → canonicalize → police → rate-limit,
    * each stage verified by the one oracle.
    */
  def q145(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val paths = IndexedSeq("/private/page", "/private/public/x",
      "/cache/f.tmp", "/cache/f.tmp.html", "/open/page", "/private")
    val pages = Tables(s, dir).documents
      .select(col("doc_id")).as[Long]
      .map { id =>
        def pmod(m: Long): Long = ((id % m) + m) % m
        val n = (1 + pmod(5)).toInt
        val entries = (0 until n).map { i =>
          // the `$`-anchored policy case (i%6==2) keeps a bare path:
          // per RFC 9309 the rule matches path INCLUDING query, so a
          // trailing "?x=2" would defeat the anchor — that behavior
          // is exercised by the spec; the oracle here pins the anchor
          val q = if (i % 6 == 2) "" else s"?utm_src=feed&x=$i"
          (s"https://Site.example${paths(i % 6)}$q", None)
        }
        (id, graft.functions.Sitemap.write(entries))
      }
      .toDF("doc_id", "xml")
    val exploded = pages
      .select(col("doc_id"),
        posexplode(graft.functions.expressions.TextExprs
          .sitemapEntries(col("xml"))).as(Seq("ord", "e")))
      .select(col("doc_id"), col("ord").cast("long").as("ord"),
        col("e.loc").as("loc"))
    // the verdict runs on the REAL normalized path (the scheduler
    // contract: police what you would fetch, not what was listed) —
    // column-native since r16: the RobotsAllowed expression replaces
    // the typed Dataset.map, so discover → canonicalize → police is
    // one codegen'd projection end-to-end after the fixture inject
    val T = graft.functions.expressions.TextExprs
    val u = urlNormalize(col("loc"))
    val pm5 = ((col("doc_id") % 5) + 5) % 5
    val agent = when(pm5 === 0, "OtherBot/1.0")
      .when(pm5 === 1, "QuietBot/1.9")
      .otherwise("GraftBot/2.1")
    exploded
      .select(col("doc_id"), col("ord"),
        u.getField("url_norm").as("url_norm"),
        u.getField("n_tracking").as("n_tracking"),
        agent.as("agent"))
      .withColumn("allowed",
        T.robotsAllowed(lit(FrontierRobotsFixture), col("agent"),
          regexp_replace(col("url_norm"), "^[a-z]+://[^/]+", "")))
      .withColumn("crawl_delay_ms",
        (T.robotsCrawlDelay(lit(FrontierRobotsFixture), col("agent"))
          * lit(1000)).cast("long"))
      .orderBy(col("doc_id"), col("ord"))
  }

  val q145Sql: String =
    """SELECT d.doc_id, gs.i AS ord,
      |  'https://site.example' ||
      |    (CASE gs.i % 6
      |      WHEN 0 THEN '/private/page'
      |      WHEN 1 THEN '/private/public/x'
      |      WHEN 2 THEN '/cache/f.tmp'
      |      WHEN 3 THEN '/cache/f.tmp.html'
      |      WHEN 4 THEN '/open/page'
      |      ELSE '/private' END) ||
      |    (CASE WHEN gs.i % 6 = 2 THEN '' ELSE '?x=' || gs.i END)
      |    AS url_norm,
      |  CAST(CASE WHEN gs.i % 6 = 2 THEN 0 ELSE 1 END AS BIGINT)
      |    AS n_tracking,
      |  CASE ((d.doc_id % 5) + 5) % 5
      |    WHEN 0 THEN 'OtherBot/1.0'
      |    WHEN 1 THEN 'QuietBot/1.9'
      |    ELSE 'GraftBot/2.1' END AS agent,
      |  CASE ((d.doc_id % 5) + 5) % 5
      |    WHEN 0 THEN FALSE
      |    WHEN 1 THEN TRUE
      |    ELSE gs.i % 6 IN (1, 3, 4, 5) END AS allowed,
      |  CAST(CASE ((d.doc_id % 5) + 5) % 5
      |    WHEN 0 THEN 500
      |    WHEN 1 THEN NULL
      |    ELSE 4000 END AS BIGINT) AS crawl_delay_ms
      |FROM documents d,
      |  LATERAL (SELECT unnest(generate_series(0,
      |    CAST(((d.doc_id % 5) + 5) % 5 AS BIGINT))) AS i) gs
      |ORDER BY doc_id, ord""".stripMargin

  /** q146: CANONICAL-URL DEDUP in the oracle-checked path — the
    * crawl-intake stage [[graft.pipeline.CorpusPrep.urlDedup]] runs
    * for real (q30's keep-lowest convention on the URL axis). Per
    * doc_id a deterministically MESSY url variant (the q84 injection
    * device): doc_ids sharing a group key g carry utm-tracking /
    * www. / default-port / case variants of ONE canonical URL, so
    * several docs normalize to the same `url_norm` and the stage
    * must keep exactly the lowest doc_id of each group. The DuckDB
    * oracle replays the normalize rule as a closed form and the keep
    * rule as a window min — the hash only matches if the engine's
    * normalization produces exactly the canonical string AND the
    * keep-lowest semantics hold.
    */
  def q146(s: SparkSession, dir: String): DataFrame = {
    // group key and variant are BOTH pmods — no integer division
    // anywhere (Spark `div` truncates, DuckDB `//` floors: they
    // disagree on negative ids, and md5-derived ids go negative)
    val v = ((col("doc_id") % 3) + 3) % 3
    val gs = (((col("doc_id") % 4096) + 4096) % 4096).cast("string")
    val url = when(v === 0,
        concat(lit("https://site"), gs, lit(".example/p?a=1")))
      .when(v === 1,
        concat(lit("https://WWW.site"), gs,
          lit(".example:443/p?utm_s=x&a=1")))
      .otherwise(
        concat(lit("https://site"), gs, lit(".example/p?a=1&utm_c=y")))
    val u = urlNormalize(col("url"))
    graft.pipeline.CorpusPrep.urlDedup(
        Tables(s, dir).documents.select(col("doc_id"), url.as("url")))
      .select(col("doc_id"), col("url"),
        u.getField("url_norm").as("url_norm"))
      .orderBy(col("doc_id"))
  }

  val q146Sql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE ((doc_id % 3) + 3) % 3
      |      WHEN 0 THEN 'https://site' || g || '.example/p?a=1'
      |      WHEN 1 THEN 'https://WWW.site' || g ||
      |        '.example:443/p?utm_s=x&a=1'
      |      ELSE 'https://site' || g || '.example/p?a=1&utm_c=y'
      |    END AS url,
      |    'https://site' || g || '.example/p?a=1' AS url_norm
      |  FROM (SELECT doc_id,
      |          CAST(((doc_id % 4096) + 4096) % 4096 AS BIGINT) AS g
      |        FROM documents))
      |SELECT doc_id, url, url_norm FROM (
      |  SELECT doc_id, url, url_norm,
      |    MIN(doc_id) OVER (PARTITION BY url_norm) AS lo FROM u)
      |WHERE doc_id = lo ORDER BY doc_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q84_url_normalize", q84, Some(q84Sql)),
    Entry("q85_badwords", q85, Some(q85Sql)),
    Entry("q89_pagerank", q89, Some(q89Sql)),
    Entry("q90_unicode_nfc", q90, Some(q90Sql)),
    Entry("q142_html_meta", q142, Some(q142Sql)),
    Entry("q143_robots_eval", q143, Some(q143Sql)),
    Entry("q144_sitemap", q144, Some(q144Sql)),
    Entry("q145_frontier_plan", q145, Some(q145Sql)),
    Entry("q146_url_dedup", q146, Some(q146Sql)))
}
