package graft.functions

/** HTML document metadata — the crawl-intake fields a real pipeline
  * reads off every page BEFORE the text ever reaches the corpus:
  * `<title>` (retrieval/search display and a quality signal),
  * `<meta name=description>` (snippet text), `<link rel=canonical>`
  * (the URL-dedup key — canonical beats syntactic normalization
  * when the site declares it), and the `<meta name=robots>`
  * `noindex` directive (pages a pipeline honoring robots semantics
  * must drop from retrieval corpora). The reference tool never
  * parses markup (it ships CSV to a hosted API); a 100 TB web
  * pipeline reads these four fields off every HTML page it keeps.
  *
  * The scan is the single-pass tag walk of the markup-strip family
  * (no DOM, no regex backtracking): tags parsed once, attributes by
  * a quote-aware splitter (either quote style, any order, any
  * case), comments and CDATA skipped whole, entity decode on the
  * title/description values, whitespace collapsed. `<svg>`/
  * `<math>` subtrees are skipped whole — an SVG `<title>` is a
  * tooltip, not the document title. First occurrence wins for
  * title/description/canonical (the browser rule); robots
  * directives UNION across meta tags (any noindex anywhere means
  * noindex — the conservative read crawlers apply). Scan bounded to
  * the first [[ScanCap]] chars: every real page declares metadata
  * in `<head>`, and an unbounded scan of a 100 MB page buys
  * nothing.
  */
object HtmlMeta {

  final case class Meta(title: Option[String],
                        description: Option[String],
                        canonical: Option[String],
                        noindex: Boolean)

  /** Metadata lives in `<head>`; 256 KiB covers every real page's
    * head plus generous slack (the q76 bounded-scan rationale).
    */
  val ScanCap: Int = 256 * 1024

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi < 0 || semi - i > 12) { sb.append(c); i += 1 }
        else {
          val ent = s.substring(i + 1, semi)
          val out = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try new String(Character.toChars(
                Integer.parseInt(ent.substring(2), 16)))
              catch { case _: RuntimeException => null }
            case _ if ent.startsWith("#") =>
              try new String(Character.toChars(
                Integer.parseInt(ent.substring(1))))
              catch { case _: RuntimeException => null }
            case _ => null
          }
          if (out == null) { sb.append(c); i += 1 }
          else { sb.append(out); i = semi + 1 }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f')
        pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Attributes of one tag body (the text between the element name
    * and `>`): lowercased names → raw values, either quote style,
    * unquoted tokens, any order. Malformed tails are dropped, not
    * thrown on.
    */
  private def attrs(tag: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    val n = tag.length
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    while (i < n) {
      while (i < n && (ws(tag.charAt(i)) || tag.charAt(i) == '/')) i += 1
      val nameStart = i
      while (i < n && tag.charAt(i) != '=' && !ws(tag.charAt(i)) &&
             tag.charAt(i) != '/' && tag.charAt(i) != '>') i += 1
      if (i > nameStart) {
        val name = tag.substring(nameStart, i)
          .toLowerCase(java.util.Locale.ROOT)
        var j = i
        while (j < n && ws(tag.charAt(j))) j += 1
        if (j < n && tag.charAt(j) == '=') {
          j += 1
          while (j < n && ws(tag.charAt(j))) j += 1
          if (j < n && (tag.charAt(j) == '"' || tag.charAt(j) == '\'')) {
            val q = tag.charAt(j)
            val end = tag.indexOf(q, j + 1)
            if (end < 0) { out += name -> tag.substring(j + 1); i = n }
            else { out += name -> tag.substring(j + 1, end); i = end + 1 }
          } else {
            val vs = j
            while (j < n && !ws(tag.charAt(j)) && tag.charAt(j) != '>') j += 1
            out += name -> tag.substring(vs, j)
            i = j
          }
        } else {
          out += name -> ""
          i = j
        }
      } else i += 1
    }
    out.result()
  }

  /** Case-insensitive indexOf WITHOUT lowercasing the haystack:
    * `String.toLowerCase` can CHANGE LENGTH (U+0130 'İ' lowers to two
    * chars), so indices found in a lowered copy misalign against the
    * original — wrong spans, and an out-of-bounds substring on
    * pathological pages. regionMatches(ignoreCase) compares in place.
    * `needle` must be lowercase ASCII (tag names are).
    */
  private def indexOfIgnoreCase(s: String, needle: String,
                                from: Int): Int = {
    var i = math.max(0, from)
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** The four fields off one page's markup. Never throws — hostile
    * markup yields whatever evidence parsed cleanly.
    */
  def extract(html: String): Meta = {
    if (html == null) return Meta(None, None, None, noindex = false)
    val s = if (html.length > ScanCap) html.substring(0, ScanCap) else html
    var title: Option[String] = None
    var desc: Option[String] = None
    var canonical: Option[String] = None
    var noindex = false
    var i = 0
    val n = s.length
    var skipDepthTag: String = null // inside <svg>/<math>: skip whole
    var skipDepth = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = n
      else if (s.startsWith("<!--", lt)) {
        val end = s.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (s.startsWith("<![CDATA[", lt)) {
        val end = s.indexOf("]]>", lt + 9)
        i = if (end < 0) n else end + 3
      } else {
        val gt = s.indexOf('>', lt)
        if (gt < 0) i = n
        else {
          val closing = lt + 1 < n && s.charAt(lt + 1) == '/'
          val nameStart = if (closing) lt + 2 else lt + 1
          var e = nameStart
          while (e < gt && !" \t\n\r/".contains(s.charAt(e))) e += 1
          val name = s.substring(nameStart, e)
            .toLowerCase(java.util.Locale.ROOT)
          val selfClosed = s.charAt(gt - 1) == '/'
          if (skipDepth > 0) {
            if (name == skipDepthTag) {
              if (closing) skipDepth -= 1
              else if (!selfClosed) skipDepth += 1
              if (skipDepth == 0) skipDepthTag = null
            }
            i = gt + 1
          } else if (!closing && (name == "svg" || name == "math") &&
                     !selfClosed) {
            skipDepthTag = name; skipDepth = 1; i = gt + 1
          } else if (!closing && name == "title" && title.isEmpty &&
                     !selfClosed) {
            val close = indexOfIgnoreCase(s, "</title", gt + 1)
            if (close < 0) i = n
            else {
              val t = collapseWs(decodeEntities(
                s.substring(gt + 1, close))).trim
              if (t.nonEmpty) title = Some(t)
              i = s.indexOf('>', close) match {
                case -1 => n
                case x => x + 1
              }
            }
          } else if (!closing && name == "meta") {
            val a = attrs(s.substring(e, gt))
            val metaName = a.getOrElse("name", "")
              .toLowerCase(java.util.Locale.ROOT)
            if (metaName == "description" && desc.isEmpty)
              a.get("content").map(c =>
                collapseWs(decodeEntities(c)).trim).filter(_.nonEmpty)
                .foreach(v => desc = Some(v))
            if (metaName == "robots" || metaName == "googlebot")
              a.get("content").foreach { c =>
                if (c.toLowerCase(java.util.Locale.ROOT)
                    .split("[,\\s]+").contains("noindex")) noindex = true
              }
            i = gt + 1
          } else if (!closing && name == "link" && canonical.isEmpty) {
            val a = attrs(s.substring(e, gt))
            if (a.getOrElse("rel", "").toLowerCase(java.util.Locale.ROOT)
                .split("\\s+").contains("canonical"))
              a.get("href").map(_.trim).filter(_.nonEmpty)
                .foreach(v => canonical = Some(v))
            i = gt + 1
          } else if (!closing && (name == "script" || name == "style")) {
            // raw-text elements: a '<' inside them is content
            val close = indexOfIgnoreCase(s, "</" + name, gt + 1)
            i = if (close < 0) n else close
          } else i = gt + 1
        }
      }
    }
    Meta(title, desc, canonical, noindex)
  }

  // ---- writer (fixture generator) ----

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** A real page carrying the four fields plus the decoys the
    * scanner must survive: an HTML comment embedding a fake
    * `<title>`, an SVG `<title>` (a tooltip, not the document
    * title), a script containing markup-looking text, attribute
    * order/quote style flipped by `variant`.
    */
  def write(title: String, description: String, canonical: String,
            noindex: Boolean, body: String,
            variant: Int = 0): String = {
    val descAttr =
      if (variant % 2 == 0)
        s"""name="description" content="${esc(description)}""""
      else s"""content='${esc(description)}' name='description'"""
    val robots =
      if (noindex) """<meta name="robots" content="noindex, nofollow">"""
      else """<meta name="robots" content="index, follow">"""
    s"""<!DOCTYPE html>
       |<html><head>
       |<!-- <title>decoy in a comment</title> -->
       |<meta charset="utf-8">
       |<title>  ${esc(title)}  </title>
       |<meta $descAttr>
       |$robots
       |<link rel="canonical" href="${esc(canonical)}">
       |<script>var x = "<title>script decoy</title>";</script>
       |</head><body>
       |<svg viewBox="0 0 1 1"><title>svg tooltip decoy</title></svg>
       |<p>${esc(body)}</p>
       |</body></html>""".stripMargin
  }
}
