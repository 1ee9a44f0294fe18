package graft.functions

/** Sitemap parsing (sitemaps.org protocol) — the crawl-frontier
  * operator: a web pipeline discovers most of what it fetches
  * through `<urlset>` sitemaps and `<sitemapindex>` files (robots
  * `Sitemap:` lines point at them, and [[Robots]] tolerates those
  * lines for exactly this hand-off). The intake already ingests a
  * served `sitemap.xml.gz` as TEXT (the decompress arm); this is
  * the STRUCTURED read — per-URL rows a frontier/refresh scheduler
  * can join against the crawl.
  *
  * Profile (the protocol subset real sitemaps use):
  *   - Detection before parsing: a root `<urlset` or `<sitemapindex`
  *     element inside the first [[SniffWindow]] chars (past BOM/XML
  *     decl/comments) — anything else is NOT a sitemap and parses to
  *     None, so prose mentioning "urlset" never sheds fake URLs.
  *   - `<url><loc>…</loc><lastmod>…</lastmod></url>` entries in
  *     document order; `<sitemap><loc>` entries from an index file
  *     flagged `fromIndex` (the caller fetches those, it does not
  *     crawl them).
  *   - `<loc>` values entity-decoded and trimmed (the protocol
  *     requires entity-escaped URLs); empty/absent loc drops the
  *     entry; lastmod optional, kept verbatim (W3C datetime —
  *     downstream parses what it needs).
  *   - The protocol's own cap: 50,000 entries per file — past it the
  *     file fences WHOLE (None, the no-silent-caps rule; a lying
  *     giant is hostile, not big).
  */
object Sitemap {

  final case class Entry(loc: String, lastmod: Option[String],
                         fromIndex: Boolean)

  /** Root-element sniff window. */
  val SniffWindow: Int = 2048

  /** The protocol's own per-file cap. */
  val MaxEntries: Int = 50000

  private def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s.trim
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
    sb.toString.trim
  }

  /** The text of the first `<tag>…</tag>` inside [from, until), or
    * None — namespace-prefix tolerant (`<sm:loc>` matches `loc`).
    */
  private def elementText(s: String, tag: String, from: Int,
                          until: Int): Option[String] = {
    var i = from
    while (i < until) {
      val lt = s.indexOf('<', i)
      if (lt < 0 || lt >= until) return None
      val gt = s.indexOf('>', lt)
      if (gt < 0 || gt >= until) return None
      val name = s.substring(lt + 1, gt).takeWhile(c =>
        c != ' ' && c != '\t' && c != '\n' && c != '\r' && c != '/')
      val local = name.substring(name.indexOf(':') + 1)
        .toLowerCase(java.util.Locale.ROOT)
      if (local == tag && !name.startsWith("/")) {
        val close = s.indexOf("</", gt)
        if (close < 0 || close > until) return None
        return Some(s.substring(gt + 1, close))
      }
      i = gt + 1
    }
    None
  }

  /** Entries of one sitemap document, or None when the text is not
    * a sitemap (no root element in the sniff window) or lies past
    * the protocol cap.
    */
  /** Local (prefix-stripped, lowercased) name of the tag at `lt`,
    * with its '>' position — closing names prefixed '/'. Only the
    * extracted NAME is lowercased: lowering the whole document can
    * change its length (U+0130 lowers to two chars) and misalign
    * every index against the original string.
    */
  private def tagAt(s: String, lt: Int): Option[(String, Int)] = {
    val gt = s.indexOf('>', lt)
    if (gt < 0) return None
    val closing = lt + 1 < s.length && s.charAt(lt + 1) == '/'
    val from = if (closing) lt + 2 else lt + 1
    var e = from
    while (e < gt && !" \t\n\r/".contains(s.charAt(e))) e += 1
    val name = s.substring(from, e)
    val local = name.substring(name.indexOf(':') + 1)
      .toLowerCase(java.util.Locale.ROOT)
    Some(((if (closing) "/" else "") + local, gt))
  }

  def parse(xml: String): Option[Vector[Entry]] = {
    if (xml == null) return None
    // root sniff, namespace-prefix tolerant: the first tags of the
    // window must include a urlset/sitemapindex ELEMENT
    var isIndex = false
    var isUrlset = false
    var w = 0
    val windowEnd = math.min(xml.length, SniffWindow)
    while (!isIndex && !isUrlset && w < windowEnd) {
      val lt = xml.indexOf('<', w)
      if (lt < 0 || lt >= windowEnd) w = windowEnd
      else tagAt(xml, lt) match {
        case Some((name, gt)) =>
          if (name == "urlset") isUrlset = true
          else if (name == "sitemapindex") isIndex = true
          w = gt + 1
        case None => w = windowEnd
      }
    }
    if (!isIndex && !isUrlset) return None
    val item = if (isIndex) "sitemap" else "url"
    val out = Vector.newBuilder[Entry]
    var i = 0
    var n = 0
    var going = true
    while (going) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) going = false
      else tagAt(xml, lt) match {
        case None => going = false // cut tag at EOF: drop the tail
        case Some((name, gt)) =>
          if (name != item) i = gt + 1
          else {
            // the matching close: the entries of both formats do not
            // nest, so the next </item> closes this one
            var close = -1
            var c = gt + 1
            while (close < 0 && c >= 0) {
              val nlt = xml.indexOf('<', c)
              if (nlt < 0) c = -1
              else tagAt(xml, nlt) match {
                case Some((cn, cgt)) =>
                  if (cn == "/" + item) close = nlt else c = cgt + 1
                case None => c = -1
              }
            }
            if (close < 0) going = false // truncated final entry: drop
            else {
              n += 1
              if (n > MaxEntries) return None // protocol cap: fence
              val loc = elementText(xml, "loc", gt + 1, close)
                .map(decode).filter(_.nonEmpty)
              val lastmod = elementText(xml, "lastmod", gt + 1, close)
                .map(_.trim).filter(_.nonEmpty)
              loc.foreach(l => out += Entry(l, lastmod, isIndex))
              i = close + 1
            }
          }
      }
    }
    Some(out.result())
  }

  // ---- writer (fixture generator) ----

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** A real sitemap (or index when `asIndex`): XML decl, namespace,
    * one entry per (loc, lastmod).
    */
  def write(entries: Seq[(String, Option[String])],
            asIndex: Boolean = false): String = {
    val (root, item) =
      if (asIndex) ("sitemapindex", "sitemap") else ("urlset", "url")
    val sb = new java.lang.StringBuilder(256)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(s"""<$root xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""")
    entries.foreach { case (loc, lastmod) =>
      sb.append(s"<$item><loc>").append(esc(loc)).append("</loc>")
      lastmod.foreach(lm =>
        sb.append("<lastmod>").append(esc(lm)).append("</lastmod>"))
      sb.append(s"</$item>")
    }
    sb.append(s"</$root>")
    sb.toString
  }
}
