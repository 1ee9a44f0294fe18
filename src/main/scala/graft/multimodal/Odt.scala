package graft.multimodal

/** ODT (OpenDocument Text) extraction — the LibreOffice/OpenOffice
  * half of the office-document pair, same ZIP framing as [[Docx]]
  * with a different XML dialect: text lives DIRECTLY inside
  * `<text:p>`/`<text:h>` elements (through inline spans), whitespace
  * is ENCODED (`<text:s text:c="n"/>` for space runs, `<text:tab/>`,
  * `<text:line-break/>`), and the main part is always `content.xml`.
  *
  * Scan profile (the [[Docx]] discipline): bounded single pass, no
  * DOM, no entity resolution; paragraphs/headings close on their end
  * tags and join with NEWLINE; `text:s` expands to its declared
  * count (default 1); inline elements (`text:span`, `text:a`, …)
  * contribute their text transparently; `office:annotation` and
  * `text:tracked-changes` content drops (notes are not body prose).
  *
  * [[write]] is the identity-oracle writer: `mimetype` STORED first
  * (the ODF package rule, same as EPUB's OCF), manifest, and a
  * content.xml encoding space runs the way real writers do (first
  * space literal, the rest as `<text:s text:c>`), one `<text:p>` per
  * input line, TABs as `<text:tab/>`.
  */
object Odt {

  /** Document text, or None when the bytes are not a ZIP, carry no
    * `content.xml`, or its XML is structurally broken.
    */
  def extractText(zipBytes: Array[Byte]): Option[String] =
    extractText(new Zip.View(zipBytes))

  /** Shared-directory form (see [[Zip.View]]). */
  def extractText(zip: Zip.View): Option[String] =
    zip.extract("content.xml").flatMap(scanContent)

  /** Space runs a single `text:s` may expand to — the amplification
    * fence: a ~300-byte hostile content.xml declaring text:c in the
    * billions must neither throw (overflowing toInt) nor OOM the
    * task. No real document carries runs near this.
    */
  private val MaxSpaceRun = 65535

  private def attrInt(tag: String, name: String, dflt: Int): Int =
    ("\\b" + java.util.regex.Pattern.quote(name) + "\\s*=\\s*\"(\\d+)\"")
      .r.findFirstMatchIn(tag)
      .map { m =>
        val d = m.group(1)
        if (d.length > 9) MaxSpaceRun else math.min(d.toInt, MaxSpaceRun)
      }
      .getOrElse(dflt)

  private[multimodal] def scanContent(xmlBytes: Array[Byte]): Option[String] = {
    val xml = new String(xmlBytes, "UTF-8")
    val sb = new java.lang.StringBuilder(xml.length / 4)
    val paras = new java.lang.StringBuilder()
    var sawPara = false
    var nPara = 0
    var inP = 0   // text:p / text:h nesting
    var skip = 0  // annotation / tracked-changes nesting
    var i = 0
    val n = xml.length
    def closePara(): Unit = {
      if (sawPara) paras.append('\n')
      paras.append(sb)
      sb.setLength(0)
      sawPara = true
      nPara += 1
    }
    def capture = inP > 0 && skip == 0
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.startsWith("<![CDATA[", i)) {
          val end = xml.indexOf("]]>", i + 9)
          if (end < 0) return None
          if (capture) sb.append(xml, i + 9, end)
          i = end + 3
        } else if (xml.startsWith("<!--", i)) {
          val end = xml.indexOf("-->", i + 4)
          if (end < 0) return None
          i = end + 3
        } else {
          val end = xml.indexOf('>', i)
          if (end < 0) return None
          val tag = xml.substring(i + 1, end)
          var e = if (tag.startsWith("/")) 1 else 0
          while (e < tag.length && tag.charAt(e) != ' ' &&
                 tag.charAt(e) != '/' && tag.charAt(e) != '\t' &&
                 tag.charAt(e) != '\n' && tag.charAt(e) != '\r') e += 1
          val name = tag.substring(0, e)
          val selfClosed = tag.endsWith("/")
          name match {
            case "office:annotation" | "text:tracked-changes" =>
              if (!selfClosed) skip += 1
            case "/office:annotation" | "/text:tracked-changes" =>
              if (skip > 0) skip -= 1
            case "text:p" | "text:h" =>
              if (skip == 0) {
                if (selfClosed) closePara() else inP += 1
              }
            case "/text:p" | "/text:h" =>
              if (skip == 0 && inP > 0) { closePara(); inP -= 1 }
            case "text:tab" => if (capture) sb.append('\t')
            case "text:line-break" => if (capture) sb.append('\n')
            case "text:s" =>
              if (capture) {
                var k = attrInt(tag, "text:c", 1)
                while (k > 0) { sb.append(' '); k -= 1 }
              }
            case _ => () // spans/links/bookmarks: transparent
          }
          i = end + 1
        }
      } else if (c == '&') {
        val semi = xml.indexOf(';', i)
        if (semi < 0 || semi - i > 12) return None
        if (capture) {
          val ent = xml.substring(i + 1, semi)
          ent match {
            case "amp" => sb.append('&')
            case "lt" => sb.append('<')
            case "gt" => sb.append('>')
            case "quot" => sb.append('"')
            case "apos" => sb.append('\'')
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try sb.appendCodePoint(Integer.parseInt(ent.substring(2), 16))
              catch { case _: RuntimeException => return None }
            case _ if ent.startsWith("#") =>
              try sb.appendCodePoint(Integer.parseInt(ent.substring(1)))
              catch { case _: RuntimeException => return None }
            case _ => return None // content.xml is strict XML
          }
        }
        i = semi + 1
      } else {
        if (capture) sb.append(c)
        i += 1
      }
    }
    if (nPara == 0 && sb.length == 0) None // no body text at all: not
                                           // an ODT worth a corpus row
    else {
      if (sb.length > 0) closePara()
      Some(paras.toString)
    }
  }

  private def esc(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case ch => sb.append(ch)
      }
      i += 1
    }
  }

  /** One paragraph's markup: TAB runs as `<text:tab/>`, space runs
    * encoded first-literal-then-`text:s` (the real-writer layout the
    * extractor must invert).
    */
  private def para(line: String, sb: java.lang.StringBuilder): Unit = {
    sb.append("<text:p>")
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line.charAt(i)
      if (c == '\t') { sb.append("<text:tab/>"); i += 1 }
      else if (c == ' ') {
        var j = i
        while (j < n && line.charAt(j) == ' ') j += 1
        sb.append(' ')
        if (j - i > 1)
          sb.append("<text:s text:c=\"").append(j - i - 1).append("\"/>")
        i = j
      } else {
        var j = i
        while (j < n && line.charAt(j) != '\t' && line.charAt(j) != ' ') j += 1
        esc(line.substring(i, j), sb)
        i = j
      }
    }
    sb.append("</text:p>")
  }

  private val Manifest =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"><manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.text"/><manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/></manifest:manifest>"""
      .stripMargin

  /** A minimal-but-real package: stored `mimetype` first, manifest,
    * content.xml with one `<text:p>` per input line.
    */
  def write(text: String): Array[Byte] = {
    val c = new java.lang.StringBuilder(text.length * 2 + 256)
    c.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
    c.append("<office:document-content xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\">")
    c.append("<office:body><office:text>")
    text.split("\n", -1).foreach(para(_, c))
    c.append("</office:text></office:body></office:document-content>")
    Zip.write(Seq(
      ("mimetype",
        "application/vnd.oasis.opendocument.text".getBytes("UTF-8"), false),
      ("META-INF/manifest.xml", Manifest.getBytes("UTF-8"), true),
      ("content.xml", c.toString.getBytes("UTF-8"), true)))
  }
}
