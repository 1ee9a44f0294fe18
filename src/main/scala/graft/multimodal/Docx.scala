package graft.multimodal

/** DOCX (WordprocessingML) text extraction — the office-document
  * analogue of [[PdfText]]: crawls serve .docx steadily (reports,
  * syllabi, government forms) and the text otherwise rots in the
  * media face as an opaque ZIP. The reference tool never opens
  * documents (it ships CSVs to a hosted API — import.js:49-88);
  * a corpus pipeline mines exactly this text.
  *
  * Profile:
  *   - The main part is resolved through the REAL container grammar:
  *     `_rels/.rels` → the officeDocument relationship's Target
  *     (fallback `word/document.xml` when the rels part is absent or
  *     unparseable — the overwhelming real-world path anyway).
  *   - The XML scan is a bounded single pass (no DOM, no external
  *     entities — nothing is resolved, so XXE is structurally
  *     impossible): text inside `<w:t>` elements, `<w:tab/>` → TAB,
  *     `<w:br/>`/`<w:cr/>` → NEWLINE, paragraphs (`</w:p>`) joined
  *     with NEWLINE. Field instructions (`<w:instrText>`) and
  *     everything else contribute nothing.
  *   - Entities: the five XML built-ins + decimal/hex char refs;
  *     CDATA sections pass through verbatim.
  *
  * [[write]] is the fixture generator and the identity-oracle writer
  * (q129): a minimal REAL container — `[Content_Types].xml`,
  * `_rels/.rels`, `word/document.xml` — with one `<w:p>` per input
  * line, TABs as `<w:tab/>` runs, `xml:space="preserve"` on every
  * run, and XML escaping, so extract(write(t)) == t for any text
  * free of C0 controls other than TAB/NEWLINE (XML 1.0 cannot carry
  * the rest in any encoding).
  */
object Docx {

  private val MainFallback = "word/document.xml"

  /** The officeDocument part name from `_rels/.rels`, normalized
    * (leading "/" stripped); the standard path when rels are absent.
    */
  private[multimodal] def mainPart(zip: Zip.View): String =
    zip.extract("_rels/.rels").flatMap { rels =>
      val xml = new String(rels, "UTF-8")
      // one Relationship element whose Type ends /officeDocument;
      // attribute order varies, so match per-element
      val rel = "<Relationship\\b[^>]*>".r.findAllIn(xml).find(el =>
        "\\bType\\s*=\\s*\"[^\"]*/officeDocument\"".r
          .findFirstIn(el).isDefined)
      rel.flatMap(el =>
        "\\bTarget\\s*=\\s*\"([^\"]+)\"".r.findFirstMatchIn(el)
          .map(_.group(1).stripPrefix("/")))
    }.getOrElse(MainFallback)

  /** Text of a .docx payload, or None when the bytes are not a ZIP,
    * the main part is missing/corrupt, or its XML is structurally
    * broken (unterminated tag/entity scan overruns).
    */
  def extractText(zipBytes: Array[Byte]): Option[String] =
    extractText(new Zip.View(zipBytes))

  /** Shared-directory form — the office dispatch parses the central
    * directory once and hands every dialect the same view.
    */
  def extractText(zip: Zip.View): Option[String] =
    zip.extract(mainPart(zip)).flatMap(scanXml)

  /** Single-pass WordprocessingML scan. Returns None only on
    * structural breakage (an unterminated `<` at EOF); unknown
    * elements are skipped, which is what makes the profile robust to
    * the full real-world element zoo (w:proofErr, w:bookmarkStart,
    * mc:AlternateContent, ...).
    */
  private def scanXml(xmlBytes: Array[Byte]): Option[String] = {
    val xml = new String(xmlBytes, "UTF-8")
    val sb = new java.lang.StringBuilder(xml.length / 4)
    val paras = new java.lang.StringBuilder()
    var sawPara = false
    var nPara = 0
    var inT = false      // inside <w:t>
    var inInstr = false  // inside <w:instrText> (field codes: dropped)
    var inTabs = false   // inside <w:tabs> (tab-stop DEFINITIONS in
                         // paragraph properties — not tab characters)
    var sawW = false     // any WordprocessingML structure at all: the
                         // dialect gate (an officeDocument rels Target
                         // can resolve to a WORKBOOK in an .xlsx — that
                         // XML must not scan to Some("") and block the
                         // office dispatch chain)
    var i = 0
    val n = xml.length
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.startsWith("<![CDATA[", i)) {
          val end = xml.indexOf("]]>", i + 9)
          if (end < 0) return None
          if (inT && !inInstr) sb.append(xml, i + 9, end)
          i = end + 3
        } else if (xml.startsWith("<!--", i)) {
          // comments are legal XML anywhere; their content is neither
          // markup nor text (an entity-looking "&" inside one must not
          // fence the document)
          val end = xml.indexOf("-->", i + 4)
          if (end < 0) return None
          i = end + 3
        } else {
          val end = xml.indexOf('>', i)
          if (end < 0) return None
          val tag = xml.substring(i + 1, end)
          // element name = up to the first space/slash — KEEPING a
          // leading '/' (closing tags dispatch as "/w:p" etc.)
          var e = if (tag.startsWith("/")) 1 else 0
          while (e < tag.length && tag.charAt(e) != ' ' &&
                 tag.charAt(e) != '/' && tag.charAt(e) != '\t' &&
                 tag.charAt(e) != '\n' && tag.charAt(e) != '\r') e += 1
          val name = tag.substring(0, e)
          val selfClosed = tag.endsWith("/")
          if (name == "w:document" || name == "w:body" || name == "w:p" ||
              name == "w:t") sawW = true
          name match {
            case "w:t" => inT = !selfClosed
            case "/w:t" => inT = false
            case "w:instrText" => inInstr = !selfClosed
            case "/w:instrText" => inInstr = false
            case "w:tabs" => inTabs = !selfClosed
            case "/w:tabs" => inTabs = false
            case "w:tab" => if (!inTabs) sb.append('\t')
            case "w:br" | "w:cr" => sb.append('\n')
            case "/w:p" =>
              if (sawPara) paras.append('\n')
              paras.append(sb)
              sb.setLength(0)
              sawPara = true
              nPara += 1
            case "w:p" if selfClosed => // <w:p/> = an EMPTY paragraph
              if (sawPara) paras.append('\n')
              paras.append(sb)
              sb.setLength(0)
              sawPara = true
              nPara += 1
            case _ => () // comments, PIs, the element zoo: skipped
          }
          i = end + 1
        }
      } else if (c == '&') {
        val semi = xml.indexOf(';', i)
        if (semi < 0 || semi - i > 12) return None
        if (inT && !inInstr) {
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
            case _ => return None // undefined entity: no DTDs resolved
          }
        }
        i = semi + 1
      } else {
        if (inT && !inInstr) sb.append(c)
        i += 1
      }
    }
    if (!sawW) None // not WordprocessingML: let the next dialect try
    else if (nPara == 0 && sb.length == 0) Some("") // empty body
    else {
      if (sb.length > 0) { // trailing text outside any closed paragraph
        if (sawPara) paras.append('\n')
        paras.append(sb)
      }
      Some(paras.toString)
    }
  }

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>"""
      .stripMargin
  private val Rels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>"""
      .stripMargin

  /** A minimal REAL .docx: container parts + one `<w:p>` per input
    * line, TAB runs as `<w:tab/>`; deflated members (document.xml)
    * beside a stored one ([Content_Types].xml) so both read paths
    * ride every fixture.
    */
  def write(text: String): Array[Byte] = {
    val doc = new java.lang.StringBuilder(text.length * 2 + 256)
    doc.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
    doc.append("<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>")
    text.split("\n", -1).foreach { line =>
      doc.append("<w:p>")
      // TABs break the line into w:t segments joined by <w:tab/>
      val segs = line.split("\t", -1)
      var s = 0
      while (s < segs.length) {
        if (s > 0) doc.append("<w:r><w:tab/></w:r>")
        if (segs(s).nonEmpty)
          doc.append("<w:r><w:t xml:space=\"preserve\">")
            .append(esc(segs(s))).append("</w:t></w:r>")
        s += 1
      }
      doc.append("</w:p>")
    }
    doc.append("</w:body></w:document>")
    Zip.write(Seq(
      ("[Content_Types].xml", ContentTypes.getBytes("UTF-8"), false),
      ("_rels/.rels", Rels.getBytes("UTF-8"), true),
      ("word/document.xml", doc.toString.getBytes("UTF-8"), true)))
  }
}
