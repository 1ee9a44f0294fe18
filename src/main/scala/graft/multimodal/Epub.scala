package graft.multimodal

/** EPUB text extraction — the OTHER ZIP-framed document class a crawl
  * serves (books, manuals, public-domain corpora distribute as EPUB;
  * the format is a ZIP of XHTML chapters behind an OPF manifest).
  * Completes the office/document pair over the one [[Zip]] walk:
  * [[Docx]] handles WordprocessingML, this handles OPS/XHTML.
  *
  * Profile (OCF + OPF, the subset every real reader relies on):
  *   - `META-INF/container.xml` → the FIRST `<rootfile>`'s
  *     `full-path` (the OCF entry point; a missing/unparseable
  *     container fences — it is the format's defining member).
  *   - The OPF package document → manifest `item`s (id → href,
  *     media-type) + `spine` itemrefs; chapters = spine order,
  *     XHTML items only, hrefs resolved against the OPF's directory,
  *     percent-escapes left verbatim (corpus text, not a resolver).
  *   - Each chapter scans with the [[Docx]] discipline: a bounded
  *     single pass, no DOM, no entity RESOLUTION (XXE impossible);
  *     `<script>`/`<style>` content dies whole; text nodes append;
  *     `<head>`/`<title>` content is chrome, not prose, and dies
  *     with script/style; `</p>` closes a paragraph (paragraphs join
  *     with NEWLINE — the [[Docx]] identity device); `<br/>` is a
  *     line break;
  *     numeric charrefs and the XML five always decode, `&nbsp;`
  *     decodes to a space, and UNKNOWN named entities pass through
  *     literally (a book must not fence on `&mdash;` — the
  *     least-destructive choice, stated here).
  *   - Chapters join with NEWLINE.
  *
  * [[write]] is the fixture generator and identity-oracle writer: a
  * real container (mimetype STORED first — the OCF rule — container
  * .xml, OPF with manifest+spine, one XHTML chapter with one `<p>`
  * per input line), so extract(write(t)) == t for control-free text.
  */
object Epub {

  private val ContainerPath = "META-INF/container.xml"

  private def attr(el: String, name: String): Option[String] =
    // \b so `id=` can't leftmost-match inside `uid="…"` etc.
    ("\\b" + java.util.regex.Pattern.quote(name) + "\\s*=\\s*\"([^\"]*)\"")
      .r.findFirstMatchIn(el).map(_.group(1))

  /** Resolve `.`/`..` segments against ZIP entry names (real books
    * keep the OPF in a subdirectory and write parent-relative hrefs).
    */
  private def normalize(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    path.split("/", -1).foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    out.mkString("/")
  }

  /** The OPF path from container.xml's first rootfile. */
  private[multimodal] def opfPath(zip: Zip.View): Option[String] =
    zip.extract(ContainerPath).flatMap { c =>
      val xml = new String(c, "UTF-8")
      "<rootfile\\b[^>]*>".r.findFirstIn(xml)
        .flatMap(attr(_, "full-path"))
    }

  /** Spine chapter paths (XHTML only), resolved against the OPF dir. */
  private[multimodal] def chapterPaths(zip: Zip.View,
                                       opf: String): Vector[String] = {
    zip.extract(opf) match {
      case None => Vector.empty
      case Some(bytes) =>
        val xml = new String(bytes, "UTF-8")
        val base = opf.lastIndexOf('/') match {
          case -1 => ""
          case i => opf.substring(0, i + 1)
        }
        val items = "<item\\b[^>]*>".r.findAllIn(xml).flatMap { el =>
          for {
            id <- attr(el, "id")
            href <- attr(el, "href")
            mt <- attr(el, "media-type")
          } yield id -> (href, mt)
        }.toMap
        "<itemref\\b[^>]*>".r.findAllIn(xml).toVector
          .flatMap(attr(_, "idref"))
          .flatMap(items.get)
          .collect { case (href, mt)
            if mt == "application/xhtml+xml" || mt == "text/html" =>
              // ./, ../ and leading / all occur in real manifests
              normalize(base + href)
          }
    }
  }

  /** Book text, or None when the bytes are not an EPUB (no container
    * entry), the OPF is missing, the spine is empty, or ANY spine
    * chapter fails to extract (fence-whole — see extractText).
    */
  def extractText(zipBytes: Array[Byte]): Option[String] =
    extractText(new Zip.View(zipBytes))

  /** Shared-directory form (see [[Zip.View]]). */
  def extractText(zip: Zip.View): Option[String] = {
    opfPath(zip) match {
      case None => None
      case Some(opf) =>
        val paths = chapterPaths(zip, opf)
        if (paths.isEmpty) return None
        // a SPINE chapter whose member is missing, fails CRC, or
        // breaks structurally fences the WHOLE book — the Docx/Xlsx
        // fence-whole discipline (a book missing a chapter must not
        // read as a complete shorter book)
        val chapters = paths.map(p =>
          zip.extract(p).flatMap(scanXhtml).getOrElse(return None))
        Some(chapters.mkString("\n"))
    }
  }

  private val Known = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Single-pass XHTML scan — the [[Docx]] scanner's discipline on
    * the HTML element set. Returns None only on structural breakage
    * (an unterminated `<` at EOF).
    */
  private[multimodal] def scanXhtml(xmlBytes: Array[Byte]): Option[String] = {
    val xml = new String(xmlBytes, "UTF-8")
    val sb = new java.lang.StringBuilder(xml.length / 4)
    val paras = new java.lang.StringBuilder()
    var sawPara = false
    var nPara = 0
    var skip = 0 // inside script/style (nesting-counted)
    var i = 0
    val n = xml.length
    def closePara(): Unit = {
      if (sawPara) paras.append('\n')
      paras.append(sb)
      sb.setLength(0)
      sawPara = true
      nPara += 1
    }
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.startsWith("<![CDATA[", i)) {
          val end = xml.indexOf("]]>", i + 9)
          if (end < 0) return None
          if (skip == 0) sb.append(xml, i + 9, end)
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
          val name = tag.substring(0, e).toLowerCase(java.util.Locale.ROOT)
          val selfClosed = tag.endsWith("/")
          name match {
            case "script" | "style" | "head" | "title" =>
              if (!selfClosed) skip += 1
            case "/script" | "/style" | "/head" | "/title" =>
              if (skip > 0) skip -= 1
            // markup INSIDE skipped content is that content's text
            // (a script string holding "</p>" must not close a
            // paragraph), so structure only fires at skip == 0
            case "br" if skip == 0 => sb.append('\n')
            case "/p" if skip == 0 => closePara()
            case "p" if skip == 0 && selfClosed => closePara()
            case _ => () // the HTML element zoo: structure, not text
          }
          i = end + 1
        }
      } else if (c == '&') {
        val semi = xml.indexOf(';', i)
        if (semi < 0 || semi - i > 12) {
          // a bare ampersand in sloppy XHTML: literal, keep scanning
          if (skip == 0) sb.append('&')
          i += 1
        } else {
          val ent = xml.substring(i + 1, semi)
          if (skip == 0) {
            if (Known.contains(ent)) sb.append(Known(ent))
            else if (ent.startsWith("#x") || ent.startsWith("#X"))
              try sb.appendCodePoint(Integer.parseInt(ent.substring(2), 16))
              catch { case _: RuntimeException => sb.append('&').append(ent).append(';') }
            else if (ent.startsWith("#"))
              try sb.appendCodePoint(Integer.parseInt(ent.substring(1)))
              catch { case _: RuntimeException => sb.append('&').append(ent).append(';') }
            else
              // unknown NAMED entity: literal passthrough — a book
              // must not fence on &mdash;
              sb.append('&').append(ent).append(';')
          }
          i = semi + 1
        }
      } else {
        if (skip == 0) sb.append(c)
        i += 1
      }
    }
    if (nPara == 0 && sb.length == 0) Some("")
    else {
      if (sb.length > 0) closePara()
      Some(paras.toString)
    }
  }

  private def esc(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case ch => b.append(ch)
      }
      i += 1
    }
    b.toString
  }

  private val Container =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles></container>"""
      .stripMargin

  private val Opf =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="id"><metadata xmlns:dc="http://purl.org/dc/elements/1.1/"><dc:identifier id="id">graft-fixture</dc:identifier><dc:title>doc</dc:title><dc:language>en</dc:language></metadata><manifest><item id="ch1" href="text/ch1.xhtml" media-type="application/xhtml+xml"/><item id="css" href="style.css" media-type="text/css"/></manifest><spine><itemref idref="ch1"/></spine></package>"""
      .stripMargin

  /** A minimal-but-real container: `mimetype` STORED FIRST (the OCF
    * rule), container.xml → OPF → one XHTML chapter with one `<p>`
    * per input line (deflated), plus a non-spine CSS member the
    * extraction must ignore.
    */
  def write(text: String): Array[Byte] = {
    val ch = new java.lang.StringBuilder(text.length * 2 + 256)
    ch.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
    ch.append("<html xmlns=\"http://www.w3.org/1999/xhtml\">")
    ch.append("<head><title>doc</title>")
    ch.append("<style>p { margin: 0 }</style></head><body>")
    text.split("\n", -1).foreach { line =>
      ch.append("<p>").append(esc(line)).append("</p>")
    }
    ch.append("</body></html>")
    Zip.write(Seq(
      ("mimetype", "application/epub+zip".getBytes("UTF-8"), false),
      ("META-INF/container.xml", Container.getBytes("UTF-8"), true),
      ("OEBPS/content.opf", Opf.getBytes("UTF-8"), true),
      ("OEBPS/style.css", "p { margin: 0 }".getBytes("UTF-8"), true),
      ("OEBPS/text/ch1.xhtml", ch.toString.getBytes("UTF-8"), true)))
  }
}
