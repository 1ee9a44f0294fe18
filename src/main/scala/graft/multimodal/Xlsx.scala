package graft.multimodal

/** XLSX (SpreadsheetML) text extraction — the tabular member of the
  * OOXML family over the same [[Zip]] walk as [[Docx]]: spreadsheets
  * are a steady crawl class (open-data portals, statistics offices,
  * financial filings) whose TEXT — headers, labels, string cells —
  * otherwise rots in the media face.
  *
  * Profile:
  *   - Sheets resolved through the REAL container grammar: workbook
  *     part from `_rels/.rels` (officeDocument Target, fallback
  *     `xl/workbook.xml`), `<sheet r:id>` order from the workbook,
  *     targets from `xl/_rels/workbook.xml.rels`, resolved against
  *     the workbook directory.
  *   - `xl/sharedStrings.xml` → the `<si>` string table (each item's
  *     `<t>` runs concatenated — rich-text runs flatten).
  *   - Per sheet: `<row>` elements in document order; per `<c>` cell
  *     the value by its `t` type — `s` (shared index), `inlineStr`
  *     (`<is><t>`), `str` (formula result), `b` (TRUE/FALSE), else
  *     the raw `<v>` (numbers pass through verbatim — corpus text,
  *     not a number formatter).
  *   - Assembly: cells join with TAB, rows with NEWLINE, sheets with
  *     NEWLINE — the layout every TSV-consuming text operator
  *     downstream already understands.
  *
  * [[write]] is the identity-oracle writer: one sheet, one row per
  * input line, one cell per TAB segment, every cell a SHARED string
  * (the dominant real-world encoding), so extract(write(t)) == t.
  */
object Xlsx {

  private def attr(el: String, name: String): Option[String] =
    // \b so `t=` can't match inside `customFormat=` etc.
    ("\\b" + java.util.regex.Pattern.quote(name) + "\\s*=\\s*\"([^\"]*)\"")
      .r.findFirstMatchIn(el).map(_.group(1))

  /** Total extracted-output cap — the REFERENCE-AMPLIFICATION fence:
    * [[Zip.MaxEntryBytes]] caps each member, but thousands of cells
    * referencing one near-cap shared string would reinstate the bomb
    * one layer up (tiny payload → multi-GB text). A workbook whose
    * assembled text exceeds this fences whole (None — the payload
    * stays an opaque media blob).
    */
  private val MaxOutputChars: Long = 64L * 1024 * 1024

  private final class Budget(var left: Long) {
    def take(n: Int): Boolean = { left -= n; left >= 0 }
  }

  /** The workbook part path (rels-resolved, standard fallback). */
  private def workbookPart(zip: Zip.View): String =
    zip.extract("_rels/.rels").flatMap { rels =>
      val xml = new String(rels, "UTF-8")
      "<Relationship\\b[^>]*>".r.findAllIn(xml).find(el =>
        "Type\\s*=\\s*\"[^\"]*/officeDocument\"".r.findFirstIn(el).isDefined)
        .flatMap(attr(_, "Target")).map(_.stripPrefix("/"))
    }.getOrElse("xl/workbook.xml")

  /** Sheet part paths in workbook order. */
  private def sheetParts(zip: Zip.View, wb: String): Vector[String] = {
    val base = wb.lastIndexOf('/') match {
      case -1 => ""
      case i => wb.substring(0, i + 1)
    }
    val relsPath = base + "_rels/" + wb.substring(base.length) + ".rels"
    val targets: Map[String, String] =
      zip.extract(relsPath).map { rels =>
        val xml = new String(rels, "UTF-8")
        "<Relationship\\b[^>]*>".r.findAllIn(xml).flatMap { el =>
          for { id <- attr(el, "Id"); t <- attr(el, "Target") }
            yield id -> t
        }.toMap
      }.getOrElse(Map.empty)
    zip.extract(wb) match {
      case None => Vector.empty
      case Some(bytes) =>
        val xml = new String(bytes, "UTF-8")
        "<sheet\\b[^>]*>".r.findAllIn(xml).toVector
          .flatMap(el => attr(el, "r:id"))
          .flatMap(targets.get)
          .map(t => (base + t.stripPrefix("./")).stripPrefix("/"))
    }
  }

  /** Text content of ONE `<t>`-bearing XML region: concatenated `<t>`
    * runs with entity decode (the [[Docx]] scan, reduced — used for
    * both shared-string items and inline strings).
    */
  private def tRuns(xml: String, from: Int, until: Int): Option[String] = {
    val sb = new java.lang.StringBuilder()
    var i = from
    var inT = false
    while (i < until) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.startsWith("<![CDATA[", i)) {
          val end = xml.indexOf("]]>", i + 9)
          if (end < 0 || end > until) return None
          if (inT) sb.append(xml, i + 9, end)
          i = end + 3
        } else if (xml.startsWith("<!--", i)) {
          val end = xml.indexOf("-->", i + 4)
          if (end < 0 || end >= until) return None
          i = end + 3
        } else {
          val end = xml.indexOf('>', i)
          if (end < 0 || end >= until) return None
          val tag = xml.substring(i + 1, end)
          var e = if (tag.startsWith("/")) 1 else 0
          while (e < tag.length && tag.charAt(e) != ' ' &&
                 tag.charAt(e) != '/' && tag.charAt(e) != '\t' &&
                 tag.charAt(e) != '\n' && tag.charAt(e) != '\r') e += 1
          tag.substring(0, e) match {
            case "t" => inT = !tag.endsWith("/")
            case "/t" => inT = false
            case _ => ()
          }
          i = end + 1
        }
      } else if (c == '&') {
        val semi = xml.indexOf(';', i)
        if (semi < 0 || semi - i > 12) return None
        if (inT) {
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
            case _ => return None
          }
        }
        i = semi + 1
      } else {
        if (inT) sb.append(c)
        i += 1
      }
    }
    Some(sb.toString)
  }

  /** Region bounds of each `<si>…</si>` item, in order. */
  private def sharedStrings(zip: Zip.View, wbBase: String)
      : Option[Vector[String]] =
    zip.extract(wbBase + "sharedStrings.xml").map { bytes =>
      val xml = new String(bytes, "UTF-8")
      val out = Vector.newBuilder[String]
      var i = 0
      var going = true
      while (going) {
        val s = xml.indexOf("<si>", i)
        val s2 = xml.indexOf("<si ", i)
        val start = if (s < 0) s2 else if (s2 < 0) s else math.min(s, s2)
        if (start < 0) going = false
        else {
          val open = xml.indexOf('>', start)
          val close = xml.indexOf("</si>", start)
          if (open < 0 || close < 0) going = false
          else {
            out += tRuns(xml, open + 1, close).getOrElse("")
            i = close + 5
          }
        }
      }
      out.result()
    }

  /** Spreadsheet text, or None when the bytes are not a ZIP, carry no
    * workbook, or no sheet extracts.
    */
  def extractText(zipBytes: Array[Byte]): Option[String] =
    extractText(new Zip.View(zipBytes))

  /** Shared-directory form (see [[Zip.View]]). */
  def extractText(zip: Zip.View): Option[String] = {
    val wb = workbookPart(zip)
    val base = wb.lastIndexOf('/') match {
      case -1 => ""
      case i => wb.substring(0, i + 1)
    }
    val sheets = sheetParts(zip, wb)
    if (sheets.isEmpty) return None
    val shared = sharedStrings(zip, base).getOrElse(Vector.empty)
    val budget = new Budget(MaxOutputChars)
    // a LISTED sheet whose part is missing or fails extraction (CRC,
    // truncation) fences the WHOLE workbook — the same fence-whole
    // discipline malformed sheet XML gets below; a silent flatMap
    // here would mark a truncated workbook's partial text as a full
    // success
    val bodies = sheets.map(zip.extract(_).getOrElse(return None))
    val texts = Vector.newBuilder[String]
    var n = 0
    bodies.foreach { b =>
      sheetText(new String(b, "UTF-8"), shared, budget) match {
        case Some(t) => texts += t; n += 1
        case None => return None // malformed or over-budget: fence whole
      }
    }
    if (n == 0) None else Some(texts.result().mkString("\n"))
  }

  /** One worksheet → TSV-shaped text (cells TAB, rows NEWLINE). */
  private def sheetText(xml: String, shared: Vector[String],
                        budget: Budget): Option[String] = {
    val rows = Vector.newBuilder[String]
    var i = 0
    var going = true
    // any XML name delimiter ends the element name (pretty-printed
    // sheets legally break after "<row"/"<c")
    def delim(ch: Char) =
      ch == ' ' || ch == '>' || ch == '/' || ch == '\t' ||
        ch == '\n' || ch == '\r'
    while (going) {
      val rs = xml.indexOf("<row", i)
      if (rs < 0 || (xml.length > rs + 4 && !delim(xml.charAt(rs + 4)))) {
        if (rs < 0) going = false
        else { i = rs + 4 } // "<rowX" — not a row element
      } else {
        val rowOpen = xml.indexOf('>', rs)
        if (rowOpen < 0) return None
        if (xml.charAt(rowOpen - 1) == '/') { rows += ""; i = rowOpen + 1 }
        else {
          val rowClose = xml.indexOf("</row>", rs)
          if (rowClose < 0) return None
          rows += rowText(xml, rowOpen + 1, rowClose, shared, budget)
            .getOrElse(return None)
          i = rowClose + 6
        }
      }
    }
    val v = rows.result()
    if (v.isEmpty) None else Some(v.mkString("\n"))
  }

  /** One row's cells joined with TAB; None when malformed or the
    * workbook-wide output budget exhausts.
    */
  private def rowText(xml: String, from: Int, until: Int,
                      shared: Vector[String],
                      budget: Budget): Option[String] = {
    val cells = Vector.newBuilder[String]
    var i = from
    var going = true
    def delim(ch: Char) =
      ch == ' ' || ch == '>' || ch == '/' || ch == '\t' ||
        ch == '\n' || ch == '\r'
    while (going) {
      val cs = xml.indexOf("<c", i)
      val ok = cs >= 0 && cs < until && cs + 2 < xml.length &&
        delim(xml.charAt(cs + 2))
      if (cs < 0 || cs >= until) going = false
      else if (!ok) i = cs + 2
      else {
        val open = xml.indexOf('>', cs)
        if (open < 0 || open >= until) return None
        val tag = xml.substring(cs + 1, open)
        // the tag starts "c r=…": \b keeps `t=` from matching the
        // element name or attribute-name tails
        val typ = attr(tag.substring(1), "t").getOrElse("")
        if (xml.charAt(open - 1) == '/') { cells += ""; i = open + 1 }
        else {
          val close = xml.indexOf("</c>", open)
          if (close < 0 || close > until) return None
          val body = xml.substring(open + 1, close)
          val cell: String = typ match {
            case "s" =>
              vText(body).flatMap(ix =>
                try shared.lift(ix.trim.toInt) catch {
                  case _: NumberFormatException => None
                }).getOrElse("")
            case "inlineStr" =>
              tRuns(xml, open + 1, close).getOrElse("")
            case "b" =>
              vText(body).map(v =>
                if (v.trim == "1") "TRUE" else "FALSE").getOrElse("")
            case _ => // "str", numbers: the raw <v> verbatim
              vText(body).getOrElse("")
          }
          if (!budget.take(cell.length + 1)) return None
          cells += cell
          i = close + 4
        }
      }
    }
    Some(cells.result().mkString("\t"))
  }

  /** The `<v>…</v>` body, entity-light (numbers/indices). */
  private def vText(body: String): Option[String] = {
    val s = body.indexOf("<v>")
    if (s < 0) return None
    val e = body.indexOf("</v>", s)
    if (e < 0) return None
    Some(body.substring(s + 3, e))
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
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>"""
      .stripMargin
  private val Rels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
      .stripMargin
  private val WbRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>"""
      .stripMargin
  private val Workbook =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
      .stripMargin

  /** One sheet, one row per line, one SHARED-string cell per TAB
    * segment (deduplicated through the string table like real
    * writers), `xml:space` preserved.
    */
  def write(text: String): Array[Byte] = {
    val lines = text.split("\n", -1)
    val table = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sid(s: String): Int = table.getOrElseUpdate(s, table.size)
    val sheet = new java.lang.StringBuilder(text.length * 2 + 256)
    sheet.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
    sheet.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    lines.zipWithIndex.foreach { case (line, r) =>
      sheet.append("<row r=\"").append(r + 1).append("\">")
      line.split("\t", -1).zipWithIndex.foreach { case (cellText, cix) =>
        sheet.append("<c r=\"").append(colName(cix)).append(r + 1)
          .append("\" t=\"s\"><v>").append(sid(cellText)).append("</v></c>")
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    val sst = new java.lang.StringBuilder(256)
    sst.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
    sst.append("<sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" count=\"")
      .append(table.size).append("\" uniqueCount=\"").append(table.size)
      .append("\">")
    table.keys.foreach { s =>
      sst.append("<si><t xml:space=\"preserve\">").append(esc(s))
        .append("</t></si>")
    }
    sst.append("</sst>")
    Zip.write(Seq(
      ("[Content_Types].xml", ContentTypes.getBytes("UTF-8"), false),
      ("_rels/.rels", Rels.getBytes("UTF-8"), true),
      ("xl/workbook.xml", Workbook.getBytes("UTF-8"), true),
      ("xl/_rels/workbook.xml.rels", WbRels.getBytes("UTF-8"), true),
      ("xl/sharedStrings.xml", sst.toString.getBytes("UTF-8"), true),
      ("xl/worksheets/sheet1.xml", sheet.toString.getBytes("UTF-8"), true)))
  }

  private def colName(ix: Int): String = {
    var i = ix
    val sb = new StringBuilder
    while (i >= 0) {
      sb.insert(0, ('A' + i % 26).toChar)
      i = i / 26 - 1
    }
    sb.toString
  }
}
