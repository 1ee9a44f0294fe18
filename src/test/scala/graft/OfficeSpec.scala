package graft

import graft.multimodal.{Cfb, DocText, Docx, Epub, Odt, RtfText, Xlsx, Zip}
import org.scalatest.funsuite.AnyFunSuite

/** ZIP container walk + DOCX text extraction — round trips through
  * the repo's own writers (the codec-family discipline: the writer IS
  * the grammar pin), fence matrix for the hostile-byte cases a crawl
  * serves, and the WordprocessingML element zoo the scanner must
  * ignore without losing text.
  */
class OfficeSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  // ---- Zip ----

  test("zip round trip: stored + deflated members, names and bytes exact") {
    val files = Seq(
      ("a.txt", b("alpha"), false),
      ("dir/b.bin", Array.tabulate[Byte](5000)(i => (i * 37).toByte), true),
      ("empty", Array.emptyByteArray, true),
      ("unicode/ドキュメント.txt", b("unicode name"), false))
    val zip = Zip.write(files)
    val es = Zip.entries(zip).get
    assert(es.map(_.name) == files.map(_._1).toVector)
    files.foreach { case (name, data, _) =>
      assert(Zip.extract(zip, name).get.toSeq == data.toSeq, name)
    }
    // methods landed as declared
    assert(es.map(_.method) == Vector(0, 8, 8, 0))
  }

  test("zip: EOCD backward scan — comment with embedded fake EOCD bytes cannot spoof") {
    val real = Seq(("x", b("real content"), true))
    // a comment containing a full fake EOCD record (PK\5\6 + zeros):
    // the scanner must pick the REAL one (whose comment length lands
    // exactly on the tail), not the planted bytes
    val fake = Array[Byte]('P', 'K', 5, 6) ++ new Array[Byte](18)
    val zip = Zip.write(real, comment = b("junk ") ++ fake ++ b(" tail"))
    assert(Zip.extract(zip, "x").get.toSeq == b("real content").toSeq)
    // the stronger attack: a fake EOCD whose comment-length field is
    // crafted to land EXACTLY on the tail (length-consistent) but
    // whose directory offset points at garbage — the directory probe
    // must reject it and the scan continue to the real record
    val commentLen = 64
    val fake2 = new Array[Byte](22)
    fake2(0) = 'P'; fake2(1) = 'K'; fake2(2) = 5; fake2(3) = 6
    fake2(8) = 5; fake2(10) = 5 // claims 5 entries
    fake2(16) = 1 // cdOff = 1: not a PK central header
    val tailLen = commentLen - 22
    fake2(20) = (tailLen & 0xff).toByte
    fake2(21) = ((tailLen >> 8) & 0xff).toByte
    val zip2 = Zip.write(real,
      comment = fake2 ++ Array.fill[Byte](tailLen)('.'))
    assert(Zip.extract(zip2, "x").get.toSeq == b("real content").toSeq,
      "a length-consistent fake EOCD must fail the directory probe")
    // the HIDE-content attack (ADVICE r15): a length-consistent fake
    // declaring ZERO entries — without the cd-size/cd-offset
    // coherence check it reads as Some(empty) and hides the real
    // members; a zero-entry candidate is only plausible when its cd
    // size is 0 AND its cd offset lands exactly on the record itself
    val fake3 = new Array[Byte](22)
    fake3(0) = 'P'; fake3(1) = 'K'; fake3(2) = 5; fake3(3) = 6
    // entries = 0, cd size = 0, cdOff = 0 (wrong: the record is not
    // at position 0), comment length lands exactly on the tail
    fake3(20) = (tailLen & 0xff).toByte
    fake3(21) = ((tailLen >> 8) & 0xff).toByte
    val zip3 = Zip.write(real,
      comment = fake3 ++ Array.fill[Byte](tailLen)('.'))
    assert(Zip.entries(zip3).get.nonEmpty,
      "a zero-entry fake EOCD must not hide the real members")
    assert(Zip.extract(zip3, "x").get.toSeq == b("real content").toSeq)
    // a GENUINE empty archive still reads as Some(empty)
    assert(Zip.entries(Zip.write(Seq.empty)).get.isEmpty,
      "the coherence check must not reject a real empty archive")
    // the stated trade: an empty archive behind a prefix stub reads
    // None (cdOff no longer lands on the record) — fence direction,
    // because tolerating offset drift would reopen the hide attack
    assert(Zip.entries(
      b("SFXSTUB") ++ Zip.write(Seq.empty)).isEmpty,
      "prefixed empty archives fence (documented trade)")
  }

  test("zip fences: truncation, bad CRC, encrypted bit, exotic method, zip64 sentinel, non-zip") {
    val zip = Zip.write(Seq(("f", b("fence matrix target"), true)))
    // truncated anywhere before the EOCD end → entries None or
    // extract None, never a throw
    Seq(zip.length - 1, zip.length - 22, zip.length / 2, 10, 0).foreach { n =>
      val t = java.util.Arrays.copyOfRange(zip, 0, n)
      assert(Zip.extract(t, "f").isEmpty, s"truncate $n")
    }
    assert(Zip.entries(b("PK is a common prefix in prose")).isEmpty)
    assert(Zip.entries(null).isEmpty)
    // corrupt the member's compressed bytes → CRC fence
    val corrupt = zip.clone()
    val dataOff = 30 + 1 // local header + name "f"
    corrupt(dataOff + 2) = (corrupt(dataOff + 2) ^ 0x41).toByte
    assert(Zip.extract(corrupt, "f").isEmpty, "crc fence")
    // flip the central-directory GP encrypted bit (offset: find PK\1\2)
    val enc = zip.clone()
    val cd = (0 until enc.length - 4).find(i =>
      enc(i) == 'P' && enc(i + 1) == 'K' && enc(i + 2) == 1 &&
        enc(i + 3) == 2).get
    enc(cd + 8) = (enc(cd + 8) | 1).toByte
    assert(Zip.extract(enc, "f").isEmpty, "encrypted fence")
    // exotic method (LZMA = 14)
    val lzma = zip.clone()
    lzma(cd + 10) = 14
    assert(Zip.extract(lzma, "f").isEmpty, "method fence")
    // zip64 sentinel on the uncompressed size
    val z64 = zip.clone()
    (0 until 4).foreach(i => z64(cd + 24 + i) = 0xFF.toByte)
    assert(Zip.extract(z64, "f").isEmpty, "zip64 fence")
  }

  test("zip: declared-size lies fence (inflate longer or shorter than the directory claims)") {
    val zip = Zip.write(Seq(("f", Array.tabulate[Byte](600)(_.toByte), true)))
    val cd = (0 until zip.length - 4).find(i =>
      zip(i) == 'P' && zip(i + 1) == 'K' && zip(i + 2) == 1 &&
        zip(i + 3) == 2).get
    // shrink the declared uncompressed size: inflate overruns → None
    val small = zip.clone()
    small(cd + 24) = 10; small(cd + 25) = 0; small(cd + 26) = 0; small(cd + 27) = 0
    assert(Zip.extract(small, "f").isEmpty, "undersized declaration")
    // grow it: stalled inflate (needsInput before filling) → None
    val big = zip.clone()
    big(cd + 24) = 0x60.toByte; big(cd + 25) = 0x09 // 2400
    assert(Zip.extract(big, "f").isEmpty, "oversized declaration")
  }

  // ---- Docx ----

  test("docx identity: extract(write(t)) == t across newlines, tabs, XML escapes, unicode, empty") {
    val cases = Seq(
      "",
      "plain paragraph",
      "two\nparagraphs",
      "trailing newline\n",
      "\nleading and\n\nblank lines\n",
      "tabs\there\tand\there",
      "escapes: a < b && c > d \"quoted\" 'apostrophe'",
      "unicode: été 中文 ß " + new String(Character.toChars(0x1F600)),
      "mixed\tline\nwith\ttabs\nand more")
    cases.foreach { t =>
      assert(Docx.extractText(Docx.write(t)).contains(t), s"case '$t'")
    }
  }

  test("docx: main part resolved through _rels, not the filename convention") {
    // container whose main part lives at a NON-standard path
    val doc = b("<?xml version=\"1.0\"?><w:document xmlns:w=\"x\">" +
      "<w:body><w:p><w:r><w:t>moved part</w:t></w:r></w:p></w:body>" +
      "</w:document>")
    val rels = b("<?xml version=\"1.0\"?><Relationships>" +
      "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats" +
      ".org/officeDocument/2006/relationships/officeDocument\" " +
      "Target=\"/custom/main.xml\"/></Relationships>")
    val zip = Zip.write(Seq(
      ("_rels/.rels", rels, true),
      ("custom/main.xml", doc, true)))
    assert(Docx.extractText(zip).contains("moved part"))
  }

  test("docx scanner: element zoo ignored, instrText dropped, w:tabs stops are not tabs, w:br/w:cr are breaks, CDATA and char refs decode") {
    val xml = "<?xml version=\"1.0\"?><w:document><w:body>" +
      "<w:p><w:pPr><w:tabs><w:tab w:val=\"left\" w:pos=\"720\"/></w:tabs>" +
      "<w:proofErr w:type=\"spellStart\"/></w:pPr>" +
      "<w:r><w:t>A</w:t></w:r>" +
      "<w:r><w:fldChar w:fldCharType=\"begin\"/></w:r>" +
      "<w:r><w:instrText xml:space=\"preserve\"> PAGE </w:instrText></w:r>" +
      "<w:r><w:fldChar w:fldCharType=\"end\"/></w:r>" +
      "<w:r><w:tab/><w:t><![CDATA[cdata <kept> &verbatim;]]></w:t></w:r>" +
      "<w:r><w:br/><w:t>&#65;&#x42;&amp;</w:t></w:r>" +
      "</w:p><w:p/></w:body></w:document>"
    val zip = Zip.write(Seq(("word/document.xml", b(xml), true)))
    val got = Docx.extractText(zip).get
    assert(got == "A\tcdata <kept> &verbatim;\nAB&\n")
  }

  test("docx fences: non-zip, plain archive without a main part, corrupt member, broken XML") {
    assert(Docx.extractText(b("not a zip at all")).isEmpty)
    val plain = Zip.write(Seq(("readme.txt", b("just an archive"), true)))
    assert(Docx.extractText(plain).isEmpty, "plain archive")
    val docx = Docx.write("target")
    // corrupt the document.xml member bytes → CRC fence → None
    val names = Zip.entries(docx).get
    val main = names.find(_.name == "word/document.xml").get
    val corrupt = docx.clone()
    val l = main.offset.toInt
    val dataOff = l + 30 + 17 // name length "word/document.xml"
    corrupt(dataOff + 1) = (corrupt(dataOff + 1) ^ 0x20).toByte
    assert(Docx.extractText(corrupt).isEmpty, "corrupt member")
    // structurally broken XML: unterminated tag at EOF
    val broken = Zip.write(Seq(
      ("word/document.xml", b("<w:document><w:body><w:p><w:t>x"), true)))
    assert(Docx.extractText(broken).contains("x"),
      "trailing unclosed text still salvages")
    val broken2 = Zip.write(Seq(
      ("word/document.xml", b("<w:document><w:body><w:p><w:t>x</w:t"), true)))
    assert(Docx.extractText(broken2).isEmpty, "unterminated tag fences")
  }

  // ---- Epub ----

  test("epub identity: extract(write(t)) == t across newlines, escapes, unicode, empty") {
    val cases = Seq(
      "",
      "a single paragraph of book text",
      "chapter line one\nchapter line two",
      "trailing\n",
      "\n\nblank paragraphs survive\n",
      "escapes: a < b && c > d",
      "unicode: été 中文 " + new String(Character.toChars(0x1F600)))
    cases.foreach { t =>
      assert(Epub.extractText(Epub.write(t)).contains(t), s"case '$t'")
    }
  }

  test("epub scanner: head/title/style/script die, br breaks, comments skipped, unknown entities literal, numeric refs decode") {
    val ch = b("<?xml version=\"1.0\"?><!DOCTYPE html>" +
      "<html><head><title>Chrome Title</title>" +
      "<style>p { color: red }</style>" +
      "<script>var x = '<p>not text</p>';</script></head>" +
      "<body><!-- a comment with <p>bait</p> -->" +
      "<p>real &amp; true &mdash; yes&#33;</p>" +
      "<p>line<br/>break &#x41;&nbsp;end</p>" +
      "</body></html>")
    val opf = b("<package><manifest>" +
      "<item id=\"c\" href=\"c.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "</manifest><spine><itemref idref=\"c\"/></spine></package>")
    val container = b("<container><rootfiles>" +
      "<rootfile full-path=\"book/pkg.opf\" media-type=" +
      "\"application/oebps-package+xml\"/></rootfiles></container>")
    val zip = Zip.write(Seq(
      ("mimetype", b("application/epub+zip"), false),
      ("META-INF/container.xml", container, true),
      ("book/pkg.opf", opf, true),
      ("book/c.xhtml", ch, true)))
    assert(Epub.extractText(zip).contains(
      "real & true &mdash; yes!\nline\nbreak A end"))
  }

  test("epub: spine order governs, non-xhtml items skipped, multi-chapter join") {
    val mk = (t: String) => b(s"<html><body><p>$t</p></body></html>")
    val opf = b("<package><manifest>" +
      "<item id=\"b\" href=\"sub/b.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "<item id=\"a\" href=\"a.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "<item id=\"css\" href=\"s.css\" media-type=\"text/css\"/>" +
      "</manifest><spine><itemref idref=\"b\"/><itemref idref=\"a\"/>" +
      "<itemref idref=\"css\"/></spine></package>")
    val container = b("<container><rootfiles>" +
      "<rootfile full-path=\"ops/x.opf\" media-type=" +
      "\"application/oebps-package+xml\"/></rootfiles></container>")
    val zip = Zip.write(Seq(
      ("META-INF/container.xml", container, true),
      ("ops/x.opf", opf, true),
      ("ops/a.xhtml", mk("second in spine"), true),
      ("ops/sub/b.xhtml", mk("first in spine"), true),
      ("ops/s.css", b("p{}"), true)))
    assert(Epub.extractText(zip).contains("first in spine\nsecond in spine"))
  }

  test("epub fences: no container, missing opf, no extractable chapter") {
    assert(Epub.extractText(Zip.write(Seq(
      ("readme.txt", b("plain archive"), true)))).isEmpty)
    val container = b("<container><rootfiles>" +
      "<rootfile full-path=\"gone.opf\" media-type=" +
      "\"application/oebps-package+xml\"/></rootfiles></container>")
    assert(Epub.extractText(Zip.write(Seq(
      ("META-INF/container.xml", container, true)))).isEmpty,
      "missing opf")
    // the office expression's dispatch: a docx is NOT an epub and
    // vice versa — each extracts through its own grammar only
    assert(Epub.extractText(Docx.write("wordprocessing")).isEmpty)
    assert(Docx.extractText(Epub.write("a book")).isEmpty)
    // fence-whole: ONE corrupt spine chapter fences the whole book
    // (a book missing a chapter must not read as a shorter book)
    val book = Epub.write("chapter text that will be damaged")
    val chap = Zip.entries(book).get
      .find(_.name.endsWith(".xhtml")).get
    val corrupt = book.clone()
    // flip a byte in the middle of the member's DATA (past the local
    // header + its name), so the CRC check must catch it
    val dataMid = chap.offset.toInt + 30 + chap.name.length +
      chap.compSize.toInt / 2
    corrupt(dataMid) = (corrupt(dataMid) ^ 0x13).toByte
    assert(Epub.extractText(corrupt).isEmpty,
      "a corrupt spine chapter must fence the whole book")
  }

  // ---- Rtf ----

  test("rtf identity: extract(write(t)) == t across newlines, tabs, specials, latin-1, unicode incl. astral, empty") {
    val cases = Seq(
      "",
      "plain rtf paragraph",
      "two\nparagraphs\nhere",
      "tabs\tand\tmore",
      "specials: {braces} and \\backslash\\",
      "latin-1: café naïve émigré ß ÿ",
      "cp1252 punctuation block: — – ‘ ’ “ ” •",
      "unicode: 中文 text " + new String(Character.toChars(0x1F600)),
      "mixed\tline\nwith {every\\thing}\n")
    cases.foreach { t =>
      assert(RtfText.extract(RtfText.write(t)).contains(t), s"case '$t'")
    }
  }

  test("rtf scanner: destinations drop (fonttbl/info/pict/starred), control semantics, \\uN fallback eating, \\bin raw skip") {
    def x(rtf: String) = RtfText.extract(rtf.getBytes("ISO-8859-1"))
    assert(x("{\\rtf1{\\fonttbl{\\f0 Arial;}}{\\info{\\author Hidden Name}}Visible}")
      .contains("Visible"))
    assert(x("{\\rtf1{\\*\\unknowndest secret stuff}shown}").contains("shown"))
    assert(x("{\\rtf1{\\pict 0011AAFF}after}").contains("after"))
    // \u with uc=2 eats TWO fallback chars (incl. \'hh forms)
    assert(x("{\\rtf1\\uc2 \\u26085\\'e6\\'97ok}").contains("日ok"))
    // negative \uN wraps signed-16-bit
    assert(x("{\\rtf1\\uc1 \\u-10179?\\u-8704?}")
      .contains(new String(Character.toChars(0x1F600))))
    // \binN skips raw bytes that contain '}' and '\'
    assert(x("{\\rtf1\\bin5 }\\a{}text}").contains("text"))
    // em-dash & friends as control words
    assert(x("{\\rtf1 a\\emdash b\\endash c\\bullet d}")
      .contains("a—b–c•d"))
    // escaped newline ignored; \~ is a true NON-BREAKING space
    assert(x("{\\rtf1 a\\\nb\\~c}").contains("ab\u00a0c"))
    // raw newlines in the file are NOT text
    assert(x("{\\rtf1 line\r\none}").contains("lineone"))
  }

  test("rtf fences: non-rtf, prose with braces, unbalanced groups, depth bomb") {
    assert(RtfText.extract(null).isEmpty)
    assert(RtfText.extract("just prose { with braces }".getBytes).isEmpty)
    assert(RtfText.extract("{\\rtg1 wrong word}".getBytes).isEmpty)
    // closing more groups than opened fences
    assert(RtfText.extract("{\\rtf1 a}}".getBytes).isEmpty)
    // a depth bomb caps instead of overflowing
    val bomb = "{\\rtf1 " + "{" * 10000
    assert(RtfText.extract(bomb.getBytes).isEmpty)
    // the dispatch chain: RTF is neither a docx nor an epub
    assert(Docx.extractText(RtfText.write("x")).isEmpty)
    assert(Epub.extractText(RtfText.write("x")).isEmpty)
  }

  // ---- Odt ----

  test("odt identity: extract(write(t)) == t across newlines, tabs, SPACE RUNS, escapes, unicode, empty") {
    val cases = Seq(
      "",
      "plain odt paragraph",
      "two\nparagraphs",
      "tabs\there",
      "space  runs   collapse allegedly    not",
      " leading and trailing  ",
      "escapes: a < b && c > d",
      "unicode: été 中文 " + new String(Character.toChars(0x1F600)),
      "mixed\tline\nwith  runs\n")
    cases.foreach { t =>
      assert(Odt.extractText(Odt.write(t)).contains(t), s"case '$t'")
    }
  }

  test("odt scanner: spans transparent, annotations drop, text:s expands, line-break breaks") {
    val xml = b("<?xml version=\"1.0\"?><office:document-content>" +
      "<office:body><office:text>" +
      "<text:p>A<text:span text:style-name=\"T1\">B</text:span>" +
      "<office:annotation><text:p>reviewer note</text:p>" +
      "</office:annotation>C<text:s text:c=\"3\"/>D" +
      "<text:line-break/>E</text:p>" +
      "<text:h text:outline-level=\"1\">Heading</text:h>" +
      "</office:text></office:body></office:document-content>")
    val zip = Zip.write(Seq(("content.xml", xml, true)))
    assert(Odt.extractText(zip).contains("AB" + "C   D\nE\nHeading"))
  }

  test("odt fences: non-zip, zip without content.xml, no body text, and the dispatch chain") {
    assert(Odt.extractText(b("not a zip")).isEmpty)
    assert(Odt.extractText(Zip.write(Seq(
      ("readme.txt", b("archive"), true)))).isEmpty)
    val empty = Zip.write(Seq(("content.xml",
      b("<office:document-content><office:body><office:text>" +
        "</office:text></office:body></office:document-content>"), true)))
    assert(Odt.extractText(empty).isEmpty, "no paragraphs -> no row")
    // an ODT is none of the other formats and vice versa
    assert(Docx.extractText(Odt.write("odt")).isEmpty)
    assert(Epub.extractText(Odt.write("odt")).isEmpty)
    assert(Odt.extractText(Docx.write("docx")).isEmpty)
    assert(Odt.extractText(Epub.write("epub")).isEmpty,
      "an EPUB has no top-level content.xml")
  }

  // ---- Cfb / DocText ----

  test("cfb round trip: big stream (regular chain) and small stream (mini stream) by name") {
    val big = Array.tabulate[Byte](5000)(i => (i * 13).toByte)
    val small = b("a small stream through the mini path")
    val cfb = Cfb.write(Seq(("BigStream", big), ("SmallOne", small)))
    assert(Cfb.stream(cfb, "BigStream").get.toSeq == big.toSeq)
    assert(Cfb.stream(cfb, "SmallOne").get.toSeq == small.toSeq)
    assert(Cfb.stream(cfb, "Absent").isEmpty)
    val names = Cfb.entries(cfb).get.map(_.name).toSet
    assert(names == Set("Root Entry", "BigStream", "SmallOne"))
  }

  test("cfb fences: non-cfb, truncation, FAT cycle") {
    assert(Cfb.entries(b("not a compound file at all, just prose")).isEmpty)
    assert(Cfb.entries(null).isEmpty)
    val ok = Cfb.write(Seq(("S", Array.tabulate[Byte](5000)(_.toByte))))
    // cut inside the big stream's chain → stream None, dir still reads
    val cut = java.util.Arrays.copyOfRange(ok, 0, ok.length - 600)
    assert(Cfb.stream(cut, "S").isEmpty, "short chain must not yield bytes")
    assert(Cfb.entries(cut).isDefined)
    // FAT cycle: point the big stream's first FAT entry at itself
    val looped = ok.clone()
    val fatOff = 512 // FAT is sector 0
    // find S's start sector from its dir entry (sector 1, entry 1)
    val dirOff = 512 * 2 + 128
    val start = (looped(dirOff + 116) & 0xff) |
      ((looped(dirOff + 117) & 0xff) << 8)
    looped(fatOff + 4 * start) = start.toByte
    looped(fatOff + 4 * start + 1) = ((start >> 8) & 0xff).toByte
    looped(fatOff + 4 * start + 2) = 0; looped(fatOff + 4 * start + 3) = 0
    assert(Cfb.stream(looped, "S").isEmpty, "a FAT loop must not hang")
  }

  test("doc identity: extract(write(t)) == t across newlines, tabs, unicode, empty") {
    val cases = Seq(
      "",
      "a legacy word document paragraph",
      "two\nparagraphs\nof doc",
      "tabs\tride\tthrough",
      "unicode: été 中文 " + new String(Character.toChars(0x1F600)),
      "mixed\tline\nwith more\n")
    cases.foreach { t =>
      assert(DocText.extract(DocText.write(t)).contains(t), s"case '$t'")
    }
  }

  test("doc cleanup + fences: field instructions drop, marks translate, encrypted/non-word fence") {
    // hand-build: pieces through the writer, then patch text with
    // Word's control characters at the byte level
    val raw = "A\u0013 HYPERLINK x \u0014shown\u0015B\u0007C\u000bD"
    val got = DocText.extract(DocText.write(raw)).get
    assert(got == "AshownB\tC\nD",
      "field instruction text must drop; separator-to-end shows")
    // the encrypted bit fences closed
    val doc = DocText.write("secret")
    val enc = doc.clone()
    // WordDocument is the big stream: find its content start — the
    // writer places it after [header][FAT][DIR][miniFAT][mini]; patch
    // the fEncrypted bit in the FIB flags (offset 10 in the stream)
    val wdStart = {
      val e = Cfb.entries(doc).get.find(_.name == "WordDocument").get
      512L * (e.start + 1)
    }
    enc((wdStart + 11).toInt) = (enc((wdStart + 11).toInt) | 0x01).toByte
    assert(DocText.extract(enc).isEmpty, "fEncrypted must fence")
    // an XLS-shaped CFB (no WordDocument stream) is not a doc
    val xls = Cfb.write(Seq(("Workbook", b("not word"))))
    assert(DocText.extract(xls).isEmpty)
    // and a doc is not any of the zip dialects
    assert(Docx.extractText(DocText.write("x")).isEmpty)
  }

  // ---- Xlsx ----

  test("xlsx identity: extract(write(t)) == t across rows, cells, escapes, unicode, empty") {
    val cases = Seq(
      "",
      "one cell",
      "a\tb\tc",
      "row one\nrow two",
      "head1\thead2\nv1\tv2\nv3\tv4",
      "sparse\t\tcells\t",
      "repeated\trepeated\trepeated", // the shared-string dedup path
      "escapes: a < b & c > d",
      "unicode: été 中文 " + new String(Character.toChars(0x1F600)))
    cases.foreach { t =>
      assert(Xlsx.extractText(Xlsx.write(t)).contains(t), s"case '$t'")
    }
  }

  test("xlsx cells: inline strings, formula results, booleans, raw numbers, empty cells") {
    val sheet = b("<worksheet><sheetData>" +
      "<row r=\"1\"><c r=\"A1\" t=\"s\"><v>0</v></c>" +
      "<c r=\"B1\" t=\"inlineStr\"><is><t>inline &amp; well</t></is></c>" +
      "<c r=\"C1\" t=\"str\"><v>formula out</v></c></row>" +
      "<row r=\"2\"><c r=\"A2\"><v>3.14</v></c>" +
      "<c r=\"B2\" t=\"b\"><v>1</v></c><c r=\"C2\"/></row>" +
      "</sheetData></worksheet>")
    val sst = b("<sst><si><t>shared zero</t></si></sst>")
    val wb = b("<workbook><sheets>" +
      "<sheet name=\"S\" sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>")
    val wbRels = b("<Relationships><Relationship Id=\"rId1\" " +
      "Type=\"x/worksheet\" Target=\"worksheets/s1.xml\"/></Relationships>")
    val zip = Zip.write(Seq(
      ("xl/workbook.xml", wb, true),
      ("xl/_rels/workbook.xml.rels", wbRels, true),
      ("xl/sharedStrings.xml", sst, true),
      ("xl/worksheets/s1.xml", sheet, true)))
    assert(Xlsx.extractText(zip).contains(
      "shared zero\tinline & well\tformula out\n3.14\tTRUE\t"))
  }

  test("xlsx fences and dispatch: non-zip, plain archive, and the family cross-matrix incl. the workbook-blocks-docx trap") {
    assert(Xlsx.extractText(b("not a zip")).isEmpty)
    assert(Xlsx.extractText(Zip.write(Seq(
      ("readme.txt", b("archive"), true)))).isEmpty)
    // THE TRAP this round actually hit: an xlsx's officeDocument rels
    // Target resolves for Docx too (to the WORKBOOK xml) — the
    // dialect gate must return None there, not Some("")
    assert(Docx.extractText(Xlsx.write("cells\there")).isEmpty,
      "a workbook part must not scan as an empty WordprocessingML doc")
    assert(Xlsx.extractText(Docx.write("words")).isEmpty)
    // fence-whole: a LISTED sheet whose part is missing fences the
    // workbook (partial text must not read as a full success)
    val wbMissing = b("<workbook><sheets>" +
      "<sheet name=\"S\" sheetId=\"1\" r:id=\"rId1\"/>" +
      "<sheet name=\"T\" sheetId=\"2\" r:id=\"rId2\"/></sheets></workbook>")
    val relsMissing = b("<Relationships>" +
      "<Relationship Id=\"rId1\" Type=\"x/worksheet\" " +
      "Target=\"worksheets/s1.xml\"/>" +
      "<Relationship Id=\"rId2\" Type=\"x/worksheet\" " +
      "Target=\"worksheets/s2.xml\"/></Relationships>")
    val sheet1 = b("<worksheet><sheetData><row r=\"1\">" +
      "<c r=\"A1\"><v>1</v></c></row></sheetData></worksheet>")
    assert(Xlsx.extractText(Zip.write(Seq(
      ("xl/workbook.xml", wbMissing, true),
      ("xl/_rels/workbook.xml.rels", relsMissing, true),
      ("xl/worksheets/s1.xml", sheet1, true)))).isEmpty,
      "a listed-but-absent sheet part must fence the whole workbook")
    assert(Xlsx.extractText(Epub.write("book")).isEmpty)
    assert(Xlsx.extractText(Odt.write("odt")).isEmpty)
  }

  // ---- XlsText (legacy .xls, BIFF8) ----

  test("xls identity: extract(write(t)) == t across rows, cells, dedup, unicode, empty") {
    val cases = Seq(
      "",
      "one cell",
      "a\tb\tc",
      "row one\nrow two",
      "head1\thead2\nv1\tv2\nv3\tv4",
      "sparse\t\tcells\t",
      "repeated\trepeated\trepeated", // the shared-string dedup path
      "unicode: été 中文 " + new String(Character.toChars(0x1F600)),
      "mixed\tcells\nsecond\trow\n")
    cases.foreach { t =>
      assert(graft.multimodal.XlsText.extract(
        graft.multimodal.XlsText.write(t)).contains(t), s"case '$t'")
    }
  }

  test("xls SST continuation: strings past the 8224-byte record cap split into CONTINUE, both widths, char-boundary splits") {
    // one cell far past one record: compressed chars split across
    // CONTINUE with a fresh grbit per fragment
    val longAscii = ("lorem ipsum " * 900).trim // ~10.7KB > 8224
    assert(graft.multimodal.XlsText.extract(
      graft.multimodal.XlsText.write(longAscii)).contains(longAscii))
    // wide (UTF-16) chars splitting at a character boundary — 2-byte
    // units must never split mid-unit
    val longWide = ("中文字符串测试" * 800) // 5600 chars = 11.2KB wide
    assert(graft.multimodal.XlsText.extract(
      graft.multimodal.XlsText.write(longWide)).contains(longWide))
    // a table whose TOTAL crosses the cap even though each string is
    // small: header-at-boundary splits (headers never split — the
    // writer flushes before each)
    val many = (0 until 3000).map(i => s"cell$i").mkString("\n")
    val got = graft.multimodal.XlsText.extract(
      graft.multimodal.XlsText.write(many))
    assert(got.contains(many))
  }

  test("xls cell-record zoo: NUMBER, RK, MULRK, LABEL, BOOLERR, FORMULA cached results, BLANK") {
    // hand-built BIFF8 workbook: globals + one sheet of every cell
    // record the reader claims
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def rec(t: Int, d: Array[Byte]) = le16(t) ++ le16(d.length) ++ d
    def f64(v: Double) = {
      val bits = java.lang.Double.doubleToLongBits(v)
      le32(bits & 0xFFFFFFFFL) ++ le32(bits >>> 32)
    }
    def cellHdr(rw: Int, c: Int) = le16(rw) ++ le16(c) ++ le16(15)
    val bof8 = le16(0x0600) ++ le16(0x0010) ++ new Array[Byte](12)
    val sheet =
      rec(0x0809, bof8) ++
        // row 0: NUMBER 3.5, RK int 42, RK f64-packed 2.5, RK ×1/100
        rec(0x0203, cellHdr(0, 0) ++ f64(3.5)) ++
        rec(0x027E, cellHdr(0, 1) ++ le32((42L << 2) | 0x2)) ++
        rec(0x027E, cellHdr(0, 2) ++ le32(
          (java.lang.Double.doubleToLongBits(2.5) >>> 32) & 0xFFFFFFFCL)) ++
        rec(0x027E, cellHdr(0, 3) ++ le32(((1234L << 2) | 0x3))) ++
        // row 1: MULRK 7,8 at cols 0-1; LABEL inline; BOOLERR pair
        rec(0x00BD, le16(1) ++ le16(0) ++
          le16(15) ++ le32((7L << 2) | 0x2) ++
          le16(15) ++ le32((8L << 2) | 0x2) ++ le16(1)) ++
        rec(0x0204, cellHdr(1, 2) ++ le16(6) ++ Array(0.toByte) ++
          "inline".getBytes("ISO-8859-1")) ++
        rec(0x0205, cellHdr(1, 3) ++ Array(1.toByte, 0.toByte)) ++
        rec(0x0205, cellHdr(1, 4) ++ Array(0x17.toByte, 1.toByte)) ++
        // row 2: FORMULA cached number, cached string (+STRING),
        // cached bool, BLANK holding the column shape
        rec(0x0006, cellHdr(2, 0) ++ f64(9.25) ++ le16(0) ++
          le32(0L) ++ new Array[Byte](4)) ++
        rec(0x0006, cellHdr(2, 1) ++
          Array(0.toByte, 0.toByte) ++ le32(0L) ++ le16(0xFFFF) ++
          le16(0) ++ le32(0L) ++ new Array[Byte](4)) ++
        rec(0x0207, le16(3) ++ Array(0.toByte) ++
          "out".getBytes("ISO-8859-1")) ++
        rec(0x0006, cellHdr(2, 2) ++
          Array(1.toByte, 0.toByte, 1.toByte, 0.toByte) ++ le16(0) ++
          le16(0xFFFF) ++ le16(0) ++ le32(0L) ++ new Array[Byte](4)) ++
        rec(0x0201, cellHdr(2, 3)) ++
        rec(0x000A, Array.emptyByteArray)
    val name = "S".getBytes("ISO-8859-1")
    def globals(sheetOff: Int) =
      rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ new Array[Byte](12)) ++
        rec(0x0085, le32(sheetOff.toLong) ++ le16(0) ++
          Array(name.length.toByte, 0.toByte) ++ name) ++
        rec(0x000A, Array.emptyByteArray)
    val gLen = globals(0).length
    val wb = graft.multimodal.Cfb.write(
      Seq(("Workbook", globals(gLen) ++ sheet)))
    val got = graft.multimodal.XlsText.extract(wb).get
    assert(got ==
      "3.5\t42\t2.5\t12.34\n7\t8\tinline\tTRUE\t\n9.25\tout\tTRUE\t")
  }

  test("xls fences: encrypted FILEPASS, BIFF5, truncation, bad SST index, sheet offset OOB, dispatch cross-matrix") {
    import graft.multimodal.{Cfb, XlsText}
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def rec(t: Int, d: Array[Byte]) = le16(t) ++ le16(d.length) ++ d
    val good = XlsText.write("fence\ttarget\nrow two")
    assert(XlsText.extract(good).contains("fence\ttarget\nrow two"))
    // FILEPASS injected right after the globals BOF → fence closed
    val wbStream = Cfb.stream(good, "Workbook").get
    val bofLen = 4 + 16
    val withPass = wbStream.take(bofLen) ++
      rec(0x002F, le16(0) ++ le16(0) ++ le16(0)) ++ wbStream.drop(bofLen)
    assert(XlsText.extract(Cfb.write(Seq(("Workbook", withPass)))).isEmpty,
      "FILEPASS must fence")
    // BIFF5: version 0x0500 in BOF, or a Book-only container
    val biff5 = wbStream.clone(); biff5(4) = 0x00; biff5(5) = 0x05
    assert(XlsText.extract(Cfb.write(Seq(("Workbook", biff5)))).isEmpty,
      "BIFF5 BOF version must fence")
    assert(XlsText.extract(
      Cfb.write(Seq(("Book", wbStream)))).isEmpty,
      "a BIFF5-named Book stream is not a BIFF8 workbook")
    // truncated record stream → fence whole
    assert(XlsText.extract(Cfb.write(Seq(
      ("Workbook", wbStream.take(wbStream.length / 2))))).isEmpty)
    // SST index past the table → fence whole (not a silent blank)
    val badIx = wbStream.clone()
    // find the first LABELSST (type 0x00FD) and blow its isst field
    var p = 0
    var patched = false
    while (!patched && p + 4 <= badIx.length) {
      val t = (badIx(p) & 0xff) | ((badIx(p + 1) & 0xff) << 8)
      val l = (badIx(p + 2) & 0xff) | ((badIx(p + 3) & 0xff) << 8)
      if (t == 0x00FD) { badIx(p + 4 + 9) = 0x7F.toByte; patched = true }
      p += 4 + l
    }
    assert(patched)
    assert(XlsText.extract(Cfb.write(Seq(("Workbook", badIx)))).isEmpty)
    // dispatch cross-matrix: the legacy trio never cross-extract
    assert(XlsText.extract(graft.multimodal.DocText.write("w")).isEmpty)
    assert(graft.multimodal.DocText.extract(good).isEmpty)
    assert(XlsText.extract(b("not a cfb at all")).isEmpty)
    assert(Xlsx.extractText(good).isEmpty, "a BIFF8 xls is not an xlsx")
    assert(XlsText.extract(Xlsx.write("a\tb")).isEmpty,
      "an xlsx ZIP is not a BIFF8 xls")
    // truncated BOUNDSHEET (len < 6) must fence whole, not graze the
    // next record's header bytes as a sheet offset (ADVICE r15)
    val shortBs =
      rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ new Array[Byte](12)) ++
        rec(0x0085, Array(0.toByte, 0.toByte, 0.toByte, 0.toByte)) ++ // 4 < 6
        rec(0x000A, Array.emptyByteArray)
    assert(XlsText.extract(Cfb.write(Seq(("Workbook", shortBs)))).isEmpty,
      "a truncated BOUNDSHEET must fence")
    // the fixture writer enforces the BIFF8 per-string cch cap (u16)
    // instead of silently wrapping and breaking the identity oracle
    assertThrows[IllegalArgumentException] {
      XlsText.write("x" * 70000)
    }
  }

  // ---- PptText (legacy .ppt) ----

  test("ppt identity: extract(write(t)) == t across newlines, tabs, unicode, both atom arms, empty") {
    import graft.multimodal.PptText
    val cases = Seq(
      "",
      "a slide title",
      "bullet one\nbullet two\nbullet three",
      "tabs\tride\tthrough",
      "unicode: été 中文 " + new String(Character.toChars(0x1F600)))
    cases.foreach { t =>
      assert(PptText.extract(PptText.write(t)).contains(t), s"bytes '$t'")
      assert(PptText.extract(PptText.write(t, forceChars = true))
        .contains(t), s"chars '$t'")
    }
  }

  test("ppt: multi-atom decks join, CR/VT normalize, containers recurse; fences: crypt, cut record, no text, depth bomb") {
    import graft.multimodal.{Cfb, PptText}
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def rec(vi: Int, t: Int, d: Array[Byte]) =
      le16(vi) ++ le16(t) ++ le32(d.length.toLong) ++ d
    // two atoms at different nesting depths; VT soft break inside
    val deck = rec(0x000F, 0x03E8,
      rec(0x0000, 0x0FA8, "title\u000bsoft".getBytes("ISO-8859-1")) ++
        rec(0x000F, 0x0FF0,
          rec(0x0000, 0x0FA0, "中文 slide".getBytes("UTF-16LE"))))
    assert(PptText.extract(Cfb.write(Seq(("PowerPoint Document", deck))))
      .contains("title\nsoft\n中文 slide"))
    // CryptSession10Container anywhere fences closed
    val enc = deck ++ rec(0x000F, 0x2F14, Array.emptyByteArray)
    assert(PptText.extract(
      Cfb.write(Seq(("PowerPoint Document", enc)))).isEmpty)
    // a recLen past the payload fences whole
    val cut = rec(0x0000, 0x0FA8, "text".getBytes("ISO-8859-1"))
    val lied = cut.clone(); lied(4) = 99
    assert(PptText.extract(
      Cfb.write(Seq(("PowerPoint Document", lied)))).isEmpty)
    // no text atoms at all → None (image-only decks stay media)
    assert(PptText.extract(Cfb.write(Seq(("PowerPoint Document",
      rec(0x0000, 0x0BC1, Array[Byte](1, 2, 3))))))
      .isEmpty)
    // depth bomb: 40 nested containers → fence, never a stack death
    var bomb = rec(0x0000, 0x0FA8, "deep".getBytes("ISO-8859-1"))
    (0 until 40).foreach(_ => bomb = rec(0x000F, 0x03E8, bomb))
    assert(PptText.extract(
      Cfb.write(Seq(("PowerPoint Document", bomb)))).isEmpty)
    // dispatch cross-matrix
    assert(PptText.extract(graft.multimodal.DocText.write("w")).isEmpty)
    assert(PptText.extract(graft.multimodal.XlsText.write("x")).isEmpty)
    assert(graft.multimodal.XlsText.extract(PptText.write("p")).isEmpty)
  }

  test("xls fence: a truncated cell record fences whole instead of grazing the next record's header") {
    import graft.multimodal.{Cfb, XlsText}
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def rec(t: Int, d: Array[Byte]) = le16(t) ++ le16(d.length) ++ d
    val name = "S".getBytes("ISO-8859-1")
    def globals(off: Int) =
      rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ new Array[Byte](12)) ++
        rec(0x00FC, Array[Byte](1,0,0,0, 1,0,0,0, 1,0, 0, 'x'.toByte)) ++
        rec(0x0085, Array[Byte]((off & 0xff).toByte,
          ((off >> 8) & 0xff).toByte, 0, 0, 0, 0,
          name.length.toByte, 0) ++ name) ++
        rec(0x000A, Array.emptyByteArray)
    val gLen = globals(0).length
    // a LABELSST with only 4 data bytes: its isst read would land in
    // the next record's header — must fence, not emit a wrong cell
    val sheet =
      rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ new Array[Byte](12)) ++
        rec(0x00FD, le16(0) ++ le16(0)) ++
        rec(0x00FD, le16(0) ++ le16(1) ++ le16(15) ++
          Array[Byte](0, 0, 0, 0)) ++
        rec(0x000A, Array.emptyByteArray)
    assert(XlsText.extract(
      Cfb.write(Seq(("Workbook", globals(gLen) ++ sheet)))).isEmpty)
  }
}
