package graft.multimodal

import java.util.zip.{Deflater, Inflater}

/** Best-effort PDF TEXT EXTRACTION — the markup-strip equivalent for
  * the other big text carrier in a crawl (q76 strips HTML; PDFs
  * otherwise rot in the media face as opaque blobs). This is the
  * SYNTAX layer done for real: object/stream framing by linear scan
  * (no xref needed — the spec requires `stream`/`endstream` framing
  * regardless), FlateDecode via the JDK Inflater (the filter ~every
  * text PDF uses), raw streams as a fallback, and a content-stream
  * tokenizer that collects show-text operators (Tj, ', ", TJ arrays
  * with kerning numbers) inside BT…ET spans — literal strings with
  * the full escape grammar (\\n \\r \\t \\b \\f \\( \\) \\\\, octal
  * \\ooo, line continuations, nested parens) and hex strings.
  *
  * FONT-AWARE decoding (the subset-font recovery): the scan also
  * builds the object table (obj number → body range) as it walks, so
  * each content stream knows its owning object; page objects
  * (`/Type /Page`) are resolved to their `/Contents` streams and
  * `/Resources → /Font` dicts (inline or indirect, one level); fonts
  * carrying a `/ToUnicode` CMap stream get that CMap parsed
  * (codespacerange widths, bfchar pairs, bfrange in both the
  * increment-base and array forms) and the tokenizer decodes
  * show-strings through the CMap of the font selected by `Tf` —
  * glyph ids become real text. A code the CMap does not map emits
  * U+FFFD (which the crawl face's printability fence then scores).
  *
  * Stated limitations (the honest contract): fonts WITHOUT /ToUnicode
  * fall back to UTF-8-with-replacement string bytes — correct for our
  * own writer and simple-font ASCII/WinAnsi text, mojibake for
  * subset-embedded glyph-id fonts (the [[graft.sources.WarcSource]]
  * pdfDocuments face fences that mojibake into quarantine instead of
  * the corpus). Predefined CMap NAMES (/Encoding /GBK-EUC-H without
  * an embedded ToUnicode) are not shipped — such text also fences.
  * Encrypted PDFs (`/Encrypt` in the trailer) fence to None — their
  * strings are RC4/AES ciphertext. Layout is reading-order-naive:
  * strings concatenate in content order, text-positioning operators
  * (Td/TD/T*) become newlines.
  *
  * [[write]] is the fixture generator: a real single-page PDF —
  * catalog/pages/page objects, a FlateDecode content stream, a
  * correct xref table with byte offsets — whose Tj carries the text's
  * UTF-8 bytes with the escape grammar applied. extract(write(t)) ==
  * t exactly, which is the q127 oracle (the whole Flate + framing +
  * escape machinery must cancel). [[writeGlyph]] is the subset-font
  * analogue: show-strings carry 2-byte glyph ids under an Identity-H
  * Type0 font, with or without the /ToUnicode CMap — WITH it,
  * extract(writeGlyph(t, true)) == t through the whole CMap pass;
  * without it the extraction is mojibake by construction (the fence
  * fixture).
  */
object PdfText {

  // ---------------------------------------------------------------
  // Writers (fixture generators)
  // ---------------------------------------------------------------

  private def escape(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length + 16)
    bytes.foreach { b =>
      b match {
        case '(' => out.write('\\'); out.write('(')
        case ')' => out.write('\\'); out.write(')')
        case '\\' => out.write('\\'); out.write('\\')
        case '\r' => out.write('\\'); out.write('r')
        case '\n' => out.write('\\'); out.write('n')
        case _ => out.write(b & 0xff)
      }
    }
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    try {
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](1 << 14)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** A real single-page PDF showing `text` (UTF-8 bytes through the
    * escape grammar) in one FlateDecode content stream.
    */
  def write(text: String): Array[Byte] = {
    val content = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("BT /F1 12 Tf 72 720 Td (".getBytes("ISO-8859-1"))
      o.write(escape(text.getBytes("UTF-8")))
      o.write(") Tj ET".getBytes("ISO-8859-1"))
      o.toByteArray
    }
    val flate = deflate(content)
    val out = new java.io.ByteArrayOutputStream(flate.length + 1024)
    val offsets = new Array[Int](6)
    def put(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    put("%PDF-1.4\n")
    offsets(1) = out.size()
    put("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = out.size()
    put("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets(3) = out.size()
    put("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    offsets(4) = out.size()
    put(s"4 0 obj << /Length ${flate.length} /Filter /FlateDecode >> stream\n")
    out.write(flate, 0, flate.length)
    put("\nendstream endobj\n")
    offsets(5) = out.size()
    put("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      ">> endobj\n")
    val xrefAt = out.size()
    put("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(i => put(f"${offsets(i)}%010d 00000 n \n"))
    put(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** A real single-page PDF whose show-string carries 2-BYTE GLYPH
    * IDS under an Identity-H Type0 font — the subset-embedded-font
    * shape that dominates real crawl PDFs. Glyph ids are assigned
    * 1..k over the text's distinct chars (BMP fixture contract, no
    * newlines), so the raw string bytes are meaningless without the
    * mapping. With `withToUnicode` a /ToUnicode CMap stream maps them
    * back — even-indexed glyphs via bfchar pairs, odd-indexed via
    * lo==hi bfrange entries, so ONE fixture exercises both sections —
    * and extract == text exactly; without it the extraction is
    * glyph-id mojibake by construction.
    */
  def writeGlyph(text: String, withToUnicode: Boolean): Array[Byte] = {
    require(!text.exists(c => c == '\n' || c == '\r'),
      "glyph fixture contract: single-line text")
    val chars = text.toCharArray.distinct
    require(chars.length < 0xfffe, "glyph fixture: too many distinct chars")
    val gid = chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val hex = text.map(c => f"${gid(c)}%04X").mkString
    val content = deflate(
      s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET".getBytes("ISO-8859-1"))
    val cmapStream: Array[Byte] = {
      val bfchar = new StringBuilder
      val bfrange = new StringBuilder
      var nChar = 0; var nRange = 0
      chars.zipWithIndex.foreach { case (c, i) =>
        val src = f"${i + 1}%04X"
        val dst = f"${c.toInt}%04X"
        if (i % 2 == 0) { bfchar.append(s"<$src> <$dst>\n"); nChar += 1 }
        else { bfrange.append(s"<$src> <$src> <$dst>\n"); nRange += 1 }
      }
      deflate((
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
          "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
          (if (nChar > 0) s"$nChar beginbfchar\n$bfchar" + "endbfchar\n"
           else "") +
          (if (nRange > 0) s"$nRange beginbfrange\n$bfrange" + "endbfrange\n"
           else "") +
          "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
        .getBytes("ISO-8859-1"))
    }
    val toUni = if (withToUnicode) " /ToUnicode 6 0 R" else ""
    val objs = Seq[Either[String, (String, Array[Byte])]](
      Left("<< /Type /Catalog /Pages 2 0 R >>"),
      Left("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      Left("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
      Right(("<< /Length " + content.length + " /Filter /FlateDecode >>",
        content)),
      Left("<< /Type /Font /Subtype /Type0 /BaseFont /GRFTAA+Fake " +
        s"/Encoding /Identity-H$toUni >>")) ++
      (if (withToUnicode)
        Seq(Right(("<< /Length " + cmapStream.length +
          " /Filter /FlateDecode >>", cmapStream)))
       else Nil)
    val out = new java.io.ByteArrayOutputStream(content.length + 2048)
    def put(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    put("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (o, ix) =>
      offsets(ix + 1) = out.size()
      o match {
        case Left(dict) => put(s"${ix + 1} 0 obj $dict endobj\n")
        case Right((dict, data)) =>
          put(s"${ix + 1} 0 obj $dict stream\n")
          out.write(data, 0, data.length)
          put("\nendstream endobj\n")
      }
    }
    val xrefAt = out.size()
    put(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    (1 to objs.length).foreach(i => put(f"${offsets(i)}%010d 00000 n \n"))
    put(s"trailer << /Size ${objs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Extractor: low-level scanning
  // ---------------------------------------------------------------

  private def startsWithAt(b: Array[Byte], s: String, p: Int): Boolean = {
    val pat = s.getBytes("ISO-8859-1")
    if (p < 0 || p + pat.length > b.length) return false
    var j = 0
    while (j < pat.length && b(p + j) == pat(j)) j += 1
    j == pat.length
  }

  private def indexOfAscii(b: Array[Byte], s: String, from: Int): Int = {
    val pat = s.getBytes("ISO-8859-1")
    var i = math.max(from, 0)
    val last = b.length - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Bounded indexOf: match must START before `to`. */
  private def indexOfAsciiIn(b: Array[Byte], s: String,
                             from: Int, to: Int): Int = {
    val i = indexOfAscii(b, s, from)
    if (i >= 0 && i < to) i else -1
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(
        math.min(data.length.toLong * 3 + 64, 1L << 20).toInt)
      val buf = new Array[Byte](1 << 14)
      var n = inf.inflate(buf)
      while (n > 0 || (!inf.finished() && !inf.needsInput() &&
          !inf.needsDictionary())) {
        if (n > 0) out.write(buf, 0, n)
        if (out.size() > (1 << 26)) return None // decompression bomb
        n = inf.inflate(buf)
      }
      // a stall (needsInput before the final block) is a TRUNCATED
      // deflate stream — emitting the partial output as corpus text
      // would fence inconsistently with a checksum-corrupt stream
      // (DataFormatException → None); damaged is damaged either way,
      // mirroring Png.decode's strict got<expected fence
      if (!inf.finished() || out.size() == 0) None
      else Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** One document walk's results: decoded stream blocks tagged with
    * their owning object number (document order — what [[textOf]]
    * consumes), plus the object table (obj number → body range after
    * the `obj` keyword; LAST definition wins, matching incremental-
    * update semantics where appended object versions govern).
    */
  private final case class Scanned(
      streams: Vector[(Int, Array[Byte])],
      objBody: Map[Int, (Int, Int)])

  /** The next `N G obj` header at/after `from`: (headerStart, objNum,
    * bodyStart). Validated backwards from the `obj` keyword so
    * `endobj` never matches and binary bytes cannot spoof a header
    * without the full digits-ws-digits-ws-obj shape.
    */
  private def nextHeader(b: Array[Byte], from: Int): Option[(Int, Int, Int)] = {
    var k = indexOfAscii(b, "obj", from)
    while (k >= 0) {
      val after = k + 3
      val delimAfter = after >= b.length || isDelim(b(after) & 0xff)
      if (delimAfter && k >= 4) {
        var p = k - 1
        while (p >= from && (b(p) == ' ' || b(p) == '\t' ||
          b(p) == '\r' || b(p) == '\n')) p -= 1
        val genEnd = p
        while (p >= from && b(p) >= '0' && b(p) <= '9') p -= 1
        val genStart = p + 1
        if (genEnd >= genStart && genEnd - genStart < 6) {
          val wsEnd = p
          while (p >= from && (b(p) == ' ' || b(p) == '\t' ||
            b(p) == '\r' || b(p) == '\n')) p -= 1
          if (p < wsEnd) { // at least one ws between num and gen
            val numEnd = p
            while (p >= from && b(p) >= '0' && b(p) <= '9') p -= 1
            val numStart = p + 1
            val numLen = numEnd - numStart + 1
            if (numLen >= 1 && numLen <= 9 &&
                (numStart == 0 || isDelim(b(numStart - 1) & 0xff))) {
              var v = 0
              var q = numStart
              while (q <= numEnd) { v = v * 10 + (b(q) - '0'); q += 1 }
              return Some((numStart, v, after))
            }
          }
        }
      }
      k = indexOfAscii(b, "obj", k + 1)
    }
    None
  }

  /** The document walk: objects and streams in ONE document-order
    * pass, so stream payloads (framed by the dict's direct `/Length N`
    * when it checks out — compressed data can contain the LITERAL
    * bytes "endstream"/"N 0 obj"; the keyword scan is the fallback
    * for indirect-reference lengths) are skipped before the header
    * scan can see spoofed tokens inside them. Flate-inflated streams
    * where possible, raw otherwise; a DECLARED-filtered stream whose
    * inflate fails is binary (DCTDecode image, font program) and
    * contributes nothing.
    */
  private def scanDoc(bytes: Array[Byte]): Scanned = {
    val streams = Vector.newBuilder[(Int, Array[Byte])]
    val objBody = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var pos = 0
    var curObj = -1
    var curStart = -1
    def closeObj(end: Int): Unit =
      if (curObj >= 0) objBody(curObj) = (curStart, end)
    var going = true
    while (going) {
      val h = nextHeader(bytes, pos)
      var s = indexOfAscii(bytes, "stream", pos)
      // "endstream" CONTAINS "stream": a match whose preceding bytes
      // are "end" is the previous stream's terminator, not a new
      // stream — the misframe the multi-stream spec pins
      while (s >= 3 && startsWithAt(bytes, "end", s - 3))
        s = indexOfAscii(bytes, "stream", s + 1)
      if (h.isDefined && (s < 0 || h.get._1 < s)) {
        val (hs, num, bodyStart) = h.get
        closeObj(hs)
        curObj = num; curStart = bodyStart
        pos = bodyStart
      } else if (s >= 0) {
        // data starts after the keyword's EOL (CRLF or LF per spec)
        var d = s + "stream".length
        if (d < bytes.length && bytes(d) == '\r') d += 1
        if (d < bytes.length && bytes(d) == '\n') d += 1
        // the stream dict: the ~400 bytes before the keyword — carries
        // the direct /Length and whether a /Filter is declared. Floored
        // at this iteration's scan start: a blind s-400 reaches back
        // into the PREVIOUS object's dict and inherits its /Filter,
        // which silently skipped the following unfiltered stream (the
        // multi-stream spec's mixed fixture caught it)
        val winStart = math.max(pos, s - 400)
        val filtered = {
          val fi = indexOfAscii(bytes, "/Filter", winStart)
          fi >= 0 && fi < s
        }
        var lenVal = -1
        var li = indexOfAscii(bytes, "/Length", winStart)
        while (li >= 0 && li < s) {
          var p = li + "/Length".length
          while (p < s && (bytes(p) == ' ' || bytes(p) == '\t')) p += 1
          var v = 0L; var digits = 0
          while (p < s && bytes(p) >= '0' && bytes(p) <= '9' && digits < 10) {
            v = v * 10 + (bytes(p) - '0'); p += 1; digits += 1
          }
          // an indirect ref (`12 0 R`) leaves digits>0 but is followed
          // by ` 0 R` — only accept a length whose framing CHECKS OUT:
          // "endstream" must start within 4 bytes (EOL allowance) of
          // d+v. Constant-size window compare, not a scan to EOF.
          if (digits > 0 && d + v <= bytes.length &&
              (0 to 4).exists(k => startsWithAt(bytes, "endstream",
                (d + v).toInt + k)))
            lenVal = v.toInt
          li = indexOfAscii(bytes, "/Length", li + 1)
        }
        val (data, nextPos) =
          if (lenVal >= 0)
            (java.util.Arrays.copyOfRange(bytes, d, d + lenVal), d + lenVal)
          else {
            val e = indexOfAscii(bytes, "endstream", d)
            if (e < 0) (null, -1) // truncated stream: stop, keep prior
            else {
              var end = e
              // strip the EOL before `endstream`
              if (end > d && bytes(end - 1) == '\n') end -= 1
              if (end > d && bytes(end - 1) == '\r') end -= 1
              (java.util.Arrays.copyOfRange(bytes, d, end), e)
            }
          }
        if (data == null) going = false
        else {
          inflate(data) match {
            case Some(x) => streams += ((curObj, x))
            case None => if (!filtered) streams += ((curObj, data))
          }
          pos = nextPos + 1
        }
      } else going = false
    }
    closeObj(bytes.length)
    Scanned(streams.result(), objBody.toMap)
  }

  // ---------------------------------------------------------------
  // ToUnicode CMaps
  // ---------------------------------------------------------------

  /** A parsed /ToUnicode CMap: codespace widths + ranges, bfchar map,
    * bfrange list (increment-base or explicit-array form). Decoding
    * walks the shown bytes matching codespace widths ascending (the
    * spec's byte-matching rule, simplified to whole-width compare);
    * a code no section maps emits U+FFFD — which feeds the crawl
    * face's printability fence rather than silently inventing text.
    */
  private[graft] final class CMap(
      val spaceRanges: Seq[(Int, Long, Long)], // (byteWidth, lo, hi)
      val chars: Map[(Int, Long), String],
      val ranges: Seq[(Int, Long, Long, Either[String, Vector[String]])]) {

    private val widths: Seq[Int] = {
      val ws = (spaceRanges.map(_._1) ++ chars.keys.map(_._1) ++
        ranges.map(_._1)).distinct.sorted
      if (ws.isEmpty) Seq(1) else ws
    }
    private val hasSpace = spaceRanges.nonEmpty

    private def inSpace(w: Int, code: Long): Boolean =
      spaceRanges.exists(r => r._1 == w && code >= r._2 && code <= r._3)

    private def lookup(w: Int, code: Long): Option[String] =
      chars.get((w, code)).orElse {
        ranges.collectFirst {
          case (rw, lo, hi, dst) if rw == w && code >= lo && code <= hi =>
            dst match {
              case Left(base) =>
                if (base.isEmpty) "�"
                else {
                  val cs = base.toCharArray
                  cs(cs.length - 1) = (cs(cs.length - 1) + (code - lo)).toChar
                  new String(cs)
                }
              case Right(arr) =>
                val ix = (code - lo).toInt
                if (ix < arr.length) arr(ix) else "�"
            }
        }
      }

    def decode(bs: Array[Byte]): String = {
      val sb = new java.lang.StringBuilder(bs.length)
      var i = 0
      while (i < bs.length) {
        var w = -1
        var wi = 0
        while (w < 0 && wi < widths.length) {
          val cand = widths(wi)
          if (i + cand <= bs.length) {
            var code = 0L
            var j = 0
            while (j < cand) { code = (code << 8) | (bs(i + j) & 0xff); j += 1 }
            if (!hasSpace || inSpace(cand, code)) w = cand
          }
          wi += 1
        }
        if (w < 0) { sb.append('�'); i += 1 }
        else {
          var code = 0L
          var j = 0
          while (j < w) { code = (code << 8) | (bs(i + j) & 0xff); j += 1 }
          sb.append(lookup(w, code).getOrElse("�"))
          i += w
        }
      }
      sb.toString
    }
  }

  /** Parse a decoded /ToUnicode CMap stream. The CMap grammar is
    * PostScript-shaped; only the three sections that carry the
    * mapping are interpreted (codespacerange, bfchar, bfrange) — a
    * bounded token walk, capped (64k chars / 4k ranges) so a hostile
    * stream cannot balloon the driver-free per-row kernel.
    */
  private[graft] def parseCMap(text: Array[Byte]): CMap = {
    val spaceRanges = Seq.newBuilder[(Int, Long, Long)]
    val chars = Map.newBuilder[(Int, Long), String]
    val ranges = Seq.newBuilder[(Int, Long, Long, Either[String, Vector[String]])]
    var nChars = 0; var nRanges = 0

    // token scan: hex strings, array brackets, keywords; everything
    // else (numbers, names, literals, dict brackets) skipped
    sealed trait Tok
    case class Hex(bytes: Array[Byte]) extends Tok
    case class Kw(s: String) extends Tok
    case object ArrOpen extends Tok
    case object ArrClose extends Tok

    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var i = 0
    while (i < text.length && toks.length < (1 << 19)) {
      val c = text(i) & 0xff
      if (c == '%') { // comment to EOL
        while (i < text.length && text(i) != '\n') i += 1
      } else if (c == '<' && i + 1 < text.length &&
          (text(i + 1) & 0xff) != '<') {
        hexString(text, i) match {
          case Some((bs, ni)) => toks += Hex(bs); i = ni
          case None => i = text.length
        }
      } else if (c == '<') { i += 2 }
      else if (c == '[') { toks += ArrOpen; i += 1 }
      else if (c == ']') { toks += ArrClose; i += 1 }
      else if (c == '(') {
        literal(text, i) match {
          case Some((_, ni)) => i = ni
          case None => i = text.length
        }
      } else if (Character.isLetter(c)) {
        val start = i
        while (i < text.length && !isDelim(text(i) & 0xff)) i += 1
        toks += Kw(new String(text, start, i - start, "ISO-8859-1"))
      } else i += 1
    }

    def be(bs: Array[Byte]): Long = {
      var v = 0L
      bs.foreach(b => v = (v << 8) | (b & 0xff))
      v
    }
    def utf16(bs: Array[Byte]): String = new String(bs, "UTF-16BE")

    var t = 0
    while (t < toks.length) {
      toks(t) match {
        case Kw("begincodespacerange") =>
          t += 1
          while (t + 1 < toks.length && !toks(t).isInstanceOf[Kw]) {
            (toks(t), toks(t + 1)) match {
              case (Hex(lo), Hex(hi)) if lo.nonEmpty && lo.length <= 4 =>
                spaceRanges += ((lo.length, be(lo), be(hi)))
              case _ =>
            }
            t += 2
          }
        case Kw("beginbfchar") =>
          t += 1
          while (t + 1 < toks.length && !toks(t).isInstanceOf[Kw]) {
            (toks(t), toks(t + 1)) match {
              case (Hex(src), Hex(dst))
                  if src.nonEmpty && src.length <= 4 && nChars < (1 << 16) =>
                chars += ((src.length, be(src)) -> utf16(dst))
                nChars += 1
              case _ =>
            }
            t += 2
          }
        case Kw("beginbfrange") =>
          t += 1
          var more = true
          while (more && t + 2 < toks.length && !toks(t).isInstanceOf[Kw]) {
            (toks(t), toks(t + 1), toks(t + 2)) match {
              case (Hex(lo), Hex(hi), Hex(dst))
                  if lo.nonEmpty && lo.length <= 4 && nRanges < (1 << 12) =>
                ranges += ((lo.length, be(lo), be(hi), Left(utf16(dst))))
                nRanges += 1
                t += 3
              case (Hex(lo), Hex(hi), ArrOpen)
                  if lo.nonEmpty && lo.length <= 4 =>
                val arr = Vector.newBuilder[String]
                t += 3
                var n = 0
                while (t < toks.length && toks(t) != ArrClose) {
                  toks(t) match {
                    case Hex(d) if n < (1 << 12) => arr += utf16(d); n += 1
                    case _ =>
                  }
                  t += 1
                }
                t += 1 // past ]
                if (nRanges < (1 << 12)) {
                  ranges += ((lo.length, be(lo), be(hi), Right(arr.result())))
                  nRanges += 1
                }
              case _ => more = false
            }
          }
        case _ => t += 1
      }
      toks.lift(t) match {
        case Some(Kw(k))
            if k == "begincodespacerange" || k == "beginbfchar" ||
              k == "beginbfrange" => // loop re-dispatches
        case _ => if (t < toks.length && toks(t).isInstanceOf[Kw]) t += 1
      }
    }
    new CMap(spaceRanges.result(), chars.result(), ranges.result())
  }

  // ---------------------------------------------------------------
  // Page / font resolution
  // ---------------------------------------------------------------

  private def skipWs(b: Array[Byte], from: Int, to: Int): Int = {
    var p = from
    while (p < to && (b(p) == ' ' || b(p) == '\t' || b(p) == '\r' ||
      b(p) == '\n')) p += 1
    p
  }

  /** Parse `N G R` starting at the first digit ≥ p: (objNum, after). */
  private def parseRef(b: Array[Byte], from: Int, to: Int): Option[(Int, Int)] = {
    var p = skipWs(b, from, to)
    var num = 0L; var d1 = 0
    while (p < to && b(p) >= '0' && b(p) <= '9' && d1 < 9) {
      num = num * 10 + (b(p) - '0'); p += 1; d1 += 1
    }
    if (d1 == 0) return None
    val p2 = skipWs(b, p, to)
    if (p2 == p) return None
    p = p2
    var d2 = 0
    while (p < to && b(p) >= '0' && b(p) <= '9' && d2 < 6) { p += 1; d2 += 1 }
    if (d2 == 0) return None
    p = skipWs(b, p, to)
    if (p < to && b(p) == 'R' &&
        (p + 1 >= to || isDelim(b(p + 1) & 0xff)))
      Some((num.toInt, p + 1))
    else None
  }

  /** End position after the `>>` matching the `<<` at p. */
  private def dictExtent(b: Array[Byte], p: Int, to: Int): Int = {
    var i = p
    var depth = 0
    while (i + 1 < to) {
      if (b(i) == '<' && b(i + 1) == '<') { depth += 1; i += 2 }
      else if (b(i) == '>' && b(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else i += 1
    }
    to
  }

  /** `/Key` occurrences require a delimiter after the name so `/Font`
    * never matches `/FontFile`, `/Page` never matches `/Pages`.
    */
  private def findKey(b: Array[Byte], key: String, from: Int, to: Int): Int = {
    var k = indexOfAsciiIn(b, key, from, to)
    while (k >= 0) {
      val after = k + key.length
      if (after >= b.length || isDelim(b(after) & 0xff)) return k
      k = indexOfAsciiIn(b, key, k + 1, to)
    }
    -1
  }

  /** The dict region of an object: body start to its `stream` keyword
    * (a stream object's dict precedes the keyword) or body end.
    */
  private def dictRegion(b: Array[Byte], body: (Int, Int)): (Int, Int) = {
    val (s, e) = body
    val st = indexOfAsciiIn(b, "stream", s, e)
    (s, if (st >= 0) st else e)
  }

  /** Resolve a value that is either an inline `<< … >>` dict at p or
    * an `N G R` reference to an object whose body is the dict.
    */
  private def dictAt(b: Array[Byte], from: Int, to: Int,
                     objBody: Map[Int, (Int, Int)]): Option[(Int, Int)] = {
    val p = skipWs(b, from, to)
    if (p + 1 < to && b(p) == '<' && b(p + 1) == '<')
      Some((p, dictExtent(b, p, to)))
    else parseRef(b, p, to).flatMap(r => objBody.get(r._1))
      .map(body => dictRegion(b, body))
  }

  /** Font-name → font-object entries of a /Font dict region: `/Fn N G
    * R` pairs (name token immediately followed by a reference).
    */
  private def fontEntries(b: Array[Byte], from: Int, to: Int): Map[String, Int] = {
    val out = Map.newBuilder[String, Int]
    var i = from
    while (i < to) {
      if (b(i) == '/') {
        var j = i + 1
        while (j < to && !isDelim(b(j) & 0xff)) j += 1
        val name = new String(b, i + 1, j - i - 1, "ISO-8859-1")
        parseRef(b, j, to) match {
          case Some((obj, after)) if name.nonEmpty =>
            out += (name -> obj); i = after
          case _ => i = j
        }
      } else i += 1
    }
    out.result()
  }

  /** Per-content-stream font CMaps: every `/Type /Page` object's
    * `/Contents` streams inherit the page's `/Resources → /Font`
    * entries that carry a parsed /ToUnicode CMap. Resources and Font
    * values resolve one level of indirection (the common real-PDF
    * shape); a page whose resolution fails simply decodes UTF-8 (the
    * pre-CMap behavior — fail-open to the fence, never a crash).
    */
  private def contentFontMaps(b: Array[Byte],
                              sc: Scanned): Map[Int, Map[String, CMap]] = {
    // ToUnicode CMaps parse once per CMap object, shared across fonts
    val cmapCache = scala.collection.mutable.Map.empty[Int, Option[CMap]]
    def cmapOf(obj: Int): Option[CMap] =
      cmapCache.getOrElseUpdate(obj,
        sc.streams.collectFirst { case (o, data) if o == obj => data }
          .map(parseCMap))
    val out = scala.collection.mutable.Map.empty[Int, Map[String, CMap]]
    sc.objBody.foreach { case (_, body) =>
      val (ds, de) = dictRegion(b, body)
      val tk = findKey(b, "/Type", ds, de)
      val isPage = tk >= 0 && {
        val p = skipWs(b, tk + 5, de)
        startsWithAt(b, "/Page", p) &&
          (p + 5 >= de || isDelim(b(p + 5) & 0xff))
      }
      if (isPage) {
        // contents: single ref or array of refs
        val contents = {
          val ck = findKey(b, "/Contents", ds, de)
          if (ck < 0) Nil
          else {
            val p = skipWs(b, ck + 9, de)
            if (p < de && b(p) == '[') {
              val refs = Seq.newBuilder[Int]
              var q = p + 1
              var ok = true
              while (ok && q < de && b(q) != ']') {
                parseRef(b, q, de) match {
                  case Some((o, after)) => refs += o; q = after
                  case None => ok = false
                }
                q = skipWs(b, q, de)
              }
              refs.result()
            } else parseRef(b, p, de).map(_._1).toSeq
          }
        }
        if (contents.nonEmpty) {
          val fonts: Map[String, CMap] = (for {
            rk <- Some(findKey(b, "/Resources", ds, de)) if rk >= 0
            (rs, re) <- dictAt(b, rk + 10, de, sc.objBody)
            fk <- Some(findKey(b, "/Font", rs, re)) if fk >= 0
            (fs, fe) <- dictAt(b, fk + 5, re, sc.objBody)
          } yield fontEntries(b, fs, fe).flatMap { case (name, fontObj) =>
            sc.objBody.get(fontObj).flatMap { fb =>
              val (fds, fde) = dictRegion(b, fb)
              val uk = findKey(b, "/ToUnicode", fds, fde)
              if (uk < 0) None
              else parseRef(b, uk + 10, fde).flatMap(r => cmapOf(r._1))
                .map(name -> _)
            }
          }).getOrElse(Map.empty)
          if (fonts.nonEmpty)
            contents.foreach(c => out.getOrElseUpdate(c, fonts))
        }
      }
    }
    out.toMap
  }

  // ---------------------------------------------------------------
  // Content-stream tokenizer
  // ---------------------------------------------------------------

  /** Parse one literal string starting AT the '(' — returns (bytes,
    * position after the closing ')'); None on an unterminated string.
    */
  private def literal(b: Array[Byte], open: Int): Option[(Array[Byte], Int)] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = open + 1
    var depth = 1
    while (i < b.length) {
      (b(i) & 0xff) match {
        case '\\' =>
          if (i + 1 >= b.length) return None
          (b(i + 1) & 0xff) match {
            case 'n' => out.write('\n'); i += 2
            case 'r' => out.write('\r'); i += 2
            case 't' => out.write('\t'); i += 2
            case 'b' => out.write('\b'); i += 2
            case 'f' => out.write('\f'); i += 2
            case '(' => out.write('('); i += 2
            case ')' => out.write(')'); i += 2
            case '\\' => out.write('\\'); i += 2
            case '\r' => // line continuation (swallow optional LF)
              i += 2; if (i < b.length && b(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' => // \ooo octal, 1-3 digits
              var v = 0; var n = 0; i += 1
              while (n < 3 && i < b.length &&
                  b(i) >= '0' && b(i) <= '7') {
                v = v * 8 + (b(i) - '0'); i += 1; n += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); i += 2 // \x = x per spec
          }
        case '(' => depth += 1; out.write('('); i += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return Some((out.toByteArray, i + 1))
          out.write(')'); i += 1
        case c => out.write(c); i += 1
      }
    }
    None
  }

  /** Parse one hex string starting AT the '<' (caller has excluded
    * '<<'): (bytes, position after '>').
    */
  private def hexString(b: Array[Byte], open: Int): Option[(Array[Byte], Int)] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = open + 1
    var hi = -1
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4) // odd count: low nibble 0
        return Some((out.toByteArray, i + 1))
      }
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      } // whitespace and junk skip
      i += 1
    }
    None
  }

  /** The text of one decoded content stream: strings shown by
    * Tj / ' / " / TJ inside BT…ET, in content order; Td/TD/T*
    * become newlines between shows. Show-string bytes decode through
    * the CMap of the `Tf`-selected font when `fonts` carries one
    * (captured per pending string at ADD time — a Tf between shows
    * cannot retroactively re-decode), UTF-8-with-replacement
    * otherwise (the simple-font path).
    */
  private def textOf(content: Array[Byte],
                     fonts: Map[String, CMap]): String = {
    val sb = new java.lang.StringBuilder
    val pend =
      scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Option[CMap])]
    var inText = false
    var needBreak = false
    var lastName: String = ""
    var curMap: Option[CMap] = None
    var i = 0
    def flush(show: Boolean): Unit = {
      if (show && inText) {
        if (needBreak && sb.length > 0) sb.append('\n')
        needBreak = false
        pend.foreach { case (bs, m) =>
          sb.append(m match {
            case Some(cm) => cm.decode(bs)
            case None =>
              new String(bs, java.nio.charset.StandardCharsets.UTF_8)
          })
        }
      }
      pend.clear()
    }
    while (i < content.length) {
      val c = content(i) & 0xff
      if (c == '(') {
        literal(content, i) match {
          case Some((bs, ni)) => pend += ((bs, curMap)); i = ni
          case None => return sb.toString // unterminated: keep prior
        }
      } else if (c == '<' &&
          (i + 1 >= content.length || content(i + 1) != '<')) {
        hexString(content, i) match {
          case Some((bs, ni)) => pend += ((bs, curMap)); i = ni
          case None => return sb.toString
        }
      } else if (c == '<') {
        i += 2 // dictionary open: skip both
      } else if (c == '/') {
        // name token: remembered so a following Tf can resolve the
        // font (operand order is `/F1 12 Tf`)
        val start = i + 1
        i += 1
        while (i < content.length && !isDelim(content(i) & 0xff)) i += 1
        lastName = new String(content, start, i - start, "ISO-8859-1")
      } else if (Character.isLetter(c) || c == '\'' || c == '"' || c == '*') {
        // read an operator/name token
        val start = i
        while (i < content.length && !isDelim(content(i) & 0xff)) i += 1
        val tok = new String(content, start, i - start, "ISO-8859-1")
        tok match {
          case "BT" => inText = true; pend.clear(); needBreak = false
          case "ET" => flush(show = false); inText = false
          case "Tf" => curMap = fonts.get(lastName); pend.clear()
          case "Tj" | "TJ" => flush(show = true)
          case "'" | "\"" => needBreak = true; flush(show = true)
          case "Td" | "TD" | "T*" =>
            pend.clear(); needBreak = true
          case "BI" =>
            // inline image: skip to the whitespace-delimited EI token
            // — an unescaped '(' inside the binary would otherwise
            // open a phantom string and eat the rest of the stream
            var j = i
            var found = -1
            while (found < 0 && j + 2 < content.length) {
              if ((content(j) == ' ' || content(j) == '\n' ||
                   content(j) == '\r' || content(j) == '\t') &&
                  content(j + 1) == 'E' && content(j + 2) == 'I' &&
                  (j + 3 >= content.length ||
                    isDelim(content(j + 3) & 0xff))) found = j + 3
              j += 1
            }
            if (found < 0) return sb.toString // cut image: keep prior
            i = found
          case _ => pend.clear() // any other operator consumes operands
        }
      } else i += 1
    }
    sb.toString
  }

  private def isDelim(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == 0 || c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** Fallback /Encrypt scan window for documents WITHOUT a `trailer`
    * keyword (PDF 1.5+ cross-reference streams keep the trailer dict
    * inside the xref stream at the document tail).
    */
  val EncryptWindow = 4096

  /** Extract the document's show-text, best effort. None: not a PDF
    * (magic) or encrypted — /Encrypt in the governing TRAILER dict
    * (after the LAST `trailer` keyword — a document that merely
    * MENTIONS "/Encrypt" in its content stays in the corpus; when no
    * trailer keyword exists, the xref-stream tail window is scanned
    * instead). Encrypted strings are ciphertext, and emitting
    * ciphertext as text would poison the corpus (the WarcSource
    * NUL-fence rationale).
    */
  def extract(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 5 ||
        !new String(bytes, 0, 5, "ISO-8859-1").startsWith("%PDF-")) return None
    // the /Encrypt key lives in the governing trailer dict: scan after
    // the LAST `trailer` keyword (incremental updates append trailers;
    // the last one governs), falling back to the tail window for
    // xref-stream documents that have none
    var trailerAt = -1
    var ti = indexOfAscii(bytes, "trailer", 0)
    while (ti >= 0) { trailerAt = ti; ti = indexOfAscii(bytes, "trailer", ti + 1) }
    val scanFrom =
      if (trailerAt >= 0) trailerAt
      else math.max(0, bytes.length - EncryptWindow)
    if (indexOfAscii(bytes, "/Encrypt", scanFrom) >= 0) return None
    val sc = scanDoc(bytes)
    val fontsByContent = contentFontMaps(bytes, sc)
    val parts = sc.streams
      .map { case (owner, data) =>
        textOf(data, fontsByContent.getOrElse(owner, Map.empty))
      }
      .filter(_.nonEmpty)
    Some(parts.mkString("\n"))
  }
}
