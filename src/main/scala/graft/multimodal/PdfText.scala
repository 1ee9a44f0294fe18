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
  * Stated limitations (the honest contract): string BYTES are decoded
  * as UTF-8-with-replacement — correct for our own writer and for
  * simple-font ASCII/WinAnsi text, WRONG for subset-embedded fonts
  * whose bytes are glyph ids (a ToUnicode CMap pass is real future
  * work; such text extracts as mojibake the downstream quality gates
  * score away, exactly like any other low-quality doc). Encrypted
  * PDFs (`/Encrypt` in the trailer) fence to None — their strings are
  * RC4/AES ciphertext and extraction would emit garbage as if it were
  * text. Layout is reading-order-naive: strings concatenate in
  * content order, text-positioning operators (Td/TD/T*) become
  * newlines.
  *
  * [[write]] is the fixture generator: a real single-page PDF —
  * catalog/pages/page objects, a FlateDecode content stream, a
  * correct xref table with byte offsets — whose Tj carries the text's
  * UTF-8 bytes with the escape grammar applied. extract(write(t)) ==
  * t exactly, which is the q127 oracle (the whole Flate + framing +
  * escape machinery must cancel).
  */
object PdfText {

  // ---------------------------------------------------------------
  // Writer (fixture generator)
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

  // ---------------------------------------------------------------
  // Extractor
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

  /** All content-stream byte blocks of the document, Flate-inflated
    * where possible, raw otherwise. Framing prefers the dict's direct
    * `/Length N` when it checks out (compressed data can contain the
    * LITERAL bytes "endstream" — length framing is what the format
    * actually prescribes; the keyword scan is the fallback for
    * indirect-reference lengths, which need the xref this extractor
    * deliberately lives without).
    */
  private def streams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    var going = true
    while (going) {
      var s = indexOfAscii(bytes, "stream", pos)
      // "endstream" CONTAINS "stream": a match whose preceding bytes
      // are "end" is the previous stream's terminator, not a new
      // stream — the misframe the multi-stream spec pins
      while (s >= 3 && startsWithAt(bytes, "end", s - 3))
        s = indexOfAscii(bytes, "stream", s + 1)
      if (s < 0) going = false
      else {
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
            case Some(x) => out += x
            // a DECLARED-filtered stream whose inflate fails is binary
            // (DCTDecode image, font program) — running its raw bytes
            // through the text tokenizer would emit mojibake as corpus
            // text; only genuinely unfiltered streams read raw
            case None => if (!filtered) out += data
          }
          pos = nextPos + 1
        }
      }
    }
    out.toSeq
  }

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
    * become newlines between shows.
    */
  private def textOf(content: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder
    val pend = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var inText = false
    var needBreak = false
    var i = 0
    def flush(show: Boolean): Unit = {
      if (show && inText) {
        if (needBreak && sb.length > 0) sb.append('\n')
        needBreak = false
        pend.foreach { bs =>
          sb.append(new String(bs, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      pend.clear()
    }
    while (i < content.length) {
      val c = content(i) & 0xff
      if (c == '(') {
        literal(content, i) match {
          case Some((bs, ni)) => pend += bs; i = ni
          case None => return sb.toString // unterminated: keep prior
        }
      } else if (c == '<' &&
          (i + 1 >= content.length || content(i + 1) != '<')) {
        hexString(content, i) match {
          case Some((bs, ni)) => pend += bs; i = ni
          case None => return sb.toString
        }
      } else if (c == '<') {
        i += 2 // dictionary open: skip both
      } else if (Character.isLetter(c) || c == '\'' || c == '"' || c == '*') {
        // read an operator/name token
        val start = i
        while (i < content.length && !isDelim(content(i) & 0xff)) i += 1
        val tok = new String(content, start, i - start, "ISO-8859-1")
        tok match {
          case "BT" => inText = true; pend.clear(); needBreak = false
          case "ET" => flush(show = false); inText = false
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
    val parts = streams(bytes).map(textOf).filter(_.nonEmpty)
    Some(parts.mkString("\n"))
  }
}
