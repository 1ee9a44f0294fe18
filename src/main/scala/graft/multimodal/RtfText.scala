package graft.multimodal

/** RTF text extraction — the legacy office format crawls still serve,
  * and the one that was actively POLLUTING the corpus: RTF is plain
  * ASCII, so without a magic route a crawled .rtf passes the
  * documents face's NUL fence and ingests as "text" full of
  * `\control` words and `{}` groups (the same systematic-garbage
  * class as r13's PDF-mojibake finding, one format over). The sniff
  * now routes `{\rtf` away from the text corpus and THIS kernel
  * recovers the actual prose.
  *
  * Profile (RTF 1.x core grammar):
  *   - Group tracking (`{`/`}`), control words (`\word[-]N?[ ]?`),
  *     control symbols (`\X`).
  *   - DESTINATION groups drop whole: the known metadata set
  *     (fonttbl, colortbl, stylesheet, info, pict, object, header*,
  *     footer*, field instructions …) and EVERY `{\*\…}` group (the
  *     spec's own forward-compat rule: unknown starred destinations
  *     are ignorable).
  *   - Text: `\par`/`\line` → NEWLINE, `\tab` → TAB, `\emdash` etc.
  *     → their characters, `\'hh` → the byte through the DECLARED
  *     code page (`\ansicpg`, windows-1252 default), `\uN` → the
  *     code point with the following fallback character(s) consumed
  *     per the current `\ucN` skip count (the spec's unicode
  *     round-trip rule), `\binN` skips N RAW bytes (binary must
  *     never leak into text).
  *   - Depth cap + single pass: crafted nesting can't stack-overflow
  *     (iterative, an explicit stack of skip states) or hang.
  *
  * [[write]] emits real RTF: header with fonttbl/colortbl, ansicpg,
  * `\uc1` unicode escapes with fallbacks for non-ASCII, `\'hh` for
  * the cp1252 range, escaped specials, `\par` paragraphs.
  */
object RtfText {

  private val Destinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "ftnsep", "ftnsepc", "aftnsep", "aftnsepc",
    "fldinst", "themedata", "colorschememapping", "datastore",
    "latentstyles", "listtable", "listoverridetable", "revtbl",
    "rsidtbl", "generator", "xmlnstbl")

  private val MaxDepth = 256

  /** Extracted text, or None when the bytes are not RTF (`{\rtf`
    * prologue) or the group structure is hopeless (negative depth).
    */
  def extract(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 5) return None
    val s = new String(bytes, "ISO-8859-1") // raw byte view; \'hh and
                                            // \uN do the real decoding
    if (!s.startsWith("{\\rtf")) return None
    val out = new java.lang.StringBuilder(s.length / 2)
    var cp1252 = java.nio.charset.Charset.forName("windows-1252")
    var i = 0
    val n = s.length
    var depth = 0
    // per-depth skip flag: once a destination opens, everything to
    // its closing brace drops
    var skipDepth = Int.MaxValue // depth at which skipping began
    var uc = 1 // \ucN: fallback chars to eat after \uN
    def skipping = depth >= skipDepth
    var groupJustOpened = false
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '{' =>
          depth += 1
          if (depth > MaxDepth) return None
          groupJustOpened = true
          i += 1
        case '}' =>
          depth -= 1
          if (depth < 0) return None
          if (depth < skipDepth) skipDepth = Int.MaxValue
          groupJustOpened = false
          i += 1
        case '\\' =>
          if (i + 1 >= n) i = n
          else {
            val c2 = s.charAt(i + 1)
            if (c2 == '\'') {
              // gather the WHOLE run of consecutive \'hh escapes and
              // decode ONCE through the declared code page — double-
              // byte pages (\ansicpg936/932/949/950) encode one
              // character as a lead/trail byte PAIR across two
              // escapes; per-byte decoding would emit U+FFFD per byte
              // and the printability gate would drop real documents
              val buf = new java.io.ByteArrayOutputStream()
              var halted = false
              while (!halted && i + 1 < n && s.charAt(i) == '\\' &&
                     s.charAt(i + 1) == '\'') {
                if (i + 3 < n) {
                  try {
                    buf.write(Integer.parseInt(s.substring(i + 2, i + 4), 16))
                    i += 4
                  } catch {
                    case _: NumberFormatException => i += 2; halted = true
                  }
                } else { i = n; halted = true }
              }
              if (!skipping && buf.size() > 0)
                out.append(new String(buf.toByteArray, cp1252))
            } else if (c2.isLetter) {
              var j = i + 1
              while (j < n && s.charAt(j).isLetter) j += 1
              val word = s.substring(i + 1, j)
              var neg = false
              var k = j
              if (k < n && s.charAt(k) == '-') { neg = true; k += 1 }
              var num = 0L
              var hasNum = false
              while (k < n && s.charAt(k).isDigit && num < 1000000000L) {
                num = num * 10 + (s.charAt(k) - '0'); k += 1; hasNum = true
              }
              // past-cap digits are consumed AND DISCARDED: a
              // hostile control word with a dozen-digit parameter
              // must not leave its tail digits in the stream to
              // emit as literal text
              while (k < n && s.charAt(k).isDigit) k += 1
              val value = if (neg) -num else num
              if (k < n && s.charAt(k) == ' ') k += 1 // delimiter space
              i = k
              word match {
                case "par" | "line" | "sect" | "page" =>
                  if (!skipping) out.append('\n')
                case "tab" => if (!skipping) out.append('\t')
                case "emdash" => if (!skipping) out.append('—')
                case "endash" => if (!skipping) out.append('–')
                case "lquote" => if (!skipping) out.append('‘')
                case "rquote" => if (!skipping) out.append('’')
                case "ldblquote" => if (!skipping) out.append('“')
                case "rdblquote" => if (!skipping) out.append('”')
                case "bullet" => if (!skipping) out.append('•')
                case "emspace" | "enspace" | "qmspace" =>
                  if (!skipping) out.append(' ')
                case "uc" => if (hasNum) uc = math.max(0, value.toInt)
                case "u" =>
                  if (hasNum && !skipping) {
                    // negative \uN values are cp-1 wrapped (RTF's
                    // signed-16-bit convention)
                    val cpNum = if (value < 0) value + 65536 else value
                    if (cpNum >= 0 && cpNum <= 0x10FFFF)
                      out.appendCodePoint(cpNum.toInt)
                  }
                  // eat the fallback character(s) — raw or \'hh forms
                  var eaten = 0
                  while (eaten < uc && i < n) {
                    if (s.charAt(i) == '\\' && i + 3 < n &&
                        s.charAt(i + 1) == '\'') i += 4
                    else i += 1
                    eaten += 1
                  }
                case "ansicpg" =>
                  if (hasNum)
                    try cp1252 = java.nio.charset.Charset
                      .forName("windows-" + value)
                    catch { case _: RuntimeException => () }
                case "bin" =>
                  // N raw bytes follow: skip them, NEVER as text
                  if (hasNum && value > 0)
                    i = math.min(n.toLong, i + value).toInt
                case w if groupJustOpened && Destinations.contains(w) =>
                  if (depth < skipDepth) skipDepth = depth
                case _ => () // formatting control: no text effect
              }
              groupJustOpened = false
            } else { // control symbol
              c2 match {
                case '\\' | '{' | '}' => if (!skipping) out.append(c2)
                case '~' => if (!skipping) out.append(' ')
                case '-' | '_' => if (!skipping) out.append('-')
                case '*' =>
                  // {\*\dest …}: EVERY starred group is an ignorable
                  // destination (the forward-compat rule)
                  if (groupJustOpened && depth < skipDepth) skipDepth = depth
                case '\r' | '\n' => () // escaped newline: ignore
                case _ => ()
              }
              if (c2 != '*') groupJustOpened = false
              i += 2
            }
          }
        case '\r' | '\n' => i += 1 // raw newlines are NOT text in RTF
        case _ =>
          if (!skipping) out.append(c)
          groupJustOpened = false
          i += 1
      }
    }
    Some(out.toString)
  }

  private def escChar(ch: Char, sb: java.lang.StringBuilder): Unit = ch match {
    case '\\' => sb.append("\\\\")
    case '{' => sb.append("\\{")
    case '}' => sb.append("\\}")
    case '\n' => sb.append("\\par ")
    case '\t' => sb.append("\\tab ")
    case c if c < 0x80 => sb.append(c)
    case c if c >= 0xA0 && c < 0x100 =>
      // \'hh only where cp1252 == latin-1 (0xA0-0xFF); 0x80-0x9F are
      // cp1252's punctuation block and would NOT round-trip
      sb.append("\\'").append(f"${c.toInt}%02x")
    case c => sb.append("\\u").append(c.toInt.toShort.toInt).append('?')
  }

  /** Real RTF with the header zoo the extractor must drop: fonttbl,
    * colortbl, an `{\*\generator}` starred destination, `\uc1`
    * unicode escapes with `?` fallbacks, `\'hh` escapes, `\par`
    * paragraphs.
    */
  def write(text: String): Array[Byte] = {
    val sb = new java.lang.StringBuilder(text.length * 2 + 128)
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1")
    sb.append("{\\fonttbl{\\f0\\fswiss Helvetica;}}")
    sb.append("{\\colortbl;\\red0\\green0\\blue0;}")
    sb.append("{\\*\\generator graft fixture writer;}")
    sb.append("\\f0\\fs24 ")
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp > 0xFFFF) {
        // surrogate pair: RTF writes each UTF-16 unit as its own \uN
        escChar(text.charAt(i), sb)
        escChar(text.charAt(i + 1), sb)
        i += 2
      } else { escChar(text.charAt(i), sb); i += 1 }
    }
    sb.append('}')
    sb.toString.getBytes("ISO-8859-1")
  }
}
