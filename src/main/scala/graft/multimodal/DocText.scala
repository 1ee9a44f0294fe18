package graft.multimodal

/** Legacy Word (.doc, MS-DOC) text extraction over the [[Cfb]]
  * container — the pre-2007 half of the WordprocessingML pair
  * ([[Docx]]). Crawls still serve .doc steadily (government
  * archives, court filings, old intranets), and until this arm the
  * bytes rode the OLE2 route into the media face as opaque blobs.
  *
  * Profile (the Word-97+ on-disk text model — every .doc a crawl
  * meets; pre-97 wIdent values fence):
  *   - The `WordDocument` stream's FIB: wIdent 0xA5EC, the
  *     fWhichTblStm bit choosing the `1Table`/`0Table` stream, and
  *     the variable-length Fib layout WALKED structurally (csw →
  *     fibRgW, cslw → fibRgLw where ccpText lives, cbRgFcLcb → the
  *     fc/lcb pair table where fcClx is pair 34) — no hardcoded
  *     whole-FIB offsets, so every nFib revision reads the same way.
  *   - The Clx in the table stream: Prc blocks (0x01, skipped by
  *     their declared size) then the Pcdt (0x02) holding the
  *     PlcPcd — n+1 CPs and n PCDs; each piece's fc carries the
  *     fCompressed bit choosing 8-bit cp1252 (at fc/2) or UTF-16LE.
  *     Only the MAIN document range [0, ccpText) extracts (headers/
  *     footnotes are not body prose).
  *   - Control-character cleanup: paragraph mark 0x0D and line
  *     break 0x0B → NEWLINE, cell mark 0x07 → TAB, page break
  *     0x0C → NEWLINE, field machinery 0x13/0x14/0x15 with the
  *     INSTRUCTION text between begin and separator DROPPED (the
  *     RTF `fldinst` rule), object anchors 0x01/0x08 and the
  *     hyphenation controls dropped.
  *   - Encrypted documents (fEncrypted bit) fence — ciphertext must
  *     not reach a text corpus (the [[PdfText]] rationale).
  *
  * [[write]] is the identity-oracle writer: a real CFB container
  * with a structurally-valid FIB (text placed at the canonical
  * 0x0400, padded past the mini cutoff so the WordDocument stream
  * rides the REGULAR chain while the 1Table Clx rides the MINI
  * stream — both [[Cfb]] paths in every oracle row), one
  * uncompressed piece, newline→0x0D / identity back.
  */
object DocText {

  private def u16(b: Array[Byte], p: Int): Int =
    if (p < 0 || p + 2 > b.length) -1
    else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    if (p < 0 || p + 4 > b.length) -1L
    else (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** Document text, or None when the bytes are not a CFB, carry no
    * parseable Word-97+ streams, or the document is encrypted.
    */
  def extract(bytes: Array[Byte]): Option[String] =
    extract(new Cfb.Doc(bytes))

  /** Shared-handle form (see [[Cfb.Doc]] — the office dispatch
    * parses the container once for all three legacy dialects).
    */
  def extract(doc: Cfb.Doc): Option[String] = {
    val word = doc.stream("WordDocument").getOrElse(return None)
    if (word.length < 128 || u16(word, 0) != 0xA5EC) return None
    val flags = u16(word, 10)
    if ((flags & 0x0100) != 0) return None // fEncrypted: fence closed
    val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val table = doc.stream(tableName).getOrElse(return None)
    // structural FIB walk: base(32) | csw, fibRgW | cslw, fibRgLw |
    // cbRgFcLcb, fibRgFcLcb
    val csw = u16(word, 32)
    if (csw < 0) return None
    val pLw = 32 + 2 + 2 * csw
    val cslw = u16(word, pLw)
    if (cslw < 4) return None
    val ccpText = u32(word, pLw + 2 + 12) // fibRgLw97.ccpText (4th i32)
    // a FIB truncated so the ccpText read lands out of bounds reads
    // -1, and both fences below compare against it VACUOUSLY — the
    // corrupt doc would extract as Some("") instead of fencing
    if (ccpText < 0) return None
    val pFcLcb = pLw + 2 + 4 * cslw
    val cbRgFcLcb = u16(word, pFcLcb)
    if (cbRgFcLcb < 34) return None
    val fcClx = u32(word, pFcLcb + 2 + 8 * 33)
    val lcbClx = u32(word, pFcLcb + 2 + 8 * 33 + 4)
    if (fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > table.length)
      return None
    // Clx walk: Prc blocks (0x01 + u16 size) then Pcdt (0x02 + u32)
    var p = fcClx.toInt
    val clxEnd = (fcClx + lcbClx).toInt
    var plcPcd: Option[(Int, Int)] = None // (start, size)
    while (plcPcd.isEmpty && p < clxEnd) {
      val tag = table(p) & 0xff
      if (tag == 0x01) {
        val cb = u16(table, p + 1)
        if (cb < 0) return None
        p += 3 + cb
      } else if (tag == 0x02) {
        val lcb = u32(table, p + 1)
        if (lcb < 4 || p + 5 + lcb > clxEnd) return None
        plcPcd = Some((p + 5, lcb.toInt))
      } else return None
    }
    val (plcOff, plcSize) = plcPcd.getOrElse(return None)
    // PlcPcd: n+1 CPs (4 bytes) + n PCDs (8 bytes) → n = (size-4)/12
    if ((plcSize - 4) % 12 != 0) return None
    val n = (plcSize - 4) / 12
    if (n <= 0) return None
    val sb = new java.lang.StringBuilder(math.min(ccpText, 1 << 24).toInt)
    var taken = 0L
    var i = 0
    while (i < n && taken < ccpText) {
      val cpStart = u32(table, plcOff + 4 * i)
      val cpEnd = u32(table, plcOff + 4 * (i + 1))
      val pcd = plcOff + 4 * (n + 1) + 8 * i
      val fcRaw = u32(table, pcd + 2)
      if (cpEnd < cpStart) return None
      val pieceLen = math.min(cpEnd, ccpText) - cpStart
      if (pieceLen > 0) {
        val compressed = (fcRaw & 0x40000000L) != 0
        if (compressed) {
          val off = ((fcRaw & 0x3FFFFFFFL) / 2).toInt
          if (off + pieceLen > word.length) return None
          val s = new String(word, off, pieceLen.toInt, "windows-1252")
          sb.append(s)
        } else {
          val off = (fcRaw & 0x3FFFFFFFL).toInt
          if (off + 2 * pieceLen > word.length) return None
          val s = new String(word, off, 2 * pieceLen.toInt, "UTF-16LE")
          sb.append(s)
        }
        taken += pieceLen
      }
      i += 1
    }
    if (taken < ccpText) return None // pieces don't cover the body
    Some(cleanup(sb.toString))
  }

  /** Word's in-text control characters → corpus text (field
    * instructions dropped whole, marks to their separators).
    */
  private def cleanup(raw: String): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var inField = false // between field-begin 0x13 and separator 0x14
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      c match {
        case '\u0013' => inField = true
        case '\u0014' => inField = false // separator: result text shows
        case '\u0015' => inField = false // field end
        case _ if inField => ()
        case '\r' | '\u000b' | '\u000c' => out.append('\n')
        case '\u0007' => out.append('\t') // cell/row mark
        case '\u0001' | '\u0008' => () // anchors
        case '\u001e' => out.append('-') // non-breaking hyphen
        case '\u001f' => () // optional hyphen
        case ch => out.append(ch)
      }
      i += 1
    }
    out.toString
  }

  // ---- writer (fixture generator) ----

  /** A minimal-but-real Word-97 document: FIB with the structural
    * walk's fields populated, body text UTF-16LE at 0x0400 (one
    * uncompressed piece), Clx in `1Table`; WordDocument padded past
    * the mini cutoff (regular chain), 1Table small (mini stream).
    */
  def write(text: String): Array[Byte] = {
    val body = text.replace('\n', '\r')
    val bodyBytes = body.getBytes("UTF-16LE")
    val ccp = body.length // UTF-16 code units == CPs
    val fcText = 0x0400
    // FIB: base 32 + csw(0x0E)*2 + cslw(0x16)*4 + cbRgFcLcb(0x5D)*8
    val csw = 0x0E; val cslw = 0x16; val cb = 0x5D
    val fibLen = 32 + 2 + 2 * csw + 2 + 4 * cslw + 2 + 8 * cb
    require(fibLen <= fcText, "FIB must fit before the text start")
    val word = new Array[Byte](
      math.max(4096, fcText + bodyBytes.length)) // past the mini cutoff
    def w16(p: Int, v: Int): Unit = {
      word(p) = (v & 0xff).toByte; word(p + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(p: Int, v: Long): Unit = {
      word(p) = (v & 0xff).toByte; word(p + 1) = ((v >> 8) & 0xff).toByte
      word(p + 2) = ((v >> 16) & 0xff).toByte
      word(p + 3) = ((v >> 24) & 0xff).toByte
    }
    w16(0, 0xA5EC) // wIdent
    w16(2, 0x00C1) // nFib (Word 97)
    w16(10, 0x0200) // fWhichTblStm = 1 → "1Table"
    w16(32, csw)
    val pLw = 32 + 2 + 2 * csw
    w16(pLw, cslw)
    w32(pLw + 2 + 12, ccp.toLong) // ccpText
    val pFcLcb = pLw + 2 + 4 * cslw
    w16(pFcLcb, cb)
    System.arraycopy(bodyBytes, 0, word, fcText, bodyBytes.length)
    // Clx: Pcdt with ONE uncompressed piece
    val clx = new Array[Byte](5 + 4 + 4 + 8)
    clx(0) = 0x02
    def c32(p: Int, v: Long): Unit = {
      clx(p) = (v & 0xff).toByte; clx(p + 1) = ((v >> 8) & 0xff).toByte
      clx(p + 2) = ((v >> 16) & 0xff).toByte
      clx(p + 3) = ((v >> 24) & 0xff).toByte
    }
    c32(1, (4 + 4 + 8).toLong) // lcbPlcPcd
    c32(5, 0L) // cp0
    c32(9, ccp.toLong) // cp1
    // PCD: flags u16 = 0, fc u32 (uncompressed: plain byte offset),
    // prm u16 = 0
    clx(13) = 0; clx(14) = 0
    c32(15, fcText.toLong)
    clx(19) = 0; clx(20) = 0
    w32(pFcLcb + 2 + 8 * 33, 0L) // fcClx = 0 within 1Table
    w32(pFcLcb + 2 + 8 * 33 + 4, clx.length.toLong)
    Cfb.write(Seq(("WordDocument", word), ("1Table", clx)))
  }
}
