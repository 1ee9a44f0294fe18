package graft.multimodal

/** Legacy Excel (.xls, BIFF8) text extraction over the [[Cfb]]
  * container — the tabular half of the legacy Office pair
  * ([[DocText]] extracts the prose half). Spreadsheets are the
  * HIGHEST-VOLUME format still served as OLE2 by real crawls
  * (open-data portals, statistics offices, financial filings), and
  * until this arm the bytes rode the OLE2 route into the media face
  * as opaque blobs. The reference's own domain is tabular import
  * (vena-etl-tool fileHandling.js:12-46 — CSV/spreadsheet staging),
  * so tabular documents are the reference-shaped gap this closes.
  *
  * Profile (the BIFF8 on-disk model — what Excel 97–2003 wrote and
  * what crawls meet; BIFF5 and encrypted books FENCE):
  *   - The `Workbook` stream (case-insensitive — writers disagree),
  *     a flat sequence of records `[type u16][len u16][data]`. A
  *     `Book` stream without a `Workbook` is BIFF5 → None, stated,
  *     and a BOF version other than 0x0600 fences the same way
  *     (their strings are codepage-encoded, a different grammar).
  *   - `FILEPASS` anywhere in the globals → None (ciphertext must
  *     not reach a text corpus — the [[DocText]]/[[PdfText]] rule).
  *   - The `SST` record (shared strings) plus its `CONTINUE` chain:
  *     strings are XLUnicodeRichExtendedString — cch, option flags
  *     (fHighByte choosing 8-bit-compressed vs UTF-16LE, fRichSt rich
  *     runs, fExtSt extension blocks, both skipped by size), and
  *     character payloads that may SPLIT at a CONTINUE boundary,
  *     where a fresh grbit byte re-declares the width for the
  *     remainder (the one genuinely adversarial corner of BIFF —
  *     a compressed string legally continues uncompressed).
  *   - `BOUNDSHEET` records give each sheet substream's offset; only
  *     visible-or-hidden WORKSHEETS (type 0) extract — chart sheets
  *     carry no corpus text.
  *   - Per sheet (BOF dt=0x0010 … EOF), the cell records:
  *     `LABELSST` (shared index), `LABEL` (inline string), `NUMBER`
  *     (f64), `RK`/`MULRK` (packed numerics), `BOOLERR`
  *     (TRUE/FALSE; error cells → empty), `FORMULA` with its cached
  *     result (string results in the trailing `STRING` record),
  *     `BLANK`/`MULBLANK` (empty cells — they hold the TSV column
  *     shape like [[Xlsx]]'s `<c/>`).
  *   - Assembly: cells sorted (row, col) joined with TAB, rows with
  *     NEWLINE, sheets with NEWLINE — the [[Xlsx]] TSV shape every
  *     downstream text operator already understands. Numbers render
  *     canonically: integral values (|v| < 1e15) as longs, the rest
  *     via Double.toString — corpus text, not a number formatter.
  *   - Caps: [[MaxOutputChars]] fences reference-amplification (the
  *     [[Xlsx]] budget — thousands of cells sharing one near-cap SST
  *     string); any structural breakage (truncated record, SST index
  *     out of range, a sheet offset past the stream) fences WHOLE —
  *     partial spreadsheets must not become partial corpus rows.
  *
  * [[write]] is the identity-oracle writer: a real BIFF8 `Workbook`
  * stream in a real [[Cfb]] container — globals (BOF, CODEPAGE,
  * BOUNDSHEET with a patched substream offset, SST with the real
  * 8224-byte record cap and CONTINUE splits at character
  * boundaries), one worksheet of LABELSST cells (one row per line,
  * one cell per TAB segment, strings deduplicated through the table
  * like real writers; every third string forced UTF-16 so both
  * encodings sit in every oracle row), so extract(write(t)) == t.
  */
object XlsText {

  private def u16(b: Array[Byte], p: Int): Int =
    if (p < 0 || p + 2 > b.length) -1
    else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    if (p < 0 || p + 4 > b.length) -1L
    else (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** Total extracted-output cap — the [[Xlsx.MaxOutputChars]]
    * rationale verbatim: per-record sizes are bounded by the format
    * (8224), but cells referencing one shared string re-amplify.
    */
  private val MaxOutputChars: Long = 64L * 1024 * 1024

  // record types (MS-XLS)
  private val RBof = 0x0809
  private val REof = 0x000A
  private val RSst = 0x00FC
  private val RContinue = 0x003C
  private val RBoundSheet = 0x0085
  private val RFilePass = 0x002F
  private val RLabelSst = 0x00FD
  private val RLabel = 0x0204
  private val RNumber = 0x0203
  private val RRk = 0x027E
  private val RMulRk = 0x00BD
  private val RBoolErr = 0x0205
  private val RFormula = 0x0006
  private val RString = 0x0207
  private val RBlank = 0x0201
  private val RMulBlank = 0x00BE
  private val RShrFmla = 0x04BC
  private val RArray = 0x0221
  private val RTable = 0x0236

  /** One physical record: (type, dataStart, dataLen). */
  private final case class Rec(typ: Int, off: Int, len: Int)

  /** The record at `p`, or None when the header or payload would
    * cross the stream end (truncation fences the walk).
    */
  private def recAt(b: Array[Byte], p: Int): Option[Rec] = {
    val t = u16(b, p)
    val len = u16(b, p + 2)
    if (t < 0 || len < 0 || p + 4 + len > b.length) None
    else Some(Rec(t, p + 4, len))
  }

  /** A logical byte stream over an SST record + its CONTINUE chain,
    * with the BIFF continuation rule: header fields never split (a
    * split header fences), character payloads split at character
    * boundaries with a fresh grbit byte opening each continuation.
    */
  private final class Frags(frags: Vector[(Int, Int)], b: Array[Byte]) {
    private var fi = 0
    private var p = 0
    private def remaining: Int =
      if (fi >= frags.length) 0 else frags(fi)._2 - p
    /** Move to the next fragment when the current one is exhausted;
      * false when the whole chain is consumed.
      */
    private def settle(): Boolean = {
      while (fi < frags.length && p >= frags(fi)._2) { fi += 1; p = 0 }
      fi < frags.length
    }
    private def abs: Int = frags(fi)._1 + p
    def u8(): Int = {
      if (!settle()) return -1
      val v = b(abs) & 0xff; p += 1; v
    }
    /** Fixed header fields: fence (-1) when the field would split
      * across a record boundary (real writers never do this).
      */
    def h16(): Int = {
      if (!settle() || remaining < 2) return -1
      val v = u16(b, abs); p += 2; v
    }
    def h32(): Long = {
      if (!settle() || remaining < 4) return -1L
      val v = u32(b, abs); p += 4; v
    }
    /** Skip `n` bytes across fragments (rich runs / ext blocks —
      * no grbit at their continuation boundaries). False on EOF.
      */
    def skip(n: Long): Boolean = {
      var left = n
      while (left > 0) {
        if (!settle()) return false
        val take = math.min(left, remaining.toLong).toInt
        p += take; left -= take
      }
      true
    }
    /** `cch` characters, starting at width `wide0`, re-reading the
      * grbit byte at every fragment boundary entered MID-STRING.
      */
    def chars(cch: Int, wide0: Boolean,
              sb: java.lang.StringBuilder): Boolean = {
      var left = cch
      var wide = wide0
      var fresh = false // true once we cross into a continuation
      while (left > 0) {
        if (!settle()) return false
        if (fresh) {
          val g = u8()
          if (g != 0 && g != 1) return false
          wide = g == 1
          fresh = false
          if (!settle()) return false
        }
        val width = if (wide) 2 else 1
        if (remaining < width) {
          // a split UTF-16 unit would be a malformed writer; the
          // only legal boundary is between characters
          if (remaining != 0) return false
          fresh = true
        } else {
          val fit = math.min(left, remaining / width)
          if (wide) sb.append(new String(b, abs, 2 * fit, "UTF-16LE"))
          else sb.append(new String(b, abs, fit, "ISO-8859-1"))
          p += fit * width
          left -= fit
          if (left > 0 && remaining == 0) fresh = true
        }
      }
      true
    }
  }

  /** The SST string table, or None on structural breakage. */
  private def parseSst(b: Array[Byte], frags: Vector[(Int, Int)])
      : Option[Vector[String]] = {
    val f = new Frags(frags, b)
    if (f.h32() < 0) return None // cstTotal (informational)
    val unique = f.h32()
    val totalBytes = frags.map(_._2.toLong).sum
    // each string is ≥ 3 bytes — a count past that is a lying header
    if (unique < 0 || unique > totalBytes / 3 + 1) return None
    val out = Vector.newBuilder[String]
    var i = 0L
    var budget = MaxOutputChars
    while (i < unique) {
      val cch = f.h16()
      val flags = f.u8()
      if (cch < 0 || flags < 0 || (flags & 0xF2) != 0) return None
      val cRun = if ((flags & 0x08) != 0) f.h16() else 0
      val cbExt = if ((flags & 0x04) != 0) f.h32() else 0L
      if (cRun < 0 || cbExt < 0) return None
      val sb = new java.lang.StringBuilder(cch)
      if (!f.chars(cch, (flags & 0x01) != 0, sb)) return None
      if (!f.skip(4L * cRun + cbExt)) return None
      budget -= cch
      if (budget < 0) return None
      out += sb.toString
      i += 1
    }
    Some(out.result())
  }

  /** Canonical number rendering: integral doubles as longs (what a
    * TSV consumer expects of "42"), the rest via Double.toString.
    */
  private def formatNum(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15 &&
        !java.lang.Double.isInfinite(v)) v.toLong.toString
    else v.toString

  /** RK-packed numeric (MS-XLS 2.5.217): bit0 = ×1/100, bit1 = int
    * (signed 30-bit) vs the high 30 bits of an f64.
    */
  private def rkNum(rk: Long): Double = {
    val base =
      if ((rk & 0x2) != 0) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 0x1) != 0) base / 100.0 else base
  }

  /** An XLUnicodeString (cch u16, grbit u8, chars) contained WHOLE
    * in one record (LABEL / STRING payloads — continuation there is
    * legal but vanishingly rare; a split fences).
    */
  private def inlineString(b: Array[Byte], off: Int, end: Int)
      : Option[String] = {
    val cch = u16(b, off)
    val flags = if (off + 2 < end) b(off + 2) & 0xff else -1
    if (cch < 0 || flags < 0 || (flags & 0xF2) != 0) return None
    val wide = (flags & 0x01) != 0
    val width = if (wide) 2 else 1
    if (off + 3 + cch * width > end) return None
    Some(
      if (wide) new String(b, off + 3, 2 * cch, "UTF-16LE")
      else new String(b, off + 3, cch, "ISO-8859-1"))
  }

  /** Spreadsheet text, or None when the bytes are not a CFB, the
    * book is BIFF5/encrypted, or any structure is broken.
    */
  def extract(bytes: Array[Byte]): Option[String] =
    extract(new Cfb.Doc(bytes))

  /** Shared-handle form (see [[Cfb.Doc]] — the office dispatch
    * parses the container once).
    */
  def extract(doc: Cfb.Doc): Option[String] = {
    val wb = doc.stream("Workbook").getOrElse {
      // a BIFF5 book ("Book" stream) fences, stated: its strings are
      // codepage-encoded under a different record grammar
      return None
    }
    // ---- globals walk: BOF version, FILEPASS, SST(+CONTINUE chain),
    //      BOUNDSHEET offsets ----
    val bof = recAt(wb, 0).getOrElse(return None)
    if (bof.typ != RBof || u16(wb, bof.off) != 0x0600) return None
    var sst: Vector[String] = Vector.empty
    val sheets = Vector.newBuilder[Long]
    var p = 0
    var going = true
    while (going) {
      recAt(wb, p) match {
        case None => return None // truncated globals: fence whole
        case Some(r) =>
          r.typ match {
            case REof => going = false
            case RFilePass => return None // encrypted: fence closed
            case RSst =>
              // the CONTINUE chain belongs to THIS record
              val frags = Vector.newBuilder[(Int, Int)]
              frags += ((r.off, r.len))
              var q = r.off + r.len
              var chained = true
              while (chained) recAt(wb, q) match {
                case Some(c) if c.typ == RContinue =>
                  frags += ((c.off, c.len)); q = c.off + c.len
                case _ => chained = false
              }
              sst = parseSst(wb, frags.result()).getOrElse(return None)
              p = q // main walk resumes past the CONTINUE chain
            case RBoundSheet =>
              // fixed-layout record: validate length BEFORE reading,
              // like LABELSST/NUMBER/RK — a truncated BOUNDSHEET must
              // fence, not graze the next record's header bytes and
              // treat them as a sheet offset
              if (r.len < 6) return None
              val off = u32(wb, r.off)
              val grbit = u16(wb, r.off + 4)
              if (off < 0 || grbit < 0) return None
              if ((grbit & 0xFF00) == 0) sheets += off // worksheets only
              p = r.off + r.len
            case _ =>
              p = r.off + r.len
          }
      }
    }
    val sheetOffs = sheets.result()
    if (sheetOffs.isEmpty) return None
    var budget = MaxOutputChars
    val texts = Vector.newBuilder[String]
    sheetOffs.foreach { so =>
      if (so > Int.MaxValue || so + 4 > wb.length) return None
      sheetText(wb, so.toInt, sst, budget) match {
        case Some((t, spent)) =>
          budget -= spent
          if (budget < 0) return None
          texts += t
        case None => return None // malformed sheet: fence whole
      }
    }
    Some(texts.result().mkString("\n"))
  }

  /** One worksheet substream → (TSV text, chars consumed); None on
    * structural breakage. Chart substreams (BOF dt ≠ worksheet)
    * yield empty text — they carry no cells.
    */
  private def sheetText(wb: Array[Byte], start: Int,
                        sst: Vector[String],
                        budget: Long): Option[(String, Long)] = {
    val bof = recAt(wb, start).getOrElse(return None)
    if (bof.typ != RBof || u16(wb, bof.off) != 0x0600) return None
    if (u16(wb, bof.off + 2) != 0x0010) return Some(("", 0L)) // chart etc.
    val cells = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, String)]
    var spent = 0L
    def put(rw: Int, colIx: Int, s: String): Boolean = {
      if (rw < 0 || colIx < 0) return false
      spent += s.length + 1
      if (spent > budget) return false
      cells += ((rw, colIx, s)); true
    }
    var p = bof.off + bof.len
    var going = true
    while (going) {
      val r = recAt(wb, p).getOrElse(return None)
      val o = r.off
      val end = r.off + r.len
      r.typ match {
        case REof => going = false
        case RFilePass => return None
        case RLabelSst =>
          // every fixed-layout record validates its OWN length before
          // any field read: u16/u32 bounds-check against the STREAM,
          // so without this a truncated record's reads would graze
          // into the NEXT record's header bytes instead of fencing
          if (r.len < 10) return None
          val ix = u32(wb, o + 6)
          if (ix < 0 || ix >= sst.length) return None
          if (!put(u16(wb, o), u16(wb, o + 2), sst(ix.toInt))) return None
        case RLabel =>
          if (r.len < 9) return None
          val s = inlineString(wb, o + 6, end).getOrElse(return None)
          if (!put(u16(wb, o), u16(wb, o + 2), s)) return None
        case RNumber =>
          if (r.len < 14) return None
          val bits = u32(wb, o + 6) | (u32(wb, o + 10) << 32)
          val v = java.lang.Double.longBitsToDouble(bits)
          if (!put(u16(wb, o), u16(wb, o + 2), formatNum(v))) return None
        case RRk =>
          if (r.len < 10) return None
          val v = rkNum(u32(wb, o + 6))
          if (!put(u16(wb, o), u16(wb, o + 2), formatNum(v))) return None
        case RMulRk =>
          // rw, colFirst, n×(ixfe+RK), colLast
          if (r.len < 12 || (r.len - 6) % 6 != 0) return None
          val rw = u16(wb, o)
          val colFirst = u16(wb, o + 2)
          val n = (r.len - 6) / 6
          var i = 0
          while (i < n) {
            val v = rkNum(u32(wb, o + 4 + 6 * i + 2))
            if (!put(rw, colFirst + i, formatNum(v))) return None
            i += 1
          }
        case RBoolErr =>
          if (r.len < 8) return None
          val s =
            if ((wb(o + 7) & 0xff) != 0) "" // error cell: no text
            else if ((wb(o + 6) & 0xff) != 0) "TRUE" else "FALSE"
          if (!put(u16(wb, o), u16(wb, o + 2), s)) return None
        case RBlank =>
          if (r.len < 6) return None
          if (!put(u16(wb, o), u16(wb, o + 2), "")) return None
        case RMulBlank =>
          if (r.len < 8 || (r.len - 6) % 2 != 0) return None
          val rw = u16(wb, o)
          val colFirst = u16(wb, o + 2)
          var i = 0
          val n = (r.len - 6) / 2
          while (i < n) {
            if (!put(rw, colFirst + i, "")) return None
            i += 1
          }
        case RFormula =>
          if (r.len < 14) return None
          val rw = u16(wb, o)
          val colIx = u16(wb, o + 2)
          if (u16(wb, o + 12) == 0xFFFF) {
            (wb(o + 6) & 0xff) match {
              case 0 =>
                // cached string in the trailing STRING record, past
                // any SHRFMLA/ARRAY/TABLE the formula dragged along
                var q = end
                var found: Option[String] = None
                var scanning = true
                while (scanning) recAt(wb, q) match {
                  case Some(nx) if nx.typ == RString =>
                    found = inlineString(wb, nx.off, nx.off + nx.len)
                    scanning = false
                  case Some(nx) if nx.typ == RShrFmla ||
                      nx.typ == RArray || nx.typ == RTable =>
                    q = nx.off + nx.len
                  case _ => scanning = false
                }
                val s = found.getOrElse(return None)
                if (!put(rw, colIx, s)) return None
              case 1 =>
                val s = if ((wb(o + 8) & 0xff) != 0) "TRUE" else "FALSE"
                if (!put(rw, colIx, s)) return None
              case 2 | 3 =>
                if (!put(rw, colIx, "")) return None // error / empty
              case _ => return None
            }
          } else {
            val bits = u32(wb, o + 6) | (u32(wb, o + 10) << 32)
            val v = java.lang.Double.longBitsToDouble(bits)
            if (!put(rw, colIx, formatNum(v))) return None
          }
        case _ => () // formatting / calc-chain / window records
      }
      p = end
    }
    // (row, col)-sorted TSV assembly — the [[Xlsx]] shape
    val byRow = cells.sortBy(c => (c._1, c._2))
    val sb = new java.lang.StringBuilder()
    var lastRow = -1
    var first = true
    byRow.foreach { case (rw, _, s) =>
      if (first) { first = false; lastRow = rw }
      else if (rw != lastRow) { sb.append('\n'); lastRow = rw }
      else sb.append('\t')
      sb.append(s)
    }
    Some((sb.toString, spent))
  }

  // ---- writer (fixture generator) ----

  /** Max record DATA bytes — the real BIFF8 cap; SST payloads past
    * it continue into CONTINUE records split at char boundaries.
    */
  private val MaxRecData = 8224

  private final class Sink {
    val out = new java.io.ByteArrayOutputStream()
    def rec(typ: Int, data: Array[Byte]): Unit = {
      out.write(typ & 0xff); out.write((typ >> 8) & 0xff)
      out.write(data.length & 0xff); out.write((data.length >> 8) & 0xff)
      out.write(data, 0, data.length)
    }
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** SST (+CONTINUE chain) for `strings`, with real record caps:
    * headers never split, char runs split at character boundaries
    * with the continuation grbit re-emitted.
    */
  private def sstRecords(sink: Sink, strings: Vector[String],
                         refs: Long): Unit = {
    val cur = new java.io.ByteArrayOutputStream()
    var curType = RSst
    def flush(next: Int): Unit = {
      sink.rec(curType, cur.toByteArray)
      cur.reset(); curType = next
    }
    def room: Int = MaxRecData - cur.size()
    def need(n: Int): Unit = if (room < n) flush(RContinue)
    cur.write(le32(refs), 0, 4)
    cur.write(le32(strings.length.toLong), 0, 4)
    strings.zipWithIndex.foreach { case (s, ix) =>
      require(s.length <= 65535,
        "BIFF8 caps strings at 65535 chars; cch is a u16 and would " +
          "silently wrap, breaking the extract(write(t)) == t identity")
      val wide = s.exists(_ >= 0x100) || ix % 3 == 2
      need(3 + (if (wide) 2 else 1)) // header + at least one char
      cur.write(le16(s.length), 0, 2)
      cur.write(if (wide) 1 else 0)
      var i = 0
      var needGrbit = false
      while (i < s.length) {
        if (needGrbit) { cur.write(if (wide) 1 else 0); needGrbit = false }
        val width = if (wide) 2 else 1
        val fit = math.min(s.length - i, room / width)
        if (fit == 0) { flush(RContinue); needGrbit = true }
        else {
          val chunk = s.substring(i, i + fit)
          val b = chunk.getBytes(if (wide) "UTF-16LE" else "ISO-8859-1")
          cur.write(b, 0, b.length)
          i += fit
          if (i < s.length) { flush(RContinue); needGrbit = true }
        }
      }
    }
    flush(-1)
  }

  /** A real BIFF8 workbook: one worksheet, one row per input line,
    * one SHARED-string cell per TAB segment ([[Xlsx.write]]'s
    * dedup device on the legacy encoding). BIFF8 caps 65536 rows ×
    * 256 columns — inputs past either cap are a document no real
    * .xls writer could have produced, so the fixture refuses too.
    */
  def write(text: String): Array[Byte] = {
    val lines = text.split("\n", -1)
    require(lines.length <= 65536, "BIFF8 caps 65536 rows")
    val table = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sid(s: String): Int = table.getOrElseUpdate(s, table.size)
    var refs = 0L
    val cellRows: Array[Array[Int]] = lines.map { line =>
      val cs = line.split("\t", -1)
      require(cs.length <= 256, "BIFF8 caps 256 columns")
      refs += cs.length
      cs.map(sid)
    }
    // ---- worksheet substream ----
    val sheet = new Sink
    sheet.rec(RBof, le16(0x0600) ++ le16(0x0010) ++
      le16(0x0DBB) ++ le16(0x07CC) ++ le32(0L) ++ le32(0L))
    cellRows.zipWithIndex.foreach { case (cols, rw) =>
      cols.zipWithIndex.foreach { case (ix, colIx) =>
        sheet.rec(RLabelSst,
          le16(rw) ++ le16(colIx) ++ le16(15) ++ le32(ix.toLong))
      }
    }
    sheet.rec(REof, Array.emptyByteArray)
    val sheetBytes = sheet.out.toByteArray
    // ---- globals, BOUNDSHEET offset patched to the sheet BOF ----
    val globals = new Sink
    globals.rec(RBof, le16(0x0600) ++ le16(0x0005) ++
      le16(0x0DBB) ++ le16(0x07CC) ++ le32(0L) ++ le32(0L))
    globals.rec(0x0042, le16(1200)) // CODEPAGE: UTF-16 (BIFF8)
    val name = "Sheet1".getBytes("ISO-8859-1")
    val bsData = le32(0L) ++ le16(0x0000) ++
      Array(name.length.toByte, 0.toByte) ++ name
    globals.rec(RBoundSheet, bsData)
    val bsPatch = globals.out.size() - bsData.length // lbPlyPos slot
    sstRecords(globals, table.keys.toVector, refs)
    globals.rec(REof, Array.emptyByteArray)
    val g = globals.out.toByteArray
    val lbPlyPos = g.length
    g(bsPatch) = (lbPlyPos & 0xff).toByte
    g(bsPatch + 1) = ((lbPlyPos >> 8) & 0xff).toByte
    g(bsPatch + 2) = ((lbPlyPos >> 16) & 0xff).toByte
    g(bsPatch + 3) = ((lbPlyPos >> 24) & 0xff).toByte
    Cfb.write(Seq(("Workbook", g ++ sheetBytes)))
  }
}
