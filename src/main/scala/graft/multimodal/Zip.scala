package graft.multimodal

/** ZIP container walk — the archive grammar under DOCX/XLSX/PPTX (all
  * OOXML), EPUB, JARs and a steady share of raw crawl downloads. The
  * reference tool ships CSV uploads over HTTP (import.js:49-88,
  * src/api/datasets.js) and never opens archives; a 100 TB crawl
  * pipeline meets ZIP constantly, and mining office-document text
  * (the [[Docx]] layer above this one) needs a real central-directory
  * walk, not a filename guess.
  *
  * Read profile (the APPNOTE subset a crawl actually serves):
  *   - End-of-central-directory located by a bounded BACKWARD scan
  *     over the trailing 64 KiB + 22 (the max comment window); a
  *     candidate wins only when its comment length exactly reaches
  *     the payload tail AND its central-directory offset points at a
  *     real PK central-file header (or declares zero entries / a
  *     ZIP64 sentinel) — a crafted comment embedding a length-
  *     consistent fake EOCD fails the directory probe and the scan
  *     continues to the real one (Info-ZIP accepts the nearest-tail
  *     candidate; this walk holds the stricter line because a
  *     spoofed directory here picks which bytes become corpus text).
  *   - Central-directory entries are AUTHORITATIVE for sizes/CRC
  *     (local headers lie under the data-descriptor convention,
  *     GP bit 3); the local header is re-walked only to find where
  *     the entry's bytes start (its OWN name/extra lengths — they
  *     differ from the central copy in real archives).
  *   - Methods: 0 (stored) and 8 (deflate, raw `Inflater(nowrap)`).
  *     Anything else (implode, bzip2, LZMA, AES marker 99) fences the
  *     ENTRY, not the archive.
  *   - Encrypted entries (GP bit 0) fence closed: ciphertext must
  *     never flow downstream as content ([[PdfText]]'s /Encrypt
  *     rationale).
  *   - ZIP64 fences closed (the 0xFFFFFFFF / 0xFFFF sentinels): a
  *     >4 GiB member can't fit the byte-array payload contract
  *     anyway ([[graft.sources.BinarySource]] caps at 2 GiB).
  *   - Inflate output is capped (default 64 MiB, the [[PdfText]] bomb
  *     cap) and must match the directory's declared size AND CRC-32 —
  *     a short, overlong, or corrupt stream yields None for that
  *     entry (never partial bytes; the truncated-Flate advice fence).
  *
  * [[write]] is the fixture generator AND the proof the reader walks
  * the real grammar: stored + deflated members, optional archive
  * comment (with embedded fake EOCD bytes), UTF-8 name flagging.
  */
object Zip {

  /** One central-directory row: sizes/CRC from the central copy (the
    * authoritative record), `offset` = the LOCAL header's position.
    */
  final case class Entry(name: String, method: Int, compSize: Long,
                         uncompSize: Long, crc: Long, offset: Long,
                         encrypted: Boolean)

  /** Per-entry inflated-output cap — the zip-bomb fence. */
  val MaxEntryBytes: Int = 64 * 1024 * 1024

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** The central directory, or None when no structurally-valid EOCD
    * exists (not a ZIP, truncated tail, ZIP64 archive).
    */
  def entries(bytes: Array[Byte]): Option[Vector[Entry]] = {
    if (bytes == null || bytes.length < 22) return None
    // backward scan for the EOCD whose comment length lands exactly on
    // the payload tail — bounded by the 64 KiB max comment
    val lo = math.max(0, bytes.length - 22 - 0xFFFF)
    var p = bytes.length - 22
    var eocd = -1
    while (eocd < 0 && p >= lo) {
      if (bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 5 &&
          bytes(p + 3) == 6 &&
          p + 22 + u16(bytes, p + 20) == bytes.length) {
        // directory probe: the candidate's cdOff must point at a real
        // central-file header (PK\1\2), or declare zero entries, or
        // carry the ZIP64 sentinel (accepted here, fenced below) — a
        // length-consistent fake EOCD planted in a comment fails this
        // and the scan continues to the real record
        val t = u16(bytes, p + 10)
        val off = u32(bytes, p + 16)
        // a zero-entry candidate is only plausible when its OWN
        // fields cohere: cd size 0 and cdOff landing exactly at this
        // record — otherwise a crafted comment embedding a fake empty
        // EOCD would win the backward scan and HIDE the real members
        // (the hole this probe exists to close, in the worse
        // direction). Stated trade: an EMPTY archive behind a
        // self-extractor stub (cdOff shifted by the prefix) now reads
        // None instead of Some(empty) — a tolerance like cdOff <= p
        // would reopen the hide attack (a planted all-zero EOCD sits
        // AFTER the real record, so the backward scan hits it first),
        // and an empty archive carries nothing to lose: both results
        // yield zero members downstream
        val emptyOk = t == 0 && u32(bytes, p + 12) == 0L && off == p.toLong
        val plausible =
          t == 0xFFFF || off == 0xFFFFFFFFL || emptyOk ||
            (t > 0 && off + 4 <= bytes.length && bytes(off.toInt) == 'P' &&
              bytes(off.toInt + 1) == 'K' && bytes(off.toInt + 2) == 1 &&
              bytes(off.toInt + 3) == 2)
        if (plausible) eocd = p else p -= 1
      } else p -= 1
    }
    if (eocd < 0) return None
    val total = u16(bytes, eocd + 10)
    val cdOff = u32(bytes, eocd + 16)
    if (total == 0xFFFF || cdOff == 0xFFFFFFFFL) return None // ZIP64
    val out = Vector.newBuilder[Entry]
    var cp = cdOff
    var i = 0
    while (i < total) {
      if (cp + 46 > bytes.length) return None
      val c = cp.toInt
      if (!(bytes(c) == 'P' && bytes(c + 1) == 'K' && bytes(c + 2) == 1 &&
            bytes(c + 3) == 2)) return None
      val gp = u16(bytes, c + 8)
      val method = u16(bytes, c + 10)
      val crc = u32(bytes, c + 16)
      val csz = u32(bytes, c + 20)
      val usz = u32(bytes, c + 24)
      val nLen = u16(bytes, c + 28)
      val xLen = u16(bytes, c + 30)
      val mLen = u16(bytes, c + 32)
      val off = u32(bytes, c + 42)
      if (c + 46 + nLen > bytes.length) return None
      if (csz == 0xFFFFFFFFL || usz == 0xFFFFFFFFL ||
          off == 0xFFFFFFFFL) return None // ZIP64 sentinels
      // GP bit 11: name is UTF-8; otherwise CP437 — decoded as
      // ISO-8859-1 (identical over ASCII, where every OOXML part
      // name lives)
      val cs = if ((gp & 0x800) != 0) "UTF-8" else "ISO-8859-1"
      val name = new String(bytes, c + 46, nLen, cs)
      out += Entry(name, method, csz, usz, crc, off, (gp & 1) != 0)
      cp += 46 + nLen + xLen + mLen
      i += 1
    }
    Some(out.result())
  }

  /** One entry's bytes: stored copy or raw-inflate, size- and
    * CRC-verified against the central directory; None for encrypted,
    * exotic-method, truncated, over-cap, or corrupt entries.
    */
  def extract(bytes: Array[Byte], e: Entry): Option[Array[Byte]] = {
    if (e.encrypted || e.uncompSize > MaxEntryBytes) return None
    val lh = e.offset
    if (lh + 30 > bytes.length) return None
    val l = lh.toInt
    if (!(bytes(l) == 'P' && bytes(l + 1) == 'K' && bytes(l + 2) == 3 &&
          bytes(l + 3) == 4)) return None
    // the LOCAL name/extra lengths frame the data start (they differ
    // from the central copy in real archives — extra fields especially)
    val dataOff = lh + 30 + u16(bytes, l + 26) + u16(bytes, l + 28)
    if (dataOff + e.compSize > bytes.length) return None
    val out: Array[Byte] = e.method match {
      case 0 =>
        if (e.compSize != e.uncompSize) return None
        java.util.Arrays.copyOfRange(bytes, dataOff.toInt,
          (dataOff + e.compSize).toInt)
      case 8 =>
        val inf = new java.util.zip.Inflater(true) // raw deflate
        try {
          inf.setInput(bytes, dataOff.toInt, e.compSize.toInt)
          val buf = new Array[Byte](e.uncompSize.toInt)
          var got = 0
          var stalled = false
          while (got < buf.length && !inf.finished() && !stalled) {
            val n = inf.inflate(buf, got, buf.length - got)
            got += n
            if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
              stalled = true // truncated/odd stream: no partial output
          }
          if (got != buf.length) return None
          buf
        } catch {
          case _: java.util.zip.DataFormatException => return None
        } finally inf.end()
      case _ => return None // implode/bzip2/LZMA/AES: fence the entry
    }
    val crc = new java.util.zip.CRC32()
    crc.update(out)
    if (crc.getValue != e.crc) None else Some(out)
  }

  /** First entry with this exact name, extracted. */
  def extract(bytes: Array[Byte], name: String): Option[Array[Byte]] =
    entries(bytes).flatMap(_.find(_.name == name)).flatMap(extract(bytes, _))

  /** One archive, the directory parsed ONCE: the office dispatch
    * tries several ZIP dialects per crawled payload (docx → xlsx →
    * epub → odt), and each dialect needs several members — without a
    * shared view every lookup repeats the EOCD backward scan and the
    * full central-directory walk (a 100-chapter EPUB would walk it
    * ~100 times). Member extraction (inflate + CRC) still runs per
    * request — only the DIRECTORY is cached, so the memory cost is
    * the entry table, not content.
    */
  final class View(bytes: Array[Byte]) {
    private lazy val es: Option[Vector[Entry]] = entries(bytes)
    def isZip: Boolean = es.isDefined
    def has(name: String): Boolean = es.exists(_.exists(_.name == name))
    def extract(name: String): Option[Array[Byte]] =
      es.flatMap(_.find(_.name == name)).flatMap(Zip.extract(bytes, _))
  }

  /** Writer (fixture generator + the archive face of [[Docx.write]]):
    * each member stored or deflated per the flag; sizes known up
    * front, so no data descriptors; names written UTF-8 with GP
    * bit 11. `comment` exercises the EOCD backward scan.
    */
  def write(files: Seq[(String, Array[Byte], Boolean)],
            comment: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    final case class Central(name: Array[Byte], method: Int, crc: Long,
                             csz: Int, usz: Int, off: Int)
    val centrals = files.map { case (name, data, deflate) =>
      val nb = name.getBytes("UTF-8")
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val comp =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(data); d.finish()
            val bo = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
            bo.toByteArray
          } finally d.end()
        }
      val off = out.size()
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      w16(20); w16(0x800); w16(if (deflate) 8 else 0) // version, GP, method
      w16(0); w16(0) // mod time/date
      w32(crc.getValue); w32(comp.length.toLong); w32(data.length.toLong)
      w16(nb.length); w16(0)
      out.write(nb); out.write(comp)
      Central(nb, if (deflate) 8 else 0, crc.getValue, comp.length,
        data.length, off)
    }
    val cdStart = out.size()
    centrals.foreach { c =>
      out.write('P'); out.write('K'); out.write(1); out.write(2)
      w16(20); w16(20); w16(0x800); w16(c.method)
      w16(0); w16(0)
      w32(c.crc); w32(c.csz.toLong); w32(c.usz.toLong)
      w16(c.name.length); w16(0); w16(0)
      w16(0); w16(0); w32(0) // disk, internal, external attrs
      w32(c.off.toLong)
      out.write(c.name)
    }
    val cdSize = out.size() - cdStart
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    w16(0); w16(0); w16(centrals.size); w16(centrals.size)
    w32(cdSize.toLong); w32(cdStart.toLong)
    w16(comment.length)
    out.write(comment)
    out.toByteArray
  }
}
