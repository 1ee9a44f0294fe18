package graft.multimodal

/** TIFF IFD walk — triage for the scanned-document/map/GIS class a
  * crawl serves as TIFF: dimensions, compression scheme, sample
  * layout, and the PAGE CENSUS (multi-IFD files are multi-page scans)
  * from the directory structure alone, no raster decoded (the
  * [[Mp3]]/[[Mp4]]/[[Ogg]] triage rationale — a 100 TB pass that
  * only needs "is this a 40-page 1-bit fax or an RGB aerial tile"
  * should not pay for LZW strips).
  *
  * Profile (TIFF 6.0 baseline structure):
  *   - Both byte orders ("II*\0" little, "MM\0*" big — the format's
  *     defining quirk; every read goes through the order-aware
  *     accessors).
  *   - IFD walk: u16 entry count, 12-byte entries (tag, type, count,
  *     value-or-offset; values ≤ 4 bytes live INLINE left-justified
  *     in byte order — SHORT vs LONG handled for the evidence tags),
  *     u32 next-IFD chain followed with a page cap AND a visited-set
  *     cycle guard (a crafted next pointer must not hang a task —
  *     the fuzz-fence discipline).
  *   - Evidence from IFD0: ImageWidth/Length (256/257, SHORT or
  *     LONG), BitsPerSample (258, first value — per-channel widths
  *     beyond 4 bytes resolve through the offset), Compression
  *     (259: 1 none, 5 LZW, 6/7 JPEG, 32773 PackBits …),
  *     PhotometricInterpretation (262), SamplesPerPixel (277).
  *   - An IFD overrunning the payload stops the walk keeping pages
  *     already counted; IFD0 itself failing → None (the evidence
  *     never arrived — the WARC truncation discipline).
  *
  * [[write]] emits the real structure in EITHER byte order, with
  * out-of-line BitsPerSample arrays, strip tags and raster bytes for
  * realism, and optional extra pages for the census.
  */
object Tiff {

  /** Triage evidence from IFD0 + the chain census. Missing optional
    * tags report their TIFF defaults (bps 1, spp 1, compression 1).
    */
  final case class Info(bigEndian: Boolean, width: Int, height: Int,
                        compression: Int, bitsPerSample: Int,
                        samplesPerPixel: Int, photometric: Int,
                        pages: Int)

  private val MaxPages = 256 // census cap: crawl evidence, not a viewer

  private final class Rd(b: Array[Byte], big: Boolean) {
    def u16(p: Int): Int =
      if (p + 2 > b.length) -1
      else if (big) ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
      else ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
    def u32(p: Int): Long =
      if (p + 4 > b.length) -1L
      else if (big)
        ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
          ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      else
        ((b(p + 3) & 0xffL) << 24) | ((b(p + 2) & 0xffL) << 16) |
          ((b(p + 1) & 0xffL) << 8) | (b(p) & 0xffL)
  }

  def parse(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 8) return None
    val big =
      if (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
          bytes(3) == 42) true
      else if (bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 &&
               bytes(3) == 0) false
      else return None
    val rd = new Rd(bytes, big)
    var ifd = rd.u32(4)
    if (ifd < 8 || ifd >= bytes.length) return None
    var width = 0; var height = 0
    var compression = 1; var bps = 1; var spp = 1; var photometric = -1
    var pages = 0
    val seen = scala.collection.mutable.Set.empty[Long]
    var going = true
    while (going && ifd > 0 && pages < MaxPages) {
      if (!seen.add(ifd) || ifd + 2 > bytes.length) going = false // cycle
      else {
        val n = rd.u16(ifd.toInt)
        val entriesEnd = ifd + 2 + 12L * n
        if (n <= 0 || entriesEnd + 4 > bytes.length) going = false
        else {
          if (pages == 0) {
            var i = 0
            while (i < n) {
              val e = (ifd + 2 + 12 * i).toInt
              val tag = rd.u16(e)
              val typ = rd.u16(e + 2)
              val count = rd.u32(e + 4)
              // SHORT (3) inline value sits in the FIRST 2 bytes of
              // the value field in byte order; LONG (4) uses all 4.
              // A count > 2 SHORTs / > 1 LONG lives out of line.
              def scalar: Int =
                if (typ == 3 && count >= 1) {
                  if (count <= 2) rd.u16(e + 8)
                  else { // out of line: first element at the offset
                    val off = rd.u32(e + 8)
                    if (off >= 0 && off + 2 <= bytes.length) rd.u16(off.toInt)
                    else -1
                  }
                } else if (typ == 4 && count == 1) rd.u32(e + 8).toInt
                else -1
              tag match {
                case 256 => val v = scalar; if (v > 0) width = v
                case 257 => val v = scalar; if (v > 0) height = v
                case 258 => val v = scalar; if (v > 0) bps = v
                case 259 => val v = scalar; if (v > 0) compression = v
                case 262 => val v = scalar; if (v >= 0) photometric = v
                case 277 => val v = scalar; if (v > 0) spp = v
                case _ => ()
              }
              i += 1
            }
          }
          pages += 1
          ifd = rd.u32((entriesEnd).toInt)
          if (ifd < 0) going = false
        }
      }
    }
    if (pages == 0 || width <= 0 || height <= 0) None
    else Some(Info(big, width, height, compression, bps, spp,
      photometric, pages))
  }

  // ---- writer (fixture generator) ----

  private final class Wr(big: Boolean) {
    val o = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (big) { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
      else { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit =
      if (big) {
        o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
        o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
      } else {
        o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
      }
    def size: Int = o.size()
  }

  /** One IFD at the writer's current position. `entries` are
    * (tag, type, count, inlineValue) — inline values only; the
    * caller appends out-of-line data itself and passes offsets.
    */
  private def ifd(w: Wr, entries: Seq[(Int, Int, Long, Long)],
                  next: Long): Unit = {
    w.u16(entries.size)
    entries.sortBy(_._1).foreach { case (tag, typ, count, value) =>
      w.u16(tag); w.u16(typ); w.u32(count)
      if (typ == 3 && count <= 2) {
        // SHORT inline: first 2 bytes of the field in byte order
        w.u16(value.toInt); w.u16(0)
      } else w.u32(value)
    }
    w.u32(next)
  }

  /** Real structure in either byte order: header, per-page raster
    * bytes + a 3-element out-of-line BitsPerSample when spp == 3,
    * IFDs chained for `pages` pages (all pages share the evidence
    * shape; IFD0 carries it).
    */
  def write(big: Boolean, width: Int, height: Int, compression: Int,
            bitsPerSample: Int, samplesPerPixel: Int, photometric: Int,
            pages: Int = 1): Array[Byte] = {
    val w = new Wr(big)
    if (big) { w.o.write('M'); w.o.write('M'); w.o.write(0); w.o.write(42) }
    else { w.o.write('I'); w.o.write('I'); w.o.write(42); w.o.write(0) }
    // layout per page: [raster][bps array if spp==3][IFD]; header's
    // IFD0 pointer patched by construction: compute sizes up front
    val rasterBytes = math.max(1, width * height * samplesPerPixel *
      bitsPerSample / 8)
    val bpsOutOfLine = samplesPerPixel == 3
    val nEntries = 8
    val ifdSize = 2 + 12 * nEntries + 4
    val perPage = rasterBytes + (if (bpsOutOfLine) 6 else 0) + ifdSize
    def pageStart(i: Int) = 8 + perPage * i
    w.u32(pageStart(0).toLong + rasterBytes + (if (bpsOutOfLine) 6 else 0))
    var pg = 0
    while (pg < pages) {
      val start = pageStart(pg)
      var i = 0
      while (i < rasterBytes) { w.o.write((i * 31 + pg) & 0xff); i += 1 }
      val bpsOff = start + rasterBytes
      if (bpsOutOfLine) { w.u16(bitsPerSample); w.u16(bitsPerSample); w.u16(bitsPerSample) }
      val next = if (pg == pages - 1) 0L
                 else pageStart(pg + 1).toLong + rasterBytes +
                   (if (bpsOutOfLine) 6 else 0)
      ifd(w, Seq(
        (256, 3, 1L, width.toLong),
        (257, 4, 1L, height.toLong), // LONG arm exercised
        (258, 3, samplesPerPixel.toLong,
          if (bpsOutOfLine) bpsOff.toLong else bitsPerSample.toLong),
        (259, 3, 1L, compression.toLong),
        (262, 3, 1L, photometric.toLong),
        (273, 4, 1L, start.toLong), // StripOffsets
        (277, 3, 1L, samplesPerPixel.toLong),
        (279, 4, 1L, rasterBytes.toLong)), // StripByteCounts
        next)
      pg += 1
    }
    w.o.toByteArray
  }
}
