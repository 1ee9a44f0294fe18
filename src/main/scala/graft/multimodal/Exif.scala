package graft.multimodal

/** EXIF metadata over JPEG APP1 — the image half of the PRIVACY
  * story (q52 scrubs contact strings out of text; crawled photos
  * carry GPS coordinates, camera serials and timestamps in their
  * EXIF block, and a training pipeline that ships them ships PII).
  * Two faces:
  *   - [[parse]]: the audit evidence — orientation (the one field a
  *     training pipeline USES: pixel decode must know whether to
  *     rotate), GPS presence, original-timestamp presence, camera
  *     make. Evidence only: values beyond orientation/make are not
  *     decoded, because the scrub ships the bytes OUT, not through.
  *   - [[strip]]: the scrub — the APP1(Exif) and COM segments drop
  *     WHOLE (the sanitizer convention: rebuilding a TIFF block
  *     minus its GPS IFD risks leaving vendor MakerNote copies of
  *     the same coordinates; dropping the block cannot), pixel
  *     segments byte-identical, JFIF APP0 kept (it carries no PII
  *     and some decoders want it).
  *
  * The TIFF-in-APP1 walk is bounds-checked and cycle-capped like
  * every parser in this family ([[Tiff]]'s discipline): entry counts
  * capped, every out-of-line offset checked against the segment,
  * a malformed block parses as None (audit says "no evidence", the
  * strip still removes it — hostile metadata must not survive by
  * being malformed).
  *
  * [[write]] is the fixture writer: a REAL little-endian TIFF block
  * (IFD0 with Make/Orientation and Exif/GPS IFD pointers, the GPS
  * IFD carrying real RATIONAL coordinates, DateTimeOriginal in the
  * Exif IFD) inserted as APP1 after SOI — so the oracle path rides
  * real offsets, not a canned blob.
  */
object Exif {

  final case class Info(orientation: Int, hasGps: Boolean,
                        hasTimestamp: Boolean, make: Option[String])

  private val ExifHeader: Array[Byte] =
    Array('E', 'x', 'i', 'f', 0, 0)

  /** Segments of a JPEG as (marker, start, length-with-header), up
    * to and INCLUDING the SOS marker — everything after SOS is
    * entropy-coded data handled verbatim. None when not a JPEG.
    */
  private def segments(b: Array[Byte])
      : Option[Vector[(Int, Int, Int)]] = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
    val out = Vector.newBuilder[(Int, Int, Int)]
    var p = 2
    var going = true
    while (going) {
      if (p + 2 > b.length) return None // cut before SOS: fence
      if ((b(p) & 0xff) != 0xFF) return None
      val m = b(p + 1) & 0xff
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) {
        out += ((m, p, 2)); p += 2 // standalone markers
      } else {
        if (p + 4 > b.length) return None
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length) return None
        out += ((m, p, 2 + len))
        p += 2 + len
        if (m == 0xDA) going = false // SOS: entropy data follows
      }
    }
    Some(out.result())
  }

  private def isExifApp1(b: Array[Byte], start: Int, len: Int): Boolean =
    len >= 4 + ExifHeader.length &&
      (0 until ExifHeader.length).forall(i =>
        b(start + 4 + i) == ExifHeader(i))

  /** Whether the scrub GOVERNS this container (JPEG/PNG/WebP/TIFF
    * by magic) — distinct from whether [[strip]] succeeded: a
    * governed container whose grammar breaks returns None from
    * strip, and a privacy-governed store must treat that as a FENCE
    * (the bytes may still carry intact EXIF ahead of the breakage —
    * "hostile metadata must not survive by being malformed"), while
    * an ungoverned container (GIF, PDF, …) passes through untouched.
    */
  def governs(b: Array[Byte]): Boolean =
    b != null &&
      (isJpeg(b) || isPng(b) || isWebp(b) || isTiff(b))

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8
  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G' && (b(4) & 0xff) == 0x0D &&
      (b(5) & 0xff) == 0x0A && (b(6) & 0xff) == 0x1A && (b(7) & 0xff) == 0x0A
  private def isWebp(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
      b(11) == 'P'
  private def isTiff(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42))

  /** EXIF evidence across the FOUR containers the same TIFF block
    * rides in a crawl — JPEG APP1, PNG `eXIf` chunk, WebP `EXIF`
    * chunk, and the standalone TIFF file itself. None when the bytes
    * are none of those containers, carry no EXIF block, or the block
    * is malformed.
    */
  def parse(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null) return None
    if (isJpeg(bytes))
      segments(bytes).flatMap { segs =>
        segs.find { case (m, s, l) => m == 0xE1 && isExifApp1(bytes, s, l) }
          .flatMap { case (_, s, l) =>
            parseTiff(bytes, s + 4 + ExifHeader.length,
              l - 4 - ExifHeader.length)
          }
      }
    else if (isPng(bytes))
      pngChunks(bytes).flatMap(_.find(_._1 == "eXIf")
        .flatMap { case (_, at, total) =>
          parseTiff(bytes, at + 8, total - 12)
        })
    else if (isWebp(bytes))
      webpChunks(bytes).flatMap(_.find(_._1 == "EXIF")
        .flatMap { case (_, at, _, dataLen) =>
          parseTiff(bytes, at + 8, dataLen)
        })
    else if (isTiff(bytes)) parseTiff(bytes, 0, bytes.length)
    else None
  }

  private def parseTiff(b: Array[Byte], off: Int,
                        size: Int): Option[Info] = {
    if (size < 8) return None
    val le =
      if (b(off) == 'I' && b(off + 1) == 'I') true
      else if (b(off) == 'M' && b(off + 1) == 'M') false
      else return None
    def u16(p: Int): Int = {
      if (p < 0 || p + 2 > size) return -1
      val a = b(off + p) & 0xff; val c = b(off + p + 1) & 0xff
      if (le) a | (c << 8) else (a << 8) | c
    }
    def u32(p: Int): Long = {
      if (p < 0 || p + 4 > size) return -1L
      val x0 = b(off + p) & 0xffL; val x1 = b(off + p + 1) & 0xffL
      val x2 = b(off + p + 2) & 0xffL; val x3 = b(off + p + 3) & 0xffL
      if (le) x0 | (x1 << 8) | (x2 << 16) | (x3 << 24)
      else (x0 << 24) | (x1 << 16) | (x2 << 8) | x3
    }
    if (u16(2) != 42) return None
    val ifd0 = u32(4)
    if (ifd0 < 0 || ifd0 > size) return None
    var orientation = 1 // the TIFF default: upright
    var make: Option[String] = None
    var gpsPtr = -1L
    var exifPtr = -1L
    var hasTs = false
    // one IFD's entries → side effects above; returns false on a
    // malformed table (entry count lying past the block)
    def walk(at: Long, isExifIfd: Boolean): Boolean = {
      val n = u16(at.toInt)
      if (n < 0 || n > 512) return false
      var i = 0
      while (i < n) {
        val e = at.toInt + 2 + 12 * i
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        if (tag < 0 || typ < 0 || count < 0) return false
        if (!isExifIfd) tag match {
          case 0x0112 if typ == 3 => // Orientation SHORT, inline
            val v = u16(e + 8)
            if (v >= 1 && v <= 8) orientation = v
          case 0x010F if typ == 2 && count >= 1 => // Make ASCII
            val c = math.min(count, 128L).toInt
            val vo = if (count <= 4) e + 8 else u32(e + 8).toInt
            if (vo >= 0 && vo + c <= size) {
              val raw = new String(b, off + vo, c, "US-ASCII")
              val nul = raw.indexOf('\u0000')
              make = Some(if (nul >= 0) raw.substring(0, nul) else raw)
                .filter(_.nonEmpty)
            }
          case 0x8825 if typ == 4 => gpsPtr = u32(e + 8)
          case 0x8769 if typ == 4 => exifPtr = u32(e + 8)
          case _ => ()
        } else tag match {
          case 0x9003 | 0x9004 | 0x0132 => hasTs = true // DateTime*
          case _ => ()
        }
        i += 1
      }
      true
    }
    if (!walk(ifd0, isExifIfd = false)) return None
    if (exifPtr >= 0 && exifPtr < size) {
      if (!walk(exifPtr, isExifIfd = true)) return None
    }
    val hasGps = gpsPtr >= 0 && gpsPtr < size && u16(gpsPtr.toInt) > 0
    Some(Info(orientation, hasGps, hasTs, make))
  }

  /** The scrub, all four containers. Whole-segment-drop wherever the
    * metadata rides a droppable carrier:
    *   - JPEG: EVERY APP1 (Exif, and XMP — which routinely duplicates
    *     the same GPS coordinates and timestamps in RDF form), APP13
    *     (Photoshop/IPTC) and COM drop whole; pixel segments
    *     byte-identical, JFIF APP0 kept. Dropping ALL APP1 rather
    *     than only Exif-headed ones is deliberate: a scrub that
    *     pattern-matches headers lets PII survive by mislabeling,
    *     and no APP1 variant carries pixel data.
    *   - PNG: the `eXIf` chunk and the three text-metadata chunks
    *     (tEXt/zTXt/iTXt — XMP rides iTXt, comments ride tEXt) drop
    *     whole; every other chunk byte-identical, CRCs untouched.
    *   - WebP: the `EXIF` and `XMP ` RIFF chunks drop whole; a VP8X
    *     header keeps its place with its EXIF/XMP presence bits
    *     cleared; the RIFF size is rewritten; pixel chunks
    *     byte-identical.
    *   - standalone TIFF: the container IS the pixel carrier, so
    *     nothing can drop whole — instead the GPS IFD is UNLINKED
    *     from IFD0 and its table + out-of-line rationals are
    *     OVERWRITTEN with zeros (unreferenced PII is still PII), and
    *     the DateTime tags (IFD0 0x0132, Exif IFD 0x9003/0x9004) are
    *     removed with their string bytes zeroed. Orientation and
    *     camera make survive (pixel-relevant, not PII). Entry
    *     removal is swap-with-last, which terminates any IFD chain
    *     past the edited table — conservative: a thumbnail IFD is a
    *     pixel copy that could re-embed what was scrubbed.
    *
    * None when the bytes are none of the four containers or the
    * container grammar is broken (the caller's media route keeps
    * governing them — hostile metadata must not survive by being
    * malformed). Idempotent in every arm.
    */
  def strip(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null) return None
    if (isJpeg(bytes))
      segments(bytes).map { segs =>
        val out = new java.io.ByteArrayOutputStream(bytes.length)
        out.write(0xFF); out.write(0xD8)
        var tail = -1
        segs.foreach { case (m, s, l) =>
          val drop = m == 0xE1 || m == 0xED || m == 0xFE
          if (!drop) out.write(bytes, s, l)
          if (m == 0xDA) tail = s + l
        }
        if (tail >= 0) out.write(bytes, tail, bytes.length - tail)
        out.toByteArray
      }
    else if (isPng(bytes))
      pngChunks(bytes).map { chunks =>
        val out = new java.io.ByteArrayOutputStream(bytes.length)
        out.write(bytes, 0, 8)
        val dropTypes = Set("eXIf", "tEXt", "zTXt", "iTXt")
        var tail = -1
        chunks.foreach { case (typ, at, total) =>
          if (!dropTypes.contains(typ)) out.write(bytes, at, total)
          if (typ == "IEND") tail = at + total
        }
        // bytes past IEND (if any) ride along verbatim, like the
        // JPEG post-SOS tail
        if (tail >= 0 && tail < bytes.length)
          out.write(bytes, tail, bytes.length - tail)
        out.toByteArray
      }
    else if (isWebp(bytes))
      webpChunks(bytes).map { chunks =>
        val body = new java.io.ByteArrayOutputStream(bytes.length)
        chunks.foreach { case (cc, at, total, _) =>
          if (cc != "EXIF" && cc != "XMP ") {
            if (cc == "VP8X" && total >= 9) {
              val c = java.util.Arrays.copyOfRange(bytes, at, at + total)
              // clear the EXIF (0x08) and XMP (0x04) presence bits
              c(8) = (c(8) & ~0x0C).toByte
              body.write(c, 0, c.length)
            } else body.write(bytes, at, total)
          }
        }
        val payload = body.toByteArray
        val out = new java.io.ByteArrayOutputStream(12 + payload.length)
        out.write(bytes, 0, 4) // "RIFF"
        val sz = 4L + payload.length // "WEBP" + chunks
        out.write((sz & 0xff).toInt); out.write(((sz >> 8) & 0xff).toInt)
        out.write(((sz >> 16) & 0xff).toInt); out.write(((sz >> 24) & 0xff).toInt)
        out.write(bytes, 8, 4) // "WEBP"
        out.write(payload, 0, payload.length)
        out.toByteArray
      }
    else if (isTiff(bytes)) stripTiffStandalone(bytes)
    else None
  }

  /** PNG chunk walk: (type, start, total-length-with-framing) rows in
    * file order through IEND. None when the grammar breaks before
    * IEND (a cut PNG is not governable — and not decodable either).
    */
  private def pngChunks(b: Array[Byte])
      : Option[Vector[(String, Int, Int)]] = {
    val out = Vector.newBuilder[(String, Int, Int)]
    var p = 8
    while (true) {
      if (p + 8 > b.length) return None
      val len = ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      if (len > Int.MaxValue - 12 || p + 12 + len > b.length) return None
      val typ = new String(b, p + 4, 4, "ISO-8859-1")
      val total = 12 + len.toInt
      out += ((typ, p, total))
      if (typ == "IEND") return Some(out.result())
      p += total
    }
    None // unreachable
  }

  /** WebP RIFF chunk walk: (fourcc, start, total-with-pad, dataLen)
    * rows. None when the container grammar breaks.
    */
  private def webpChunks(b: Array[Byte])
      : Option[Vector[(String, Int, Int, Int)]] = {
    val out = Vector.newBuilder[(String, Int, Int, Int)]
    var p = 12
    while (p < b.length) {
      if (p + 8 > b.length) return None
      val size = (b(p + 4) & 0xffL) | ((b(p + 5) & 0xffL) << 8) |
        ((b(p + 6) & 0xffL) << 16) | ((b(p + 7) & 0xffL) << 24)
      if (size > Int.MaxValue - 9) return None
      val total = 8 + size.toInt + (size.toInt & 1)
      if (p + 8 + size > b.length) return None
      val cc = new String(b, p, 4, "ISO-8859-1")
      out += ((cc, p, math.min(total, b.length - p), size.toInt))
      p += total
    }
    Some(out.result())
  }

  /** The standalone-TIFF scrub (see [[strip]]): GPS IFD unlinked and
    * zeroed, DateTime entries removed with their bytes zeroed, on a
    * CLONE — same length, pixel strips byte-identical in place.
    */
  private def stripTiffStandalone(orig: Array[Byte]): Option[Array[Byte]] = {
    val b = orig.clone()
    val size = b.length
    val le = b(0) == 'I'
    def u16(p: Int): Int = {
      if (p < 0 || p + 2 > size) return -1
      val a = b(p) & 0xff; val c = b(p + 1) & 0xff
      if (le) a | (c << 8) else (a << 8) | c
    }
    def u32(p: Int): Long = {
      if (p < 0 || p + 4 > size) return -1L
      val x0 = b(p) & 0xffL; val x1 = b(p + 1) & 0xffL
      val x2 = b(p + 2) & 0xffL; val x3 = b(p + 3) & 0xffL
      if (le) x0 | (x1 << 8) | (x2 << 16) | (x3 << 24)
      else (x0 << 24) | (x1 << 16) | (x2 << 8) | x3
    }
    def w16(p: Int, v: Int): Unit = {
      if (le) { b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte }
      else { b(p) = ((v >> 8) & 0xff).toByte; b(p + 1) = (v & 0xff).toByte }
    }
    def zero(from: Int, n: Int): Unit = {
      var i = math.max(0, from)
      val end = math.min(size, from + n)
      while (i < end) { b(i) = 0; i += 1 }
    }
    if (u16(2) != 42) return None
    val ifd0 = u32(4)
    if (ifd0 < 0 || ifd0 + 2 > size) return None
    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1
      case 3 | 8 => 2
      case 4 | 9 | 11 => 4
      case 5 | 10 | 12 => 8
      case _ => 0
    }
    // zero an entry's VALUE — inline and out-of-line both
    def zeroValue(e: Int): Unit = {
      val t = u16(e + 2); val count = u32(e + 4)
      val ts = typeSize(t)
      if (count >= 0 && ts > 0) {
        val byteLen = count * ts
        if (byteLen > 4) {
          val vo = u32(e + 8)
          if (vo >= 0 && vo + byteLen <= size) zero(vo.toInt, byteLen.toInt)
        }
      }
      zero(e + 8, 4)
    }
    // find the GPS / Exif IFD pointers BEFORE any edit
    var gpsPtr = -1L; var exifPtr = -1L
    val n0 = u16(ifd0.toInt)
    if (n0 < 0 || n0 > 512) return None
    var i = 0
    while (i < n0) {
      val e = ifd0.toInt + 2 + 12 * i
      u16(e) match {
        case 0x8825 if u16(e + 2) == 4 => gpsPtr = u32(e + 8)
        case 0x8769 if u16(e + 2) == 4 => exifPtr = u32(e + 8)
        case _ => ()
      }
      i += 1
    }
    // zero the whole GPS IFD: each entry's out-of-line data, then the
    // table region itself (unreferenced PII is still PII)
    if (gpsPtr >= 0 && gpsPtr + 2 <= size) {
      val gn = u16(gpsPtr.toInt)
      if (gn >= 0 && gn <= 512) {
        var j = 0
        while (j < gn) { zeroValue(gpsPtr.toInt + 2 + 12 * j); j += 1 }
        zero(gpsPtr.toInt, 2 + 12 * gn + 4)
      }
    }
    // remove tagged entries from one IFD: swap-with-last + zero the
    // stale slot (which also writes 0 where a shrunk reader looks for
    // the next-IFD pointer — the documented chain termination)
    def removeEntries(ifdAt: Int, tags: Set[Int]): Unit = {
      var n = u16(ifdAt)
      if (n < 0 || n > 512) return
      var k = 0
      while (k < n) {
        val e = ifdAt + 2 + 12 * k
        if (tags.contains(u16(e))) {
          zeroValue(e)
          val last = ifdAt + 2 + 12 * (n - 1)
          if (e != last) System.arraycopy(b, last, b, e, 12)
          zero(last, 12)
          n -= 1
          w16(ifdAt, n)
          // re-examine the swapped-in entry at k
        } else k += 1
      }
    }
    removeEntries(ifd0.toInt, Set(0x8825, 0x0132))
    if (exifPtr >= 0 && exifPtr + 2 <= size)
      removeEntries(exifPtr.toInt, Set(0x9003, 0x9004))
    Some(b)
  }

  // ---- writer (fixture generator) ----

  /** `jpeg` with a REAL EXIF APP1 inserted after SOI: IFD0 carries
    * Make + Orientation + Exif-IFD pointer (DateTimeOriginal) and,
    * when `gps` is set, a GPS IFD with RATIONAL lat/lon. COM adds a
    * comment segment too (the other metadata carrier [[strip]] must
    * remove).
    */
  def write(jpeg: Array[Byte], orientation: Int,
            gps: Option[(Double, Double)],
            make: Option[String],
            dateTime: Option[String],
            comment: Option[String] = None): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xFF &&
      (jpeg(1) & 0xff) == 0xD8, "not a JPEG")
    val tiff = buildTiff(orientation, gps, make, dateTime)
    val app1Len = 2 + ExifHeader.length + tiff.length
    val out = new java.io.ByteArrayOutputStream(jpeg.length + app1Len + 8)
    out.write(0xFF); out.write(0xD8)
    out.write(0xFF); out.write(0xE1)
    out.write((app1Len >> 8) & 0xff); out.write(app1Len & 0xff)
    out.write(ExifHeader); out.write(tiff, 0, tiff.length)
    comment.foreach { c =>
      val cb = c.getBytes("ISO-8859-1")
      out.write(0xFF); out.write(0xFE)
      out.write(((cb.length + 2) >> 8) & 0xff); out.write((cb.length + 2) & 0xff)
      out.write(cb, 0, cb.length)
    }
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** `png` with a REAL `eXIf` chunk (the same TIFF block as the JPEG
    * writer) inserted after IHDR, plus a `tEXt` comment chunk when
    * given — CRCs computed for real, so the scrubbed file's remaining
    * chunks stay verifiable.
    */
  def writePng(png: Array[Byte], orientation: Int,
               gps: Option[(Double, Double)],
               make: Option[String],
               dateTime: Option[String],
               comment: Option[String] = None): Array[Byte] = {
    require(isPng(png), "not a PNG")
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(12 + data.length)
      val len = data.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val tb = typ.getBytes("ISO-8859-1")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(((c >> 24) & 0xff).toInt); out.write(((c >> 16) & 0xff).toInt)
      out.write(((c >> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
      out.toByteArray
    }
    val chunks = pngChunks(png).getOrElse(
      throw new IllegalArgumentException("broken PNG fixture"))
    val (_, ihdrAt, ihdrTotal) = chunks.head
    val insertAt = ihdrAt + ihdrTotal
    val out = new java.io.ByteArrayOutputStream(png.length + 256)
    out.write(png, 0, insertAt)
    out.write(chunk("eXIf", buildTiff(orientation, gps, make, dateTime)))
    comment.foreach { c =>
      out.write(chunk("tEXt",
        "Comment".getBytes("ISO-8859-1") ++ Array(0.toByte) ++
          c.getBytes("ISO-8859-1")))
    }
    out.write(png, insertAt, png.length - insertAt)
    out.toByteArray
  }

  /** `webp` (a plain VP8L still) rebuilt as an EXTENDED file: VP8X
    * header with the EXIF (and XMP when given) presence bits set and
    * the canvas dims read back off the VP8L header, the original
    * chunks, then the `EXIF` chunk (same TIFF block) and an `XMP `
    * chunk — the layout libwebp writes.
    */
  def writeWebp(webp: Array[Byte], orientation: Int,
                gps: Option[(Double, Double)],
                make: Option[String],
                dateTime: Option[String],
                xmp: Option[String] = None): Array[Byte] = {
    require(isWebp(webp), "not a WebP")
    val chunks = webpChunks(webp).getOrElse(
      throw new IllegalArgumentException("broken WebP fixture"))
    val vp8l = chunks.find(_._1 == "VP8L").getOrElse(
      throw new IllegalArgumentException("fixture needs a VP8L still"))
    // canvas dims off the VP8L header: 0x2f signature then two
    // LSB-first 14-bit (dim - 1) fields
    val d = vp8l._2 + 8
    require(d + 5 <= webp.length && (webp(d) & 0xff) == 0x2f, "bad VP8L")
    val v = (webp(d + 1) & 0xffL) | ((webp(d + 2) & 0xffL) << 8) |
      ((webp(d + 3) & 0xffL) << 16) | ((webp(d + 4) & 0xffL) << 24)
    val cw = (v & 0x3FFF).toInt      // width - 1
    val ch = ((v >> 14) & 0x3FFF).toInt // height - 1
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(9 + data.length)
      out.write(cc.getBytes("ISO-8859-1"), 0, 4)
      val n = data.length
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
      out.write(data, 0, n)
      if ((n & 1) == 1) out.write(0)
      out.toByteArray
    }
    val flags = 0x08 | (if (xmp.isDefined) 0x04 else 0)
    val vp8x = chunk("VP8X", Array[Byte](flags.toByte, 0, 0, 0,
      (cw & 0xff).toByte, ((cw >> 8) & 0xff).toByte, ((cw >> 16) & 0xff).toByte,
      (ch & 0xff).toByte, ((ch >> 8) & 0xff).toByte, ((ch >> 16) & 0xff).toByte))
    val exif = chunk("EXIF", buildTiff(orientation, gps, make, dateTime))
    val xmpC = xmp.map(x => chunk("XMP ", x.getBytes("UTF-8")))
      .getOrElse(Array.emptyByteArray)
    val body = new java.io.ByteArrayOutputStream(webp.length + 256)
    body.write(vp8x)
    chunks.foreach { case (_, at, total, _) => body.write(webp, at, total) }
    body.write(exif); body.write(xmpC, 0, xmpC.length)
    val payload = body.toByteArray
    val out = new java.io.ByteArrayOutputStream(12 + payload.length)
    out.write("RIFF".getBytes("ISO-8859-1"), 0, 4)
    val sz = 4 + payload.length
    out.write(sz & 0xff); out.write((sz >> 8) & 0xff)
    out.write((sz >> 16) & 0xff); out.write((sz >> 24) & 0xff)
    out.write("WEBP".getBytes("ISO-8859-1"), 0, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** A standalone-TIFF metadata fixture: the bare TIFF block (valid
    * header + IFDs; no pixel strips — the scrub walk is what it
    * exercises).
    */
  def writeTiff(orientation: Int, gps: Option[(Double, Double)],
                make: Option[String],
                dateTime: Option[String]): Array[Byte] =
    buildTiff(orientation, gps, make, dateTime)

  /** The raw little-endian TIFF block every container fixture
    * embeds — and, bare, a standalone-TIFF metadata fixture
    * ([[writeTiff]]).
    */
  private def buildTiff(orientation: Int,
                        gps: Option[(Double, Double)],
                        make: Option[String],
                        dateTime: Option[String]): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, "orientation 1..8")
    val t = new java.io.ByteArrayOutputStream(256)
    def w16(v: Int): Unit = { t.write(v & 0xff); t.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      t.write((v & 0xff).toInt); t.write(((v >> 8) & 0xff).toInt)
      t.write(((v >> 16) & 0xff).toInt); t.write(((v >> 24) & 0xff).toInt)
    }
    // layout (all offsets TIFF-relative): hdr(8), IFD0, [Exif IFD],
    // [GPS IFD], data region (Make string, DateTime string, GPS
    // rationals)
    val makeBytes = make.map(_ + "\u0000").map(_.getBytes("US-ASCII"))
    val dtBytes = dateTime.map(_ + "\u0000").map(_.getBytes("US-ASCII"))
    val n0 = 1 + makeBytes.size + dtBytes.map(_ => 1).getOrElse(0).min(1) +
      gps.size // orientation + make? + exifptr? + gpsptr?
    val nExif = if (dtBytes.isDefined) 1 else 0
    val ifd0Size = 2 + 12 * n0 + 4
    val exifIfdOff = 8L + ifd0Size
    val exifIfdSize = if (nExif > 0) 2 + 12 * nExif + 4 else 0
    val gpsIfdOff = exifIfdOff + exifIfdSize
    // GPS IFD: VersionID(inline) + LatRef + Lat(3 RATIONAL) + LonRef
    // + Lon(3 RATIONAL)
    val nGps = if (gps.isDefined) 5 else 0
    val gpsIfdSize = if (nGps > 0) 2 + 12 * nGps + 4 else 0
    var dataOff = gpsIfdOff + gpsIfdSize
    // header
    t.write('I'); t.write('I'); w16(42); w32(8L)
    // IFD0
    w16(n0)
    makeBytes.foreach { mb =>
      w16(0x010F); w16(2); w32(mb.length.toLong)
      if (mb.length <= 4) { t.write(mb); (mb.length until 4).foreach(_ => t.write(0)) }
      else { w32(dataOff); dataOff += mb.length }
    }
    w16(0x0112); w16(3); w32(1L); w16(orientation); w16(0)
    if (dtBytes.isDefined) { w16(0x8769); w16(4); w32(1L); w32(exifIfdOff) }
    if (gps.isDefined) { w16(0x8825); w16(4); w32(1L); w32(gpsIfdOff) }
    w32(0L) // next IFD
    // Exif IFD
    dtBytes.foreach { db =>
      w16(1)
      w16(0x9003); w16(2); w32(db.length.toLong)
      if (db.length <= 4) { t.write(db); (db.length until 4).foreach(_ => t.write(0)) }
      else { w32(dataOff); dataOff += db.length }
      w32(0L)
    }
    // GPS IFD
    gps.foreach { case (lat, lon) =>
      val latOff = dataOff; val lonOff = dataOff + 24
      dataOff += 48
      w16(nGps)
      w16(0x0000); w16(1); w32(4L); t.write(2); t.write(3); t.write(0); t.write(0)
      w16(0x0001); w16(2); w32(2L)
      t.write(if (lat >= 0) 'N' else 'S'); t.write(0); t.write(0); t.write(0)
      w16(0x0002); w16(5); w32(3L); w32(latOff)
      w16(0x0003); w16(2); w32(2L)
      t.write(if (lon >= 0) 'E' else 'W'); t.write(0); t.write(0); t.write(0)
      w16(0x0004); w16(5); w32(3L); w32(lonOff)
      w32(0L)
    }
    // data region, in the order offsets were handed out
    makeBytes.filter(_.length > 4).foreach(mb => t.write(mb, 0, mb.length))
    dtBytes.filter(_.length > 4).foreach(db => t.write(db, 0, db.length))
    gps.foreach { case (lat, lon) =>
      def rats(v: Double): Unit = {
        val a = math.abs(v)
        val deg = a.toInt
        val min = ((a - deg) * 60).toInt
        val sec = ((a - deg) * 3600 - min * 60 + 1e-9)
        w32(deg.toLong); w32(1L)
        w32(min.toLong); w32(1L)
        w32((sec * 1000).toLong); w32(1000L)
      }
      rats(lat); rats(lon)
    }
    t.toByteArray
  }
}
