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

  /** EXIF evidence, or None when the bytes are not a JPEG, carry no
    * Exif APP1, or the TIFF block is malformed.
    */
  def parse(bytes: Array[Byte]): Option[Info] =
    segments(bytes).flatMap { segs =>
      segs.find { case (m, s, l) => m == 0xE1 && isExifApp1(bytes, s, l) }
        .flatMap { case (_, s, l) =>
          parseTiff(bytes, s + 4 + ExifHeader.length, l - 4 - ExifHeader.length)
        }
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

  /** The scrub: the JPEG minus its metadata-carrier segments —
    * EVERY APP1 (Exif, and XMP, which routinely duplicates the same
    * GPS coordinates and timestamps in RDF form), APP13
    * (Photoshop/IPTC — location and byline fields), and COM. Pixel
    * segments byte-identical, JFIF APP0 kept (it carries no PII and
    * some decoders want it). Dropping ALL APP1 rather than only the
    * Exif-headed ones is deliberate: a scrub that pattern-matches
    * headers lets PII survive by mislabeling, and no APP1 variant
    * carries pixel data. None when the bytes are not a JPEG (the
    * caller's media route keeps governing them). A JPEG with no
    * metadata returns unchanged bytes — the scrub is idempotent.
    */
  def strip(bytes: Array[Byte]): Option[Array[Byte]] =
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
    val tiff = t.toByteArray
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
}
