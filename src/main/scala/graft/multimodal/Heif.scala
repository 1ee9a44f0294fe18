package graft.multimodal

/** HEIF-family still-image PROBE (AVIF + HEIC) — the triage arm for
  * the two formats whose PIXEL decode stays excluded (AV1/HEVC intra
  * is an order of magnitude beyond VP8; SURVEY's stated gap). Until
  * r16 these routed by ftyp brand and carried nothing else; a census
  * over crawl images could not even say how LARGE the excluded
  * pictures were. This walks the real ISO/IEC 23008-12 meta-box
  * grammar ([[Mp4]]'s box discipline — HEIF is ISO-BMFF):
  *
  *   - `ftyp` brand (avif/avis/heic/heix/mif1…);
  *   - `meta` (a FullBox — 4 version/flags bytes the plain [[Mp4]]
  *     containers don't carry) → `pitm` (primary item, u16/u32 by
  *     version), `iinf`/`infe` (item census: count + types, so an
  *     `Exif` item — PII the [[Exif]] scrub cannot yet reach inside
  *     this container — is at least VISIBLE evidence), `iprp/ipco`
  *     (property boxes in 1-based index order) and `ipma`
  *     (item→property associations, essential-bit aware);
  *   - the PRIMARY item's `ispe` (width/height) and `irot` resolved
  *     through ipma — not "the first ispe in the file", which is
  *     routinely the thumbnail's; when ipma/pitm are absent or
  *     broken the largest ispe is the documented fallback.
  *
  * Bounds-checked and capped like every walker in this family;
  * hostile bytes yield None, never a throw. [[write]] is the fixture
  * writer (the q130 probe-oracle device): a minimal conforming meta
  * tree with real box framing, so q149's oracle exercises the real
  * pitm/ipma/ispe resolution — including a DECOY thumbnail ispe that
  * the probe must NOT report.
  */
object Heif {

  final case class Probe(brand: String, itemType: String,
                         width: Int, height: Int, nItems: Int,
                         hasExif: Boolean, rotation: Int)

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "ISO-8859-1")

  /** One box at `p` within [p, end): (type, payloadStart, payloadEnd).
    * 64-bit largesize and size==0 (to end) per ISO-BMFF.
    */
  private def box(b: Array[Byte], p: Int, end: Int)
      : Option[(String, Int, Int)] = {
    if (p + 8 > end) return None
    val sz = u32(b, p)
    val typ = fourcc(b, p + 4)
    if (sz == 0) Some((typ, p + 8, end))
    else if (sz == 1) {
      if (p + 16 > end) return None
      val large = (u32(b, p + 8) << 32) | u32(b, p + 12)
      if (large < 16 || p + large > end) return None
      Some((typ, p + 16, p + large.toInt))
    } else {
      if (sz < 8 || p + sz > end) return None
      Some((typ, p + 8, p + sz.toInt))
    }
  }

  private def child(b: Array[Byte], p0: Int, end: Int,
                    typ: String): Option[(Int, Int)] = {
    var p = p0
    while (p < end) {
      box(b, p, end) match {
        case Some((t, s, e)) =>
          if (t == typ) return Some((s, e))
          p = e
        case None => return None
      }
    }
    None
  }

  private val ImageBrands = Set("avif", "avis", "heic", "heix",
    "heim", "heis", "mif1", "msf1")

  /** Probe, or None for non-HEIF bytes / broken meta grammar. */
  def probe(bytes: Array[Byte]): Option[Probe] =
    try probeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def probeImpl(b: Array[Byte]): Option[Probe] = {
    if (b == null || b.length < 16) return None
    val (ft, fs, fe) = box(b, 0, b.length).getOrElse(return None)
    if (ft != "ftyp" || fe - fs < 8) return None
    val brand = fourcc(b, fs)
    if (!ImageBrands.contains(brand)) return None
    // meta is a FullBox: skip the 4 version/flags bytes
    val (ms0, me) = child(b, fe, b.length, "meta").getOrElse(return None)
    if (me - ms0 < 4) return None
    val ms = ms0 + 4

    // pitm: primary item id (u16 at version 0, u32 past it)
    val primary: Long = child(b, ms, me, "pitm") match {
      case Some((s, e)) if e - s >= 6 =>
        val ver = b(s) & 0xff
        if (ver == 0) u16(b, s + 4).toLong
        else if (e - s >= 8) u32(b, s + 4)
        else -1L
      case _ => -1L
    }

    // iinf/infe: item census + types per id
    var nItems = 0
    var hasExif = false
    val itemTypes = scala.collection.mutable.Map.empty[Long, String]
    child(b, ms, me, "iinf").foreach { case (s, e) =>
      if (e - s >= 6) {
        val ver = b(s) & 0xff
        val (count, listAt) =
          if (ver == 0) (u16(b, s + 4).toLong, s + 6)
          else if (e - s >= 8) (u32(b, s + 4), s + 8)
          else (0L, s + 8)
        if (count >= 0 && count <= 4096) {
          nItems = count.toInt
          var p = listAt
          var i = 0L
          while (i < count) {
            box(b, p, e) match {
              case Some(("infe", is, ie)) =>
                // infe v2/v3: ver(1) flags(3) id(2/4) protection(2) type(4)
                if (ie - is >= 12) {
                  val iv = b(is) & 0xff
                  val (id, tAt) =
                    if (iv == 2) (u16(b, is + 4).toLong, is + 8)
                    else if (iv == 3 && ie - is >= 14)
                      (u32(b, is + 4), is + 10)
                    else (-1L, is + 8)
                  if (id >= 0 && tAt + 4 <= ie) {
                    val t = fourcc(b, tAt)
                    itemTypes(id) = t
                    if (t == "Exif") hasExif = true
                  }
                }
                p = ie
              case Some((_, _, ie)) => p = ie
              case None => i = count // malformed list: stop
            }
            i += 1
          }
        }
      }
    }

    // iprp -> ipco (properties in 1-based order) + ipma (associations)
    val (ips, ipe) = child(b, ms, me, "iprp").getOrElse(return None)
    val (pcs, pce) = child(b, ips, ipe, "ipco").getOrElse(return None)
    // property index -> (type, payloadStart, payloadEnd)
    val props = Vector.newBuilder[(String, Int, Int)]
    var pp = pcs
    var guard = 0
    while (pp < pce && guard < 1024) {
      box(b, pp, pce) match {
        case Some((t, s, e)) => props += ((t, s, e)); pp = e
        case None => pp = pce
      }
      guard += 1
    }
    val propArr = props.result()

    // ipma: property indices associated with the primary item
    var primaryProps: Vector[Int] = Vector.empty
    child(b, ips, ipe, "ipma").foreach { case (s, e) =>
      if (e - s >= 8) {
        val ver = b(s) & 0xff
        val flags = u32(b, s) & 0xFFFFFF
        val wide = (flags & 1L) != 0
        val count = u32(b, s + 4)
        var p = s + 8
        var i = 0L
        while (i < count && i < 4096 && p < e) {
          val id: Long =
            if (ver < 1) { val v = u16(b, p).toLong; p += 2; v }
            else { val v = u32(b, p); p += 4; v }
          if (p >= e) return None
          val n = b(p) & 0xff
          p += 1
          var assoc = Vector.empty[Int]
          var j = 0
          while (j < n && p < e) {
            if (wide) {
              if (p + 2 > e) return None
              assoc :+= (u16(b, p) & 0x7FFF); p += 2
            } else {
              assoc :+= (b(p) & 0x7F); p += 1
            }
            j += 1
          }
          if (id == primary) primaryProps = assoc
          i += 1
        }
      }
    }

    def propOfPrimary(typ: String): Option[(Int, Int)] = {
      primaryProps.iterator
        .filter(ix => ix >= 1 && ix <= propArr.length)
        .map(ix => propArr(ix - 1))
        .collectFirst { case (t, s, e) if t == typ => (s, e) }
    }
    // ispe: FullBox, u32 width + u32 height; the primary item's via
    // ipma, else the LARGEST in the file (documented fallback — the
    // first ispe is routinely the thumbnail's)
    val ispe = propOfPrimary("ispe").orElse {
      propArr.collect { case ("ispe", s, e) if e - s >= 12 => (s, e) }
        .sortBy { case (s, _) => -(u32(b, s + 4) * u32(b, s + 8)) }
        .headOption
    }.getOrElse(return None)
    if (ispe._2 - ispe._1 < 12) return None
    val w = u32(b, ispe._1 + 4)
    val h = u32(b, ispe._1 + 8)
    if (w <= 0 || h <= 0 || w > 65535 || h > 65535) return None
    // irot: a PLAIN box (not a FullBox), one byte, angle in
    // quarter-turns counter-clockwise
    val rotation = propOfPrimary("irot") match {
      case Some((s, e)) if e - s >= 1 => ((b(s) & 3) * 90)
      case _ => 0
    }
    val itemType = itemTypes.getOrElse(primary,
      if (brand.startsWith("av")) "av01" else "hvc1")
    Some(Probe(brand, itemType, w.toInt, h.toInt,
      math.max(nItems, itemTypes.size), hasExif, rotation))
  }

  // ---- fixture writer (the q130 probe-oracle device) ----

  private final class B {
    private val o = new java.io.ByteArrayOutputStream(256)
    def w8(v: Int): B = { o.write(v & 0xff); this }
    def w16(v: Int): B = { o.write((v >> 8) & 0xff); o.write(v & 0xff); this }
    def w32(v: Long): B = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt); this
    }
    def tag(t: String): B = { o.write(t.getBytes("ISO-8859-1"), 0, 4); this }
    def raw(x: Array[Byte]): B = { o.write(x, 0, x.length); this }
    def bytes: Array[Byte] = o.toByteArray
  }

  private def boxed(typ: String, payload: Array[Byte]): Array[Byte] =
    new B().w32(8L + payload.length).tag(typ).raw(payload).bytes

  private def fullbox(typ: String, version: Int,
                      payload: Array[Byte]): Array[Byte] =
    boxed(typ, new B().w8(version).w8(0).w8(0).w8(0).raw(payload).bytes)

  /** A minimal conforming HEIF still: ftyp + meta(hdlr, pitm, iinf,
    * iprp(ipco, ipma)) + an mdat stub. The primary item (id 1, type
    * `itemType`) associates with ITS ispe (`w`x`h`) and, when
    * `rotation` is nonzero, an irot; a DECOY thumbnail item (id 2)
    * carries a 64x48 ispe listed FIRST in ipco — a probe that reads
    * "the first ispe" instead of resolving pitm→ipma reports the
    * thumbnail and fails the oracle. `withExif` adds an Exif infe.
    */
  def write(brand: String, itemType: String, w: Int, h: Int,
            rotation: Int = 0, withExif: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535, "dims")
    require(rotation % 90 == 0, "rotation in quarter turns")
    val ftyp = boxed("ftyp",
      new B().tag(brand).w32(0).tag(brand).tag("mif1").bytes)
    val hdlr = fullbox("hdlr", 0,
      new B().w32(0).tag("pict").w32(0).w32(0).w32(0).w8(0).bytes)
    val pitm = fullbox("pitm", 0, new B().w16(1).bytes)
    def infe(id: Int, typ: String): Array[Byte] =
      fullbox("infe", 2,
        new B().w16(id).w16(0).tag(typ).w8(0).bytes)
    val items = Vector(infe(1, itemType), infe(2, "av01")) ++
      (if (withExif) Vector(infe(3, "Exif")) else Vector.empty)
    val iinf = fullbox("iinf", 0,
      new B().w16(items.length)
        .raw(items.reduce(_ ++ _)).bytes)
    // ipco: DECOY thumbnail ispe first (index 1), then the primary's
    // ispe (index 2), then irot (index 3) when rotating
    def ispe(iw: Int, ih: Int): Array[Byte] =
      fullbox("ispe", 0, new B().w32(iw.toLong).w32(ih.toLong).bytes)
    val irotB =
      if (rotation != 0) Vector(boxed("irot",
        new B().w8((rotation / 90) & 3).bytes))
      else Vector.empty
    val ipco = boxed("ipco",
      (Vector(ispe(64, 48), ispe(w, h)) ++ irotB).reduce(_ ++ _))
    // ipma: item 1 -> [2 (+3)], item 2 -> [1]
    val a1 = new B().w16(1)
      .w8(if (rotation != 0) 2 else 1).w8(2 | 0x80)
    if (rotation != 0) a1.w8(3 | 0x80)
    val a2 = new B().w16(2).w8(1).w8(1)
    val ipma = fullbox("ipma", 0,
      new B().w32(2L).raw(a1.bytes).raw(a2.bytes).bytes)
    val iprp = boxed("iprp", ipco ++ ipma)
    val meta = fullbox("meta", 0, hdlr ++ pitm ++ iinf ++ iprp)
    val mdat = boxed("mdat", "stub payload, not decoded".getBytes("UTF-8"))
    ftyp ++ meta ++ mdat
  }
}
