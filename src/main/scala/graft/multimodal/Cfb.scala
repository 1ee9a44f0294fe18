package graft.multimodal

/** Compound File Binary (OLE2/CFB, MS-CFB) container walk — the
  * sector/FAT format under every legacy Office document (.doc/.xls/
  * .ppt). The modern formats ride [[Zip]]; this is their pre-2007
  * counterpart, and crawls still serve it (government archives,
  * old intranets surfaced by recrawls).
  *
  * Read profile (v3, 512-byte sectors — the format every legacy
  * Office writer produced; v4/4096 fences):
  *   - Header: 8-byte signature, sector/mini shifts, FAT location
  *     via the header DIFAT (109 entries) plus the chained DIFAT
  *     sectors big files need (127 entries + next pointer each).
  *   - FAT chain walk with CYCLE GUARDS everywhere a crafted next
  *     pointer could loop (the [[Tiff]] discipline: a hostile file
  *     must never hang a task) and chain-length caps derived from
  *     the payload size.
  *   - Directory: 128-byte entries, UTF-16LE names, stream start +
  *     size; storages/streams listed flat (tree pointers are not
  *     needed to FIND a stream by name).
  *   - Streams under the mini cutoff (4096) live in the MINI stream
  *     (64-byte sectors inside the root entry's regular chain,
  *     chained by the miniFAT) — both paths implemented; a stream
  *     whose chain dies early yields None (truncation discipline:
  *     partial stream bytes must not become content).
  *
  * [[write]] emits a real v3 container: header DIFAT, one FAT
  * sector, directory, miniFAT + mini stream for small streams,
  * regular chains for large ones — so every reader path rides the
  * fixtures.
  */
object Cfb {

  final case class Entry(name: String, typ: Int, start: Long, size: Long)

  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL

  private def u16(b: Array[Byte], p: Int): Int =
    if (p < 0 || p + 2 > b.length) -1
    else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    if (p < 0 || p + 4 > b.length) -1L
    else (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def sectorOff(s: Long): Long = 512L * (s + 1)

  private val Signature = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1,
    0x1A, 0xE1).map(_.toByte)

  private final class View(val bytes: Array[Byte]) {
    // the FAT, assembled from the header DIFAT + chained DIFAT sectors
    val fat: Array[Long] = {
      val maxSectors = bytes.length / 512 + 1
      // sector numbers come from the FILE — a crafted value can put
      // sectorOff past the payload (or past Int after .toInt), so
      // every reference is bounds-checked BEFORE any array access
      def inFile(s: Long): Boolean =
        s >= 0 && s < maxSectors && sectorOff(s) + 512 <= bytes.length
      val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < 109) {
        val s = u32(bytes, 76 + 4 * i)
        if (s < FreeSect - 3 && inFile(s)) fatSectors += s
        i += 1
      }
      var difat = u32(bytes, 68)
      var hops = 0
      while (difat < FreeSect - 3 && inFile(difat) && hops < maxSectors) {
        val off = sectorOff(difat)
        var j = 0
        while (j < 127) {
          val s = u32(bytes, (off + 4 * j).toInt)
          if (s < FreeSect - 3 && inFile(s)) fatSectors += s
          j += 1
        }
        difat = u32(bytes, (off + 508).toInt)
        hops += 1
      }
      val out = Array.newBuilder[Long]
      fatSectors.foreach { fs =>
        val off = sectorOff(fs)
        var j = 0
        while (j < 128) {
          out += u32(bytes, (off + 4 * j).toInt)
          j += 1
        }
      }
      out.result()
    }

    /** Follow a FAT chain from `start`, concatenating sectors; None
      * on a broken/looping chain or when fewer than `size` bytes
      * materialize.
      */
    def chain(start: Long, size: Long): Option[Array[Byte]] = {
      if (size < 0 || size > bytes.length.toLong) return None
      val out = new java.io.ByteArrayOutputStream(size.toInt)
      var s = start
      // VISITED set, not a hop cap: a short cycle (s→s) would fill
      // the requested size with REPEATED sector bytes before any cap
      // fires — corruption served as content, not just a hang risk
      val seen = new java.util.BitSet(fat.length)
      while (s != EndOfChain && out.size() < size) {
        if (s < 0 || s >= fat.length || seen.get(s.toInt)) return None
        seen.set(s.toInt)
        val off = sectorOff(s)
        if (off + 512 > bytes.length) return None
        out.write(bytes, off.toInt, 512)
        s = fat(s.toInt)
      }
      if (out.size() < size) None
      else Some(java.util.Arrays.copyOf(out.toByteArray, size.toInt))
    }

    val miniFat: Array[Long] = {
      val start = u32(bytes, 60)
      val count = u32(bytes, 64)
      if (start >= FreeSect - 3 || count <= 0 || count > 1024)
        Array.emptyLongArray
      else chain(start, count * 512L) match {
        case Some(mf) =>
          val out = new Array[Long](mf.length / 4)
          var i = 0
          while (i < out.length) { out(i) = u32(mf, 4 * i); i += 1 }
          out
        case None => Array.emptyLongArray
      }
    }
  }

  /** Directory entries (streams AND storages), or None when the
    * bytes are not CFB v3 or the directory chain is broken.
    */
  def entries(bytes: Array[Byte]): Option[Vector[Entry]] =
    openDir(bytes).map(_._2)

  /** A parsed-once handle over one container — the [[Zip.View]]
    * convention for the CFB family: the office dispatch tries .doc /
    * .xls / .ppt against ONE FAT + directory walk instead of
    * re-walking per dialect ([[stream]] re-opens per call).
    */
  final class Doc(bytes: Array[Byte]) {
    private val opened = openDir(bytes)
    def isCfb: Boolean = opened.isDefined
    /** Case-insensitive: directory names compare by upcased UTF-16
      * per MS-CFB, and legacy writers disagree on stream-name case.
      */
    def stream(name: String): Option[Array[Byte]] =
      opened.flatMap { case (v, es) =>
        es.find(e => e.typ == 2 && e.name.equalsIgnoreCase(name))
          .flatMap(e => readStream(v, es, e))
      }
  }

  private def readStream(v: View, es: Vector[Entry],
                         e: Entry): Option[Array[Byte]] =
    if (e.size >= 4096) v.chain(e.start, e.size)
    else
      es.find(_.typ == 5).flatMap { root => // the mini stream
        v.chain(root.start, root.size).flatMap { mini =>
          val out = new java.io.ByteArrayOutputStream(e.size.toInt)
          var s = e.start
          val seen = new java.util.BitSet(v.miniFat.length)
          var ok = true
          while (ok && s != EndOfChain && out.size() < e.size) {
            if (s < 0 || s >= v.miniFat.length || seen.get(s.toInt) ||
                64 * (s + 1) > mini.length) ok = false
            else {
              seen.set(s.toInt)
              out.write(mini, 64 * s.toInt, 64)
              s = v.miniFat(s.toInt)
            }
          }
          if (!ok || out.size() < e.size) None
          else Some(java.util.Arrays.copyOf(out.toByteArray,
            e.size.toInt))
        }
      }

  private def openDir(bytes: Array[Byte])
      : Option[(View, Vector[Entry])] = {
    if (bytes == null || bytes.length < 512 + 512) return None
    var i = 0
    while (i < 8) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    if (u16(bytes, 30) != 9) return None // sector shift: v3 only
    val v = new View(bytes)
    val dirStart = u32(bytes, 48)
    // directory size is not recorded for v3 — walk the chain to its
    // end (bounded by the cycle guard in chain(): probe with an
    // explicit hop walk instead)
    val out = Vector.newBuilder[Entry]
    var s = dirStart
    var hops = 0
    val maxHops = bytes.length / 512 + 2
    while (s != EndOfChain) {
      if (s < 0 || s >= v.fat.length || hops > maxHops) return None
      val off = sectorOff(s)
      if (off + 512 > bytes.length) return None
      var e = 0
      while (e < 4) { // 4 × 128-byte entries per sector
        val p = (off + 128 * e).toInt
        val nameLen = u16(bytes, p + 64) // bytes incl. terminator
        val typ = bytes(p + 66) & 0xff
        if (typ != 0 && nameLen >= 2 && nameLen <= 64) {
          val name = new String(bytes, p, nameLen - 2, "UTF-16LE")
          out += Entry(name, typ, u32(bytes, p + 116), u32(bytes, p + 120))
        }
        e += 1
      }
      s = v.fat(s.toInt)
      hops += 1
    }
    Some((v, out.result()))
  }

  /** A stream's bytes by exact name — regular chain at or above the
    * 4096 mini cutoff, mini-stream (64-byte sectors inside the root
    * entry's chain) below it.
    */
  def stream(bytes: Array[Byte], name: String): Option[Array[Byte]] =
    openDir(bytes).flatMap { case (v, es) =>
      es.find(e => e.typ == 2 && e.name == name)
        .flatMap(e => readStream(v, es, e))
    }

  // ---- writer (fixture generator) ----

  private def pad(b: Array[Byte], unit: Int): Array[Byte] =
    if (b.length % unit == 0) b
    else java.util.Arrays.copyOf(b, ((b.length / unit) + 1) * unit)

  /** A real v3 container for up to a handful of streams: streams
    * under 4096 bytes go through the MINI stream, the rest through
    * regular chains; as many FAT sectors as the payload needs, all
    * referenced from the header DIFAT.
    */
  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val small = streams.filter(_._2.length < 4096)
    val big = streams.filter(_._2.length >= 4096)
    // mini stream: small streams padded to 64-byte mini sectors
    val miniData = new java.io.ByteArrayOutputStream()
    val miniStarts = scala.collection.mutable.Map.empty[String, Int]
    small.foreach { case (n, d) =>
      miniStarts(n) = miniData.size() / 64
      miniData.write(pad(d, 64))
    }
    val miniBytes = pad(miniData.toByteArray, 512)
    val nMini = miniData.size() / 64
    // miniFAT: one sector (128 entries) covers fixtures
    val miniFat = Array.fill[Long](128)(FreeSect)
    small.foreach { case (n, d) =>
      val start = miniStarts(n)
      val count = math.max(1, (d.length + 63) / 64)
      var k = 0
      while (k < count - 1) { miniFat(start + k) = start + k + 1; k += 1 }
      if (count > 0) miniFat(start + count - 1) = EndOfChain
    }
    // regular sector layout: [FAT×nf][DIR][MINIFAT][miniBytes…][big…];
    // one 512-byte directory sector holds root + up to 3 streams.
    // nf FAT sectors (found by iteration — each FAT sector is itself
    // a sector the FAT must map) let fixtures grow past 64 KB; all
    // nf live in the header DIFAT (109 × 128 entries ≈ 7 MB cap,
    // far past any fixture)
    require(streams.size <= 3, "fixture writer: at most 3 streams")
    val nMiniSectors = miniBytes.length / 512
    val bigSectors = big.map(d => pad(d._2, 512).length / 512).sum
    var nf = 1
    while (nf + 2 + nMiniSectors + bigSectors > nf * 128) nf += 1
    require(nf <= 109, "fixture writer: header-DIFAT FAT sectors only")
    val dirSector = nf.toLong
    val miniFatSector = nf + 1L
    val miniStart = nf + 2L
    var next = miniStart + nMiniSectors
    val bigStarts = scala.collection.mutable.Map.empty[String, Long]
    val bigPadded = big.map { case (n, d) =>
      bigStarts(n) = next
      val p = pad(d, 512)
      next += p.length / 512
      (n, p)
    }
    // FAT
    val fat = Array.fill[Long](nf * 128)(FreeSect)
    var fs = 0
    while (fs < nf) { fat(fs) = 0xFFFFFFFDL; fs += 1 } // FATSECT marks
    fat(dirSector.toInt) = EndOfChain // single dir sector
    fat(miniFatSector.toInt) = EndOfChain // single miniFAT sector
    var ms = miniStart
    while (ms < miniStart + nMiniSectors - 1) { fat(ms.toInt) = ms + 1; ms += 1 }
    if (nMiniSectors > 0) fat((miniStart + nMiniSectors - 1).toInt) = EndOfChain
    bigPadded.foreach { case (n, p) =>
      val st = bigStarts(n)
      val cnt = p.length / 512
      var k = 0L
      while (k < cnt - 1) { fat((st + k).toInt) = st + k + 1; k += 1 }
      fat((st + cnt - 1).toInt) = EndOfChain
    }
    // directory: root + streams
    def dirEntry(name: String, typ: Int, start: Long, size: Long,
                 childOrSibs: (Long, Long, Long)): Array[Byte] = {
      val e = new Array[Byte](128)
      val nb = name.getBytes("UTF-16LE")
      System.arraycopy(nb, 0, e, 0, math.min(nb.length, 62))
      val nlen = math.min(nb.length, 62) + 2
      e(64) = (nlen & 0xff).toByte; e(65) = ((nlen >> 8) & 0xff).toByte
      e(66) = typ.toByte
      e(67) = 1 // black
      def w32(p: Int, v: Long): Unit = {
        e(p) = (v & 0xff).toByte; e(p + 1) = ((v >> 8) & 0xff).toByte
        e(p + 2) = ((v >> 16) & 0xff).toByte
        e(p + 3) = ((v >> 24) & 0xff).toByte
      }
      w32(68, childOrSibs._1); w32(72, childOrSibs._2)
      w32(76, childOrSibs._3)
      w32(116, start); w32(120, size)
      e
    }
    val none = FreeSect // "no node" per spec
    val dir = new java.io.ByteArrayOutputStream()
    // root: child = entry 1 when any stream exists
    dir.write(dirEntry("Root Entry", 5, miniStart,
      miniData.size().toLong, (none, none, if (streams.nonEmpty) 1L else none)))
    streams.zipWithIndex.foreach { case ((n, d), ix) =>
      val start =
        if (d.length < 4096) miniStarts(n).toLong else bigStarts(n)
      // naive left-sibling chain: entry i points left to i+1
      val sib = if (ix + 1 < streams.size) (ix + 2).toLong else none
      dir.write(dirEntry(n, 2, start, d.length.toLong, (sib, none, none)))
    }
    while (dir.size() < 512) dir.write(0)
    // header
    val h = new Array[Byte](512)
    Signature.copyToArray(h, 0)
    def hw16(p: Int, v: Int): Unit = {
      h(p) = (v & 0xff).toByte; h(p + 1) = ((v >> 8) & 0xff).toByte
    }
    def hw32(p: Int, v: Long): Unit = {
      h(p) = (v & 0xff).toByte; h(p + 1) = ((v >> 8) & 0xff).toByte
      h(p + 2) = ((v >> 16) & 0xff).toByte; h(p + 3) = ((v >> 24) & 0xff).toByte
    }
    hw16(24, 0x003E); hw16(26, 0x0003) // minor, major v3
    hw16(28, 0xFFFE) // little-endian marker
    hw16(30, 9); hw16(32, 6) // sector/mini shifts
    hw32(44, nf.toLong) // FAT sector count
    hw32(48, dirSector)
    hw32(56, 4096) // mini cutoff
    hw32(60, miniFatSector); hw32(64, 1)
    hw32(68, EndOfChain); hw32(72, 0) // no DIFAT sectors
    var d = 0
    while (d < 109) {
      hw32(76 + 4 * d, if (d < nf) d.toLong else FreeSect); d += 1
    }
    // assemble
    val out = new java.io.ByteArrayOutputStream()
    out.write(h)
    val fatBytes = new Array[Byte](512 * nf)
    var f = 0
    while (f < nf * 128) {
      val v = fat(f)
      fatBytes(4 * f) = (v & 0xff).toByte
      fatBytes(4 * f + 1) = ((v >> 8) & 0xff).toByte
      fatBytes(4 * f + 2) = ((v >> 16) & 0xff).toByte
      fatBytes(4 * f + 3) = ((v >> 24) & 0xff).toByte
      f += 1
    }
    out.write(fatBytes)
    out.write(dir.toByteArray, 0, 512)
    val mfBytes = new Array[Byte](512)
    var mf = 0
    while (mf < 128) {
      val v = miniFat(mf)
      mfBytes(4 * mf) = (v & 0xff).toByte
      mfBytes(4 * mf + 1) = ((v >> 8) & 0xff).toByte
      mfBytes(4 * mf + 2) = ((v >> 16) & 0xff).toByte
      mfBytes(4 * mf + 3) = ((v >> 24) & 0xff).toByte
      mf += 1
    }
    out.write(mfBytes)
    out.write(miniBytes)
    bigPadded.foreach { case (_, p) => out.write(p) }
    out.toByteArray
  }
}
