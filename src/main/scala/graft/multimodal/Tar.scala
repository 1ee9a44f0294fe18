package graft.multimodal

/** TAR archive walk — the dataset-distribution format: corpora,
  * dumps and mirrors ship as `.tar` / `.tar.gz`, and each TEXT
  * member is a document in its own right (the 1→N case of the
  * served-.gz rule: the archive is the envelope, the members are
  * the content).
  *
  * Profile (POSIX ustar + the GNU extensions a crawl meets):
  *   - 512-byte headers, CHECKSUM-VALIDATED (unsigned sum with the
  *     chksum field as spaces — the walk stops at the first block
  *     that fails, so trailing garbage cannot fabricate members).
  *   - Octal sizes (NUL/space padded); GNU base-256 (>8 GiB) fences
  *     the member.
  *   - Regular files only ('0'/NUL typeflag); ustar `prefix` long
  *     names joined; GNU 'L' longname blocks applied to the NEXT
  *     member; pax 'x' extended headers parsed for their `path` and
  *     `linkpath` overrides (the keyval grammar: `len key=value\n`),
  *     `path` taking precedence over a GNU 'L' name when both
  *     precede one member (pax is the POSIX standard; bsdtar
  *     agrees) — every other pax key is skipped by size; pax 'g'
  *     GLOBAL headers are skipped whole (a global `path` renaming
  *     every later member is hostile-input territory, stated not
  *     silent); a malformed keyval block ignores the override and
  *     keeps walking (the header's own name still frames the
  *     member).
  *   - HARDLINKS ('1') resolve to their target's bytes: the link
  *     name (pax `linkpath` override > the header linkname field)
  *     is looked up among the members already walked (tar writes
  *     the target before its links; later duplicates shadow
  *     earlier, the extraction rule) and the link emits an Entry at
  *     the TARGET's offset/size under the LINK's name — the
  *     hardlink-duplicated document is real text a corpus intake
  *     must see (exact dedup downstream collapses it by content,
  *     which is that stage's job, not this walk's). An unresolvable
  *     target skips the link (the bytes simply are not in the
  *     archive). Symlinks ('2') stay skipped: they point, they do
  *     not duplicate — following one is filesystem semantics, not
  *     archive framing.
  *   - GNU SPARSE members fence: old-GNU 'S' members are framed
  *     past exactly (isextended continuation blocks walked, the
  *     size field counts the ARCHIVED bytes) but never emitted —
  *     reassembling hole-punched files is filesystem restore, not
  *     document extraction, and a half-honored map would emit
  *     silently corrupt text; pax-sparse members (any `GNU.sparse.*`
  *     key in the preceding 'x' block) fence the same way while
  *     their regular-member framing keeps the walk exact.
  *   - End at two zero blocks or EOF; a truncated final member
  *     DROPS while complete members keep (the WARC discipline).
  *   - Member-count cap: an archive past it fences WHOLE (None, not
  *     a silent prefix — the no-silent-caps rule).
  */
object Tar {

  final case class Entry(name: String, offset: Int, size: Int)

  /** Archives with more members than this fence whole. */
  val MaxMembers = 4096

  private def isZeroBlock(b: Array[Byte], p: Int): Boolean = {
    var i = p
    val end = math.min(p + 512, b.length)
    while (i < end) { if (b(i) != 0) return false; i += 1 }
    true
  }

  private def octal(b: Array[Byte], p: Int, len: Int): Long = {
    var v = 0L
    var i = p
    val end = p + len
    // skip leading spaces/NULs; stop at the first non-octal byte
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    if (i < end && (b(i) & 0x80) != 0) return -1L // GNU base-256: fence
    var any = false
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; any = true
      if (v > Int.MaxValue) return -1L
    }
    if (any) v else -1L
  }

  private def str(b: Array[Byte], p: Int, len: Int): String = {
    var e = p
    val end = p + len
    while (e < end && b(e) != 0) e += 1
    new String(b, p, e - p, "UTF-8")
  }

  private def checksumOk(b: Array[Byte], p: Int): Boolean = {
    val declared = octal(b, p + 148, 8)
    if (declared < 0) return false
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else b(p + i) & 0xff)
      i += 1
    }
    sum == declared
  }

  /** Regular-file members (name, offset, size), walk stopped at the
    * first invalid header; None when the bytes are not a tar at all
    * (no valid first header) or the member cap trips.
    */
  def entries(bytes: Array[Byte]): Option[Vector[Entry]] = {
    if (bytes == null || bytes.length < 512) return None
    val out = Vector.newBuilder[Entry]
    // members walked so far, by archived name — the hardlink
    // resolution table (tar writes a target before its links; a
    // repeated name shadows, matching extraction order)
    val byName = scala.collection.mutable.HashMap.empty[String, Entry]
    var p = 0
    var count = 0
    var pendingLongName: Option[String] = None
    var pendingLongLink: Option[String] = None
    var pendingPax: Pax = Pax.Empty
    var sawAny = false
    var going = true
    while (going && p + 512 <= bytes.length) {
      if (isZeroBlock(bytes, p)) going = false // end-of-archive marker
      else if (!checksumOk(bytes, p)) {
        if (!sawAny) return None // not a tar
        going = false // trailing garbage after valid members: stop
      } else {
        val size = octal(bytes, p + 124, 12)
        if (size < 0) { // base-256 / corrupt size: fence the walk
          if (!sawAny) return None
          going = false
        } else {
          val typeflag = bytes(p + 156)
          // link members ('1' hardlink / '2' symlink) archive NO data
          // blocks, but pre-POSIX GNU tar and star wrote the TARGET's
          // size into the size field — honoring it would advance past
          // phantom blocks and misframe every later member (worst
          // case the checksum fence stops the walk and tail members
          // silently drop). libarchive's rule: framing size is 0 for
          // link types regardless of the header field
          val frameSize = if (typeflag == '1' || typeflag == '2') 0L else size
          var dataStart = p + 512
          // old-GNU sparse ('S'): isextended continuation blocks sit
          // BETWEEN the header and the archived data — walk them so
          // later members stay framed (the size field already counts
          // only the ARCHIVED bytes, not the logical file)
          var sparseChainOk = true
          if (typeflag == 'S') {
            var ext = bytes(p + 482) != 0
            while (ext && sparseChainOk) {
              if (dataStart + 512 > bytes.length) sparseChainOk = false
              else { ext = bytes(dataStart + 504) != 0; dataStart += 512 }
            }
          }
          val dataEnd = dataStart + frameSize
          if (!sparseChainOk || dataEnd > bytes.length)
            going = false // truncated member / continuation chain
          else {
            sawAny = true
            count += 1
            if (count > MaxMembers) return None // fence WHOLE, not a prefix
            def headerName: String = {
              val base = str(bytes, p, 100)
              val prefix = str(bytes, p + 345, 155)
              pendingPax.path.orElse(pendingLongName).getOrElse(
                if (prefix.nonEmpty) prefix + "/" + base else base)
            }
            if (typeflag == 'L') {
              // GNU longname: the data IS the next member's name
              pendingLongName =
                Some(str(bytes, dataStart, math.min(size.toInt, 4096)))
            } else if (typeflag == 'K') {
              // GNU long LINKNAME: the data is the next member's
              // link target (review-caught: without this a hardlink
              // to a >100-char path resolved by the TRUNCATED header
              // field — a silent drop, or the WRONG member's bytes
              // on a truncation collision). Pends alongside 'L';
              // both apply to the same next member
              pendingLongLink =
                Some(str(bytes, dataStart, math.min(size.toInt, 4096)))
                  .filter(_.nonEmpty) // an empty 'K' must not shadow
                                      // a valid header linkname (the
                                      // pax linkpath nonEmpty rule)
            } else if (typeflag == 'x') {
              // pax extended header for the NEXT member
              val pax =
                paxOverrides(bytes, dataStart, math.min(size.toInt, 65536))
              pendingPax = Pax(pax.path.orElse(pendingPax.path),
                pax.linkpath.orElse(pendingPax.linkpath),
                pax.sparse || pendingPax.sparse)
            } else if ((typeflag == '0' || typeflag == 0) &&
                !pendingPax.sparse) {
              val name = headerName
              pendingLongName = None
              pendingLongLink = None
              pendingPax = Pax.Empty
              val e = Entry(name, dataStart, size.toInt)
              out += e
              byName(name) = e
            } else if (typeflag == '1') {
              // hardlink: the TARGET's bytes under the LINK's name —
              // pax `linkpath` > GNU 'K' long linkname > the header
              // linkname field, the same precedence ladder `path`
              // rides; an unresolvable target skips (those bytes are
              // not in the archive)
              val name = headerName
              val target = pendingPax.linkpath
                .orElse(pendingLongLink)
                .getOrElse(str(bytes, p + 157, 100))
              pendingLongName = None
              pendingLongLink = None
              pendingPax = Pax.Empty
              byName.get(target).foreach { t =>
                val e = Entry(name, t.offset, t.size)
                out += e
                byName(name) = e
              }
            } else {
              // dirs/symlinks/'g' globals/sparse members: skipped,
              // and they consume any pending overrides (pax/'L'
              // apply to the NEXT header, whatever its type — they
              // must not leak past it). Sparse members (old-GNU 'S'
              // or a pax block carrying GNU.sparse.*) FENCE: a
              // half-honored hole map would emit silently corrupt
              // text, so the walk frames past them and emits nothing
              pendingLongName = None
              pendingLongLink = None
              pendingPax = Pax.Empty
            }
            p = dataStart + ((frameSize.toInt + 511) / 512) * 512
          }
        }
      }
      if (p + 512 > bytes.length) going = false
    }
    if (!sawAny) None else Some(out.result())
  }

  def extract(bytes: Array[Byte], e: Entry): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, e.offset, e.offset + e.size)

  /** The overrides one pax 'x' block declares for the next member. */
  private final case class Pax(path: Option[String],
                               linkpath: Option[String],
                               sparse: Boolean)
  private object Pax { val Empty = Pax(None, None, false) }

  /** `path`/`linkpath` values and the GNU.sparse.* presence flag from
    * a pax keyval block (`len key=value\n`, len = the WHOLE line's
    * byte count including itself). A malformed line stops the scan
    * and keeps whatever parsed before it (override ignored from
    * there — the header's own framing still carries the member).
    */
  private def paxOverrides(b: Array[Byte], off: Int, size: Int): Pax = {
    var p = off
    val end = math.min(off + size, b.length)
    var path: Option[String] = None
    var link: Option[String] = None
    var sparse = false
    var ok = true
    while (ok && p < end) {
      // decimal length prefix up to the space
      var len = 0L
      var q = p
      while (q < end && b(q) >= '0' && b(q) <= '9') {
        len = len * 10 + (b(q) - '0'); q += 1
        if (len > size) { ok = false; q = end }
      }
      if (!ok || q >= end || b(q) != ' ' || q == p) ok = false
      else {
        val lineEnd = p + len.toInt
        if (len < (q - p) + 2 || lineEnd > end ||
            b(lineEnd - 1) != '\n') ok = false
        else {
          val kv = new String(b, q + 1, lineEnd - q - 2, "UTF-8")
          val eq = kv.indexOf('=')
          if (eq < 0) ok = false
          else {
            val key = kv.substring(0, eq)
            val v = kv.substring(eq + 1)
            if (key == "path") { if (v.nonEmpty) path = Some(v) }
            else if (key == "linkpath") { if (v.nonEmpty) link = Some(v) }
            else if (key.startsWith("GNU.sparse.")) sparse = true
            p = lineEnd
          }
        }
      }
    }
    Pax(path, link, sparse)
  }

  // ---- writer (fixture generator) ----

  private def writeHeader(out: java.io.ByteArrayOutputStream,
                          name: String, size: Int,
                          typeflag: Byte, link: String = "",
                          mutate: Array[Byte] => Unit = _ => ()): Unit = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("UTF-8")
    System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
    val lb = link.getBytes("UTF-8")
    System.arraycopy(lb, 0, h, 157, math.min(lb.length, 100))
    def oct(v: Long, p: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      val sb = padded.getBytes("US-ASCII")
      System.arraycopy(sb, 0, h, p, len - 1)
      h(p + len - 1) = 0
    }
    oct(420, 100, 8) // mode 0644
    oct(0, 108, 8); oct(0, 116, 8) // uid/gid
    oct(size.toLong, 124, 12)
    oct(0, 136, 12) // mtime
    h(156) = typeflag
    "ustar".getBytes("US-ASCII").copyToArray(h, 257)
    h(263) = '0'.toByte; h(264) = '0'.toByte // version "00"
    mutate(h) // fixture-specific fields (sparse flags) before the sum
    // checksum last: field as spaces during the sum
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(b => sum += b & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = ("0" * (6 - cs.length)) + cs
    csPad.getBytes("US-ASCII").copyToArray(h, 148)
    h(154) = 0; h(155) = ' '.toByte
    out.write(h)
  }

  /** One pax keyval line: `len key=value\n` where len counts the
    * WHOLE line including its own digits (the fixed-point loop).
    */
  private def paxLine(key: String, value: String): Array[Byte] = {
    val base = (" " + key + "=" + value + "\n").getBytes("UTF-8")
    var len = base.length + 1
    while (len.toString.length + base.length != len)
      len = len.toString.length + base.length
    len.toString.getBytes("US-ASCII") ++ base
  }

  /** Real ustar bytes: regular members (+ an optional GNU longname
    * block, a pax 'x' header carrying a `path` override plus a
    * skipped key, and a directory entry the reader must skip),
    * padded data, two zero end blocks. `paxPathFor` emits the pax
    * header BEFORE any 'L' block for the same member — the
    * precedence fixture. The link/sparse knobs append AFTER the
    * regular members, in this order: `hardlinks` ('1' members whose
    * linkname sits in the header field), `paxLinkHard` (a '1' member
    * whose target arrives via pax `linkpath` — the header field
    * carries a decoy), `sparseOldGnu` (an 'S' member with one
    * isextended continuation block and `sparseData` archived bytes),
    * `paxSparse` (a '0' member preceded by a GNU.sparse.* pax block —
    * must fence), then `tailFile` (a final regular member proving
    * the walk stays framed past all of the above).
    */
  def write(files: Seq[(String, Array[Byte])],
            withDir: Boolean = true,
            longNameFor: Option[Int] = None,
            paxPathFor: Option[Int] = None,
            hardlinks: Seq[(String, String)] = Nil,
            paxLinkHard: Option[(String, String)] = None,
            gnuLinkHard: Option[(String, String)] = None,
            legacyLinkSize: Boolean = false,
            sparseOldGnu: Boolean = false,
            sparseData: Array[Byte] = Array.emptyByteArray,
            paxSparse: Option[(String, Array[Byte])] = None,
            tailFile: Option[(String, Array[Byte])] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def pad(n: Int): Unit =
      out.write(new Array[Byte]((512 - n % 512) % 512))
    if (withDir) {
      writeHeader(out, "data/", 0, '5'.toByte)
    }
    files.zipWithIndex.foreach { case ((name, data), ix) =>
      if (paxPathFor.contains(ix)) {
        val kv = paxLine("mtime", "1700000000.5") ++ paxLine("path", name)
        writeHeader(out, "./PaxHeaders.0/" + name.take(80), kv.length,
          'x'.toByte)
        out.write(kv)
        pad(kv.length)
      }
      if (longNameFor.contains(ix)) {
        val nb = (name + "\u0000").getBytes("UTF-8")
        writeHeader(out, "././@LongLink", nb.length, 'L'.toByte)
        out.write(nb)
        pad(nb.length)
        // the member's own name field carries a TRUNCATED form
        writeHeader(out, name.take(99), data.length, '0'.toByte)
      } else writeHeader(out, name, data.length, '0'.toByte)
      out.write(data)
      pad(data.length)
    }
    hardlinks.foreach { case (name, target) =>
      // `legacyLinkSize`: pre-POSIX GNU tar / star wrote the TARGET's
      // size into a link header's size field, with NO data blocks
      // following — the framing trap the walk must survive (frame
      // size for link types is 0 regardless of the field)
      val legacySize =
        if (legacyLinkSize)
          files.collectFirst { case (n, d) if n == target => d.length }
            .getOrElse(0)
        else 0
      writeHeader(out, name, legacySize, '1'.toByte, link = target)
    }
    paxLinkHard.foreach { case (name, target) =>
      val kv = paxLine("linkpath", target)
      writeHeader(out, "./PaxHeaders.0/" + name.take(80), kv.length,
        'x'.toByte)
      out.write(kv)
      pad(kv.length)
      writeHeader(out, name, 0, '1'.toByte, link = "decoy-short-name")
    }
    gnuLinkHard.foreach { case (name, target) =>
      val tb = (target + "\u0000").getBytes("UTF-8")
      writeHeader(out, "././@LongLink", tb.length, 'K'.toByte)
      out.write(tb)
      pad(tb.length)
      writeHeader(out, name, 0, '1'.toByte, link = target.take(100))
    }
    if (sparseOldGnu) {
      // one continuation block between header and data (isextended=1
      // in the header, 0 in the continuation - the framing the walk
      // must cross exactly)
      writeHeader(out, "holes.bin", sparseData.length, 'S'.toByte,
        mutate = h => h(482) = 1)
      out.write(new Array[Byte](512))
      out.write(sparseData)
      pad(sparseData.length)
    }
    paxSparse.foreach { case (name, data) =>
      val kv = paxLine("GNU.sparse.major", "1") ++
        paxLine("GNU.sparse.minor", "0") ++ paxLine("path", name)
      writeHeader(out, "./PaxHeaders.0/" + name.take(80), kv.length,
        'x'.toByte)
      out.write(kv)
      pad(kv.length)
      writeHeader(out, name.take(99), data.length, '0'.toByte)
      out.write(data)
      pad(data.length)
    }
    tailFile.foreach { case (name, data) =>
      writeHeader(out, name, data.length, '0'.toByte)
      out.write(data)
      pad(data.length)
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }
}
