package graft.multimodal

/** 7z archive walk — the last mainstream archive format in the
  * [[Tar]]/[[Zip]] intake discipline: dataset mirrors and download
  * portals serve `.7z` steadily, and until this arm its members
  * rotted in the media face as opaque blobs.
  *
  * Unlike tar/zip (hand-walked — their grammars are small), 7z's
  * container format is a compressed, bit-packed header with a codec
  * zoo (LZMA/LZMA2/BCJ chains); hand-rolling it would be a codec
  * project of its own for no behavioral gain. commons-compress's
  * `SevenZFile` ships ON Spark's classpath (as does the xz/LZMA
  * library it delegates to), so the walk rides it over an in-memory
  * channel — with THIS repo's caps and fences layered on top:
  *   - member-count cap ([[Tar.MaxMembers]]): past it the archive
  *     fences WHOLE (None, not a silent prefix — the no-silent-caps
  *     rule);
  *   - per-member and total output caps (the [[Zip.MaxEntryBytes]]
  *     bomb rationale — 7z's solid compression makes tiny archives
  *     that inflate to GBs trivially);
  *   - any structural breakage — truncation, a lying header, a
  *     codec error, an encrypted archive (SevenZFile throws without
  *     a password) — fences WHOLE: like zip, 7z keeps its directory
  *     at the END, so a truncated archive has no trustworthy
  *     members to salvage (the opposite of tar's prefix-keep, for
  *     the same structural reason).
  *
  * [[write]] is the fixture writer: a real LZMA2 archive through
  * `SevenZOutputFile` over the same in-memory channel, so every
  * reader path rides real bytes.
  */
object SevenZ {

  /** The 6-byte signature: "7z", 0xBC, 0xAF, 0x27, 0x1C. */
  def isSevenZ(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 6 &&
      bytes(0) == '7' && bytes(1) == 'z' && bytes(2) == 0xBC.toByte &&
      bytes(3) == 0xAF.toByte && bytes(4) == 0x27.toByte &&
      bytes(5) == 0x1C.toByte

  /** Archives whose member count exceeds this fence whole. */
  val MaxMembers: Int = Tar.MaxMembers

  /** Per-member inflated cap (the [[Zip.MaxEntryBytes]] value). */
  val MaxMemberBytes: Int = Zip.MaxEntryBytes

  /** Total inflated cap across the archive — solid compression
    * amplifies per-member bombs into one big one.
    */
  val MaxTotalBytes: Long = 256L * 1024 * 1024

  /** Regular-file members (name, bytes), or None when the payload is
    * not a 7z, is encrypted/corrupt/truncated, or trips a cap.
    */
  def members(bytes: Array[Byte])
      : Option[Vector[(String, Array[Byte])]] = {
    if (!isSevenZ(bytes)) return None
    var f: org.apache.commons.compress.archivers.sevenz.SevenZFile = null
    // no early `return` inside the try — scalac emits invalid
    // stackmap frames for a non-local return crossing a try/finally
    // that captures locals (VerifyError at task time); pure
    // expression flow with a `failed` flag instead
    try {
      f = org.apache.commons.compress.archivers.sevenz.SevenZFile
        .builder()
        .setSeekableByteChannel(
          new org.apache.commons.compress.utils
            .SeekableInMemoryByteChannel(bytes))
        .get()
      val out = Vector.newBuilder[(String, Array[Byte])]
      var total = 0L
      var count = 0
      var failed = false
      var e = f.getNextEntry
      while (e != null && !failed) {
        if (!e.isDirectory && !e.isAntiItem) {
          count += 1
          if (count > MaxMembers) failed = true
          else {
            val bo = new java.io.ByteArrayOutputStream(
              math.max(64, math.min(e.getSize, 1L << 20).toInt))
            val buf = new Array[Byte](1 << 16)
            var n = f.read(buf)
            while (n > 0 && !failed) {
              bo.write(buf, 0, n)
              total += n
              if (bo.size() > MaxMemberBytes || total > MaxTotalBytes)
                failed = true
              else n = f.read(buf)
            }
            if (!failed) out += ((e.getName, bo.toByteArray))
          }
        }
        if (!failed) e = f.getNextEntry
      }
      if (failed) None else Some(out.result())
    } catch {
      // SevenZFile throws IOException for truncation/corruption,
      // PasswordRequiredException (an IOException) for encrypted
      // archives, and unchecked MemoryLimit/IllegalArgument for
      // crafted headers — all one fence
      case scala.util.control.NonFatal(_) => None
    } finally {
      if (f != null) { scala.util.Try(f.close()); () }
    }
  }

  // ---- writer (fixture generator) ----

  /** A real LZMA2 7z archive of regular members (plus one directory
    * entry the reader must skip).
    */
  def write(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    val ch = new org.apache.commons.compress.utils
      .SeekableInMemoryByteChannel()
    val out = new org.apache.commons.compress.archivers.sevenz
      .SevenZOutputFile(ch)
    try {
      val dir = new org.apache.commons.compress.archivers.sevenz
        .SevenZArchiveEntry()
      dir.setName("data")
      dir.setDirectory(true)
      out.putArchiveEntry(dir)
      out.closeArchiveEntry()
      files.foreach { case (name, data) =>
        val e = new org.apache.commons.compress.archivers.sevenz
          .SevenZArchiveEntry()
        e.setName(name)
        e.setDirectory(false)
        out.putArchiveEntry(e)
        out.write(data)
        out.closeArchiveEntry()
      }
    } finally out.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }
}
