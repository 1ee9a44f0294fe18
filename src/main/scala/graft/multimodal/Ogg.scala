package graft.multimodal

/** OGG container walk (RFC 3533) + Vorbis/Opus identification headers
  * — audio triage for the open-web container, completing the family
  * ([[Wav]] decodes PCM, [[Mp3]] walks frame headers, this walks OGG
  * pages): codec, channels, rate, and duration from the LAST page's
  * granule position, no audio frame ever decoded (the [[Mp3]]/[[Mp4]]
  * rationale).
  *
  * Profile:
  *   - Page walk: "OggS" capture pattern, version 0, header-type
  *     flags, 64-bit granule position, 32-bit serial, segment table
  *     (lacing values; a page body is their sum). CRC is carried but
  *     not verified — triage reads STRUCTURE, and a mid-stream bit
  *     flip shouldn't hide a whole file's evidence (the codec-family
  *     fence philosophy applies to SHAPE, not payload checksums
  *     here; [[Zip]] verifies CRC because its output IS the payload).
  *   - First page of the FIRST bitstream (BOS flag): Vorbis
  *     (`\x01vorbis`: u8 channels, u32le rate) or Opus (`OpusHead`:
  *     u8 channels, u32le input rate; granules always tick at 48 kHz
  *     per RFC 7845 — duration uses 48000 regardless of input rate).
  *   - Duration: the MAX granule over pages of that serial (streams
  *     can end unordered after a truncation) minus Opus pre-skip,
  *     over the granule rate. A truncated final page drops; counted
  *     pages keep (the WARC truncation discipline).
  *   - Multiplexed streams: evidence comes from the first BOS audio
  *     stream; other serials are skipped by their own lacing sums.
  *
  * [[write]] generates real page framing (continued-page lacing is
  * exercised with a 255-lacing run) for both codecs.
  */
object Ogg {

  /** Triage evidence. `durationMs` -1 when no granule advanced
    * (header-only streams). `codec` is "vorbis" or "opus".
    */
  final case class Info(codec: String, channels: Int, sampleRate: Int,
                        pages: Int, durationMs: Long)

  private def u32le(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def u64le(b: Array[Byte], p: Int): Long =
    u32le(b, p) | (u32le(b, p + 4) << 32)

  private def isOggS(b: Array[Byte], p: Int): Boolean =
    p + 4 <= b.length && b(p) == 'O' && b(p + 1) == 'g' &&
      b(p + 2) == 'g' && b(p + 3) == 'S'

  /** Probe; None when the bytes don't start with a valid OggS BOS
    * page carrying a recognized identification header.
    */
  def parse(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 28) return None
    var codec = ""
    var channels = 0
    var rate = 0
    var preSkip = 0
    var granRate = 0 // granule ticks per second
    var serial = 0L
    var haveId = false
    var pages = 0
    var maxGranule = -1L
    var p = 0
    var going = true
    while (going && p + 27 <= bytes.length) {
      if (!isOggS(bytes, p) || bytes(p + 4) != 0) going = false
      else {
        val granule = u64le(bytes, p + 6)
        val ser = u32le(bytes, p + 14)
        val flags = bytes(p + 5) & 0xff
        val nSegs = bytes(p + 26) & 0xff
        if (p + 27 + nSegs > bytes.length) going = false
        else {
          var body = 0
          var s = 0
          while (s < nSegs) { body += bytes(p + 27 + s) & 0xff; s += 1 }
          val bodyStart = p + 27 + nSegs
          if (bodyStart + body > bytes.length) going = false // truncated page
          else {
            if (!haveId && (flags & 2) != 0) { // BOS: identification header
              if (body >= 30 && bytes(bodyStart) == 1 &&
                  new String(bytes, bodyStart + 1, 6, "ISO-8859-1") == "vorbis") {
                codec = "vorbis"
                channels = bytes(bodyStart + 11) & 0xff
                rate = u32le(bytes, bodyStart + 12).toInt
                granRate = rate
                serial = ser
                haveId = rate > 0 && channels > 0
              } else if (body >= 19 &&
                  new String(bytes, bodyStart, 8, "ISO-8859-1") == "OpusHead") {
                codec = "opus"
                channels = bytes(bodyStart + 9) & 0xff
                preSkip = ((bytes(bodyStart + 10) & 0xff) |
                  ((bytes(bodyStart + 11) & 0xff) << 8))
                rate = u32le(bytes, bodyStart + 12).toInt
                granRate = 48000 // RFC 7845 §4: granules tick at 48 kHz
                serial = ser
                haveId = channels > 0
              }
            }
            if (haveId && ser == serial) {
              pages += 1
              // granule -1 (0xFFF..) marks a no-packet-ends page
              if (granule >= 0 && granule > maxGranule) maxGranule = granule
            }
            p = bodyStart + body
          }
        }
      }
    }
    if (!haveId) return None
    val effective = math.max(maxGranule - preSkip, -1L)
    val durMs =
      if (effective < 0 || granRate <= 0) -1L
      else effective * 1000L / granRate
    Some(Info(codec, channels, rate, pages, durMs))
  }

  // ---- writer (fixture generator) ----

  private def page(serial: Long, seq: Int, granule: Long, flags: Int,
                   body: Array[Byte]): Array[Byte] = {
    val nFull = body.length / 255
    val rem = body.length % 255
    // lacing: nFull 255s + one remainder (a multiple-of-255 body gets
    // a closing 0 lacing — the continued-packet grammar)
    val segs = Array.fill(nFull)(255.toByte) :+ rem.toByte
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('g'); out.write('g'); out.write('S')
    out.write(0); out.write(flags)
    (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => out.write(((serial >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => out.write(((seq.toLong >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(_ => out.write(0)) // CRC: carried, not verified
    out.write(segs.length)
    out.write(segs)
    out.write(body)
    out.toByteArray
  }

  /** Real page framing for either codec: BOS identification page,
    * one >255-byte comment page (a 255-lacing run), `audioPages`
    * data pages advancing the granule to `granuleEnd`.
    */
  def write(codec: String, channels: Int, rate: Int, granuleEnd: Long,
            preSkip: Int = 0, serial: Long = 0x6772616CL,
            audioPages: Int = 3): Array[Byte] = {
    val id: Array[Byte] = codec match {
      case "vorbis" =>
        val b = new Array[Byte](30)
        b(0) = 1
        "vorbis".getBytes("ISO-8859-1").copyToArray(b, 1)
        b(11) = channels.toByte
        (0 until 4).foreach(i => b(12 + i) = ((rate >> (8 * i)) & 0xff).toByte)
        b
      case "opus" =>
        val b = new Array[Byte](19)
        "OpusHead".getBytes("ISO-8859-1").copyToArray(b, 0)
        b(8) = 1 // version
        b(9) = channels.toByte
        b(10) = (preSkip & 0xff).toByte; b(11) = ((preSkip >> 8) & 0xff).toByte
        (0 until 4).foreach(i => b(12 + i) = ((rate >> (8 * i)) & 0xff).toByte)
        b
      case _ => throw new IllegalArgumentException(s"codec $codec")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(serial, 0, 0L, 2, id)) // BOS
    // a comment body > 255 bytes exercises the multi-lacing walk
    out.write(page(serial, 1, 0L, 0, new Array[Byte](300)))
    var i = 0
    while (i < audioPages) {
      val g = granuleEnd * (i + 1) / audioPages
      out.write(page(serial, 2 + i, g, if (i == audioPages - 1) 4 else 0,
        Array.fill[Byte](40 + i)(0x55)))
      i += 1
    }
    out.toByteArray
  }
}
