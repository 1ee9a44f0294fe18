package graft.multimodal

/** FLAC STREAMINFO walk — the lossless-audio triage arm: "fLaC"
  * marker, metadata-block headers (1-bit last flag, 7-bit type,
  * 24-bit length), and the mandatory FIRST block (STREAMINFO, type
  * 0): sample rate (20 bits), channels (3 bits + 1), bits per sample
  * (5 bits + 1), total samples (36 bits) → duration. No frame is
  * decoded (the [[Mp3]]/[[Ogg]] rationale); unknown block types
  * (VORBIS_COMMENT, PICTURE, PADDING …) skip by declared length, a
  * block overrunning the payload stops the walk with STREAMINFO
  * already in hand (the WARC truncation discipline — audio data
  * truncation never costs the evidence, which sits in the first
  * 42 bytes).
  *
  * [[write]] emits the real bit-packed layout plus skippable blocks.
  */
object Flac {

  /** `totalSamples` 0 = unknown (live encodes); then durationMs -1. */
  final case class Info(sampleRate: Int, channels: Int, bitsPerSample: Int,
                        totalSamples: Long, durationMs: Long)

  def parse(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 8) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
          bytes(3) == 'C')) return None
    var p = 4
    var first = true
    var info: Option[Info] = None
    var going = true
    while (going && p + 4 <= bytes.length) {
      val hdr = bytes(p) & 0xff
      val last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      val body = p + 4
      if (body + len > bytes.length) going = false // truncated block
      else {
        if (first) {
          // the format REQUIRES STREAMINFO first; anything else is
          // not a FLAC stream worth evidence
          if (typ != 0 || len < 34) return None
          // bytes 10..17 of STREAMINFO: rate(20) ch(3) bps(5) total(36)
          val b10 = bytes(body + 10) & 0xffL
          val b11 = bytes(body + 11) & 0xffL
          val b12 = bytes(body + 12) & 0xffL
          val b13 = bytes(body + 13) & 0xffL
          val rate = ((b10 << 12) | (b11 << 4) | (b12 >> 4)).toInt
          val ch = (((b12 >> 1) & 0x7) + 1).toInt
          val bps = ((((b12 & 0x1) << 4) | (b13 >> 4)) + 1).toInt
          var total = (b13 & 0xfL) << 32
          var i = 0
          while (i < 4) {
            total |= (bytes(body + 14 + i) & 0xffL) << (8 * (3 - i))
            i += 1
          }
          if (rate <= 0) return None // 0 is invalid for audio streams
          val durMs = if (total == 0) -1L else total * 1000L / rate
          info = Some(Info(rate, ch, bps, total, durMs))
          first = false
        }
        p = body + len
        if (last) going = false
      }
    }
    info
  }

  /** Real layout: marker, STREAMINFO (bit-packed), an optional
    * skippable VORBIS_COMMENT block, a PADDING block marked last,
    * then fake frame bytes.
    */
  def write(rate: Int, channels: Int, bitsPerSample: Int,
            totalSamples: Long, withComment: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new Array[Byte](34)
    // min/max block size (2+2), min/max frame size (3+3): plausible
    si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0
    si(10) = ((rate >> 12) & 0xff).toByte
    si(11) = ((rate >> 4) & 0xff).toByte
    si(12) = (((rate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bitsPerSample - 1) >> 4) & 0x1)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    var i = 0
    while (i < 4) {
      si(14 + i) = ((totalSamples >> (8 * (3 - i))) & 0xff).toByte
      i += 1
    }
    out.write(0); out.write(0); out.write(0); out.write(34)
    out.write(si)
    if (withComment) {
      val c = "graft fixture".getBytes("UTF-8")
      out.write(4) // VORBIS_COMMENT, not last
      out.write(0); out.write(0); out.write(c.length)
      out.write(c)
    }
    out.write(0x81.toByte & 0xff) // PADDING, last
    out.write(0); out.write(0); out.write(2)
    out.write(0); out.write(0)
    out.write(0xFF); out.write(0xF8) // fake frame sync tail
    out.toByteArray
  }
}
