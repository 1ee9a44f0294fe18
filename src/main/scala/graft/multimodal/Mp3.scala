package graft.multimodal

/** MP3 (MPEG audio) FRAME-HEADER walk — duration/bitrate/sample-rate
  * evidence WITHOUT PCM decode. Crawl audio is overwhelmingly MP3;
  * the media face sniffs it ([[graft.sources.BinarySource]] routes
  * ID3v2 and bare frame sync) but the fingerprint family covered WAV
  * only — triage (how long, what rate, CBR/VBR, mono/stereo) needs
  * exactly the header fields, and a full Layer-III synthesis filter
  * bank is not what a 100 TB triage pass should pay for.
  *
  * Profile: ID3v2 prefix skipped (syncsafe size, optional footer),
  * MPEG-1/2/2.5 Layers I–III, frame-length arithmetic per layer,
  * free-format (bitrate index 0) fenced, a bounded resync scan for
  * leading junk validated by a DOUBLE sync (the next frame must start
  * where this one's length says — the standard guard against 0xFFEx
  * bytes inside payload data). The walk stops at the first invalid
  * header after a valid run (a truncated final frame drops, counted
  * frames keep — the WARC truncation discipline). [[write]] is the
  * fixture generator: synthetic frames with real headers and silent
  * payloads, optional ID3v2 prefix and per-frame bitrate switches
  * (VBR evidence).
  */
object Mp3 {

  /** Header-walk evidence: version is 10× (10/20/25 for MPEG-1/2/2.5)
    * so it stays integral; `bitrateKbps` is the FIRST frame's;
    * `vbr` true when any frame's bitrate index differs.
    */
  final case class Info(version: Int, layer: Int, sampleRate: Int,
                        channels: Int, bitrateKbps: Int, frames: Int,
                        durationMs: Long, vbr: Boolean)

  // bitrate tables (kbps), index 1..14; 0 = free (fenced), 15 = bad
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val RateV1 = Array(44100, 48000, 32000)
  private val RateV2 = Array(22050, 24000, 16000)
  private val RateV25 = Array(11025, 12000, 8000)

  /** One parsed frame header: (version10, layer, sampleRate, channels,
    * kbps, samplesPerFrame, frameLengthBytes).
    */
  private final case class Hdr(version10: Int, layer: Int, rate: Int,
                               channels: Int, kbps: Int, samples: Int,
                               length: Int)

  private def header(b: Array[Byte], p: Int): Option[Hdr] = {
    if (p + 4 > b.length) return None
    val b1 = b(p) & 0xff; val b2 = b(p + 1) & 0xff
    val b3 = b(p + 2) & 0xff; val b4 = b(p + 3) & 0xff
    if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None
    val verBits = (b2 >> 3) & 3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    if (verBits == 1) return None
    val layerBits = (b2 >> 1) & 3 // 0=reserved, 1=III, 2=II, 3=I
    if (layerBits == 0) return None
    val layer = 4 - layerBits
    val brIx = b3 >> 4
    if (brIx == 0 || brIx == 15) return None // free format / bad: fence
    val srIx = (b3 >> 2) & 3
    if (srIx == 3) return None
    val padding = (b3 >> 1) & 1
    val v1 = verBits == 3
    val version10 = if (v1) 10 else if (verBits == 2) 20 else 25
    val rate = (if (v1) RateV1 else if (verBits == 2) RateV2 else RateV25)(srIx)
    val kbps = (layer match {
      case 1 => if (v1) BrV1L1 else BrV2L1
      case 2 => if (v1) BrV1L2 else BrV2L23
      case _ => if (v1) BrV1L3 else BrV2L23
    })(brIx)
    val channels = if ((b4 >> 6) == 3) 1 else 2
    val samples = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (v1) 1152 else 576
    }
    val length = layer match {
      case 1 => (12 * kbps * 1000 / rate + padding) * 4
      case _ =>
        // Layer II always 144·br/rate; Layer III halves for MPEG-2/2.5
        // (576 samples per frame)
        val coef = if (layer == 2 || v1) 144 else 72
        coef * kbps * 1000 / rate + padding
    }
    if (length < 4) return None
    Some(Hdr(version10, layer, rate, channels, kbps, samples, length))
  }

  /** Skip an ID3v2 container at p, if present: returns the position
    * after it (10-byte header + syncsafe size + optional footer).
    */
  private def skipId3(b: Array[Byte], p: Int): Int = {
    if (p + 10 > b.length || b(p) != 'I' || b(p + 1) != 'D' ||
        b(p + 2) != '3') return p
    val size = ((b(p + 6) & 0x7f) << 21) | ((b(p + 7) & 0x7f) << 14) |
      ((b(p + 8) & 0x7f) << 7) | (b(p + 9) & 0x7f)
    val footer = if ((b(p + 5) & 0x10) != 0) 10 else 0
    val after = p + 10 + size + footer
    if (after > b.length) b.length else after
  }

  private val ResyncWindow = 1 << 16

  /** Parse the stream's frame headers, best effort; None when no
    * DOUBLE-VALIDATED frame sync exists in the resync window.
    */
  def parse(bytes: Array[Byte]): Option[Info] = {
    val initial = skipId3(bytes, 0)
    var start = initial
    // resync: first position whose header is valid AND whose declared
    // length lands on another valid header (or clean EOF)
    val limit = math.min(bytes.length, start + ResyncWindow)
    var found = -1
    while (found < 0 && start < limit) {
      header(bytes, start) match {
        case Some(h) =>
          val next = start + h.length
          // double-sync: the next frame must start where this one's
          // length says — UNLESS the stream plausibly ends there (a
          // clean EOF, or — only for a frame at the stream's natural
          // start, where no junk was skipped to find it — a short
          // trailer window: the classic 128-byte ID3v1 'TAG', a
          // truncated final frame). Without the window a valid
          // SINGLE-frame file followed by 'TAG' would parse as
          // no-frames; restricting it to the natural start keeps a
          // fake sync inside junk from validating against the window.
          if (next == bytes.length ||
              (start == initial && next >= bytes.length - 128 &&
                next <= bytes.length) ||
              (next + 4 <= bytes.length && header(bytes, next).isDefined))
            found = start
          else start += 1
        case None => start += 1
      }
    }
    if (found < 0) return None
    val first = header(bytes, found).get
    var frames = 0
    var samplesTotal = 0L
    var vbr = false
    var p = found
    var going = true
    while (going) {
      header(bytes, p) match {
        case Some(h) if p + h.length <= bytes.length =>
          // count only FULLY-CONTAINED frames (truncation discipline)
          frames += 1
          samplesTotal += h.samples
          if (h.kbps != first.kbps) vbr = true
          p += h.length
        case _ => going = false
      }
    }
    if (frames == 0) None
    else Some(Info(first.version10, first.layer, first.rate,
      first.channels, first.kbps, frames,
      samplesTotal * 1000L / first.rate, vbr))
  }

  /** Fixture generator: `n` frames of real headers + silent payload.
    * `bitrateIdxs` cycles per frame (two different indexes = a VBR
    * stream); `id3Junk` > 0 prepends a real ID3v2 header framing that
    * many junk bytes (which may themselves contain fake sync bytes —
    * the resync guard's food).
    */
  def write(n: Int, versionBits: Int = 3, layer: Int = 3,
            bitrateIdxs: Seq[Int] = Seq(9), srIx: Int = 0,
            mono: Boolean = true, id3Junk: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Junk > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no footer
      // syncsafe size
      out.write((id3Junk >> 21) & 0x7f); out.write((id3Junk >> 14) & 0x7f)
      out.write((id3Junk >> 7) & 0x7f); out.write(id3Junk & 0x7f)
      var i = 0
      while (i < id3Junk) { out.write(if (i % 7 == 0) 0xFF else 0xE3); i += 1 }
    }
    var f = 0
    while (f < n) {
      val brIx = bitrateIdxs(f % bitrateIdxs.length)
      val b2 = 0xE0 | (versionBits << 3) | ((4 - layer) << 1) | 1
      val b3 = (brIx << 4) | (srIx << 2)
      val b4 = if (mono) 0xC0 else 0x00
      val hb = Array[Byte](0xFF.toByte, b2.toByte, b3.toByte, b4.toByte)
      val h = header(hb, 0).getOrElse(
        throw new IllegalArgumentException("bad fixture params"))
      out.write(hb, 0, 4)
      var i = 4
      while (i < h.length) { out.write(0x00); i += 1 }
      f += 1
    }
    out.toByteArray
  }
}
