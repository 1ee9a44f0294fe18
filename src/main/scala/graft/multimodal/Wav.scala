package graft.multimodal

/** Minimal pure-JVM WAV (RIFF/PCM) codec — the audio arm of
  * [[Multimodal]]'s real-decode dispatch, next to [[Netpbm]]'s image
  * arm (public format: RIFF container, `fmt ` chunk describing PCM,
  * `data` chunk of little-endian samples). Only integer PCM with
  * 16-bit samples and one channel is supported — anything else
  * (float WAV, ADPCM, multi-channel, truncated chunks) returns None
  * and fences upstream as an ok=false row, never an exception.
  *
  * The parser WALKS the chunk list: real-world WAVs carry `LIST`/
  * `INFO`/`fact` chunks between `fmt ` and `data`, and a decoder that
  * assumes `data` at byte 36 breaks on them — chunk walking (with the
  * RIFF odd-size pad byte) is the part of this format worth getting
  * right.
  */
object Wav {

  /** Decoded mono PCM16 audio. */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  /** Parse a RIFF/WAVE payload: Some(Audio) for mono 16-bit integer
    * PCM, None for anything malformed or unsupported. Unknown chunks
    * are skipped (with the odd-size pad byte the RIFF spec requires);
    * `data` before `fmt ` is rejected — the format chunk defines how
    * to read the samples.
    */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 12) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var i = 12
    var rate = -1
    var haveFmt = false
    while (i + 8 <= bytes.length) {
      val id = tag(bytes, i)
      val size = le32(bytes, i + 4)
      val body = i + 8
      if (size < 0 || body + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(bytes, body)
          val channels = le16(bytes, body + 2)
          val bits = le16(bytes, body + 14)
          // 1 = integer PCM; mono 16-bit only (the supported profile)
          if (audioFormat != 1 || channels != 1 || bits != 16) return None
          rate = le32(bytes, body + 4).toInt
          if (rate <= 0) return None
          haveFmt = true
        case "data" =>
          if (!haveFmt) return None // sample layout is defined by fmt
          if (size % 2 != 0) return None
          val n = (size / 2).toInt
          val out = new Array[Short](n)
          var s = 0
          while (s < n) {
            out(s) = le16(bytes, body + 2 * s).toShort
            s += 1
          }
          return Some(Audio(rate, out))
        case _ => () // LIST/INFO/fact/...: skip
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i = body + size.toInt + (size.toInt & 1)
    }
    None // no data chunk
  }

  /** Serialize mono PCM16 as a canonical RIFF/WAVE (fmt then data) —
    * decode(encode(a)) == a exactly.
    */
  def encodePcm16(audio: Audio): Array[Byte] = {
    val n = audio.samples.length
    val dataSize = 2 * n
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                      // integer PCM
      .putShort(1)                      // mono
      .putInt(audio.sampleRate)
      .putInt(audio.sampleRate * 2)     // byte rate
      .putShort(2)                      // block align
      .putShort(16)                     // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { out.putShort(audio.samples(i)); i += 1 }
    out.array()
  }

  /** 64-bit ENERGY-CONTOUR hash — the audio sibling of
    * [[Netpbm.dHash64]] (the perceptual-fingerprint family without an
    * FFT dependency): the sample stream partitions into 65 windows
    * (boundary b(w) = w·n DIV 65 — integer division, so the DuckDB
    * oracle replays it exactly), window energy e(w) = Σ |sampleᵢ|
    * (exact Long sums), bit k = e(k) > e(k+1). Adjacent-window
    * comparison makes a GLOBAL gain change (amplitude scaling that
    * preserves |s| order, e.g. any positive integer multiplier)
    * cancel, and a localized edit touches ≤ 1 window → ≤ 2 hash bits
    * (its two adjacent comparisons) once n ≥ 65 — so audio near-dup
    * is the q32/q119 block-bucket problem on one more 64-bit Hamming
    * space. Degenerate audio (no samples) hashes 0.
    */
  /** Window count (= hash bits + 1) — ONE definition interpolated
    * into the q120 oracle SQL (the one-definition rule).
    */
  val EnergyWindows = 65

  def energyHash64(a: Audio): Long = {
    val n = a.samples.length
    if (n == 0) return 0L
    val e = new Array[Long](EnergyWindows)
    var w = 0
    while (w < EnergyWindows) {
      // boundary products in LONG: w·n overflows Int past ~33.5M
      // samples (a 13-minute 44.1 kHz clip) — a wrap here reads a
      // negative index or silently diverges from the oracle's 64-bit //
      val lo = (w.toLong * n / EnergyWindows).toInt
      val hi = ((w + 1).toLong * n / EnergyWindows).toInt
      var s = 0L
      var i = lo
      while (i < hi) { s += math.abs(a.samples(i).toLong); i += 1 }
      e(w) = s
      w += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) { if (e(k) > e(k + 1)) h |= 1L << k; k += 1 }
    h
  }
}
