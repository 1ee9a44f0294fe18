package graft.multimodal

import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — the fourth REAL decoder arm beside [[Netpbm]],
  * [[Bmp]] and [[Wav]], and the first one covering a format a real
  * crawl actually serves (virtually every web image that is not a JPEG
  * is a PNG; see /root/reference import.js:1 — the reference tool
  * ships files to a hosted API and never decodes, so the format
  * profile here is driven by the crawl-intake need, not the
  * reference). Full format walk, not byte math: the 8-byte signature,
  * the chunk stream (length/type/data/CRC — every CRC is VALIDATED;
  * a flipped bit fails the parse, never yields garbage pixels), IHDR
  * range checks, concatenated IDAT inflate (zlib via the JDK
  * Inflater), and the per-scanline unfilter pass implementing all
  * five filter types of the spec (None/Sub/Up/Average/Paeth) at any
  * supported channel count. Output is [[Netpbm.Image]]'s top-down RGB
  * so every existing image kernel (lumaHistogram, dHash64,
  * resizeNearest) applies unchanged.
  *
  * Profile: bit depth 8, color types 0 (greyscale → replicated to
  * RGB), 2 (truecolor), 4 (grey+alpha) and 6 (RGBA) — alpha is
  * DISCARDED (compositing against a background is a display policy,
  * not a decode; the pixel samples surface untouched). Profile fences
  * (all → None, the codec-family convention — refuse loudly, never
  * misread): bad signature, 16-bit depth, palette (type 3),
  * interlaced files, non-zero compression/filter methods, CRC
  * mismatches, truncated chunk streams or missing IEND, inflate
  * errors, scanline streams of the wrong size, unknown per-row filter
  * types, and absurd dimensions (a corrupt IHDR must fail the parse,
  * not size a multi-GB allocation).
  */
object Png {

  private val Signature = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')
    .map(_.toByte)

  private val MaxDim = 1 << 20
  private val MaxPixels = 1L << 26

  /** Channels per pixel for the supported color types; -1 = fenced. */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // greyscale
    case 2 => 3 // truecolor
    case 4 => 2 // grey + alpha
    case 6 => 4 // RGBA
    case _ => -1 // 3 = palette (needs PLTE indirection): outside profile
  }

  private def crcOf(tpe: Array[Byte], data: Array[Byte], len: Int): Int = {
    val c = new CRC32
    c.update(tpe, 0, 4)
    c.update(data, 0, len)
    c.getValue.toInt
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode top-down RGB as an 8-bit truecolor non-interlaced PNG.
    * The per-row filter type deliberately CYCLES `y mod 5` through
    * None/Sub/Up/Average/Paeth so any raster taller than four rows
    * exercises every unfilter path of a conforming decoder — the
    * encoder is the fixture generator for the decode oracle (q124),
    * and a fixed filter would leave four of the five paths untested.
    * `maxVal` must be 255 (depth-8 profile).
    */
  def encode(img: Netpbm.Image): Array[Byte] = {
    require(img.maxVal == 255, s"PNG profile is 8-bit, got maxVal=${img.maxVal}")
    val w = img.width; val h = img.height; val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val f = y % 5
      val rowOff = y * (1 + stride)
      raw(rowOff) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = img.pixels(y * stride + i) & 0xff
        val left = if (i >= bpp) img.pixels(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp)
          img.pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(rowOff + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    val idat = try {
      defl.setInput(raw); defl.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](1 << 14)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      out.toByteArray
    } finally defl.end()

    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    out.write(Signature)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val t = tpe.getBytes("US-ASCII")
      out.write(ByteBuffer.allocate(4).putInt(data.length).array())
      out.write(t)
      out.write(data)
      out.write(ByteBuffer.allocate(4).putInt(crcOf(t, data, data.length)).array())
    }
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse a depth-8 non-interlaced non-palette PNG; None on anything
    * outside the profile (see the object scaladoc for the fences).
    */
  def decode(bytes: Array[Byte]): Option[Netpbm.Image] = {
    if (bytes.length < Signature.length + 12) return None
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    val b = ByteBuffer.wrap(bytes)
    var off = Signature.length
    var w = 0; var h = 0; var channels = 0
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream(bytes.length)
    while (!sawIend) {
      if (off + 12 > bytes.length) return None // chunk header/CRC cut
      val len = b.getInt(off)
      // LONG arithmetic: a crafted len near Int.MaxValue would wrap
      // `off + 12 + len` negative, slip past this fence, and die in a
      // 2 GB allocation instead of returning None
      if (len < 0 || off.toLong + 12L + len > bytes.length)
        return None // truncated or lying length
      val tpe = new String(bytes, off + 4, 4, "US-ASCII")
      val crcData = new Array[Byte](len)
      System.arraycopy(bytes, off + 8, crcData, 0, len)
      val tpeBytes = new Array[Byte](4)
      System.arraycopy(bytes, off + 4, tpeBytes, 0, 4)
      if (crcOf(tpeBytes, crcData, len) != b.getInt(off + 8 + len)) return None
      tpe match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          w = b.getInt(off + 8); h = b.getInt(off + 12)
          val depth = bytes(off + 16) & 0xff
          channels = channelsOf(bytes(off + 17) & 0xff)
          val compression = bytes(off + 18) & 0xff
          val filterMethod = bytes(off + 19) & 0xff
          val interlace = bytes(off + 20) & 0xff
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
              w.toLong * h > MaxPixels ||
              depth != 8 || channels < 0 ||
              compression != 0 || filterMethod != 0 || interlace != 0)
            return None
        case "IDAT" =>
          if (!sawIhdr) return None // IHDR must precede IDAT
          idat.write(crcData)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunk (tEXt, pHYs, …): CRC-checked, skipped
      }
      off += 12 + len
    }
    if (!sawIhdr) return None
    val stride = w * channels
    val expected = h * (1 + stride)
    val raw = new Array[Byte](expected)
    val infl = new Inflater()
    try {
      infl.setInput(idat.toByteArray)
      var got = 0
      while (got < expected && !infl.finished()) {
        val n = infl.inflate(raw, got, expected - got)
        // n == 0 while unfinished covers BOTH stall modes: needsInput
        // (stream died short) and needsDictionary (FDICT-flagged zlib
        // header — PNG forbids preset dictionaries, and looping on it
        // would spin forever, a task hang one crafted crawl image away)
        if (n == 0) return None
        got += n
      }
      if (got < expected) return None
      // surplus pixel data = a lying IHDR; refuse rather than crop
      if (!infl.finished() && infl.inflate(new Array[Byte](1)) > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally infl.end()

    // unfilter in place, then project to RGB
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride)
      val f = raw(rowOff) & 0xff
      if (f > 4) return None
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + 1 + x) & 0xff
        val left = if (x >= channels) raw(rowOff + 1 + x - channels) & 0xff else 0
        val up = if (y > 0) raw(rowOff - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels)
          raw(rowOff - stride + x - channels) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        raw(rowOff + 1 + x) = ((cur + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val px = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val yy = p / w
      val src = yy * (1 + stride) + 1 + (p % w) * channels
      channels match {
        case 1 => val g = raw(src); px(p * 3) = g; px(p * 3 + 1) = g; px(p * 3 + 2) = g
        case 2 => val g = raw(src); px(p * 3) = g; px(p * 3 + 1) = g; px(p * 3 + 2) = g
        case 3 | 4 =>
          px(p * 3) = raw(src); px(p * 3 + 1) = raw(src + 1)
          px(p * 3 + 2) = raw(src + 2)
      }
      p += 1
    }
    Some(Netpbm.Image(w, h, 255, px))
  }
}
