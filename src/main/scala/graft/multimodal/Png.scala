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
  * not a decode; the pixel samples surface untouched). ADAM7
  * INTERLACED files decode (r14): each of the seven passes is its own
  * filtered sub-image (empty passes contribute no scanlines), the
  * expected stream length sums the passes, and the unfiltered samples
  * scatter back to the lattice positions — the encoder's `interlaced`
  * switch writes the same seven passes (filter cycling within each),
  * so the round trip pins both sides. Profile fences
  * (all → None, the codec-family convention — refuse loudly, never
  * misread): bad signature, 16-bit depth, palette (type 3),
  * non-zero compression/filter methods, CRC
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

  /** Encode top-down RGB as an 8-bit truecolor PNG, sequential or
    * Adam7-interlaced.
    * The per-row filter type deliberately CYCLES `y mod 5` through
    * None/Sub/Up/Average/Paeth so any raster taller than four rows
    * exercises every unfilter path of a conforming decoder — the
    * encoder is the fixture generator for the decode oracle (q124),
    * and a fixed filter would leave four of the five paths untested.
    * `maxVal` must be 255 (depth-8 profile).
    */
  def encode(img: Netpbm.Image, interlaced: Boolean = false): Array[Byte] = {
    require(img.maxVal == 255, s"PNG profile is 8-bit, got maxVal=${img.maxVal}")
    val w = img.width; val h = img.height; val bpp = 3
    // filter one contiguous RGB raster (the whole image, or one Adam7
    // pass — each pass filters as its own sub-image per spec), the
    // y mod 5 filter cycling intact within it
    def filterRaster(pix: Array[Byte], pw: Int, ph: Int): Array[Byte] = {
      val stride = pw * bpp
      val out = new Array[Byte](ph * (1 + stride))
      var y = 0
      while (y < ph) {
        val f = y % 5
        val rowOff = y * (1 + stride)
        out(rowOff) = f.toByte
        var i = 0
        while (i < stride) {
          val cur = pix(y * stride + i) & 0xff
          val left = if (i >= bpp) pix(y * stride + i - bpp) & 0xff else 0
          val up = if (y > 0) pix((y - 1) * stride + i) & 0xff else 0
          val ul = if (y > 0 && i >= bpp)
            pix((y - 1) * stride + i - bpp) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          out(rowOff + 1 + i) = ((cur - pred) & 0xff).toByte
          i += 1
        }
        y += 1
      }
      out
    }
    val raw: Array[Byte] =
      if (!interlaced) filterRaster(img.pixels, w, h)
      else {
        val bo = new java.io.ByteArrayOutputStream(h * (1 + w * bpp) + 64)
        var p = 0
        while (p < 7) {
          val (pw, ph) = passDims(w, h, p)
          if (pw > 0 && ph > 0) {
            val sub = new Array[Byte](pw * ph * bpp)
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                val sy = Adam7YStart(p) + j * Adam7YStep(p)
                val sx = Adam7XStart(p) + i * Adam7XStep(p)
                System.arraycopy(img.pixels, (sy * w + sx) * bpp,
                  sub, (j * pw + i) * bpp, bpp)
                i += 1
              }
              j += 1
            }
            val fd = filterRaster(sub, pw, ph)
            bo.write(fd, 0, fd.length)
          }
          p += 1
        }
        bo.toByteArray
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
      .put(0.toByte).put(0.toByte) // compression/filter
      .put((if (interlaced) 1 else 0).toByte) // interlace method
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

  /** Parse a depth-8 non-palette PNG, sequential or Adam7-interlaced;
    * None on anything outside the profile (object scaladoc fences).
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
    var w = 0; var h = 0; var channels = 0; var interlaced = 0
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
          interlaced = bytes(off + 20) & 0xff
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
              w.toLong * h > MaxPixels ||
              depth != 8 || channels < 0 ||
              compression != 0 || filterMethod != 0 || interlaced > 1)
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
    val expected =
      if (interlaced == 0) h * (1 + stride)
      else (0 until 7).map { p =>
        val (pw, ph) = passDims(w, h, p)
        if (pw == 0 || ph == 0) 0 else ph * (1 + pw * channels)
      }.sum
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

    // unfilter (each interlace pass is its own filtered sub-image),
    // then project to RGB. The sequential path projects STRAIGHT from
    // the unfiltered scanlines — an extra full-size raster copy on
    // the overwhelmingly common case would cost up to hundreds of MB
    // transient per decode at the MaxPixels fence for nothing; only
    // the interlaced path gathers into a planar raster (the lattice
    // scatter has no contiguous source to project from).
    if (interlaced == 0) {
      if (!unfilterInto(raw, 0, w, h, channels)) return None
      val px = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val yy = p / w
        val src = yy * (1 + stride) + 1 + (p % w) * channels
        channels match {
          case 1 | 2 =>
            val g = raw(src); px(p * 3) = g; px(p * 3 + 1) = g
            px(p * 3 + 2) = g
          case _ =>
            px(p * 3) = raw(src); px(p * 3 + 1) = raw(src + 1)
            px(p * 3 + 2) = raw(src + 2)
        }
        p += 1
      }
      return Some(Netpbm.Image(w, h, 255, px))
    }
    val full = new Array[Byte](w * h * channels)
    locally {
      var base = 0
      var p = 0
      while (p < 7) {
        val (pw, ph) = passDims(w, h, p)
        if (pw > 0 && ph > 0) {
          if (!unfilterInto(raw, base, pw, ph, channels)) return None
          // scatter the pass raster to its Adam7 lattice positions
          val pStride = pw * channels
          var j = 0
          while (j < ph) {
            val destY = Adam7YStart(p) + j * Adam7YStep(p)
            var i2 = 0
            while (i2 < pw) {
              val destX = Adam7XStart(p) + i2 * Adam7XStep(p)
              System.arraycopy(raw, base + j * (1 + pStride) + 1 + i2 * channels,
                full, (destY * w + destX) * channels, channels)
              i2 += 1
            }
            j += 1
          }
          base += ph * (1 + pStride)
        }
        p += 1
      }
    }
    val px = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val src = p * channels
      channels match {
        case 1 | 2 =>
          val g = full(src); px(p * 3) = g; px(p * 3 + 1) = g; px(p * 3 + 2) = g
        case _ =>
          px(p * 3) = full(src); px(p * 3 + 1) = full(src + 1)
          px(p * 3 + 2) = full(src + 2)
      }
      p += 1
    }
    Some(Netpbm.Image(w, h, 255, px))
  }

  // Adam7 lattice (pass 0..6): starts and steps per the PNG spec
  private val Adam7XStart = Array(0, 4, 0, 2, 0, 1, 0)
  private val Adam7YStart = Array(0, 0, 4, 0, 2, 0, 1)
  private val Adam7XStep = Array(8, 8, 4, 4, 2, 2, 1)
  private val Adam7YStep = Array(8, 8, 8, 4, 4, 2, 2)

  /** Pass p's sub-image dims; (0, _) or (_, 0) = an empty pass that
    * contributes NO scanlines (small images skip whole passes).
    */
  private def passDims(w: Int, h: Int, p: Int): (Int, Int) = (
    math.max(0, (w - Adam7XStart(p) + Adam7XStep(p) - 1) / Adam7XStep(p)),
    math.max(0, (h - Adam7YStart(p) + Adam7YStep(p) - 1) / Adam7YStep(p)))

  /** Unfilter one filtered sub-image in place at `base` (rows of
    * 1 filter byte + w·channels samples); false on an unknown filter.
    */
  private def unfilterInto(raw: Array[Byte], base: Int, w: Int, h: Int,
                           channels: Int): Boolean = {
    val stride = w * channels
    var y = 0
    while (y < h) {
      val rowOff = base + y * (1 + stride)
      val f = raw(rowOff) & 0xff
      if (f > 4) return false
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
    true
  }
}
