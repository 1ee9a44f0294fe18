package graft.multimodal

/** Pure-JVM GIF codec — the fifth REAL decoder arm ([[Netpbm]],
  * [[Bmp]], [[Wav]], [[Png]]) and the second covering a format real
  * crawls serve. Unlike JPEG (lossy — encode∘decode is not the
  * identity, so the repo's closed-form oracle device cannot apply),
  * GIF's LZW is LOSSLESS, which is exactly why it is the right next
  * codec: the q124/q91 round-trip oracle discipline extends to it
  * unchanged (q125).
  *
  * Full format walk: GIF87a/GIF89a header, logical screen descriptor,
  * global color table, extension blocks (sub-block chains skipped
  * intact), the first image descriptor (local color table honored),
  * and a REAL variable-width LZW decode — clear codes (including
  * mid-stream dictionary resets at 4096), EOI, the deferred "KwKwK"
  * case (a code referencing the entry being defined), LSB-first bit
  * unpacking across 255-byte sub-block boundaries. Output is
  * [[Netpbm.Image]]'s RGB via the palette, so every image kernel
  * (lumaHistogram, dHash64, resizeNearest) applies unchanged.
  *
  * INTERLACED images decode (r14): the stream transmits rows in the
  * GIF 4-pass order (8-stride from row 0, 8-stride from 4, 4-stride
  * from 2, 2-stride from 1) and the decoder remaps them to display
  * order after the LZW pass — the same pass table the encoder's
  * `interlaced` switch writes, so the round trip pins both sides.
  *
  * Profile fences (all → None, the codec-family convention):
  * bad magic, truncated screen/image descriptors or sub-blocks,
  * an image with neither local nor global color
  * table, palette indices past the table, LZW codes past the next
  * free slot, pixel overflow/shortfall vs the descriptor, absurd
  * dimensions, missing image data before the trailer. Animation is
  * out of profile by CHOICE, not accident: frame 1 is decoded, later
  * frames ignored — the corpus-pipeline contract is "one raster per
  * blob" (the ffmpeg-style frame splitter is [[Multimodal
  * .sampleFrames]]' job, over P6 streams).
  *
  * The encoder is a real LZW compressor (dictionary growth, width
  * escalation, 4096 reset), not the fixed-code shortcut — the decode
  * fixtures must exercise the same machinery a crawl-served GIF was
  * written with.
  */
object Gif {

  private val MaxDim = 1 << 20
  private val MaxPixels = 1L << 26

  /** Encode top-down RGB as a GIF89a with one image. The image must
    * use ≤ 256 distinct colors (the format's palette ceiling — the
    * caller picks a palette-friendly layout, e.g. the q125 grayscale
    * raster); `maxVal` must be 255.
    */
  /** GIF 4-pass interlace: display row for each TRANSMIT index
    * (8-stride from row 0, 8-stride from 4, 4-stride from 2, 2-stride
    * from 1) — the one definition both the encoder's gather and the
    * decoder's scatter use, so the passes cannot desynchronize.
    */
  private def interlaceRowOrder(h: Int): Array[Int] = {
    val o = new Array[Int](h)
    var t = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { o(t) = y; t += 1; y += step }
    }
    o
  }

  def encode(img: Netpbm.Image, interlaced: Boolean = false): Array[Byte] = {
    require(img.maxVal == 255, s"GIF is 8-bit palette, got maxVal=${img.maxVal}")
    require(img.width <= 0xffff && img.height <= 0xffff,
      s"GIF dims are 16-bit: ${img.width}x${img.height}")
    // palette: distinct colors in first-appearance order
    val colorIndex = new java.util.LinkedHashMap[Int, Integer]()
    val n = img.nPixels
    val rowMajor = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = ((img.pixels(3 * i) & 0xff) << 16) |
        ((img.pixels(3 * i + 1) & 0xff) << 8) | (img.pixels(3 * i + 2) & 0xff)
      var idx = colorIndex.get(c)
      if (idx == null) {
        idx = colorIndex.size()
        require(idx < 256, "GIF palette ceiling: > 256 distinct colors")
        colorIndex.put(c, idx)
      }
      rowMajor(i) = idx.toByte
      i += 1
    }
    // interlaced streams transmit rows in the 4-pass order — the ONE
    // shared table ([[interlaceRowOrder]]) the decoder inverts
    val indices =
      if (!interlaced) rowMajor
      else {
        val o = new Array[Byte](n)
        val order = interlaceRowOrder(img.height)
        var t = 0
        while (t < img.height) {
          System.arraycopy(rowMajor, order(t) * img.width,
            o, t * img.width, img.width)
          t += 1
        }
        o
      }
    val nColors = math.max(colorIndex.size(), 2)
    // table size = 2^(bits): the smallest power of two ≥ nColors
    var bits = 1
    while ((1 << bits) < nColors) bits += 1
    val tableSize = 1 << bits

    val out = new java.io.ByteArrayOutputStream(n / 2 + 64)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(img.width); le16(img.height)
    out.write(0x80 | ((bits - 1) << 4) | (bits - 1)) // global table, 2^bits
    out.write(0); out.write(0) // background, aspect
    val it = colorIndex.keySet().iterator()
    var written = 0
    while (it.hasNext) {
      val c = it.next()
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
      written += 1
    }
    while (written < tableSize) { // pad the table to its declared size
      out.write(0); out.write(0); out.write(0); written += 1
    }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(img.width); le16(img.height)
    out.write(if (interlaced) 0x40 else 0) // no local table

    // --- LZW compress the index stream ---
    // WIDTH CONVENTION (the one rule both sides implement, traced in
    // GifSpec): a code is written/read at the width representing the
    // DECODER's next-free-slot at read time — widen while decNext ≥
    // 2^width (cap 12). The decoder adds one entry per DATA code read
    // after a segment's first — including the LAST one, where the
    // encoder adds nothing — so the decoder's slot counter is a pure
    // function of how many data codes it has read: decNext = eoi+1 +
    // max(0, segEmitted−1). Modeling it off the encoder's own slot
    // counter instead is the knife-edge bug the q125 corpus found:
    // when the decoder's FINAL add lands exactly on a power of two,
    // it reads EOI one bit wider than an encNext−1 model writes it.
    val minCode = math.max(bits, 2)
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    val data = new java.io.ByteArrayOutputStream(n / 2 + 16)
    var bitBuf = 0L; var bitCnt = 0
    var codeWidth = minCode + 1
    var encNext = eoi + 1   // the encoder's next dictionary slot
    var segEmitted = 0      // data codes emitted in this segment
    def emit(code: Int, isData: Boolean): Unit = {
      val decNext = eoi + 1 + math.max(0, segEmitted - 1)
      while (decNext >= (1 << codeWidth) && codeWidth < 12) codeWidth += 1
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
      if (isData) segEmitted += 1
    }
    // dictionary: (prefix code, next index) -> code, keyed as a long
    // (code ≤ 4095 in the high bits, index ≤ 255 low)
    var dict = new java.util.HashMap[Long, Integer]()
    def resetDict(): Unit = {
      dict = new java.util.HashMap(); encNext = eoi + 1
      codeWidth = minCode + 1; segEmitted = 0
    }
    emit(clear, isData = false)
    if (n > 0) {
      var cur = indices(0) & 0xff
      i = 1
      while (i < n) {
        val nxt = indices(i) & 0xff
        val hit = dict.get((cur.toLong << 8) | nxt)
        if (hit != null) cur = hit
        else {
          emit(cur, isData = true)
          if (encNext <= 4095) {
            dict.put((cur.toLong << 8) | nxt, encNext)
            encNext += 1
          } else { // table full: start over
            emit(clear, isData = false); resetDict()
          }
          cur = nxt
        }
        i += 1
      }
      emit(cur, isData = true)
    }
    emit(eoi, isData = false)
    if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
    // sub-blocks of ≤ 255 bytes
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val len = math.min(255, bytes.length - off)
      out.write(len)
      out.write(bytes, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Parse the FIRST image of a GIF87a/GIF89a; None on anything
    * outside the profile (object scaladoc).
    */
  def decode(bytes: Array[Byte]): Option[Netpbm.Image] = {
    if (bytes.length < 13) return None
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    def u8(p: Int): Int = bytes(p) & 0xff
    def le16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    val flags = u8(10)
    var pos = 13
    var globalTable: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val size = 1 << ((flags & 7) + 1)
      if (pos + 3 * size > bytes.length) return None
      globalTable = readTable(bytes, pos, size)
      pos += 3 * size
    }
    // walk blocks to the first image descriptor
    while (true) {
      if (pos >= bytes.length) return None // no image before EOF
      u8(pos) match {
        case 0x3B => return None // trailer with no image
        case 0x21 => // extension: label + sub-block chain
          pos += 2
          var done = false
          while (!done) {
            if (pos >= bytes.length) return None
            val len = u8(pos); pos += 1 + len
            if (len == 0) done = true
          }
        case 0x2C =>
          return decodeImage(bytes, pos + 1, globalTable,
            le16(6), le16(8))
        case _ => return None // unknown block: unattributable bytes
      }
    }
    None // unreachable
  }

  /** True iff the stream declares more than one image frame — the
    * `is_animated` flag beside [[decode]]'s frame-1 raster (the
    * [[Webp.isAnimated]] contract). A light structural walk: image
    * descriptors counted, extension and data sub-block chains
    * framed past, local color tables skipped; a malformed or
    * truncated walk reads false (the probe answers "declared
    * animated", not "valid").
    */
  def isAnimated(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 13) return false
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return false
    def u8(p: Int): Int = bytes(p) & 0xff
    var pos = 13
    val flags = u8(10)
    if ((flags & 0x80) != 0) pos += 3 * (1 << ((flags & 7) + 1))
    var images = 0
    def skipSubBlocks(): Boolean = {
      var done = false
      while (!done) {
        if (pos >= bytes.length) return false
        val len = u8(pos); pos += 1 + len
        if (len == 0) done = true
      }
      true
    }
    while (pos < bytes.length) {
      u8(pos) match {
        // a second descriptor returns true below before any trailer
        // is reached, so a walk that gets here saw at most one frame
        case 0x3B => return false
        case 0x21 =>
          pos += 2
          if (!skipSubBlocks()) return false
        case 0x2C =>
          if (pos + 10 > bytes.length) return false
          val lflags = u8(pos + 9)
          pos += 10
          if ((lflags & 0x80) != 0) pos += 3 * (1 << ((lflags & 7) + 1))
          pos += 1 // LZW min code size
          if (!skipSubBlocks()) return false
          images += 1
          if (images >= 2) return true
        case _ => return false
      }
    }
    false
  }

  private def readTable(b: Array[Byte], pos: Int, size: Int): Array[Int] = {
    val t = new Array[Int](size)
    var i = 0
    while (i < size) {
      t(i) = ((b(pos + 3 * i) & 0xff) << 16) |
        ((b(pos + 3 * i + 1) & 0xff) << 8) | (b(pos + 3 * i + 2) & 0xff)
      i += 1
    }
    t
  }

  private def decodeImage(bytes: Array[Byte], p0: Int,
                          globalTable: Array[Int],
                          screenW: Int, screenH: Int): Option[Netpbm.Image] = {
    def u8(p: Int): Int = bytes(p) & 0xff
    def le16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    if (p0 + 9 > bytes.length) return None
    val w = le16(p0 + 4); val h = le16(p0 + 6)
    val iFlags = u8(p0 + 8)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
        w.toLong * h > MaxPixels) return None
    // a frame exceeding the declared logical screen is malformed (the
    // first-frame profile ignores left/top offsets, stated)
    if (w > screenW || h > screenH) return None
    val interlaced = (iFlags & 0x40) != 0
    var pos = p0 + 9
    val table = if ((iFlags & 0x80) != 0) {
      val size = 1 << ((iFlags & 7) + 1)
      if (pos + 3 * size > bytes.length) return None
      val t = readTable(bytes, pos, size); pos += 3 * size; t
    } else globalTable
    if (table == null) return None // no palette anywhere

    if (pos >= bytes.length) return None
    val minCode = u8(pos); pos += 1
    if (minCode < 2 || minCode > 11) return None
    val clear = 1 << minCode
    val eoi = clear + 1

    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream(1 << 12)
    var done = false
    while (!done) {
      if (pos >= bytes.length) return None // chain cut by EOF
      val len = u8(pos); pos += 1
      if (len == 0) done = true
      else {
        if (pos + len > bytes.length) return None
        data.write(bytes, pos, len); pos += len
      }
    }
    val lzw = data.toByteArray

    // --- LZW decode ---
    val nPix = w * h
    val out = new Array[Byte](nPix) // palette indices
    var outN = 0
    // dictionary: per code, (prefix code, tail index); roots implicit
    val prefix = new Array[Int](4096)
    val tail = new Array[Byte](4096)
    var nextCode = eoi + 1
    var codeWidth = minCode + 1
    var prev = -1
    var bitPos = 0
    val totalBits = lzw.length * 8
    val suffix = new Array[Byte](4096) // expansion stack
    def expand(code0: Int): Boolean = { // write code0's string; false = bad
      var code = code0
      var sp = 0
      while (code >= clear + 2) { // dynamic entry
        if (code >= nextCode || sp >= 4096) return false
        suffix(sp) = tail(code); sp += 1; code = prefix(code)
      }
      if (code >= clear) return false // clear/eoi as data: malformed
      if (outN + sp + 1 > nPix) return false // pixel overflow
      out(outN) = code.toByte; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = suffix(sp); outN += 1 }
      true
    }
    def firstOf(code0: Int): Int = {
      var code = code0
      while (code >= clear + 2) code = prefix(code)
      code
    }
    var eoiSeen = false
    while (!eoiSeen) {
      // the shared width rule (encoder scaladoc): widen BEFORE the
      // read so the incoming code — which may be as large as nextCode
      // itself, the KwKwK case — is representable
      while (nextCode >= (1 << codeWidth) && codeWidth < 12) codeWidth += 1
      if (bitPos + codeWidth > totalBits) return None // stream cut
      // LSB-first read across byte boundaries
      var v = 0; var got = 0
      while (got < codeWidth) {
        val byteIx = (bitPos + got) >> 3
        val bitIx = (bitPos + got) & 7
        val take = math.min(codeWidth - got, 8 - bitIx)
        v |= (((lzw(byteIx) & 0xff) >> bitIx) & ((1 << take) - 1)) << got
        got += take
      }
      bitPos += codeWidth
      val code = v
      if (code == clear) {
        nextCode = eoi + 1; codeWidth = minCode + 1; prev = -1
      } else if (code == eoi) {
        eoiSeen = true
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        if (outN + 1 > nPix) return None
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        if (code > nextCode) return None // referencing the future
        if (code == nextCode) {
          // KwKwK: the entry being defined — prev's string + its head
          if (nextCode > 4095) return None
          prefix(nextCode) = prev; tail(nextCode) = firstOf(prev).toByte
          nextCode += 1
          if (!expand(code)) return None // expand the just-made entry
        } else {
          if (!expand(code)) return None
          if (nextCode <= 4095) {
            prefix(nextCode) = prev; tail(nextCode) = firstOf(code).toByte
            nextCode += 1
          }
        }
        prev = code
      }
    }
    if (outN != nPix) return None // shortfall vs the descriptor

    // interlaced streams transmit rows in the 4-pass order; remap
    // them back to display order before the palette lookup (the ONE
    // shared table the encoder writes with — [[interlaceRowOrder]] —
    // so the two directions cannot desynchronize)
    val ordered =
      if (!interlaced) out
      else {
        val o = new Array[Byte](nPix)
        val order = interlaceRowOrder(h)
        var t = 0
        while (t < h) {
          System.arraycopy(out, t * w, o, order(t) * w, w)
          t += 1
        }
        o
      }

    // palette → RGB
    val px = new Array[Byte](nPix * 3)
    var i = 0
    while (i < nPix) {
      val idx = ordered(i) & 0xff
      if (idx >= table.length) return None // index past the palette
      val c = table(idx)
      px(3 * i) = ((c >> 16) & 0xff).toByte
      px(3 * i + 1) = ((c >> 8) & 0xff).toByte
      px(3 * i + 2) = (c & 0xff).toByte
      i += 1
    }
    Some(Netpbm.Image(w, h, 255, px))
  }
}
