package graft.multimodal

/** Pure-JVM WebP LOSSLESS (VP8L) codec — the seventh codec arm. WebP
  * is a double-digit share of modern crawl images; the r13 table
  * sniffed it (RIFF…WEBP) but nothing decoded, so its media rows kept
  * bytes while dHash/features silently skipped them. VP8L is the
  * tractable half: prefix-coded ARGB with LZ77 backward references, a
  * color cache, meta prefix groups, and four spatial transforms
  * (predictor, color/cross-color, subtract-green, color-indexing with
  * pixel bundling) — RFC 9649's lossless bitstream, all implemented
  * here. Since r16 the LOSSY half decodes too: [[Vp8]] is a full
  * RFC 6386 keyframe decoder (bool coder, token trees, all intra
  * predictors, both loop filters) proven byte-identical to libwebp's
  * own output on a 118-vector parity corpus; [[decode]] routes the
  * `VP8 ` chunk through it and converts YUV 4:2:0 to RGB with the
  * repo's fixed-point full-range BT.601 (nearest-neighbor chroma
  * upsampling — the RGB step is presentation; codec parity is pinned
  * at the YUV planes, and a gray fixture with U=V=128 converts with
  * R=G=B=Y exactly, the q148 oracle device). Animations (r18): the
  * FIRST ANMF frame's bitstream decodes as the poster image (the
  * [[Gif]] frame-1 convention — one raster per blob) with
  * [[isAnimated]] as the flag; later frames stay out of profile.
  * VP8X files carrying no pixel chunk at all still fence.
  *
  * Decoder profile: RIFF walk to the VP8L chunk (plain or inside a
  * VP8X still), 14-bit dims, all four transforms in any legal
  * combination, color cache (1–11 bits), meta prefix codes (entropy
  * image), simple (1–2 symbol) and normal (code-length-coded) prefix
  * codes incl. the max_symbol short form, LZ77 with the 120-entry 2D
  * distance map. Alpha is DISCARDED like the PNG arm (compositing is
  * display policy, not decode). Fences (None): truncated streams,
  * over-subscribed or incomplete-at-read prefix codes, bad
  * signature/version, absurd dims, an ANMF frame with no bitstream.
  *
  * The ENCODER is the fixture generator (lossless ⇒ decode∘encode ==
  * identity is the whole-image oracle, the GIF/PNG discipline): flat
  * complete prefix codes (Kraft-exact by construction — literals at
  * 9/10 bits with the never-emitted length-symbol 256 absorbing the
  * remaining probability mass), optional subtract-green + uniform
  * predictor transforms (any mode 0–13, with the border rules
  * applied forward exactly as the decoder applies them inverse),
  * optional uniform cross-color transform, color-indexing with
  * bundling for ≤256-color images, color cache, and dist-1 LZ77 run
  * chunks — each decoder path has an encoder switch that round-trips
  * it bit-exactly.
  */
object Webp {

  private val MaxPixels = 1L << 26

  private final class Malformed extends RuntimeException

  // ---------------------------------------------------------------
  // Bit IO (LSB-first within bytes, the VP8L convention)
  // ---------------------------------------------------------------

  private final class Reader(bytes: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    def readBit(): Int = {
      if (pos >= end) throw new Malformed
      val v = (bytes(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  private[multimodal] final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var bit = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << bit
      bit += 1
      if (bit == 8) { out.write(cur); cur = 0; bit = 0 }
    }
    def writeBits(v: Int, n: Int): Unit = { // LSB-first
      var i = 0
      while (i < n) { writeBit((v >> i) & 1); i += 1 }
    }
    def writeCode(code: Int, len: Int): Unit = { // prefix code: MSB-first
      var i = len - 1
      while (i >= 0) { writeBit((code >> i) & 1); i -= 1 }
    }
    def result(): Array[Byte] = {
      if (bit > 0) { out.write(cur); cur = 0; bit = 0 }
      out.toByteArray
    }
  }

  // ---------------------------------------------------------------
  // Prefix codes (canonical, DEFLATE assignment; tree-walk decode)
  // ---------------------------------------------------------------

  /** Canonical codes from lengths: codes assigned in symbol order per
    * ascending length (the DEFLATE rule VP8L shares). Exposed for the
    * encoder, which writes the identical assignment.
    */
  private[multimodal] def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val codes = new Array[Int](lengths.length)
    if (maxLen == 0) return codes
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = nextCode(lengths(s)); nextCode(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  private final class PrefixCode(lengths: Array[Int]) {
    private val nSyms = lengths.count(_ > 0)
    private val single = if (nSyms == 1) lengths.indexWhere(_ > 0) else -1
    // binary tree as parallel arrays; node 0 = root, -1 = empty
    private val left = scala.collection.mutable.ArrayBuffer(-1)
    private val right = scala.collection.mutable.ArrayBuffer(-1)
    private val leaf = scala.collection.mutable.ArrayBuffer(-1)
    if (single < 0) {
      if (nSyms == 0) throw new Malformed
      val codes = canonicalCodes(lengths)
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) {
          if (len > 15) throw new Malformed
          var node = 0
          var i = len - 1
          while (i >= 0) {
            if (leaf(node) >= 0) throw new Malformed // over-subscribed
            val b = (codes(s) >> i) & 1
            val child = if (b == 0) left(node) else right(node)
            val next = if (child >= 0) child else {
              left += -1; right += -1; leaf += -1
              val n = leaf.length - 1
              if (b == 0) left(node) = n else right(node) = n
              n
            }
            node = next
            i -= 1
          }
          if (left(node) >= 0 || right(node) >= 0 || leaf(node) >= 0)
            throw new Malformed
          leaf(node) = s
        }
        s += 1
      }
    }
    def read(r: Reader): Int = {
      if (single >= 0) return single // 1-symbol code reads zero bits
      var node = 0
      while (leaf(node) < 0) {
        node = if (r.readBit() == 0) left(node) else right(node)
        if (node < 0) throw new Malformed // incomplete code hit a hole
      }
      leaf(node)
    }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code from the stream: simple (1–2 symbols) or normal
    * (code-length-coded lengths with 16/17/18 repeats and the
    * max_symbol short form).
    */
  private def readPrefixCode(r: Reader, alphabet: Int): PrefixCode = {
    val lengths = new Array[Int](alphabet)
    if (r.readBit() == 1) { // simple
      val nSym = r.readBit() + 1
      val s0 = if (r.readBit() == 1) r.readBits(8) else r.readBits(1)
      if (s0 >= alphabet) throw new Malformed
      if (nSym == 1) lengths(s0) = 15 // single: any nonzero marks it
      else {
        val s1 = r.readBits(8)
        if (s1 >= alphabet || s1 == s0) throw new Malformed
        lengths(s0) = 1; lengths(s1) = 1
      }
    } else {
      val clLens = new Array[Int](19)
      val nCl = 4 + r.readBits(4)
      var i = 0
      while (i < nCl) { clLens(ClOrder(i)) = r.readBits(3); i += 1 }
      val clCode = new PrefixCode(clLens)
      var maxSymbol =
        if (r.readBit() == 1) {
          val nbits = 2 + 2 * r.readBits(3)
          2 + r.readBits(nbits)
        } else alphabet
      var sym = 0
      var prev = 8 // spec: repeat-before-any-value repeats 8
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(r)
        if (cl < 16) {
          lengths(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (rep, v) = cl match {
            case 16 => (3 + r.readBits(2), prev)
            case 17 => (3 + r.readBits(3), 0)
            case _ => (11 + r.readBits(7), 0)
          }
          if (sym + rep > alphabet) throw new Malformed
          var k = 0
          while (k < rep) { lengths(sym) = v; sym += 1; k += 1 }
        }
      }
    }
    new PrefixCode(lengths)
  }

  // ---------------------------------------------------------------
  // LZ77 values and the 2D distance map
  // ---------------------------------------------------------------

  /** Length/distance prefix value: codes 0–3 are the values 1–4;
    * beyond, (2 + (code&1)) << extra + extra bits + 1.
    */
  private def lzValue(code: Int, r: Reader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.readBits(extra) + 1
    }

  private[multimodal] def lzCodeOf(v: Int): (Int, Int, Int) = {
    // (code, extraBits, extraValue) — the encoder-side inverse
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while ({
        val extra = (code - 2) >> 1
        val offset = (2 + (code & 1)) << extra
        !(v >= offset + 1 && v <= offset + (1 << extra))
      }) code += 1
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      (code, extra, v - offset - 1)
    }
  }

  /** The 120-entry short-distance neighbor map: codes 1–120 address
    * nearby (xoffset, yoffset) pixels; generated by the spec table's
    * ordering rule — all (x, y) with y in 0..8, x in −8..8 that
    * address an earlier pixel, sorted by squared euclidean distance,
    * ties by |x| ascending then positive x first — and pinned against
    * the RFC's literal table prefix in the spec suite.
    */
  private[graft] val DistMap: Array[(Int, Int)] = {
    val cand = for {
      y <- 0 to 8; x <- -8 to 8
      if y > 0 || x > 0
    } yield (x, y)
    cand.sortBy { case (x, y) =>
      (x * x + y * y, math.abs(x), if (x >= 0) 0 else 1)
    }.take(120).toArray
  }

  private def distFromCode(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val (x, y) = DistMap(code - 1)
      math.max(y * xsize + x, 1)
    }

  // ---------------------------------------------------------------
  // Entropy-coded images
  // ---------------------------------------------------------------

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Read one entropy-coded image: color-cache info, (main only) meta
    * prefix codes, prefix-code groups, then the LZ77/literal/cache
    * pixel stream into an ARGB array.
    */
  private def readEntropy(r: Reader, w: Int, h: Int,
                          isMain: Boolean): Array[Int] = {
    val cacheBits = if (r.readBit() == 1) r.readBits(4) else 0
    if (cacheBits > 11) throw new Malformed
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    var metaBits = 0
    var metaImg: Array[Int] = null
    var nGroups = 1
    if (isMain && r.readBit() == 1) {
      metaBits = r.readBits(3) + 2
      metaImg = readEntropy(r, subSize(w, metaBits), subSize(h, metaBits),
        isMain = false)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        val m = (metaImg(i) >> 8) & 0xffff
        if (m > mx) mx = m
        i += 1
      }
      nGroups = mx + 1
      if (nGroups > 1024) throw new Malformed
    }
    val greenAlpha = 256 + 24 + cacheSize
    val groups = Array.fill(nGroups)(Array(
      readPrefixCode(r, greenAlpha), readPrefixCode(r, 256),
      readPrefixCode(r, 256), readPrefixCode(r, 256),
      readPrefixCode(r, 40)))
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    val pix = new Array[Int](w * h)
    val metaW = if (metaImg != null) subSize(w, metaBits) else 0
    var pos = 0
    while (pos < w * h) {
      val g = if (metaImg == null) groups(0)
      else {
        val x = pos % w; val y = pos / w
        groups((metaImg((y >> metaBits) * metaW + (x >> metaBits)) >> 8) & 0xffff)
      }
      val green = g(0).read(r)
      if (green < 256) {
        val red = g(1).read(r); val blue = g(2).read(r)
        val alpha = g(3).read(r)
        val argb = (alpha << 24) | (red << 16) | (green << 8) | blue
        pix(pos) = argb; cacheInsert(argb); pos += 1
      } else if (green < 280) {
        val length = lzValue(green - 256, r)
        val distCode = lzValue(g(4).read(r), r)
        val dist = distFromCode(distCode, w)
        if (dist <= 0 || dist > pos || pos + length > w * h)
          throw new Malformed
        var k = 0
        while (k < length) {
          val v = pix(pos - dist)
          pix(pos) = v; cacheInsert(v); pos += 1
          k += 1
        }
      } else {
        if (cache == null || green - 280 >= cacheSize) throw new Malformed
        pix(pos) = cache(green - 280); pos += 1
      }
    }
    pix
  }

  // ---------------------------------------------------------------
  // Transforms (read + inverse)
  // ---------------------------------------------------------------

  private final case class Transform(kind: Int, bits: Int,
                                     data: Array[Int], pal: Array[Int])

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2, SIMD-free
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modular add
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val ag = (((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
    (ag << 8) | rb
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def select(l: Int, t: Int, tl: Int): Int = {
    def c(p: Int, s: Int) = (p >>> s) & 0xff
    var pl = 0; var pt = 0
    var s = 0
    while (s < 32) {
      val p = c(l, s) + c(t, s) - c(tl, s)
      pl += math.abs(p - c(l, s)); pt += math.abs(p - c(t, s))
      s += 8
    }
    if (pl < pt) l else t
  }

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var s = 0
    while (s < 32) {
      val v = clamp(((l >>> s) & 0xff) + ((t >>> s) & 0xff) - ((tl >>> s) & 0xff))
      out |= v << s
      s += 8
    }
    out
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val a = avg2(l, t)
    var out = 0
    var s = 0
    while (s < 32) {
      val ac = (a >>> s) & 0xff
      val v = clamp(ac + (ac - ((tl >>> s) & 0xff)) / 2)
      out |= v << s
      s += 8
    }
    out
  }

  /** The 14 predictors (mode 0–13) from reconstructed neighbors;
    * exposed to the encoder, which subtracts exactly this.
    */
  private[multimodal] def predict(mode: Int, l: Int, t: Int, tl: Int,
                                  tr: Int): Int = mode match {
    case 0 => 0xff000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => avg2(avg2(l, tr), t)
    case 6 => avg2(l, tl)
    case 7 => avg2(l, t)
    case 8 => avg2(tl, t)
    case 9 => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => select(l, t, tl)
    case 12 => clampAddSubFull(l, t, tl)
    case _ => clampAddSubHalf(l, t, tl)
  }

  /** The effective predictor value at (x, y) under per-block mode
    * lookup and the border rules (top-left black, top row = L,
    * left column = T; TR at the right edge wraps to the current
    * row's first pixel — the quirk every implementation preserves).
    */
  private[multimodal] def predictAt(pix: Array[Int], w: Int, x: Int, y: Int,
                                    mode: Int): Int = {
    val pos = y * w + x
    if (x == 0 && y == 0) 0xff000000
    else if (y == 0) pix(pos - 1) // L
    else if (x == 0) pix(pos - w) // T
    else {
      val l = pix(pos - 1); val t = pix(pos - w); val tl = pix(pos - w - 1)
      val tr = pix(pos - w + 1) // x = w-1 reads the current row's first
      predict(mode, l, t, tl, tr)
    }
  }

  private def inverseTransform(tr: Transform, pix: Array[Int],
                               w: Int, h: Int): Array[Int] = tr.kind match {
    case 2 => // subtract green: add G back into R and B
      var i = 0
      while (i < pix.length) {
        val p = pix(i)
        val g = (p >>> 8) & 0xff
        val r = (((p >>> 16) & 0xff) + g) & 0xff
        val b = ((p & 0xff) + g) & 0xff
        pix(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
      pix
    case 0 => // predictor
      val bw = subSize(w, tr.bits)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val mode =
            (tr.data((y >> tr.bits) * bw + (x >> tr.bits)) >> 8) & 0xff
          if (mode > 13) throw new Malformed
          val pos = y * w + x
          pix(pos) = addPixels(pix(pos), predictAt(pix, w, x, y, mode))
          x += 1
        }
        y += 1
      }
      pix
    case 1 => // cross-color
      val bw = subSize(w, tr.bits)
      def d(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val e = tr.data((y >> tr.bits) * bw + (x >> tr.bits))
          val g2r = e & 0xff
          val g2b = (e >> 8) & 0xff
          val r2b = (e >> 16) & 0xff
          val pos = y * w + x
          val p = pix(pos)
          val g = (p >>> 8) & 0xff
          val red = (((p >>> 16) & 0xff) + d(g2r, g)) & 0xff
          val blue = ((p & 0xff) + d(g2b, g) + d(r2b, red)) & 0xff
          pix(pos) = (p & 0xff00ff00) | (red << 16) | blue
          x += 1
        }
        y += 1
      }
      pix
    case _ => // color indexing: unbundle + palette lookup
      val nPal = tr.pal.length
      val widthBits =
        if (nPal <= 2) 3 else if (nPal <= 4) 2 else if (nPal <= 16) 1 else 0
      val bpp = 8 >> widthBits
      val mask = (1 << bpp) - 1
      val packedW = subSize(w, widthBits)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val packed = pix(y * packedW + (x >> widthBits))
          val sub = x & ((1 << widthBits) - 1)
          val ix = ((packed >>> 8) >> (bpp * sub)) & mask
          out(y * w + x) = if (ix < nPal) tr.pal(ix) else 0
          x += 1
        }
        y += 1
      }
      out
  }

  // ---------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------

  /** Decode a WebP; None outside the profile (object scaladoc). */
  def decode(bytes: Array[Byte]): Option[Netpbm.Image] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  /** YUV 4:2:0 → RGB, fixed-point full-range BT.601 with
    * nearest-neighbor chroma upsampling — the repo's DEFINED
    * conversion (deterministic presentation; the codec-correctness
    * claim lives at the YUV planes, parity-pinned against libwebp).
    * U=V=128 yields R=G=B=Y exactly.
    */
  private def yuvToRgb(f: Vp8.Frame): Netpbm.Image = {
    val w = f.width; val h = f.height
    val uw = f.uvWidth
    val out = new Array[Byte](w * h * 3)
    def cl(v: Int): Byte =
      (if (v < 0) 0 else if (v > 255) 255 else v).toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yy = f.y(y * w + x) & 0xff
        val cu = (f.u((y >> 1) * uw + (x >> 1)) & 0xff) - 128
        val cv = (f.v((y >> 1) * uw + (x >> 1)) & 0xff) - 128
        val o = (y * w + x) * 3
        out(o) = cl(yy + ((91881 * cv + 32768) >> 16))
        out(o + 1) = cl(yy - ((22554 * cu + 46802 * cv + 32768) >> 16))
        out(o + 2) = cl(yy + ((116130 * cu + 32768) >> 16))
        x += 1
      }
      y += 1
    }
    Netpbm.Image(w, h, 255, out)
  }

  private def decodeImpl(bytes: Array[Byte]): Option[Netpbm.Image] = {
    def ascii(p: Int, s: String): Boolean =
      p + s.length <= bytes.length &&
        s.indices.forall(i => bytes(p + i) == s.charAt(i).toByte)
    def u32(p: Int): Long =
      ((bytes(p) & 0xffL)) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    if (bytes.length < 20 || !ascii(0, "RIFF") || !ascii(8, "WEBP"))
      return None
    // chunk walk to VP8L (lossless) or VP8 (lossy keyframe, r16).
    // Animations (r18): the FIRST ANMF frame's own bitstream decodes
    // — the poster image the dHash/near-dup/scrub faces should see —
    // and later frames stay out of profile (one raster per blob, the
    // Gif frame-1 convention); [[isAnimated]] carries the flag
    var p = 12
    var vp8lAt = -1
    var vp8lLen = 0
    var vp8At = -1
    var vp8Len = 0
    while (vp8lAt < 0 && vp8At < 0 && p + 8 <= bytes.length) {
      val size = u32(p + 4)
      if (size < 0 || size > Int.MaxValue) return None
      if (ascii(p, "VP8L")) { vp8lAt = p + 8; vp8lLen = size.toInt }
      else if (ascii(p, "VP8 ")) { vp8At = p + 8; vp8Len = size.toInt }
      else if (ascii(p, "ANMF")) {
        // 16-byte frame header (x/2, y/2, w-1, h-1, duration — 24-bit
        // each — plus the flags byte), then the frame's own subchunks
        // (optional ALPH, then VP8/VP8L). A lying inner size that
        // escapes the ANMF payload fences.
        val innerEnd = p + 8 + size.toInt
        if (innerEnd > bytes.length) return None
        var q = p + 8 + 16
        while (vp8lAt < 0 && vp8At < 0 && q + 8 <= innerEnd) {
          val isz = u32(q + 4)
          if (isz < 0 || isz > Int.MaxValue ||
            q + 8 + isz > innerEnd) return None
          if (ascii(q, "VP8L")) { vp8lAt = q + 8; vp8lLen = isz.toInt }
          else if (ascii(q, "VP8 ")) { vp8At = q + 8; vp8Len = isz.toInt }
          else q += 8 + isz.toInt + (isz.toInt & 1)
        }
        if (vp8lAt < 0 && vp8At < 0)
          return None // ANMF with no bitstream subchunk
      }
      else p += 8 + size.toInt + (size.toInt & 1) // ANIM/VP8X/meta: skip
    }
    if (vp8At >= 0) {
      if (vp8At + vp8Len > bytes.length) return None
      return Vp8.decode(bytes, vp8At, vp8Len).map(yuvToRgb)
    }
    if (vp8lAt < 0 || vp8lAt + vp8lLen > bytes.length) return None
    val end = vp8lAt + vp8lLen
    if ((bytes(vp8lAt) & 0xff) != 0x2f) return None // VP8L signature
    val r = new Reader(bytes, vp8lAt + 1, end)
    val w = r.readBits(14) + 1
    val h = r.readBits(14) + 1
    r.readBit() // alpha hint
    if (r.readBits(3) != 0) return None // version
    if (w.toLong * h > MaxPixels) return None

    // transforms, read in stream order (color indexing reduces the
    // coded width for everything after it)
    var curW = w
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    var seen = 0
    while (r.readBit() == 1) {
      val kind = r.readBits(2)
      if ((seen & (1 << kind)) != 0) throw new Malformed // dup transform
      seen |= 1 << kind
      kind match {
        case 2 => transforms += Transform(2, 0, null, null)
        case 0 | 1 =>
          val bits = r.readBits(3) + 2
          val data = readEntropy(r, subSize(curW, bits), subSize(h, bits),
            isMain = false)
          transforms += Transform(kind, bits, data, null)
        case _ =>
          val nPal = r.readBits(8) + 1
          val raw = readEntropy(r, nPal, 1, isMain = false)
          // palette pixels are delta-coded per channel
          val pal = new Array[Int](nPal)
          var i = 0
          var prev = 0
          while (i < nPal) {
            prev = addPixels(prev, raw(i)); pal(i) = prev; i += 1
          }
          val widthBits =
            if (nPal <= 2) 3 else if (nPal <= 4) 2
            else if (nPal <= 16) 1 else 0
          transforms += Transform(3, widthBits, null, pal)
          curW = subSize(curW, widthBits)
      }
    }

    var pix = readEntropy(r, curW, h, isMain = true)
    // inverse transforms in reverse read order. A transform operates
    // at the width that existed when it was READ — i.e. reduced only
    // by color-indexing transforms read BEFORE it (indexing shrinks
    // the coded width for everything after itself; its own inverse
    // restores the width it was declared at)
    var ti = transforms.length - 1
    while (ti >= 0) {
      val tr = transforms(ti)
      val wAtLevel = transforms.take(ti).foldLeft(w) { (acc, earlier) =>
        if (earlier.kind == 3) subSize(acc, earlier.bits) else acc
      }
      pix = inverseTransform(tr, pix, wAtLevel, h)
      ti -= 1
    }

    // ARGB → RGB (alpha discarded, the PNG-arm convention)
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val v = pix(i)
      px(3 * i) = ((v >>> 16) & 0xff).toByte
      px(3 * i + 1) = ((v >>> 8) & 0xff).toByte
      px(3 * i + 2) = (v & 0xff).toByte
      i += 1
    }
    Some(Netpbm.Image(w, h, 255, px))
  }

  // ---------------------------------------------------------------
  // Encode (fixture generator)
  // ---------------------------------------------------------------

  /** A flat COMPLETE green/red/blue/alpha/distance code set writer:
    * literal channels are 8-bit flat (256·2⁻⁸ = 1); the green
    * alphabet (280 + cache) can't be flat, so literals sit at 9 or 10
    * bits with cache entries and the run-length symbol where used and
    * the never-emitted length symbol 256 at depth 1 absorbing the
    * rest of the probability mass — Kraft-exact by construction, so
    * every code is complete and any conformant decoder accepts it.
    */
  private final class FlatCodes(wr: Writer, cacheBits: Int, runs: Boolean) {
    private val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greenLens: Array[Int] = {
      val a = new Array[Int](256 + 24 + cacheSize)
      val litLen = (cacheBits, runs) match {
        case (0, false) => 9
        case _ => 10
      }
      var i = 0
      while (i < 256) { a(i) = litLen; i += 1 }
      a(256) = 1 // filler symbol, never emitted
      if (runs) a(256 + 5) = if (cacheBits > 0) 3 else 2 // length sym for v∈{7,8}
      if (cacheBits > 0) {
        // 2^-1 + 256·2^-10 + (runs: 2^-3) + cache·L = 1
        val rem = 1.0 - 0.5 - 256.0 / 1024.0 - (if (runs) 0.125 else 0.0)
        // cacheSize entries at equal depth d: cacheSize·2^-d = rem
        val d = math.round(math.log(cacheSize / rem) / math.log(2.0)).toInt
        require(cacheSize * math.pow(2.0, -d) == rem,
          s"cache depth must close Kraft exactly (cacheBits=$cacheBits runs=$runs)")
        var c = 0
        while (c < cacheSize) { a(280 + c) = d; c += 1 }
      }
      a
    }
    private val greenCodes = canonicalCodes(greenLens)
    def green(sym: Int): Unit = wr.writeCode(greenCodes(sym), greenLens(sym))
    def byte(v: Int): Unit = wr.writeCode(v, 8) // flat 8-bit: code == value

    def writeHeaders(): Unit = {
      writeNormal(greenLens)
      // red, blue, alpha: flat 8-bit
      var i = 0
      while (i < 3) { writeFlat256(); i += 1 }
      // distance: simple 1-symbol code (13 when runs are emitted — the
      // prefix symbol whose value range holds 121, i.e. plain dist 1)
      writeSimple1(if (runs) 13 else 0)
    }

    /** dist-1 run chunk: length symbol for v∈{7,8} (code 5, one extra
      * bit) + plain-form distance 121 (code 13 + 5 extra bits of 24).
      */
    def runChunk(len: Int): Unit = {
      require(len == 7 || len == 8)
      green(256 + 5); wr.writeBits(len - 7, 1)
      // distance prefix symbol 13 comes from the simple code (0 bits)
      wr.writeBits(24, 5) // 96 + 24 + 1 = 121 → dist 121-120 = 1
    }

    private def writeSimple1(sym: Int): Unit = {
      wr.writeBit(1) // simple
      wr.writeBit(0) // one symbol
      wr.writeBit(1); wr.writeBits(sym, 8) // 8-bit symbol form
    }

    private def writeFlat256(): Unit = {
      // normal code: 256 × length 8 — CL code {8:1, 0:1}
      wr.writeBit(0) // normal
      writeClTable(Map(8 -> 1, 0 -> 1))
      wr.writeBit(0) // no max_symbol short form
      val cl = clCodes(Map(8 -> 1, 0 -> 1))
      var i = 0
      while (i < 256) { val (c, l) = cl(8); wr.writeCode(c, l); i += 1 }
      // remaining symbols default to 0 — but alphabet is exactly 256,
      // so nothing remains
    }

    private def writeNormal(lens: Array[Int]): Unit = {
      wr.writeBit(0) // normal
      val used = lens.distinct.sorted
      // CL code lengths: give every DISTINCT value-symbol a depth
      // closing Kraft exactly — the canonical complete shape for n
      // leaves: (2^k − n) leaves at depth k−1, the rest at k, with
      // k = ceil(log2 n); a lone symbol gets a dummy sibling
      val clLens: Map[Int, Int] =
        if (used.length == 1)
          Map(used.head -> 1, (if (used.head == 0) 8 else 0) -> 1)
        else {
          val n = used.length
          val k = 32 - Integer.numberOfLeadingZeros(n - 1)
          val m = (1 << k) - n
          used.zipWithIndex.map { case (s, i) =>
            s -> (if (i < m) k - 1 else k)
          }.toMap
        }
      writeClTable(clLens)
      wr.writeBit(0) // no max_symbol short form
      val cl = clCodes(clLens)
      lens.foreach { l => val (c, len) = cl(l); wr.writeCode(c, len) }
    }

    private def clCodes(clLens: Map[Int, Int]): Map[Int, (Int, Int)] = {
      val arr = new Array[Int](19)
      clLens.foreach { case (s, l) => arr(s) = l }
      val codes = canonicalCodes(arr)
      clLens.keys.map(s => s -> (codes(s), arr(s))).toMap
    }

    private def writeClTable(clLens: Map[Int, Int]): Unit = {
      // emit all 19 CL lengths in ClOrder (num_code_lengths = 19)
      wr.writeBits(19 - 4, 4)
      ClOrder.foreach(s => wr.writeBits(clLens.getOrElse(s, 0), 3))
    }
  }

  /** Encode RGB (alpha 255) as VP8L. Options are decoder-path
    * switches (object scaladoc): `subtractGreen`, a uniform
    * `predictor` mode (0–13, 16×16 blocks), a uniform `crossColor`
    * element ((g2r, g2b, r2b) int8 triple, 16×16 blocks), `palette`
    * (color indexing + bundling — requires ≤256 distinct colors;
    * exclusive with the other transforms here), `cacheBits` (a real
    * color cache), `runs` (dist-1 LZ77 chunks for repeated pixels),
    * `metaGroups` (two alternating 4×4-block prefix-code groups via a
    * real meta entropy image — the group-dispatch path).
    */
  def encode(img: Netpbm.Image, subtractGreen: Boolean = false,
             predictor: Option[Int] = None,
             crossColor: Option[(Int, Int, Int)] = None,
             palette: Boolean = false,
             cacheBits: Int = 0, runs: Boolean = false,
             metaGroups: Boolean = false): Array[Byte] = {
    require(img.maxVal == 255, "VP8L profile is 8-bit")
    require(img.width <= 16384 && img.height <= 16384, "14-bit dims")
    require(!palette || (!subtractGreen && predictor.isEmpty &&
      crossColor.isEmpty), "palette is exclusive here")
    require(!metaGroups || (cacheBits == 0 && !runs && !palette),
      "metaGroups composes with the transforms only")
    require(cacheBits >= 0 && cacheBits <= 11)
    val w = img.width; val h = img.height
    var argb = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      argb(i) = 0xff000000 | ((img.pixels(3 * i) & 0xff) << 16) |
        ((img.pixels(3 * i + 1) & 0xff) << 8) | (img.pixels(3 * i + 2) & 0xff)
      i += 1
    }
    val wr = new Writer()
    wr.writeBits(w - 1, 14); wr.writeBits(h - 1, 14)
    wr.writeBit(0) // alpha hint
    wr.writeBits(0, 3) // version

    var codedW = w
    var palArr: Array[Int] = null
    // transforms in read order; forward-apply in the same order
    if (subtractGreen) {
      wr.writeBit(1); wr.writeBits(2, 2)
      var k = 0
      while (k < argb.length) {
        val p = argb(k)
        val g = (p >>> 8) & 0xff
        val r2 = (((p >>> 16) & 0xff) - g) & 0xff
        val b2 = ((p & 0xff) - g) & 0xff
        argb(k) = (p & 0xff00ff00) | (r2 << 16) | b2
        k += 1
      }
    }
    crossColor.foreach { case (g2r, g2b, r2b) =>
      wr.writeBit(1); wr.writeBits(1, 2)
      wr.writeBits(2, 3) // size_bits = 4 → 16×16 blocks
      val e = 0xff000000 | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) |
        (g2r & 0xff)
      writeUniformSub(wr, subSize(w, 4), subSize(h, 4), e)
      def d(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
      var k = 0
      while (k < argb.length) {
        val p = argb(k)
        val g = (p >>> 8) & 0xff
        // forward: subtract what the decoder will add; RED first (the
        // decoder's blue delta uses the FINAL red, which is ours)
        val red0 = (p >>> 16) & 0xff
        val redF = (red0 - d(g2r, g)) & 0xff
        val blueF = ((p & 0xff) - d(g2b, g) - d(r2b, red0)) & 0xff
        argb(k) = (p & 0xff00ff00) | (redF << 16) | blueF
        k += 1
      }
      // NOTE the subtlety above: the decoder computes blue's r2b delta
      // from the RECONSTRUCTED red — which equals the original red0 —
      // so the forward pass must use red0 there, not redF
    }
    predictor.foreach { mode =>
      require(mode >= 0 && mode <= 13)
      wr.writeBit(1); wr.writeBits(0, 2)
      wr.writeBits(2, 3) // size_bits = 4 → 16×16 blocks
      writeUniformSub(wr, subSize(w, 4), subSize(h, 4),
        0xff000000 | ((mode & 0xff) << 8))
      // residuals in scan order against the RECONSTRUCTED (original)
      // neighbors — exactly what the decoder's inverse walks
      val res = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val pos = y * w + x
          val pred = predictAt(argb, w, x, y, mode)
          res(pos) = subPixels(argb(pos), pred)
          x += 1
        }
        y += 1
      }
      argb = res
    }
    if (palette) {
      val distinct = argb.distinct
      require(distinct.length <= 256, "palette needs ≤256 colors")
      palArr = distinct.sorted
      val widthBits =
        if (palArr.length <= 2) 3 else if (palArr.length <= 4) 2
        else if (palArr.length <= 16) 1 else 0
      wr.writeBit(1); wr.writeBits(3, 2)
      wr.writeBits(palArr.length - 1, 8)
      // palette subimage: delta-coded pixels
      val deltas = new Array[Int](palArr.length)
      var prev = 0
      var k = 0
      while (k < palArr.length) {
        deltas(k) = subPixels(palArr(k), prev); prev = palArr(k); k += 1
      }
      writeSmallSub(wr, deltas)
      // bundle indices into the reduced-width green image
      val lookup = palArr.zipWithIndex.toMap
      val bpp = 8 >> widthBits
      val packedW = subSize(w, widthBits)
      val packed = new Array[Int](packedW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val ix = lookup(argb(y * w + x))
          val pp = y * packedW + (x >> widthBits)
          val sub = x & ((1 << widthBits) - 1)
          packed(pp) |= 0xff000000 | ((ix << (bpp * sub)) << 8)
          x += 1
        }
        y += 1
      }
      argb = packed
      codedW = packedW
    }
    wr.writeBit(0) // end of transforms

    // main entropy image
    if (cacheBits > 0) { wr.writeBit(1); wr.writeBits(cacheBits, 4) }
    else wr.writeBit(0)
    if (metaGroups) {
      // META PREFIX CODES: 4×4 blocks alternate between two code
      // groups (identical flat codes — what the path proves is the
      // GROUP DISPATCH: the entropy image read, the (red<<8)|green
      // code extraction, the per-pixel block lookup)
      wr.writeBit(1)
      wr.writeBits(0, 3) // size_bits = 2 → 4-pixel blocks
      val metaW = subSize(codedW, 2); val metaH = subSize(h, 2)
      writeSmallSub(wr, Array.tabulate(metaW * metaH)(i =>
        0xff000000 | ((i % 2) << 8)))
      val fcs = Array(new FlatCodes(wr, 0, false), new FlatCodes(wr, 0, false))
      fcs(0).writeHeaders(); fcs(1).writeHeaders()
      var pos = 0
      while (pos < codedW * h) {
        val x = pos % codedW; val y = pos / codedW
        val g = fcs(((y >> 2) * metaW + (x >> 2)) % 2)
        val v = argb(pos)
        g.green((v >>> 8) & 0xff)
        g.byte((v >>> 16) & 0xff)
        g.byte(v & 0xff)
        g.byte((v >>> 24) & 0xff)
        pos += 1
      }
      val payload0 = Array[Byte](0x2f) ++ wr.result()
      return riff(payload0)
    }
    wr.writeBit(0) // no meta prefix codes
    val fc = new FlatCodes(wr, cacheBits, runs)
    fc.writeHeaders()
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val cacheSet = if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    def cacheIx(v: Int): Int = (0x1e35a7bd * v) >>> (32 - cacheBits)
    var pos = 0
    val n = codedW * h
    while (pos < n) {
      // dist-1 run chunk when the previous pixel repeats ≥7 times
      var run = 0
      if (runs && pos > 0) {
        while (run < 8 && pos + run < n && argb(pos + run) == argb(pos - 1))
          run += 1
      }
      if (run >= 7) {
        fc.runChunk(run)
        if (cache != null) {
          val v = argb(pos) // all copied pixels equal argb(pos-1)
          cache(cacheIx(v)) = v; cacheSet(cacheIx(v)) = true
        }
        pos += run
      } else {
        val v = argb(pos)
        val ci = if (cache != null) cacheIx(v) else -1
        if (cache != null && cacheSet(ci) && cache(ci) == v)
          fc.green(280 + ci)
        else {
          fc.green((v >>> 8) & 0xff)
          fc.byte((v >>> 16) & 0xff)
          fc.byte(v & 0xff)
          fc.byte((v >>> 24) & 0xff)
          if (cache != null) { cache(ci) = v; cacheSet(ci) = true }
        }
        pos += 1
      }
    }
    val payload = Array[Byte](0x2f) ++ wr.result()
    riff(payload)
  }

  private def subPixels(a: Int, b: Int): Int = {
    // packed per-channel modular subtract: unlike the packed ADD
    // (where a channel sum ≤ 0x1FE cannot reach the next channel's
    // bits), a subtract BORROWS downward without bound — the 0xff
    // bias below each channel absorbs the borrow so blue can never
    // bleed −1 into red, nor green into alpha
    val ag = 0x00ff00ff + (a & 0xff00ff00) - (b & 0xff00ff00)
    val rb = 0xff00ff00 + (a & 0x00ff00ff) - (b & 0x00ff00ff)
    (ag & 0xff00ff00) | (rb & 0x00ff00ff)
  }

  /** A uniform-pixel subimage: no cache, SIMPLE 1-symbol codes for
    * every channel (zero bits per pixel — and real coverage of the
    * simple-code reader).
    */
  private def writeUniformSub(wr: Writer, w: Int, h: Int, pixel: Int): Unit = {
    wr.writeBit(0) // no color cache
    def simple1(sym: Int): Unit = {
      wr.writeBit(1); wr.writeBit(0)
      wr.writeBit(1); wr.writeBits(sym, 8)
    }
    simple1((pixel >>> 8) & 0xff) // green
    simple1((pixel >>> 16) & 0xff) // red
    simple1(pixel & 0xff) // blue
    simple1((pixel >>> 24) & 0xff) // alpha
    simple1(0) // distance (unused)
    // zero bits per pixel: nothing further to write
  }

  /** A small general subimage (the palette): flat 9-bit literal green
    * + flat byte channels, no cache, no runs.
    */
  private def writeSmallSub(wr: Writer, pix: Array[Int]): Unit = {
    wr.writeBit(0) // no color cache
    val fc = new FlatCodes(wr, 0, false)
    fc.writeHeaders()
    pix.foreach { v =>
      fc.green((v >>> 8) & 0xff)
      fc.byte((v >>> 16) & 0xff)
      fc.byte(v & 0xff)
      fc.byte((v >>> 24) & 0xff)
    }
  }

  /** True iff the container declares animation (an ANIM or ANMF
    * chunk anywhere in the top-level walk) — the `is_animated` flag
    * beside [[decode]]'s poster frame. Malformed walks read false:
    * the probe answers "declared animated", not "valid".
    */
  def isAnimated(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 20) return false
    def ascii(p: Int, s: String): Boolean =
      p + s.length <= bytes.length &&
        s.indices.forall(i => bytes(p + i) == s.charAt(i).toByte)
    if (!ascii(0, "RIFF") || !ascii(8, "WEBP")) return false
    var p = 12
    while (p + 8 <= bytes.length) {
      if (ascii(p, "ANIM") || ascii(p, "ANMF")) return true
      val size = ((bytes(p + 4) & 0xffL)) | ((bytes(p + 5) & 0xffL) << 8) |
        ((bytes(p + 6) & 0xffL) << 16) | ((bytes(p + 7) & 0xffL) << 24)
      if (size < 0 || size > Int.MaxValue) return false
      p += 8 + size.toInt + (size.toInt & 1)
    }
    false
  }

  /** An ANIMATED WebP fixture: VP8X (animation flag, canvas dims) +
    * ANIM (background, infinite loop) + one ANMF per frame, each
    * embedding the frame's own [[encode]] VP8L bitstream at offset
    * (0,0). [[decode]] of the result must return `frames.head`
    * exactly (lossless poster-frame identity — the q128 oracle
    * device extended to the animated container), and [[isAnimated]]
    * must read true.
    */
  def encodeAnimated(frames: Seq[Netpbm.Image],
                     durationMs: Int = 100): Array[Byte] = {
    require(frames.nonEmpty, "an animation carries at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    def u24(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte)
    def chunk(t: String, payload: Array[Byte]): Unit = {
      tag(t); le32(payload.length)
      out.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) out.write(0)
    }
    val cw = frames.map(_.width).max
    val ch = frames.map(_.height).max
    // chunks first (into `out`), RIFF header prepended once the total
    // size is known
    chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ u24(cw - 1) ++ u24(ch - 1))
    chunk("ANIM", Array[Byte](0, 0, 0, 0, 0, 0)) // bg ARGB + loop 0
    frames.foreach { f =>
      val still = encode(f)
      // a still is exactly RIFF header (12) + the VP8L chunk (+pad)
      val inner = java.util.Arrays.copyOfRange(still, 12, still.length)
      val hdr = u24(0) ++ u24(0) ++ u24(f.width - 1) ++
        u24(f.height - 1) ++ u24(durationMs) :+ 0.toByte
      chunk("ANMF", hdr ++ inner)
    }
    val chunks = out.toByteArray
    out.reset()
    tag("RIFF"); le32(4 + chunks.length); tag("WEBP")
    out.write(chunks, 0, chunks.length)
    out.toByteArray
  }

  private def riff(vp8l: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vp8l.length + 24)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    val padded = vp8l.length + (vp8l.length & 1)
    tag("RIFF"); le32(4 + 8 + padded); tag("WEBP")
    tag("VP8L"); le32(vp8l.length)
    out.write(vp8l, 0, vp8l.length)
    if ((vp8l.length & 1) == 1) out.write(0)
    out.toByteArray
  }
}
