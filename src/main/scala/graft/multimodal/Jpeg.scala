package graft.multimodal

/** Pure-JVM baseline JPEG codec — the sixth codec arm and the one
  * covering the format that dominates every real crawl's image bytes.
  * JPEG is LOSSY, so the whole-image round-trip oracle the lossless
  * arms use (q91/q124/q125) cannot apply in general — but an 8×8
  * block of ONE constant value survives DCT → quant-1 → IDCT exactly
  * (its transform is a single integral DC coefficient; every AC is
  * zero), so a raster tiled from constant blocks round-trips
  * BIT-EXACTLY through the full real machinery — Huffman coding, DC
  * differentials, zigzag, dequantization, the IDCT — and that is the
  * q126 oracle device. Lossy-path fidelity on arbitrary content is
  * spec-pinned separately with measured error bounds.
  *
  * DECODER profile — baseline sequential DCT (SOF0/SOF1) AND
  * progressive DCT (SOF2, Huffman): spectral selection, successive
  * approximation (DC and AC first + refinement scans, EOBRUN), 8-bit,
  * 1-component grayscale or 3-component YCbCr at any sampling whose
  * factors divide the max (4:4:4, 4:2:0, 4:2:2, 4:1:1 …), restart
  * markers (common in crawl JPEGs), byte-stuffing, APPn/COM skipped.
  * A third or more of crawl JPEGs are progressive — the r13 fence on
  * SOF2 silently dropped their dHash/features coverage; the
  * progressive path decodes scans into per-component COEFFICIENT
  * grids (successive scans refine in place) and runs the shared
  * dequant/IDCT/compose once at EOI, so both paths produce identical
  * pixels for identical quantized coefficients (the spec property the
  * fixture tests pin). Fences (None, the codec-family convention):
  * arithmetic coding, hierarchical and lossless SOFs, 12-bit
  * precision, 16-bit quant tables, 4-component CMYK, malformed
  * Huffman streams (codes past the table, coefficient overrun),
  * malformed scan scripts (an interleaved AC scan, Se<Ss), truncated
  * segments or entropy data, absurd dimensions.
  *
  * ENCODER (the fixture generator): grayscale or YCbCr color at 4:4:4
  * or 4:2:0, caller-chosen quant value (1 = near-lossless, the oracle
  * setting), canonical self-generated Huffman tables (fixed-width —
  * 12×4-bit DC, 162×8-bit AC, the all-ones code left unused as the
  * spec requires; any conformant decoder reads them, compression
  * ratio is irrelevant to a fixture writer). AC coefficients clamp to
  * ±1023 (baseline's category-10 ceiling; an adversarial checkerboard
  * can exceed it by a hair — a bounded extra quantization error on
  * content no real image has). [[encodeProgressive]] emits the SAME
  * quantized coefficients through a real progressive scan script
  * (interleaved DC first Al=1 + DC refinement, then per component two
  * spectral bands × first/refinement AC scans with EOBRUN
  * accumulation and buffered correction bits — the jcphuff shape), so
  * decode(encodeProgressive(img)) == decode(encode(img)) pixel for
  * pixel, which is the progressive correctness oracle.
  */
object Jpeg {

  private val MaxDim = 1 << 16 // JPEG dims are u16 by format
  private val MaxPixels = 1L << 26

  /** Zigzag scan order: zigzag(k) = raster index of the k-th scanned
    * coefficient (public spec constant).
    */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64) // t(u*8+x) = cos((2x+1)uπ/16)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // ---------------------------------------------------------------
  // Huffman tables (canonical, from (BITS, HUFFVAL) exactly as DHT
  // carries them)
  // ---------------------------------------------------------------

  private final class HuffDecoder(bits: Array[Int], vals: Array[Byte]) {
    // spec F.2.2.3: mincode/maxcode/valptr per code length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(length: Int, code: Int): Int =
      vals(valPtr(length) + code - minCode(length)) & 0xff
  }

  /** Encoder-side canonical code assignment: code(i) for symbol i of
    * the (bits, vals) table — same walk as the decoder's.
    */
  private def encTable(bits: Array[Int], vals: Array[Byte]): (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256); val lens = new Array[Int](256)
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        codes(vals(k) & 0xff) = code; lens(vals(k) & 0xff) = l
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    (codes, lens)
  }

  // fixture tables: 12 DC symbols at 4 bits, 162 AC symbols at 8 bits
  // (codes 0..11 / 0..161 — the all-ones code stays unused)
  private val DcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate[Byte](12)(_.toByte)
  private val AcBits = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Byte] = {
    val v = scala.collection.mutable.ArrayBuffer[Byte](0x00) // EOB
    v += 0xF0.toByte // ZRL
    for (r <- 0 until 16; s <- 1 to 10) v += ((r << 4) | s).toByte
    v.toArray // 2 + 160 = 162
  }

  // ---------------------------------------------------------------
  // Encode
  // ---------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0; private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1); cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = { // pad with 1s (spec convention)
      while (cnt != 0) put(1, 1)
    }
  }

  private def fdctQuant(block: Array[Int], q: Int): Array[Int] = {
    val out = new Array[Int](64)
    // CONSTANT-block fast path (the q126 tiles and every flat region):
    // only the DC survives and it is exactly 8·v — the general
    // transform's AC terms cancel to float dust that rounds to 0, so
    // the shortcut is value-identical at any q where 8v/q avoids an
    // exact half (q = 1, the oracle setting, always qualifies)
    var const = true
    var ci = 1
    while (const && ci < 64) { const = block(ci) == block(0); ci += 1 }
    if (const) {
      var dc = math.floor(8.0 * block(0) / q + 0.5).toInt
      if (dc > 1023) dc = 1023; if (dc < -1023) dc = -1023
      out(0) = dc
      return out
    }
    // separable two-pass DCT: 2·8 MACs per coefficient, not 64
    val tmp = new Array[Double](64) // tmp(u*8+x) = Σ_y block(y,x)·cos(u,y)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var t = 0.0
        var y = 0
        while (y < 8) { t += block(y * 8 + x) * CosTable(u * 8 + y); y += 1 }
        tmp(u * 8 + x) = t
        x += 1
      }
      u += 1
    }
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sAcc = 0.0
        var x = 0
        while (x < 8) { sAcc += tmp(u * 8 + x) * CosTable(v * 8 + x); x += 1 }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        var qv = math.floor(0.25 * cu * cv * sAcc / q + 0.5).toInt
        if (qv > 1023) qv = 1023
        if (qv < -1023) qv = -1023 // baseline AC category ceiling
        out(u * 8 + v) = qv
        v += 1
      }
      u += 1
    }
    out
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  private def encodeBlock(bw: BitWriter, coefs: Array[Int], pred: Int,
                          dcCodes: (Array[Int], Array[Int]),
                          acCodes: (Array[Int], Array[Int])): Int = {
    val dc = coefs(0)
    val diff = dc - pred
    val t = category(diff)
    bw.put(dcCodes._1(t), dcCodes._2(t))
    if (t > 0) {
      val bitsV = if (diff >= 0) diff else diff + (1 << t) - 1
      bw.put(bitsV, t)
    }
    var run = 0
    var k = 1
    while (k < 64) {
      val coef = coefs(Zigzag(k))
      k += 1
      if (coef == 0) run += 1
      else {
        while (run >= 16) { bw.put(acCodes._1(0xF0), acCodes._2(0xF0)); run -= 16 }
        val s = category(coef)
        val sym = (run << 4) | s
        bw.put(acCodes._1(sym), acCodes._2(sym))
        val bitsV = if (coef >= 0) coef else coef + (1 << s) - 1
        bw.put(bitsV, s)
        run = 0
      }
    }
    if (run > 0) bw.put(acCodes._1(0x00), acCodes._2(0x00)) // EOB
    dc
  }

  /** Encode a grayscale plane (or one of Y/Cb/Cr) laid out row-major
    * at `w`×`h`, values 0..255, LEVEL-SHIFTED internally.
    */
  private def planeBlocks(plane: Array[Int], w: Int, h: Int,
                          bx: Int, by: Int): Array[Int] = {
    val block = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val sy = math.min(by * 8 + y, h - 1) // edge replicate
        val sx = math.min(bx * 8 + x, w - 1)
        block(y * 8 + x) = plane(sy * w + sx) - 128
        x += 1
      }
      y += 1
    }
    block
  }

  /** Encode RGB (or grayscale-replicated RGB) as a baseline JPEG.
    * `gray` emits a 1-component stream; otherwise YCbCr, 4:2:0 when
    * `subsample420` else 4:4:4. `quant` fills the whole quant table
    * (1 = the near-lossless oracle setting).
    */
  def encode(img: Netpbm.Image, gray: Boolean = true,
             quant: Int = 1, subsample420: Boolean = false,
             restartEvery: Int = 0): Array[Byte] = {
    require(img.maxVal == 255, "JPEG profile is 8-bit")
    require(quant >= 1 && quant <= 255, s"quant out of range: $quant")
    require(restartEvery >= 0 && restartEvery <= 0xffff,
      s"restart interval out of range: $restartEvery")
    require(img.width <= 0xffff && img.height <= 0xffff,
      s"JPEG dims are 16-bit: ${img.width}x${img.height}")
    val w = img.width; val h = img.height
    val (yP, cbP, crP) = colorPlanes(img, gray)
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 1 + 64) // DQT, one 8-bit table
    out.write(0x00) // Pq=0, Tq=0
    var k = 0
    while (k < 64) { out.write(quant); k += 1 }
    val nComp = if (gray) 1 else 3
    marker(0xC0); u16(8 + 3 * nComp) // SOF0
    out.write(8); u16(h); u16(w); out.write(nComp)
    if (gray) { out.write(1); out.write(0x11); out.write(0) }
    else {
      val yS = if (subsample420) 0x22 else 0x11
      out.write(1); out.write(yS); out.write(0)
      out.write(2); out.write(0x11); out.write(0)
      out.write(3); out.write(0x11); out.write(0)
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    dht(0, 0, DcBits, DcVals); dht(1, 0, AcBits, AcVals)
    if (restartEvery > 0) { marker(0xDD); u16(4); u16(restartEvery) }
    marker(0xDA); u16(6 + 2 * nComp) // SOS
    out.write(nComp)
    var c = 0
    while (c < nComp) { out.write(c + 1); out.write(0x00); c += 1 }
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl

    val dcT = encTable(DcBits, DcVals)
    val acT = encTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    var rstN = 0
    // byte-align (1-padded) and emit the next RSTn marker RAW — marker
    // bytes are never stuffed
    def restartMark(): Unit = {
      bw.flush()
      out.write(0xFF); out.write(0xD0 + rstN % 8); rstN += 1
    }
    if (gray) {
      val bw8 = (w + 7) / 8; val bh8 = (h + 7) / 8
      var pred = 0
      var mcuIdx = 0
      var by = 0
      while (by < bh8) {
        var bx = 0
        while (bx < bw8) {
          if (restartEvery > 0 && mcuIdx > 0 && mcuIdx % restartEvery == 0) {
            restartMark(); pred = 0
          }
          pred = encodeBlock(bw,
            fdctQuant(planeBlocks(yP, w, h, bx, by), quant), pred, dcT, acT)
          mcuIdx += 1
          bx += 1
        }
        by += 1
      }
    } else if (!subsample420) {
      // 4:4:4 interleaved: per MCU one block of each component
      val bw8 = (w + 7) / 8; val bh8 = (h + 7) / 8
      val preds = new Array[Int](3)
      val planes = Array(yP, cbP, crP)
      var mcuIdx = 0
      var by = 0
      while (by < bh8) {
        var bx = 0
        while (bx < bw8) {
          if (restartEvery > 0 && mcuIdx > 0 && mcuIdx % restartEvery == 0) {
            restartMark(); java.util.Arrays.fill(preds, 0)
          }
          mcuIdx += 1
          var ci = 0
          while (ci < 3) {
            preds(ci) = encodeBlock(bw,
              fdctQuant(planeBlocks(planes(ci), w, h, bx, by), quant),
              preds(ci), dcT, acT)
            ci += 1
          }
          bx += 1
        }
        by += 1
      }
    } else {
      // 4:2:0: per MCU 4 Y blocks (2×2), then Cb, Cr at half size
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val (cbS, crS) = subsampleHalf(cbP, crP, w, h)
      val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
      val preds = new Array[Int](3)
      var mcuIdx = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartEvery > 0 && mcuIdx > 0 && mcuIdx % restartEvery == 0) {
            restartMark(); java.util.Arrays.fill(preds, 0)
          }
          mcuIdx += 1
          var sub = 0
          while (sub < 4) { // Y blocks in raster order within the MCU
            val bx = mx * 2 + (sub % 2); val by = my * 2 + (sub / 2)
            preds(0) = encodeBlock(bw,
              fdctQuant(planeBlocks(yP, w, h, bx, by), quant),
              preds(0), dcT, acT)
            sub += 1
          }
          preds(1) = encodeBlock(bw,
            fdctQuant(planeBlocks(cbS, cw, ch, mx, my), quant),
            preds(1), dcT, acT)
          preds(2) = encodeBlock(bw,
            fdctQuant(planeBlocks(crS, cw, ch, mx, my), quant),
            preds(2), dcT, acT)
          mx += 1
        }
        my += 1
      }
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** RGB → (Y, Cb, Cr) planes (JFIF forward transform, rounded to
    * nearest); gray returns (luma, null, null) — shared by both
    * encoders so the quantized coefficients are identical whichever
    * scan script carries them.
    */
  private def colorPlanes(img: Netpbm.Image,
                          gray: Boolean): (Array[Int], Array[Int], Array[Int]) = {
    val w = img.width; val h = img.height
    val yP = new Array[Int](w * h)
    val cbP = if (gray) null else new Array[Int](w * h)
    val crP = if (gray) null else new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = img.pixels(3 * i) & 0xff
      val g = img.pixels(3 * i + 1) & 0xff
      val b = img.pixels(3 * i + 2) & 0xff
      if (gray) yP(i) = Netpbm.luma(r, g, b)
      else {
        yP(i) = clamp255(math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt)
        cbP(i) = clamp255(math.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5).toInt)
        crP(i) = clamp255(math.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5).toInt)
      }
      i += 1
    }
    (yP, cbP, crP)
  }

  /** 2×2 box-average chroma downsample (edge-replicated) — the 4:2:0
    * halves, shared by both encoders.
    */
  private def subsampleHalf(cbP: Array[Int], crP: Array[Int],
                            w: Int, h: Int): (Array[Int], Array[Int]) = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val cbS = new Array[Int](cw * ch); val crS = new Array[Int](cw * ch)
    var yy = 0
    while (yy < ch) {
      var xx = 0
      while (xx < cw) {
        var s1 = 0; var s2 = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val sy = math.min(2 * yy + dy, h - 1)
            val sx = math.min(2 * xx + dx, w - 1)
            s1 += cbP(sy * w + sx); s2 += crP(sy * w + sx)
            dx += 1
          }
          dy += 1
        }
        cbS(yy * cw + xx) = (s1 + 2) / 4; crS(yy * cw + xx) = (s2 + 2) / 4
        xx += 1
      }
      yy += 1
    }
    (cbS, crS)
  }

  // progressive fixture AC table: the 162 sequential symbols PLUS the
  // EOBRUN symbols (r<<4 | 0) for r = 1..14 — 176 codes at 8 bits,
  // the all-ones code still unused
  private val AcBitsProg = Array(0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcValsProg: Array[Byte] =
    AcVals ++ (1 to 14).map(r => (r << 4).toByte)

  /** Encode the SAME quantized coefficients as [[encode]] through a
    * real progressive (SOF2) scan script: interleaved DC first scan at
    * Al=1 + DC refinement, then per component two spectral bands
    * (1–5, 6–63) × AC first (Al=1) / AC refinement (Ah=1, Al=0) —
    * successive approximation, EOBRUN accumulation with buffered
    * correction bits (the jcphuff shape), optional restart markers in
    * every scan. decode(encodeProgressive(img)) equals
    * decode(encode(img)) pixel for pixel — the progressive
    * correctness oracle (identical coefficients, different transport).
    */
  def encodeProgressive(img: Netpbm.Image, gray: Boolean = true,
                        quant: Int = 1, subsample420: Boolean = false,
                        restartEvery: Int = 0): Array[Byte] = {
    require(img.maxVal == 255, "JPEG profile is 8-bit")
    require(quant >= 1 && quant <= 255, s"quant out of range: $quant")
    require(restartEvery >= 0 && restartEvery <= 0xffff,
      s"restart interval out of range: $restartEvery")
    require(img.width <= 0xffff && img.height <= 0xffff,
      s"JPEG dims are 16-bit: ${img.width}x${img.height}")
    val w = img.width; val h = img.height
    val (yP, cbP, crP) = colorPlanes(img, gray)
    val nComp = if (gray) 1 else 3

    // per-component geometry: plane, dims, sampling factors
    final case class PComp(plane: Array[Int], pw: Int, ph: Int,
                           hS: Int, vS: Int)
    val pcomps: Array[PComp] =
      if (gray) Array(PComp(yP, w, h, 1, 1))
      else if (!subsample420)
        Array(PComp(yP, w, h, 1, 1), PComp(cbP, w, h, 1, 1),
          PComp(crP, w, h, 1, 1))
      else {
        val (cbS, crS) = subsampleHalf(cbP, crP, w, h)
        val cw = (w + 1) / 2; val ch = (h + 1) / 2
        Array(PComp(yP, w, h, 2, 2), PComp(cbS, cw, ch, 1, 1),
          PComp(crS, cw, ch, 1, 1))
      }
    val hMax = pcomps.map(_.hS).max; val vMax = pcomps.map(_.vS).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val padBX = pcomps.map(c => mcusX * c.hS)
    val padBY = pcomps.map(c => mcusY * c.vS)
    // the component's own block counts — what AC (non-interleaved)
    // scans cover; padded blocks beyond them carry DC only, exactly
    // what the decoder walks
    val compBX = pcomps.map(c => (c.pw + 7) / 8)
    val compBY = pcomps.map(c => (c.ph + 7) / 8)

    // all quantized coefficient blocks up front (shared with the
    // sequential path by construction: same planeBlocks + fdctQuant)
    val grids: Array[Array[Array[Int]]] = Array.tabulate(nComp) { ci =>
      val c = pcomps(ci)
      Array.tabulate(padBX(ci) * padBY(ci)) { bi =>
        fdctQuant(planeBlocks(c.plane, c.pw, c.ph,
          bi % padBX(ci), bi / padBX(ci)), quant)
      }
    }

    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 2048)
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 1 + 64)
    out.write(0x00)
    var k0 = 0
    while (k0 < 64) { out.write(quant); k0 += 1 }
    marker(0xC2); u16(8 + 3 * nComp) // SOF2
    out.write(8); u16(h); u16(w); out.write(nComp)
    var c0 = 0
    while (c0 < nComp) {
      out.write(c0 + 1)
      out.write((pcomps(c0).hS << 4) | pcomps(c0).vS)
      out.write(0)
      c0 += 1
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    dht(0, 0, DcBits, DcVals); dht(1, 0, AcBitsProg, AcValsProg)
    if (restartEvery > 0) { marker(0xDD); u16(4); u16(restartEvery) }

    val dcT = encTable(DcBits, DcVals)
    val acT = encTable(AcBitsProg, AcValsProg)

    def sos(compIds: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xDA); u16(6 + 2 * compIds.length)
      out.write(compIds.length)
      compIds.foreach { id => out.write(id + 1); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }

    // ---- DC scan (first or refinement), interleaved for color ----
    def dcScan(ah: Int, al: Int): Unit = {
      sos(0 until nComp, 0, 0, ah, al)
      val bw = new BitWriter(out)
      val preds = new Array[Int](nComp)
      var rstN = 0
      def restartMark(): Unit = {
        bw.flush()
        out.write(0xFF); out.write(0xD0 + rstN % 8); rstN += 1
        java.util.Arrays.fill(preds, 0)
      }
      def emit(ci: Int, off: Int): Unit = {
        val dc = grids(ci)(off)(0)
        if (ah == 0) {
          val v = dc >> al // arithmetic: (x>>1)<<1 | (x&1) == x
          val diff = v - preds(ci); preds(ci) = v
          val t = category(diff)
          bw.put(dcT._1(t), dcT._2(t))
          if (t > 0)
            bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        } else bw.put((dc >> al) & 1, 1)
      }
      if (nComp > 1) {
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0)
            restartMark()
          val mx = mcu % mcusX; val my = mcu / mcusX
          var ci = 0
          while (ci < nComp) {
            val c = pcomps(ci)
            var sub = 0
            while (sub < c.hS * c.vS) {
              val bx = mx * c.hS + (sub % c.hS)
              val by = my * c.vS + (sub / c.hS)
              emit(ci, by * padBX(ci) + bx)
              sub += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else {
        val nb = compBX(0) * compBY(0)
        var blk = 0
        while (blk < nb) {
          if (restartEvery > 0 && blk > 0 && blk % restartEvery == 0)
            restartMark()
          emit(0, (blk / compBX(0)) * padBX(0) + blk % compBX(0))
          blk += 1
        }
      }
      bw.flush()
    }

    // ---- AC scans: one component, one band ----
    def acScan(ci: Int, ss: Int, se: Int, ah: Int, al: Int): Unit = {
      sos(Seq(ci), ss, se, ah, al)
      val bw = new BitWriter(out)
      var eobrun = 0
      val beBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEob(): Unit = {
        if (eobrun > 0) {
          var g = 0; var tmp = eobrun
          while ({ tmp >>= 1; tmp != 0 }) g += 1
          bw.put(acT._1(g << 4), acT._2(g << 4))
          if (g > 0) bw.put(eobrun & ((1 << g) - 1), g)
          eobrun = 0
        }
        beBits.foreach(b => bw.put(b, 1)); beBits.clear()
      }
      var rstN = 0
      def restartMark(): Unit = {
        flushEob(); bw.flush()
        out.write(0xFF); out.write(0xD0 + rstN % 8); rstN += 1
      }
      val nb = compBX(ci) * compBY(ci)
      var blk = 0
      while (blk < nb) {
        if (restartEvery > 0 && blk > 0 && blk % restartEvery == 0)
          restartMark()
        val blkCoefs = grids(ci)((blk / compBX(ci)) * padBX(ci) +
          blk % compBX(ci))
        if (ah == 0) {
          // AC first: run-length over the band at this approximation
          var r = 0
          var k = ss
          while (k <= se) {
            val v = blkCoefs(Zigzag(k))
            val now = math.abs(v) >> al
            if (now == 0) r += 1
            else {
              flushEob()
              while (r > 15) {
                bw.put(acT._1(0xF0), acT._2(0xF0)); r -= 16
              }
              val s = category(now)
              bw.put(acT._1((r << 4) | s), acT._2((r << 4) | s))
              val c2 = if (v >= 0) now else -now
              bw.put(if (c2 >= 0) c2 else c2 + (1 << s) - 1, s)
              r = 0
            }
            k += 1
          }
          if (r > 0) {
            eobrun += 1
            if (eobrun == 0x7FFF) flushEob()
          }
        } else {
          // AC refinement (the jcphuff shape): newly-nonzero (now==1)
          // get (r,1)+sign, history coefficients buffer a correction
          // bit, ZRLs fold only up to the last new coefficient, and
          // whole blocks with nothing new ride the EOB run with their
          // correction bits buffered behind it
          var eobPos = ss - 1
          var k = ss
          while (k <= se) {
            val v = blkCoefs(Zigzag(k))
            if ((math.abs(v) >> al) == 1) eobPos = k
            k += 1
          }
          var r = 0
          val brBits = scala.collection.mutable.ArrayBuffer.empty[Int]
          k = ss
          while (k <= se) {
            val v = blkCoefs(Zigzag(k))
            val now = math.abs(v) >> al
            if (now == 0) r += 1
            else {
              while (r > 15 && k <= eobPos) {
                flushEob()
                bw.put(acT._1(0xF0), acT._2(0xF0)); r -= 16
                brBits.foreach(b => bw.put(b, 1)); brBits.clear()
              }
              if (now > 1) brBits += (now & 1)
              else {
                flushEob()
                bw.put(acT._1((r << 4) | 1), acT._2((r << 4) | 1))
                bw.put(if (v < 0) 0 else 1, 1)
                brBits.foreach(b => bw.put(b, 1)); brBits.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || brBits.nonEmpty) {
            eobrun += 1
            beBits ++= brBits
            if (eobrun == 0x7FFF) flushEob()
          }
        }
        blk += 1
      }
      flushEob()
      bw.flush()
    }

    dcScan(ah = 0, al = 1)
    dcScan(ah = 1, al = 0)
    var ci = 0
    while (ci < nComp) {
      acScan(ci, 1, 5, ah = 0, al = 1)
      acScan(ci, 6, 63, ah = 0, al = 1)
      ci += 1
    }
    ci = 0
    while (ci < nComp) {
      acScan(ci, 1, 5, ah = 1, al = 0)
      acScan(ci, 6, 63, ah = 1, al = 0)
      ci += 1
    }
    marker(0xD9) // EOI
    out.toByteArray
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------

  private final case class Comp(id: Int, hS: Int, vS: Int, tq: Int) {
    var td = 0; var ta = 0
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0; private var cnt = 0

    /** Next bit; -1 when the stream ends at a marker/EOF. */
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= bytes.length) return -1
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) return -1
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else { pos -= 1; return -1 } // a marker ends the segment
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = bit(); if (b < 0) return -1
        v = (v << 1) | b; i += 1
      }
      v
    }

    /** Skip to the next marker and, if it is RSTn, consume it and
      * byte-align; true if an RST was consumed.
      */
    def restart(): Boolean = {
      cnt = 0
      while (pos + 1 < bytes.length) {
        if ((bytes(pos) & 0xff) == 0xFF) {
          val m = bytes(pos + 1) & 0xff
          if (m >= 0xD0 && m <= 0xD7) { pos += 2; return true }
          return false
        }
        pos += 1 // garbage before the marker: scan forward
      }
      false
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def idctBlock(coefs: Array[Int], qt: Array[Int],
                        out: Array[Int]): Unit = {
    // DC-ONLY fast path — the oracle-exactness path, so it replicates
    // the general accumulation's float ops BIT for BIT (adding exact
    // 0.0 terms is the identity; the surviving term's multiply order
    // matches the loop's cu·cv·deq·cos·cos with cos = 1.0): constant
    // tiles and every flat region of a real JPEG take it
    var acZero = true
    var k = 1
    while (acZero && k < 64) { acZero = coefs(k) == 0; k += 1 }
    if (acZero) {
      val s0 = InvSqrt2 * InvSqrt2 * (coefs(0).toDouble * qt(0)) * 1.0 * 1.0
      val v0 = clamp255(math.floor(0.25 * s0 + 0.5).toInt + 128)
      java.util.Arrays.fill(out, v0)
      return
    }
    val deq = new Array[Double](64) // cu·cv folded in for separability
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        deq(u * 8 + v) = cu * cv * coefs(u * 8 + v).toDouble * qt(u * 8 + v)
        v += 1
      }
      u += 1
    }
    // separable two-pass inverse: tmp(y,v) = Σ_u deq(u,v)·cos(u,y)
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var v = 0
      while (v < 8) {
        var t = 0.0
        var uu = 0
        while (uu < 8) { t += deq(uu * 8 + v) * CosTable(uu * 8 + y); uu += 1 }
        tmp(y * 8 + v) = t
        v += 1
      }
      y += 1
    }
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sAcc = 0.0
        var v = 0
        while (v < 8) { sAcc += tmp(y * 8 + v) * CosTable(v * 8 + x); v += 1 }
        out(y * 8 + x) = clamp255(math.floor(0.25 * sAcc + 0.5).toInt + 128)
        x += 1
      }
      y += 1
    }
  }

  /** True when the frame header is SOF2 (progressive DCT, Huffman) —
    * a cheap marker walk over the header segments; frame headers
    * precede every scan, so the walk stops at SOS/EOI. Malformed
    * framing returns false and the baseline path produces the fence.
    */
  private def hasSof2(bytes: Array[Byte]): Boolean = {
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xFF) return false
      val m = bytes(pos + 1) & 0xff
      if (m == 0xFF) pos += 1 // fill byte
      else if (m == 0xD9 || m == 0xDA) return false
      else if (m == 0xC2) return true
      else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        if (len < 2) return false
        pos += 2 + len
      }
    }
    false
  }

  /** Parse a JPEG — baseline sequential or progressive by frame
    * header; None on anything outside the profile (object scaladoc).
    */
  def decode(bytes: Array[Byte]): Option[Netpbm.Image] = {
    if (bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xFF || (bytes(1) & 0xff) != 0xD8) None
    else if (hasSof2(bytes)) decodeProgressive(bytes)
    else decodeBaseline(bytes)
  }

  private def decodeBaseline(bytes: Array[Byte]): Option[Netpbm.Image] = {
    if (bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xFF || (bytes(1) & 0xff) != 0xD8) return None
    def u8(p: Int) = bytes(p) & 0xff
    def u16(p: Int) = (u8(p) << 8) | u8(p + 1)

    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffDecoder](4)
    val acTables = new Array[HuffDecoder](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2
    var sosAt = -1

    while (sosAt < 0) {
      if (pos + 4 > bytes.length) return None
      if (u8(pos) != 0xFF) return None // marker desync
      var m = u8(pos + 1)
      while (m == 0xFF) { pos += 1; if (pos + 4 > bytes.length) return None; m = u8(pos + 1) }
      if (m == 0xD9) return None // EOI before any scan
      val len = u16(pos + 2)
      if (len < 2 || pos + 2 + len > bytes.length) return None
      val seg = pos + 4
      m match {
        case 0xDB => // DQT: possibly several tables
          var p = seg
          while (p < pos + 2 + len) {
            val pq = u8(p) >> 4; val tq = u8(p) & 15
            if (pq != 0 || tq > 3) return None // 16-bit tables: fence
            if (p + 65 > pos + 2 + len) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = u8(p + 1 + k); k += 1 }
            quantTables(tq) = t
            p += 65
          }
        case 0xC4 => // DHT: possibly several tables
          var p = seg
          while (p < pos + 2 + len) {
            val tc = u8(p) >> 4; val th = u8(p) & 15
            if (tc > 1 || th > 3) return None
            if (p + 17 > pos + 2 + len) return None
            val bits = Array.tabulate(16)(i => u8(p + 1 + i))
            val nVals = bits.sum
            if (nVals > 256 || p + 17 + nVals > pos + 2 + len) return None
            val vals = new Array[Byte](nVals)
            System.arraycopy(bytes, p + 17, vals, 0, nVals)
            val dec = new HuffDecoder(bits, vals)
            if (tc == 0) dcTables(th) = dec else acTables(th) = dec
            p += 17 + nVals
          }
        case 0xC0 | 0xC1 => // baseline / extended-sequential huffman
          if (len < 8) return None // short segment: fence BEFORE reads
          if (u8(seg) != 8) return None // 12-bit: fence
          h = u16(seg + 1); w = u16(seg + 3)
          val nf = u8(seg + 5)
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
              w.toLong * h > MaxPixels) return None
          if (nf != 1 && nf != 3) return None // CMYK etc: fence
          if (len != 8 + 3 * nf) return None
          comps = Array.tabulate(nf) { i =>
            val p = seg + 6 + 3 * i
            Comp(u8(p), u8(p + 1) >> 4, u8(p + 1) & 15, u8(p + 2))
          }
          if (comps.exists(c => c.hS < 1 || c.hS > 4 || c.vS < 1 ||
              c.vS > 4 || c.tq > 3)) return None
        case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
             0xCD | 0xCE | 0xCF =>
          return None // progressive/arithmetic/hierarchical: fence
        case 0xDD => // DRI
          if (len != 4) return None
          restartInterval = u16(seg)
        case 0xDA => // SOS
          if (comps == null) return None
          if (len < 3) return None // short segment: fence BEFORE reads
          val ns = u8(seg)
          if (ns != comps.length) return None // partial scans: fence
          if (len != 6 + 2 * ns) return None // declared vs actual size
          var i = 0
          while (i < ns) {
            val cs = u8(seg + 1 + 2 * i)
            val comp = comps.find(_.id == cs).getOrElse(return None)
            comp.td = u8(seg + 2 + 2 * i) >> 4
            comp.ta = u8(seg + 2 + 2 * i) & 15
            // table ids are 2-bit in baseline; a corrupt nibble would
            // index past the 4-slot table arrays (task death, not None)
            if (comp.td > 3 || comp.ta > 3) return None
            i += 1
          }
          sosAt = pos + 2 + len
        case _ => () // APPn, COM, unknown-but-framed: skip
      }
      pos += 2 + len
    }

    // sampling geometry. A single-component scan is NON-INTERLEAVED
    // (T.81 A.2.3): its MCU is ONE data unit and blocks walk the
    // component's own raster — declared sampling factors do not shape
    // the data order, so force 1x1 geometry (a grayscale file written
    // with 2x2 factors would otherwise decode block-permuted with a
    // wrong DC chain, silently)
    if (comps.length == 1) {
      val c = comps(0)
      val c1 = Comp(c.id, 1, 1, c.tq); c1.td = c.td; c1.ta = c.ta
      comps = Array(c1)
    }
    val hMax = comps.map(_.hS).max; val vMax = comps.map(_.vS).max
    if (comps.exists(c => hMax % c.hS != 0 || vMax % c.vS != 0)) return None
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planes = comps.map { c =>
      new Array[Int](mcusX * c.hS * 8 * mcusY * c.vS * 8)
    }
    val planeW = comps.map(c => mcusX * c.hS * 8)
    for (c <- comps) {
      if (quantTables(c.tq) == null) return None
      if (dcTables(c.td) == null || acTables(c.ta) == null) return None
    }

    val br = new BitReader(bytes, sosAt)
    def huffDecode(t: HuffDecoder): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        val b = br.bit(); if (b < 0) return -1
        code = (code << 1) | b; l += 1
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) &&
            code >= t.minCode(l)) return t.value(l, code)
      }
      -1
    }
    val preds = new Array[Int](comps.length)
    val coefs = new Array[Int](64)
    val pix = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None // missing RST: fence
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var sub = 0
        while (sub < c.hS * c.vS) {
          val bx = mx * c.hS + (sub % c.hS)
          val by = my * c.vS + (sub / c.hS)
          // --- one block ---
          java.util.Arrays.fill(coefs, 0)
          val t = huffDecode(dcTables(c.td)); if (t < 0 || t > 11) return None
          val dv = if (t == 0) 0 else { val b = br.bits(t); if (b < 0) return None; b }
          preds(ci) += extend(dv, t)
          coefs(0) = preds(ci)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = huffDecode(acTables(c.ta)); if (rs < 0) return None
            val r = rs >> 4; val s = rs & 15
            if (s == 0) {
              if (r == 0) eob = true
              else if (r == 15) k += 16
              else return None // invalid (r,0)
            } else {
              k += r
              if (k > 63) return None // coefficient overrun
              val b = br.bits(s); if (b < 0) return None
              coefs(Zigzag(k)) = extend(b, s)
              k += 1
            }
          }
          idctBlock(coefs, quantTables(c.tq), pix)
          // place into the component plane
          val pw = planeW(ci)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(ci)((by * 8 + yy) * pw + bx * 8 + xx) = pix(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          sub += 1
        }
        ci += 1
      }
      mcu += 1
    }

    Some(composePlanes(comps, planes, planeW, w, h, hMax, vMax))
  }

  /** Progressive (SOF2, Huffman) decode: every scan accumulates into
    * per-component COEFFICIENT grids — DC first scans store the
    * point-transformed differential chain (`pred << Al`), DC
    * refinements OR in one bit per block, AC first scans run the
    * band's run-length/EOBRUN grammar, AC refinements apply the
    * correction-bit algorithm (T.81 G.1.2.3 — newly-nonzero ±1<<Al
    * insertions plus history-coefficient corrections) — and the
    * shared dequant/IDCT/compose runs ONCE at EOI. Scan-script
    * validation per T.81: DC scans are Ss=0/Se=0 and may interleave;
    * AC scans are single-component with 1≤Ss≤Se≤63; successive
    * approximation needs Ah=0 or Ah=Al+1. Restart markers reset the
    * DC chain and EOBRUN exactly like the sequential path.
    */
  private def decodeProgressive(bytes: Array[Byte]): Option[Netpbm.Image] = {
    def u8(p: Int) = bytes(p) & 0xff
    def u16(p: Int) = (u8(p) << 8) | u8(p + 1)

    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffDecoder](4)
    val acTables = new Array[HuffDecoder](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var hMax = 1; var vMax = 1
    var mcusX = 0; var mcusY = 0
    var grids: Array[Array[Int]] = null // per comp: padded block grid × 64
    var gridBW: Array[Int] = null // padded grid width in blocks
    var compBX: Array[Int] = null // the component's OWN block counts —
    var compBY: Array[Int] = null // what non-interleaved scans walk
    var sawScan = false

    /** One scan's entropy-coded segment starting at `dataStart`;
      * returns the position of the next marker, or -1 on a fence.
      */
    def runScan(dataStart: Int, scanComps: Array[Int],
                ss: Int, se: Int, ah: Int, al: Int): Int = {
      val br = new BitReader(bytes, dataStart)
      def huffDecode(t: HuffDecoder): Int = {
        var code = 0; var l = 0
        while (l < 16) {
          val b = br.bit(); if (b < 0) return -1
          code = (code << 1) | b; l += 1
          if (t.maxCode(l) >= 0 && code <= t.maxCode(l) &&
              code >= t.minCode(l)) return t.value(l, code)
        }
        -1
      }
      val preds = new Array[Int](scanComps.length)
      var eobrun = 0
      var fenced = false

      def dcBlock(si: Int, ci: Int, off: Int): Unit = {
        val g = grids(ci)
        if (ah == 0) {
          val t = huffDecode(dcTables(comps(ci).td))
          if (t < 0 || t > 11) { fenced = true; return }
          val dv = if (t == 0) 0 else {
            val b = br.bits(t); if (b < 0) { fenced = true; return }; b
          }
          preds(si) += extend(dv, t)
          g(off) = preds(si) << al
        } else {
          val b = br.bit(); if (b < 0) { fenced = true; return }
          if (b == 1) g(off) |= (1 << al)
        }
      }

      def acBlockFirst(ci: Int, off: Int): Unit = {
        val g = grids(ci)
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var ended = false
        while (!ended && k <= se) {
          val rs = huffDecode(acTables(comps(ci).ta))
          if (rs < 0) { fenced = true; return }
          val r = rs >> 4; val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16
            else {
              eobrun = (1 << r) - 1
              if (r > 0) {
                val b = br.bits(r); if (b < 0) { fenced = true; return }
                eobrun += b
              }
              ended = true
            }
          } else {
            k += r
            if (k > se) { fenced = true; return } // band overrun
            val b = br.bits(s); if (b < 0) { fenced = true; return }
            g(off + Zigzag(k)) = extend(b, s) << al
            k += 1
          }
        }
      }

      def acBlockRefine(ci: Int, off: Int): Unit = {
        val g = grids(ci)
        val p1 = 1 << al; val m1 = -1 << al
        // correction bit over a history-nonzero coefficient (two's-
        // complement & p1 test matches the encoder's magnitude bits)
        def correct(z: Int): Boolean = {
          val b = br.bit(); if (b < 0) { fenced = true; return false }
          if (b == 1 && (g(off + z) & p1) == 0)
            g(off + z) += (if (g(off + z) >= 0) p1 else m1)
          true
        }
        var k = ss
        if (eobrun == 0) {
          var ended = false
          while (!ended && k <= se) {
            val rs = huffDecode(acTables(comps(ci).ta))
            if (rs < 0) { fenced = true; return }
            var r = rs >> 4; val s = rs & 15
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                eobrun = 1 << r
                if (r > 0) {
                  val b = br.bits(r); if (b < 0) { fenced = true; return }
                  eobrun += b
                }
                ended = true
              }
              // r == 15 (ZRL): pass over 16 zero-history coefficients
            } else {
              if (s != 1) { fenced = true; return } // refinement sends ±1 only
              val b = br.bit(); if (b < 0) { fenced = true; return }
              newVal = if (b == 1) p1 else m1
            }
            if (!ended) {
              var stop = false
              while (!stop && k <= se) {
                val z = Zigzag(k)
                if (g(off + z) != 0) {
                  if (!correct(z)) return
                  k += 1
                } else if (r == 0) stop = true
                else { r -= 1; k += 1 }
              }
              if (newVal != 0 && k <= se) g(off + Zigzag(k)) = newVal
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          // the EOB run still carries correction bits for every
          // history-nonzero coefficient in the rest of the band
          while (k <= se) {
            val z = Zigzag(k)
            if (g(off + z) != 0) { if (!correct(z)) return }
            k += 1
          }
          eobrun -= 1
        }
      }

      def atRestart(unit: Int): Boolean = {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!br.restart()) { fenced = true; return false }
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }
        true
      }

      if (scanComps.length > 1) {
        // interleaved (DC scans only — validated by the caller): the
        // frame MCU walk, each scan component contributing hS×vS blocks
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus && !fenced) {
          if (!atRestart(mcu)) return -1
          val mx = mcu % mcusX; val my = mcu / mcusX
          var si = 0
          while (si < scanComps.length && !fenced) {
            val ci = scanComps(si)
            val c = comps(ci)
            var sub = 0
            while (sub < c.hS * c.vS && !fenced) {
              val bx = mx * c.hS + (sub % c.hS)
              val by = my * c.vS + (sub / c.hS)
              dcBlock(si, ci, (by * gridBW(ci) + bx) * 64)
              sub += 1
            }
            si += 1
          }
          mcu += 1
        }
      } else {
        // non-interleaved: walk the component's own block raster
        val ci = scanComps(0)
        val nb = compBX(ci) * compBY(ci)
        var blk = 0
        while (blk < nb && !fenced) {
          if (!atRestart(blk)) return -1
          val bx = blk % compBX(ci); val by = blk / compBX(ci)
          val off = (by * gridBW(ci) + bx) * 64
          if (ss == 0) dcBlock(0, ci, off)
          else if (ah == 0) acBlockFirst(ci, off)
          else acBlockRefine(ci, off)
          blk += 1
        }
      }
      if (fenced) return -1
      // skip to the next non-RST marker (the scan may end mid-byte;
      // stray RSTs and stuffed FFs are entropy-layer bytes)
      var p = br.pos
      while (p + 1 < bytes.length) {
        if ((bytes(p) & 0xff) == 0xFF) {
          val m = bytes(p + 1) & 0xff
          if (m == 0x00) p += 2
          else if (m >= 0xD0 && m <= 0xD7) p += 2
          else return p
        } else p += 1
      }
      -1 // no terminating marker: truncated
    }

    var pos = 2
    var eoi = false
    while (!eoi) {
      if (pos + 2 > bytes.length) return None
      if (u8(pos) != 0xFF) return None
      var m = u8(pos + 1)
      while (m == 0xFF) {
        pos += 1; if (pos + 2 > bytes.length) return None; m = u8(pos + 1)
      }
      if (m == 0xD9) eoi = true
      else {
        if (pos + 4 > bytes.length) return None
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        var nextPos = pos + 2 + len
        m match {
          case 0xDB =>
            var p = seg
            while (p < pos + 2 + len) {
              val pq = u8(p) >> 4; val tq = u8(p) & 15
              if (pq != 0 || tq > 3) return None
              if (p + 65 > pos + 2 + len) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = u8(p + 1 + k); k += 1 }
              quantTables(tq) = t
              p += 65
            }
          case 0xC4 =>
            var p = seg
            while (p < pos + 2 + len) {
              val tc = u8(p) >> 4; val th = u8(p) & 15
              if (tc > 1 || th > 3) return None
              if (p + 17 > pos + 2 + len) return None
              val bits = Array.tabulate(16)(i => u8(p + 1 + i))
              val nVals = bits.sum
              if (nVals > 256 || p + 17 + nVals > pos + 2 + len) return None
              val vals = new Array[Byte](nVals)
              System.arraycopy(bytes, p + 17, vals, 0, nVals)
              val dec = new HuffDecoder(bits, vals)
              if (tc == 0) dcTables(th) = dec else acTables(th) = dec
              p += 17 + nVals
            }
          case 0xC2 =>
            if (comps != null) return None // a second frame header
            if (len < 8) return None
            if (u8(seg) != 8) return None // 12-bit: fence
            h = u16(seg + 1); w = u16(seg + 3)
            val nf = u8(seg + 5)
            if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
                w.toLong * h > MaxPixels) return None
            if (nf != 1 && nf != 3) return None
            if (len != 8 + 3 * nf) return None
            comps = Array.tabulate(nf) { i =>
              val p = seg + 6 + 3 * i
              Comp(u8(p), u8(p + 1) >> 4, u8(p + 1) & 15, u8(p + 2))
            }
            if (comps.exists(c => c.hS < 1 || c.hS > 4 || c.vS < 1 ||
                c.vS > 4 || c.tq > 3)) return None
            // single-component image: every scan is non-interleaved, so
            // sampling factors never shape the data order (the T.81
            // A.2.3 rule the baseline path pins)
            if (comps.length == 1) {
              val c = comps(0)
              comps = Array(Comp(c.id, 1, 1, c.tq))
            }
            hMax = comps.map(_.hS).max; vMax = comps.map(_.vS).max
            if (comps.exists(c => hMax % c.hS != 0 || vMax % c.vS != 0))
              return None
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            grids = comps.map(c =>
              new Array[Int](mcusX * c.hS * mcusY * c.vS * 64))
            gridBW = comps.map(c => mcusX * c.hS)
            compBX = comps.map(c => ((w * c.hS + hMax - 1) / hMax + 7) / 8)
            compBY = comps.map(c => ((h * c.vS + vMax - 1) / vMax + 7) / 8)
          case 0xC0 | 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
               0xCB | 0xCD | 0xCE | 0xCF =>
            return None // mixed frame types / arithmetic / hierarchical
          case 0xDD =>
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xDA =>
            if (comps == null) return None
            if (len < 3) return None
            val ns = u8(seg)
            if (ns < 1 || ns > comps.length) return None
            if (len != 6 + 2 * ns) return None
            val scanComps = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cs = u8(seg + 1 + 2 * i)
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              comps(ci).td = u8(seg + 2 + 2 * i) >> 4
              comps(ci).ta = u8(seg + 2 + 2 * i) & 15
              if (comps(ci).td > 3 || comps(ci).ta > 3) return None
              scanComps(i) = ci
              i += 1
            }
            val ss = u8(seg + 1 + 2 * ns); val se = u8(seg + 2 + 2 * ns)
            val ahal = u8(seg + 3 + 2 * ns)
            val ah = ahal >> 4; val al = ahal & 15
            if (ss == 0) { if (se != 0) return None } // DC scan shape
            else if (ns != 1 || se < ss || se > 63) return None
            if (al > 13 || (ah != 0 && ah != al + 1)) return None
            // tables are required only where the scan READS them
            i = 0
            while (i < ns) {
              val c = comps(scanComps(i))
              if (ss == 0 && ah == 0 && dcTables(c.td) == null) return None
              if (ss > 0 && acTables(c.ta) == null) return None
              i += 1
            }
            val end = runScan(pos + 2 + len, scanComps, ss, se, ah, al)
            if (end < 0) return None
            sawScan = true
            nextPos = end
          case _ => () // APPn, COM: skip
        }
        pos = nextPos
      }
    }
    if (!sawScan || comps == null) return None
    for (c <- comps) if (quantTables(c.tq) == null) return None

    // dequant + IDCT every padded block, then the shared compose
    val planes = comps.map(c =>
      new Array[Int](mcusX * c.hS * 8 * mcusY * c.vS * 8))
    val planeW = comps.map(c => mcusX * c.hS * 8)
    val coefs = new Array[Int](64)
    val pix = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val qt = quantTables(c.tq)
      val bw = gridBW(ci); val bh = mcusY * c.vS
      val g = grids(ci)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          System.arraycopy(g, (by * bw + bx) * 64, coefs, 0, 64)
          idctBlock(coefs, qt, pix)
          val pw = planeW(ci)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(ci)((by * 8 + yy) * pw + bx * 8 + xx) = pix(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    Some(composePlanes(comps, planes, planeW, w, h, hMax, vMax))
  }

  /** Compose RGB with nearest-neighbor chroma upsampling — shared by
    * the baseline and progressive paths (identical coefficients must
    * yield identical pixels whichever scan script delivered them).
    */
  private def composePlanes(comps: Array[Comp], planes: Array[Array[Int]],
                            planeW: Array[Int], w: Int, h: Int,
                            hMax: Int, vMax: Int): Netpbm.Image = {
    val px = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = planes(0)(y * pw + x).toByte
          val o = (y * w + x) * 3
          px(o) = v; px(o + 1) = v; px(o + 2) = v
          x += 1
        }
        y += 1
      }
    } else {
      val c0 = comps(0); val c1 = comps(1); val c2 = comps(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = planes(0)((y * c0.vS / vMax) * planeW(0) + x * c0.hS / hMax)
          val cb = planes(1)((y * c1.vS / vMax) * planeW(1) + x * c1.hS / hMax)
          val cr = planes(2)((y * c2.vS / vMax) * planeW(2) + x * c2.hS / hMax)
          val o = (y * w + x) * 3
          px(o) = clamp255(math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt).toByte
          px(o + 1) = clamp255(math.floor(
            yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt).toByte
          px(o + 2) = clamp255(math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt).toByte
          x += 1
        }
        y += 1
      }
    }
    Netpbm.Image(w, h, 255, px)
  }
}
