package graft.multimodal

/** VP8 (lossy WebP) KEYFRAME codec — the largest single coverage gap
  * by crawl-image share until r16 (q139 billed it as `triaged`): the
  * web's WebP is overwhelmingly LOSSY VP8 (libwebp's default), while
  * the r14 codec only decoded lossless VP8L. This implements the
  * intra-frame half of RFC 6386 — exactly what a still WebP carries:
  *
  *   - boolean arithmetic decoder/encoder (RFC 6386 §7 reference
  *     algorithm, 16-bit value window, carry-walk on the write side);
  *   - keyframe header: segmentation, loop-filter params, token
  *     partitions, quantizer indices + per-plane deltas, token
  *     probability updates, skip probability (RFC §9);
  *   - keyframe mode decoding: 16x16 luma modes, B_PRED 4x4 submodes
  *     under the [above][left] context table, chroma modes (RFC §11);
  *   - token decoding: the 12-leaf coefficient tree over
  *     [type][band][context] probabilities, category extra bits,
  *     zero-run context rule (no EOB after ZERO), per-block nonzero
  *     context propagation, Y2/WHT virtual block (RFC §13);
  *   - dequantization with the table lookups and the Y2/chroma
  *     special cases (RFC §14), inverse WHT + the 4x4 integer IDCT
  *     (20091/35468 constants), all ten 4x4 intra predictors, the
  *     four 16x16 and 8x8 predictors with the 127/129 edge conventions.
  *
  *   - BOTH loop filters (normal and simple), applied as the spec's
  *     post-pass: VP8 intra prediction reads UNFILTERED
  *     reconstruction, so the whole frame reconstructs first and the
  *     filter walks MBs in raster order (left edge, inner vertical,
  *     top edge, inner horizontal, each at the MB's own strength
  *     with segment/delta adjustments and the libwebp inner-edge
  *     rule: B_PRED or actually-carrying-coefficients).
  *
  * NOT implemented, stated plainly: interframes — no reference
  * frames exist in a still image, so a non-keyframe fences None.
  * Decoder correctness is PARITY-PINNED: the Vp8Spec resources carry
  * libwebp-encoded vectors (gradients, noise, partial MBs,
  * segmentation, 8 token partitions, both filters, sharpness) plus
  * libwebp's own YUV decode of each, and the suite asserts
  * byte-identical planes; the full 118-vector dev corpus passed the
  * same comparison.
  *
  * [[encode]] is the fixture writer (the q126 device on VP8): a
  * conforming single-partition keyframe, B_PRED + B_DC everywhere,
  * quantizer index 4 (luma DC step 8), so a per-4x4-uniform image
  * round-trips EXACTLY — residual r encodes as level r, dequantizes
  * to 8r, and the DC-only IDCT reconstructs (8r+4)>>3 = r. Its
  * bitstreams were verified to decode byte-identically in libwebp
  * itself (the pinned Vp8Spec resources carry libwebp's decode of
  * these exact bytes).
  */
object Vp8 {

  val MaxPixels: Long = 16384L * 16384L

  import Vp8Tables._

  // ---- trees (RFC 6386; leaves <= 0 hold -value, internal >= 2) ----

  // luma 16x16 modes: DC=0 V=1 H=2 TM=3 B_PRED=4
  private val KfYmodeTree = Array(-4, 2, 4, 6, 0, -1, -2, -3)
  // chroma: DC=0 V=1 H=2 TM=3
  private val UvModeTree = Array(0, 2, -1, 4, -2, -3)
  // 4x4 submodes, in the NUMBERING the extracted kBModesProba table
  // indexes by (libwebp's enum, a permutation of the RFC's listing):
  // DC=0 TM=1 VE=2 HE=3 RD=4 VR=5 LD=6 VL=7 HD=8 HU=9
  private val BmodeTree =
    Array(0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9)
  // coefficient tokens: 0..4 literal, 5..10 categories, 11 = EOB
  private val CoeffTree =
    Array(-11, 2, 0, 4, -1, 6, 8, 12, -2, 10, -3, -4, 14, 16, -5, -6,
      18, 20, -7, -8, -9, -10)

  // ---- boolean decoder (RFC 6386 §7.3) ----

  final class BoolReader(b: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = 0
    private var bitCount = 0
    private var pos = start
    private var phantom = 0
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int =
      if (pos < end) { val v = b(pos) & 0xff; pos += 1; v }
      else { phantom += 1; 0 }

    /** true once the reader has consumed well past the partition —
      * the hostile-truncation fence (a conforming stream never needs
      * more than a few phantom bits of lookahead).
      */
    def exhausted: Boolean = phantom > 32

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1; range <<= 1; bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }

    def literal(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    def signed(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }

    def tree(t: Array[Int], probs: Array[Int], pOff: Int,
             startNode: Int = 0): Int = {
      var i = startNode
      while (true) {
        val v = t(i + bool(probs(pOff + (i >> 1))))
        if (v <= 0) return -v
        i = v
      }
      -1 // unreachable
    }
  }

  // ---- boolean encoder (RFC 6386 §7.2 reference, carry walk) ----

  final class BoolWriter {
    // primitive growable buffer (r18): the encoder emits one byte per
    // ~8 bools and runs per row under 32-way parallelism — a generic
    // ArrayBuffer[Byte] boxed every append and every carry-walk read,
    // and that garbage dominated the parallel encode's GC bill
    private var out = new Array[Byte](1024)
    private var n = 0
    private var range = 255
    private var bottom = 0L
    private var bitCount = 24

    private def carry(): Unit = {
      var i = n - 1
      while (i >= 0 && out(i) == -1) { out(i) = 0; i -= 1 }
      if (i >= 0) out(i) = (out(i) + 1).toByte
    }

    def bool(prob: Int, bit: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & (1L << 31)) != 0) carry()
        bottom = (bottom << 1) & 0xFFFFFFFFL
        bitCount -= 1
        if (bitCount == 0) {
          if (n == out.length) out = java.util.Arrays.copyOf(out, n << 1)
          out(n) = ((bottom >> 24) & 0xff).toByte
          n += 1
          bottom &= 0xFFFFFF
          bitCount = 8
        }
      }
    }

    def literal(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }

    /** Magnitude-then-sign, mirroring [[BoolReader.signed]]. */
    def signed(n: Int, v: Int): Unit = {
      literal(n, math.abs(v))
      bool(128, if (v < 0) 1 else 0)
    }

    // (probNodeIndex << 1 | bit) per step of the current tree path —
    // reused across tree() calls; trees are ≤ 22 nodes so depth is
    // far below 32. The old Option[List[(Int,Int)]] search allocated
    // a tuple + cons cell per step per SYMBOL (18 tree symbols per
    // macroblock), the encoder's hottest allocation site.
    private val pathBuf = new Array[Int](32)

    private def findPath(t: Array[Int], node: Int, leaf: Int,
                         depth: Int): Int = {
      // keep the documented failure mode: a deeper-than-expected tree
      // reports "no leaf" (IllegalArgumentException in tree()) instead
      // of an ArrayIndexOutOfBounds on the fixed path buffer
      if (depth >= pathBuf.length) return -1
      var b = 0
      while (b < 2) {
        val v = t(node + b)
        pathBuf(depth) = ((node >> 1) << 1) | b
        if (v <= 0) {
          if (-v == leaf) return depth + 1
        } else {
          val r = findPath(t, v, leaf, depth + 1)
          if (r >= 0) return r
        }
        b += 1
      }
      -1
    }

    def tree(t: Array[Int], probs: Array[Int], pOff: Int, leaf: Int,
             startNode: Int = 0): Unit = {
      val len = findPath(t, startNode, leaf, 0)
      if (len < 0) throw new IllegalArgumentException(s"no leaf $leaf")
      var i = 0
      while (i < len) {
        val p = pathBuf(i)
        bool(probs(pOff + (p >>> 1)), p & 1)
        i += 1
      }
    }

    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(128, 0); i += 1 }
      java.util.Arrays.copyOf(out, n)
    }
  }

  // ---- decoded frame ----

  final case class Frame(width: Int, height: Int,
                         y: Array[Byte], u: Array[Byte], v: Array[Byte],
                         filterLevel: Int) {
    def uvWidth: Int = (width + 1) / 2
    def uvHeight: Int = (height + 1) / 2
  }

  private final class Malformed extends RuntimeException

  private def fence(cond: Boolean): Unit = if (cond) throw new Malformed

  /** Decode a VP8 payload (the "VP8 " chunk body). None for
    * interframes, non-VP8 bytes, hostile/truncated streams, or
    * frames past the pixel cap.
    */
  def decode(data: Array[Byte], off: Int, len: Int): Option[Frame] =
    try decodeImpl(data, off, len)
    catch { case scala.util.control.NonFatal(_) => None }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v
  private def clampIdx(v: Int, hi: Int = 127): Int =
    if (v < 0) 0 else if (v > hi) hi else v

  private def decodeImpl(d: Array[Byte], off: Int,
                         len: Int): Option[Frame] = {
    if (len < 10 || off < 0 || off + len > d.length) return None
    val tag = (d(off) & 0xff) | ((d(off + 1) & 0xff) << 8) |
      ((d(off + 2) & 0xff) << 16)
    if ((tag & 1) != 0) return None // interframe: no reference exists
    if (((tag >> 1) & 7) > 3) return None
    val part1Len = tag >> 5
    if ((d(off + 3) & 0xff) != 0x9d || (d(off + 4) & 0xff) != 0x01 ||
        (d(off + 5) & 0xff) != 0x2a) return None
    val w = ((d(off + 6) & 0xff) | ((d(off + 7) & 0xff) << 8)) & 0x3fff
    val h = ((d(off + 8) & 0xff) | ((d(off + 9) & 0xff) << 8)) & 0x3fff
    if (w == 0 || h == 0 || w.toLong * h > MaxPixels) return None
    val p1 = off + 10
    if (part1Len <= 0 || p1 + part1Len > off + len) return None
    val br = new BoolReader(d, p1, p1 + part1Len)

    br.literal(1) // color space
    br.literal(1) // clamping

    // segmentation
    val segEnabled = br.literal(1) == 1
    var segUpdateMap = false
    var segAbs = false
    val segTreeProbs = Array(255, 255, 255)
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    if (segEnabled) {
      segUpdateMap = br.literal(1) == 1
      if (br.literal(1) == 1) { // update feature data
        segAbs = br.literal(1) == 1
        var i = 0
        while (i < 4) {
          if (br.literal(1) == 1) segQuant(i) = br.signed(7); i += 1
        }
        i = 0
        while (i < 4) {
          if (br.literal(1) == 1) segLf(i) = br.signed(6); i += 1
        }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (br.literal(1) == 1) segTreeProbs(i) = br.literal(8); i += 1
        }
      }
    }

    val simpleFilter = br.literal(1) == 1
    val filterLevel = br.literal(6)
    val sharpness = br.literal(3)
    // keyframe MBs are all intra, so only ref delta 0 (INTRA_FRAME)
    // and mode delta 0 (B_PRED) can ever apply
    var lfRefDelta0 = 0
    var lfModeDelta0 = 0
    if (br.literal(1) == 1) { // lf delta enabled
      if (br.literal(1) == 1) { // update
        var i = 0
        while (i < 8) {
          if (br.literal(1) == 1) {
            val v = br.signed(6)
            if (i == 0) lfRefDelta0 = v
            if (i == 4) lfModeDelta0 = v
          }
          i += 1
        }
      }
    }

    val nParts = 1 << br.literal(2)
    val partsBase = p1 + part1Len
    val sizesLen = 3 * (nParts - 1)
    fence(partsBase + sizesLen > off + len)
    val partOff = new Array[Int](nParts)
    val partEnd = new Array[Int](nParts)
    var cursor = partsBase + sizesLen
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) (off + len) - cursor
        else (d(partsBase + 3 * pi) & 0xff) |
          ((d(partsBase + 3 * pi + 1) & 0xff) << 8) |
          ((d(partsBase + 3 * pi + 2) & 0xff) << 16)
      fence(sz < 0 || cursor + sz > off + len)
      partOff(pi) = cursor; partEnd(pi) = cursor + sz
      cursor += sz
      pi += 1
    }
    val tokenBr = Array.tabulate(nParts)(i =>
      new BoolReader(d, partOff(i), partEnd(i)))

    // quantizers
    val yacQi = br.literal(7)
    def qDelta(): Int = if (br.literal(1) == 1) br.signed(4) else 0
    val y1dcD = qDelta(); val y2dcD = qDelta(); val y2acD = qDelta()
    val uvdcD = qDelta(); val uvacD = qDelta()
    br.literal(1) // refresh entropy probs

    // token probability updates
    val probs = new Array[Int](4 * 8 * 3 * 11)
    System.arraycopy(coeffProbs, 0, probs, 0, probs.length)
    var ui = 0
    while (ui < probs.length) {
      if (br.bool(updateProbs(ui)) == 1) probs(ui) = br.literal(8)
      ui += 1
    }
    val noSkip = br.literal(1) == 1
    val probSkip = if (noSkip) br.literal(8) else 0
    fence(br.exhausted)

    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4

    // per-segment dequant pairs
    val qSeg = Array.tabulate(4) { s =>
      val base =
        if (!segEnabled) yacQi
        else if (segAbs) segQuant(s)
        else yacQi + segQuant(s)
      val q = clampIdx(base)
      val y1dc = dcQ(clampIdx(q + y1dcD))
      val y1ac = acQ(q)
      val y2dc = dcQ(clampIdx(q + y2dcD)) * 2
      val y2ac = math.max(8, acQ(clampIdx(q + y2acD)) * 155 / 100)
      val uvdc = dcQ(clampIdx(q + uvdcD, 117))
      val uvac = acQ(clampIdx(q + uvacD))
      Array(y1dc, y1ac, y2dc, y2ac, uvdc, uvac)
    }

    // ---- mode pass (partition 1 continues) ----
    val ymodes = new Array[Byte](mbW * mbH)
    val uvmodes = new Array[Byte](mbW * mbH)
    val bmodes = new Array[Byte](mbW * mbH * 16)
    val skips = new Array[Boolean](mbW * mbH)
    val segIds = new Array[Byte](mbW * mbH)
    val aboveSub = Array.fill[Byte](mbW * 4)(0)
    val leftSub = new Array[Byte](4)
    // implied submode per 16x16 mode: DC->B_DC, V->B_VE, H->B_HE, TM->B_TM
    val implied = Array[Byte](0, 2, 3, 1)
    var mby = 0
    while (mby < mbH) {
      java.util.Arrays.fill(leftSub, 0.toByte)
      var mbx = 0
      while (mbx < mbW) {
        val mi = mby * mbW + mbx
        if (segUpdateMap) {
          val id =
            if (br.bool(segTreeProbs(0)) == 0)
              br.bool(segTreeProbs(1))
            else 2 + br.bool(segTreeProbs(2))
          segIds(mi) = id.toByte
        }
        if (noSkip) skips(mi) = br.bool(probSkip) == 1
        val ym = br.tree(KfYmodeTree, kfYmodeProbs, 0)
        ymodes(mi) = ym.toByte
        if (ym == 4) { // B_PRED
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2; val c = sb & 3
            val a = if (r == 0) aboveSub(mbx * 4 + c)
                    else bmodes(mi * 16 + sb - 4)
            val l = if (c == 0) leftSub(r) else bmodes(mi * 16 + sb - 1)
            val m = br.tree(BmodeTree, bmodeProbs, (a * 10 + l) * 9)
            bmodes(mi * 16 + sb) = m.toByte
            sb += 1
          }
        } else {
          java.util.Arrays.fill(bmodes, mi * 16, mi * 16 + 16, implied(ym))
        }
        // update trackers
        var k = 0
        while (k < 4) {
          aboveSub(mbx * 4 + k) = bmodes(mi * 16 + 12 + k)
          leftSub(k) = bmodes(mi * 16 + k * 4 + 3)
          k += 1
        }
        uvmodes(mi) = br.tree(UvModeTree, kfUvModeProbs, 0).toByte
        mbx += 1
      }
      fence(br.exhausted)
      mby += 1
    }

    // ---- token + reconstruction pass ----
    val planeW = mbW * 16; val planeH = mbH * 16
    val cW = mbW * 8; val cH = mbH * 8
    val Y = new Array[Byte](planeW * planeH)
    val U = new Array[Byte](cW * cH)
    val V = new Array[Byte](cW * cH)

    // nonzero contexts: above per mb-column, left per mb-row
    val aNzY = new Array[Boolean](mbW * 4)
    val aNzU = new Array[Boolean](mbW * 2)
    val aNzV = new Array[Boolean](mbW * 2)
    val aNzY2 = new Array[Boolean](mbW)
    val lNzY = new Array[Boolean](4)
    val lNzU = new Array[Boolean](2)
    val lNzV = new Array[Boolean](2)
    var lNzY2 = false

    val mbHasCoeffs = new Array[Boolean](mbW * mbH)
    val coeffs = new Array[Int](16) // scratch per block
    val y2 = new Array[Int](16)
    val blockPx = new Array[Int](16)
    val idctTmp = new Array[Int](16)

    /** Decode one block's tokens into coeffs (zigzag-placed,
      * dequantized). Returns true when any coefficient was decoded
      * (the nonzero-context flag).
      */
    def readCoeffs(reader: BoolReader, typ: Int, first: Int, ctx0: Int,
                   dqDC: Int, dqAC: Int): Boolean = {
      java.util.Arrays.fill(coeffs, 0)
      var n = first
      var ctx = ctx0
      var startNode = 0
      var done = false
      while (!done && n < 16) {
        val band = bands(n)
        val pOff = (typ * 24 + band * 3 + ctx) * 11
        val tok = reader.tree(CoeffTree, probs, pOff, startNode)
        if (tok == 11) done = true // EOB
        else if (tok == 0) {
          // ZERO: next token may not be EOB (start at node 2)
          startNode = 2
          ctx = 0
          n += 1
        } else {
          startNode = 0
          var v =
            if (tok <= 4) tok
            else {
              val cat = tok - 5
              val cp = catProbs(cat)
              var extra = 0
              var i = 0
              while (i < cp.length) {
                extra = (extra << 1) | reader.bool(cp(i)); i += 1
              }
              catBases(cat) + extra
            }
          if (reader.bool(128) == 1) v = -v
          ctx = if (v == 1 || v == -1) 1 else 2
          coeffs(zigzag(n)) = v * (if (n == 0) dqDC else dqAC)
          n += 1
        }
      }
      fence(reader.exhausted)
      n > first
    }

    // inverse WHT (Y2 -> 16 luma DCs)
    def iwht(ip: Array[Int], out: Array[Int]): Unit = {
      var i = 0
      while (i < 4) {
        val a1 = ip(i) + ip(12 + i); val b1 = ip(4 + i) + ip(8 + i)
        val c1 = ip(4 + i) - ip(8 + i); val d1 = ip(i) - ip(12 + i)
        idctTmp(i) = a1 + b1; idctTmp(4 + i) = c1 + d1
        idctTmp(8 + i) = a1 - b1; idctTmp(12 + i) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = idctTmp(i * 4) + idctTmp(i * 4 + 3)
        val b1 = idctTmp(i * 4 + 1) + idctTmp(i * 4 + 2)
        val c1 = idctTmp(i * 4 + 1) - idctTmp(i * 4 + 2)
        val d1 = idctTmp(i * 4) - idctTmp(i * 4 + 3)
        out(i * 4) = (a1 + b1 + 3) >> 3
        out(i * 4 + 1) = (c1 + d1 + 3) >> 3
        out(i * 4 + 2) = (a1 - b1 + 3) >> 3
        out(i * 4 + 3) = (d1 - c1 + 3) >> 3
        i += 1
      }
    }

    // 4x4 integer IDCT (RFC 6386 §14.3; 20091 / 35468 fixed-point)
    def idct(ip: Array[Int], out: Array[Int]): Unit = {
      var i = 0
      while (i < 4) {
        val a1 = ip(i) + ip(8 + i)
        val b1 = ip(i) - ip(8 + i)
        val t1 = (ip(4 + i) * 35468) >> 16
        val t2 = ip(12 + i) + ((ip(12 + i) * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = ip(4 + i) + ((ip(4 + i) * 20091) >> 16)
        val t4 = (ip(12 + i) * 35468) >> 16
        val d1 = t3 + t4
        idctTmp(i) = a1 + d1; idctTmp(12 + i) = a1 - d1
        idctTmp(4 + i) = b1 + c1; idctTmp(8 + i) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = idctTmp(i * 4) + idctTmp(i * 4 + 2)
        val b1 = idctTmp(i * 4) - idctTmp(i * 4 + 2)
        val t1 = (idctTmp(i * 4 + 1) * 35468) >> 16
        val t2 = idctTmp(i * 4 + 3) +
          ((idctTmp(i * 4 + 3) * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = idctTmp(i * 4 + 1) +
          ((idctTmp(i * 4 + 1) * 20091) >> 16)
        val t4 = (idctTmp(i * 4 + 3) * 35468) >> 16
        val d1 = t3 + t4
        out(i * 4) = (a1 + d1 + 4) >> 3
        out(i * 4 + 3) = (a1 - d1 + 4) >> 3
        out(i * 4 + 1) = (b1 + c1 + 4) >> 3
        out(i * 4 + 2) = (b1 - c1 + 4) >> 3
        i += 1
      }
    }

    def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
    def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2

    // plane access with the VP8 edge conventions: row -1 = 127,
    // col -1 = 129 (top-left corner = 127, the above-row convention)
    def px(plane: Array[Byte], stride: Int, x: Int, y: Int): Int =
      if (y < 0) 127
      else if (x < 0) 129
      else plane(y * stride + x) & 0xff

    // above-right luma pixels for MB (mbx, mby): 4 pixels at
    // x = mbx*16+16 .. +19 on row mby*16-1; beyond the mb grid's
    // right edge the row's last real pixel replicates (verified
    // against libwebp's output on partial-width vectors)
    def aboveRight(mbx: Int, mby: Int, k: Int): Int = {
      if (mby == 0) 127
      else {
        val yy = mby * 16 - 1
        val xx = mbx * 16 + 16 + k
        if (mbx == mbW - 1) px(Y, planeW, planeW - 1, yy)
        else px(Y, planeW, xx, yy)
      }
    }

    def predict4(dst: Array[Int], mode: Int,
                 a: Array[Int], // above[0..3] then above-right[4..7]
                 l: Array[Int], // left[0..3]
                 c: Int): Unit = {
      mode match {
        case 0 => // B_DC
          val dc = (a(0) + a(1) + a(2) + a(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          var i = 0; while (i < 16) { dst(i) = dc; i += 1 }
        case 1 => // B_TM
          var r = 0
          while (r < 4) {
            var cc = 0
            while (cc < 4) {
              dst(r * 4 + cc) = clamp255(l(r) + a(cc) - c); cc += 1
            }
            r += 1
          }
        case 2 => // B_VE
          val row = Array(avg3(c, a(0), a(1)), avg3(a(0), a(1), a(2)),
            avg3(a(1), a(2), a(3)), avg3(a(2), a(3), a(4)))
          var r = 0
          while (r < 4) {
            System.arraycopy(row, 0, dst, r * 4, 4); r += 1
          }
        case 3 => // B_HE
          val col = Array(avg3(c, l(0), l(1)), avg3(l(0), l(1), l(2)),
            avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
          var r = 0
          while (r < 4) {
            var cc = 0; while (cc < 4) { dst(r * 4 + cc) = col(r); cc += 1 }
            r += 1
          }
        case 6 => // B_LD (down-left): diag d = r + c over above[0..7]
          var r = 0
          while (r < 4) {
            var cc = 0
            while (cc < 4) {
              val dd = r + cc
              dst(r * 4 + cc) =
                if (dd == 6) avg3(a(6), a(7), a(7))
                else avg3(a(dd), a(dd + 1), a(dd + 2))
              cc += 1
            }
            r += 1
          }
        case 4 => // B_RD (down-right): E = L3 L2 L1 L0 C A0 A1 A2 A3
          val e = Array(l(3), l(2), l(1), l(0), c, a(0), a(1), a(2), a(3))
          var r = 0
          while (r < 4) {
            var cc = 0
            while (cc < 4) {
              val i = 4 + cc - r
              dst(r * 4 + cc) = avg3(e(i - 1), e(i), e(i + 1))
              cc += 1
            }
            r += 1
          }
        case 5 => // B_VR
          val x = c
          dst(0) = avg2(x, a(0)); dst(1) = avg2(a(0), a(1))
          dst(2) = avg2(a(1), a(2)); dst(3) = avg2(a(2), a(3))
          dst(4) = avg3(l(0), x, a(0)); dst(5) = avg3(x, a(0), a(1))
          dst(6) = avg3(a(0), a(1), a(2)); dst(7) = avg3(a(1), a(2), a(3))
          dst(8) = avg3(l(1), l(0), x)
          dst(9) = dst(0); dst(10) = dst(1); dst(11) = dst(2)
          dst(12) = avg3(l(2), l(1), l(0))
          dst(13) = dst(4); dst(14) = dst(5); dst(15) = dst(6)
        case 7 => // B_VL
          dst(0) = avg2(a(0), a(1)); dst(1) = avg2(a(1), a(2))
          dst(2) = avg2(a(2), a(3)); dst(3) = avg2(a(3), a(4))
          dst(4) = avg3(a(0), a(1), a(2)); dst(5) = avg3(a(1), a(2), a(3))
          dst(6) = avg3(a(2), a(3), a(4)); dst(7) = avg3(a(3), a(4), a(5))
          dst(8) = dst(1); dst(9) = dst(2); dst(10) = dst(3)
          dst(11) = avg3(a(4), a(5), a(6))
          dst(12) = dst(5); dst(13) = dst(6); dst(14) = dst(7)
          dst(15) = avg3(a(5), a(6), a(7))
        case 8 => // B_HD
          val x = c
          dst(0) = avg2(l(0), x); dst(1) = avg3(l(0), x, a(0))
          dst(2) = avg3(x, a(0), a(1)); dst(3) = avg3(a(0), a(1), a(2))
          dst(4) = avg2(l(1), l(0)); dst(5) = avg3(l(1), l(0), x)
          dst(6) = dst(0); dst(7) = dst(1)
          dst(8) = avg2(l(2), l(1)); dst(9) = avg3(l(2), l(1), l(0))
          dst(10) = dst(4); dst(11) = dst(5)
          dst(12) = avg2(l(3), l(2)); dst(13) = avg3(l(3), l(2), l(1))
          dst(14) = dst(8); dst(15) = dst(9)
        case 9 => // B_HU
          dst(0) = avg2(l(0), l(1)); dst(1) = avg3(l(0), l(1), l(2))
          dst(2) = avg2(l(1), l(2)); dst(3) = avg3(l(1), l(2), l(3))
          dst(4) = dst(2); dst(5) = dst(3)
          dst(6) = avg2(l(2), l(3)); dst(7) = avg3(l(2), l(3), l(3))
          dst(8) = dst(6); dst(9) = dst(7)
          dst(10) = l(3); dst(11) = l(3)
          dst(12) = l(3); dst(13) = l(3); dst(14) = l(3); dst(15) = l(3)
        case _ => throw new Malformed
      }
    }

    /** Whole-block (16x16 luma or 8x8 chroma) prediction into the
      * plane, modes DC/V/H/TM with the frame-edge DC special cases.
      */
    def predictBig(plane: Array[Byte], stride: Int, bx: Int, by: Int,
                   size: Int, mode: Int): Unit = {
      val hasA = by > 0; val hasL = bx > 0
      mode match {
        case 0 => // DC
          var sum = 0; var cnt = 0
          if (hasA) { var i = 0; while (i < size) { sum += px(plane, stride, bx + i, by - 1); i += 1 }; cnt += size }
          if (hasL) { var i = 0; while (i < size) { sum += px(plane, stride, bx - 1, by + i); i += 1 }; cnt += size }
          val dc = if (cnt == 0) 128 else (sum + cnt / 2) / cnt
          var yy = 0
          while (yy < size) {
            var xx = 0
            while (xx < size) { plane((by + yy) * stride + bx + xx) = dc.toByte; xx += 1 }
            yy += 1
          }
        case 1 => // V
          var yy = 0
          while (yy < size) {
            var xx = 0
            while (xx < size) {
              plane((by + yy) * stride + bx + xx) =
                px(plane, stride, bx + xx, by - 1).toByte
              xx += 1
            }
            yy += 1
          }
        case 2 => // H
          var yy = 0
          while (yy < size) {
            val v = px(plane, stride, bx - 1, by + yy)
            var xx = 0
            while (xx < size) { plane((by + yy) * stride + bx + xx) = v.toByte; xx += 1 }
            yy += 1
          }
        case 3 => // TM
          val corner = px(plane, stride, bx - 1, by - 1)
          var yy = 0
          while (yy < size) {
            val lv = px(plane, stride, bx - 1, by + yy)
            var xx = 0
            while (xx < size) {
              plane((by + yy) * stride + bx + xx) =
                clamp255(lv + px(plane, stride, bx + xx, by - 1) - corner).toByte
              xx += 1
            }
            yy += 1
          }
        case _ => throw new Malformed
      }
    }

    def addResidual(plane: Array[Byte], stride: Int, bx: Int, by: Int,
                    res: Array[Int]): Unit = {
      var r = 0
      while (r < 4) {
        var cc = 0
        while (cc < 4) {
          val p = (by + r) * stride + bx + cc
          plane(p) = clamp255((plane(p) & 0xff) + res(r * 4 + cc)).toByte
          cc += 1
        }
        r += 1
      }
    }

    val yCoeffBlocks = Array.fill(16)(new Array[Int](16))
    val uvCoeffBlocks = Array.fill(8)(new Array[Int](16))
    val a4 = new Array[Int](8)
    val l4 = new Array[Int](4)

    mby = 0
    while (mby < mbH) {
      lNzY(0) = false; lNzY(1) = false; lNzY(2) = false; lNzY(3) = false
      lNzU(0) = false; lNzU(1) = false; lNzV(0) = false; lNzV(1) = false
      lNzY2 = false
      val reader = tokenBr(mby % nParts)
      var mbx = 0
      while (mbx < mbW) {
        val mi = mby * mbW + mbx
        val ym = ymodes(mi)
        val hasY2 = ym != 4
        val dq = qSeg(segIds(mi))
        var y2nz = false
        var mbNzAny = false
        java.util.Arrays.fill(y2, 0)

        if (skips(mi)) {
          // cleared contexts; Y2 context stays when the MB has no Y2
          var k = 0
          while (k < 4) { aNzY(mbx * 4 + k) = false; lNzY(k) = false; k += 1 }
          k = 0
          while (k < 2) {
            aNzU(mbx * 2 + k) = false; lNzU(k) = false
            aNzV(mbx * 2 + k) = false; lNzV(k) = false
            k += 1
          }
          if (hasY2) { aNzY2(mbx) = false; lNzY2 = false }
          var b = 0
          while (b < 16) { java.util.Arrays.fill(yCoeffBlocks(b), 0); b += 1 }
          b = 0
          while (b < 8) { java.util.Arrays.fill(uvCoeffBlocks(b), 0); b += 1 }
        } else {
          if (hasY2) {
            val ctx = (if (aNzY2(mbx)) 1 else 0) + (if (lNzY2) 1 else 0)
            y2nz = readCoeffs(reader, 1, 0, ctx, dq(2), dq(3))
            System.arraycopy(coeffs, 0, y2, 0, 16)
            aNzY2(mbx) = y2nz; lNzY2 = y2nz
          }
          val typ = if (hasY2) 0 else 3
          val first = if (hasY2) 1 else 0
          var b = 0
          while (b < 16) {
            val r = b >> 2; val c = b & 3
            val ctx = (if (aNzY(mbx * 4 + c)) 1 else 0) +
              (if (lNzY(r)) 1 else 0)
            val nz = readCoeffs(reader, typ, first, ctx, dq(0), dq(1))
            System.arraycopy(coeffs, 0, yCoeffBlocks(b), 0, 16)
            aNzY(mbx * 4 + c) = nz; lNzY(r) = nz
            if (nz) mbNzAny = true
            b += 1
          }
          b = 0
          while (b < 4) {
            val r = b >> 1; val c = b & 1
            val ctx = (if (aNzU(mbx * 2 + c)) 1 else 0) +
              (if (lNzU(r)) 1 else 0)
            val nz = readCoeffs(reader, 2, 0, ctx, dq(4), dq(5))
            System.arraycopy(coeffs, 0, uvCoeffBlocks(b), 0, 16)
            aNzU(mbx * 2 + c) = nz; lNzU(r) = nz
            if (nz) mbNzAny = true
            b += 1
          }
          b = 0
          while (b < 4) {
            val r = b >> 1; val c = b & 1
            val ctx = (if (aNzV(mbx * 2 + c)) 1 else 0) +
              (if (lNzV(r)) 1 else 0)
            val nz = readCoeffs(reader, 2, 0, ctx, dq(4), dq(5))
            System.arraycopy(coeffs, 0, uvCoeffBlocks(4 + b), 0, 16)
            aNzV(mbx * 2 + c) = nz; lNzV(r) = nz
            if (nz) mbNzAny = true
            b += 1
          }
        }

        mbHasCoeffs(mi) = mbNzAny || y2nz
        // Y2 DC distribution (skipped MBs carry all-zero blocks)
        if (hasY2 && !skips(mi)) {
          val dcs = new Array[Int](16)
          iwht(y2, dcs)
          var b = 0
          while (b < 16) { yCoeffBlocks(b)(0) = dcs(b); b += 1 }
        }

        // ---- reconstruction ----
        val yx = mbx * 16; val yy0 = mby * 16
        if (ym != 4) {
          predictBig(Y, planeW, yx, yy0, 16, ym)
          var b = 0
          while (b < 16) {
            val r = b >> 2; val c = b & 3
            idct(yCoeffBlocks(b), blockPx)
            addResidual(Y, planeW, yx + c * 4, yy0 + r * 4, blockPx)
            b += 1
          }
        } else {
          // B_PRED: per-4x4 predict + add, in raster order
          var b = 0
          while (b < 16) {
            val r = b >> 2; val c = b & 3
            val bx = yx + c * 4; val by = yy0 + r * 4
            var k = 0
            while (k < 4) {
              a4(k) = px(Y, planeW, bx + k, by - 1)
              l4(k) = px(Y, planeW, bx - 1, by + k)
              k += 1
            }
            // above-right: inner blocks read the row above (already
            // reconstructed); ALL rightmost-column blocks read the
            // MB-level above-right — the spec fixes rows 1-3's
            // above-right to the MB's own (the right neighbor is not
            // decoded yet), and for row 0 the two coincide
            k = 0
            while (k < 4) {
              a4(4 + k) =
                if (c == 3) aboveRight(mbx, mby, k)
                else px(Y, planeW, bx + 4 + k, by - 1)
              k += 1
            }
            val corner = px(Y, planeW, bx - 1, by - 1)
            predict4(blockPx, bmodes(mi * 16 + b), a4, l4, corner)
            val res = new Array[Int](16)
            idct(yCoeffBlocks(b), res)
            var rr = 0
            while (rr < 4) {
              var cc = 0
              while (cc < 4) {
                Y((by + rr) * planeW + bx + cc) =
                  clamp255(blockPx(rr * 4 + cc) + res(rr * 4 + cc)).toByte
                cc += 1
              }
              rr += 1
            }
            b += 1
          }
        }
        // chroma
        val cx = mbx * 8; val cy = mby * 8
        predictBig(U, cW, cx, cy, 8, uvmodes(mi))
        predictBig(V, cW, cx, cy, 8, uvmodes(mi))
        var b = 0
        while (b < 4) {
          val r = b >> 1; val c = b & 1
          idct(uvCoeffBlocks(b), blockPx)
          addResidual(U, cW, cx + c * 4, cy + r * 4, blockPx)
          idct(uvCoeffBlocks(4 + b), blockPx)
          addResidual(V, cW, cx + c * 4, cy + r * 4, blockPx)
          b += 1
        }
        mbx += 1
      }
      mby += 1
    }

    // ---- loop filter (RFC 6386 §15) — a pure post-pass: VP8 intra
    // prediction reads UNFILTERED reconstruction, so this runs after
    // the whole frame is reconstructed, in MB raster order: left MB
    // edge, internal vertical edges, top MB edge, internal
    // horizontal edges, each with the MB's own strength ----
    if (filterLevel > 0) {
      def clampS(v: Int): Int = // signed-char clamp
        if (v < -128) -128 else if (v > 127) 127 else v
      def u2s(v: Int): Int = v - 128
      def s2u(v: Int): Int = clamp255(v + 128)

      // one edge position: pixels at base + k*step (k = -4..3)
      def needsFilter(p: Array[Byte], base: Int, step: Int,
                      eLim: Int, iLim: Int): Boolean = {
        def at(k: Int) = p(base + k * step) & 0xff
        val p3 = at(-4); val p2 = at(-3); val p1 = at(-2); val p0 = at(-1)
        val q0 = at(0); val q1 = at(1); val q2 = at(2); val q3 = at(3)
        math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= eLim &&
          math.abs(p3 - p2) <= iLim && math.abs(p2 - p1) <= iLim &&
          math.abs(p1 - p0) <= iLim && math.abs(q3 - q2) <= iLim &&
          math.abs(q2 - q1) <= iLim && math.abs(q1 - q0) <= iLim
      }
      def highVar(p: Array[Byte], base: Int, step: Int, t: Int): Boolean = {
        def at(k: Int) = p(base + k * step) & 0xff
        math.abs(at(-2) - at(-1)) > t || math.abs(at(1) - at(0)) > t
      }
      // the hev / simple-filter adjustment (outer taps in `a`)
      def filter2(p: Array[Byte], base: Int, step: Int): Unit = {
        val p1 = u2s(p(base - 2 * step) & 0xff)
        val p0 = u2s(p(base - step) & 0xff)
        val q0 = u2s(p(base) & 0xff)
        val q1 = u2s(p(base + step) & 0xff)
        val a = clampS(clampS(p1 - q1) + 3 * (q0 - p0))
        val f1 = clampS(a + 4) >> 3
        val f2 = clampS(a + 3) >> 3
        p(base) = s2u(q0 - f1).toByte
        p(base - step) = s2u(p0 + f2).toByte
      }
      // internal-edge !hev adjustment (no outer taps in `a`)
      def filter4(p: Array[Byte], base: Int, step: Int): Unit = {
        val p1 = u2s(p(base - 2 * step) & 0xff)
        val p0 = u2s(p(base - step) & 0xff)
        val q0 = u2s(p(base) & 0xff)
        val q1 = u2s(p(base + step) & 0xff)
        val a = 3 * (q0 - p0)
        val f1 = clampS(a + 4) >> 3
        val f2 = clampS(a + 3) >> 3
        val f3 = (f1 + 1) >> 1
        p(base) = s2u(q0 - f1).toByte
        p(base - step) = s2u(p0 + f2).toByte
        p(base + step) = s2u(q1 - f3).toByte
        p(base - 2 * step) = s2u(p1 + f3).toByte
      }
      // MB-edge !hev adjustment (6-tap spread)
      def filter6(p: Array[Byte], base: Int, step: Int): Unit = {
        val p2 = u2s(p(base - 3 * step) & 0xff)
        val p1 = u2s(p(base - 2 * step) & 0xff)
        val p0 = u2s(p(base - step) & 0xff)
        val q0 = u2s(p(base) & 0xff)
        val q1 = u2s(p(base + step) & 0xff)
        val q2 = u2s(p(base + 2 * step) & 0xff)
        val w = clampS(clampS(p1 - q1) + 3 * (q0 - p0))
        val a1 = (27 * w + 63) >> 7
        val a2 = (18 * w + 63) >> 7
        val a3 = (9 * w + 63) >> 7
        p(base - step) = s2u(p0 + a1).toByte
        p(base) = s2u(q0 - a1).toByte
        p(base - 2 * step) = s2u(p1 + a2).toByte
        p(base + step) = s2u(q1 - a2).toByte
        p(base - 3 * step) = s2u(p2 + a3).toByte
        p(base + 2 * step) = s2u(q2 - a3).toByte
      }
      def normalEdge(p: Array[Byte], base: Int, step: Int, eLim: Int,
                     iLim: Int, hevT: Int, mbEdge: Boolean): Unit = {
        if (needsFilter(p, base, step, eLim, iLim)) {
          val hev = highVar(p, base, step, hevT)
          if (mbEdge) {
            if (hev) filter2(p, base, step) else filter6(p, base, step)
          } else {
            if (hev) filter2(p, base, step) else filter4(p, base, step)
          }
        }
      }
      def simpleEdge(p: Array[Byte], base: Int, step: Int,
                     eLim: Int): Unit = {
        val p1 = p(base - 2 * step) & 0xff; val p0 = p(base - step) & 0xff
        val q0 = p(base) & 0xff; val q1 = p(base + step) & 0xff
        if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= eLim)
          filter2(p, base, step)
      }

      var fy = 0
      while (fy < mbH) {
        var fx = 0
        while (fx < mbW) {
          val mi = fy * mbW + fx
          val isB = ymodes(mi) == 4
          var lvl =
            if (segEnabled) {
              if (segAbs) segLf(segIds(mi))
              else filterLevel + segLf(segIds(mi))
            } else filterLevel
          lvl += lfRefDelta0 // every keyframe MB is intra
          if (isB) lvl += lfModeDelta0
          if (lvl < 0) lvl = 0; if (lvl > 63) lvl = 63
          if (lvl > 0) {
            var iLim = lvl
            if (sharpness > 0) {
              iLim >>= (if (sharpness > 4) 2 else 1)
              if (iLim > 9 - sharpness) iLim = 9 - sharpness
            }
            if (iLim < 1) iLim = 1
            val hevT =
              if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
            val mbLim = (lvl + 2) * 2 + iLim
            val subLim = lvl * 2 + iLim
            // inner edges filter when the MB is B_PRED or actually
            // carries coefficients (a bitstream-skipped MB and a
            // parsed-but-all-zero MB both count as coefficient-free —
            // libwebp folds the parse result back into its skip)
            val inner = mbHasCoeffs(mi) || isB
            val yx = fx * 16; val yy = fy * 16
            val cx = fx * 8; val cy = fy * 8
            if (simpleFilter) {
              // simple filter: luma only; SAME limits as the normal
              // filter (2*level + interior_limit, +4 at MB edges —
              // the parity vectors pinned this against libwebp)
              val sMb = mbLim; val sSub = subLim
              if (fx > 0) {
                var r = 0
                while (r < 16) { simpleEdge(Y, (yy + r) * planeW + yx, 1, sMb); r += 1 }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var r = 0
                  while (r < 16) { simpleEdge(Y, (yy + r) * planeW + yx + e, 1, sSub); r += 1 }
                  e += 4
                }
              }
              if (fy > 0) {
                var cc = 0
                while (cc < 16) { simpleEdge(Y, yy * planeW + yx + cc, planeW, sMb); cc += 1 }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var cc = 0
                  while (cc < 16) { simpleEdge(Y, (yy + e) * planeW + yx + cc, planeW, sSub); cc += 1 }
                  e += 4
                }
              }
            } else {
              // left MB edge: luma + both chroma
              if (fx > 0) {
                var r = 0
                while (r < 16) { normalEdge(Y, (yy + r) * planeW + yx, 1, mbLim, iLim, hevT, mbEdge = true); r += 1 }
                r = 0
                while (r < 8) {
                  normalEdge(U, (cy + r) * cW + cx, 1, mbLim, iLim, hevT, mbEdge = true)
                  normalEdge(V, (cy + r) * cW + cx, 1, mbLim, iLim, hevT, mbEdge = true)
                  r += 1
                }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var r = 0
                  while (r < 16) { normalEdge(Y, (yy + r) * planeW + yx + e, 1, subLim, iLim, hevT, mbEdge = false); r += 1 }
                  e += 4
                }
                var r = 0
                while (r < 8) {
                  normalEdge(U, (cy + r) * cW + cx + 4, 1, subLim, iLim, hevT, mbEdge = false)
                  normalEdge(V, (cy + r) * cW + cx + 4, 1, subLim, iLim, hevT, mbEdge = false)
                  r += 1
                }
              }
              // top MB edge
              if (fy > 0) {
                var cc = 0
                while (cc < 16) { normalEdge(Y, yy * planeW + yx + cc, planeW, mbLim, iLim, hevT, mbEdge = true); cc += 1 }
                cc = 0
                while (cc < 8) {
                  normalEdge(U, cy * cW + cx + cc, cW, mbLim, iLim, hevT, mbEdge = true)
                  normalEdge(V, cy * cW + cx + cc, cW, mbLim, iLim, hevT, mbEdge = true)
                  cc += 1
                }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var cc = 0
                  while (cc < 16) { normalEdge(Y, (yy + e) * planeW + yx + cc, planeW, subLim, iLim, hevT, mbEdge = false); cc += 1 }
                  e += 4
                }
                var cc = 0
                while (cc < 8) {
                  normalEdge(U, (cy + 4) * cW + cx + cc, cW, subLim, iLim, hevT, mbEdge = false)
                  normalEdge(V, (cy + 4) * cW + cx + cc, cW, subLim, iLim, hevT, mbEdge = false)
                  cc += 1
                }
              }
            }
          }
          fx += 1
        }
        fy += 1
      }
    }

    // crop to frame dims
    val outY = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      System.arraycopy(Y, r * planeW, outY, r * w, w); r += 1
    }
    val uw = (w + 1) / 2; val uh = (h + 1) / 2
    val outU = new Array[Byte](uw * uh)
    val outV = new Array[Byte](uw * uh)
    r = 0
    while (r < uh) {
      System.arraycopy(U, r * cW, outU, r * uw, uw)
      System.arraycopy(V, r * cW, outV, r * uw, uw)
      r += 1
    }
    Some(Frame(w, h, outY, outU, outV, filterLevel))
  }

  // ---- fixture encoder (the q126 device on VP8) ----

  /** Segmentation + loop-filter knobs for [[encode]] — the r16
    * verdict's oracle-reach ask: a fixture keyframe that EXERCISES
    * the seg-delta filter branches (segment map, abs/relative
    * per-segment levels, ref/mode lf deltas, sharpness, both filter
    * types) while the pre-filter reconstruction stays exact, so a
    * closed-form oracle (and the libwebp parity pins) can check the
    * filtered output. `segLf`/`segIdOf` choose per-MB strengths;
    * when `segAbs` the per-segment QUANTIZER is written as absolute
    * index 4 too (the identity step — otherwise abs segments would
    * default to qindex 0 and break the exact round trip).
    */
  final case class FilterCfg(simple: Boolean, level: Int,
                             sharpness: Int, refDelta: Int,
                             modeDelta: Int, segAbs: Boolean,
                             segLf: Seq[Int],
                             segIdOf: (Int, Int) => Int)

  /** Encode a luma plane that is UNIFORM PER 4x4 BLOCK (required —
    * that is what makes the lossy pipeline exact, see the object
    * scaladoc) as a conforming single-partition keyframe: B_PRED +
    * B_DC everywhere, quantizer index 4 (luma DC step 8), chroma
    * flat 128 (zero residual), loop filter level 0, skip flags on.
    * Residual r per block encodes as DC level r: dequantizes to 8r
    * and the DC-only IDCT gives (8r+4)>>3 = r back — decode∘encode
    * is the identity on the visible pixels (before the loop filter,
    * when a [[FilterCfg]] switches one on).
    */
  def encode(luma: Array[Byte], w: Int, h: Int): Array[Byte] =
    encode(luma, w, h, None)

  def encode(luma: Array[Byte], w: Int, h: Int,
             filter: Option[FilterCfg]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0x3fff && h <= 0x3fff &&
      luma.length == w * h, "bad luma plane")
    val mbW = (w + 15) >> 4; val mbH = (h + 15) >> 4
    val planeW = mbW * 16
    // target plane, edge-replicated into the padding so padded
    // blocks stay uniform
    def target(x: Int, y: Int): Int =
      luma(math.min(y, h - 1) * w + math.min(x, w - 1)) & 0xff
    // per-4x4-uniform check on the visible region
    var by = 0
    while (by * 4 < h) {
      var bx = 0
      while (bx * 4 < w) {
        val v = target(bx * 4, by * 4)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            require(target(bx * 4 + c, by * 4 + r) == v,
              s"luma must be uniform per 4x4 block (block $bx,$by)")
            c += 1
          }
          r += 1
        }
        bx += 1
      }
      by += 1
    }

    val recon = new Array[Byte](planeW * mbH * 16)
    def px(x: Int, y: Int): Int =
      if (y < 0) 127 else if (x < 0) 129 else recon(y * planeW + x) & 0xff

    val hdr = new BoolWriter
    hdr.literal(1, 0) // color space
    hdr.literal(1, 0) // clamping
    filter match {
      case Some(c) =>
        hdr.literal(1, 1) // segmentation enabled
        hdr.literal(1, 1) // update map
        hdr.literal(1, 1) // update feature data
        hdr.literal(1, if (c.segAbs) 1 else 0)
        var i = 0
        while (i < 4) { // quantizer per segment: abs mode must pin
          // the identity index 4 explicitly (see FilterCfg scaladoc)
          if (c.segAbs) { hdr.literal(1, 1); hdr.signed(7, 4) }
          else hdr.literal(1, 0)
          i += 1
        }
        i = 0
        while (i < 4) { hdr.literal(1, 1); hdr.signed(6, c.segLf(i)); i += 1 }
        i = 0
        while (i < 3) { hdr.literal(1, 1); hdr.literal(8, 128); i += 1 }
        hdr.literal(1, if (c.simple) 1 else 0) // filter type
        hdr.literal(6, c.level)
        hdr.literal(3, c.sharpness)
        hdr.literal(1, 1) // lf delta enabled
        hdr.literal(1, 1) // update lf deltas
        i = 0
        while (i < 8) {
          val v = if (i == 0) c.refDelta
                  else if (i == 4) c.modeDelta else 0
          if (v != 0) { hdr.literal(1, 1); hdr.signed(6, v) }
          else hdr.literal(1, 0)
          i += 1
        }
      case None =>
        hdr.literal(1, 0) // segmentation off
        hdr.literal(1, 0) // filter type
        hdr.literal(6, 0) // filter level 0
        hdr.literal(3, 0) // sharpness
        hdr.literal(1, 0) // lf deltas off
    }
    hdr.literal(2, 0) // one token partition
    hdr.literal(7, 4) // y_ac_qi = 4 -> luma DC step 8
    var d = 0
    while (d < 5) { hdr.literal(1, 0); d += 1 } // no quant deltas
    hdr.literal(1, 1) // refresh entropy probs
    var ui = 0
    while (ui < 4 * 8 * 3 * 11) { hdr.bool(updateProbs(ui), 0); ui += 1 }
    hdr.literal(1, 1) // mb_no_coeff_skip on
    hdr.literal(8, 128) // prob_skip

    val tok = new BoolWriter
    // nz contexts, mirroring the decoder exactly
    val aNzY = new Array[Boolean](mbW * 4)
    val aNzU = new Array[Boolean](mbW * 2)
    val aNzV = new Array[Boolean](mbW * 2)
    val lNzY = new Array[Boolean](4)
    val lNzU = new Array[Boolean](2)
    val lNzV = new Array[Boolean](2)

    def writeValue(v: Int, pOff: Int): Unit = {
      val a = math.abs(v)
      val (leaf, bits, base) =
        if (a <= 4) (a, 0, a)
        else if (a <= 6) (5, 1, 5)
        else if (a <= 10) (6, 2, 7)
        else if (a <= 18) (7, 3, 11)
        else if (a <= 34) (8, 4, 19)
        else if (a <= 66) (9, 5, 35)
        else (10, 11, 67)
      tok.tree(CoeffTree, coeffProbs, pOff, leaf)
      if (bits > 0) {
        val extra = a - base
        val cp = catProbs(leaf - 5)
        var i = 0
        while (i < cp.length) {
          tok.bool(cp(i), (extra >> (cp.length - 1 - i)) & 1)
          i += 1
        }
      }
      tok.bool(128, if (v < 0) 1 else 0)
    }

    var mby = 0
    while (mby < mbH) {
      java.util.Arrays.fill(lNzY, false)
      java.util.Arrays.fill(lNzU, false)
      java.util.Arrays.fill(lNzV, false)
      var mbx = 0
      while (mbx < mbW) {
        // compute predictions + residuals for the whole MB first
        // (B_DC per 4x4, raster order, reconstruction-fed)
        val res = new Array[Int](16)
        var b = 0
        while (b < 16) {
          val r = b >> 2; val c = b & 3
          val x0 = mbx * 16 + c * 4; val y0 = mby * 16 + r * 4
          val pred = (px(x0, y0 - 1) + px(x0 + 1, y0 - 1) +
            px(x0 + 2, y0 - 1) + px(x0 + 3, y0 - 1) +
            px(x0 - 1, y0) + px(x0 - 1, y0 + 1) +
            px(x0 - 1, y0 + 2) + px(x0 - 1, y0 + 3) + 4) >> 3
          val want = target(x0, y0)
          res(b) = want - pred
          // reconstruct (exact: dequant 8, (8r+4)>>3 = r)
          var rr = 0
          while (rr < 4) {
            var cc = 0
            while (cc < 4) {
              recon((y0 + rr) * planeW + x0 + cc) = want.toByte; cc += 1
            }
            rr += 1
          }
          b += 1
        }
        val skip = res.forall(_ == 0)
        // mode-pass bits (header partition): [segment id,] skip,
        // ymode, submodes, uv — the decoder's exact read order
        filter.foreach { c =>
          val id = c.segIdOf(mbx, mby)
          hdr.bool(128, if (id < 2) 0 else 1)
          hdr.bool(128, id & 1)
        }
        hdr.bool(128, if (skip) 1 else 0)
        hdr.tree(KfYmodeTree, kfYmodeProbs, 0, 4) // B_PRED
        b = 0
        while (b < 16) {
          // every submode is B_DC(0) and every context is (0,0)
          hdr.tree(BmodeTree, bmodeProbs, 0, 0)
          b += 1
        }
        hdr.tree(UvModeTree, kfUvModeProbs, 0, 0) // uv DC
        // token-pass bits
        if (skip) {
          var k = 0
          while (k < 4) { aNzY(mbx * 4 + k) = false; lNzY(k) = false; k += 1 }
          k = 0
          while (k < 2) {
            aNzU(mbx * 2 + k) = false; lNzU(k) = false
            aNzV(mbx * 2 + k) = false; lNzV(k) = false
            k += 1
          }
        } else {
          b = 0
          while (b < 16) {
            val r = b >> 2; val c = b & 3
            val ctx = (if (aNzY(mbx * 4 + c)) 1 else 0) +
              (if (lNzY(r)) 1 else 0)
            val v = res(b)
            if (v == 0) {
              tok.tree(CoeffTree, coeffProbs, (3 * 24 + 0 * 3 + ctx) * 11, 11)
              aNzY(mbx * 4 + c) = false; lNzY(r) = false
            } else {
              writeValue(v, (3 * 24 + 0 * 3 + ctx) * 11)
              // EOB at position 1, band bands(1)=1, ctx from |v|
              val c2 = if (math.abs(v) == 1) 1 else 2
              tok.tree(CoeffTree, coeffProbs, (3 * 24 + 1 * 3 + c2) * 11, 11)
              aNzY(mbx * 4 + c) = true; lNzY(r) = true
            }
            b += 1
          }
          b = 0
          while (b < 4) {
            val r = b >> 1; val c = b & 1
            val ctx = (if (aNzU(mbx * 2 + c)) 1 else 0) +
              (if (lNzU(r)) 1 else 0)
            tok.tree(CoeffTree, coeffProbs, (2 * 24 + 0 * 3 + ctx) * 11, 11)
            aNzU(mbx * 2 + c) = false; lNzU(r) = false
            b += 1
          }
          b = 0
          while (b < 4) {
            val r = b >> 1; val c = b & 1
            val ctx = (if (aNzV(mbx * 2 + c)) 1 else 0) +
              (if (lNzV(r)) 1 else 0)
            tok.tree(CoeffTree, coeffProbs, (2 * 24 + 0 * 3 + ctx) * 11, 11)
            aNzV(mbx * 2 + c) = false; lNzV(r) = false
            b += 1
          }
        }
        mbx += 1
      }
      mby += 1
    }

    val part1 = hdr.finish()
    val part2 = tok.finish()
    val out = new java.io.ByteArrayOutputStream(
      10 + part1.length + part2.length)
    val tag = (1 << 4) | (part1.length << 5) // keyframe, v0, shown
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff)
    out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    out.write(part1, 0, part1.length)
    out.write(part2, 0, part2.length)
    out.toByteArray
  }

  /** [[encode]] wrapped as a .webp file (RIFF / VP8 chunk). */
  def encodeWebp(luma: Array[Byte], w: Int, h: Int): Array[Byte] =
    encodeWebp(luma, w, h, None)

  def encodeWebp(luma: Array[Byte], w: Int, h: Int,
                 filter: Option[FilterCfg]): Array[Byte] = {
    val payload = encode(luma, w, h, filter)
    val padded = payload.length + (payload.length & 1)
    val out = new java.io.ByteArrayOutputStream(20 + padded)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    w32(4 + 8 + padded)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write(' ')
    w32(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }
}
