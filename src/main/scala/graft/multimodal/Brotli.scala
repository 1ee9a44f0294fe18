package graft.multimodal

/** Brotli (RFC 7932) DECODER, dependency-free on the JVM — closes the
  * single largest crawl-intake exclusion: `Content-Encoding: br`
  * responses previously fenced whole (billed `br_fenced`), losing
  * every page a br-preferring CDN served. The r16 verdict's ask #5
  * chose "build it" over "record the exclusion", on the VP8
  * precedent.
  *
  * Scope (the full static-file profile a crawl meets):
  *   - stream header window bits; meta-block loop with metadata-skip
  *     and uncompressed blocks; compressed blocks with block
  *     switching (types/counts for L/I/D), NPOSTFIX/NDIRECT,
  *     literal context modes (LSB6/MSB6/UTF8/SIGNED), context maps
  *     with RLE + inverse-move-to-front, simple and complex prefix
  *     codes (incl. the 16/17 repeat accumulation rules);
  *   - the command loop: insert+copy length codes (the 704-symbol
  *     alphabet), distance ring buffer with the 16 short codes,
  *     direct and postfix-extended distances, overlap-aware
  *     backward copies;
  *   - STATIC DICTIONARY references with all 121 word transforms
  *     (omit-first/last, ferment first/all, prefix/suffix).
  *
  * Provenance: the dictionary bytes (`brotli_dict.bin`, 122,784
  * bytes), transform table, prefix/suffix pool and the UTF8/SIGNED
  * context lookup halves are RFC 7932 Appendix A/B normative
  * content, extracted from the SYSTEM libbrotlicommon and verified
  * by decode parity against the system libbrotli encoder's output on
  * a pinned vector corpus (BrotliSpec) — the Vp8 method. Never
  * throws: hostile,
  * truncated or bomb-sized streams return None.
  *
  * Scale shape: pure per-row executor CPU (one pass, no allocation
  * beyond the output), used inside WarcSource.inflateBody — the
  * 100 TB story is MB/s per core, tracked in ScaleCheck.
  */
object Brotli {

  private final class Malformed extends RuntimeException(
    null, null, false, true)
  private def fail(): Nothing = throw new Malformed
  private def fence(c: Boolean): Unit = if (c) fail()

  // ---- embedded RFC tables ----

  /** Appendix A: words per length (bits) and plane offsets. */
  private val DictSizeBits = Array(
    0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8,
    7, 7, 6, 6, 5, 5)
  private val DictOffsets = Array(
    0, 0, 0, 0, 0, 4096, 9216, 21504, 35840, 44032, 53248, 63488,
    74752, 87040, 93696, 100864, 104704, 106752, 108928, 113536,
    115968, 118528, 119872, 121280, 122016)

  /** The 122,784 dictionary bytes (resource, Appendix A). */
  private lazy val Dict: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/brotli_dict.bin")
    require(in != null, "missing brotli_dict.bin resource")
    try in.readAllBytes() finally in.close()
  }

  /** Appendix B: 121 (prefix, op, suffix) transform triples. Ops:
    * 0 identity, 1-9 omit-last-N, 10 ferment-first, 11 ferment-all,
    * 12-20 omit-first-(N-11).
    */
  private val Transforms: Array[Int] = Array(
    49, 0, 49, 49, 0, 0, 0, 0, 0, 49, 12, 49, 49, 10, 0, 49, 0, 47, 0,
    0, 49, 4, 0, 0, 49, 0, 3, 49, 10, 49, 49, 0, 6, 49, 13, 49, 49, 1,
    49, 1, 0, 0, 49, 0, 1, 0, 10, 0, 49, 0, 7, 49, 0, 9, 48, 0, 0, 49,
    0, 8, 49, 0, 5, 49, 0, 10, 49, 0, 11, 49, 3, 49, 49, 0, 13, 49, 0,
    14, 49, 14, 49, 49, 2, 49, 49, 0, 15, 49, 0, 16, 0, 10, 49, 49, 0,
    12, 5, 0, 49, 0, 0, 1, 49, 15, 49, 49, 0, 18, 49, 0, 17, 49, 0, 19,
    49, 0, 20, 49, 16, 49, 49, 17, 49, 47, 0, 49, 49, 4, 49, 49, 0, 22,
    49, 11, 49, 49, 0, 23, 49, 0, 24, 49, 0, 25, 49, 7, 49, 49, 1, 26,
    49, 0, 27, 49, 0, 28, 0, 0, 12, 49, 0, 29, 49, 20, 49, 49, 18, 49,
    49, 6, 49, 49, 0, 21, 49, 10, 1, 49, 8, 49, 49, 0, 31, 49, 0, 32,
    47, 0, 3, 49, 5, 49, 49, 9, 49, 0, 10, 1, 49, 10, 8, 5, 0, 21, 49,
    11, 0, 49, 10, 10, 49, 0, 30, 0, 0, 5, 35, 0, 49, 47, 0, 2, 49, 10,
    17, 49, 0, 36, 49, 0, 33, 5, 0, 0, 49, 10, 21, 49, 10, 5, 49, 0,
    37, 0, 0, 30, 49, 0, 38, 0, 11, 0, 49, 0, 39, 0, 11, 49, 49, 0, 34,
    49, 11, 8, 49, 10, 12, 0, 0, 21, 49, 0, 40, 0, 10, 12, 49, 0, 41,
    49, 0, 42, 49, 11, 17, 49, 0, 43, 0, 10, 5, 49, 11, 10, 0, 0, 34,
    49, 10, 33, 49, 0, 44, 49, 11, 5, 45, 0, 49, 0, 0, 33, 49, 10, 30,
    49, 11, 30, 49, 0, 46, 49, 11, 1, 49, 10, 34, 0, 10, 33, 0, 11, 30,
    0, 11, 1, 49, 11, 33, 49, 11, 21, 49, 11, 12, 0, 11, 5, 49, 11, 34,
    0, 11, 12, 0, 10, 30, 0, 11, 34, 0, 10, 34)

  /** Length-prefixed prefix/suffix string pool + id -> offset map. */
  private val PrefixSuffix: Array[Byte] =
    java.util.Base64.getDecoder.decode(
      "ASACLCAIIG9mIHRoZSAEIG9mIAJzIAEuBSBhbmQgBCBpbiABIgQgdG8gAiI+AQoCLiAB" +
      "XQUgZm9yIAMgYSAGIHRoYXQgAScGIHdpdGggBiBmcm9tIAQgYnkgASgGLiBUaGUgBCBv" +
      "biAEIGFzIAQgaXMgBGluZyACCgkBOgNlZCACPSIEIGF0IANseSABLAI9JwUuY29tLwcu" +
      "IFRoaXMgBSBub3QgA2VyIANhbCAEZnVsIARpdmUgBWxlc3MgBGVzdCAEaXplIALCoARv" +
      "dXMgBSB0aGUgAmUgAA==")
  private val PrefixSuffixMap: Array[Int] = Array(
    0, 2, 5, 14, 19, 22, 24, 30, 35, 37, 42, 45, 47, 50, 52, 58, 62, 69, 71, 78, 85, 90, 92, 99, 104, 109, 114, 119, 122, 124, 128, 131, 136, 140, 142, 145, 151, 159, 165, 169, 173, 178, 183, 189, 194, 199, 202, 207, 213, 216)

  /** UTF8 + SIGNED context lookup halves (modes 2 and 3): 512 bytes
    * each, laid out [p1 half][p2 half]; ctx = t(p1) | t(256 + p2).
    * LSB6/MSB6 are formulas. Extracted rodata, parity-verified.
    */
  private val CtxLut: Array[Byte] =
    java.util.Base64.getDecoder.decode(
      "AAAAAAAAAAAABAQAAAQAAAAAAAAAAAAAAAAAAAAAAAAIDBAMDBQMEBgcDAwgDCQMLCws" +
      "LCwsLCwsLCAgGCgcDAwwNDQ0MDQ0NDA0NDQ0NDA0NDQ0NDA0NDQ0NBgMHAwMDDg8PDw4" +
      "PDw8ODw8PDw8ODw8PDw8ODw8PDw8GAwcDAAAAQABAAEAAQABAAEAAQABAAEAAQABAAEA" +
      "AQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAgMCAwIDAgMCAwID" +
      "AgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMC" +
      "AwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAEBAQEBAQEBAQEBAQEBAQIC" +
      "AgICAgICAgIBAQEBAQEBAgICAgICAgICAgICAgICAgICAgICAgICAgIBAQEBAQEDAwMD" +
      "AwMDAwMDAwMDAwMDAwMDAwMDAwMDAwEBAQEAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIC" +
      "AgIACAgICAgICAgICAgICAgIEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQ" +
      "EBAQEBAQEBAQEBAQEBAQGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgY" +
      "GBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGCAgICAgICAgICAgICAgICAgICAgICAg" +
      "ICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAoKCgoKCgoKCgo" +
      "KCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgwMDAwMDAwMDAwMDAw" +
      "MDA4AAEBAQEBAQEBAQEBAQEBAQICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIC" +
      "AgICAgICAgICAgICAgICAgMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMD" +
      "AwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMEBAQEBAQEBAQEBAQEBAQEBAQEBAQE" +
      "BAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBQUFBQUFBQUF" +
      "BQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBgYGBgYGBgYGBgYG" +
      "BgYGBw==")

  // ---- alphabets (RFC 7932 sections 5 and 6) ----

  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26,
    34, 50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsBits = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4,
    4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val CpyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18,
    22, 30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CpyBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3,
    3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val BlkBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81,
    97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337,
    8433, 16625)
  private val BlkBits = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5,
    5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  /** Code-length-code symbol order (section 3.5). */
  private val ClOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9,
    10, 11, 12, 13, 14, 15)

  // ---- bit reader (LSB-first within bytes) ----

  private final class Br(b: Array[Byte]) {
    private val totalBits = b.length.toLong * 8
    var bitPos = 0L

    def bit(): Int = {
      fence(bitPos >= totalBits)
      val r = (b((bitPos >>> 3).toInt) >> (bitPos & 7).toInt) & 1
      bitPos += 1
      r
    }

    /** n <= 24 LSB-first bits. */
    def bits(n: Int): Int = {
      if (n == 0) return 0
      fence(bitPos + n > totalBits)
      val byteIx = (bitPos >>> 3).toInt
      val shift = (bitPos & 7).toInt
      var v = 0L
      var i = 0
      while (i * 8 < shift + n) {
        val ix = byteIx + i
        v |= (if (ix < b.length) b(ix) & 0xffL else 0L) << (8 * i)
        i += 1
      }
      bitPos += n
      ((v >>> shift) & ((1L << n) - 1)).toInt
    }

    /** Byte-align; the skipped padding bits must be zero (the RFC
      * "exuberant padding" fence the reference decoder applies).
      */
    def alignZero(): Unit =
      while ((bitPos & 7) != 0) fence(bit() != 0)

    /** Whole input bytes not yet consumed (bitPos rounded up — any
      * partially-read byte counts as consumed).
      */
    def bytesLeft: Long = b.length - ((bitPos + 7) >>> 3)

    def copyBytes(dst: Array[Byte], off: Int, n: Int): Unit = {
      val ix = (bitPos >>> 3).toInt
      fence((bitPos & 7) != 0 || ix + n > b.length)
      System.arraycopy(b, ix, dst, off, n)
      bitPos += n.toLong * 8
    }

    def skipBytes(n: Int): Unit = {
      fence((bitPos & 7) != 0 || bitPos + n.toLong * 8 > totalBits)
      bitPos += n.toLong * 8
    }
  }

  // ---- prefix codes: canonical per-length decode ----

  private final class Tree(val counts: Array[Int],
                           val syms: Array[Int], val single: Int)

  private def buildTree(lens: Array[Int], alphabet: Int): Tree = {
    val counts = new Array[Int](16)
    var n = 0
    var last = -1
    var s = 0
    while (s < alphabet) {
      val l = lens(s)
      if (l > 0) { fence(l > 15); counts(l) += 1; n += 1; last = s }
      s += 1
    }
    fence(n == 0)
    if (n == 1) return new Tree(null, null, last)
    val offsets = new Array[Int](16)
    var off = 0
    var l = 1
    while (l <= 15) { offsets(l) = off; off += counts(l); l += 1 }
    val syms = new Array[Int](off)
    s = 0
    while (s < alphabet) {
      if (lens(s) > 0) { syms(offsets(lens(s))) = s; offsets(lens(s)) += 1 }
      s += 1
    }
    new Tree(counts, syms, -1)
  }

  private def readSym(br: Br, t: Tree): Int = {
    if (t.single >= 0) return t.single
    var code = 0
    var first = 0
    var index = 0
    var len = 1
    while (len <= 15) {
      code = (code << 1) | br.bit()
      val cnt = t.counts(len)
      if (code - first < cnt) return t.syms(index + (code - first))
      index += cnt
      first = (first + cnt) << 1
      len += 1
    }
    fail()
  }

  private def alphabetBits(alphabet: Int): Int =
    32 - Integer.numberOfLeadingZeros(alphabet - 1)

  /** One code length of the code-length code (fixed VLC, 3.5). */
  private def readClClen(br: Br): Int = {
    val v2 = br.bit() | (br.bit() << 1)
    if (v2 == 0) 0
    else if (v2 == 1) 4
    else if (v2 == 2) 3
    else if (br.bit() == 0) 2
    else if (br.bit() == 0) 1
    else 5
  }

  /** A prefix code over `alphabet` symbols: simple (HSKIP 1) or
    * complex with the repeat-coded code-length code (3.4/3.5).
    */
  private def readPrefixCode(br: Br, alphabet: Int): Tree = {
    val hskip = br.bits(2)
    if (hskip == 1) {
      val nsym = br.bits(2) + 1
      val abits = alphabetBits(alphabet)
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        val s = br.bits(abits)
        fence(s >= alphabet)
        var j = 0
        while (j < i) { fence(syms(j) == s); j += 1 }
        syms(i) = s
        i += 1
      }
      if (nsym == 1) return new Tree(null, null, syms(0))
      val treeSel = if (nsym == 4) br.bits(1) == 1 else false
      // canonical ONLY within equal lengths: symbols of distinct
      // lengths keep their TRANSMITTED order (the encoder chooses
      // which symbol gets the short code); only the equal-length
      // group sorts among itself. A full sort keeps every code's BIT
      // COUNT identical — the stream stays in sync — while swapping
      // the decoded VALUES, the nastiest kind of wrong (the first
      // cut did exactly that and the rep-content vectors decoded to
      // plausible garbage).
      def order(a: Int, b: Int): Unit =
        if (syms(a) > syms(b)) {
          val t = syms(a); syms(a) = syms(b); syms(b) = t
        }
      val lens = new Array[Int](alphabet)
      nsym match {
        case 2 =>
          order(0, 1)
          lens(syms(0)) = 1; lens(syms(1)) = 1
        case 3 =>
          order(1, 2)
          lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 2
        case _ =>
          if (treeSel) {
            order(2, 3)
            lens(syms(0)) = 1; lens(syms(1)) = 2
            lens(syms(2)) = 3; lens(syms(3)) = 3
          } else {
            java.util.Arrays.sort(syms)
            var k = 0
            while (k < 4) { lens(syms(k)) = 2; k += 1 }
          }
      }
      buildTree(lens, alphabet)
    } else {
      // complex: code lengths of the code-length code first
      val clLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = hskip
      while (i < 18 && space > 0) {
        val len = readClClen(br)
        clLens(ClOrder(i)) = len
        if (len != 0) { space -= 32 >> len; numCodes += 1 }
        i += 1
      }
      fence(!(numCodes == 1 || space == 0))
      val clTree = buildTree(clLens, 18)
      // then the alphabet's code lengths under it
      val lens = new Array[Int](alphabet)
      var space2 = 32768
      var prevNonzero = 8
      var repeat = 0
      var repeatLen = -1
      var ix = 0
      while (ix < alphabet && space2 > 0) {
        val s = readSym(br, clTree)
        if (s < 16) {
          lens(ix) = s; ix += 1
          repeat = 0; repeatLen = -1
          if (s != 0) { prevNonzero = s; space2 -= 32768 >> s }
        } else {
          val extra = if (s == 16) 2 else 3
          val newLen = if (s == 16) prevNonzero else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val old = repeat
          if (repeat > 0) { repeat -= 2; repeat <<= extra }
          repeat += br.bits(extra) + 3
          val delta = repeat - old
          fence(ix + delta > alphabet)
          var k = 0
          while (k < delta) { lens(ix) = newLen; ix += 1; k += 1 }
          if (newLen != 0) space2 -= delta << (15 - newLen)
        }
      }
      fence(space2 != 0)
      buildTree(lens, alphabet)
    }
  }

  // ---- context map (7.3) ----

  private def readContextMap(br: Br, size: Int,
                             ntrees: Int): Array[Byte] = {
    val rlemax = if (br.bits(1) == 1) br.bits(4) + 1 else 0
    val tree = readPrefixCode(br, ntrees + rlemax)
    val cmap = new Array[Byte](size)
    var i = 0
    while (i < size) {
      val s = readSym(br, tree)
      if (s == 0) { cmap(i) = 0; i += 1 }
      else if (s <= rlemax) {
        var reps = (1 << s) + br.bits(s)
        fence(i + reps > size)
        while (reps > 0) { cmap(i) = 0; i += 1; reps -= 1 }
      } else {
        cmap(i) = (s - rlemax).toByte
        i += 1
      }
    }
    if (br.bits(1) == 1) { // inverse move-to-front
      val mtf = new Array[Byte](256)
      var k = 0
      while (k < 256) { mtf(k) = k.toByte; k += 1 }
      var j = 0
      while (j < size) {
        val idx = cmap(j) & 0xff
        val v = mtf(idx)
        cmap(j) = v
        var m = idx
        while (m > 0) { mtf(m) = mtf(m - 1); m -= 1 }
        mtf(0) = v
        j += 1
      }
    }
    var j = 0
    while (j < size) { fence((cmap(j) & 0xff) >= ntrees); j += 1 }
    cmap
  }

  // ---- block-switch state (6) ----

  private final class Block(val ntypes: Int, var btype: Int,
                            var prev: Int, var count: Int,
                            val typeTree: Tree, val countTree: Tree)

  private def readBlockCount(br: Br, t: Tree): Int = {
    val s = readSym(br, t)
    BlkBase(s) + br.bits(BlkBits(s))
  }

  private def switchBlock(br: Br, st: Block): Unit = {
    val s = readSym(br, st.typeTree)
    val next =
      if (s == 0) st.prev
      else if (s == 1) (st.btype + 1) % st.ntypes
      else s - 2
    fence(next >= st.ntypes)
    st.prev = st.btype
    st.btype = next
    st.count = readBlockCount(br, st.countTree)
  }

  private def readVarLenUint8(br: Br): Int =
    if (br.bits(1) == 0) 0
    else {
      val n = br.bits(3)
      if (n == 0) 1 else br.bits(n) + (1 << n)
    }

  // ---- dictionary word transforms (8, Appendix B) ----

  /** Uppercase step at `i` (the RFC "ferment"): returns consumed.
    * Writes past `limit` (the word's end) are DISCARDED — a word
    * ending in a UTF-8 lead byte would otherwise ferment into the
    * transform's SUFFIX bytes. The reference decoder ferments the
    * word in place BEFORE appending the suffix, so its out-of-word
    * writes get overwritten; bounding ours reproduces that net
    * behavior (review-caught: the shipped dictionary really has such
    * words — e.g. the length-4 CJK-tagged entries ending 0xE3-0xEC).
    */
  private def ferment(w: Array[Byte], i: Int, limit: Int): Int = {
    val c = w(i) & 0xff
    if (c < 192) {
      if (c >= 'a' && c <= 'z') w(i) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (i + 1 < limit) w(i + 1) = (w(i + 1) ^ 32).toByte
      2
    } else {
      if (i + 2 < limit) w(i + 2) = (w(i + 2) ^ 5).toByte
      3
    }
  }

  private def psBytes(id: Int): (Int, Int) = {
    val off = PrefixSuffixMap(id)
    val len = PrefixSuffix(off) & 0xff
    (off + 1, len)
  }

  private def transformWord(off: Int, len: Int,
                            t: Int): Array[Byte] = {
    val pIx = Transforms(3 * t)
    val op = Transforms(3 * t + 1)
    val sIx = Transforms(3 * t + 2)
    var start = off
    var wl = len
    if (op >= 12) { // omit first N
      val n = math.min(op - 11, wl)
      start += n; wl -= n
    } else if (op >= 1 && op <= 9) { // omit last N
      wl = math.max(0, wl - op)
    }
    val (pOff, pLen) = psBytes(pIx)
    val (sOff, sLen) = psBytes(sIx)
    val out = new Array[Byte](pLen + wl + sLen)
    System.arraycopy(PrefixSuffix, pOff, out, 0, pLen)
    System.arraycopy(Dict, start, out, pLen, wl)
    System.arraycopy(PrefixSuffix, sOff, out, pLen + wl, sLen)
    if (op == 10 && wl > 0) { ferment(out, pLen, pLen + wl); () }
    else if (op == 11) {
      var i = pLen
      while (i < pLen + wl) i += ferment(out, i, pLen + wl)
    }
    out
  }

  // ---- the decoder ----

  /** Decoded bytes, or None for non-brotli/hostile/truncated input
    * or output past `cap` (the decompression-bomb fence).
    */
  def decode(data: Array[Byte], cap: Int = 1 << 26): Option[Array[Byte]] =
    try decodeImpl(data, cap)
    catch {
      case scala.util.control.NonFatal(e) =>
        if (System.getProperty("graft.brotli.debug") != null)
          e.printStackTrace()
        None
    }

  private def decodeImpl(data: Array[Byte],
                         cap: Int): Option[Array[Byte]] = {
    if (data == null || data.length == 0) return None
    val br = new Br(data)
    val wbits = {
      if (br.bits(1) == 0) 16
      else {
        val n = br.bits(3)
        if (n != 0) 17 + n
        else {
          val m = br.bits(3)
          fence(m == 1)
          if (m != 0) 8 + m else 17
        }
      }
    }
    val window = (1 << wbits) - 16

    var buf = new Array[Byte](math.min(cap, math.max(1024, data.length * 4)))
    var pos = 0
    def ensure(n: Int): Unit = {
      fence(pos.toLong + n > cap)
      if (pos + n > buf.length) {
        var cap2 = buf.length.toLong * 2
        while (cap2 < pos + n) cap2 *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(cap2, cap.toLong).toInt)
      }
    }

    // ring(0) = most recent. The RFC lists the initial values
    // "16, 15, 11, 4" MOST-DISTANT FIRST: the initial "last
    // distance" is 4 (a first-command short code 5 means 4+1, not
    // 16+1 — pinned by the parity corpus, where the first cut's
    // reversed order sent every early copy into the dictionary)
    val ring = Array(4, 11, 15, 16)
    def pushDist(d: Int): Unit = {
      ring(3) = ring(2); ring(2) = ring(1); ring(1) = ring(0); ring(0) = d
    }

    var isLast = false
    while (!isLast) {
      isLast = br.bits(1) == 1
      val lastEmpty = isLast && br.bits(1) == 1
      if (!lastEmpty) {
        val mnibCode = br.bits(2)
        if (mnibCode == 3) { // metadata block: skip whole
          fence(br.bits(1) == 1) // reserved
          val skipBytes = br.bits(2)
          var skipLen = 0
          if (skipBytes > 0) {
            var v = 0
            var k = 0
            while (k < skipBytes) { v |= br.bits(8) << (8 * k); k += 1 }
            fence(skipBytes > 1 && (v >>> ((skipBytes - 1) * 8)) == 0)
            skipLen = v + 1
          }
          br.alignZero()
          br.skipBytes(skipLen)
        } else {
          val mnib = 4 + mnibCode
          var mlen = 0
          var k = 0
          while (k < mnib) { mlen |= br.bits(4) << (4 * k); k += 1 }
          fence(mnib > 4 && (mlen >>> ((mnib - 1) * 4)) == 0)
          mlen += 1
          val uncompressed = !isLast && br.bits(1) == 1
          if (uncompressed) {
            br.alignZero()
            ensure(mlen)
            br.copyBytes(buf, pos, mlen)
            pos += mlen
          } else {
            // ---- compressed meta-block ----
            val st = new Array[Block](3)
            var c = 0
            while (c < 3) {
              val n = readVarLenUint8(br) + 1
              st(c) =
                if (n >= 2) {
                  val tt = readPrefixCode(br, n + 2)
                  val ct = readPrefixCode(br, 26)
                  new Block(n, 0, 1, readBlockCount(br, ct), tt, ct)
                } else new Block(1, 0, 1, 1 << 28, null, null)
              c += 1
            }
            val npostfix = br.bits(2)
            val ndirect = br.bits(4) << npostfix
            val ctxModes = new Array[Int](st(0).ntypes)
            var m = 0
            while (m < st(0).ntypes) { ctxModes(m) = br.bits(2); m += 1 }
            val ntreesL = readVarLenUint8(br) + 1
            val cmapL =
              if (ntreesL >= 2) readContextMap(br, st(0).ntypes * 64, ntreesL)
              else new Array[Byte](st(0).ntypes * 64)
            val ntreesD = readVarLenUint8(br) + 1
            val cmapD =
              if (ntreesD >= 2) readContextMap(br, st(2).ntypes * 4, ntreesD)
              else new Array[Byte](st(2).ntypes * 4)
            val litTrees = new Array[Tree](ntreesL)
            var t = 0
            while (t < ntreesL) { litTrees(t) = readPrefixCode(br, 256); t += 1 }
            val cmdTrees = new Array[Tree](st(1).ntypes)
            t = 0
            while (t < st(1).ntypes) {
              cmdTrees(t) = readPrefixCode(br, 704); t += 1
            }
            val distAlpha = 16 + ndirect + (48 << npostfix)
            val distTrees = new Array[Tree](ntreesD)
            t = 0
            while (t < ntreesD) {
              distTrees(t) = readPrefixCode(br, distAlpha); t += 1
            }

            var mleft = mlen
            while (mleft > 0) {
              if (st(1).count == 0) switchBlock(br, st(1))
              st(1).count -= 1
              val cmd = readSym(br, cmdTrees(st(1).btype))
              var rangeIdx = cmd >>> 6
              var implicitZero = false
              if (rangeIdx >= 2) rangeIdx -= 2 else implicitZero = true
              val insCode = (((0x29850 >> (rangeIdx * 2)) & 3) << 3) |
                ((cmd >> 3) & 7)
              val cpyCode = (((0x26244 >> (rangeIdx * 2)) & 3) << 3) |
                (cmd & 7)
              val insLen = InsBase(insCode) + br.bits(InsBits(insCode))
              val cpyLen = CpyBase(cpyCode) + br.bits(CpyBits(cpyCode))
              fence(insLen > mleft)
              var j = 0
              while (j < insLen) {
                if (st(0).count == 0) switchBlock(br, st(0))
                st(0).count -= 1
                val bt = st(0).btype
                val p1 = if (pos > 0) buf(pos - 1) & 0xff else 0
                val p2 = if (pos > 1) buf(pos - 2) & 0xff else 0
                val ctx = ctxModes(bt) match {
                  case 0 => p1 & 0x3f
                  case 1 => p1 >> 2
                  case 2 => (CtxLut(p1) | CtxLut(256 + p2)) & 0xff
                  case _ => (CtxLut(512 + p1) | CtxLut(768 + p2)) & 0xff
                }
                val tree = litTrees(cmapL(bt * 64 + ctx) & 0xff)
                ensure(1)
                buf(pos) = readSym(br, tree).toByte
                pos += 1
                j += 1
              }
              mleft -= insLen
              if (mleft > 0) {
                val maxDist = math.min(pos, window)
                var dist = 0
                var codeZero = implicitZero
                if (implicitZero) dist = ring(0)
                else {
                  if (st(2).count == 0) switchBlock(br, st(2))
                  st(2).count -= 1
                  val dctx = if (cpyLen > 4) 3 else cpyLen - 2
                  val tree = distTrees(cmapD(st(2).btype * 4 + dctx) & 0xff)
                  val dc = readSym(br, tree)
                  if (dc == 0) { codeZero = true; dist = ring(0) }
                  else if (dc < 4) dist = ring(dc)
                  else if (dc < 16) {
                    val base = ring(if (dc < 10) 0 else 1)
                    val mag = if (dc < 10) (dc - 2) >> 1 else (dc - 8) >> 1
                    dist = base + (if ((dc & 1) == 1) mag else -mag)
                    fence(dist <= 0)
                  } else if (dc < 16 + ndirect) {
                    dist = dc - 15
                  } else {
                    val x = dc - ndirect - 16
                    val hcode = x >>> npostfix
                    val lcode = x & ((1 << npostfix) - 1)
                    val ndistbits = 1 + (hcode >> 1)
                    val extra = br.bits(ndistbits)
                    val offset = ((2 + (hcode & 1)) << ndistbits) - 4
                    dist = ((offset + extra) << npostfix) + lcode + ndirect + 1
                  }
                }
                fence(dist <= 0)
                if (dist <= maxDist) {
                  // backward copy (overlap allowed, byte serial)
                  fence(cpyLen > mleft)
                  if (!codeZero) pushDist(dist)
                  ensure(cpyLen)
                  var kk = 0
                  val from = pos - dist
                  while (kk < cpyLen) {
                    buf(pos) = buf(from + kk); pos += 1; kk += 1
                  }
                  mleft -= cpyLen
                } else {
                  // static dictionary reference (ring NOT updated)
                  fence(cpyLen < 4 || cpyLen > 24)
                  val sb = DictSizeBits(cpyLen)
                  val address = dist - maxDist - 1
                  val wordIx = address & ((1 << sb) - 1)
                  val tIx = address >>> sb
                  fence(tIx >= 121)
                  val word = transformWord(
                    DictOffsets(cpyLen) + wordIx * cpyLen, cpyLen, tIx)
                  fence(word.length == 0 || word.length > mleft)
                  ensure(word.length)
                  System.arraycopy(word, 0, buf, pos, word.length)
                  pos += word.length
                  mleft -= word.length
                }
              }
            }
          }
        }
      }
    }
    // one-shot strictness, matching the reference decoder: the final
    // padding bits must be zero and the input fully consumed — a
    // truncation/concatenation anomaly must not decode silently as a
    // valid prefix (libbrotli's BROTLI_DECODER_ERROR on leftover
    // input, re-expressed)
    br.alignZero()
    fence(br.bytesLeft > 0)
    Some(java.util.Arrays.copyOf(buf, pos))
  }

  // ---- fixture writer (the q151 exactness device) ----

  /** LSB-first bit sink for the fixture streams. */
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bits(nb: Int, v: Int): Unit = {
      var i = 0
      while (i < nb) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    /** MSB-first: canonical prefix-code bits. */
    def code(nb: Int, v: Int): Unit = {
      var i = nb - 1
      while (i >= 0) { bits(1, (v >> i) & 1); i -= 1 }
    }
    def align(): Unit = if (n > 0) { out.write(cur); cur = 0; n = 0 }
    def bytes(b: Array[Byte]): Unit = { align(); out.write(b, 0, b.length) }
    def finish(): Array[Byte] = { align(); out.toByteArray }
  }

  /** MLEN with the MINIMAL nibble count - the top nibble of a 5- or
    * 6-nibble length must be nonzero (both this decoder and the
    * reference fence "exuberant" nibbles).
    */
  private def writeMlen(w: Bw, len: Int): Unit =
    if (len <= (1 << 16)) { w.bits(2, 0); w.bits(16, len - 1) }
    else if (len <= (1 << 20)) { w.bits(2, 1); w.bits(20, len - 1) }
    else { w.bits(2, 2); w.bits(24, len - 1) }

  /** A conforming stream of UNCOMPRESSED meta-blocks (1 MiB each)
    * plus the empty last block — the trivial-but-real arm.
    */
  def encodeUncompressed(data: Array[Byte]): Array[Byte] = {
    val w = new Bw
    w.bits(1, 0) // wbits = 16
    var off = 0
    while (off < data.length) {
      val n = math.min(1 << 20, data.length - off)
      w.bits(1, 0) // not last
      writeMlen(w, n)
      w.bits(1, 1) // uncompressed
      w.bytes(java.util.Arrays.copyOfRange(data, off, off + n))
      off += n
    }
    w.bits(1, 1); w.bits(1, 1) // last, empty
    w.finish()
  }

  /** A conforming COMPRESSED stream: per meta-block one insert-only
    * command whose literals ride a full 256-symbol 8-bit prefix code
    * written through the complex code-length path (1-bit cl code for
    * {8, 16}, then four accumulating 16-repeats) — so decode
    * exercises the complex-code machinery, the command decomposition
    * and the literal loop, and returns the input verbatim. `split`
    * cuts the payload into two meta-blocks (the meta-block loop arm).
    * Insert lengths cap the block at 22594+2^24-1; fixture inputs are
    * far below.
    */
  def encodeFixed(data: Array[Byte], split: Boolean): Array[Byte] = {
    // one meta-block per part: MLEN caps a part at 2^24 bytes (and
    // the insert-code arithmetic below at 22594+2^24-1 — the looser
    // bound). Exceeding it would silently truncate writeMlen's
    // nibbles and emit a corrupt stream that surfaces downstream as
    // a mysterious oracle mismatch — fence loudly instead (fixture
    // payloads are KiB-scale; a >16 MiB document belongs to
    // encodeUncompressed's chunking arm).
    require(data.length <= (1 << 24),
      s"encodeFixed: payload ${data.length} exceeds one meta-block's " +
        "2^24-byte MLEN capacity; chunk it or use encodeUncompressed")
    val w = new Bw
    w.bits(1, 0) // wbits = 16
    if (data.isEmpty) {
      w.bits(1, 1); w.bits(1, 1)
      return w.finish()
    }
    val parts: Seq[(Int, Int)] =
      if (split && data.length >= 2) {
        val h = data.length / 2
        Seq((0, h), (h, data.length - h))
      } else Seq((0, data.length))
    parts.zipWithIndex.foreach { case ((off, len), pi) =>
      val last = pi == parts.length - 1
      w.bits(1, if (last) 1 else 0)
      if (last) w.bits(1, 0) // not empty
      writeMlen(w, len)
      if (!last) w.bits(1, 0) // not uncompressed
      // one block type per category
      w.bits(1, 0); w.bits(1, 0); w.bits(1, 0)
      w.bits(2, 0) // npostfix
      w.bits(4, 0) // ndirect
      w.bits(2, 0) // context mode LSB6 for the single literal type
      w.bits(1, 0) // ntreesL = 1
      w.bits(1, 0) // ntreesD = 1
      // literal code: complex, all 256 symbols at length 8.
      w.bits(2, 0) // hskip 0
      // cl lengths in ClOrder: sym16 -> 1, sym8 -> 1, rest 0 until
      // the reader's space hits zero (after sym8)
      val clVals = Seq(0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1)
      clVals.foreach {
        case 0 => w.bits(2, 0) // fixed VLC "00"
        case 1 => w.bits(1, 1); w.bits(1, 1); w.bits(1, 1); w.bits(1, 0)
        case _ => fail()
      }
      // canonical cl tree: sym8 = '0', sym16 = '1'
      w.code(1, 0) // length 8 for symbol 0
      // four accumulating repeats: 5, 17, 65, 255 emitted
      Seq(2, 2, 2, 0).foreach { x => w.code(1, 1); w.bits(2, x) }
      // command code: simple, one symbol (insert-only command)
      val insCode = {
        var ic = 23
        while (InsBase(ic) > len) ic -= 1
        ic
      }
      val raw = (insCode >> 3) match {
        case 0 => 0
        case 1 => 4
        case _ => 7
      }
      val cmd = (raw << 6) | ((insCode & 7) << 3)
      w.bits(2, 1) // hskip 1 (simple)
      w.bits(2, 0) // nsym 1
      w.bits(10, cmd)
      // distance code: simple, one symbol (never read - insert ends
      // the block - but the header must carry a valid code)
      w.bits(2, 1); w.bits(2, 0); w.bits(6, 0)
      // the single command: 0 tree bits, then insert extra bits
      w.bits(InsBits(insCode), len - InsBase(insCode))
      // literals: 8-bit canonical code = the byte itself, MSB-first
      var i = off
      while (i < off + len) { w.code(8, data(i) & 0xff); i += 1 }
    }
    w.finish()
  }
}
