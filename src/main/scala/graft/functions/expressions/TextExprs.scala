package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/fingerprint hot path
  * (SURVEY.md §2 row 51).
  *
  * The `functions._`-composed versions in [[graft.functions.TextOps]]
  * are correct but interpreted: Spark's higher-order functions
  * (`transform`/`aggregate`) don't participate in codegen, and the
  * composed shapes are O(n·k) or O(n²) per row (a `substr` per
  * position, a `slice` per window, k hash passes per shingle). On a
  * 100 TB corpus that's the whole job cost. Each expression here is a
  * single tight O(n) JVM loop per row, allocation-free where possible,
  * and produces values IDENTICAL to its composed counterpart in
  * [[graft.functions.TextOps]] (the md5-derived portable family for
  * the minhash/simhash/band kernels; builtin murmur3 for winnowing),
  * so either form can verify the other — and DuckDB can recompute the
  * md5-family values exactly for the oracles.
  *
  * CodegenFallback only virtualizes the per-row entry call — the
  * surrounding operators stay in whole-stage codegen, and the row
  * kernel itself is compiled Scala, not an interpreted expression
  * tree.
  */
object TextExprs {

  private def c(e: Expression): Column = Bridge.column(e)
  private def x(col: Column): Expression = Bridge.expression(col)

  /** MinHash signature with word-shingling fused in: tokens →
    * array<int> of length k. Duplicate shingles cannot change a min,
    * so no distinct/materialization step is needed.
    */
  def minhashShingleSig(tokens: Column, n: Int, k: Int): Column =
    c(MinHashShingleSig(x(tokens), n, k))

  /** 64-bit SimHash over a token array (xxhash64 per token, one pass). */
  def simhash64(tokens: Column): Column = c(SimHash64(x(tokens)))

  /** Portable 64-bit hash of a string — DuckDB's md5_number_lower as
    * a signed long; ONE digest per row (the composed
    * [[graft.functions.TextOps.md5Lower64]] evaluates md5 once per
    * assembled BYTE — Catalyst does not CSE across its 8 conv/
    * substring chains, an 8× overhead measured on the q46 filter).
    * Null hashes as the empty string, like the composed form.
    */
  def md5Lower64(s: Column): Column = c(Md5Lower64(x(s)))

  /** All w-token window hashes of a token array in one flattened
    * pass: element i = md5Lower64 of `concat_ws(' ', slice(arr, i+1,
    * w))` — the q74/q75 anchor kernel. `minOne` gives short docs one
    * whole-doc hash (the q72 shingle convention).
    */
  def windowMd5Hashes(tokens: Column, w: Int, minOne: Boolean = false): Column =
    c(WindowMd5Hashes(x(tokens), w, minOne))

  /** Winnowed rolling-hash fingerprints: string → sorted distinct
    * array<int> (char k-grams, window w).
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    c(WinnowFingerprints(x(text), k, w))

  /** Winnow anchor positions over a (pre-shifted) hash array: for
    * every window of `w` consecutive elements, the RIGHTMOST position
    * of the window minimum — distinct, ascending, 1-based (the q78
    * selection). Monotonic-deque kernel, O(m) per doc, vs the O(m·w)
    * slice-per-window composed form it replaces.
    */
  def winnowPositions(hashes: Column, w: Int): Column =
    c(WinnowPositions(x(hashes), w))

  /** Unicode NFC canonical composition of a string (see
    * [[NfcNormalize]]) — run BEFORE digests/shingles on multilingual
    * corpora so canonically-equal text hashes equal.
    */
  def nfcNormalize(s: Column): Column = c(NfcNormalize(x(s)))

  /** Charset-aware binary→string decode with REPLACEMENT semantics
    * (malformed/unmappable bytes become U+FFFD, never an exception):
    * the crawl-intake decoder ([[graft.sources.WarcSource.documents]]).
    * `label` is the declared charset label (the HTTP `charset=` param,
    * any case, empty/garbage tolerated) resolved through the
    * [[CharsetDecode.resolveFor]] allowlist: an unrecognized DECLARED
    * label decodes as UTF-8 (fail-open, pinned from SQL), while an
    * ABSENT label SNIFFS — structurally valid UTF-8 decodes as UTF-8,
    * anything else as windows-1252 (the WHATWG default for unlabeled
    * content; r14 — unlabeled legacy pages stop mangling to U+FFFD).
    */
  def charsetDecode(bytes: Column, label: Column): Column =
    c(CharsetDecode(x(bytes), x(label)))

  /** PDF payload → show-text, NULL for non-PDF/encrypted bytes (see
    * [[PdfExtractText]]).
    */
  def pdfExtractText(payload: Column): Column = c(PdfExtractText(x(payload)))

  /** ZIP-framed document payload (DOCX or EPUB) → document text,
    * NULL for non-ZIP bytes, plain archives, or corrupt/encrypted
    * members (see [[OfficeExtractText]]).
    */
  def officeExtractText(payload: Column): Column =
    c(OfficeExtractText(x(payload)))

  /** TAR payload → array of regular-file members as (name, data)
    * structs, NULL for non-tar bytes or past-cap archives (see
    * [[TarMembers]]).
    */
  def tarMembers(payload: Column): Column = c(TarMembers(x(payload)))

  /** Compressed payload (gzip/zstd/bzip2/xz) → decompressed content
    * as a members array (tar inside → its members; anything else →
    * one empty-string-named element), NULL for other/corrupt bytes
    * (see [[DecompressedMembers]]).
    */
  def decompressedMembers(payload: Column): Column =
    c(DecompressedMembers(x(payload)))

  /** 7z payload → array of regular-file members as (name, data)
    * structs, NULL for non-7z/encrypted/corrupt bytes or past-cap
    * archives (see [[SevenZMembers]]).
    */
  def sevenZMembers(payload: Column): Column =
    c(SevenZMembers(x(payload)))

  /** HTML string → STRUCT<title, description, canonical, noindex> —
    * the crawl-metadata fields (see
    * [[graft.functions.HtmlMeta.extract]] / [[HtmlMetaExtract]]).
    */
  def htmlMeta(html: Column): Column = c(HtmlMetaExtract(x(html)))

  /** Sitemap XML → ARRAY<STRUCT<loc, lastmod, from_index>>, NULL for
    * non-sitemap text or a past-cap file (see
    * [[graft.functions.Sitemap.parse]] / [[SitemapEntries]]).
    */
  def sitemapEntries(xml: Column): Column = c(SitemapEntries(x(xml)))

  /** Image-metadata PII scrub over a binary payload — the q147 strip
    * ([[graft.multimodal.Exif.strip]]: JPEG/PNG/WebP metadata
    * segments drop whole, standalone-TIFF GPS/DateTime zero in
    * place) as STRUCT<payload BINARY, scrubbed BOOLEAN, fenced
    * BOOLEAN>. Containers the scrub does not govern pass through
    * unchanged (scrubbed=false, fenced=false); a GOVERNED container
    * whose grammar broke gets a NULL payload and fenced=true — the
    * bytes may carry intact EXIF ahead of the breakage, and a
    * privacy-governed store must not keep what it could not scrub.
    * The two flags ARE the per-row billing the media face
    * aggregates.
    */
  def exifScrub(payload: Column): Column = c(ExifScrub(x(payload)))

  /** RFC 9309 allow/deny verdict for (robots.txt, agent, path) — the
    * crawl-politeness gate as a column expression (see
    * [[graft.functions.Robots.allowed]] / [[RobotsAllowed]]). The
    * policy column is typically a literal or a broadcast-joined
    * per-host value; the expression caches the parse across
    * consecutive rows with the same policy text.
    */
  def robotsAllowed(robots: Column, agent: Column,
                    path: Column): Column =
    c(RobotsAllowed(x(robots), x(agent), x(path)))

  /** The Crawl-delay the scheduler owes `agent` under the policy —
    * [[graft.functions.Robots.crawlDelay]] as a column (NULL when no
    * winning group declares one); same parse cache as
    * [[robotsAllowed]].
    */
  def robotsCrawlDelay(robots: Column, agent: Column): Column =
    c(RobotsCrawlDelay(x(robots), x(agent)))

  /** The canonical name [[charsetDecode]] will actually decode these
    * bytes with — "utf-8" for unknown declared labels, the sniffed
    * charset (utf-8 or windows-1252) for unlabeled payloads. Surfaced
    * as the `charset_used` evidence column; the ONE resolve table +
    * sniff both share.
    */
  def charsetResolve(bytes: Column, label: Column): Column =
    c(CharsetResolve(x(bytes), x(label)))

  /** q43's md5-prefix winnow fingerprints as ONE kernel: normalized
    * text → sorted distinct array of 16-hex-char window minima (char
    * `gram`-grams, window `win`). Value-identical to the composed
    * substr/md5/array_min/array_sort chain — see [[WinnowMd5Grams]]
    * for why the composed form is a latency landmine.
    */
  def winnowMd5Grams(norm: Column, gram: Int, win: Int): Column =
    c(WinnowMd5Grams(x(norm), gram, win))

  /** Distinct word n-gram shingles: tokens → array<string>. */
  def wordShingles(tokens: Column, n: Int): Column = c(WordShingles(x(tokens), n))

  /** Fraction of agreeing components of two int-array signatures —
    * the MinHash Jaccard estimator (identical to TextOps.sigJaccard).
    */
  def sigAgree(a: Column, b: Column, k: Int): Column = c(SigAgree(x(a), x(b), k))

  /** LSH band keys of an int-array signature: b bands of r rows,
    * band i's key = murmur3 fold of its slice (identical values to
    * TextOps.bandKeys' hash(slice(sig, i*r+1, r))).
    */
  def bandKeys(sig: Column, b: Int, r: Int): Column = c(BandKeys(x(sig), b, r))

  /** Fixed-point character-concentration index (q94): floor(10⁹ ·
    * Σ cnt(c)² / n²) over the string's code points; 0 for empty/NULL.
    */
  def charConc9(s: Column): Column = c(CharConcentration(x(s)))

  /** Row-object mirror of [[BandKeys]] for typed streaming state
    * stages (the MinHash band-bucket filter keys its state inside a
    * flatMapGroupsWithState, where rows are JVM objects, not
    * InternalRows): the SAME fold and constants, so a streaming
    * bucket key equals the batch q31 bucket key bit-for-bit —
    * NativeExprSpec pins the parity.
    */
  def bandKeysLocal(sig: Array[Int], b: Int, r: Int): Array[Int] = {
    val keys = new Array[Int](b)
    var band = 0
    while (band < b) {
      var j = band * r
      val end = math.min(j + r, sig.length)
      var h = if (j < end) sig(j).toLong else 0L
      j += 1
      while (j < end) {
        h = (h * Hashing.BandMult + sig(j)) % Hashing.M
        j += 1
      }
      keys(band) = h.toInt
      band += 1
    }
    keys
  }

  /** Row-object mirror of [[SigAgree]] (same truncation and divisor
    * conventions) — the streaming band-bucket filter's in-state
    * estimator, parity-pinned like [[bandKeysLocal]].
    */
  def sigAgreeLocal(a: Array[Int], b: Array[Int], k: Int): Double = {
    val n = math.min(a.length, b.length)
    var agree = 0
    var i = 0
    while (i < n) {
      if (a(i) == b(i)) agree += 1
      i += 1
    }
    agree.toDouble / k
  }
}

/** Hash kernels for the dedup expressions.
  *
  * The murmur3/xxhash64 kernels mirror Spark's builtin `hash`/
  * `xxhash64`. The md5-derived kernels are the ENGINE-PORTABLE family
  * used by the verified queries: md5 is bit-identical in every engine
  * (DuckDB mirrors these values exactly, so the DuckDB oracles for
  * q31/q32/q33 are exact), and k hash families come from one digest
  * via Kirsch–Mitzenmacher double hashing h_j = (x1 + j·x2) mod M —
  * one digest per shingle, k cheap modular ops.
  */
private object Hashing {
  @inline def murmur3(s: UTF8String, seed: Int): Int =
    Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** xxhash64 with Spark's default seed 42 — identical to the builtin
    * `xxhash64(col)` for a string input.
    */
  @inline def xx64(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  val Space: UTF8String = UTF8String.fromString(" ")

  /** Mersenne prime 2^31-1: every h_j fits an int, and (x1 + 63·x2)
    * stays far below 2^63 — the same arithmetic never overflows
    * DuckDB's checked BIGINT either.
    */
  val M: Long = 2147483647L

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  @inline def md5bytes(s: UTF8String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(s.getBytes)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** First 15 hex chars of the digest as a long (60 bits) — equals
    * DuckDB's parse of substr(md5(s),1,15).
    */
  @inline def hexPrefix15(d: Array[Byte]): Long = {
    // hex chars 1..15 = bytes 0..6 fully + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** First 16 hex chars of the digest as a long (the full first 8
    * bytes, big-endian): UNSIGNED numeric order of this value equals
    * byte-wise (UTF8String) order of the 16-char lowercase hex string
    * — the q43 fingerprint identity.
    */
  @inline def hexPrefix16(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** The 16-char lowercase hex rendering of [[hexPrefix16]]'s value —
    * byte-identical to `substring(md5hex, 1, 16)`.
    */
  def hex16(x: Long): UTF8String = {
    val cs = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      cs(j) = HexDigits(((x >>> ((15 - j) * 4)) & 0xfL).toInt).toByte
      j += 1
    }
    UTF8String.fromBytes(cs)
  }

  /** Hex chars 16..30 of the digest as a long (60 bits) — equals
    * DuckDB's parse of substr(md5(s),16,15).
    */
  @inline def hexMid15(d: Array[Byte]): Long = {
    var v = d(7) & 0x0fL // hex char 16 = low nibble of byte 7
    var i = 8
    while (i < 15) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Double-hashing bases from one digest: x1 in [0, M), x2 in
    * [1, M-1] (never 0, so the k families stay distinct).
    */
  @inline def doubleHashBases(s: UTF8String): (Long, Long) = {
    val d = md5bytes(s)
    (hexPrefix15(d) % M, hexMid15(d) % (M - 1) + 1)
  }

  @inline def lower64(d: Array[Byte]): Long = {
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v
  }

  /** Lower 8 digest bytes little-endian — exactly DuckDB's
    * md5_number_lower(s), reinterpreted as a signed long.
    */
  @inline def md5Lower64(s: UTF8String): Long = lower64(md5bytes(s))

  /** md5Lower64 over a byte range of a shared buffer — the window-scan
    * form: the caller flattens once and hashes n ranges with zero
    * per-window string construction.
    */
  @inline def md5Lower64Range(buf: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(buf, off, len)
    lower64(d.digest())
  }

  /** Portable band fold: h0 = first element, h = (h·65539 + v) mod M —
    * DuckDB's list_reduce(slice, (h,v) -> (h*65539+v) % 2147483647).
    */
  val BandMult: Long = 65539L
}

/** tokens: array<string>, n-gram shingles hashed by the md5
  * double-hashing family (see [[Hashing]]): per shingle one digest →
  * (x1, x2), family j's value is (x1 + j·x2) mod M, min per family.
  * One pass over positions; shingle string built once per position.
  * Values are engine-portable — the q31 DuckDB oracle recomputes them
  * exactly.
  */
case class MinHashShingleSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val mins = Array.fill(k)(Int.MaxValue)
    // mirror the composed wordShingles: if fewer than n tokens, the
    // single shingle is the (space-joined) whole token sequence
    val nShingles = math.max(nTok - (n - 1), 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < nShingles) {
      var j = 0
      var m = 0
      while (j < n && i + j < nTok) {
        val t = arr.getUTF8String(i + j)
        if (t != null) { parts(m) = t; m += 1 }
        j += 1
      }
      val shingle =
        if (m == 1) parts(0)
        else UTF8String.concatWs(Hashing.Space,
          java.util.Arrays.copyOfRange(parts, 0, m): _*)
      val (x1, x2) = Hashing.doubleHashBases(shingle)
      var s = 0
      var h = x1
      while (s < k) {
        // h = (x1 + s*x2) mod M, computed incrementally
        if (h < mins(s)) mins(s) = h.toInt
        h += x2
        if (h >= Hashing.M) h -= Hashing.M
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Lower 8 md5-digest bytes little-endian as a signed long — exactly
  * DuckDB's md5_number_lower(s) (and byte-identical to the composed
  * TextOps.md5Lower64, NativeExprSpec-verified). A null input hashes
  * as the empty string rather than propagating null: the hash feeds
  * sampling/sharding/HLL decisions where "null row id" must still
  * land somewhere deterministic.
  */
/** Unicode NFC normalization (canonical composition) — the text-
  * canonicalization step a multilingual corpus runs before hashing:
  * "é" typed as e + COMBINING ACUTE and "é" typed precomposed are the
  * SAME text to a reader but different bytes to every digest in this
  * library. JDK `java.text.Normalizer` NFC; DuckDB's `nfc_normalize`
  * (utf8proc) implements the same Unicode algorithm, so the q90
  * oracle compares the normalized strings character-for-character.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan and ASCII is
    // always NFC — avoids the String round-trip allocation per row on
    // the (dominant) already-normalized corpus
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The q43 fingerprint chain — char 8-grams digested to their 16-hex-
  * char md5 prefix, sliding-window minima, distinct, sorted — as one
  * O(n·win) kernel per row.
  *
  * The composed `transform(sequence(...), i -> substring(md5(substr
  * (...))))` chain it replaces is value-correct but QUADRATIC: higher-
  * order functions evaluate interpreted (they never join whole-stage
  * codegen and get no subexpression elimination), so the window step's
  * `array_min(slice(grams, j, win))` re-evaluates the ENTIRE gram
  * transform — n md5 digests — once per window position j, ~n² digests
  * per doc. Observed as a 500-doc/300-char corpus burning ~10 minutes
  * of one core inside the test suite. A native kernel has no such
  * failure mode: the cost is O(n·win) digests per row, period — the
  * same lesson as Md5Lower64's 8×-digest fix, one order worse.
  *
  * Internals: a gram's 16-char lowercase hex prefix compares (as a
  * UTF8String) exactly like its first 8 digest bytes compare as an
  * UNSIGNED long, so minima/distinct/sort all run on a long array and
  * the hex strings are materialized once, at the end
  * ([[Hashing.hexPrefix16]]/[[Hashing.hex16]]). NULL input behaves as
  * the empty document (empty array), matching the composed form's
  * `when(length(norm) >= gram, ...)` null-to-false branch.
  */
case class WinnowMd5Grams(child: Expression, gram: Int, win: Int)
    extends UnaryExpression with CodegenFallback {

  require(gram >= 1 && win >= 1, s"need gram/win >= 1, got $gram/$win")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) UTF8String.EMPTY_UTF8 else v.asInstanceOf[UTF8String]
    val n = s.numChars()
    if (n < gram) return new GenericArrayData(Array.empty[Any])
    val m = n - gram + 1
    val gs = new Array[Long](m)
    var i = 0
    while (i < m) {
      // substringSQL is the Substring expression's own kernel (1-based,
      // character-indexed), so the bytes digested here are exactly the
      // composed form's substr(norm, i, gram) cast to binary
      gs(i) = Hashing.hexPrefix16(
        Hashing.md5bytes(s.substringSQL(i + 1, gram)))
      i += 1
    }
    val nw = if (m < win) 1 else m - win + 1
    val wins = new Array[Long](nw)
    var j = 0
    while (j < nw) {
      val lim = math.min(win, m)
      var mn = gs(j)
      var k = 1
      while (k < lim) {
        if (java.lang.Long.compareUnsigned(gs(j + k), mn) < 0) mn = gs(j + k)
        k += 1
      }
      wins(j) = mn
      j += 1
    }
    // distinct + UNSIGNED ascending == array_sort(array_distinct(hex));
    // flip the sign bit so the JDK's signed sort orders unsigned
    val uniq = wins.distinct
    var f = 0
    while (f < uniq.length) { uniq(f) = uniq(f) ^ Long.MinValue; f += 1 }
    java.util.Arrays.sort(uniq)
    val out = new Array[Any](uniq.length)
    var o = 0
    while (o < uniq.length) {
      out(o) = Hashing.hex16(uniq(o) ^ Long.MinValue)
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class Md5Lower64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) UTF8String.EMPTY_UTF8 else v.asInstanceOf[UTF8String]
    java.lang.Long.valueOf(Hashing.md5Lower64(s))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** tokens: array<string> → array<long> of ALL w-token window hashes:
  * element i (0-based) is md5Lower64 of the space-joined window
  * `tokens[i .. i+w-1]` — value-identical to
  * `md5Lower64(concat_ws(' ', slice(arr, i+1, w)))`, which the q74
  * DuckDB oracle recomputes exactly. Fewer than w tokens → empty
  * array (the caller's size-filter semantics).
  *
  * The composed anchor pass builds, PER POSITION, a `slice` array, a
  * `named_struct`, and a `concat_ws` string inside a higher-order
  * `transform` — O(n) short-lived objects per doc just to feed the
  * digest. Here the token array is flattened ONCE into a byte buffer
  * with single-space separators (token i starting at off(i)); window
  * i's bytes are then the contiguous range
  * [off(i), off(i+w-1)+len(i+w-1)) and each hash is one digest over
  * that range — zero per-window allocation beyond the output array.
  *
  * A null token cannot come from `tokens()` (split never yields null)
  * but hand-built arrays must not NPE: any null falls back to the
  * per-window concatWs form, which skips nulls exactly like the
  * composed concat_ws.
  *
  * `minOne = true` mirrors the q72/minhash shingle convention
  * `sequence(1, greatest(n - w + 1, 1))`: a doc shorter than the
  * window still yields ONE hash — of all its tokens joined, which is
  * exactly `concat_ws(' ', slice(arr, 1, w))` since slice truncates.
  */

case class WindowMd5Hashes(child: Expression, w: Int, minOne: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  require(w >= 2, s"window must be >= 2 tokens, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w && !minOne) return new GenericArrayData(Array.empty[Long])
    evalWindows(arr, n)
  }

  private def evalWindows(arr: ArrayData, n: Int): Any = {
    if (n == 0) // minOne over an empty array: concat_ws of nothing = ""
      return new GenericArrayData(Array(Hashing.md5Lower64(UTF8String.EMPTY_UTF8)))
    val toks = new Array[UTF8String](n)
    var anyNull = false
    var total = n - 1 // the n-1 separator spaces
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      toks(i) = t
      if (t == null) anyNull = true else total += t.numBytes
      i += 1
    }
    val nWin = math.max(n - w + 1, 1)
    val out = new Array[Long](nWin)
    if (anyNull) {
      // defensive slow path, byte-identical to concat_ws over the slice
      val parts = new Array[UTF8String](w)
      i = 0
      while (i < nWin) {
        var j = 0
        var m = 0
        while (j < w && i + j < n) {
          val t = toks(i + j)
          if (t != null) { parts(m) = t; m += 1 }
          j += 1
        }
        val window =
          if (m == 0) UTF8String.EMPTY_UTF8
          else if (m == 1) parts(0)
          else UTF8String.concatWs(Hashing.Space,
            java.util.Arrays.copyOfRange(parts, 0, m): _*)
        out(i) = Hashing.md5Lower64(window)
        i += 1
      }
      return new GenericArrayData(out)
    }
    val flat = new Array[Byte](total)
    val off = new Array[Int](n)
    var cur = 0
    i = 0
    while (i < n) {
      off(i) = cur
      val t = toks(i)
      t.writeToMemory(flat, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + cur)
      cur += t.numBytes
      if (i < n - 1) { flat(cur) = ' '; cur += 1 }
      i += 1
    }
    i = 0
    while (i < nWin) {
      val last = math.min(i + w - 1, n - 1) // slice truncates short windows
      val end = off(last) + toks(last).numBytes
      out(i) = Hashing.md5Lower64Range(flat, off(i), end - off(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-window rightmost-argmin selection over a LongType array — the
  * q78 winnowing kernel ([[graft.operators.SubstrDedup.winnowSelect]]).
  * Input is the already-shifted (unsigned-comparable) hash array;
  * windows are every `w` consecutive elements (one window over the
  * whole array when it is shorter). Output positions are 1-based,
  * strictly ascending, each window's selection emitted once.
  *
  * The deque invariant is strictly-increasing values front→back:
  * pushing pops `>=` ties from the back, so among equal minima the
  * LATEST index survives — exactly the rightmost-tie rule the
  * composed slice/array_position form implements (and the DuckDB
  * oracle replays); selections across successive windows are
  * non-decreasing, so de-dup is one last-emitted check.
  */
case class WinnowPositions(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val ww = math.min(w, n)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = arr.getLong(i); i += 1 }
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Long](n - ww + 1)
    var m = 0
    var last = -1
    i = 0
    while (i < n) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) < i - ww + 1) head += 1
      if (i >= ww - 1) {
        val sel = deque(head)
        if (sel != last) { out(m) = (sel + 1).toLong; m += 1; last = sel }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(out, 0, m))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowPositions =
    copy(child = newChild)
}

/** tokens: array<string> → 64-bit SimHash (Charikar '02): per token
  * the md5-lower-64 hash (= DuckDB's md5_number_lower, so the q32
  * oracle is exact); bit b of the result set iff the +1/-1 vote sum
  * over tokens' bit b is positive. Matches TextOps.simhash64
  * bit-for-bit.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val nTok = arr.numElements()
    var i = 0
    while (i < nTok) {
      val t = arr.getUTF8String(i)
      // a null token hashes as the empty string (split() never yields
      // null, but the expression must not NPE on hand-built arrays)
      val h = Hashing.md5Lower64(
        if (t != null) t else UTF8String.EMPTY_UTF8)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Band keys for MinHash-LSH: the signature's b contiguous slices of
  * r components, each folded h = (h·65539 + v) mod M starting from the
  * slice's first element — exactly DuckDB's
  * list_reduce(sig[i·r+1 : i·r+r], (h,v) -> (h*65539+v) % 2147483647),
  * so the q31/q33 oracles rebuild identical bucket keys.
  */
case class BandKeys(child: Expression, b: Int, r: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val keys = new Array[Int](b)
    var band = 0
    while (band < b) {
      var j = band * r
      val end = math.min(j + r, sig.numElements())
      var h = if (j < end) sig.getInt(j).toLong else 0L
      j += 1
      while (j < end) {
        h = (h * Hashing.BandMult + sig.getInt(j)) % Hashing.M
        j += 1
      }
      keys(band) = h.toInt
      band += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Agreement fraction of two equal-length int signatures: the MinHash
  * estimate of Jaccard similarity. Evaluated once per candidate pair
  * inside the LSH bucket join — the single hottest expression of the
  * dedup pipeline, so it must be a plain loop, not an interpreted
  * zip_with/aggregate tree.
  */
case class SigAgree(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (va.getInt(i) == vb.getInt(i)) agree += 1
      i += 1
    }
    java.lang.Double.valueOf(agree.toDouble / k)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** text: string → winnowed fingerprints (Schleimer et al. SIGMOD'03):
  * rolling murmur3 of each char k-gram, then the min of every sliding
  * window of w consecutive gram hashes (monotonic-deque, O(n)),
  * distinct + sorted. Shared substrings of length >= w+k-1 are
  * guaranteed to share a fingerprint.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // grams are CODE-POINT k-grams (matching substr()'s character
    // semantics, and never splitting a surrogate pair): precompute the
    // UTF-16 offset of each code point once, O(n)
    val nCp = s.codePointCount(0, s.length)
    val cpOff = new Array[Int](nCp + 1)
    var ci = 0
    var off = 0
    while (ci < nCp) {
      cpOff(ci) = off
      off = s.offsetByCodePoints(off, 1)
      ci += 1
    }
    cpOff(nCp) = s.length
    val nGrams = math.max(nCp - (k - 1), 1)
    val grams = new Array[Int](nGrams)
    var i = 0
    while (i < nGrams) {
      // murmur3 over the k-gram's UTF-8 bytes (seed 42, like builtin
      // hash()); substring cost is O(k) per position → O(n·k) total,
      // constant k — not the O(n²) of per-position substr scans.
      val end = cpOff(math.min(i + k, nCp))
      grams(i) = Hashing.murmur3(
        UTF8String.fromString(s.substring(cpOff(i), end)), 42)
      i += 1
    }
    val out = new java.util.TreeSet[Integer]()
    // monotonic deque of gram indices with increasing hash values:
    // head always holds the current window's min → O(n) total
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // live range [head, tail)
    i = 0
    while (i < nGrams) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) < i - (w - 1)) head += 1
      if (i >= w - 1) out.add(grams(deque(head)))
      i += 1
    }
    // shorter than one window: emit the global min (one fingerprint)
    if (nGrams < w) out.add(grams(deque(head)))
    val res = new Array[Int](out.size())
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next().intValue(); j += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** tokens: array<string> → distinct word n-gram shingle strings (the
  * exact-Jaccard unit for q33). Linked-hash preserves first-seen order
  * like array_distinct does.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val nShingles = math.max(nTok - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < nShingles) {
      var j = 0; var m = 0
      while (j < n && i + j < nTok) {
        val t = arr.getUTF8String(i + j)
        if (t != null) { parts(m) = t; m += 1 }
        j += 1
      }
      val shingle =
        if (m == 1) parts(0)
        else UTF8String.concatWs(Hashing.Space,
          java.util.Arrays.copyOfRange(parts, 0, m): _*)
      seen.add(shingle.clone())
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Character-concentration index: the Simpson/Herfindahl index of the
  * string's code-point distribution, in fixed-point nano-units —
  * floor(10⁹ · Σ_c cnt(c)² / n²), where n is the code-point count.
  * A gibberish/repetition quality signal (the collision-probability
  * face of Rényi-2 entropy): uniform text over k distinct chars
  * scores ≈10⁹/k, a single repeated char scores 10⁹. Unlike Shannon
  * entropy it needs NO logarithm, so the value is a ratio of exact
  * integers and DuckDB recomputes it bit-for-bit (per-char unnest +
  * HUGEINT arithmetic) — the libm-free exactness rule of Q.scala.
  *
  * NULL/empty → 0 (the coalesce-totality convention; every doc keeps
  * a row and a filter decides on a visible value).
  *
  * One O(n) pass per row: an open-addressing probe over a small
  * power-of-two table keyed by code point (documents hold dozens of
  * distinct chars, so the table stays in L1; resize doubles on 70%
  * load). Σ cnt² ≤ n² can reach 10¹⁰ for long docs, so the final
  * 10⁹-scaling runs in BigInteger — once per row, off the hot loop.
  */
case class CharConcentration(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) "" else v.asInstanceOf[UTF8String].toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return java.lang.Long.valueOf(0L)
    var cap = 64
    var keys = new Array[Int](cap)      // code point + 1 (0 = empty slot)
    var cnts = new Array[Long](cap)
    var used = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val k = cp + 1
      var slot = (k * -1640531527) & (cap - 1) // Knuth multiplicative probe
      while (keys(slot) != 0 && keys(slot) != k) slot = (slot + 1) & (cap - 1)
      if (keys(slot) == 0) { keys(slot) = k; used += 1 }
      cnts(slot) += 1L
      if (used * 10 > cap * 7) { // resize at 70% load
        val ok = keys; val oc = cnts; val ocap = cap
        cap <<= 1
        keys = new Array[Int](cap); cnts = new Array[Long](cap)
        var j = 0
        while (j < ocap) {
          if (ok(j) != 0) {
            var t = (ok(j) * -1640531527) & (cap - 1)
            while (keys(t) != 0) t = (t + 1) & (cap - 1)
            keys(t) = ok(j); cnts(t) = oc(j)
          }
          j += 1
        }
      }
    }
    var sumSq = java.math.BigInteger.ZERO
    var acc = 0L // batch exact Long sums, widen only on (rare) risk
    var j = 0
    while (j < cap) {
      if (keys(j) != 0) {
        val sq = cnts(j) * cnts(j) // cnt ≤ n ≤ 2^31: no Long overflow
        if (acc > Long.MaxValue - sq) {
          sumSq = sumSq.add(java.math.BigInteger.valueOf(acc)); acc = 0L
        }
        acc += sq
      }
      j += 1
    }
    sumSq = sumSq.add(java.math.BigInteger.valueOf(acc))
    val nn = java.math.BigInteger.valueOf(n.toLong).pow(2)
    val scaled = sumSq.multiply(java.math.BigInteger.valueOf(1000000000L)).divide(nn)
    java.lang.Long.valueOf(scaled.longValueExact())
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Charset-aware decode: bytes + declared label → string, with
  * CodingErrorAction.REPLACE on both malformed input and unmappable
  * characters (one bad byte costs one U+FFFD, never a row or a task —
  * the Netpbm fence discipline applied to text). The label goes
  * through [[CharsetDecode.resolveFor]]'s ALLOWLIST: only charsets a
  * crawl actually declares and the JVM ships decoders for. An unknown
  * DECLARED label falls back to UTF-8 (a lying or exotic label can
  * neither crash the decode nor route bytes through a charset that
  * would silently mangle ASCII); an ABSENT label runs the bounded
  * windows-1252 sniff (resolveFor scaladoc).
  *
  * Null contract: null bytes → null; a null LABEL sniffs like the
  * empty label (an absent HTTP header must not null out real text),
  * so this overrides [[BinaryExpression]]'s both-children null gate.
  */
case class CharsetDecode(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val bytes = left.eval(input)
    if (bytes == null) return null
    val label = right.eval(input)
    val cs = CharsetDecode.resolveFor(bytes.asInstanceOf[Array[Byte]],
      if (label == null) "" else label.toString)
    UTF8String.fromString(CharsetDecode.decode(
      bytes.asInstanceOf[Array[Byte]], cs))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object CharsetDecode {
  import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

  /** Label → JVM charset allowlist (lowercased HTTP labels and their
    * common aliases). The list covers what a real crawl declares:
    * the latin-1/windows-1252 family, the CJK set, cyrillic, and the
    * ISO-8859 variants; everything else — including multi-byte
    * charsets the JVM may know but the pipeline has not vetted for
    * replacement-mode safety — decodes as UTF-8.
    */
  private val allow: Map[String, Charset] = {
    def cs(n: String) = Charset.forName(n)
    val pairs = Seq(
      Seq("utf-8", "utf8", "us-ascii", "ascii") -> StandardCharsets.UTF_8,
      Seq("iso-8859-1", "iso8859-1", "iso_8859-1", "latin-1", "latin1",
        "l1") -> StandardCharsets.ISO_8859_1,
      Seq("windows-1252", "cp1252", "win-1252") -> cs("windows-1252"),
      Seq("windows-1251", "cp1251") -> cs("windows-1251"),
      Seq("windows-1250", "cp1250") -> cs("windows-1250"),
      Seq("windows-1256", "cp1256") -> cs("windows-1256"),
      Seq("iso-8859-2", "iso8859-2", "latin2") -> cs("ISO-8859-2"),
      Seq("iso-8859-5") -> cs("ISO-8859-5"),
      Seq("iso-8859-7") -> cs("ISO-8859-7"),
      Seq("iso-8859-9", "latin5") -> cs("ISO-8859-9"),
      Seq("iso-8859-15", "latin9") -> cs("ISO-8859-15"),
      Seq("koi8-r", "koi8") -> cs("KOI8-R"),
      Seq("shift_jis", "shift-jis", "sjis", "x-sjis", "ms_kanji")
        -> cs("Shift_JIS"),
      Seq("euc-jp", "eucjp", "x-euc-jp") -> cs("EUC-JP"),
      Seq("euc-kr", "euckr", "ks_c_5601-1987", "ksc5601") -> cs("EUC-KR"),
      Seq("gb2312", "gbk", "x-gbk", "gb_2312-80") -> cs("GBK"),
      Seq("gb18030") -> cs("GB18030"),
      Seq("big5", "big-5", "csbig5") -> cs("Big5"))
    pairs.flatMap { case (labels, c) => labels.map(_ -> c) }.toMap
  }

  /** Sniff scan bound: UTF-8 evidence is overwhelming within the
    * first tens of KiB of any real page; capping also caps the
    * unlabeled path's extra CPU (the decode and the charset_used
    * evidence each run the sniff — ≤ 2·64 KiB per doc, not 2·body).
    */
  val SniffWindow: Int = 64 * 1024

  /** STRICT structural UTF-8 validation (overlongs, surrogates, >U+10FFFF
    * and truncated tails all fail) — allocation-free single pass.
    */
  def isValidUtf8(b: Array[Byte]): Boolean = utf8Evidence(b, b.length) match {
    case (0, _) => true
    case _ => false
  }

  /** UTF-8 evidence over the first `limit` bytes: (invalid sequence
    * count, valid MULTIBYTE sequence count). A sequence cut by the
    * scan limit is neutral — not evidence either way. Strict rules
    * (overlongs, surrogates, >U+10FFFF invalid).
    */
  def utf8Evidence(b: Array[Byte], limit: Int): (Int, Int) = {
    var bad = 0; var good = 0
    var i = 0
    val n = math.min(limit, b.length)
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) { bad += 1; i += 1 } // continuation/overlong lead
      else {
        val len = if (c < 0xe0) 2 else if (c < 0xf0) 3
          else if (c < 0xf5) 4 else 0
        if (len == 0) { bad += 1; i += 1 }
        else if (i + len > n) {
          // cut by the window: neutral; cut by real EOF: damaged tail
          if (n == b.length) bad += 1
          i = n
        } else {
          var ok = true
          var j = 1
          while (ok && j < len) {
            if ((b(i + j) & 0xc0) != 0x80) ok = false
            j += 1
          }
          val c1 = b(i + 1) & 0xff
          if (c == 0xe0 && c1 < 0xa0) ok = false // 3-byte overlong
          if (c == 0xed && c1 > 0x9f) ok = false // surrogates
          if (c == 0xf0 && c1 < 0x90) ok = false // 4-byte overlong
          if (c == 0xf4 && c1 > 0x8f) ok = false // > U+10FFFF
          if (ok) { good += 1; i += len }
          else { bad += 1; i += 1 }
        }
      }
    }
    (bad, good)
  }

  /** The charset the PAYLOAD decodes with: a recognized declared
    * label wins; an unrecognized-but-present label keeps the
    * documented UTF-8 fail-open; an ABSENT label SNIFFS the first
    * [[SniffWindow]] bytes — windows-1252 (the WHATWG default for
    * unlabeled content; it maps every byte so the decode stays total)
    * only when INVALID sequences OUTNUMBER valid multibyte ones, so a
    * genuine UTF-8 page with a few stray corrupt bytes stays UTF-8
    * (isolated U+FFFDs, the r13 behavior) instead of flipping the
    * whole page to mangled latin — the sniff needs preponderant
    * legacy evidence, not a single bad byte.
    */
  def resolveFor(bytes: Array[Byte], label: String): Charset = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    allow.get(l) match {
      case Some(cs) => cs
      case None if l.nonEmpty => StandardCharsets.UTF_8
      case None =>
        if (bytes == null) StandardCharsets.UTF_8
        else {
          val (bad, good) = utf8Evidence(bytes, SniffWindow)
          if (bad > good) Charset.forName("windows-1252")
          else StandardCharsets.UTF_8
        }
    }
  }

  /** Replacement-mode decode: a fresh decoder per call (CharsetDecoder
    * is stateful and NOT thread-safe; `newDecoder` is cheap — two
    * small allocations — next to the per-row String it produces).
    */
  def decode(bytes: Array[Byte], cs: Charset): String =
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
      .decode(java.nio.ByteBuffer.wrap(bytes))
      .toString
}

/** [[CharsetDecode.resolveFor]]'s canonical name as a column — what
  * [[CharsetDecode]] ACTUALLY decoded these bytes with: the
  * `charset_used` evidence. Body-aware since r14 (the unlabeled-page
  * sniff: valid UTF-8 → "utf-8", else "windows-1252"), so the
  * evidence can never disagree with the decode; both run the ONE
  * resolve table + sniff. Null label resolves like the empty label;
  * null bytes report the label-only resolution.
  */
case class CharsetResolve(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val bytes = left.eval(input)
    val label = right.eval(input)
    val cs = CharsetDecode.resolveFor(
      if (bytes == null) null else bytes.asInstanceOf[Array[Byte]],
      if (label == null) "" else label.toString)
    UTF8String.fromString(cs.name.toLowerCase(java.util.Locale.ROOT))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Best-effort PDF text extraction as an expression: binary payload →
  * the document's show-text ([[graft.multimodal.PdfText.extract]] —
  * Flate streams, BT…ET show operators, the full string-escape
  * grammar), NULL when the payload is not a PDF or is encrypted
  * (ciphertext must not reach a text corpus). The expression form is
  * what lets the crawl face ([[graft.sources.WarcSource.pdfDocuments]])
  * stay pure Column ops — ts passthrough and the streaming mirror
  * come for free, the repo's no-UDF convention.
  */
case class PdfExtractText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    graft.multimodal.PdfText.extract(input.asInstanceOf[Array[Byte]]) match {
      case Some(t) => UTF8String.fromString(t)
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Best-effort ZIP-framed document text extraction as an expression:
  * DOCX first ([[graft.multimodal.Docx.extractText]] — central-
  * directory walk, `_rels` main-part resolution, the bounded
  * `w:t`/`w:tab`/`w:br` scan with no entity resolution), then EPUB
  * ([[graft.multimodal.Epub.extractText]] — container.xml → OPF
  * spine → XHTML chapters); NULL when the bytes are not a ZIP, carry
  * neither document shape (plain archives stay opaque media), or the
  * member is encrypted/corrupt (ciphertext and partial inflate must
  * not reach a text corpus — the [[PdfExtractText]] rationale). The
  * expression form keeps the crawl face ([[graft.sources.WarcSource
  * .officeDocuments]]) pure Column ops — ts passthrough and the
  * streaming mirror come for free, the repo's no-UDF convention.
  */
/** Bounded decompression for served compressed FILES: a crawl serves
  * real .gz/.zst/.bz2/.xz response bodies (sitemap.xml.gz is
  * ubiquitous; dataset mirrors serve the rest) — these are not
  * Content-Encoding (the record walk already undoes transport
  * codings) but entity bytes, and without this their text rots in
  * the media face as opaque blobs. Null when the bytes are none of
  * the four codings, the stream is truncated or corrupt (partial
  * output must not become corpus text — the truncated-Flate rule),
  * or output exceeds the 64 MiB bomb cap. ONE decompression level:
  * a gz-in-gz stays compressed (the caller's sniff of the output
  * governs routing). Consumed through [[DecompressedMembers]] (the
  * expression face); the kernel is an object method so the two stay
  * one implementation.
  */
object DecompressBytes {
  private val MaxOut = 64 * 1024 * 1024

  /** The one decompression kernel (magic-dispatched, bomb-capped,
    * truncation → null) — shared by the scalar expression and the
    * members form. Four codings, each through a stream Spark already
    * ships: gzip/zstd (the dominant pair), bzip2 and xz (the dataset
    * mirrors' pair — commons-compress and the xz library are on
    * every Spark classpath).
    */
  private[expressions] def decompress(bytes: Array[Byte]): Array[Byte] = {
    // every decoder's CONSTRUCTOR reads the stream header and can
    // itself throw on crafted bytes — construction must sit inside
    // the same fence as the drain (a 2-byte magic + garbage header
    // must yield null, never a task death). NOTE: no early `return`
    // inside the try — scalac emits invalid stackmap frames for a
    // non-local return crossing this try/finally shape (VerifyError
    // at task time), so the body is pure expression flow.
    def open(): java.io.InputStream =
      if (bytes.length >= 18 && bytes(0) == 0x1f.toByte &&
          bytes(1) == 0x8b.toByte)
        new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
      else if (bytes.length >= 4 && bytes(0) == 0x28.toByte &&
               bytes(1) == 0xb5.toByte && bytes(2) == 0x2f.toByte &&
               bytes(3) == 0xfd.toByte)
        new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(bytes))
      else if (bytes.length >= 10 && bytes(0) == 'B' && bytes(1) == 'Z' &&
               bytes(2) == 'h' && bytes(3) >= '1' && bytes(3) <= '9' &&
               bytes(4) == 0x31 && bytes(5) == 0x41 && bytes(6) == 0x59)
        new org.apache.commons.compress.compressors.bzip2
          .BZip2CompressorInputStream(
            new java.io.ByteArrayInputStream(bytes))
      else if (bytes.length >= 6 && bytes(0) == 0xFD.toByte &&
               bytes(1) == '7' && bytes(2) == 'z' && bytes(3) == 'X' &&
               bytes(4) == 'Z' && bytes(5) == 0)
        new org.apache.commons.compress.compressors.xz
          .XZCompressorInputStream(new java.io.ByteArrayInputStream(bytes))
      else null
    var in: java.io.InputStream = null
    try {
      in = open()
      if (in == null) null
      else {
        // initial capacity bounded by the output cap: bytes.length*3
        // overflows Int past ~715 MB (IllegalArgumentException the
        // IOException fence would NOT catch — task death), and even
        // below that, preallocating 3× a large input for output
        // capped at 64 MiB is waste
        val out = new java.io.ByteArrayOutputStream(
          math.min(bytes.length.toLong * 3 + 64, 1L << 20).toInt)
        val buf = new Array[Byte](1 << 16)
        var over = false
        var n = in.read(buf)
        while (n >= 0 && !over) {
          out.write(buf, 0, n)
          if (out.size() > MaxOut) over = true
          else n = in.read(buf)
        }
        if (over) null else out.toByteArray
      }
    } catch {
      case _: java.io.IOException => null // truncated/corrupt: fence
    } finally {
      if (in != null) { scala.util.Try(in.close()); () }
    }
  }
}

/** The served-compressed-file MEMBERS form: decompress ONCE
  * (gzip/zstd/bzip2/xz by magic), then — if the inner bytes are a
  * tar (checksum-validated by [[graft.multimodal.Tar.entries]], no
  * second magic table to drift) — the archive's regular members;
  * otherwise the inner blob as ONE element whose name is the EMPTY
  * string (not null: the consumer distinguishes "the record's own
  * body" (null) from "bytes produced by decompression" ("") — the
  * latter must be sniffed on their own evidence). A tar past the
  * member-count cap also surfaces as the single blob element
  * (Tar.entries fences it to None; the consumer's sniff gate then
  * refuses the x-tar blob — stated, because a bare "NULL on
  * past-cap" promise here would not match the behavior). NULL for
  * non-compressed bytes or corrupt/truncated streams. This is what
  * lets the documents face handle body/gz/tar/tar.gz in ONE
  * projection over ONE scan: every heavy evaluation lives inside
  * this single expression behind the face's single Generate.
  */
case class DecompressedMembers(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TarMembers.MembersType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val inner =
      DecompressBytes.decompress(input.asInstanceOf[Array[Byte]])
    if (inner == null) return null
    graft.multimodal.Tar.entries(inner) match {
      case Some(es) => TarMembers.toArrayData(inner, es)
      case None =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(""), inner)))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** HTML crawl-metadata extraction as an expression — one pass of the
  * [[graft.functions.HtmlMeta]] scanner per page returning
  * STRUCT<title STRING, description STRING, canonical STRING,
  * noindex BOOLEAN> (nulls where the page declares nothing; noindex
  * false by default). Column-native so the crawl faces can project
  * it inside the same scan that gates the text — no second parse.
  */
case class HtmlMetaExtract(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("title", StringType),
      org.apache.spark.sql.types.StructField("description", StringType),
      org.apache.spark.sql.types.StructField("canonical", StringType),
      org.apache.spark.sql.types.StructField("noindex",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val m = graft.functions.HtmlMeta.extract(input.toString)
    def u(o: Option[String]): Any =
      o.map(UTF8String.fromString).orNull
    org.apache.spark.sql.catalyst.InternalRow(
      u(m.title), u(m.description), u(m.canonical), m.noindex)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sitemap entry listing as an expression — one
  * [[graft.functions.Sitemap.parse]] pass per document returning
  * ARRAY<STRUCT<loc STRING, lastmod STRING, from_index BOOLEAN>>,
  * NULL for non-sitemap text (prose mentioning "urlset" sheds no
  * fake URLs) or a file lying past the protocol's 50k cap. The
  * crawl face explodes the array — the [[TarMembers]] Generate
  * contract on the frontier format.
  */
case class SitemapEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("loc", StringType),
        org.apache.spark.sql.types.StructField("lastmod", StringType),
        org.apache.spark.sql.types.StructField("from_index",
          org.apache.spark.sql.types.BooleanType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    graft.functions.Sitemap.parse(input.toString) match {
      case Some(es) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          es.map { e =>
            org.apache.spark.sql.catalyst.InternalRow(
              UTF8String.fromString(e.loc),
              e.lastmod.map(UTF8String.fromString).orNull,
              e.fromIndex)
          }.toArray[Any])
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Image-metadata PII scrub as an expression (see
  * [[TextExprs.exifScrub]]): one [[graft.multimodal.Exif.strip]]
  * pass per payload, returning the governed-and-scrubbed bytes plus
  * whether anything changed — `scrubbed` is true only when bytes
  * actually differ, so an already-clean JPEG bills nothing. The
  * struct return (rather than two expressions) keeps the strip to
  * ONE evaluation per row behind the face's Generate barrier.
  */
case class ExifScrub(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("scrubbed",
        org.apache.spark.sql.types.BooleanType, nullable = false),
      org.apache.spark.sql.types.StructField("fenced",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    graft.multimodal.Exif.strip(bytes) match {
      case Some(s) =>
        val changed = !java.util.Arrays.equals(s, bytes)
        org.apache.spark.sql.catalyst.InternalRow(
          if (changed) s else bytes, changed, false)
      case None =>
        // governed container, broken grammar: a scrub that cannot
        // run must not let the bytes through (the PII may sit intact
        // ahead of the breakage)
        if (graft.multimodal.Exif.governs(bytes))
          org.apache.spark.sql.catalyst.InternalRow(null, false, true)
        else
          org.apache.spark.sql.catalyst.InternalRow(bytes, false, false)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** RFC 9309 allow/deny as an expression — the crawl-politeness
  * verdict ([[graft.functions.Robots.allowed]]) per (robots.txt,
  * agent, path) row, column-native so the frontier face runs as ONE
  * codegen'd projection instead of a typed `Dataset.map` behind a
  * serde boundary (the only operator arm that ever deserialized
  * rows; r15 verdict). The policy text is near-constant per plan — a
  * literal, or a per-host value off a broadcast join — so the parse
  * is cached across consecutive rows with identical text: one
  * [[graft.functions.Robots.parse]] per distinct policy per task,
  * not per row. The cached key is a DEFENSIVE COPY of the incoming
  * UTF8String (the evaluator reuses row buffers; caching the
  * reference would alias whatever bytes the buffer holds next).
  */
case class RobotsAllowed(first: Expression, second: Expression,
                         third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType

  @transient private[this] var lastTxt: UTF8String = _
  @transient private[this] var lastGroups
      : Vector[graft.functions.Robots.Group] = _

  override def nullSafeEval(robots: Any, agent: Any, path: Any): Any = {
    val txt = robots.asInstanceOf[UTF8String]
    if (lastTxt == null || !lastTxt.equals(txt)) {
      lastTxt = txt.clone()
      lastGroups = graft.functions.Robots.parse(txt.toString)
    }
    graft.functions.Robots.allowed(lastGroups,
      agent.toString, path.toString)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Crawl-delay as an expression (see [[TextExprs.robotsCrawlDelay]])
  * — the politeness-rate half of the frontier verdict: DOUBLE
  * seconds, NULL when the winning group declares none. Same
  * last-policy parse cache as [[RobotsAllowed]] (defensive
  * UTF8String copy — row buffers are reused).
  */
case class RobotsCrawlDelay(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  @transient private[this] var lastTxt: UTF8String = _
  @transient private[this] var lastGroups
      : Vector[graft.functions.Robots.Group] = _

  override def nullSafeEval(robots: Any, agent: Any): Any = {
    val txt = robots.asInstanceOf[UTF8String]
    if (lastTxt == null || !lastTxt.equals(txt)) {
      lastTxt = txt.clone()
      lastGroups = graft.functions.Robots.parse(txt.toString)
    }
    graft.functions.Robots.crawlDelay(lastGroups, agent.toString)
      .map(Double.box).orNull
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 7z member listing as an expression — [[TarMembers]]'s shape over
  * [[graft.multimodal.SevenZ.members]] (commons-compress walk with
  * the repo's member/byte caps and whole-archive fences): ARRAY of
  * (name, data) structs, NULL for non-7z bytes, encrypted/corrupt/
  * truncated archives, or a tripped cap. Same Generate contract as
  * the tar arm in the documents face.
  */
case class SevenZMembers(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TarMembers.MembersType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    graft.multimodal.SevenZ.members(input.asInstanceOf[Array[Byte]]) match {
      case Some(ms) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ms.map { case (name, data) =>
            org.apache.spark.sql.catalyst.InternalRow(
              UTF8String.fromString(name), data)
          }.toArray[Any])
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** TAR member listing as an expression: archive payload → ARRAY of
  * (name, data) structs for the REGULAR-FILE members
  * ([[graft.multimodal.Tar.entries]] — checksum-validated headers,
  * ustar prefixes, GNU longnames, the member-count fence), NULL for
  * non-tar bytes or a past-cap archive. The crawl face explodes the
  * array — one Generate both pins a single walk per record and
  * turns the archive into per-member rows the ordinary text gates
  * then govern (the 1→N analogue of [[DecompressBytes]]).
  */
case class TarMembers(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TarMembers.MembersType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    graft.multimodal.Tar.entries(bytes) match {
      case Some(es) => TarMembers.toArrayData(bytes, es)
      case None => null
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TarMembers {
  /** ARRAY<STRUCT<name STRING, data BINARY>> — the members shape
    * shared with [[DecompressedMembers]] (name null = "the payload
    * itself", not an archive member).
    */
  val MembersType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name", StringType),
        org.apache.spark.sql.types.StructField("data",
          org.apache.spark.sql.types.BinaryType))),
      containsNull = false)

  private[expressions] def toArrayData(
      bytes: Array[Byte],
      es: Vector[graft.multimodal.Tar.Entry])
      : org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      es.map(e => org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.name),
        graft.multimodal.Tar.extract(bytes, e))).toArray[Any])
}

case class OfficeExtractText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    // RTF first (a 5-byte prologue check); then the CFB family
    // sharing ONE parsed FAT + directory ([[Cfb.Doc]] — Word, then
    // Excel, then PowerPoint, each gating on its own stream name);
    // the ZIP dialects likewise share ONE parsed central directory —
    // without the views each kernel would repeat the container walk
    // per dialect probe
    val out = graft.multimodal.RtfText.extract(bytes)
      .orElse {
        val cfb = new graft.multimodal.Cfb.Doc(bytes)
        if (!cfb.isCfb) None
        else graft.multimodal.DocText.extract(cfb)
          .orElse(graft.multimodal.XlsText.extract(cfb))
          .orElse(graft.multimodal.PptText.extract(cfb))
      }
      .orElse {
        val zip = new graft.multimodal.Zip.View(bytes)
        if (!zip.isZip) None
        else graft.multimodal.Docx.extractText(zip)
          .orElse(graft.multimodal.Xlsx.extractText(zip))
          .orElse(graft.multimodal.Epub.extractText(zip))
          .orElse(graft.multimodal.Odt.extractText(zip))
      }
    out match {
      case Some(t) => UTF8String.fromString(t)
      case None => null
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
