package graft.multimodal

/** Minimal pure-JVM Netpbm P6 codec — the REAL decode kernel behind
  * [[Multimodal]]'s image paths (the published, public Netpbm "ppm"
  * format: ASCII header `P6 <width> <height> <maxval>` with
  * whitespace/`#`-comment separators, one whitespace byte, then
  * `width*height*3` raw RGB bytes). P6 was chosen over BMP because it
  * is the simplest format that is genuinely in production use (ffmpeg
  * `image2pipe` emits exactly the concatenated-P6 stream [[frames]]
  * consumes), needs zero native deps, and exercises everything a codec
  * integration needs: header parsing, malformed-input fencing,
  * raster-size validation, multi-frame streams.
  *
  * Only `maxval <= 255` (1-byte samples) is supported — 2-byte-sample
  * images return None and fence as ok=false rows upstream, never an
  * exception: on a 100 TB corpus a malformed blob must cost one row,
  * not a task.
  */
object Netpbm {

  /** A decoded RGB image: `pixels` is exactly `width*height*3` bytes,
    * row-major, R then G then B per pixel.
    */
  final case class Image(width: Int, height: Int, maxVal: Int,
                         pixels: Array[Byte]) {
    def nPixels: Int = width * height
  }

  /** ITU-R BT.601 integer luma (the classic 299/587/114 weights with
    * integer division) — pure int math so every engine that replays it
    * (the DuckDB oracle included) gets bit-identical values.
    */
  def luma(r: Int, g: Int, b: Int): Int = (r * 299 + g * 587 + b * 114) / 1000

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** One parsed header: dims + where the raster starts/ends. The
    * header walk shared by [[decodeFrom]] (which copies the raster)
    * and [[nextOffset]] (which does NOT — frame skipping must not pay
    * for pixels it discards).
    */
  private final case class Header(width: Int, height: Int, maxVal: Int,
                                  rasterStart: Int, rasterEnd: Int)

  private def parseHeader(bytes: Array[Byte], off: Int): Option[Header] = {
    var i = off
    val n = bytes.length
    // whitespace/comment skipper: '#' eats to end of line (the header
    // grammar); returns false on end-of-input
    def skipSpace(): Boolean = {
      var progress = true
      while (progress && i < n) {
        if (isSpace(bytes(i))) i += 1
        else if (bytes(i) == '#') { while (i < n && bytes(i) != '\n') i += 1 }
        else progress = false
      }
      i < n
    }
    def token(): Option[Int] = {
      if (!skipSpace()) return None
      var v = 0L
      var any = false
      while (i < n && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); any = true
        if (v > Int.MaxValue) return None
        i += 1
      }
      if (any) Some(v.toInt) else None
    }
    if (i + 1 >= n || bytes(i) != 'P' || bytes(i + 1) != '6') return None
    i += 2
    (token(), token(), token()) match {
      case (Some(w), Some(h), Some(mv))
          if w > 0 && h >= 0 && mv >= 1 && mv <= 255 =>
        // exactly ONE whitespace byte separates maxval from the raster
        if (i >= n || !isSpace(bytes(i))) return None
        i += 1
        val raster = w.toLong * h * 3
        if (raster > Int.MaxValue || i + raster > n) None
        else Some(Header(w, h, mv, i, i + raster.toInt))
      case _ => None
    }
  }

  /** Parse ONE P6 image starting at `off`; Some((image, nextOffset))
    * on success — `nextOffset` points just past the raster so a
    * concatenated stream parses frame-by-frame — None on anything
    * malformed (bad magic, missing/overflowing dimensions, maxval
    * outside 1..255, truncated raster).
    */
  def decodeFrom(bytes: Array[Byte], off: Int): Option[(Image, Int)] =
    parseHeader(bytes, off).map { h =>
      (Image(h.width, h.height, h.maxVal,
        java.util.Arrays.copyOfRange(bytes, h.rasterStart, h.rasterEnd)),
        h.rasterEnd)
    }

  /** Offset just past the frame at `off`, WITHOUT copying its raster —
    * what a strided frame-sampler uses to skip unsampled frames at
    * header-parse cost only.
    */
  def nextOffset(bytes: Array[Byte], off: Int): Option[Int] =
    parseHeader(bytes, off).map(_.rasterEnd)

  /** Decode a single image (leading frame of the payload). */
  def decode(bytes: Array[Byte]): Option[Image] =
    if (bytes == null) None else decodeFrom(bytes, 0).map(_._1)

  /** Serialize as P6 (canonical single-space header, newline before
    * raster) — decode(encode(img)) == img exactly.
    */
  def encodeP6(img: Image): Array[Byte] = {
    val header =
      s"P6\n${img.width} ${img.height}\n${img.maxVal}\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** All frames of a concatenated-P6 stream (the ffmpeg image2pipe
    * shape) in order. `Right(images)` when the payload is consumed
    * exactly; `Left((prefix, badOffset))` when trailing/malformed
    * bytes follow the last whole frame — the caller decides whether a
    * partial stream fences or salvages.
    */
  def frames(bytes: Array[Byte]): Either[(Vector[Image], Int), Vector[Image]] = {
    var out = Vector.empty[Image]
    var off = 0
    while (off < bytes.length) {
      decodeFrom(bytes, off) match {
        case Some((img, next)) => out :+= img; off = next
        case None => return Left((out, off))
      }
    }
    Right(out)
  }

  /** Nearest-neighbor downsample by an integer factor on both axes —
    * output pixel (x, y) is input pixel (x*factor, y*factor); output
    * dims are ceil(dim/factor) so every input region is represented
    * and a 1-pixel image survives any factor. ACTUAL resampling (the
    * round-5 stub kept every factor-th PAYLOAD byte, tearing the RGB
    * channel structure); nearest-neighbor because it is deterministic
    * integer math a fixture spec can hand-compute.
    */
  def resizeNearest(img: Image, factor: Int): Image = {
    require(factor > 0, "factor must be > 0")
    val w2 = (img.width + factor - 1) / factor
    val h2 = (img.height + factor - 1) / factor
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = ((y * factor) * img.width + (x * factor)) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, img.maxVal, out)
  }

  /** 64-bit difference hash (dHash, Krawetz's perceptual image
    * fingerprint): sample a 9×8 luma grid by nearest neighbor
    * (sx = x·width DIV 9, sy = y·height DIV 8 — integer division, so
    * the DuckDB oracle replays it exactly), bit (y, x) = 1 iff
    * g(x, y) > g(x+1, y). Near-identical images (re-encodes, small
    * crops/edits, brightness shifts — dHash compares ADJACENT samples,
    * so global level changes cancel) land within a few Hamming bits,
    * which makes image NEAR-DUP exactly the q32 SimHash problem on a
    * different 64-bit Hamming space: the same block-rotation bucket
    * machinery applies verbatim.
    */
  def dHash64(img: Image): Long = {
    // a zero-pixel image is a VALID parse (the header grammar accepts
    // height 0, like lumaHistogram's guard) — fence it as the empty
    // hash rather than reading past an empty array: real-file ingest
    // (BinarySource) feeds arbitrary degenerate media here
    if (img.width <= 0 || img.height <= 0 || img.pixels.length == 0)
      return 0L
    var h = 0L
    val g = new Array[Int](9)
    var y = 0
    while (y < 8) {
      val sy = y * img.height / 8
      var i = 0
      while (i < 9) {
        val sx = i * img.width / 9
        val p = (sy * img.width + sx) * 3
        g(i) = luma(img.pixels(p) & 0xff, img.pixels(p + 1) & 0xff,
          img.pixels(p + 2) & 0xff)
        i += 1
      }
      var x = 0
      while (x < 8) {
        if (g(x) > g(x + 1)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Normalized luma histogram: `bins` equal slices of 0..255 (bin =
    * luma * bins / 256 in int math), each value the FRACTION of pixels
    * in the bin — a zero-pixel image is all-zeros, not NaN.
    */
  def lumaHistogram(img: Image, bins: Int): Array[Float] = {
    val counts = new Array[Long](bins)
    var i = 0
    while (i < img.pixels.length) {
      val l = luma(img.pixels(i) & 0xff, img.pixels(i + 1) & 0xff,
        img.pixels(i + 2) & 0xff)
      counts(l * bins / 256) += 1
      i += 3
    }
    val nPx = img.nPixels
    val out = new Array[Float](bins)
    if (nPx > 0) {
      var b = 0
      while (b < bins) { out(b) = counts(b).toFloat / nPx; b += 1 }
    }
    out
  }
}
