package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM Windows BMP codec — the third REAL decoder arm beside
  * [[Netpbm]] (image) and [[Wav]] (audio), covering the uncompressed
  * 24-bpp BITMAPINFOHEADER profile (the overwhelmingly common
  * interchange form). Like the WAV walker, this is an actual format
  * implementation, not byte math: the 14-byte file header is
  * validated ("BM" magic, pixel-data offset), the 40-byte info header
  * is range-checked (positive dims, 1 plane, 24 bpp, BI_RGB), and the
  * raster is read the way the format stores it — BOTTOM-UP rows,
  * little-endian BGR triples, each row padded to a 4-byte boundary —
  * and returned as [[Netpbm.Image]]'s top-down RGB so every existing
  * image kernel (lumaHistogram, resize) works on it unchanged.
  *
  * Profile fences (all → None, the Wav convention — a decoder must
  * refuse loudly, not misread): short/garbled headers, non-BM magic,
  * info-header sizes other than 40, top-down (negative-height) files,
  * palette/compressed variants, absurd dimensions, and rasters the
  * payload cannot actually contain (truncation).
  */
object Bmp {

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40
  private val HeaderSize = FileHeaderSize + InfoHeaderSize

  /** Guard rails against absurd headers: a corrupt dword must fail
    * the parse, not size a multi-GB allocation.
    */
  private val MaxDim = 1 << 20
  private val MaxPixels = 1L << 26

  /** Encode top-down RGB as an uncompressed 24-bpp bottom-up BMP.
    * `maxVal` must be 255 (BMP has no other depth in this profile).
    */
  def encode(img: Netpbm.Image): Array[Byte] = {
    require(img.maxVal == 255, s"BMP is 8-bit/channel, got maxVal=${img.maxVal}")
    val rowBytes = img.width * 3
    val pad = (4 - rowBytes % 4) % 4
    val stride = rowBytes + pad
    val dataSize = stride * img.height
    val b = ByteBuffer.allocate(HeaderSize + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
      .putInt(HeaderSize + dataSize)            // file size
      .putShort(0).putShort(0)                  // reserved
      .putInt(HeaderSize)                       // pixel-data offset
    b.putInt(InfoHeaderSize)
      .putInt(img.width).putInt(img.height)     // positive = bottom-up
      .putShort(1)                              // planes
      .putShort(24)                             // bpp
      .putInt(0)                                // BI_RGB (uncompressed)
      .putInt(dataSize)
      .putInt(2835).putInt(2835)                // 72 dpi in px/metre
      .putInt(0).putInt(0)                      // palette fields unused
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * 3
        b.put(img.pixels(p + 2)).put(img.pixels(p + 1)).put(img.pixels(p))
        x += 1
      }
      var k = 0
      while (k < pad) { b.put(0.toByte); k += 1 }
      y -= 1
    }
    b.array()
  }

  /** Parse an uncompressed 24-bpp bottom-up BMP; None on anything
    * outside the profile (see the object scaladoc for the fences).
    */
  def decode(bytes: Array[Byte]): Option[Netpbm.Image] = {
    if (bytes.length < HeaderSize ||
        bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = b.getInt(10)
    if (b.getInt(14) != InfoHeaderSize) return None
    val w = b.getInt(18)
    val h = b.getInt(22) // negative = top-down: outside the profile
    val planes = b.getShort(26)
    val bpp = b.getShort(28)
    val compression = b.getInt(30)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
        w.toLong * h > MaxPixels ||
        planes != 1 || bpp != 24 || compression != 0) return None
    val stride = (w * 3 + 3) & ~3
    if (dataOff < HeaderSize ||
        dataOff.toLong + stride.toLong * h > bytes.length) return None
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = dataOff + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val s = src + x * 3
        val d = (y * w + x) * 3
        px(d) = bytes(s + 2)       // R (file stores BGR)
        px(d + 1) = bytes(s + 1)   // G
        px(d + 2) = bytes(s)       // B
        x += 1
      }
      y += 1
    }
    Some(Netpbm.Image(w, h, 255, px))
  }
}
