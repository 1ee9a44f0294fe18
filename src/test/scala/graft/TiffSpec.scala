package graft

import graft.multimodal.Tiff
import org.scalatest.funsuite.AnyFunSuite

/** TIFF IFD walk — both byte orders, inline vs out-of-line values,
  * the next-IFD page census with its cycle guard, fences.
  */
class TiffSpec extends AnyFunSuite {

  test("round trip across byte orders, layouts and page counts") {
    for (big <- Seq(false, true); spp <- Seq(1, 3);
         comp <- Seq(1, 5, 7, 32773); pages <- Seq(1, 3)) {
      val bps = if (spp == 3) 8 else 16
      val photo = if (spp == 3) 2 else 1
      val info = Tiff.parse(
        Tiff.write(big, 37, 23, comp, bps, spp, photo, pages)).get
      assert(info.bigEndian == big && info.width == 37 &&
        info.height == 23 && info.compression == comp &&
        info.bitsPerSample == bps && info.samplesPerPixel == spp &&
        info.photometric == photo && info.pages == pages,
        s"big=$big spp=$spp comp=$comp pages=$pages -> $info")
    }
  }

  test("truncation discipline: pages already counted keep when a later IFD is cut") {
    val full = Tiff.write(big = false, 10, 10, 1, 8, 1, 1, pages = 3)
    // cut inside the LAST page's IFD: two pages of census survive
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 8)
    val info = Tiff.parse(cut).get
    assert(info.pages == 2 && info.width == 10)
    // cut inside IFD0: the evidence never arrived -> None
    val cut0 = java.util.Arrays.copyOfRange(full, 0, 20)
    assert(Tiff.parse(cut0).isEmpty)
  }

  test("cycle guard: a next-IFD pointer looping back cannot hang the walk") {
    val ok = Tiff.write(big = false, 5, 5, 1, 8, 1, 1)
    // patch the next-IFD pointer (last 4 bytes of the IFD, which ends
    // the file) to point back at IFD0
    val looped = ok.clone()
    val ifd0 = (ok(4) & 0xff) | ((ok(5) & 0xff) << 8)
    looped(ok.length - 4) = (ifd0 & 0xff).toByte
    looped(ok.length - 3) = ((ifd0 >> 8) & 0xff).toByte
    looped(ok.length - 2) = 0; looped(ok.length - 1) = 0
    val info = Tiff.parse(looped).get
    assert(info.pages == 1, "the revisited IFD must not count again")
  }

  test("fences: null, empty, prose, bad version, IFD0 offset out of range") {
    assert(Tiff.parse(null).isEmpty)
    assert(Tiff.parse(Array.emptyByteArray).isEmpty)
    assert(Tiff.parse("II* looks like TIFF but is not".getBytes).isEmpty)
    val ok = Tiff.write(big = true, 5, 5, 1, 8, 1, 1)
    val badVer = ok.clone(); badVer(3) = 43
    assert(Tiff.parse(badVer).isEmpty)
    val badOff = ok.clone()
    badOff(4) = 0x7F; badOff(5) = 0x7F; badOff(6) = 0x7F; badOff(7) = 0x7F
    assert(Tiff.parse(badOff).isEmpty)
  }
}
