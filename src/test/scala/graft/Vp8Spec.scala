package graft

import graft.multimodal.{Netpbm, Vp8, Webp}
import org.scalatest.funsuite.AnyFunSuite

/** Lossy VP8 keyframe codec — parity-pinned against libwebp itself:
  * every `.webp` resource under `vp8/` was encoded by libwebp and
  * sits next to libwebp's OWN YUV decode of it (`.yuv`: i16 header
  * w/h/stride/uvStride then the Y, U, V planes); the decoder must
  * reproduce the planes byte for byte. The conformance pair
  * (`conform_self.*`) goes the other way: OUR encoder's bitstream
  * with libwebp's decode of it — the encoder is conformant, not just
  * self-consistent.
  */
class Vp8Spec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    require(in != null, s"missing resource $name")
    try in.readAllBytes()
    finally in.close()
  }

  private def vp8Chunk(bytes: Array[Byte]): (Int, Int) = {
    var p = 12
    while (p + 8 <= bytes.length) {
      val cc = new String(bytes, p, 4, "ISO-8859-1")
      val sz = ((bytes(p + 4) & 0xffL) | ((bytes(p + 5) & 0xffL) << 8) |
        ((bytes(p + 6) & 0xffL) << 16) |
        ((bytes(p + 7) & 0xffL) << 24)).toInt
      if (cc == "VP8 ") return (p + 8, sz)
      p += 8 + sz + (sz & 1)
    }
    fail(s"no VP8 chunk")
  }

  private def comparePlanes(name: String, fr: Vp8.Frame,
                            yuv: Array[Byte]): Unit = {
    def u16(i: Int) = (yuv(i) & 0xff) | ((yuv(i + 1) & 0xff) << 8)
    val w = u16(0); val h = u16(2); val stride = u16(4); val uvs = u16(6)
    assert(fr.width == w && fr.height == h, s"$name dims")
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        assert(yuv(8 + i * stride + j) == fr.y(i * w + j),
          s"$name Y($j,$i)")
        j += 1
      }
      i += 1
    }
    val uvh = (h + 1) / 2; val uvw = (w + 1) / 2
    val uBase = 8 + stride * h
    val vBase = uBase + uvs * uvh
    i = 0
    while (i < uvh) {
      var j = 0
      while (j < uvw) {
        assert(yuv(uBase + i * uvs + j) == fr.u(i * uvw + j),
          s"$name U($j,$i)")
        assert(yuv(vBase + i * uvs + j) == fr.v(i * uvw + j),
          s"$name V($j,$i)")
        j += 1
      }
      i += 1
    }
  }

  private val Vectors = Seq(
    "v_16x16_k1_q100", "v_16x16_k1_q50", "v_33x17_k3_q90",
    "v_33x17_k1_q50", "v_64x48_k1_q75", "v_64x48_k4_q50",
    "v_80x64_k0_q75", "v_80x64_k2_q50", "v_128x96_k3_q75",
    "v_adv_v0_k1", "v_adv_v1_k2", "v_adv_v2_k2", "v_adv_v3_k1",
    "v_adv_v4_k2", "v_adv_v5_k1")

  test("decoder parity: libwebp-encoded vectors decode to libwebp's own YUV planes byte for byte (gradients, noise, partial MBs, segmentation, 8 partitions, both loop filters, sharpness)") {
    Vectors.foreach { name =>
      val webp = res(s"$name.webp")
      val (at, len) = vp8Chunk(webp)
      val fr = Vp8.decode(webp, at, len)
        .getOrElse(fail(s"$name fenced"))
      comparePlanes(name, fr, res(s"$name.yuv"))
    }
  }

  test("seg-delta loop-filter parity (r16 verdict ask): OUR encoder's segmentation+filter bitstreams decode to libwebp's own YUV byte for byte — abs/rel levels, ref/mode deltas, both filters, sharpness 0/1/2/4/7, hev levels, clamp extremes") {
    // the other direction from the v_* vectors: these bitstreams were
    // WRITTEN by Vp8.encode's FilterCfg arm (graft.tools.GenSegVectors
    // documents the exact grid) and the .yuv next to each is the
    // SYSTEM libwebp's decode of them — so this pins (a) the extended
    // encoder's conformance and (b) every seg-delta branch of the
    // filter pass: perturb level resolution, the delta clamps, the
    // sharpness shift or either filter's taps and some plane byte
    // moves. Re-encode from the documented grid FIRST so the pinned
    // .webp provably still is our encoder's output (no silent drift).
    graft.tools.GenSegVectors.grid.foreach { case (name, w, h, cfg) =>
      val webp = res(s"$name.webp")
      assert(Vp8.encodeWebp(graft.tools.GenSegVectors.luma(w, h),
        w, h, Some(cfg)).toSeq == webp.toSeq,
        s"$name: encoder output drifted from the libwebp-verified bytes")
      val (at, len) = vp8Chunk(webp)
      val fr = Vp8.decode(webp, at, len).getOrElse(fail(s"$name fenced"))
      assert(fr.filterLevel > 0, s"$name must carry an active filter")
      comparePlanes(name, fr, res(s"$name.yuv"))
      // non-vacuous: the filter really changed pixels vs the
      // unfiltered reconstruction (= the input luma, by the encoder's
      // exactness contract)
      assert(fr.y.toSeq != graft.tools.GenSegVectors.luma(w, h).toSeq,
        s"$name: filter pass was a pixel no-op — the pin is vacuous")
    }
  }

  /** The q148 fixture layout, reproduced here so the conformance pin
    * is self-contained.
    */
  private def bandLuma(payload: Array[Byte]): (Array[Byte], Int, Int) = {
    val hb = (payload.length + 9) / 10
    val w = 80; val h = hb * 8
    val luma = new Array[Byte](w * h)
    var i = 0
    while (i < hb * 10) {
      val v: Byte = if (i < payload.length) payload(i) else 0
      val bx = (i % 10) * 8; val by = (i / 10) * 8
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) { luma((by + r) * w + bx + c) = v; c += 1 }
        r += 1
      }
      i += 1
    }
    (luma, w, h)
  }

  test("encoder conformance: byte-pinned to the bitstream libwebp itself decoded correctly; identity round trip; gray RGB equals luma") {
    val payload = Array.tabulate[Byte](23)(i => ((i * 37 + 11) % 256).toByte)
    val (luma, w, h) = bandLuma(payload)
    val webp = Vp8.encodeWebp(luma, w, h)
    // the exact bytes libwebp was verified against (drift here would
    // silently invalidate the conformance claim)
    assert(webp.toSeq == res("conform_self.webp").toSeq,
      "encoder output drifted from the libwebp-verified bitstream")
    // libwebp's decode of those bytes == the input luma, chroma 128
    val (at, len) = vp8Chunk(webp)
    val fr = Vp8.decode(webp, at, len).get
    comparePlanes("conform_self", fr, res("conform_self.yuv"))
    assert(fr.y.toSeq == luma.toSeq, "identity round trip")
    assert(fr.u.forall(b => (b & 0xff) == 128) &&
      fr.v.forall(b => (b & 0xff) == 128))
    // the full Webp route: U=V=128 converts with R=G=B=Y exactly
    val img = Webp.decode(webp).get
    assert(img.width == w && img.height == h)
    var i = 0
    while (i < w * h) {
      assert(img.pixels(3 * i) == luma(i) &&
        img.pixels(3 * i + 1) == luma(i) &&
        img.pixels(3 * i + 2) == luma(i), s"px $i")
      i += 1
    }
    // and the luma-stats contract the q148 oracle leans on
    assert(Netpbm.luma(77, 77, 77) == 77)
  }

  test("dHash near-dup coverage now includes lossy WebP: a real libwebp vector decodes to a stable fingerprint, and gray fixtures hash identically across codecs") {
    // the whole point of the decoder: the image near-dup machinery
    // (q118/q119 ride Netpbm.dHash64 over decoded pixels) covers the
    // web's dominant WebP flavor instead of skipping it
    val webp = res("v_64x48_k1_q75.webp")
    val img = Webp.decode(webp).getOrElse(fail("lossy vector must decode"))
    val h1 = Netpbm.dHash64(img)
    val h2 = Netpbm.dHash64(Webp.decode(webp).get)
    assert(h1 == h2, "fingerprint must be deterministic")
    // cross-codec: the same per-4x4-uniform gray image through VP8
    // (exact round trip) and through PNG (lossless) hashes IDENTICAL
    val payload = Array.tabulate[Byte](20)(i => ((i * 53 + 7) % 256).toByte)
    val (luma, w, h) = bandLuma(payload)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      rgb(3 * i) = luma(i); rgb(3 * i + 1) = luma(i)
      rgb(3 * i + 2) = luma(i); i += 1
    }
    val viaVp8 = Webp.decode(Vp8.encodeWebp(luma, w, h)).get
    val viaPng = graft.multimodal.Png.decode(
      graft.multimodal.Png.encode(Netpbm.Image(w, h, 255, rgb))).get
    assert(Netpbm.dHash64(viaVp8) == Netpbm.dHash64(viaPng),
      "the same image must fingerprint identically across codecs")
  }

  test("encoder rejects non-per-4x4-uniform luma (the exactness precondition)") {
    val luma = new Array[Byte](80 * 8)
    luma(1) = 1 // breaks the top-left block's uniformity
    assertThrows[IllegalArgumentException] { Vp8.encode(luma, 80, 8) }
  }

  test("fences: interframe, truncation at every layer, garbage, oversize, ANIM-bearing container — never a throw") {
    val webp = res("v_64x48_k1_q75.webp")
    val (at, len) = vp8Chunk(webp)
    // interframe: flip the keyframe bit
    val inter = webp.clone(); inter(at) = (inter(at) | 1).toByte
    assert(Vp8.decode(inter, at, len).isEmpty, "interframe must fence")
    // truncations: header, partition sizes, token data
    Seq(2, 5, 9, 12, 20, len / 2, len - 1).foreach { cut =>
      assert(Vp8.decode(webp, at, cut).isEmpty ||
        Vp8.decode(webp, at, cut).isDefined, "must not throw")
    }
    assert(Vp8.decode(webp, at, 8).isEmpty, "cut before dims")
    // garbage with a valid start code prefix
    val garbage = new Array[Byte](64)
    garbage(3) = 0x9d.toByte; garbage(4) = 0x01; garbage(5) = 0x2a
    assert(Vp8.decode(garbage, 0, garbage.length).isEmpty)
    assert(Vp8.decode("not vp8".getBytes("UTF-8"), 0, 7).isEmpty)
    // the Webp route still fences animations
    val anim = ("RIFF" + "\u0000\u0000\u0000\u0000" + "WEBP" +
      "ANIM" + "\u0004\u0000\u0000\u0000" + "aaaa").getBytes("ISO-8859-1")
    assert(Webp.decode(anim).isEmpty)
    // mutation fuzz over the real vector: flip every 37th byte
    var i = at
    while (i < at + len) {
      val m = webp.clone(); m(i) = (m(i) ^ 0x55).toByte
      Vp8.decode(m, at, len) // fence or decode — never throw
      i += 37
    }
  }
}
