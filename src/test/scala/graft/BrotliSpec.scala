package graft

import graft.multimodal.Brotli
import graft.tools.BrotliVectors
import org.scalatest.funsuite.AnyFunSuite

/** Brotli decoder — parity-pinned against the system libbrotli (the
  * Vp8 method): every `v_<kind>_q<q>_w<w>.br` resource under
  * `brotli/` is the SYSTEM encoder's compression of a payload
  * [[BrotliVectors]] regenerates deterministically; the decoder must
  * return the payload byte for byte. The conformance pair goes the
  * other way: `conform_fixed.br`/`conform_stored.br` are OUR fixture
  * encoders' bitstreams, verified at pin time by the SYSTEM
  * libbrotlidec decoding them to the payload — the q151 oracle's
  * exactness device is conformant brotli, not merely
  * self-consistent.
  */
class BrotliSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    // the q9 long vector doubles as ScaleCheck's bench stream, so its
    // single copy lives in MAIN resources (no byte-identical twin to
    // drift from)
    val path =
      if (name == "v_long_q9_w22.br") "/graft/brotli_bench.br"
      else s"/brotli/$name"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $name")
    try in.readAllBytes()
    finally in.close()
  }

  test("decoder parity: system-libbrotli streams across qualities 0-11, windows 10-22, dictionary-rich / markup / repetitive / UTF-8 / binary / mixed / empty / 1-byte / multi-MiB payloads decode byte for byte") {
    BrotliVectors.Grid.foreach { case (kind, q, w) =>
      val name = BrotliVectors.name(kind, q, w)
      val got = Brotli.decode(res(s"$name.br"))
        .getOrElse(fail(s"$name fenced"))
      assert(java.util.Arrays.equals(got, BrotliVectors.payload(kind)),
        s"$name decode mismatch")
    }
    // non-vacuous dictionary/copy reach: the q11 dictionary-rich
    // vector is far smaller than its output, so the stream NEEDS
    // backward copies and static-dictionary words to reconstruct —
    // a decoder with a broken dictionary path cannot pass the line
    // above by luck
    assert(res("v_dicty_q11_w22.br").length * 5 <
      BrotliVectors.payload("dicty").length)
  }

  test("fixture encoders: conformance-pinned bytes (system libbrotlidec verified), identity round trips for every payload kind and all three stream shapes") {
    // the exact bytes the SYSTEM decoder was verified against at pin
    // time — drift here would silently invalidate the q151 oracle's
    // conformance claim (the conform_self.webp device)
    assert(Brotli.encodeFixed(BrotliVectors.payload("dicty"),
      split = true).toSeq == res("conform_fixed.br").toSeq,
      "encodeFixed output drifted from the libbrotli-verified bytes")
    assert(Brotli.encodeUncompressed(BrotliVectors.payload("utf8"))
      .toSeq == res("conform_stored.br").toSeq,
      "encodeUncompressed output drifted")
    BrotliVectors.Grid.map(_._1).distinct.foreach { kind =>
      val p = BrotliVectors.payload(kind)
      Seq(
        ("fixed", Brotli.encodeFixed(p, split = false)),
        ("split", Brotli.encodeFixed(p, split = true)),
        ("stored", Brotli.encodeUncompressed(p))).foreach {
        case (tag, enc) =>
          val got = Brotli.decode(enc).getOrElse(fail(s"$tag/$kind fenced"))
          assert(java.util.Arrays.equals(got, p), s"$tag/$kind")
      }
    }
  }

  test("dictionary ferment at the word edge: out-of-word writes discard (review regression, system-libbrotli verified)") {
    // Hand-built stream: insert 'x', then a STATIC-DICTIONARY
    // reference to length-4 word #436 ("zh:" + the 0xE5 lead byte —
    // the ferment-all walk's last step would write 2 bytes past the
    // word) under transform #107 (ferment-all + suffix ", "). The
    // first cut XOR'd the suffix's ',' into ')'; the system
    // libbrotlidec decodes these exact bytes to 78 5a 48 3a e5 2c 20
    // ("xZH:å, ") — suffix INTACT — which is what the reference
    // decoder's ferment-before-suffix order nets out to.
    val stream = new java.io.ByteArrayOutputStream()
    var cur = 0; var n = 0
    def bits(nb: Int, v: Int): Unit = {
      var i = 0
      while (i < nb) {
        cur |= ((v >> i) & 1) << n; n += 1
        if (n == 8) { stream.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    bits(1, 0) // wbits 16
    bits(1, 1); bits(1, 0) // last, not empty
    bits(2, 0); bits(16, 7 - 1) // mlen 7
    bits(1, 0); bits(1, 0); bits(1, 0) // one block type per category
    bits(2, 0); bits(4, 0) // npostfix, ndirect
    bits(2, 0) // LSB6
    bits(1, 0); bits(1, 0) // ntreesL/D = 1
    bits(2, 1); bits(2, 0); bits(8, 'x') // literal: 1-symbol code
    bits(2, 1); bits(2, 0); bits(10, 138) // command: ins 1, cpy 4
    bits(2, 1); bits(2, 0); bits(6, 45) // distance: 1-symbol dc 45
    bits(15, 11705) // distance extra -> addr = (107 << 10) | 436
    if (n > 0) stream.write(cur)
    val got = Brotli.decode(stream.toByteArray)
      .getOrElse(fail("ferment stream fenced"))
    assert(got.toSeq == Seq[Byte](0x78, 0x5a, 0x48, 0x3a,
      0xe5.toByte, 0x2c, 0x20),
      "suffix bytes must survive a word-edge ferment " +
        s"(got ${got.map(b => f"$b%02x").mkString(" ")})")
  }

  test("data-reach branch checklist: a hand-built pinned stream per branch the vector corpus cannot provably reach (every stream + output system-libbrotlidec verified)") {
    // The r17 lesson ("corpus breadth is not branch coverage"): a
    // branch whose reach depends on DATA SHAPE — a context mode real
    // encoders rarely pick, a distance-parameter combination, a
    // repeat-chain extreme, a transform-op family — is covered only
    // as far as the encoder corpus happens to wander. This table
    // maps each such branch to a hand-built stream (the ferment-edge
    // pin's method); every stream AND its expected output were
    // verified against the system libbrotlidec at pin time, so a
    // divergence here is OUR bug by construction.
    //
    // Construction notes (shared skeleton = the ferment pin's:
    // wbits16 header, one block type per category, simple prefix
    // codes unless stated):
    //  msb6      — context MODE 1 with ntreesL=2 and a context map
    //              sending ctx 24 (p1='a' >> 2) to a second
    //              single-symbol tree: single-symbol trees read ZERO
    //              bits, so the output "aBaB" is a pure function of
    //              the ctx chain (LSB6 would read ctx 33 -> "aaaa").
    //  signed    — context MODE 3, map sends ctx 8 = Lut2[0x01]<<3
    //              to tree 'B': output 01 42 01 01 (MSB6 ctx 0 and
    //              LSB6 ctx 1 both stay on tree 0 -> all-01).
    //  ndirect   — NDIRECT=8: distance code 17 in the direct range
    //              [16,24) must mean dist = dc-15 = 2 (copy "xyxyxy").
    //  npostfix  — NPOSTFIX=2: dc=17 -> hcode=0/lcode=1, 1 extra bit,
    //              dist=((offset+extra)<<2)+lcode+1 = 2, same copy.
    //  rep17     — complex LITERAL code whose zero runs ride two
    //              3-deep ACCUMULATING 17-repeat chains landing
    //              exactly (3->13->97 and 4->21->157 zeros): one
    //              mis-accumulated repeat shifts every later length.
    //  stored_boundary_ring16 — a non-last UNCOMPRESSED block, then
    //              a compressed block whose copy (initial-ring
    //              short code dc=3 = distance 16, the MOST-DISTANT
    //              initial entry) reaches back INTO the stored bytes.
    //  wbits24   — the 3-bit window escape (1,111 -> 24), the max
    //              standard window the 10-22 vector grid skips.
    //  tf_*      — static-dictionary word 0 of the 4-letter bank
    //              ("time") under one transform per op FAMILY beyond
    //              the pinned ferment-all: identity+prefix/suffix
    //              (#2 -> "x time "), omit-first-1 (#3 -> "xime"),
    //              ferment-first (#4 -> "xTime "), omit-last-1
    //              (#12 -> "xtim").
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val pins: Seq[(String, String, String)] = Seq(
      ("msb6 context mode",
        "6200004071921ddc07222c8402840000", "61426142"),
      ("signed context mode",
        "620000c0517204ecee44048450801000", "01420101"),
      ("ndirect>0 direct distance",
        "a2000020145e5e48121101", "787978797879"),
      ("npostfix>0 distance postfix",
        "a2000002145e5e48121102", "787978797879"),
      ("accumulating 17-repeat chains",
        "6200000070005c549b2a0142000a", "61ff61ff"),
      ("stored-block boundary + initial ring 16",
        "f00010" + "756e636f6d7072657373656420627974" +
          "81000000022f1c8901",
        "756e636f6d7072657373656420627974786e636f6d70726573"),
      ("window bits 24",
        "1f030000a0ded60284000a", "6f6b6f6b"),
      ("transform identity+prefix/suffix (#2)",
        "c2000000045e28126201", "782074696d6520"),
      ("transform omit-first-1 (#3)",
        "62000000045e28126301", "78696d65"),
      ("transform ferment-first (#4)",
        "a2000000045e2812640100", "7854696d6520"),
      ("transform omit-last-1 (#12)",
        "62000000045e2812670100", "7874696d"))
    pins.foreach { case (branch, stream, want) =>
      val got = Brotli.decode(hex(stream))
        .getOrElse(fail(s"$branch: pinned stream fenced"))
      assert(got.toSeq == hex(want).toSeq,
        s"$branch: got ${got.map(b => f"$b%02x").mkString} want $want")
    }
  }

  test("fences: null/empty/prose/truncation at every byte, random mutations never throw, the bomb cap trips") {
    assert(Brotli.decode(null).isEmpty)
    assert(Brotli.decode(Array.emptyByteArray).isEmpty)
    // the large-window header shape (WBITS escape 0b1,000,100...) is
    // a non-standard extension RFC 7932 reserves — must fence whole
    assert(Brotli.decode(Array[Byte](0x11, 0, 0, 0)).isEmpty,
      "large-window streams must fence, not misparse")
    // metadata blocks skip whole (hand-built, system-libbrotlidec
    // verified: these exact bytes decode to "ok" — a 3-byte metadata
    // block, then a stored block, then the empty last block)
    val metaStream = Array(0x2c, 0x01, 0xaa, 0xbb, 0xcc, 0x08, 0x00,
      0x08, 0x6f, 0x6b, 0x03).map(_.toByte)
    assert(Brotli.decode(metaStream).map(new String(_, "UTF-8"))
      .contains("ok"), "metadata blocks must skip, not ingest")
    // truncation: every prefix of a copy-heavy stream either fences
    // or decodes (brotli has no checksum, so an aligned prefix CAN
    // be a valid stream) — it must never throw and never return
    // MORE than the original
    val full = res("v_rep_q5_w10.br")
    val want = BrotliVectors.payload("rep")
    (0 until full.length).foreach { n =>
      Brotli.decode(java.util.Arrays.copyOfRange(full, 0, n)) match {
        case Some(got) => assert(got.length <= want.length, s"cut $n")
        case None => ()
      }
    }
    // deterministic mutation fuzz over three stream shapes
    val rnd = new scala.util.Random(0xb20171L)
    val seeds = Seq(res("v_dicty_q11_w22.br"), res("v_long_q4_w18.br"),
      Brotli.encodeFixed(BrotliVectors.payload("html"), split = true))
    seeds.foreach { seed =>
      (0 until 400).foreach { _ =>
        val b = seed.clone()
        (0 until 1 + rnd.nextInt(6)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        Brotli.decode(b) // must not throw; value irrelevant
      }
    }
    // one-shot strictness (ADVICE regression): a complete stream
    // followed by ANY leftover bytes — garbage or zeros — must fence
    // like the reference decoder, not decode silently as a prefix
    val clean = Brotli.encodeFixed(BrotliVectors.payload("html"),
      split = false)
    assert(Brotli.decode(clean).isDefined)
    assert(Brotli.decode(clean :+ 0xaa.toByte).isEmpty,
      "trailing garbage must fence")
    assert(Brotli.decode(clean :+ 0x00.toByte).isEmpty,
      "trailing zeros are still leftover input")
    // the encodeFixed capacity fence: a payload over one meta-block's
    // 2^24-byte MLEN capacity must refuse loudly, never truncate
    intercept[IllegalArgumentException] {
      Brotli.encodeFixed(new Array[Byte]((1 << 24) + 1), split = false)
    }
    // the decompression-bomb cap: a stream whose output exceeds the
    // cap fences whole rather than buffering unboundedly
    val big = Brotli.encodeUncompressed(new Array[Byte](1 << 16))
    assert(Brotli.decode(big, cap = 1 << 12).isEmpty, "cap must trip")
    assert(Brotli.decode(big, cap = 1 << 17).isDefined)
  }
}
