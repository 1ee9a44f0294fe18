package graft

import graft.multimodal.{Flac, Ogg}
import org.scalatest.funsuite.AnyFunSuite

/** OGG page walk + FLAC STREAMINFO — probe round trips through the
  * repo's own writers (both codec identification headers, granule
  * arithmetic incl. the Opus pre-skip/48 kHz rules, bit-packed
  * STREAMINFO), the truncation discipline, hostile-byte fences.
  */
class AudioProbeSpec extends AnyFunSuite {

  test("ogg vorbis round trip: id header, multi-lacing comment page, granule duration") {
    val bytes = Ogg.write("vorbis", 2, 44100, granuleEnd = 441000L)
    val info = Ogg.parse(bytes).get
    assert(info.codec == "vorbis")
    assert(info.channels == 2 && info.sampleRate == 44100)
    assert(info.pages == 5) // BOS + comment + 3 audio
    assert(info.durationMs == 10000L)
  }

  test("ogg opus round trip: pre-skip subtracts, granules tick at 48 kHz regardless of input rate") {
    val bytes = Ogg.write("opus", 1, 44100, granuleEnd = 48000L + 312,
      preSkip = 312)
    val info = Ogg.parse(bytes).get
    assert(info.codec == "opus")
    assert(info.channels == 1 && info.sampleRate == 44100)
    assert(info.durationMs == 1000L,
      "duration = (granule - preSkip) / 48000, NOT the input rate")
  }

  test("ogg truncation discipline: a cut final page drops, counted pages keep") {
    val full = Ogg.write("vorbis", 1, 8000, granuleEnd = 8000L)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 10)
    val info = Ogg.parse(cut).get
    assert(info.pages == 4, "the truncated last page must not count")
    assert(info.durationMs < 1000L,
      "duration reflects the last COMPLETE page's granule")
  }

  test("ogg fences: null, empty, prose, version byte, headerless stream") {
    assert(Ogg.parse(null).isEmpty)
    assert(Ogg.parse(Array.emptyByteArray).isEmpty)
    assert(Ogg.parse("OggS is a capture pattern".getBytes).isEmpty)
    val bad = Ogg.write("vorbis", 1, 8000, 8000L)
    bad(4) = 1 // version != 0
    assert(Ogg.parse(bad).isEmpty)
  }

  test("flac round trip: bit-packed STREAMINFO across rates/channels/bps, comment block skipped") {
    for (rate <- Seq(8000, 44100, 48000, 96000, 655350);
         ch <- Seq(1, 2, 8); bps <- Seq(8, 16, 24);
         wc <- Seq(false, true)) {
      val total = 123456789L
      val info = Flac.parse(Flac.write(rate, ch, bps, total,
        withComment = wc)).get
      assert(info.sampleRate == rate && info.channels == ch &&
        info.bitsPerSample == bps && info.totalSamples == total,
        s"rate=$rate ch=$ch bps=$bps wc=$wc")
      assert(info.durationMs == total * 1000L / rate)
    }
    // the 36-bit total boundary
    val big = Flac.parse(Flac.write(48000, 2, 16, (1L << 36) - 1)).get
    assert(big.totalSamples == (1L << 36) - 1)
  }

  test("flac: unknown total samples (live encode) reports durationMs -1") {
    val info = Flac.parse(Flac.write(44100, 2, 16, 0L)).get
    assert(info.totalSamples == 0L && info.durationMs == -1L)
  }

  test("flac fences: null, empty, prose, zero rate, STREAMINFO-not-first, truncated block") {
    assert(Flac.parse(null).isEmpty)
    assert(Flac.parse(Array.emptyByteArray).isEmpty)
    assert(Flac.parse("fLaC files are lossless".getBytes).isEmpty)
    assert(Flac.parse(Flac.write(0, 1, 16, 100L)).isEmpty, "rate 0 invalid")
    val ok = Flac.write(44100, 2, 16, 100L)
    val notFirst = ok.clone()
    notFirst(4) = 4 // first block claims VORBIS_COMMENT
    assert(Flac.parse(notFirst).isEmpty)
    val cut = java.util.Arrays.copyOfRange(ok, 0, 20) // inside STREAMINFO
    assert(Flac.parse(cut).isEmpty)
  }
}
