package graft

import graft.multimodal.{Mkv, Mp4}
import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF box walk + Matroska EBML walk — probe round trips through
  * the repo's own writers across the grammar-switch matrix (64-bit
  * times, largesize, moov-last, unknown-size Segment, float64
  * Duration), the truncation discipline, and the hostile-byte fences.
  */
class VideoProbeSpec extends AnyFunSuite {

  // ---- MP4 ----

  private def mp4RoundTrip(version1: Boolean, largeMdat: Boolean,
                           moovLast: Boolean): Unit = {
    val bytes = Mp4.write("isom", 90500L,
      video = Some(("avc1", 1920, 1080)),
      audio = Some(("mp4a", 48000, 2)),
      version1 = version1, largeMdat = largeMdat, moovLast = moovLast)
    val info = Mp4.parse(bytes).get
    assert(info.brand == "isom")
    assert(info.durationMs == 90500L)
    assert(info.videoTracks == 1 && info.audioTracks == 1)
    assert(info.width == 1920 && info.height == 1080)
    assert(info.videoCodec == "avc1" && info.audioCodec == "mp4a")
    assert(info.audioRate == 48000 && info.audioChannels == 2)
  }

  test("mp4 probe round trip across the switch matrix (v0/v1 mvhd × mdat size forms × moov placement)") {
    for (v1 <- Seq(false, true); lg <- Seq(false, true);
         last <- Seq(false, true))
      mp4RoundTrip(v1, lg, last)
  }

  test("mp4: video-only and audio-only track censuses") {
    val v = Mp4.parse(Mp4.write("mp42", 1000L,
      video = Some(("vp09", 640, 360)), audio = None)).get
    assert(v.videoTracks == 1 && v.audioTracks == 0)
    assert(v.audioCodec == "" && v.audioRate == 0 && v.audioChannels == 0)
    assert(v.brand == "mp42")
    // M4A-style: the ISO-BMFF family covers crawl audio too
    val a = Mp4.parse(Mp4.write("M4A ", 2500L,
      video = None, audio = Some(("mp4a", 44100, 1)))).get
    assert(a.videoTracks == 0 && a.audioTracks == 1)
    assert(a.width == 0 && a.height == 0 && a.videoCodec == "")
    assert(a.audioRate == 44100 && a.audioChannels == 1)
  }

  test("mp4 truncation discipline: faststart keeps full evidence, moov-last fences") {
    val fast = Mp4.write("isom", 7000L, Some(("avc1", 320, 240)), None)
    // cut inside the trailing mdat: moov already arrived → full probe
    val cut = java.util.Arrays.copyOfRange(fast, 0, fast.length - 5)
    val info = Mp4.parse(cut).get
    assert(info.durationMs == 7000L && info.width == 320)
    // moov-last: the same cut removes the box that matters → None
    val late = Mp4.write("isom", 7000L, Some(("avc1", 320, 240)), None,
      moovLast = true)
    val cutLate = java.util.Arrays.copyOfRange(late, 0, late.length - 5)
    assert(Mp4.parse(cutLate).isEmpty)
  }

  test("mp4 fences: non-bmff, empty, declared-size overrun, null") {
    assert(Mp4.parse(null).isEmpty)
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4.parse("not a container at all, just prose".getBytes).isEmpty)
    // a real file whose moov size field claims more bytes than exist:
    // the walk stops at the overrun and (no moov parsed) fences
    val ok = Mp4.write("isom", 1000L, Some(("avc1", 64, 64)), None)
    val moovAt = {
      var p = -1
      var i = 0
      while (p < 0 && i < ok.length - 4) {
        if (ok(i + 4) == 'm' && ok(i + 5) == 'o' && ok(i + 6) == 'o' &&
            ok(i + 7) == 'v') p = i
        i += 1
      }
      p
    }
    val lied = ok.clone()
    lied(moovAt) = 0x7F // moov size → huge
    assert(Mp4.parse(lied).isEmpty)
  }

  // ---- Matroska / WebM ----

  private def mkvRoundTrip(unknownSeg: Boolean, float8: Boolean): Unit = {
    val bytes = Mkv.write("webm", 123456L,
      video = Some(("V_VP9", 1280, 720)),
      audio = Some(("A_OPUS", 48000, 2)),
      unknownSegmentSize = unknownSeg, float8 = float8)
    val info = Mkv.parse(bytes).get
    assert(info.docType == "webm")
    assert(info.durationMs == 123456L)
    assert(info.videoTracks == 1 && info.audioTracks == 1)
    assert(info.width == 1280 && info.height == 720)
    assert(info.videoCodec == "V_VP9" && info.audioCodec == "A_OPUS")
    assert(info.audioRate == 48000 && info.audioChannels == 2)
  }

  test("mkv probe round trip across the switch matrix (known/unknown Segment size × float32/float64 Duration)") {
    for (u <- Seq(false, true); f8 <- Seq(false, true))
      mkvRoundTrip(u, f8)
  }

  test("mkv: matroska doctype, video-only census, audio defaults") {
    val v = Mkv.parse(Mkv.write("matroska", 500L,
      video = Some(("V_MPEG4/ISO/AVC", 720, 576)), audio = None)).get
    assert(v.docType == "matroska")
    assert(v.videoTracks == 1 && v.audioTracks == 0)
    assert(v.audioRate == 0 && v.audioChannels == 0 && v.audioCodec == "")
    val a = Mkv.parse(Mkv.write("webm", 800L, video = None,
      audio = Some(("A_VORBIS", 44100, 1)))).get
    assert(a.videoTracks == 0 && a.audioTracks == 1)
    assert(a.audioCodec == "A_VORBIS" && a.audioRate == 44100)
  }

  test("mkv truncation discipline: cut inside the Cluster keeps Info+Tracks evidence") {
    val full = Mkv.write("webm", 42000L, Some(("V_VP8", 640, 480)), None,
      unknownSegmentSize = true)
    // the Cluster is the trailing element; cutting its payload leaves
    // the walk's Info/Tracks intact (unknown-size Segment walks to EOF)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 2)
    val info = Mkv.parse(cut).get
    assert(info.durationMs == 42000L && info.width == 640)
  }

  test("mkv fences: non-ebml, empty, null, overrun child") {
    assert(Mkv.parse(null).isEmpty)
    assert(Mkv.parse(Array.emptyByteArray).isEmpty)
    assert(Mkv.parse("EBML is a fine format, this is not it".getBytes).isEmpty)
    // corrupt a size vint so a child overruns its parent: the walk
    // stops, and with neither Info nor Tracks parsed the probe fences
    val ok = Mkv.write("webm", 100L, Some(("V_VP9", 32, 32)), None)
    // find the Info element id (0x15 0x49 0xA9 0x66) and blow its size
    var p = -1
    var i = 0
    while (p < 0 && i < ok.length - 4) {
      if ((ok(i) & 0xff) == 0x15 && (ok(i + 1) & 0xff) == 0x49 &&
          (ok(i + 2) & 0xff) == 0xA9 && (ok(i + 3) & 0xff) == 0x66) p = i
      i += 1
    }
    val lied = ok.clone()
    lied(p + 4) = 0x41 // size 0x41xx → far past the parent's end
    lied(p + 5) = 0xFF.toByte
    assert(Mkv.parse(lied).isEmpty)
  }
}
