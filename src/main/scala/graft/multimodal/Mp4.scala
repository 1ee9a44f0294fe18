package graft.multimodal

/** ISO-BMFF (MP4/MOV/M4A — ISO/IEC 14496-12) BOX WALK — video triage
  * without a single codec frame decoded: duration, dimensions, track
  * census, codec fourccs. Video is the heaviest modality a training
  * crawl carries and the repo triaged images (7 codecs) and audio
  * (WAV decode, MP3 header walk) but no container a crawl actually
  * serves video in; the evidence a 100 TB pass needs (how long, what
  * size, which codec, is there audio) lives ENTIRELY in `moov` —
  * paying for entropy decode to learn a duration is the same mistake
  * as PCM-decoding MP3s to learn their bitrate ([[Mp3]]'s rationale).
  *
  * Profile:
  *   - Top-level walk: 32-bit sizes, `size==1` → 64-bit largesize
  *     (the >4 GiB mdat convention), `size==0` → to EOF. A child box
  *     whose declared extent overruns its parent STOPS the walk at
  *     that point, keeping everything already parsed — a truncated
  *     download with `moov` up front (the faststart layout) still
  *     yields full evidence, and `moov`-last with a truncated `mdat`
  *     yields None (the bytes that matter never arrived). The
  *     [[Mp3]]/WARC truncation discipline.
  *   - `moov` → `mvhd` (v0 u32 / v1 u64 times) for the presentation
  *     duration; per-`trak`: `tkhd` (16.16 fixed track dims),
  *     `mdia/mdhd` (track timescale), `mdia/hdlr` (vide/soun), and
  *     `mdia/minf/stbl/stsd`'s FIRST sample entry — fourcc, u16
  *     coded width/height for video, channel count + 16.16 sample
  *     rate for audio.
  *   - Compressed movie boxes (`cmov`) and encrypted schemes are
  *     simply absent from the profile: their traks carry no readable
  *     `stsd` and fence naturally (evidence stays structural).
  *
  * [[write]] is the fixture generator: real box framing (including
  * the largesize and version-1 switches) so the parser is pinned by
  * construction against the grammar it claims to walk.
  */
object Mp4 {

  /** Probe evidence. `durationMs` from mvhd; `width`/`height` from the
    * FIRST video trak's sample entry (the coded dims); codecs are the
    * first entry fourccs; counts census every trak by handler.
    */
  final case class Info(brand: String, durationMs: Long,
                        videoTracks: Int, audioTracks: Int,
                        width: Int, height: Int,
                        videoCodec: String, audioCodec: String,
                        audioRate: Int, audioChannels: Int)

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def u64(b: Array[Byte], p: Int): Long =
    (u32(b, p) << 32) | u32(b, p + 4)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "ISO-8859-1")

  /** One box at `p` within [p, end): (type, payloadStart, payloadEnd,
    * nextBoxStart), or None when the header itself doesn't fit or the
    * declared extent overruns `end`.
    */
  private def box(b: Array[Byte], p: Int, end: Int)
      : Option[(String, Int, Int)] = {
    if (p + 8 > end) return None
    val sz = u32(b, p)
    val typ = fourcc(b, p + 4)
    if (sz == 0) { // to EOF (top-level convention)
      Some((typ, p + 8, end))
    } else if (sz == 1) {
      if (p + 16 > end) return None
      val large = u64(b, p + 8)
      if (large < 16 || p + large > end) return None
      Some((typ, p + 16, p + large.toInt))
    } else {
      if (sz < 8 || p + sz > end) return None
      Some((typ, p + 8, p + sz.toInt))
    }
  }

  /** First child of `typ` within [p, end). */
  private def child(b: Array[Byte], p0: Int, end: Int,
                    typ: String): Option[(Int, Int)] = {
    var p = p0
    while (p < end) {
      box(b, p, end) match {
        case Some((t, s, e)) =>
          if (t == typ) return Some((s, e))
          p = e
        case None => return None
      }
    }
    None
  }

  private final case class Trak(kind: String, codec: String,
                                w: Int, h: Int, rate: Int, ch: Int)

  private def parseTrak(b: Array[Byte], s: Int, e: Int): Option[Trak] = {
    val mdia = child(b, s, e, "mdia").getOrElse(return None)
    val hdlr = child(b, mdia._1, mdia._2, "hdlr").getOrElse(return None)
    if (hdlr._1 + 12 > hdlr._2) return None
    val kind = fourcc(b, hdlr._1 + 8) // vide / soun / text / meta …
    val stsd = for {
      minf <- child(b, mdia._1, mdia._2, "minf")
      stbl <- child(b, minf._1, minf._2, "stbl")
      sd <- child(b, stbl._1, stbl._2, "stsd")
    } yield sd
    stsd match {
      case Some((ss, se)) if ss + 8 <= se && u32(b, ss + 4) >= 1 =>
        // first sample entry: size + fourcc, then the entry body
        box(b, ss + 8, se) match {
          case Some((fmt, bs, be)) =>
            val entryOff = bs // body after size+type (8 bytes already)
            if (kind == "vide" && entryOff + 28 <= be) {
              // SampleEntry(8) + pre_defined(2)+reserved(2)+pre_defined(12)
              // = 24, then width/height u16
              val w = u16(b, entryOff + 24)
              val h = u16(b, entryOff + 26)
              Some(Trak(kind, fmt, w, h, 0, 0))
            } else if (kind == "soun" && entryOff + 28 <= be) {
              // SampleEntry(8) + reserved(8) = 16, then channels u16,
              // samplesize u16, pre_defined u16, reserved u16,
              // samplerate 16.16
              val ch = u16(b, entryOff + 16)
              val rate = (u32(b, entryOff + 24) >> 16).toInt
              Some(Trak(kind, fmt, 0, 0, rate, ch))
            } else Some(Trak(kind, fmt, 0, 0, 0, 0))
          case None => Some(Trak(kind, "", 0, 0, 0, 0))
        }
      case _ => Some(Trak(kind, "", 0, 0, 0, 0))
    }
  }

  /** Probe the container; None when the bytes are not ISO-BMFF or no
    * complete `moov` exists in what arrived.
    */
  def parse(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 16) return None
    // the family magic: a plausible box size + 'ftyp'
    if (fourcc(bytes, 4) != "ftyp") return None
    var brand = ""
    var duration = -1L
    var timescale = 0L
    val traks = Vector.newBuilder[Trak]
    var p = 0
    var sawMoov = false
    var going = true
    while (going && p < bytes.length) {
      box(bytes, p, bytes.length) match {
        case Some((typ, s, e)) =>
          typ match {
            case "ftyp" if s + 4 <= e => brand = fourcc(bytes, s)
            case "moov" =>
              sawMoov = true
              child(bytes, s, e, "mvhd").foreach { case (ms, me) =>
                if (ms + 4 <= me) {
                  val ver = bytes(ms) & 0xff
                  if (ver == 1 && ms + 28 <= me) {
                    timescale = u32(bytes, ms + 20)
                    duration = u64(bytes, ms + 24)
                  } else if (ver == 0 && ms + 20 <= me) {
                    timescale = u32(bytes, ms + 12)
                    duration = u32(bytes, ms + 16)
                  }
                }
              }
              // every trak (child() finds the first; walk siblings)
              var tp = s
              var walking = true
              while (walking && tp < e) {
                box(bytes, tp, e) match {
                  case Some((t, ts, te)) =>
                    if (t == "trak") parseTrak(bytes, ts, te).foreach(traks += _)
                    tp = te
                  case None => walking = false
                }
              }
            case _ => () // mdat/free/skip/uuid: skipped by size
          }
          p = e
        case None => going = false // truncated box: keep what's parsed
      }
    }
    if (!sawMoov || timescale <= 0 || duration < 0) return None
    val ts = traks.result()
    val video = ts.find(_.kind == "vide")
    val audio = ts.find(_.kind == "soun")
    Some(Info(
      brand = brand,
      durationMs = duration * 1000L / timescale,
      videoTracks = ts.count(_.kind == "vide"),
      audioTracks = ts.count(_.kind == "soun"),
      width = video.map(_.w).getOrElse(0),
      height = video.map(_.h).getOrElse(0),
      videoCodec = video.map(_.codec).getOrElse(""),
      audioCodec = audio.map(_.codec).getOrElse(""),
      audioRate = audio.map(_.rate).getOrElse(0),
      audioChannels = audio.map(_.ch).getOrElse(0)))
  }

  // ---- writer (fixture generator) ----

  private final class B {
    val o = new java.io.ByteArrayOutputStream()
    def w8(v: Int): B = { o.write(v & 0xff); this }
    def w16(v: Int): B = { o.write((v >> 8) & 0xff); o.write(v & 0xff); this }
    def w32(v: Long): B = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt); this
    }
    def w64(v: Long): B = { w32(v >>> 32); w32(v & 0xFFFFFFFFL); this }
    def tag(t: String): B = { o.write(t.getBytes("ISO-8859-1")); this }
    def raw(bs: Array[Byte]): B = { o.write(bs); this }
    def zeros(n: Int): B = { var i = 0; while (i < n) { o.write(0); i += 1 }; this }
    def bytes: Array[Byte] = o.toByteArray
  }

  private def boxed(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = new B
    b.w32(8L + payload.length).tag(typ).raw(payload).bytes
  }

  /** Unity matrix for mvhd/tkhd. */
  private def matrix(b: B): B =
    b.w32(0x00010000L).w32(0).w32(0)
      .w32(0).w32(0x00010000L).w32(0)
      .w32(0).w32(0).w32(0x40000000L)

  private def videoEntry(fmt: String, w: Int, h: Int): Array[Byte] = {
    val b = new B
    b.zeros(6).w16(1) // SampleEntry: reserved + data_reference_index
    b.w16(0).w16(0).zeros(12) // pre_defined/reserved
    b.w16(w).w16(h)
    b.w32(0x00480000L).w32(0x00480000L) // 72 dpi
    b.w32(0).w16(1) // reserved, frame_count
    b.zeros(32) // compressorname
    b.w16(24).w16(0xFFFF) // depth, pre_defined -1
    boxed(fmt, b.bytes)
  }

  private def audioEntry(fmt: String, rate: Int, ch: Int): Array[Byte] = {
    val b = new B
    b.zeros(6).w16(1)
    b.zeros(8) // reserved
    b.w16(ch).w16(16).w16(0).w16(0)
    b.w32(rate.toLong << 16)
    boxed(fmt, b.bytes)
  }

  private def trakBox(kind: String, fmt: String, trackId: Int,
                      durationUnits: Long, w: Int, h: Int,
                      rate: Int, ch: Int): Array[Byte] = {
    val tkhd = {
      val b = new B
      b.w8(0).w8(0).w16(7) // v0, flags: enabled|in-movie|in-preview
      b.w32(0).w32(0).w32(trackId.toLong).w32(0).w32(durationUnits)
      b.zeros(8).w16(0).w16(0)
      b.w16(if (kind == "soun") 0x0100 else 0).w16(0)
      matrix(b)
      b.w32(w.toLong << 16).w32(h.toLong << 16)
      boxed("tkhd", b.bytes)
    }
    val mdhd = {
      val b = new B
      b.w8(0).w8(0).w16(0)
      b.w32(0).w32(0).w32(if (kind == "soun" && rate > 0) rate.toLong else 1000L)
        .w32(durationUnits)
      b.w16(0x55C4).w16(0) // language 'und', pre_defined
      boxed("mdhd", b.bytes)
    }
    val hdlr = {
      val b = new B
      b.w8(0).w8(0).w16(0)
      b.w32(0).tag(kind).zeros(12)
      b.raw((kind + "\u0000").getBytes("ISO-8859-1"))
      boxed("hdlr", b.bytes)
    }
    val entry =
      if (kind == "vide") videoEntry(fmt, w, h) else audioEntry(fmt, rate, ch)
    val stsd = {
      val b = new B
      b.w8(0).w8(0).w16(0).w32(1).raw(entry)
      boxed("stsd", b.bytes)
    }
    val stbl = boxed("stbl", stsd)
    val minf = boxed("minf", stbl)
    val mdia = boxed("mdia", mdhd ++ hdlr ++ minf)
    boxed("trak", tkhd ++ mdia)
  }

  /** A minimal-but-real container: `ftyp` + `moov`(mvhd + traks) +
    * `mdat`. `version1` exercises 64-bit mvhd times; `largeMdat` the
    * size==1 largesize arm; `moovLast` the streaming (non-faststart)
    * layout.
    */
  def write(brand: String, durationMs: Long,
            video: Option[(String, Int, Int)],
            audio: Option[(String, Int, Int)], // (fmt, rate, channels)
            version1: Boolean = false,
            largeMdat: Boolean = false,
            moovLast: Boolean = false): Array[Byte] = {
    val timescale = 1000L // ms units: durationMs IS duration-in-units
    val ftyp = {
      val b = new B
      b.tag(brand).w32(0).tag(brand).tag("iso2")
      boxed("ftyp", b.bytes)
    }
    val mvhd = {
      val b = new B
      if (version1) {
        b.w8(1).w8(0).w16(0)
        b.w64(0).w64(0).w32(timescale).w64(durationMs)
      } else {
        b.w8(0).w8(0).w16(0)
        b.w32(0).w32(0).w32(timescale).w32(durationMs)
      }
      b.w32(0x00010000L).w16(0x0100).w16(0).zeros(8)
      matrix(b)
      b.zeros(24).w32(3)
      boxed("mvhd", b.bytes)
    }
    var tid = 1
    val traks = new java.io.ByteArrayOutputStream()
    video.foreach { case (fmt, w, h) =>
      traks.write(trakBox("vide", fmt, tid, durationMs, w, h, 0, 0)); tid += 1
    }
    audio.foreach { case (fmt, rate, ch) =>
      // audio mdhd timescale = sample rate; duration in those units
      traks.write(trakBox("soun", fmt, tid, durationMs * rate / 1000,
        0, 0, rate, ch)); tid += 1
    }
    val moov = boxed("moov", mvhd ++ traks.toByteArray)
    val mdatPayload = Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)
    val mdat =
      if (largeMdat) {
        val b = new B
        b.w32(1).tag("mdat").w64(16L + mdatPayload.length).raw(mdatPayload)
        b.bytes
      } else boxed("mdat", mdatPayload)
    if (moovLast) ftyp ++ mdat ++ moov else ftyp ++ moov ++ mdat
  }
}
