package graft

import graft.functions.TextOps
import graft.functions.expressions.{Bpe, TextExprs}
import org.apache.spark.sql.functions._

/** Seeded-random adversarial inputs for the newest kernels — the
  * fixtures a human writes are the cases a human thought of; these
  * sweep the space around them (empty/short arrays, repeated tokens,
  * unicode incl. astral, pathological repetition) with a FIXED seed so
  * a failure reproduces exactly.
  */
class FuzzSpec extends SparkSpec {

  private val alphabets = Seq(
    Seq("a", "b"),                       // tiny: maximal collisions/ties
    Seq("x", "yy", "zzz", "w"),          // varied widths
    Seq("tok", "été", "中文",
      new String(Character.toChars(0x1F600)), "mix")) // unicode + astral

  private def randTokens(rnd: scala.util.Random, maxLen: Int): Seq[String] = {
    val ab = alphabets(rnd.nextInt(alphabets.length))
    Seq.fill(rnd.nextInt(maxLen + 1))(ab(rnd.nextInt(ab.length)))
  }

  test("WindowMd5Hashes == composed slice/concat_ws on 300 random arrays x {w, minOne}") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val arrays = Seq.fill(300)(randTokens(rnd, 24))
    val df = arrays.map(a => Tuple1(a)).toDF("arr")
    for (w <- Seq(2, 3, 5, 16); minOne <- Seq(false, true)) {
      // sequence(1, 0) is DESCENDING in Spark, so guard the empty case
      val lenExpr =
        if (minOne) s"greatest(size(arr) - ${w - 1}, 1)"
        else s"size(arr) - ${w - 1}"
      val paired = df.select(
        TextExprs.windowMd5Hashes(col("arr"), w, minOne).as("native"),
        expr(s"if($lenExpr < 1, array(), transform(sequence(1, $lenExpr), " +
          s"p -> concat_ws(' ', slice(arr, p, $w))))").as("sw"))
      assert(paired.filter(size(col("native")) =!= size(col("sw")))
        .count() == 0, s"length mismatch at w=$w minOne=$minOne")
      val bad = paired
        .filter(size(col("native")) > 0)
        .withColumn("z", explode(arrays_zip(col("native"), col("sw"))))
        .select(col("z.native").as("nh"),
          TextExprs.md5Lower64(col("z.sw")).as("ch"))
        .filter(col("nh") =!= col("ch"))
      assert(bad.count() == 0, s"hash mismatch at w=$w minOne=$minOne")
    }
  }

  test("trainIndexed == train on 60 random corpora (small alphabets force dense ties)") {
    val rnd = new scala.util.Random(7)
    (1 to 60).foreach { i =>
      val nDocs = 1 + rnd.nextInt(8)
      val texts = Seq.fill(nDocs)(randTokens(rnd, 12).mkString(" "))
      val merges = 1 + rnd.nextInt(24)
      val local = Bpe.train(texts, merges)
      // rebuild the word table exactly as the local trainer does
      val wf = scala.collection.mutable.Map.empty[String, Long]
      texts.foreach(t => Option(t).map(_.trim).filter(_.nonEmpty).foreach(
        _.split("\\s+").filter(_.nonEmpty).foreach(w =>
          wf(w) = wf.getOrElse(w, 0L) + 1)))
      def symsOf(w: String): Vector[String] =
        (w.codePoints().toArray.toVector.map(cp =>
          new String(Character.toChars(cp))) :+ Bpe.EndOfWord)
      val indexed = Bpe.trainIndexed(
        wf.toSeq.map { case (w, f) => (symsOf(w), f) }, merges)
      assert(indexed == local,
        s"corpus #$i diverged: indexed=${indexed.merges} local=${local.merges} texts=$texts")
    }
  }

  test("codec mutation fuzz: flipped/truncated/spliced/garbage crawl bytes FENCE — never a throw, never a hang") {
    import graft.multimodal._
    val rnd = new scala.util.Random(20260815L)
    def rgb(w: Int, h: Int): Netpbm.Image =
      Netpbm.Image(w, h, 255,
        Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte))
    // GIF needs a palette-bounded raster (≤ 256 distinct colors)
    val palImg = {
      val pal = Array.tabulate(16)(k =>
        Array[Byte]((k * 17).toByte, (k * 11 + 3).toByte, (k * 5 + 9).toByte))
      val px = new Array[Byte](24 * 17 * 3)
      (0 until 24 * 17).foreach { i =>
        val c = pal((i * 7 + i / 24) % 16)
        px(3 * i) = c(0); px(3 * i + 1) = c(1); px(3 * i + 2) = c(2)
      }
      Netpbm.Image(24, 17, 255, px)
    }
    val base = rgb(24, 17)
    val wav = Wav.encodePcm16(Wav.Audio(8000,
      Array.tabulate[Short](400)(i => (i * 173 % 9999 - 5000).toShort)))
    // every crawl-facing decoder with a seed fixture from its own writer
    val arms: Seq[(String, Array[Byte], Array[Byte] => Unit)] = Seq(
      ("ppm", Netpbm.encodeP6(base), b => { Netpbm.decode(b); () }),
      ("bmp", Bmp.encode(base), b => { Bmp.decode(b); () }),
      ("png", Png.encode(base), b => { Png.decode(b); () }),
      ("png-adam7", Png.encode(base, interlaced = true),
        b => { Png.decode(b); () }),
      ("gif", Gif.encode(palImg), b => { Gif.decode(b); () }),
      ("gif-interlaced", Gif.encode(palImg, interlaced = true),
        b => { Gif.decode(b); () }),
      ("jpeg", Jpeg.encode(base, gray = false), b => { Jpeg.decode(b); () }),
      ("jpeg-progressive", Jpeg.encodeProgressive(base, gray = false),
        b => { Jpeg.decode(b); () }),
      ("webp", Webp.encode(base, subtractGreen = true,
        predictor = Some(11), cacheBits = 4),
        b => { Webp.decode(b); () }),
      ("webp-palette", Webp.encode(palImg, palette = true),
        b => { Webp.decode(b); () }),
      ("heif", Heif.write("avif", "av01", 48, 32, rotation = 180,
        withExif = true), b => { Heif.probe(b); () }),
      ("webp-vp8", {
        // lossy keyframe seed: per-4x4-uniform 32x16 luma bands
        val luma = Array.tabulate[Byte](32 * 16) { i =>
          (((i / 32 / 4) * 4 + (i % 32) / 4) * 16).toByte
        }
        Vp8.encodeWebp(luma, 32, 16)
      }, b => { Webp.decode(b); () }),
      ("wav", wav, b => { Wav.decode(b); () }),
      ("mp3", Mp3.write(20, id3Junk = 40), b => { Mp3.parse(b); () }),
      ("pdf", PdfText.write("fuzz target paragraph for the pdf walker"),
        b => { PdfText.extract(b); () }),
      ("pdf-glyph", PdfText.writeGlyph(
        "glyph fuzz text through the cmap", withToUnicode = true),
        b => { PdfText.extract(b); () }),
      ("zip-docx", Docx.write("fuzz docx paragraph\nsecond\tline"),
        b => { Docx.extractText(b); () }),
      ("zip-epub", Epub.write("fuzz epub chapter\nsecond line"),
        b => { Epub.extractText(b); () }),
      ("mp4", Mp4.write("isom", 64000L, Some(("avc1", 640, 360)),
        Some(("mp4a", 48000, 2))), b => { Mp4.parse(b); () }),
      ("mkv", Mkv.write("webm", 64000L, Some(("V_VP9", 640, 360)),
        Some(("A_OPUS", 48000, 2)), unknownSegmentSize = true),
        b => { Mkv.parse(b); () }),
      ("ogg", Ogg.write("opus", 2, 48000, 96312L, preSkip = 312),
        b => { Ogg.parse(b); () }),
      ("flac", Flac.write(44100, 2, 16, 441000L),
        b => { Flac.parse(b); () }),
      ("tiff", Tiff.write(big = false, 24, 17, 5, 8, 3, 2, pages = 2),
        b => { Tiff.parse(b); () }),
      ("tiff-be", Tiff.write(big = true, 24, 17, 1, 16, 1, 1),
        b => { Tiff.parse(b); () }),
      ("rtf", RtfText.write("fuzz rtf text — café\n{second}\tpara"),
        b => { RtfText.extract(b); () }),
      ("zip-odt", Odt.write("fuzz odt line\nwith  spaces\tand tab"),
        b => { Odt.extractText(b); () }),
      ("zip-xlsx", Xlsx.write("h1\th2\nfuzz\tcells"),
        b => { Xlsx.extractText(b); () }),
      ("tar", Tar.write(Seq(("a.txt", "fuzz tar member".getBytes),
        ("b/c.txt", "second member".getBytes))),
        b => { Tar.entries(b).foreach(_.foreach(e =>
          if (e.offset + e.size <= b.length) Tar.extract(b, e))); () }),
      ("cfb-doc", DocText.write("fuzz legacy word text\nsecond para"),
        b => { DocText.extract(b); () }),
      ("cfb-xls", XlsText.write("fuzz\tcells\nsecond\trow"),
        b => { XlsText.extract(b); () }),
      ("sevenz", SevenZ.write(Seq(("a.txt", "fuzz 7z member".getBytes),
        ("b/c.txt", "second member".getBytes))),
        b => { SevenZ.members(b); () }),
      ("jpeg-exif", Exif.write(
        Jpeg.encode(Netpbm.Image(8, 8, 255, Array.fill[Byte](192)(77))),
        orientation = 6, gps = Some((37.1, -122.2)),
        make = Some("fuzzcam"), dateTime = Some("2024:01:02 03:04:05"),
        comment = Some("fuzz comment")),
        b => { Exif.parse(b); Exif.strip(b); () }),
      ("cfb-ppt", PptText.write("fuzz slide\nsecond slide"),
        b => { PptText.extract(b); () }))
    def mutate(b: Array[Byte]): Array[Byte] = rnd.nextInt(4) match {
      case 0 => // flip 1..8 random bytes
        val m = b.clone()
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          if (m.nonEmpty) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        m
      case 1 => // truncate anywhere
        java.util.Arrays.copyOfRange(b, 0, rnd.nextInt(b.length + 1))
      case 2 => // splice a random slice over another position
        val m = b.clone()
        if (m.length > 8) {
          val len = 1 + rnd.nextInt(math.min(32, m.length / 2))
          val src = rnd.nextInt(m.length - len)
          val dst = rnd.nextInt(m.length - len)
          System.arraycopy(b, src, m, dst, len)
        }
        m
      case _ => // zero a random range
        val m = b.clone()
        if (m.nonEmpty) {
          val from = rnd.nextInt(m.length)
          val to = math.min(m.length, from + 1 + rnd.nextInt(24))
          java.util.Arrays.fill(m, from, to, 0.toByte)
        }
        m
    }
    val budgetNs = 10L * 1000 * 1000 * 1000 // no single decode near 10 s
    for ((name, seed, dec) <- arms) {
      var trial = 0
      while (trial < 80) {
        val m = mutate(seed)
        val t0 = System.nanoTime()
        try dec(m)
        catch {
          case e: Throwable =>
            fail(s"$name threw ${e.getClass.getName} on trial $trial " +
              s"(seed fixture mutated): ${e.getMessage}")
        }
        assert(System.nanoTime() - t0 < budgetNs,
          s"$name took too long on trial $trial — hang risk")
        trial += 1
      }
      // pure garbage buffers, incl. ones starting with the real magic
      var g = 0
      while (g < 20) {
        val junk = Array.fill[Byte](rnd.nextInt(512))(rnd.nextInt(256).toByte)
        val withMagic =
          if (seed.length >= 4 && junk.length >= 4) {
            System.arraycopy(seed, 0, junk, 0, 4); junk
          } else junk
        try dec(withMagic)
        catch {
          case e: Throwable =>
            fail(s"$name threw ${e.getClass.getName} on garbage #$g")
        }
        g += 1
      }
    }
  }

  test("substring strip invariants hold on a random corpus with planted shared runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val w = 4
    val run = Seq.fill(6)(s"run${rnd.nextInt(3)}").mkString(" ")
    val docs = (1 to 40).map { id =>
      val own = Seq.fill(3 + rnd.nextInt(10))(s"d${id}t${rnd.nextInt(6)}")
      val text =
        if (id % 3 == 0) (own.take(2) ++ Seq(run) ++ own.drop(2)).mkString(" ")
        else own.mkString(" ")
      (id.toLong, text)
    }.toDF("doc_id", "text")
    val spans = graft.operators.SubstrDedup.spans(docs, w).collect()
    val strip = graft.operators.SubstrDedup.strip(docs, w).collect()
    val spanMass = spans.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    strip.foreach { r =>
      val (id, nTok, nKept, kept) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      // dropped mass equals the span mass, never negative
      assert(nTok - nKept == spanMass.getOrElse(id, 0L), s"doc $id mass")
      // rebuilt text has exactly n_kept tokens
      val keptToks = if (kept.isEmpty) 0 else kept.split(" ").length
      assert(keptToks.toLong == nKept, s"doc $id rebuild")
    }
    // spans lie inside their doc and meet the window threshold
    val nToks = strip.map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.foreach { r =>
      val (id, s, e, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s >= 1 && e <= nToks(id) && n == e - s + 1 && n >= w,
        s"span ($id,$s,$e,$n)")
    }
    // keep-lowest: the minimal doc holding the planted run is untouched
    val planted = (1 to 40).filter(_ % 3 == 0).map(_.toLong)
    val keeper = planted.min
    assert(!spans.exists(_.getLong(0) == keeper), "keeper got a span")
    assert(planted.tail.forall(id => spans.exists(_.getLong(0) == id)),
      "every non-keeper with the planted run must have a span")
  }
}
