package graft.tools

import graft.multimodal._

/** Builder-side high-count mutation sweep over the hostile-container
  * kernels (the r17 brotli/tar sweep pattern, r17 verdict ask #6):
  * Heif / Mp4 / Mkv / SevenZ / Cfb(doc, xls, ppt) each take N random
  * mutations (byte flips, truncations, splices, zero runs) of a
  * valid fixture, plus truncation at EVERY byte offset, plus
  * magic-preserving garbage — the probe/parse/extract must never
  * throw and never hang. Counts are recorded in ADVICE.md; the
  * always-on regression form (bounded counts) is FuzzSpec's codec
  * mutation arm. Not a test — run via `Test/runMain
  * graft.tools.ContainerSweep [n]`.
  */
object ContainerSweep {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val rnd = new scala.util.Random(0xc0417a11L)
    val arms: Seq[(String, Array[Byte], Array[Byte] => Unit)] = Seq(
      ("heif-avif", Heif.write("avif", "av01", 160, 90, rotation = 90,
        withExif = true), b => { Heif.probe(b); () }),
      ("heif-heic", Heif.write("heic", "hvc1", 200, 118, rotation = 270,
        withExif = false), b => { Heif.probe(b); () }),
      ("mp4", Mp4.write("isom", 64000L, Some(("avc1", 640, 360)),
        Some(("mp4a", 48000, 2)), version1 = true),
        b => { Mp4.parse(b); () }),
      ("mkv", Mkv.write("webm", 64000L, Some(("V_VP9", 640, 360)),
        Some(("A_OPUS", 48000, 2)), unknownSegmentSize = true),
        b => { Mkv.parse(b); () }),
      ("sevenz", SevenZ.write(Seq(
        ("a.txt", ("sweep 7z member " * 20).getBytes),
        ("b/c.txt", "second member".getBytes))),
        b => { SevenZ.members(b); () }),
      ("cfb-doc", DocText.write("sweep legacy word text\n" +
        ("second paragraph with filler " * 10)),
        b => { DocText.extract(b); () }),
      ("cfb-xls", XlsText.write(
        (0 until 12).map(i => s"cell$i\tv$i").mkString("\n")),
        b => { XlsText.extract(b); () }),
      ("cfb-ppt", PptText.write("sweep slide one\n" +
        ("more slide prose " * 12)),
        b => { PptText.extract(b); () }))
    def mutate(b: Array[Byte]): Array[Byte] = rnd.nextInt(4) match {
      case 0 =>
        val m = b.clone()
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          if (m.nonEmpty) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        m
      case 1 =>
        java.util.Arrays.copyOfRange(b, 0, rnd.nextInt(b.length + 1))
      case 2 =>
        val m = b.clone()
        if (m.length > 8) {
          val len = 1 + rnd.nextInt(math.min(32, m.length / 2))
          val src = rnd.nextInt(m.length - len)
          val dst = rnd.nextInt(m.length - len)
          System.arraycopy(b, src, m, dst, len)
        }
        m
      case _ =>
        val m = b.clone()
        if (m.nonEmpty) {
          val from = rnd.nextInt(m.length)
          val to = math.min(m.length, from + 1 + rnd.nextInt(24))
          java.util.Arrays.fill(m, from, to, 0.toByte)
        }
        m
    }
    var totalOk = 0L
    var totalThrew = 0L
    arms.foreach { case (name, seed, dec) =>
      var threw = 0L
      var slowest = 0L
      def run(b: Array[Byte], what: => String): Unit = {
        val t0 = System.nanoTime()
        try dec(b)
        catch {
          case e: Throwable =>
            threw += 1
            if (threw <= 3)
              println(s"THROW $name ${e.getClass.getName} on $what: " +
                s"${e.getMessage}")
        }
        slowest = math.max(slowest, System.nanoTime() - t0)
      }
      var i = 0
      while (i < n) { run(mutate(seed), s"mutation $i"); i += 1 }
      // truncation at every byte
      var t = 0
      while (t <= seed.length) {
        run(java.util.Arrays.copyOfRange(seed, 0, t), s"truncate $t")
        t += 1
      }
      // magic-preserving garbage
      var g = 0
      while (g < 2000) {
        val junk = Array.fill[Byte](rnd.nextInt(1024))(
          rnd.nextInt(256).toByte)
        if (seed.length >= 8 && junk.length >= 8)
          System.arraycopy(seed, 0, junk, 0, 8)
        run(junk, s"garbage $g")
        g += 1
      }
      val trials = n + seed.length + 1 + 2000
      totalOk += trials - threw
      totalThrew += threw
      println(s"$name: $trials trials, $threw threw, " +
        f"slowest ${slowest / 1e6}%.1f ms (seed ${seed.length} B)")
    }
    println(s"TOTAL: ok=$totalOk threw=$totalThrew")
  }
}
