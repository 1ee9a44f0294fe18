package graft.tools

import graft.multimodal.Brotli

/** Builder-side iteration harness: decode every `<name>.br` beside
  * its `<name>.raw` under args(0) and report parity; also round-trip
  * the fixture encoders. Not a test — the pinned spec is BrotliSpec.
  */
object BrotliProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.brotli.debug", "1")
    val dir = new java.io.File(args(0))
    var pass = 0
    var failN = 0
    dir.listFiles().filter(_.getName.endsWith(".br")).sortBy(_.getName)
      .foreach { f =>
        val br = java.nio.file.Files.readAllBytes(f.toPath)
        val raw = java.nio.file.Files.readAllBytes(
          new java.io.File(dir, f.getName.stripSuffix(".br") + ".raw").toPath)
        Brotli.decode(br) match {
          case Some(got) if java.util.Arrays.equals(got, raw) =>
            pass += 1
          case Some(got) =>
            failN += 1
            val n = math.min(got.length, raw.length)
            var i = 0
            while (i < n && got(i) == raw(i)) i += 1
            println(s"FAIL ${f.getName}: got ${got.length} want " +
              s"${raw.length}, first diff at $i")
          case None =>
            failN += 1
            println(s"FAIL ${f.getName}: decode fenced (None)")
        }
      }
    // fixture encoders round-trip through our own decoder
    BrotliVectors.Grid.map(_._1).distinct.foreach { kind =>
      val p = BrotliVectors.payload(kind)
      Seq(("stored", Brotli.encodeUncompressed(p)),
        ("fixed", Brotli.encodeFixed(p, split = false)),
        ("fixedsplit", Brotli.encodeFixed(p, split = true))).foreach {
        case (tag, enc) =>
          Brotli.decode(enc) match {
            case Some(got) if java.util.Arrays.equals(got, p) => pass += 1
            case _ =>
              failN += 1
              println(s"FAIL fixture $tag/$kind")
          }
      }
    }
    println(s"pass=$pass fail=$failN")
  }
}
