package graft.tools

/** Provenance + payload generator for the brotli parity corpus under
  * `src/test/resources/brotli/`: every `v_<kind>_q<q>_w<w>.br`
  * resource is the SYSTEM `brotli` CLI's compression (quality q,
  * window w) of [[payload]]`(<kind>)`, which this object regenerates
  * deterministically — so the spec needs only the .br bytes. The
  * kinds are chosen to force distinct stream features: dictionary
  * references + transforms (`dicty`, `html`), long backward copies
  * (`rep`), the UTF8 context mode (`utf8`), high-entropy bytes
  * (`bin` — uncompressed meta-blocks at low quality), mode-switching
  * content (`mixed`), and size edges (`empty`, `one`, `long`).
  */
object BrotliVectors {

  /** Deterministic byte generator (no java.util.Random — the corpus
    * must be reproducible across JVMs).
    */
  private def lcg(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 33).toByte
      i += 1
    }
    out
  }

  def payload(kind: String): Array[Byte] = kind match {
    case "dicty" =>
      val words = Seq("the", "of", "and", "that", "with", "from",
        "this", "have", "which", "their", "about", "would", "there",
        "people", "because", "through", "information", "different",
        "government", "development", "International", "Public")
      (0 until 400).map(i => words(i % words.length) +
        (if (i % 7 == 0) ". The" else "") +
        (if (i % 11 == 0) " example.com/" else " "))
        .mkString.getBytes("UTF-8")
    case "html" =>
      (0 until 120).map(i =>
        s"""<div class="row item$i"><a href="https://example.org/p/$i?utm=x">Item number $i</a> description of the item with some text.</div>\n""")
        .mkString.getBytes("UTF-8")
    case "rep" =>
      val base = "abcdefghij0123456789"
      (0 until 500).map(i => base.substring(0, 5 + i % 15))
        .mkString("|").getBytes("UTF-8")
    case "utf8" =>
      (0 until 150).map(i =>
        s"café naïve résumé über 日本語の文章 привет $i ")
        .mkString.getBytes("UTF-8")
    case "bin" => lcg(0x9e3779b97f4a7c15L, 4096)
    case "mixed" =>
      val text = "A paragraph of plain prose follows the binary header. "
      (0 until 40).flatMap(i =>
        lcg(i * 977L, 64).toSeq ++ (text * 3).getBytes("UTF-8").toSeq)
        .toArray
    case "empty" => Array.emptyByteArray
    case "one" => Array[Byte]('x')
    case "long" =>
      val para = "Long documents stress the meta-block loop and the " +
        "window: this paragraph repeats with a counter so backward " +
        "copies span block boundaries. "
      (0 until 12000).map(i => para + i + "\n")
        .mkString.getBytes("UTF-8")
    case other => sys.error(s"unknown kind $other")
  }

  /** (kind, quality, lgwin) grid — small windows force dictionary
    * hits; q0/q1 exercise the fast-path stream shapes, q11 the
    * context-modeled ones.
    */
  val Grid: Seq[(String, Int, Int)] = Seq(
    ("dicty", 11, 22), ("dicty", 5, 22), ("dicty", 1, 10),
    ("html", 11, 22), ("html", 9, 11), ("html", 0, 22),
    ("rep", 11, 22), ("rep", 1, 22), ("rep", 5, 10),
    ("utf8", 11, 22), ("utf8", 0, 22),
    ("bin", 11, 22), ("bin", 1, 22),
    ("mixed", 11, 22), ("mixed", 5, 22),
    ("empty", 11, 22), ("one", 11, 22),
    ("long", 9, 22), ("long", 4, 18))

  def name(kind: String, q: Int, w: Int): String = s"v_${kind}_q${q}_w$w"

  /** Writes each grid payload to `<dir>/<name>.raw` for the CLI to
    * compress beside it.
    */
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(dir)
    Grid.foreach { case (kind, q, w) =>
      java.nio.file.Files.write(
        dir.resolve(name(kind, q, w) + ".raw"), payload(kind))
    }
    println(s"wrote ${Grid.size} payloads")
  }
}
