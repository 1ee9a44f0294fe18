package graft.tools

import graft.multimodal.Vp8

/** Provenance tool for the `segf_*` parity vectors under
  * `src/test/resources/vp8/`: emits OUR encoder's segmentation +
  * loop-filter keyframes (the r17 [[Vp8.FilterCfg]] arm) as `.webp`
  * files into args(0). A C harness then decodes each with the SYSTEM
  * libwebp and dumps its YUV next to it (i16 header w/h/stride/
  * uvStride, then the Y/U/V planes — the same format as every other
  * `.yuv` resource); the pairs ship as test resources and
  * [[graft.Vp8Spec]] pins byte parity. Content is per-4x4-uniform
  * (the encoder's contract) but NON-trivial: block values spread so
  * edges straddle the filter thresholds both ways.
  */
object GenSegVectors {

  /** The vector grid: name -> (dims, luma pattern, cfg). Kept in ONE
    * place so the spec can re-derive the encoder inputs if ever
    * needed.
    */
  def grid: Seq[(String, Int, Int, Vp8.FilterCfg)] = Seq(
    ("segf_abs_norm_s0", 48, 32, Vp8.FilterCfg(simple = false,
      level = 24, sharpness = 0, refDelta = -2, modeDelta = 3,
      segAbs = true, segLf = Seq(0, 18, 33, 63),
      segIdOf = (x, y) => (x + 2 * y) % 4)),
    ("segf_abs_norm_s4", 48, 32, Vp8.FilterCfg(simple = false,
      level = 24, sharpness = 4, refDelta = 2, modeDelta = -1,
      segAbs = true, segLf = Seq(4, 0, 22, 50),
      segIdOf = (x, y) => (3 * x + y) % 4)),
    ("segf_abs_simple_s0", 48, 32, Vp8.FilterCfg(simple = true,
      level = 30, sharpness = 0, refDelta = -4, modeDelta = 2,
      segAbs = true, segLf = Seq(2, 12, 28, 44),
      segIdOf = (x, y) => (x + y) % 4)),
    ("segf_rel_norm_s0", 48, 32, Vp8.FilterCfg(simple = false,
      level = 20, sharpness = 0, refDelta = -2, modeDelta = 1,
      segAbs = false, segLf = Seq(-20, -10, 0, 15),
      segIdOf = (x, y) => (x + 2 * y) % 4)),
    ("segf_rel_norm_s7", 48, 32, Vp8.FilterCfg(simple = false,
      level = 33, sharpness = 7, refDelta = 3, modeDelta = -2,
      segAbs = false, segLf = Seq(-33, -15, 5, 20),
      segIdOf = (x, y) => (x * y + x) % 4)),
    ("segf_rel_simple_s2", 48, 32, Vp8.FilterCfg(simple = true,
      level = 18, sharpness = 2, refDelta = 1, modeDelta = 1,
      segAbs = false, segLf = Seq(-18, -6, 0, 30),
      segIdOf = (x, y) => (x + 3 * y) % 4)),
    ("segf_rel_norm_hev", 48, 32, Vp8.FilterCfg(simple = false,
      level = 45, sharpness = 0, refDelta = -3, modeDelta = 0,
      segAbs = false, segLf = Seq(0, -30, 10, -45),
      segIdOf = (x, y) => (2 * x + y) % 4)),
    ("segf_abs_norm_lvl63", 48, 32, Vp8.FilterCfg(simple = false,
      level = 10, sharpness = 1, refDelta = 6, modeDelta = 5,
      segAbs = true, segLf = Seq(63, 1, 40, 0),
      segIdOf = (x, y) => (x * 7 + y * 5) % 4)))

  /** Deterministic per-4x4-uniform luma whose block VALUE TABLE is
    * chosen so adjacent-block diffs span 2..166 — below, at and above
    * the edge threshold `2d + d/2 <= limit` for every segment level
    * in the grid, so each vector carries BOTH filtered and fenced
    * edges (an all-large-step pattern exceeds every limit and turns
    * the whole filter pass into a vacuous no-op — the first cut of
    * these vectors did exactly that).
    */
  private val Steps = Array(0, 2, 6, 14, 26, 46, 86, 166)

  def luma(w: Int, h: Int): Array[Byte] = {
    val a = new Array[Byte](w * h)
    var i = 0
    while (i < a.length) {
      val bx = (i % w) / 4; val by = (i / w) / 4
      a(i) = (60 + Steps((bx + 3 * by) % 8)).toByte
      i += 1
    }
    a
  }

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(dir)
    grid.foreach { case (name, w, h, cfg) =>
      val bytes = Vp8.encodeWebp(luma(w, h), w, h, Some(cfg))
      java.nio.file.Files.write(dir.resolve(s"$name.webp"), bytes)
      println(s"$name: ${bytes.length} bytes")
    }
  }
}
