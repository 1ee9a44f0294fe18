package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench warm list against silent growth (r19, the r18
  * verdict's harness caveat: the warm list grew two rounds running —
  * 9 → 13 entries — and warmup reached 80 s against a 68 s timed
  * total; a warm list that keeps growing converges on "measure only
  * the JIT-warm fast path"). Any change to [[Bench.WarmupQueries]]
  * must edit this pin in the same diff, making warm-list growth a
  * reviewed decision instead of a side effect of a fix.
  */
class BenchWarmlistSpec extends AnyFunSuite {

  test("warm list is frozen at the r18 13 entries — grow it only deliberately") {
    assert(Bench.WarmupQueries == Seq(
      "q01_agg_pricing", "q22_sessionize", "q31_dedup_minhash",
      "q34_embed_cosine_topk", "q45_hll_distinct", "q59_line_dedup",
      "q74_substr_spans", "q86_trigram_backoff", "q84_url_normalize",
      "q126_jpeg_decode", "q148_vp8_decode", "q128_webp_decode",
      "q150_vp8_segfilter"))
  }

  test("every warm entry is a registered query") {
    Bench.WarmupQueries.foreach(q =>
      assert(SparkEntry.queries.contains(q), s"unknown warm entry $q"))
  }
}
