package graft

import graft.operators.ZOrder
import graft.functions.expressions.TextExprs
import org.apache.spark.sql.functions._

/** Pins for the Z-order layout operator (q93) and the character-
  * concentration kernel (q94). The exactness gate for both queries is
  * the DuckDB oracle; these pin the KERNELS against independent
  * reference implementations and the layout writer against the
  * file-skipping property that is its whole reason to exist.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Independent bit-by-bit reference: interleave a's bits on even
    * positions — a loop, sharing nothing with the magic-mask chain.
    */
  private def spreadRef(v: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 32) { r |= ((v >> i) & 1L) << (2 * i); i += 1 }
    r
  }

  private def mortonRef(a: Long, b: Long): Long =
    spreadRef(a) | (spreadRef(b) << 1)

  test("spread/zkey: magic-mask chain equals the bit-loop reference on edges and fuzz") {
    // per-side domains (ZOrder.BoundA/BoundB): a admits the full
    // unsigned-32 range (its bit 31 spreads to the sign-safe position
    // 62); b admits [0, 2^31) (its bit 31 would land on the sign bit
    // after the <<1) — edge lists and fuzz masks differ accordingly
    val edgeA = Seq(0L, 1L, 2L, 9L, 199L, 999L, 19999L, 65535L, 65536L,
      0x7FFFFFFFL, 0x80000000L, 0xFFFFFFFFL)
    val edgeB = Seq(0L, 1L, 2L, 9L, 199L, 999L, 19999L, 65535L, 65536L,
      0x40000000L, 0x7FFFFFFFL, 0x7FFFFFFFL)
    val rnd = new scala.util.Random(93)
    val aVals = edgeA ++ Seq.fill(200)(rnd.nextLong().abs & 0xFFFFFFFFL)
    val bVals = edgeB ++ Seq.fill(200)(rnd.nextLong().abs & 0x7FFFFFFFL)
    val df = aVals.zip(bVals).toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.spread(col("a")).as("sa"),
        ZOrder.zkey(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == spreadRef(a), s"spread($a)")
      assert(r.getLong(3) == mortonRef(a, b), s"zkey($a,$b)")
    }
  }

  test("zkey: first out-of-domain value on EACH side raises loudly; in-domain twins pass") {
    def z(a: Long, b: Long): Long =
      Seq((a, b)).toDF("a", "b")
        .select(ZOrder.zkey(col("a"), col("b"))).head.getLong(0)
    // the raise may surface wrapped (task failure / constant folding)
    // — search the whole cause chain for the guard's message
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
    // the largest admissible pair computes fine
    assert(z(0xFFFFFFFFL, 0x7FFFFFFFL) ==
      mortonRef(0xFFFFFFFFL, 0x7FFFFFFFL))
    // a = 2^32 (first value past BoundA) raises, naming the side
    val ea = intercept[Throwable] { z(1L << 32, 0L) }
    assert(messages(ea).contains("zorder: a value out of"), messages(ea))
    // b = 2^31 (first value past BoundB — would hit the sign bit)
    val eb = intercept[Throwable] { z(0L, 1L << 31) }
    assert(messages(eb).contains("zorder: b value out of"), messages(eb))
    // negatives raise on either side (their sign extension would be
    // silently masked away otherwise)
    val en = intercept[Throwable] { z(-1L, 0L) }
    assert(messages(en).contains("zorder: a value out of"), messages(en))
  }

  test("zkey: de-interleaving recovers both keys exactly (no bit lost or aliased)") {
    def unspread(z: Long): Long = {
      var r = 0L; var i = 0
      while (i < 32) { r |= ((z >> (2 * i)) & 1L) << i; i += 1 }
      r
    }
    val rnd = new scala.util.Random(293)
    (0 until 500).foreach { _ =>
      val a = rnd.nextInt(1 << 20).toLong
      val b = rnd.nextInt(1 << 20).toLong
      val z = mortonRef(a, b)
      assert(unspread(z) == a && unspread(z >> 1) == b, s"($a,$b)")
    }
  }

  test("layout: z-order files bound BOTH columns; a linear sort leaves one unbounded") {
    // balanced 2-D uniform keys — the regime z-order exists for
    val rnd = new scala.util.Random(4093)
    val rows = Seq.fill(20000)((rnd.nextInt(256), rnd.nextInt(256)))
    val df = rows.toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    ZOrder.layout(df, col("a"), col("b"), 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/lin")

    def boxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("a"), max("a"), min("b"), max("b"))
        .collect()
        .map(r => (r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
          r.getAs[Number](3).longValue, r.getAs[Number](4).longValue))

    def meanArea(bs: Array[(Long, Long, Long, Long)]): Double =
      bs.map { case (a0, a1, b0, b1) =>
        (a1 - a0 + 1).toDouble * (b1 - b0 + 1).toDouble
      }.sum / bs.length

    val z = boxes(s"$dir/z")
    val lin = boxes(s"$dir/lin")
    assert(z.length > 8, s"z-order wrote ${z.length} files")

    // every linear file spans (nearly) the FULL b range — no pruning
    // on b is possible; z-order files each bound b well below that
    val fullB = 256L
    assert(lin.forall { case (_, _, b0, b1) => b1 - b0 + 1 >= fullB - 8 },
      s"linear layout unexpectedly bounds b: ${lin.mkString(";")}")
    // the z-order property is NOT smaller area (a 16×256 stripe and a
    // 64×64 square have the same area) — it is that BOTH dimensions
    // are bounded, so single-column predicates on EITHER key prune
    // statistically: a file whose morton range straddles a top-level
    // quadtree boundary can span one dim fully, but MOST files bound
    // both dims near the cell size — compare MEANS, not maxima
    def meanRange(f: ((Long, Long, Long, Long)) => Long): Array[(Long, Long, Long, Long)] => Double =
      bs => bs.map(f).sum.toDouble / bs.length
    val zMeanB = meanRange { case (_, _, b0, b1) => b1 - b0 + 1 }(z)
    val zMeanA = meanRange { case (a0, a1, _, _) => a1 - a0 + 1 }(z)
    val linMeanB = meanRange { case (_, _, b0, b1) => b1 - b0 + 1 }(lin)
    assert(linMeanB >= fullB - 8, s"linear mean b-range $linMeanB")
    assert(zMeanB <= fullB * 0.625, s"z-order mean b-range $zMeanB")
    assert(zMeanA <= fullB * 0.625, s"z-order mean a-range $zMeanA")

    // sanity: boxes stay near the ideal cell size (a contiguous morton
    // range can straddle a few quadtree cells, so allow 4× slack —
    // this catches a broken key that degenerates to random placement,
    // where every box would span the full square)
    assert(meanArea(z) <= 4.0 * (256.0 * 256.0 / z.length),
      s"z mean area ${meanArea(z)} vs ideal ${256.0 * 256.0 / z.length}")
  }

  test("charConc9: hand-computed cases incl. empty, null, astral pairs, combining marks") {
    val cases = Seq(
      ("aaaa", 1000000000L),            // single char: 10^9
      ("ab", 500000000L),               // two uniform: 10^9/2
      ("aab😀", 375000000L),  // counts 2,1,1 over n=4 -> 6/16
      ("😀😀", 1000000000L), // one astral cp, twice
      ("a😀", 500000000L),    // surrogate pair is ONE cp
      ("é", 500000000L),          // combining mark is its own cp
      ("", 0L),
      ("abc", 333333333L))              // floor(3e9/9)
    val df = cases.map(_._1).toDF("s")
      .select(col("s"), TextExprs.charConc9(col("s")).as("c"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s"conc('$s')") }
    // NULL -> 0 (totality)
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextExprs.charConc9(col("s"))).head.getLong(0)
    assert(n == 0L)
  }

  test("charConc9: fuzz parity vs a BigInt/String reference") {
    def ref(s: String): Long = {
      val cps = s.codePoints().toArray
      if (cps.isEmpty) 0L
      else {
        val counts = cps.groupBy(identity).values.map(_.length.toLong)
        val ss = counts.map(c => BigInt(c) * c).sum
        (ss * 1000000000L / (BigInt(cps.length) * cps.length)).toLong
      }
    }
    val rnd = new scala.util.Random(9394)
    // whole code points only — indexing UTF-16 units could split a
    // surrogate pair and feed invalid UTF-16, which the two sides may
    // legitimately repair differently
    val alphabet = Seq("a", "b", "c", "d", "e", "f", "g", " ",
      "😀", "é", "́", "中")
    val samples = Seq.fill(300) {
      val len = rnd.nextInt(80)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val got = samples.toDF("s")
      .select(col("s"), TextExprs.charConc9(col("s")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(got(s) == ref(s), s"fuzz '$s'"))
  }
}
