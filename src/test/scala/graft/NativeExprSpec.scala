package graft

import graft.functions.{TextOps, VecOps}
import graft.functions.expressions.{TextExprs, VecExprs}
import org.apache.spark.sql.functions._

/** The native Catalyst expressions must produce values identical to
  * their `functions._`-composed reference forms — same hashes, same
  * IEEE accumulation order — so either implementation can verify the
  * other (and swapping them into a hot path can never change results).
  */
class NativeExprSpec extends SparkSpec {

  private def docs = Tables(spark, sf).documents
  private def emb = Tables(spark, sf).embeddings
    .select(col("vec_id"), VecOps.toDoubles(col("embedding")).as("v"))

  test("native minhash+shingle signature == composed minhashSig(wordShingles)") {
    val toks = TextOps.tokens(TextOps.normText(col("text")))
    val both = docs.select(
      TextExprs.minhashShingleSig(toks, 3, 64).as("native"),
      TextOps.minhashSig(TextOps.wordShingles(col("text"), 3), 64).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native simhash64 == composed simhash64") {
    val toks = TextOps.tokens(TextOps.normText(col("text")))
    val both = docs.select(
      TextExprs.simhash64(toks).as("native"),
      TextOps.simhash64(toks).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native md5Lower64 == composed md5Lower64 (text, numbers rendered as strings, null)") {
    val both = docs.select(
      TextExprs.md5Lower64(col("text")).as("native"),
      TextOps.md5Lower64(col("text")).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
    val ids = docs.select(
      TextExprs.md5Lower64(col("doc_id").cast("string")).as("native"),
      TextOps.md5Lower64(col("doc_id").cast("string")).as("composed"))
    assert(ids.filter(col("native") =!= col("composed")).count() == 0)
    val nulls = docs.select(
      TextExprs.md5Lower64(lit(null).cast("string")).as("native"),
      TextOps.md5Lower64(lit(null).cast("string")).as("composed"))
    assert(nulls.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native windowMd5Hashes == composed per-position slice/concat_ws hashes") {
    val w = 16
    val toks = TextOps.tokens(TextOps.normText(col("text")))
    val paired = docs
      .select(toks.as("arr"))
      .filter(size(col("arr")) >= w)
      .select(TextExprs.windowMd5Hashes(col("arr"), w).as("native"),
        expr(s"transform(sequence(1, size(arr) - ${w - 1}), " +
          s"p -> concat_ws(' ', slice(arr, p, $w)))").as("sw"))
    // same window count per doc (arrays_zip would null-pad a mismatch)
    assert(paired.filter(size(col("native")) =!= size(col("sw"))).count() == 0)
    val mismatch = paired
      .withColumn("z", explode(arrays_zip(col("native"), col("sw"))))
      .select(col("z.native").as("nh"), TextExprs.md5Lower64(col("z.sw")).as("ch"))
      .filter(col("nh") =!= col("ch"))
    assert(mismatch.count() == 0)
    // short docs (< w tokens) yield an empty array
    val short = docs.select(toks.as("arr")).filter(size(col("arr")) < w)
      .select(TextExprs.windowMd5Hashes(col("arr"), w).as("h"))
      .filter(size(col("h")) =!= 0)
    assert(short.count() == 0)
    // minOne mirrors the q72 convention greatest(n - w + 1, 1) on all
    // docs, including ones shorter than the window (slice truncates)
    val minOne = docs.select(toks.as("arr"))
      .select(TextExprs.windowMd5Hashes(col("arr"), w, minOne = true).as("native"),
        expr(s"transform(sequence(1, greatest(size(arr) - ${w - 1}, 1)), " +
          s"p -> concat_ws(' ', slice(arr, p, $w)))").as("sw"))
    assert(minOne.filter(size(col("native")) =!= size(col("sw"))).count() == 0)
    val minOneMismatch = minOne
      .withColumn("z", explode(arrays_zip(col("native"), col("sw"))))
      .select(col("z.native").as("nh"), TextExprs.md5Lower64(col("z.sw")).as("ch"))
      .filter(col("nh") =!= col("ch"))
    assert(minOneMismatch.count() == 0)
    // hand-built array with a null token: falls back to concat_ws
    // null-skipping semantics
    import spark.implicits._
    val handDf = Seq(1).toDF("i").select(
      expr("array('a', 'b', cast(null as string), 'c')").as("arr"))
    val hand = handDf.select(
      TextExprs.windowMd5Hashes(col("arr"), 3).as("native"),
      expr("transform(sequence(1, 2), p -> concat_ws(' ', slice(arr, p, 3)))")
        .as("sw"))
      .withColumn("z", explode(arrays_zip(col("native"), col("sw"))))
      .select(col("z.native").as("nh"), TextExprs.md5Lower64(col("z.sw")).as("ch"))
    assert(hand.filter(col("nh") =!= col("ch")).count() == 0)
  }

  test("native wordShingles == composed wordShingles") {
    val toks = TextOps.tokens(TextOps.normText(col("text")))
    val both = docs.select(
      TextExprs.wordShingles(toks, 3).as("native"),
      TextOps.wordShingles(col("text"), 3).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native bandKeys == composed bandKeys") {
    val toks = TextOps.tokens(TextOps.normText(col("text")))
    val sig = TextExprs.minhashShingleSig(toks, 3, 64)
    val both = docs.select(
      TextExprs.bandKeys(sig, 16, 4).as("native"),
      TextOps.bandKeys(sig, 16, 4).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native sigAgree == composed sigJaccard") {
    val toks = TextOps.tokens(TextOps.normText(col("text")))
    val sig = TextExprs.minhashShingleSig(toks, 3, 64)
    val both = docs.select(
      TextExprs.sigAgree(sig, sig, 64).as("native"),
      TextOps.sigJaccard(sig, sig, 64).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("row-object bandKeysLocal/sigAgreeLocal == native expressions (streaming state kernels)") {
    val toks = TextOps.tokens(TextOps.normText(col("text")))
    val sig = TextExprs.minhashShingleSig(toks, 3, 64)
    val rows = docs.select(sig.as("sig"),
        TextExprs.bandKeys(sig, 16, 4).as("keys"),
        TextExprs.sigAgree(sig, sig, 64).as("agree"))
      .limit(50).collect()
    rows.foreach { r =>
      val s = r.getSeq[Int](0).toArray
      assert(TextExprs.bandKeysLocal(s, 16, 4).toSeq == r.getSeq[Int](1),
        "bandKeysLocal drifted from the native BandKeys fold")
      assert(TextExprs.sigAgreeLocal(s, s, 64) == r.getDouble(2),
        "sigAgreeLocal drifted from the native SigAgree")
    }
    // truncation convention on unequal lengths matches SigAgree's min()
    assert(TextExprs.sigAgreeLocal(Array(1, 2, 3), Array(1, 2), 64) == 2.0 / 64)
  }

  test("native dot/l2 == composed dot/l2 (bit-identical accumulation)") {
    val a = emb.select(col("vec_id").as("k"), col("v").as("a"))
    val b = emb.select((col("vec_id") - 1).as("k"), col("v").as("b"))
    val both = a.join(b, "k").select(
      VecExprs.dot(col("a"), col("b")).as("nd"),
      VecOps.dot(col("a"), col("b")).as("cd"),
      VecExprs.l2(col("a")).as("nl"),
      VecOps.l2(col("a")).as("cl"))
    assert(both.count() > 0)
    assert(both.filter(col("nd") =!= col("cd") || col("nl") =!= col("cl")).count() == 0)
  }

  test("native sqDist == composed zip_with/aggregate squared distance") {
    // pair each embedding with a shifted copy of itself so both sides
    // of the distance are real data
    val pairs = emb.withColumn("w",
      transform(col("v"), x => x * 0.5 + 1.0))
    val composed = aggregate(
      zip_with(col("v"), col("w"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)
    val both = pairs.select(
      VecExprs.sqDist(col("v"), col("w")).as("native"),
      composed.as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0,
      "sqDist must be bit-identical to the composed form")
    // degenerate parity: a null ELEMENT nulls the distance in the
    // composed form — the native kernel must agree, never reading the
    // null slot as 0.0
    import spark.implicits._
    val degenerate = Seq(
      (Seq(Option(1.0), None), Seq(Option(0.0), Option(0.0))), // null element
      (Seq(Option(1.0)), Seq(Option(0.0), Option(0.0))))       // length mismatch
      .toDF("v", "w")
      .select(VecExprs.sqDist(col("v"), col("w")).as("native"),
        aggregate(zip_with(col("v"), col("w"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d).as("composed"))
      .collect()
    degenerate.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1),
        s"degenerate input must be NULL in both forms: $r")
    }
  }

  test("native adcDist == composed element_at lookup sum") {
    import spark.implicits._
    // codes index into per-subspace rows of a distance table
    val rows = Seq(
      (Seq(0, 2, 1), Seq(Seq(1.5, 2.5, 3.5), Seq(0.25, 0.5, 0.75), Seq(10.0, 20.0, 30.0))),
      (Seq(2, 0, 0), Seq(Seq(-1.0, 0.0, 1.0), Seq(0.125, 4.0, 8.0), Seq(7.0, 9.0, 11.0))))
      .toDF("codes", "tbl")
    val composed = aggregate(
      zip_with(col("codes"), col("tbl"), (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, v) => acc + v)
    val both = rows.select(
      VecExprs.adcDist(col("codes"), col("tbl")).as("native"),
      composed.as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0,
      "adcDist must be bit-identical to the composed form")
    // long codes (widened on read-back): the composed form can't even
    // take them (element_at wants an INT index) — the native kernel
    // must, and must agree with the int-codes value
    val bothL = rows.select(
      VecExprs.adcDist(col("codes").cast("array<bigint>"), col("tbl"))
        .as("native"),
      composed.as("composed"))
    assert(bothL.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native rhpSignature == composed rhpSignature") {
    val both = emb.select(
      VecExprs.rhpSignature(col("v"), 16).as("native"),
      VecOps.rhpSignature(col("v"), 16, 64).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native simhash64 matches composed on arrays containing nulls") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("alpha", "beta"))).toDF("t")
      .select(concat(col("t"), array(lit(null).cast("string"))).as("toks"))
    val both = df.select(
      TextExprs.simhash64(col("toks")).as("native"),
      TextOps.simhash64(col("toks")).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("winnow fingerprints handle non-BMP text (code-point grams, no surrogate splits)") {
    import spark.implicits._
    val base = "shared stretch of text long enough to fingerprint reliably"
    val df = Seq(
      (1L, s"🎵🎶😀 $base 🚀🌟"),
      (2L, s"completely different prefix $base and suffix")).toDF("id", "text")
    val fps = df.select(col("id"),
      TextExprs.winnowFingerprints(TextOps.normText(col("text")), 8, 4).as("fp"))
    // deterministic + non-empty on emoji-bearing text
    val again = df.select(col("id"),
      TextExprs.winnowFingerprints(TextOps.normText(col("text")), 8, 4).as("fp"))
    assert(fps.exceptAll(again).count() == 0)
    val shared = fps.as("a").join(fps.as("b"), col("a.id") < col("b.id"))
      .select(size(array_intersect(col("a.fp"), col("b.fp"))).as("c"))
      .collect()(0).getInt(0)
    assert(shared > 0, "shared substring must still yield shared fingerprints")
  }

  test("winnow fingerprints: shared long substring => shared fingerprint") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, s"PREFIX AAA $base SUFFIX BBB"),
      (2L, s"other start $base different end")).toDF("id", "text")
    val fps = df.select(col("id"),
      TextExprs.winnowFingerprints(TextOps.normText(col("text")), 8, 4).as("fp"))
    val shared = fps.as("a").join(fps.as("b"),
        col("a.id") < col("b.id"))
      .select(size(array_intersect(col("a.fp"), col("b.fp"))).as("common"))
      .collect()(0).getInt(0)
    assert(shared > 0, "docs sharing a 60-char substring must share fingerprints")
  }

  test("native winnowMd5Grams == composed substr/md5/array_min chain on real docs + edges") {
    import spark.implicits._
    // real corpus rows — capped: the composed side re-evaluates the
    // gram transform once PER WINDOW (interpreted HOFs get no
    // subexpression elimination — the exact quadratic landmine the
    // native kernel exists to remove), so its cost is ~n·win digests
    // per char and 500 docs cost minutes
    val docs = Tables(spark, sf).documents.select(col("text")).limit(60)
    // edge rows: null, empty, below-gram, exactly gram, gram+1, ties
    // (repeated text makes every window minimum collide), unicode
    val edges = Seq(null, "", "short", "12345678", "123456789",
      "aaaaaaaaaaaaaaaaaaaaaaaa", "ababababababab",
      "café au lait avec du sucre", "中文文本段落一二三四")
      .map(Tuple1(_)).toDF("text")
    Seq(docs, edges).foreach { df =>
      val both = df.select(
        graft.functions.expressions.TextExprs
          .winnowMd5Grams(graft.functions.TextOps.normText(col("text")), 8, 4).as("nat"),
        graft.queries.TextQ.q43ComposedFps(col("text")).as("cmp"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"native ${r.getSeq[String](0).take(4)}... != composed ${r.getSeq[String](1).take(4)}...")
      }
    }
  }

  test("native winnowPositions == composed slice/array_position form, incl. tie-heavy arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val fixtures: Seq[Seq[Long]] =
      (1 to 30).map(_ => Seq.fill(1 + rnd.nextInt(80))(rnd.nextLong())) ++
        Seq(Seq.fill(25)(7L),                      // all-equal: pure tie rule
          (1 to 40).map(i => (i % 4).toLong),      // periodic ties
          (1 to 12).map(_.toLong),                 // ascending
          (1 to 12).map(i => (13 - i).toLong),     // descending
          Seq(3L))                                 // single element
    for (w <- Seq(1, 2, 5, 8)) {
      val df = fixtures.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
        .toDF("id", "hs")
        .withColumn("hw", expr("transform(hs, h -> shiftrightunsigned(h, 1))"))
      val both = df.select(col("id"),
          graft.operators.SubstrDedup.winnowSelect("hw", w).as("nat"),
          graft.operators.SubstrDedup.winnowSelectComposed("hw", w).as("cmp"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"w=$w id=${r.getLong(0)}: native ${r.getSeq[Long](1)} != composed ${r.getSeq[Long](2)}")
      }
    }
  }

  test("utf-8 validator + unlabeled-charset sniff: strict structural edges") {
    import graft.functions.expressions.CharsetDecode.{isValidUtf8, resolveFor}
    assert(isValidUtf8("plain ascii".getBytes("US-ASCII")))
    assert(isValidUtf8("d\u00e9j\u00e0 \u2014 \u4e2d\u6587 \ud83c\udf89"
      .getBytes("UTF-8")), "2/3/4-byte sequences are valid")
    assert(!isValidUtf8(Array(0xE9.toByte)), "bare latin-1 byte")
    assert(!isValidUtf8(Array(0xC0.toByte, 0xAF.toByte)), "overlong")
    assert(!isValidUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte)),
      "encoded surrogate")
    assert(!isValidUtf8(Array(0xC3.toByte)), "truncated tail")
    assert(!isValidUtf8(Array(0xF5.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte)), "past U+10FFFF")
    // resolveFor: declared label wins; unknown DECLARED label keeps the
    // utf-8 fail-open (pinned from SQL); an ABSENT label sniffs
    assert(resolveFor("caf\u00e9 page".getBytes("windows-1252"), "")
      .name == "windows-1252")
    assert(resolveFor("plain utf8".getBytes("UTF-8"), "").name == "UTF-8")
    assert(resolveFor("caf\u00e9".getBytes("windows-1252"), "no-such")
      .name == "UTF-8")
    assert(resolveFor(null, "").name == "UTF-8")
    // TOLERANCE (review finding): a genuine UTF-8 page with a few
    // stray corrupt bytes must stay UTF-8 (isolated U+FFFDs), not
    // flip the whole page to mangled windows-1252 \u2014 the sniff needs
    // PREPONDERANT legacy evidence, not a single bad byte
    val utf8Page = ("d\u00e9j\u00e0 vu \u4e2d\u6587 " * 50).getBytes("UTF-8")
    val corrupted = utf8Page.clone(); corrupted(37) = 0xE9.toByte
    assert(resolveFor(corrupted, "").name == "UTF-8",
      "one corrupt byte in a UTF-8 page must not flip the charset")
    // \u2026while a genuinely legacy page (invalid sequences dominate)
    // still sniffs to 1252
    val legacy = ("caf\u00e9 d\u00e9j\u00e0 vu na\u00efve " * 40)
      .getBytes("windows-1252")
    assert(resolveFor(legacy, "").name == "windows-1252")
  }

  test("native robotsAllowed == Robots.allowed; parse cache survives interleaved policies; null propagates; SQL form registers") {
    import graft.functions.Robots
    val policyA =
      """User-agent: graftbot
        |Disallow: /private/
        |Allow: /private/public/
        |Disallow: /*.tmp$
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val policyB = "User-agent: *\nAllow: /\n"
    val agents = Seq("GraftBot/2.1 (+https://example.org/bot)",
      "OtherBot/1.0")
    val paths = Seq("/private/page", "/private/public/x",
      "/cache/f.tmp", "/cache/f.tmp.html", "/cache/f.tmp?x=2",
      "/open/page", "/private", "/*.tmpX.tmp")
    // interleave the two policies row-by-row: a stale or
    // buffer-aliased parse cache would hand policy A's groups to
    // policy B's rows (UTF8String buffers are reused across rows \u2014
    // the expression must defensively copy its cache key)
    val rows = for {
      (pol, pi) <- Seq(policyA, policyB).zipWithIndex
      a <- agents; p <- paths
    } yield (pol, pi, a, p)
    val interleaved = rows.sortBy { case (_, pi, a, p) => (a, p, pi) }
    val df = spark.createDataFrame(interleaved)
      .toDF("robots", "pi", "agent", "path")
      .repartition(1) // one task: consecutive rows really alternate
    val got = df.select(col("pi"), col("agent"), col("path"),
      TextExprs.robotsAllowed(col("robots"), col("agent"), col("path"))
        .as("allowed")).collect()
    got.foreach { r =>
      val pol = if (r.getInt(0) == 0) policyA else policyB
      val want = Robots.allowed(pol, r.getString(1), r.getString(2))
      assert(r.getBoolean(3) == want,
        s"policy ${r.getInt(0)} ${r.getString(1)} ${r.getString(2)}")
    }
    // sanity on the semantics themselves (not just parity): the
    // specific-token group, longest-match, anchor-vs-query, and the
    // star-literal backtrack all flow through the expression
    val one = df.filter(col("pi") === 0 &&
        col("agent").startsWith("GraftBot"))
      .select(col("path"),
        TextExprs.robotsAllowed(col("robots"), col("agent"),
          col("path")).as("allowed"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!one("/private/page") && one("/private/public/x"))
    assert(!one("/cache/f.tmp") && one("/cache/f.tmp.html"))
    assert(one("/cache/f.tmp?x=2"), "query defeats the $ anchor")
    assert(!one("/*.tmpX.tmp"), "literal '*' in path must backtrack")
    // null propagation: any null input \u2192 null verdict (the
    // frontierPlan face coalesces to true \u2014 robots is opt-out)
    val nulls = spark.sql(
      "SELECT graft_robots_allowed(CAST(NULL AS STRING), 'a', '/p') n1, " +
        "graft_robots_allowed('User-agent: *\\nDisallow: /\\n', 'a', '/p') n2")
      .collect()(0)
    assert(nulls.isNullAt(0), "null policy must propagate null")
    assert(!nulls.getBoolean(1), "SQL form evaluates the policy")
    // crawl-delay expression: declared -> seconds, undeclared -> NULL
    val cd = spark.sql(
      "SELECT graft_robots_crawl_delay(" +
        "'User-agent: *\nCrawl-delay: 2.5\n', 'a') d1, " +
        "graft_robots_crawl_delay('User-agent: *\nDisallow: /x\n', 'a') d2")
      .collect()(0)
    assert(cd.getDouble(0) == 2.5 && cd.isNullAt(1))
  }
}
