package graft

import graft.functions.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark session extensions: registers graft's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen-adjacent kernels as the DataFrame API
  * (`SELECT graft_simhash64(tokens) FROM ...`).
  *
  * Activate via EngineConf (default) or explicitly:
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
      v.intValue()
    case other =>
      // covers non-literals, NULL literals, and non-numeric literals
      // with one descriptive error instead of a CCE/NPE
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "scala_udf")

    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(tokens, n, k) - MinHash signature over word n-gram shingles"),
      (args: Seq[Expression]) =>
        MinHashShingleSig(args(0), intArg(args(1), "n"), intArg(args(2), "k"))))

    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args(0))))

    ext.injectFunction((FunctionIdentifier("graft_md5_lower64"),
      info("graft_md5_lower64",
        "graft_md5_lower64(s) - portable 64-bit hash (DuckDB md5_number_lower as signed long)"),
      (args: Seq[Expression]) => Md5Lower64(args(0))))

    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(s) - Unicode NFC canonical composition (DuckDB nfc_normalize)"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))

    ext.injectFunction((FunctionIdentifier("graft_winnow_fp"),
      info("graft_winnow_fp",
        "graft_winnow_fp(text, k, w) - winnowed rolling-hash fingerprints"),
      (args: Seq[Expression]) =>
        WinnowFingerprints(args(0), intArg(args(1), "k"), intArg(args(2), "w"))))

    ext.injectFunction((FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles",
        "graft_word_shingles(tokens, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => WordShingles(args(0), intArg(args(1), "n"))))

    ext.injectFunction((FunctionIdentifier("graft_band_keys"),
      info("graft_band_keys",
        "graft_band_keys(sig, b, r) - LSH band keys of a MinHash signature"),
      (args: Seq[Expression]) =>
        BandKeys(args(0), intArg(args(1), "b"), intArg(args(2), "r"))))

    ext.injectFunction((FunctionIdentifier("graft_sig_agree"),
      info("graft_sig_agree",
        "graft_sig_agree(a, b, k) - agreeing fraction of two MinHash signatures"),
      (args: Seq[Expression]) =>
        SigAgree(args(0), args(1), intArg(args(2), "k"))))

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_l2"),
      info("graft_l2", "graft_l2(a) - L2 norm of a double array"),
      (args: Seq[Expression]) => L2Norm(args(0))))

    ext.injectFunction((FunctionIdentifier("graft_rhp_sig"),
      info("graft_rhp_sig",
        "graft_rhp_sig(v, bits) - random-hyperplane LSH signature of a double array"),
      (args: Seq[Expression]) => RhpSignature(args(0), intArg(args(1), "bits"))))

    ext.injectFunction((FunctionIdentifier("graft_sqdist"),
      info("graft_sqdist",
        "graft_sqdist(a, b) - squared L2 distance of two double arrays"),
      (args: Seq[Expression]) => SqDist(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_adc"),
      info("graft_adc",
        "graft_adc(codes, tbl) - PQ ADC lookup sum: tbl[j][codes[j]] over j"),
      (args: Seq[Expression]) => AdcDist(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_charset_decode"),
      info("graft_charset_decode",
        "graft_charset_decode(bytes, label) - charset-aware binary->string " +
          "decode with replacement (allowlisted labels; UTF-8 fallback)"),
      (args: Seq[Expression]) => CharsetDecode(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_html_meta"),
      info("graft_html_meta",
        "graft_html_meta(html) - STRUCT<title, description, canonical, " +
          "noindex>: the crawl-metadata fields off one page's markup"),
      (args: Seq[Expression]) => HtmlMetaExtract(args(0))))

    ext.injectFunction((FunctionIdentifier("graft_robots_allowed"),
      info("graft_robots_allowed",
        "graft_robots_allowed(robots_txt, agent, path) - RFC 9309 " +
          "allow/deny verdict (parse cached across equal policies)"),
      (args: Seq[Expression]) =>
        RobotsAllowed(args(0), args(1), args(2))))

    ext.injectFunction((FunctionIdentifier("graft_robots_crawl_delay"),
      info("graft_robots_crawl_delay",
        "graft_robots_crawl_delay(robots_txt, agent) - Crawl-delay " +
          "seconds owed the agent (NULL when undeclared)"),
      (args: Seq[Expression]) => RobotsCrawlDelay(args(0), args(1))))

    // an AGGREGATE function registers the same way — the analyzer
    // wraps a returned AggregateFunction in its AggregateExpression
    // exactly as for built-ins, so `SELECT graft_bottom_k(h, v, 1024)
    // ... GROUP BY g` works in plain SQL
    ext.injectFunction((FunctionIdentifier("graft_bottom_k"),
      info("graft_bottom_k",
        "graft_bottom_k(h, v, k) - deterministic bottom-k (hash, value) " +
          "sample per group, ascending (the StatsMaintain quantile sketch)"),
      (args: Seq[Expression]) =>
        BottomKSample(args(0), args(1), intArg(args(2), "k"))))
  }
}
