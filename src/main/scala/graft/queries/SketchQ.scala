package graft.queries

import graft.Tables
import graft.functions.expressions.TextExprs.md5Lower64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Approximate / sketch operators (SURVEY.md §2 rows 55–58): the
  * scale-path variants behind the exact operators. At 100 TB an exact
  * COUNT(DISTINCT) is a full shuffle of every distinct value and an
  * exact quantile is a global sort; the sketches bound both to O(m)
  * state per group (HLL registers, a fixed-rate hash sample) that
  * merges associatively across partitions — the shape that survives a
  * 1000-executor fan-in.
  *
  * Unlike builtin approx sketches (Spark HLL++ vs DuckDB's HLL are
  * different implementations with implementation-defined estimates),
  * every operator here is built from the engine-portable md5 hash
  * family ([[graft.functions.TextOps.md5Lower64]]), so the SAME
  * estimate is computable in ANSI SQL and the DuckDB oracle checks it
  * EXACTLY — approximate relative to the true value, deterministic
  * relative to the implementation.
  *
  * Reference anchor: the reference tool surfaces dataset stats around
  * uploads — file size (/root/reference/src/utils/fileHandling.js:30-37)
  * and registry counts (/root/reference/src/api/templates.js:60-66);
  * these sketches are the bounded-memory forms of such profile stats
  * computed in-cluster over the data itself.
  */
object SketchQ {

  import graft.operators.Hll
  private val M = Hll.M
  private val RhoMax = Hll.RhoMax
  private val Scale = Hll.Scale

  /** q45: HLL approximate COUNT(DISTINCT l_orderkey) per return flag,
    * alongside the exact count and the relative error.
    *
    * The register derivation and estimator live in
    * [[graft.operators.Hll]] — ONE definition shared with the
    * streaming windowed mirror, so the continuous estimate can never
    * drift from this oracle-checked batch form.
    *
    * Scale path: the register table is at most m rows per group after
    * the partial max(rho) combine — a 100 TB scan reduces map-side to
    * 64 longs per group per task before the one tiny shuffle.
    */
  def q45(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val key = col("l_orderkey").cast("string")
    val regs = t.lineitem
      .select(col("l_returnflag"), Hll.reg(key).as("reg"),
        Hll.rho(key).as("rho"))
      .groupBy(col("l_returnflag"), col("reg"))
      .agg(max(col("rho")).as("mj"))
    val hll = Hll.estimate(regs, Seq("l_returnflag"))
    val exact = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_nd"))
    hll.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("est_nd"), col("exact_nd"),
        round4(abs(col("est_nd") - col("exact_nd")).cast("double") /
          col("exact_nd").cast("double")).as("rel_err4"))
      .orderBy(col("l_returnflag"))
  }

  val q45Sql: String =
    s"""WITH h AS (
       |  SELECT l_returnflag,
       |    CAST(md5_number_lower(coalesce(CAST(l_orderkey AS VARCHAR), '')) & 63 AS INT) AS reg,
       |    md5_number_lower(coalesce(CAST(l_orderkey AS VARCHAR), '')) >> 6 AS w
       |  FROM lineitem),
       |regs AS (
       |  SELECT l_returnflag, reg,
       |    MAX(CASE WHEN w = 0 THEN $RhoMax
       |             ELSE $RhoMax - length(bin(w)) END) AS mj
       |  FROM h GROUP BY l_returnflag, reg),
       |g AS (
       |  SELECT l_returnflag,
       |    SUM(CAST(CAST(1 AS BIGINT) << CAST($RhoMax - mj AS INT)
       |        AS DECIMAL(38,0))) AS sp,
       |    COUNT(*) AS nb
       |  FROM regs GROUP BY l_returnflag),
       |e AS (
       |  SELECT l_returnflag, $M - nb AS v,
       |    CAST(sp + CAST($M - nb AS DECIMAL(38,0)) *
       |      CAST($Scale AS DECIMAL(38,0)) AS DOUBLE) AS st
       |  FROM g),
       |est AS (
       |  SELECT l_returnflag,
       |    CAST(FLOOR(CASE
       |      WHEN (0.709 * 64 * 64 * $Scale) / st <= ${2.5 * M} AND v > 0
       |        THEN 64.0 * ln(64.0 / v)
       |      ELSE (0.709 * 64 * 64 * $Scale) / st END + 0.5) AS BIGINT) AS est_nd
       |  FROM e),
       |x AS (
       |  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_nd
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT est.l_returnflag, est_nd, exact_nd,
       |  ${round4Sql("CAST(ABS(est_nd - exact_nd) AS DOUBLE) / CAST(exact_nd AS DOUBLE)")} AS rel_err4
       |FROM est JOIN x USING (l_returnflag) ORDER BY l_returnflag""".stripMargin

  /** q46: quantile sketch — a deterministic ~10% Bernoulli hash sample
    * (keep iff the row hash's low 10 bits < 102) with the exact
    * interpolated quantile over the sample. The sample decision is a
    * pure function of the row key, so it is identical across engines,
    * retries, and cluster layouts — unlike rand()-based sampling.
    *
    * Scale path: the global sort behind an exact quantile shrinks 10×
    * before it shuffles; the rate is tunable per accuracy target and
    * composes with per-group stratification (q47's shape).
    */
  def q46(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    // ONE sampling rule (operators.Sample) shared with q47/streaming:
    // 102/1024 is an exact binary fraction, so floor(rate·1024) = 102
    t.lineitem
      .filter(graft.operators.Sample.keep(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")),
        lit(102.0 / 1024)))
      .groupBy(col("l_returnflag"))
      .agg(
        round4(expr("percentile(l_extendedprice, 0.5)")).as("med_price4"),
        round4(expr("percentile(l_extendedprice, 0.9)")).as("p90_price4"),
        count(lit(1)).as("n_sample"))
      .orderBy(col("l_returnflag"))
  }

  val q46Sql: String =
    s"""SELECT l_returnflag,
       |  ${round4Sql("quantile_cont(l_extendedprice, 0.5)")} AS med_price4,
       |  ${round4Sql("quantile_cont(l_extendedprice, 0.9)")} AS p90_price4,
       |  COUNT(*) AS n_sample
       |FROM lineitem
       |WHERE md5_number_lower(concat_ws('-', l_orderkey, l_linenumber)) & 1023 < 102
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q47: stratified sampling for training-data mixing — downsample
    * the dominant language hard (en: 256/1024 ≈ 25%) and keep the
    * long-tail languages at 768/1024 ≈ 75%, deterministically by
    * doc_id hash. The per-class keep decision is a map-side filter
    * (no shuffle at all until the reporting agg), which is the only
    * shape that works when the corpus is 100 TB and the sample is
    * what fits the trainer.
    */
  def q47(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val kept = graft.operators.Sample
      .stratified(t.documents, "doc_id", "lang",
        Map("en" -> 0.25), defaultRate = 0.75)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    val total = t.documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"))
    total.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        round4(coalesce(col("n_kept"), lit(0L)).cast("double") /
          col("n_total").cast("double")).as("rate4"))
      .orderBy(col("lang"))
  }

  val q47Sql: String =
    s"""WITH kept AS (
       |  SELECT lang, COUNT(*) AS n_kept FROM documents
       |  WHERE md5_number_lower(coalesce(CAST(doc_id AS VARCHAR), '')) & 1023 <
       |    CASE WHEN lang = 'en' THEN 256 ELSE 768 END
       |  GROUP BY lang),
       |total AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang)
       |SELECT total.lang, n_total, COALESCE(n_kept, 0) AS n_kept,
       |  ${round4Sql("CAST(COALESCE(n_kept, 0) AS DOUBLE) / CAST(n_total AS DOUBLE)")} AS rate4
       |FROM total LEFT JOIN kept USING (lang) ORDER BY lang""".stripMargin

  /** q48: deterministic training-shard assignment + interleave order —
    * shard = low 3 hash bits (8 shards), position = rank of the
    * remaining hash bits within the shard. Hash-ordering is the
    * standard "global shuffle without a shuffle seed" for training
    * data: every engine/retry produces the same shard files in the
    * same order, and the order is uncorrelated with any data column.
    *
    * The rank ranks by the UNSIGNED hash: Spark longs are signed, so
    * the order key is hash >>> 1 (top bit dropped into non-negative
    * range), which DuckDB's unsigned `>> 1` reproduces bit-for-bit.
    *
    * Scale path: one hash-partitioned shuffle on shard (8-way here,
    * 10k-way at 100 TB), then a within-partition sort — exactly a
    * `repartition(shard).sortWithinPartitions(...)` write layout.
    */
  def q48(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val h = md5Lower64(col("doc_id").cast("string"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord"), col("doc_id"))
    t.documents
      .select(col("doc_id"), h.bitwiseAND(lit(7L)).as("shard"),
        call_function("shiftrightunsigned", h, lit(1)).as("ord"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val q48Sql: String =
    """SELECT doc_id,
      |  CAST(md5_number_lower(coalesce(CAST(doc_id AS VARCHAR), '')) & 7 AS BIGINT) AS shard,
      |  CAST(ROW_NUMBER() OVER (
      |    PARTITION BY md5_number_lower(coalesce(CAST(doc_id AS VARCHAR), '')) & 7
      |    ORDER BY md5_number_lower(coalesce(CAST(doc_id AS VARCHAR), '')) >> 1, doc_id)
      |    AS BIGINT) AS pos
      |FROM documents
      |ORDER BY shard, pos""".stripMargin

  /** q49: count-min frequent items — the top-10 corpus tokens by
    * count-min-sketch estimate (Cormode & Muthukrishnan 2005), next to
    * their exact counts. d=4 hash rows × w=1024 buckets, the rows from
    * the SAME Kirsch–Mitzenmacher double-hashing family as MinHash
    * (h_j = (x1 + j·x2) mod w from one md5 digest), so the whole
    * sketch is engine-portable and the oracle replays it exactly.
    * est_n ≥ exact_n always (collisions only ever add).
    *
    * Scale path: the sketch state is d·w counters regardless of corpus
    * size, accumulated with map-side partial aggregation — the
    * frequency table a 100 TB corpus can't afford to materialize
    * exactly is approximated in 16 KB.
    */
  def q49(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextOps
    import graft.operators.Cm
    val t = Tables(s, dir)
    val counts = t.documents
      .select(explode(TextOps.tokens(TextOps.normText(col("text")))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    // cell coordinates via the shared Cm kernel (ONE definition with
    // the streaming windowed sketch)
    val cells = Cm.withCells(counts)
    val cm = cells.groupBy(col("j"), col("bucket"))
      .agg(sum(col("n")).as("cell_n"))
    cells.join(cm, Seq("j", "bucket"))
      .groupBy(col("tok"), col("n"))
      .agg(min(col("cell_n")).as("est_n"))
      .select(col("tok"), col("est_n"), col("n").as("exact_n"))
      .orderBy(col("est_n").desc, col("tok"))
      .limit(10)
  }

  val q49Sql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_split_to_array(
      |    trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+')) AS tok
      |  FROM documents),
      |cnt AS (
      |  SELECT tok, COUNT(*) AS n FROM toks WHERE length(tok) > 0 GROUP BY tok),
      |bases AS (
      |  SELECT tok, n,
      |    list_reduce(list_transform(range(1,16),
      |      q -> CAST(strpos('0123456789abcdef', substr(md5(tok), CAST(q AS INT), 1)) - 1 AS BIGINT)),
      |      (a,b) -> a*16+b) % 2147483647 AS x1,
      |    list_reduce(list_transform(range(16,31),
      |      q -> CAST(strpos('0123456789abcdef', substr(md5(tok), CAST(q AS INT), 1)) - 1 AS BIGINT)),
      |      (a,b) -> a*16+b) % 2147483646 + 1 AS x2
      |  FROM cnt),
      |cells AS (
      |  SELECT tok, n, r.j AS j, (x1 + r.j * x2) % 1024 AS bucket
      |  FROM bases, range(0,4) r(j)),
      |cm AS (
      |  SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS cell_n
      |  FROM cells GROUP BY j, bucket),
      |est AS (
      |  SELECT tok, n AS exact_n, MIN(cell_n) AS est_n
      |  FROM cells JOIN cm USING (j, bucket) GROUP BY tok, n)
      |SELECT tok, est_n, exact_n FROM est
      |ORDER BY est_n DESC, tok LIMIT 10""".stripMargin

  /** q51: repetition/diversity quality signals (the Gopher-rules
    * class of training-data filters): per document, the distinct-token
    * ratio and the most-frequent-token fraction — high repetition
    * (low distinct ratio, high top fraction) marks template/boilerplate
    * text a training mix usually drops. Composes with q41's
    * surface-quality scores; thresholding is the caller's policy.
    *
    * Scale path: one shuffle on (doc_id, token) with map-side partial
    * counts, then a per-doc reduce of ≤ vocabulary-size rows.
    */
  def q51(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextOps
    val t = Tables(s, dir)
    val toks = t.documents
      .select(col("doc_id"),
        explode(TextOps.tokens(TextOps.normText(col("text")))).as("tok"))
      .filter(length(col("tok")) > 0)
    toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_toks"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_c"))
      .select(col("doc_id"), col("n_toks"),
        round4(col("n_distinct").cast("double") /
          col("n_toks").cast("double")).as("distinct_ratio4"),
        round4(col("max_c").cast("double") /
          col("n_toks").cast("double")).as("top_tok_frac4"))
      .orderBy(col("doc_id"))
  }

  val q51Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), '\\s+')) AS tok
       |  FROM documents),
       |pt AS (
       |  SELECT doc_id, tok, COUNT(*) AS c FROM toks
       |  WHERE length(tok) > 0 GROUP BY doc_id, tok)
       |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
       |  ${round4Sql("CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)")} AS distinct_ratio4,
       |  ${round4Sql("CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)")} AS top_tok_frac4
       |FROM pt GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q55: deterministic bottom-k sample per stratum — exactly k docs
    * per language, picked by the k smallest domain-separated hashes
    * (the deterministic analogue of per-stratum reservoir sampling:
    * same invariance to order/partitioning/retries as [[q47]], but a
    * fixed COUNT per class instead of a fixed rate — what a trainer
    * wants when the mix is specified in examples, not fractions).
    * The "res:" domain prefix decorrelates the pick from the q47 rate
    * gate and the q48 shard hash.
    *
    * Scale path: one shuffle on the stratum + per-group sort. When one
    * stratum is most of a 100 TB corpus, pre-thin it with
    * [[graft.operators.Sample.keep]] at a few×(k/N) first — the
    * bottom-k of a deterministic-hash subsample that keeps the true
    * bottom-k is the same bottom-k, and the sort shrinks by the rate.
    */
  def q55(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val t = Tables(s, dir)
    val h = md5Lower64(concat(lit("res:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("ord"), col("doc_id"))
    t.documents
      .select(col("doc_id"), col("lang"),
        call_function("shiftrightunsigned", h, lit(1)).as("ord"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  val q55Sql: String =
    """SELECT lang, rk, doc_id FROM (
      |  SELECT lang, doc_id, CAST(ROW_NUMBER() OVER (
      |    PARTITION BY lang
      |    ORDER BY md5_number_lower('res:' || CAST(doc_id AS VARCHAR)) >> 1, doc_id)
      |    AS BIGINT) AS rk
      |  FROM documents)
      |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin

  /** q58: sequence packing — assign each document a (pack, offset)
    * inside its training shard under a fixed token budget per packed
    * sequence: documents are laid out in the shard's hash-interleave
    * order (q48's), token counts accumulate, and the concatenated
    * stream is cut every `budget` tokens (the GPT-style "concat and
    * chunk" layout). pack_id/pack_offset are where the doc STARTS;
    * a doc may span into the next pack — the trainer's reader handles
    * the spill, this operator fixes the deterministic layout.
    *
    * Scale shape: identical to q48 — one hash-partitioned shuffle on
    * the shard + a within-shard running sum (ROWS frame); every value
    * is a pure function of the data, so re-runs lay out byte-identical
    * epochs.
    */
  /** Token budget the registered q58 Entry AND its oracle both use —
    * callers picking another budget leave the paired q58Sql behind.
    */
  val PackBudget = 512

  def q58(s: SparkSession, dir: String, budget: Int = PackBudget): DataFrame = {
    import graft.functions.TextOps
    val t = Tables(s, dir)
    val h = md5Lower64(col("doc_id").cast("string"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.documents
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok"),
        h.bitwiseAND(lit(7L)).as("shard"),
        call_function("shiftrightunsigned", h, lit(1)).as("ord"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        floor((col("cum") - col("n_tok")).cast("double") / budget)
          .cast("bigint").as("pack_id"),
        pmod(col("cum") - col("n_tok"), lit(budget.toLong)).as("pack_offset"))
      .orderBy(col("shard"), col("pack_id"), col("pack_offset"), col("doc_id"))
  }

  val q58Sql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok,
      |    md5_number_lower(coalesce(CAST(doc_id AS VARCHAR), '')) AS h
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, n_tok, CAST(h & 7 AS BIGINT) AS shard, h >> 1 AS ord
      |  FROM t),
      |c AS (
      |  SELECT doc_id, n_tok, shard,
      |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY ord, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM o)
      |SELECT doc_id, shard, n_tok,
      |  CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / $PackBudget) AS BIGINT) AS pack_id,
      |  CAST((cum - n_tok) % $PackBudget AS BIGINT) AS pack_offset
      |FROM c ORDER BY shard, pack_id, pack_offset, doc_id""".stripMargin

  /** q63: balanced source-mixing rates
    * ([[graft.operators.Mixer.balancedRates]]): the per-source keep
    * rate that makes every source contribute the SAME token count —
    * the smallest source participates fully, everyone else
    * downsamples to match. The planning step that turns token
    * supplies into the stratified-sampling probabilities q47 /
    * CorpusPrep consume. The rate is a single division of exact
    * integers, so the raw double is engine-identical.
    */
  def q63(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextOps
    graft.operators.Mixer.balancedRates(
      Tables(s, dir).documents,
      org.apache.spark.sql.functions.size(TextOps.tokens(col("text"))))
  }

  val q63Sql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source)
      |SELECT source, tokens,
      |  CAST(min(tokens) OVER () AS DOUBLE) / tokens AS rate
      |FROM t ORDER BY source""".stripMargin

  /** q79: temperature source-mixing rates
    * ([[graft.operators.Mixer.temperatureRates]] at alpha = 0.5): the
    * softened interpolation between q63's balanced mix and
    * proportional sampling — contribution ∝ tokens^0.5, the
    * mC4/XLM-R low-resource-upsampling family. alpha is PINNED at 0.5
    * in the registered entry because the power is then a square root:
    * IEEE sqrt and division are correctly rounded, so the raw double
    * rates are bit-identical in both engines (any other alpha rides
    * on pow(), whose last ulp is libm-dependent — see the operator
    * scaladoc).
    */
  def q79(s: SparkSession, dir: String): DataFrame =
    // defaults ARE the registered contract: Mixer.whitespaceTokens is
    // the q63-oracle-pinned token unit (one definition, no drift) and
    // alpha = 0.5 the sqrt-exact pin
    graft.operators.Mixer.temperatureRates(Tables(s, dir).documents)

  val q79Sql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source)
      |SELECT source, tokens,
      |  sqrt(CAST(min(tokens) OVER () AS DOUBLE) / tokens) AS rate
      |FROM t ORDER BY source""".stripMargin

  /** q97: the [[graft.pipeline.StatsMaintain]] digest as ONE verified
    * query — count, exact decimal sum, min/max, HLL distinct estimate
    * and log2-histogram quantile bounds per group, computed through
    * the SAME partials/report code the incremental maintainer folds
    * forward (StatsMaintainSpec proves fold == one-shot, so verifying
    * the one-shot here oracle-verifies the maintained snapshot's
    * arithmetic too). Group = l_returnflag; distinct over l_suppkey
    * (hashed as a string, the q45 portable-register convention);
    * quantiles over floor(l_extendedprice) — integral doubles, so the
    * long cast is exact in both engines.
    *
    * Scale shape: everything is one partial-aggregated groupBy per
    * stat family on a 3-group key plus the histogram/register
    * assembly — fixed O(m) state per group, the 1000-executor fan-in
    * shape this file exists for.
    */
  def q97(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.StatsMaintain
    val spec = StatsMaintain.Spec(
      keys = Seq("flag"), sums = Seq("qty"), minMax = Seq("qty"),
      distincts = Seq("supp"), hists = Seq("pf"),
      // r13: the bottom-k sampled quantiles alongside the log2 bounds
      // — rk is the q46 unique row key, k the default 1024
      quants = Seq("pf"), quantKey = Some("rk"))
    val base = Tables(s, dir).lineitem.select(
      col("l_returnflag").as("flag"),
      col("l_quantity").as("qty"),
      col("l_suppkey").cast("string").as("supp"),
      floor(col("l_extendedprice")).cast("long").as("pf"),
      concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("rk"))
    StatsMaintain.report(StatsMaintain.partials(base, spec), spec)
      .select(col("flag"), col("n"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("min_qty").cast("long").as("min_qty"),
        col("max_qty").cast("long").as("max_qty"),
        col("nd_supp"), col("p50_pf"), col("p99_pf"),
        round4(col("p50s_pf")).as("p50s_pf4"),
        round4(col("p99s_pf")).as("p99s_pf4"))
      .orderBy(col("flag"))
  }

  val q97Sql: String = {
    // SketchQ already binds M/RhoMax/Scale to the same Hll values
    val num = s"(0.709 * 64 * 64 * $Scale)"
    s"""WITH b AS (
       |  SELECT l_returnflag AS flag, l_quantity AS qty,
       |    CAST(l_suppkey AS VARCHAR) AS supp,
       |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS pf
       |  FROM lineitem),
       |sc AS (
       |  SELECT flag, CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(qty AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       |    CAST(min(qty) AS BIGINT) AS min_qty,
       |    CAST(max(qty) AS BIGINT) AS max_qty
       |  FROM b GROUP BY flag),
       |h AS (
       |  SELECT flag, CAST(md5_number_lower(supp) & 63 AS INT) AS reg,
       |    md5_number_lower(supp) >> 6 AS w
       |  FROM b),
       |regs AS (
       |  SELECT flag, reg,
       |    MAX(CASE WHEN w = 0 THEN $RhoMax
       |             ELSE $RhoMax - length(bin(w)) END) AS mj
       |  FROM h GROUP BY flag, reg),
       |g AS (
       |  SELECT flag,
       |    SUM(CAST(CAST(1 AS BIGINT) << CAST($RhoMax - mj AS INT)
       |        AS DECIMAL(38,0))) AS sp,
       |    COUNT(*) AS nb
       |  FROM regs GROUP BY flag),
       |e AS (
       |  SELECT flag, $M - nb AS v,
       |    CAST(sp + CAST($M - nb AS DECIMAL(38,0)) *
       |      CAST($Scale AS DECIMAL(38,0)) AS DOUBLE) AS st
       |  FROM g),
       |nd AS (
       |  SELECT flag, CAST(FLOOR(CASE
       |    WHEN $num / st <= ${2.5 * M} AND v > 0
       |      THEN 64.0 * ln(64.0 / v)
       |    ELSE $num / st END + 0.5) AS BIGINT) AS nd_supp
       |  FROM e),
       |hb AS (
       |  SELECT flag,
       |    CASE WHEN pf <= 0 THEN 0 ELSE length(bin(pf)) END AS bin,
       |    count(*) AS c
       |  FROM b GROUP BY 1, 2),
       |cm AS (
       |  SELECT flag, bin, SUM(c) OVER (PARTITION BY flag ORDER BY bin) AS cum,
       |    SUM(c) OVER (PARTITION BY flag) AS tot
       |  FROM hb),
       |q50 AS (
       |  SELECT flag, CASE WHEN min(bin) <= 0 THEN 0
       |    ELSE (CAST(1 AS BIGINT) << CAST(min(bin) AS INT)) - 1 END AS p50_pf
       |  FROM cm WHERE cum >= (tot * 1 + 1) // 2 GROUP BY flag),
       |q99 AS (
       |  SELECT flag, CASE WHEN min(bin) <= 0 THEN 0
       |    ELSE (CAST(1 AS BIGINT) << CAST(min(bin) AS INT)) - 1 END AS p99_pf
       |  FROM cm WHERE cum >= (tot * 99 + 99) // 100 GROUP BY flag),
       |${sampledQuantCtes}
       |SELECT sc.flag, n, sum_qty, min_qty, max_qty, nd_supp, p50_pf, p99_pf,
       |  p50s_pf4, p99s_pf4
       |FROM sc JOIN nd USING (flag) JOIN q50 USING (flag) JOIN q99 USING (flag)
       |  LEFT JOIN sq USING (flag)
       |ORDER BY sc.flag""".stripMargin
  }

  /** The bottom-k sampled-quantile replay, closed form — the whole
    * point of the bottom-k design over a KLL (StatsMaintain scaladoc):
    * the maintained sample is EXACTLY "the k rows whose
    * md5_number_lower(row key) sorts first", one window clause in any
    * engine, and the interpolation mirrors
    * [[graft.pipeline.StatsMaintain.quantileFromSample]] operation for
    * operation (r = q·(ns−1), v⌊r⌋ + (v⌊r⌋₊₁ − v⌊r⌋)·(r − ⌊r⌋)) so the
    * IEEE arithmetic is identical before round4. The final select
    * joins `sq` with LEFT JOIN: a group whose quantile column is
    * all-NULL produces no sq row (smp drops NULL v) and must survive
    * with NULL sampled quantiles — matching quantileFromSample's
    * n==0 → NULL branch — not vanish from the digest.
    */
  private def sampledQuantCtes: String = {
    def interp(tag: String, q: String): String = {
      val e = s"""max(CASE WHEN i = CAST(FLOOR($q*(ns-1)) AS BIGINT) THEN v END)
         |  + (max(CASE WHEN i = LEAST(CAST(FLOOR($q*(ns-1)) AS BIGINT) + 1, ns-1) THEN v END)
         |     - max(CASE WHEN i = CAST(FLOOR($q*(ns-1)) AS BIGINT) THEN v END))
         |  * any_value($q*(ns-1) - FLOOR($q*(ns-1)))""".stripMargin
      s"${round4Sql(e)} AS p${tag}s_pf4"
    }
    s"""b2 AS (
       |  SELECT l_returnflag AS flag,
       |    CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS DOUBLE) AS v,
       |    md5_number_lower(concat_ws('-', l_orderkey, l_linenumber)) >> 1 AS h
       |  FROM lineitem),
       |smp AS (
       |  SELECT flag, v,
       |    row_number() OVER (PARTITION BY flag ORDER BY h, v) AS rn
       |  FROM b2 WHERE v IS NOT NULL),
       |sk AS (
       |  SELECT flag, v,
       |    row_number() OVER (PARTITION BY flag ORDER BY v) - 1 AS i,
       |    count(*) OVER (PARTITION BY flag) AS ns
       |  FROM smp WHERE rn <= 1024),
       |sq AS (
       |  SELECT flag,
       |  ${interp("50", "0.5")},
       |  ${interp("99", "0.99")}
       |  FROM sk GROUP BY flag)""".stripMargin
  }

  val entries: Seq[Entry] = Seq(
    Entry("q97_stats_digest", q97, Some(q97Sql)),
    Entry("q45_hll_distinct", q45, Some(q45Sql)),
    Entry("q46_sample_quantile", q46, Some(q46Sql)),
    Entry("q47_stratified_sample", q47, Some(q47Sql)),
    Entry("q48_shard_assign", q48, Some(q48Sql)),
    Entry("q49_freq_topk_cm", q49, Some(q49Sql)),
    Entry("q51_repetition", q51, Some(q51Sql)),
    Entry("q55_bottomk_sample", (s, d) => q55(s, d), Some(q55Sql)),
    Entry("q58_sequence_pack", (s, d) => q58(s, d), Some(q58Sql)),
    Entry("q63_mix_rates", q63, Some(q63Sql)),
    Entry("q79_mix_temperature", q79, Some(q79Sql)),
  )
}
