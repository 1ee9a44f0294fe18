package graft.queries

import graft.Tables
import graft.functions.TextOps.{normText, tokens}
import graft.functions.expressions.TextExprs.md5Lower64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-model text operators: the quality/shaping passes a training
  * pipeline runs AFTER dedup — statistical fluency scoring against the
  * corpus's own n-gram model (the CCNet design, Wenzek et al. 2019,
  * arXiv:1911.00359), context-window chunking, and cross-document
  * duplicated-n-gram contamination stats (the "duplicate text
  * fraction" signal of Gopher/Dolma-style quality suites, Rae et al.
  * 2021, arXiv:2112.11446).
  *
  * House rules apply ([[Q]]): integer/fixed-point arithmetic
  * end-to-end — BIGINT sums and integral `DIV` are exact and
  * summation-order-free in both engines, where a sum of float log
  * probabilities would be neither — and every shuffle keyed on the
  * portable 64-bit md5 family, never on raw token strings.
  */
object LmQ {

  /** Fixed-point scale: scores are nano-units (1e9 = probability 1). */
  private val Scale = 1000000000L

  /** q71's chunking geometry — ONE definition interpolated into both
    * the Scala defaults and the DuckDB mirror (the SemDedupThreshold
    * pattern), so the registered query and its oracle cannot drift.
    */
  val ChunkWidth: Int  = 32
  val ChunkStride: Int = 24

  /** NULL-total tokenizer: every kernel here coalesces text to ''
    * first, so a NULL-text doc behaves exactly like an empty-text doc
    * (arr = [""]) instead of being silently dropped by explode — the
    * q70 totality principle ("a filter decides on a visible value")
    * applied uniformly to q71/q72 as well.
    */
  private def toks(c: Column): Column = tokens(normText(coalesce(c, lit(""))))

  /** Shared oracle CTE: the canonical whitespace token array per doc
    * (the [[toks]] mirror — same coalesce-to-'' totality).
    */
  private val arrCte: String =
    s"""arr AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents)""".stripMargin

  /** q70: bigram-LM fluency score — how typical each document is of
    * the corpus it sits in, the filterable signal CCNet derives from a
    * reference LM. Self-scored here: the model IS the corpus's own
    * bigram table, so every scored bigram has a nonzero count and no
    * smoothing constant enters the arithmetic.
    *
    * Per bigram, p9 = c(ab)·10⁹ DIV c(a·), with c(a·) = occurrences
    * of `a` as a bigram PREFIX (so each prefix's probabilities sum to
    * ~1); a document's score is the integer mean of its bigram p9s.
    * The classic form is a mean of log probabilities, but ln() is
    * only ~1-ulp correct (engines' libms can disagree in the last
    * bit — the q57 rationale) and, worse, a float SUM of logs is
    * summation-order dependent. Integer DIV and BIGINT sums are exact
    * in both engines; the fixed-point mean ranks fluent text above
    * token soup exactly as the mean probability does. (The 10⁹ scale
    * bounds c(ab) < 2⁶³/10⁹ ≈ 9.2e9 before the multiply overflows —
    * ample for any single bigram below web-scale; a 100 TB run drops
    * Scale to 10⁶ or widens the multiply to DECIMAL(38,0), both still
    * exact.)
    *
    * Scale shape: bigram extraction is one codegen'd projection
    * (array transform — no window, no self-join); the model is two
    * hash aggregates keyed on md5Lower64 of the bigram / its prefix,
    * so shuffles carry 64-bit keys, never strings; scoring is two
    * equi-joins back to those Zipf-bounded (≪ corpus) tables plus one
    * per-doc aggregate. Everything is linear passes + vocabulary-
    * scale shuffles at 100 TB.
    */
  def q70(s: SparkSession, dir: String): DataFrame =
    lmScore(Tables(s, dir).documents)

  /** The q70 kernel over any `(doc_id, text)` frame. */
  def lmScore(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(col("doc_id"), toks(col("text")).as("arr"))
      .select(col("doc_id"), explode(expr(
        "transform(slice(arr, 1, size(arr) - 1), " +
          "(x, i) -> named_struct('a', x, 'b', arr[i + 1]))")).as("bg"))
      .select(col("doc_id"),
        md5Lower64(concat_ws("\u001f", col("bg.a"), col("bg.b"))).as("hab"),
        md5Lower64(col("bg.a")).as("ha"))
    val cab = bi.groupBy(col("hab")).agg(count(lit(1)).as("c_ab"))
    val ca = bi.groupBy(col("ha")).agg(count(lit(1)).as("c_a"))
    // widen the multiply to DECIMAL(38,0): a Long multiply would wrap
    // silently once one bigram's count passes 2^63/Scale ≈ 9.2e9 — a
    // hot boilerplate pair at 100 TB scale WILL get there. Decimal
    // arithmetic + IntegralDivide is still exact in both engines, and
    // p9 ≤ Scale (c_ab ≤ c_a by construction) so the BIGINT result
    // cast cannot itself overflow.
    val perDoc = bi.join(cab, "hab").join(ca, "ha")
      .select(col("doc_id"),
        expr(s"CAST(CAST(c_ab AS DECIMAL(38,0)) * ${Scale}L DIV c_a AS BIGINT)").as("p9"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p9")).as("sp"))
    // single-token docs have no bigrams: keep them (score 0) rather
    // than silently dropping — a filter decides on a visible value
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("sp DIV n_bigrams"), lit(0L)).as("lm_score9"))
      .orderBy(col("doc_id"))
  }

  val q70Sql: String =
    s"""WITH $arrCte,
       |bi AS (
       |  SELECT doc_id, bg.hab AS hab, bg.ha AS ha FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(a) - 1),
       |      i -> struct_pack(
       |        hab := md5_number_lower(a[i] || chr(31) || a[i + 1]),
       |        ha := md5_number_lower(a[i])))) AS bg
       |    FROM arr)),
       |cab AS (SELECT hab, COUNT(*) AS c_ab FROM bi GROUP BY hab),
       |ca AS (SELECT ha, COUNT(*) AS c_a FROM bi GROUP BY ha),
       |sc AS (
       |  SELECT doc_id,
       |    CAST(CAST(c_ab AS HUGEINT) * 1000000000 // c_a AS BIGINT) AS p9
       |  FROM bi JOIN cab USING (hab) JOIN ca USING (ha)),
       |pd AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(p9) AS BIGINT) AS sp
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
       |  CAST(coalesce(pd.sp // pd.n_bigrams, 0) AS BIGINT) AS lm_score9
       |FROM documents d LEFT JOIN pd USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** q71: fixed-window token chunking with overlap — the context-
    * window shaper that turns documents into trainer/RAG units of at
    * most `width` tokens, consecutive chunks sharing `width - stride`
    * tokens of context. A start is emitted iff it is the document's
    * first OR the previous chunk did not already reach the document's
    * end (start < n + stride - width + 1): every token is covered,
    * the tail chunk may be short, and no chunk is a suffix-contained
    * duplicate of its predecessor.
    *
    * Scale shape: one codegen'd projection per document
    * (sequence → filter → explode over the token array) — no join,
    * no aggregate, no window; the only exchange in the whole plan is
    * the presentation sort. Chunk identity (doc_id, chunk_id) is a
    * pure function of the text, so retries and re-runs are stable.
    */
  def q71(s: SparkSession, dir: String): DataFrame =
    chunk(Tables(s, dir).documents)

  /** The q71 kernel over any `(doc_id, text)` frame. */
  def chunk(docs: DataFrame,
            width: Int = ChunkWidth, stride: Int = ChunkStride): DataFrame = {
    require(stride >= 1 && width >= stride,
      s"need width >= stride >= 1, got width=$width stride=$stride")
    docs
      .select(col("doc_id"), toks(col("text")).as("arr"))
      .select(col("doc_id"), size(col("arr")).as("n"), col("arr"),
        explode(expr(
          s"filter(sequence(1, size(arr), $stride), " +
            s"st -> st = 1 OR st < size(arr) + ${stride - width + 1})"))
          .as("st"))
      .select(col("doc_id"),
        expr(s"CAST((st - 1) DIV $stride AS BIGINT)").as("chunk_id"),
        col("st").cast("bigint").as("start_tok"),
        least(lit(width.toLong), col("n") - col("st") + 1)
          .cast("bigint").as("n_tok"),
        expr(s"concat_ws(' ', slice(arr, st, $width))").as("chunk"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val q71Sql: String =
    s"""WITH $arrCte,
       |st AS (
       |  SELECT doc_id, a, len(a) AS n,
       |    unnest(list_filter(generate_series(1, len(a), $ChunkStride),
       |      st -> st = 1 OR st < len(a) + (${ChunkStride - ChunkWidth + 1}))) AS st
       |  FROM arr)
       |SELECT doc_id, CAST((st - 1) // $ChunkStride AS BIGINT) AS chunk_id,
       |  CAST(st AS BIGINT) AS start_tok,
       |  CAST(least($ChunkWidth, n - st + 1) AS BIGINT) AS n_tok,
       |  array_to_string(list_slice(a, st, st + ${ChunkWidth - 1}), ' ') AS chunk
       |FROM st ORDER BY doc_id, chunk_id""".stripMargin

  /** q72: cross-document duplicated-n-gram fraction — per document,
    * how much of its (overlapping, per-occurrence) word-5-gram mass
    * also appears in at least one OTHER document. This is the doc-
    * level contamination metric (Gopher's duplicate-text fractions;
    * Dolma's duplicate-paragraph signal) that complements q51 (WITHIN-
    * doc repetition) and q59 (which rewrites text): here nothing is
    * rewritten — each doc gets a filterable score.
    *
    * Scale shape: shingle extraction is one codegen'd projection; the
    * global table is a hash aggregate on the shingle's 64-bit
    * md5Lower64 (COUNT(DISTINCT doc_id) — a standard two-level
    * aggregate), and the scoring join carries (hash, doc_id) pairs
    * only. Never all-pairs, never strings on the wire; the dup table
    * is shingle-vocabulary-scale, ≪ corpus at 100 TB.
    */
  // r19 negative result (see q74's note in SubstrQ): the scoped
  // shingle cache + eager materialization benched q72 1.44 -> 2.65 s
  // with CPU UP (cache build cost exceeded the deduped kernel) — the
  // lazy form stays.
  def q72(s: SparkSession, dir: String): DataFrame =
    dupNgrams(Tables(s, dir).documents)

  /** (doc_id, h) — one row per overlapping word-n-gram occurrence;
    * the native window kernel (one flatten + range-digests per doc).
    * minOne mirrors the greatest(.., 1) whole-doc shingle for short
    * docs.
    */
  private def shingleHashes(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), toks(col("text")).as("arr"))
      .select(col("doc_id"),
        explode(graft.functions.expressions.TextExprs
          .windowMd5Hashes(col("arr"), n, minOne = true)).as("h"))

  /** The q72 kernel over any `(doc_id, text)` frame. */
  def dupNgrams(docs: DataFrame, n: Int = 5): DataFrame =
    dupNgramsFromShingles(shingleHashes(docs, n))

  private def dupNgramsFromShingles(sh: DataFrame): DataFrame = {
    val docsPer = sh.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("ndocs"))
    sh.join(docsPer, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        expr(s"n_dup * ${Scale}L DIV n_shingles").as("dup_frac9"))
      .orderBy(col("doc_id"))
  }

  val q72Sql: String =
    s"""WITH $arrCte,
       |sh AS (
       |  SELECT doc_id, md5_number_lower(sw) AS h FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      generate_series(1, greatest(len(a) - 4, 1)),
       |      i -> array_to_string(list_slice(a, i, i + 4), ' '))) AS sw
       |    FROM arr)),
       |dp AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM sh GROUP BY h),
       |pd AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |    CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |  FROM sh JOIN dp USING (h) GROUP BY doc_id)
       |SELECT doc_id, n_shingles, n_dup,
       |  CAST(n_dup * 1000000000 // n_shingles AS BIGINT) AS dup_frac9
       |FROM pd ORDER BY doc_id""".stripMargin

  /** q86: HELD-OUT trigram LM scoring with stupid backoff — the real
    * CCNet shape that q70 deliberately simplifies away. q70 self-scores
    * (model == scored corpus), so every scored n-gram exists and no
    * backoff path ever runs; here the model trains on a REFERENCE
    * partition (even doc_ids — the stand-in for "a Wikipedia-trained
    * KenLM") and scores EVERY doc, so odd docs genuinely hit unseen
    * trigrams and exercise the full backoff chain (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — stupid backoff is
    * THE web-scale scoring recipe precisely because it needs no
    * discounting pass):
    *
    *   S(w3|w1w2) = c3(w1w2w3)·10⁹ DIV c2(w1w2)            if c3 > 0
    *              = 0.4 · c2(w2w3)·10⁹ DIV c1(w2)          elif c2(w2w3) > 0
    *              = 0.4² · c1(w3)·10⁹ DIV ctot             elif c1(w3) > 0
    *              = 0                                       else
    *
    * in fixed-point: ·0.4 is ·4 DIV 10, every count product widened to
    * DECIMAL(38,0) (the q70 hot-n-gram overflow rule), so both engines
    * compute bit-identical BIGINT scores in any summation order.
    *
    * Scale shape: model building is three hash aggregates over the
    * reference partition keyed on md5Lower64 window hashes (the native
    * one-pass kernel), all Zipf-bounded ≪ corpus; scoring explodes one
    * per-position struct row and LEFT-joins the five model tables on
    * 64-bit keys (broadcast at vocabulary scale), then one per-doc
    * aggregate; the corpus total attaches as a ONE-ROW broadcast like
    * q57 (lazy — no driver action at plan time). Strings never cross a
    * shuffle.
    */
  def q86(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    trigramScore(docs, docs.filter(col("doc_id") % 2 === 0))
  }

  /** The q86 kernel: score `docs` against the trigram model of `ref`. */
  def trigramScore(docs: DataFrame, ref: DataFrame): DataFrame = {
    import graft.functions.expressions.TextExprs.{md5Lower64, windowMd5Hashes}
    def grams(d: DataFrame): DataFrame = d
      .select(col("doc_id"), toks(col("text")).as("arr"))
      .select(col("doc_id"),
        transform(col("arr"), w => md5Lower64(w)).as("h1"),
        windowMd5Hashes(col("arr"), 2).as("h2"),
        windowMd5Hashes(col("arr"), 3).as("h3"))
    // ONE tagged pass builds the whole model as a SINGLE table keyed on
    // the hash, with per-order conditional counts (sum-of-when over an
    // all-null set is NULL, so "this hash is not a trigram" stays a
    // visible NULL exactly as a separate trigram table would report
    // it) — and the table is CACHED. Plan-level sharing cannot do this
    // job: six consumers (five scoring joins + the unigram total) each
    // get a column-PRUNED copy of the aggregate (sum of only their
    // CASE arm), the subtrees stop being identical, and neither
    // ReuseExchange nor AQE stage reuse fires — every consumer
    // re-scans the reference partition (measured: six FileScans).
    // The cache is the ship-model-to-data pattern at the size where
    // literals stop working: the model is vocabulary-scale (Zipf ≪
    // corpus — the same size class production KenLM tables occupy),
    // materialized by ONE reference scan and served to all six
    // consumers from executor memory; Spark's CacheManager keys the
    // entry on the canonicalized plan, so repeated q86 invocations in
    // one session share it instead of stacking copies.
    val model = grams(ref)
      .select(explode(expr(
        "concat(" +
          "transform(h1, h -> named_struct('t', 1, 'h', h)), " +
          "transform(h2, h -> named_struct('t', 2, 'h', h)), " +
          "transform(h3, h -> named_struct('t', 3, 'h', h)))")).as("g"))
      .select(col("g.t").as("t"), col("g.h").as("h"))
      .groupBy(col("h")).agg(
        sum(when(col("t") === 1, 1L)).as("c1"),
        sum(when(col("t") === 2, 1L)).as("c2"),
        sum(when(col("t") === 3, 1L)).as("c3"))
      .cache()
    val tot = model.agg(sum(col("c1")).as("ctot"))
    // per scored position i (1-based, i ≤ n-2): trigram hash and the
    // four context/backoff hashes it needs, all read from the three
    // precomputed hash arrays — one explode, no string re-digesting
    val pos = grams(docs)
      .select(col("doc_id"),
        // transform-with-index over h3 (0-based): empty for docs with
        // <3 tokens (windowMd5Hashes returns [] below the window width)
        // — explode drops them here, the final left join restores them
        explode(expr(
          "transform(h3, (x, i) -> " +
            "named_struct('k3', x, 'k12', h2[i], 'k23', h2[i+1], " +
            "'kw2', h1[i+1], 'kw3', h1[i+2]))")).as("g"))
      .select(col("doc_id"), col("g.k3").as("k3"), col("g.k12").as("k12"),
        col("g.k23").as("k23"), col("g.kw2").as("kw2"), col("g.kw3").as("kw3"))
    val scored = pos
      .join(model.select(col("h").as("k3"), col("c3")), Seq("k3"), "left")
      .join(model.select(col("h").as("k12"), col("c2").as("c12")), Seq("k12"), "left")
      .join(model.select(col("h").as("k23"), col("c2").as("c23")), Seq("k23"), "left")
      .join(model.select(col("h").as("kw2"), col("c1").as("cw2")), Seq("kw2"), "left")
      .join(model.select(col("h").as("kw3"), col("c1").as("cw3")), Seq("kw3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), expr(
        s"""CASE
           |  WHEN c3 IS NOT NULL THEN
           |    CAST(CAST(c3 AS DECIMAL(38,0)) * ${Scale}L DIV c12 AS BIGINT)
           |  WHEN c23 IS NOT NULL THEN
           |    CAST(CAST(c23 AS DECIMAL(38,0)) * ${Scale}L * 4 DIV cw2 DIV 10 AS BIGINT)
           |  WHEN cw3 IS NOT NULL THEN
           |    CAST(CAST(cw3 AS DECIMAL(38,0)) * ${Scale}L * 16 DIV ctot DIV 100 AS BIGINT)
           |  ELSE 0L END""".stripMargin).as("s9"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("s9")).as("ss"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(expr("ss DIV n_trigrams"), lit(0L)).as("bo_score9"))
      .orderBy(col("doc_id"))
  }

  val q86Sql: String =
    s"""WITH $arrCte,
       |ra AS (SELECT doc_id, a FROM arr WHERE doc_id % 2 = 0),
       |uni AS (
       |  SELECT md5_number_lower(w) AS h, COUNT(*) AS c1 FROM (
       |    SELECT unnest(a) AS w FROM ra) GROUP BY 1),
       |big AS (
       |  SELECT md5_number_lower(g) AS h, COUNT(*) AS c2 FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(a) - 1),
       |      i -> a[i] || ' ' || a[i+1])) AS g FROM ra) GROUP BY 1),
       |tri AS (
       |  SELECT md5_number_lower(g) AS h, COUNT(*) AS c3 FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(a) - 2),
       |      i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS g FROM ra)
       |  GROUP BY 1),
       |tot AS (SELECT CAST(SUM(len(a)) AS BIGINT) AS ctot FROM ra),
       |pos AS (
       |  SELECT doc_id,
       |    md5_number_lower(a[i] || ' ' || a[i+1] || ' ' || a[i+2]) AS k3,
       |    md5_number_lower(a[i] || ' ' || a[i+1]) AS k12,
       |    md5_number_lower(a[i+1] || ' ' || a[i+2]) AS k23,
       |    md5_number_lower(a[i+1]) AS kw2,
       |    md5_number_lower(a[i+2]) AS kw3
       |  FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 2)) AS i
       |        FROM arr)),
       |sc AS (
       |  SELECT doc_id,
       |    CASE
       |      WHEN t.c3 IS NOT NULL THEN
       |        CAST(CAST(t.c3 AS HUGEINT) * $Scale // b12.c2 AS BIGINT)
       |      WHEN b23.c2 IS NOT NULL THEN
       |        CAST(CAST(b23.c2 AS HUGEINT) * $Scale * 4 // u2.c1 // 10 AS BIGINT)
       |      WHEN u3.c1 IS NOT NULL THEN
       |        CAST(CAST(u3.c1 AS HUGEINT) * $Scale * 16 // tot.ctot // 100 AS BIGINT)
       |      ELSE 0 END AS s9
       |  FROM pos
       |  LEFT JOIN tri t ON t.h = pos.k3
       |  LEFT JOIN big b12 ON b12.h = pos.k12
       |  LEFT JOIN big b23 ON b23.h = pos.k23
       |  LEFT JOIN uni u2 ON u2.h = pos.kw2
       |  LEFT JOIN uni u3 ON u3.h = pos.kw3
       |  CROSS JOIN tot),
       |pd AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       |    CAST(SUM(s9) AS BIGINT) AS ss
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(pd.n_trigrams, 0) AS n_trigrams,
       |  CAST(coalesce(pd.ss // pd.n_trigrams, 0) AS BIGINT) AS bo_score9
       |FROM documents d LEFT JOIN pd USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q70_lm_score", q70, Some(q70Sql)),
    Entry("q71_chunk", q71, Some(q71Sql)),
    Entry("q72_dup_ngrams", q72, Some(q72Sql)),
    Entry("q86_trigram_backoff", q86, Some(q86Sql)))
}
