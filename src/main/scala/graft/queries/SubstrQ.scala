package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Exact substring dedup as an inventory entry — the
  * [[graft.operators.SubstrDedup]] operator over the documents table,
  * with its DuckDB oracle. See the operator scaladoc for the method
  * (Lee et al. 2021 window-anchored verbatim-run localization) and
  * the 100 TB shape.
  */
object SubstrQ {

  /** Anchor window in tokens — ONE definition interpolated into both
    * the Scala path and the SQL mirror (the SemDedupThreshold
    * pattern), so the registered query and its oracle cannot drift.
    * 16 tokens ≈ two q59 line-windows: long enough that a shared run
    * is a real quote, short enough that the sf-corpus boilerplate
    * runs (2+ consecutive 8-word windows) are caught.
    */
  val SubstrWindow: Int = 16

  /** q74: verbatim duplicated-run spans ≥ [[SubstrWindow]] tokens
    * shared across documents, keep-lowest-doc.
    */
  // r19 negative result, measured and kept OUT: caching the shared
  // (doc_id, p, h) anchor frame (kernel-once instead of once per
  // consumer subtree) + eager scoped materialization was implemented
  // for q74/q78/q95/q72 and full-bench A/B'd — per-query CPU fell
  // (q74 2.25 -> 1.56 s) but WALL rose (q74 1.97 -> 2.26, q72 1.44 ->
  // 2.65) and the per-rep cache churn pushed bench gc_total 1.4 ->
  // 11.9 s, regressing a dozen NEIGHBOR queries (q53 +1.25, q61 +0.70,
  // q57 +0.57). The lazy uncached form stays; see OPTIMIZATION_r19.md.
  def q74(s: SparkSession, dir: String): DataFrame =
    graft.operators.SubstrDedup.spans(Tables(s, dir).documents, SubstrWindow)

  val q74Sql: String = {
    val w = SubstrWindow
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, a,
       |    unnest(generate_series(1, len(a) - ${w - 1})) AS p
       |  FROM toks WHERE len(a) >= $w),
       |ph AS (
       |  SELECT doc_id, p,
       |    md5_number_lower(array_to_string(list_slice(a, p, p + ${w - 1}), ' ')) AS h
       |  FROM pos),
       |dup AS (
       |  SELECT h, min(doc_id) AS keeper
       |  FROM ph GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |mk AS (
       |  SELECT ph.doc_id, ph.p
       |  FROM ph JOIN dup USING (h) WHERE ph.doc_id <> dup.keeper),
       |isl AS (
       |  SELECT doc_id, p,
       |    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |  FROM mk)
       |SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
       |  CAST(max(p) + ${w - 1} AS BIGINT) AS span_end,
       |  CAST(max(p) + $w - min(p) AS BIGINT) AS n_tok
       |FROM isl GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin
  }

  /** q75: the REMOVAL form — duplicated runs stripped from the text,
    * q59's output shape. What the published pass actually ships.
    */
  // q75 stays LAZY (r19 note): its strip output is a left join that
  // preserves docs cardinality, so a count-shaped consumer lets the
  // optimizer eliminate the whole span subtree — an eager checkpoint
  // (tried r19) forces full materialization and benched 10x slower.
  def q75(s: SparkSession, dir: String): DataFrame =
    graft.operators.SubstrDedup.strip(Tables(s, dir).documents, SubstrWindow)

  val q75Sql: String = {
    val w = SubstrWindow
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, a,
       |    unnest(generate_series(1, len(a) - ${w - 1})) AS p
       |  FROM toks WHERE len(a) >= $w),
       |ph AS (
       |  SELECT doc_id, p,
       |    md5_number_lower(array_to_string(list_slice(a, p, p + ${w - 1}), ' ')) AS h
       |  FROM pos),
       |dup AS (
       |  SELECT h, min(doc_id) AS keeper
       |  FROM ph GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |mk AS (
       |  SELECT ph.doc_id, ph.p
       |  FROM ph JOIN dup USING (h) WHERE ph.doc_id <> dup.keeper),
       |isl AS (
       |  SELECT doc_id, p,
       |    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |  FROM mk),
       |sp AS (
       |  SELECT doc_id, min(p) AS s, max(p) + ${w - 1} AS e
       |  FROM isl GROUP BY doc_id, grp),
       |tok AS (
       |  SELECT doc_id, unnest(a) AS t,
       |    unnest(generate_series(1, len(a))) AS i
       |  FROM toks),
       |k AS (
       |  SELECT doc_id, i, t FROM tok
       |  WHERE NOT EXISTS (SELECT 1 FROM sp
       |    WHERE sp.doc_id = tok.doc_id AND tok.i BETWEEN sp.s AND sp.e)),
       |kk AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    string_agg(t, ' ' ORDER BY i) AS text_kept
       |  FROM k GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.a) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(kk.n_kept, 0) AS BIGINT) AS n_kept,
       |  coalesce(kk.text_kept, '') AS text_kept
       |FROM toks t LEFT JOIN kk USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** The q74/q75 exact span-localization chain over an arbitrary
    * source relation (doc_id, text), every CTE name prefixed `p` —
    * the q152 composed-pipeline oracle replays the SAME kernel over
    * its deduped CTE without name collisions. Ends in `${"${p}"}sp`
    * (doc_id, s, e): one row per maximal duplicated island, exactly
    * the `sp` CTE of [[q75Sql]].
    */
  private[queries] def spanCteFrom(src: String, w: Int,
                                   p: String = ""): String =
    s"""${p}toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM $src),
       |${p}pos AS (
       |  SELECT doc_id, a,
       |    unnest(generate_series(1, len(a) - ${w - 1})) AS p
       |  FROM ${p}toks WHERE len(a) >= $w),
       |${p}ph AS (
       |  SELECT doc_id, p,
       |    md5_number_lower(array_to_string(list_slice(a, p, p + ${w - 1}), ' ')) AS h
       |  FROM ${p}pos),
       |${p}dup AS (
       |  SELECT h, min(doc_id) AS keeper
       |  FROM ${p}ph GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |${p}mk AS (
       |  SELECT ${p}ph.doc_id, ${p}ph.p
       |  FROM ${p}ph JOIN ${p}dup USING (h) WHERE ${p}ph.doc_id <> ${p}dup.keeper),
       |${p}isl AS (
       |  SELECT doc_id, p,
       |    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |  FROM ${p}mk),
       |${p}sp AS (
       |  SELECT doc_id, min(p) AS s, max(p) + ${w - 1} AS e
       |  FROM ${p}isl GROUP BY doc_id, grp)""".stripMargin

  /** q78's winnow window (hash positions per selection window) — ONE
    * definition interpolated into both sides. Detection threshold is
    * [[SubstrWindow]] + WinnowWindow − 1 = 23 tokens: any verbatim
    * run at least that long is caught with certainty from ~2/(W+1)
    * of the anchor volume; runs in [16, 23) may be missed — the
    * documented trade against the exact q74 pass.
    */
  val WinnowWindow: Int = 8

  /** q78: winnow-sampled duplicated-run spans — the scale path of
    * q74 ([[graft.operators.SubstrDedup.winnowedSpans]]): round-1
    * shuffle volume drops to ~2/(W+1) of the exact pass (the
    * Schleimer et al. 2003 fingerprint guarantee keeps every run
    * ≥ 23 tokens detected), at the price of missing sub-threshold
    * runs and localizing conservatively (anchor-window unions, not
    * maximal islands).
    */
  def q78(s: SparkSession, dir: String): DataFrame =
    graft.operators.SubstrDedup.winnowedSpans(
      Tables(s, dir).documents, SubstrWindow, WinnowWindow)

  /** DuckDB mirror of q78: same per-position w-gram hashes as the
    * q74 oracle, the same unsigned `>> 1` comparison key (the q48
    * convention), the same rightmost-min-per-window selection played
    * as list lambdas, and the same interval-union span merge.
    */
  val q78Sql: String = {
    val w = SubstrWindow
    val ww = WinnowWindow
    val win = s"list_slice(hw, s, s + least($ww, len(hw)) - 1)"
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents),
       |hsrc AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, len(a) - ${w - 1}),
       |      p -> md5_number_lower(array_to_string(list_slice(a, p, p + ${w - 1}), ' '))) AS hs
       |  FROM toks WHERE len(a) >= $w),
       |hw2 AS (
       |  SELECT doc_id, hs, list_transform(hs, h -> h >> 1) AS hw FROM hsrc),
       |sel AS (
       |  SELECT doc_id, hs,
       |    unnest(list_distinct(list_transform(
       |      generate_series(1, greatest(len(hw) - ${ww - 1}, 1)),
       |      s -> CAST(s - 1 + least($ww, len(hw)) + 1
       |           - list_position(list_reverse($win), list_min($win)) AS BIGINT)))) AS p
       |  FROM hw2),
       |anch AS (SELECT doc_id, p, hs[p] AS h FROM sel),
       |dup AS (
       |  SELECT h, min(doc_id) AS keeper
       |  FROM anch GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |mk AS (
       |  SELECT anch.doc_id, anch.p
       |  FROM anch JOIN dup USING (h) WHERE anch.doc_id <> dup.keeper),
       |fl AS (
       |  SELECT doc_id, p,
       |    CASE WHEN max(p + ${w - 1}) OVER (PARTITION BY doc_id ORDER BY p
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |         OR p > max(p + ${w - 1}) OVER (PARTITION BY doc_id ORDER BY p
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
       |      THEN 1 ELSE 0 END AS new_span
       |  FROM mk),
       |g AS (
       |  SELECT doc_id, p, SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM fl)
       |SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
       |  CAST(max(p) + ${w - 1} AS BIGINT) AS span_end,
       |  CAST(count(*) AS BIGINT) AS n_anchors
       |FROM g GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin
  }

  /** q95: detect-then-localize substring dedup
    * ([[graft.operators.SubstrDedup.refinedSpans]]) — q78's winnowed
    * fingerprint pass finds the duplicate-involved cohort at sampled
    * cost, then q74's exact pass runs over ONLY that cohort, so the
    * output carries q74's exact maximal-island boundaries (not q78's
    * anchor-window unions) while the full-resolution volume is the
    * cohort's share of the corpus, not all of it. Same q74 output
    * shape; boundaries/keepers computed within the cohort (see the
    * operator scaladoc for the sub-threshold caveat).
    */
  def q95(s: SparkSession, dir: String): DataFrame =
    graft.operators.SubstrDedup.refinedSpans(
      Tables(s, dir).documents, SubstrWindow, WinnowWindow)

  /** DuckDB mirror of q95: q78's detection CTEs (through `dup`)
    * shrink to the involved-doc cohort, then q74's exact chain runs
    * with its position source restricted to that cohort.
    */
  val q95Sql: String = {
    val w = SubstrWindow
    val ww = WinnowWindow
    val win = s"list_slice(hw, s, s + least($ww, len(hw)) - 1)"
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    trim(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))), '\\s+') AS a
       |  FROM documents),
       |hsrc AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, len(a) - ${w - 1}),
       |      p -> md5_number_lower(array_to_string(list_slice(a, p, p + ${w - 1}), ' '))) AS hs
       |  FROM toks WHERE len(a) >= $w),
       |hw2 AS (
       |  SELECT doc_id, hs, list_transform(hs, h -> h >> 1) AS hw FROM hsrc),
       |sel AS (
       |  SELECT doc_id, hs,
       |    unnest(list_distinct(list_transform(
       |      generate_series(1, greatest(len(hw) - ${ww - 1}, 1)),
       |      s -> CAST(s - 1 + least($ww, len(hw)) + 1
       |           - list_position(list_reverse($win), list_min($win)) AS BIGINT)))) AS p
       |  FROM hw2),
       |anch AS (SELECT doc_id, p, hs[p] AS h FROM sel),
       |dupf AS (
       |  SELECT h FROM anch GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |inv AS (
       |  SELECT DISTINCT anch.doc_id FROM anch JOIN dupf USING (h)),
       |pos AS (
       |  SELECT doc_id, a,
       |    unnest(generate_series(1, len(a) - ${w - 1})) AS p
       |  FROM toks
       |  WHERE len(a) >= $w AND doc_id IN (SELECT doc_id FROM inv)),
       |ph AS (
       |  SELECT doc_id, p,
       |    md5_number_lower(array_to_string(list_slice(a, p, p + ${w - 1}), ' ')) AS h
       |  FROM pos),
       |dup AS (
       |  SELECT h, min(doc_id) AS keeper
       |  FROM ph GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |mk AS (
       |  SELECT ph.doc_id, ph.p
       |  FROM ph JOIN dup USING (h) WHERE ph.doc_id <> dup.keeper),
       |isl AS (
       |  SELECT doc_id, p,
       |    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |  FROM mk)
       |SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
       |  CAST(max(p) + ${w - 1} AS BIGINT) AS span_end,
       |  CAST(max(p) + $w - min(p) AS BIGINT) AS n_tok
       |FROM isl GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin
  }

  val entries: Seq[Entry] = Seq(
    Entry("q74_substr_spans", q74, Some(q74Sql)),
    Entry("q75_substr_strip", q75, Some(q75Sql)),
    Entry("q78_substr_winnow", q78, Some(q78Sql)),
    Entry("q95_substr_refine", q95, Some(q95Sql)))
}
