package graft.operators

import graft.functions.TextOps
import graft.functions.expressions.TextExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line/paragraph-level dedup — the C4/RefinedWeb-style boilerplate
  * removal pass: a LINE that occurs in `minDf`-or-more DISTINCT
  * documents is boilerplate (nav bars, cookie banners, license
  * headers), and every occurrence is dropped EXCEPT in the lowest
  * doc_id containing it (keep-lowest, the same deterministic rule as
  * the whole-document dedup family q30/q31/q53). Whole-document dedup
  * misses exactly this: boilerplate lines inside otherwise-unique
  * pages are the most common real-world contamination.
  *
  * Segmentation is the caller's: pass any `array<string>` column —
  * `split(col("text"), "\n")` for newline-structured corpora,
  * [[wordWindows]] for flat text. Within-doc repetition of a
  * below-threshold line is NOT touched (that's a repetition-quality
  * signal, q51's territory, not cross-doc boilerplate).
  *
  * Scale shape (all shuffles linear in the corpus): one hash-only
  * aggregation per distinct line (the exchange carries the 64-bit
  * portable line hash + doc_id, never line text), a join of the
  * segments against ONLY the boilerplate subset (df >= minDf — tiny
  * next to the corpus, AQE broadcasts it while it fits), and the
  * per-document reassembly groupBy. Line text crosses exactly the
  * exchanges reassembly forces it through; the frequency statistics
  * never carry it.
  */
object LineDedup {

  /** Flat-text segmentation: non-overlapping `width`-word windows
    * (the tail window keeps its remainder). For corpora without
    * newline structure a fixed window is the deterministic stand-in
    * for "line"; the window either side of a boilerplate span still
    * matches when the span is window-aligned, which is what the
    * synthetic corpus provides.
    */
  def wordWindows(text: Column, width: Int): Column = {
    val t = TextOps.tokens(text)
    // blank/whitespace-only text must yield ZERO segments: split of an
    // empty trimmed string returns [""], so a size(t) guard would let
    // one phantom empty line through — and minDf blank docs would then
    // "dedup" against each other on the empty string. The guard strips
    // ALL whitespace classes (trim() removes only ASCII spaces, so a
    // tab/newline-only doc would sneak past a trim-based check)
    when(length(regexp_replace(text, "\\s+", "")) > 0,
      transform(
        sequence(lit(0), ceil(size(t).cast("double") / width).cast("int") - 1),
        i => array_join(slice(t, i * width + 1, lit(width)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** (doc_id, seg_no, line, kept) — every segment with its verdict:
    * kept = the line is below the boilerplate threshold OR this doc is
    * its keeper. The shared first stage of [[dedupe]] (per-doc
    * reassembly) and span analyses (gaps-and-islands over `kept`).
    */
  def marked(docs: DataFrame, lines: Column, minDf: Int): DataFrame = {
    val seg = docs
      .select(col("doc_id"), posexplode(lines).as(Seq("seg_no", "line")))
      .withColumn("lh", TextExprs.md5Lower64(col("line")))
    // frequency statistics on the HASH only; the join side shrinks to
    // the boilerplate subset before any line text is involved
    val boiler = seg.groupBy(col("lh"))
      .agg(countDistinct(col("doc_id")).as("df"),
        min(col("doc_id")).as("keeper"))
      .filter(col("df") >= minDf)
      .select(col("lh"), col("keeper"))
    seg.join(boiler, Seq("lh"), "left")
      .withColumn("kept",
        col("keeper").isNull || col("keeper") === col("doc_id"))
      .select(col("doc_id"), col("seg_no"), col("line"), col("kept"))
  }

  /** Per-doc reassembly of any marked frame: (doc_id, n_lines,
    * n_kept, text_kept), ordered by doc_id — text_kept is the
    * surviving lines re-joined with single spaces in original order
    * ("" when every line was dropped).
    */
  private def reassemble(markedDf: DataFrame): DataFrame =
    markedDf
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("kept"), 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("seg_no"), col("line"))))),
            x => x.getField("line")),
          " ").as("text_kept"))
      .orderBy(col("doc_id"))

  /** Cross-document boilerplate dedup (see the object doc). */
  def dedupe(docs: DataFrame, lines: Column, minDf: Int): DataFrame =
    reassemble(marked(docs, lines, minDf))

  /** WITHIN-document repeated-line removal — the complement of
    * [[dedupe]]'s cross-doc pass (C4 also dedups spans inside a single
    * page): every repeat of a line AFTER its first occurrence in the
    * same doc is dropped; other docs are irrelevant. Same output
    * contract as [[dedupe]].
    *
    * Scale shape: no frequency table and no join at all — one window
    * over (doc_id, line-hash) marks repeats, then the per-doc
    * reassembly; both partition under doc_id-compatible keys so the
    * payload crosses two doc-keyed exchanges and nothing else.
    */
  def dedupeWithinDoc(docs: DataFrame, lines: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("lh")).orderBy(col("seg_no"))
    reassemble(docs
      .select(col("doc_id"), posexplode(lines).as(Seq("seg_no", "line")))
      .withColumn("lh", TextExprs.md5Lower64(col("line")))
      .withColumn("kept", row_number().over(w) === 1))
  }

  /** PARAGRAPH-unit boilerplate removal — [[dedupe]]'s line rule with a
    * run-length gate (the C4 behavior): a boilerplate-marked line is
    * actually dropped ONLY when it sits inside a maximal run of
    * `minRun`-or-more CONSECUTIVE marked lines. An isolated marked
    * line (a sentence that happens to appear on two pages) survives;
    * a multi-line cookie banner / license header (the thing that is
    * genuinely boilerplate as a UNIT) goes. `minRun = 1` degenerates
    * to [[dedupe]] exactly.
    *
    * Runs are found without a self-join: a running count of marked
    * lines per doc makes `seg_no - cum` constant exactly along a
    * consecutive marked run (the gaps-and-islands key, same as
    * [[droppedSpans]] but via a conditional cumulative sum so KEPT
    * rows stay in the frame for reassembly), and a second window over
    * (doc_id, island) counts only the marked rows in the island —
    * kept rows can share an island key, so the count must filter.
    *
    * Scale shape: rides [[marked]]'s exchanges, then two windows —
    * one doc-keyed (ordered cumulative sum), one (doc, island)-keyed —
    * and the doc-keyed reassembly. All keys are doc-prefixed, data
    * never expands, no joins past the marked stage.
    */
  def dedupeSpans(docs: DataFrame, lines: Column,
      minDf: Int, minRun: Int): DataFrame = {
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("seg_no"))
    val wIsland = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("grp"))
    val markedOne = when(col("kept"), 0L).otherwise(1L)
    reassemble(marked(docs, lines, minDf)
      .withColumn("grp", col("seg_no") - sum(markedOne).over(wCum))
      .withColumn("run_len", sum(markedOne).over(wIsland))
      .withColumn("kept", col("kept") || col("run_len") < minRun)
      .select(col("doc_id"), col("seg_no"), col("line"), col("kept")))
  }

  /** Per-doc dropped-SPAN statistics — the paragraph-level view of
    * boilerplate: maximal runs of consecutive dropped lines counted
    * as ONE unit each (a 5-line cookie banner is one span, not five
    * incidents). Classic gaps-and-islands: within a doc's dropped
    * lines, `seg_no - row_number()` is constant exactly along a
    * consecutive run, so grouping by it isolates the spans. Output:
    * (doc_id, n_spans, longest_span, n_dropped) for docs that dropped
    * at least one line, ordered by doc_id.
    *
    * Scale shape: rides [[marked]]'s exchanges; the islands window
    * and both aggregations all partition by doc_id, so past the
    * filter there is ONE doc-keyed exchange.
    */
  def droppedSpans(docs: DataFrame, lines: Column, minDf: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("seg_no"))
    marked(docs, lines, minDf)
      .filter(!col("kept"))
      .withColumn("grp", col("seg_no") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("span_len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        max(col("span_len")).as("longest_span"),
        sum(col("span_len")).as("n_dropped"))
      .orderBy(col("doc_id"))
  }
}
