package graft.operators

import graft.functions.TextOps.tokens
import graft.functions.expressions.TextExprs.md5Lower64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-weighted selection — per-row keep probability proportional
  * to an exact fixed-point quality score (the DCLM/FineWeb-class
  * quality-scored sampling that replaces hard threshold cliffs:
  * borderline docs survive at reduced rate). ONE definition serving
  * q77's cluster-pick argmax, q117's audit face and the
  * CorpusPrep/Streams pipeline gate; [[Quality9Sql]] is the DuckDB
  * rendering (the one-definition rule).
  *
  * The decision is a pure stateless function of (doc_id, text): no
  * shuffle, no state, identical across engines, retries, micro-batches
  * and cluster layouts — it composes map-side into the batch job and
  * runs unchanged on a stream.
  */
object QualityWeight {

  /** Stopwords of the blend's fluency arm. */
  val Stops: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Attach the blend as `quality9` (exact nano-units ∈ [0, 10⁹]:
    * least(n_words,100)·5·10⁶ + n_stop·5·10⁸ DIV n_words), preserving
    * the input columns.
    */
  def withQuality9(docs: DataFrame): DataFrame = {
    // withColumn REPLACES an existing column of the same name, so a
    // user frame already carrying a quality9 (say, an upstream model
    // score) would be silently destroyed — and the gate's .drop would
    // then remove the user's column entirely. Refuse loudly; the
    // caller renames theirs (or applies the gate before attaching it).
    val clash = docs.columns
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      .intersect(Set("quality9", "_q_nw", "_q_ns"))
    require(clash.isEmpty,
      s"QualityWeight: input frame already carries ${clash.mkString(", ")} " +
        "— rename the conflicting column(s); the blend computes its own")
    val toks = tokens(coalesce(col("text"), lit("")))
    docs
      .withColumn("_q_nw", size(toks).cast("long"))
      .withColumn("_q_ns",
        size(filter(toks, w => w.isin(Stops: _*))).cast("long"))
      .withColumn("quality9",
        least(col("_q_nw"), lit(100L)) * 5000000L +
          expr("_q_ns * 500000000L DIV greatest(_q_nw, 1L)"))
      .drop("_q_nw", "_q_ns")
  }

  /** The weighted-sampling draw: 30 low bits of the domain-separated
    * portable md5. The "wq:" domain decorrelates this gate from the
    * sampling ("" / "mix:") and shard ("shard:") hashes — the
    * Sample.keep stacking rule: gates sharing a hash are one coin
    * flip, not two.
    */
  def draw30(id: Column): Column =
    md5Lower64(concat(lit("wq:"), id.cast("string")))
      .bitwiseAND(lit((1L << 30) - 1))

  /** Keep-predicate: draw·10⁹ < quality9·2³⁰ — an exact BIGINT
    * cross-multiply (draw < 2³⁰ and quality9 ≤ 10⁹, so both products
    * stay under 2⁶³), no division, no float, engine-identical.
    */
  def keeps(draw: Column, quality9: Column): Column =
    draw * 1000000000L < quality9 * 1073741824L

  /** The pipeline stage: docs kept with probability quality9/10⁹,
    * schema unchanged. Stateless — the CorpusPrep stage and its
    * streaming mirror are this same call.
    */
  def gate(docs: DataFrame): DataFrame =
    withQuality9(docs)
      .filter(keeps(draw30(col("doc_id")), col("quality9")))
      .drop("quality9")

  /** DuckDB rendering of [[withQuality9]]'s blend (a scalar over the
    * `text` column, stops interpolated from the same list).
    */
  val Quality9Sql: String = {
    val stops = Stops.map(w => s"'$w'").mkString(",")
    s"""CAST(LEAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')), 100) * 5000000
       |      + len(list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
       |          w -> list_contains([$stops], w))) * 500000000
       |        // GREATEST(len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')), 1)
       |      AS BIGINT)""".stripMargin
  }
}
