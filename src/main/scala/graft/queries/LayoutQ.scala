package graft.queries

import graft.Tables
import graft.operators.ZOrder
import graft.functions.expressions.TextExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout and distribution-shape operators: the Z-order
  * clustering key a lakehouse writer computes for multi-column data
  * skipping (q93) and the character-concentration quality signal
  * (q94). House rules apply ([[Q]]): integer-exact arithmetic only,
  * BIGINT aggregates, fixed-point nano-unit fractions, so every
  * oracle is bit-exact.
  */
object LayoutQ {

  /** q93's bucket granularity: morton >> 14 — coarse cells of the
    * Z-curve (2^7 × 2^7 key rectangles). ONE definition interpolated
    * into both engines.
    */
  val ZBucketShift = 14

  // ---- q93: Z-order curve bucketing ----

  /** q93: Morton-key bucketing of lineitem on (l_partkey, l_suppkey)
    * — the write-time clustering computation behind `OPTIMIZE ZORDER
    * BY`, surfaced as a query: each row's interleaved-bit key, rolled
    * up to coarse curve cells with each cell's bounding box in both
    * dimensions. The per-cell (min, max) boxes ARE the file-skipping
    * statistics a reader would prune on — at 100 TB this exact
    * aggregation (keys → range boundaries → per-file stats) is what
    * the [[graft.operators.ZOrder.layout]] writer materializes.
    *
    * Scale shape: one codegen'd projection (pure shift/AND/OR — the
    * whole key derivation lives inside WholeStageCodegen) + one hash
    * aggregate on the cell id. No join; the shuffle carries
    * (bucket, partials) only.
    */
  def q93(s: SparkSession, dir: String): DataFrame = {
    val z = ZOrder.zkey(col("l_partkey"), col("l_suppkey"))
    Tables(s, dir).lineitem
      .select(shiftright(z, ZBucketShift).as("bucket"),
        col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("sp"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min("p").as("p_min"), max("p").as("p_max"),
        min("sp").as("s_min"), max("sp").as("s_max"))
      .orderBy("bucket")
  }

  val q93Sql: String = {
    val z = ZOrder.zkeySql("l_partkey", "l_suppkey")
    s"""SELECT ($z >> $ZBucketShift) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(l_partkey) AS BIGINT) AS p_min,
       |  CAST(max(l_partkey) AS BIGINT) AS p_max,
       |  CAST(min(l_suppkey) AS BIGINT) AS s_min,
       |  CAST(max(l_suppkey) AS BIGINT) AS s_max
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- q94: character-concentration quality signal ----

  /** q94: per-document character-concentration index — the
    * Simpson/Herfindahl index of the code-point distribution in
    * fixed-point nano-units, floor(10⁹ · Σ cnt(c)² / n²). The
    * logarithm-free face of character entropy: boilerplate runs,
    * stuck-key gibberish ("aaaa…") and low-alphabet noise score high;
    * natural prose scores ≈10⁹/(effective alphabet). Being a ratio of
    * exact integers it is engine-portable where Shannon entropy
    * (libm log) is not — the Q.scala exactness rule.
    *
    * Each doc gets a deterministic suffix by doc_id (the q90
    * injection device) so the ASCII corpus also exercises repeated-
    * char pathology and astral-plane code points (U+1F600 is a
    * surrogate PAIR in the JVM but ONE code point — pinning that the
    * kernel counts code points, not UTF-16 units, exactly as DuckDB's
    * per-character split does).
    *
    * Scale shape: ONE projection through the native O(n)
    * [[graft.functions.expressions.CharConcentration]] kernel — no
    * explode, no join, no aggregate; the naive chars→groupBy shape
    * would shuffle every character of a 100 TB corpus.
    */
  def q94(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val suffix = when(id % 4 === 0, concat(lit(" zzzz"), lit("😀😀")))
      .when(id % 4 === 1, lit(" aaaaaaaaaa"))
      .when(id % 4 === 2, lit(""))
      .otherwise(lit(" mixed case tail"))
    val dirty = concat(coalesce(col("text"), lit("")), suffix)
    Tables(s, dir).documents
      .select(id, dirty.as("dirty"))
      .select(id,
        length(col("dirty")).cast("bigint").as("n_cp"),
        TextExprs.charConc9(col("dirty")).as("conc9"))
      .orderBy(id)
  }

  val q94Sql: String =
    """WITH dirtied AS (
      |  SELECT doc_id, coalesce(text, '') ||
      |    (CASE doc_id % 4
      |      WHEN 0 THEN ' zzzz' || chr(128512) || chr(128512)
      |      WHEN 1 THEN ' aaaaaaaaaa'
      |      WHEN 2 THEN ''
      |      ELSE ' mixed case tail' END) AS dirty
      |  FROM documents),
      |chars AS (
      |  SELECT doc_id, unnest(string_split(dirty, '')) AS c FROM dirtied),
      |cnt AS (
      |  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k
      |  FROM chars WHERE c <> '' GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n, sum(k * k) AS ss
      |  FROM cnt GROUP BY 1)
      |SELECT d.doc_id, coalesce(a.n, 0) AS n_cp,
      |  CAST(coalesce(a.ss * 1000000000 // (a.n * a.n), 0) AS BIGINT) AS conc9
      |FROM dirtied d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q93_zorder", q93, Some(q93Sql)),
    Entry("q94_char_conc", q94, Some(q94Sql)))
}
