package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One inventory row from SURVEY.md §2: a named Spark query plus, when
  * the semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle.
  */
final case class Entry(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Output-type convention for every verified query: aggregate
    * INTERNALLY in exact decimal (partition-order independent), but
    * emit the FINAL column as double. The harness compares the string
    * form of each cell, and a decimal's scale-preserving rendering
    * ("137431.00") never equals a float's shortest form ("137431.0").
    * Decimal→double is correctly rounded in both engines, so casting
    * the same exact decimal yields bit-identical doubles — the cast
    * must wrap the SUM, never the addends. Likewise no query may emit
    * an array column (the harness sorts rows on all columns; arrays
    * are unhashable there) — arrays are rendered via concat_ws — and
    * integer aggregates must be BIGINT on both sides (DuckDB's
    * SUM(int) is a HUGEINT, which pandas renders as a float).
    */

  /** Exact-arithmetic money aggregate: cast each addend to decimal
    * BEFORE summing so the result is independent of partitioning /
    * summation order (float addition is not associative; decimal is
    * exact). Oracle side mirrors with CAST(x AS DECIMAL(18,2)).
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** The documents table floored to the session's parallelism
    * ([[graft.util.Spread.byKey]], r18): the sf fixture is one
    * parquet row group = ONE scan task, so every text kernel below it
    * ran on one core. Used by the kernel-heavy query entries only;
    * results are unchanged because every aggregate in those queries
    * is exact (hash / integer / decimal — the standing convention
    * above) and thus partition-order independent. At production scale
    * the guard makes this a no-op, so the "no text on exchanges" scale
    * rule (PlanShapeSpec q74/q75) still holds where it matters.
    */
  def wideDocs(s: SparkSession, dir: String): DataFrame =
    graft.util.Spread.neutral(
      graft.Tables(s, dir).documents, col("doc_id"))

  /** Portable 4-decimal presentation rounding: floor(x·10⁴ + 0.5)/10⁴
    * in BOTH engines. Builtin ROUND(x, 4) is NOT portable: Spark
    * rounds the double's shortest decimal string (BigDecimal HALF_UP)
    * while DuckDB rounds the scaled binary value — for a rational
    * like 81/160 (= "0.50625", binary ≈ 0.50624999…) they disagree.
    * floor over identical doubles is deterministic in both.
    */
  def round4(c: Column): Column = floor(c * 10000 + 0.5) / 10000

  /** The DuckDB mirror of [[round4]] — wrap an expression string. */
  def round4Sql(e: String): String = s"FLOOR(($e) * 10000 + 0.5) / 10000"

  /** Exact discounted price: cast the RAW columns to decimal first,
    * then multiply in decimal. Casting the double product instead is
    * non-portable: Spark rounds the double's shortest decimal string,
    * DuckDB rounds its binary value — they disagree at half-boundaries.
    * Raw columns are 2-decimal-clean, so the per-column cast is exact.
    */
  def discPrice(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast("decimal(18,2)") - dec(discount))

  /** The RTBF faces' shared victim predicate (doc_id ≡ 0 mod this —
    * hits labeled docs, singletons and component minima): ONE
    * definition so q122 (near-dup index forget) and q123 (search
    * index delete+compact) provably exercise the same victim set.
    */
  val ForgetMod = 37

}
