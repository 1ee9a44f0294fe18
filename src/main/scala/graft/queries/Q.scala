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
  /** Exact-arithmetic money aggregate: cast each addend to decimal
    * BEFORE summing so the result is independent of partitioning /
    * summation order (float addition is not associative; decimal is
    * exact). Oracle side mirrors with CAST(x AS DECIMAL(18,2)).
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact discounted price: cast the RAW columns to decimal first,
    * then multiply in decimal. Casting the double product instead is
    * non-portable: Spark rounds the double's shortest decimal string,
    * DuckDB rounds its binary value — they disagree at half-boundaries.
    * Raw columns are 2-decimal-clean, so the per-column cast is exact.
    */
  def discPrice(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast("decimal(18,2)") - dec(discount))

}
