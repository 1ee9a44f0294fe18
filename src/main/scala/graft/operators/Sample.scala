package graft.operators

import graft.functions.expressions.TextExprs.md5Lower64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-rate sampling — the training-data mixing
  * primitive behind batch q47 and the streaming sampler: keep a row
  * iff the low 10 bits of its id's portable md5 hash fall under
  * floor(rate·1024). The decision is a pure function of the row id,
  * so it is identical across engines (the DuckDB oracle replays it),
  * retries, micro-batches, and cluster layouts — `rand()`-based
  * sampling is none of those. A STATELESS filter: it runs map-side
  * with no shuffle in batch, and needs no state store in streaming.
  *
  * Rates are quantized to 1/1024 steps; rates whose product with 1024
  * is integral (0.25, 0.75, 0.5, …) are represented exactly.
  */
object Sample {

  /** Keep-predicate for one row id at `rate` (a Column so the rate may
    * vary per row, e.g. a CASE over a class column).
    *
    * `domain` decorrelates STACKED gates on the same id: two gates
    * hashing the bare id would keep a row iff h < min(r1, r2) — one
    * coin flip, not two — so a pipeline chaining e.g. a language gate
    * and a source-mix gate must give the second a distinct domain
    * prefix ("" keeps the q47-oracle-pinned legacy hash).
    */
  def keep(id: Column, rate: Column, domain: String = ""): Column = {
    val key = if (domain.isEmpty) id.cast("string")
              else concat(lit(domain), id.cast("string"))
    md5Lower64(key).bitwiseAND(lit(1023L)) <
      floor(rate * 1024).cast("long")
  }

  /** Per-class stratified sample: class `classCol` is kept at
    * `rates(class)` (or `defaultRate`). Works identically on batch and
    * streaming DataFrames — the filter is stateless.
    */
  def stratified(df: DataFrame, idCol: String, classCol: String,
                 rates: Map[String, Double],
                 defaultRate: Double,
                 domain: String = ""): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (cls, r)) =>
      when(col(classCol) === cls, lit(r)).otherwise(acc)
    }
    df.filter(keep(col(idCol), rate, domain))
  }
}
