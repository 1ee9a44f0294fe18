package graft.operators

import graft.functions.expressions.TextExprs.md5Lower64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE definition of graft's portable HyperLogLog (Flajolet et
  * al. 2007) building blocks, shared by the oracle-verified batch q45
  * and the streaming windowed mirror — the register derivation and the
  * estimator must never drift between the two.
  *
  * m=64 registers (p=6 index bits) from the portable md5 hash: DuckDB
  * recomputes every register and the estimate bit-for-bit (the 2^-M_j
  * sum is accumulated as the exact integer Σ2^(59-M_j) in
  * decimal(38,0) and converted to double ONCE — partition-order
  * independent and engine-identical). Registers max-merge: the sketch
  * is associative, so partial aggregation ships at most m rows per
  * group per task whatever the corpus size.
  */
object Hll {

  val M = 64                  // registers (p = 6 index bits)
  private val WBits = 58      // 64 - 6 remaining hash bits
  val RhoMax: Int = WBits + 1
  /** 2^RhoMax, the per-register scale of the 2^-M_j sum: the largest
    * register value is RhoMax (an all-zero remainder), whose scaled
    * term must stay the positive integer 1 — scaling by 2^WBits would
    * shift by -1 (Long.MIN_VALUE in Spark, an error in DuckDB).
    */
  val Scale: Long = 1L << RhoMax
  /** alpha_64·m²·2^RhoMax — every factor a power of two except the
    * alpha literal, so the product is EXACT in IEEE double and
    * identical to DuckDB folding the same expression.
    */
  val Num: Double = 0.709 * 64.0 * 64.0 * Scale.toDouble

  /** Register index of a value: low 6 bits of its portable hash. */
  def reg(value: Column): Column =
    md5Lower64(value).bitwiseAND(lit(63L)).cast("int")

  /** Register value rho: leading-zero count of the remaining 58 hash
    * bits + 1 (max RhoMax for an all-zero remainder).
    */
  def rho(value: Column): Column = {
    val w = call_function("shiftrightunsigned", md5Lower64(value), lit(6))
    when(w === 0, lit(RhoMax))
      .otherwise(lit(RhoMax) - length(bin(w))).cast("int")
  }

  /** Finalize a register table (groupCols ++ [mj = max rho per
    * register]) into the HLL estimate per group. Input needs one row
    * per OCCUPIED register; absent registers contribute 2^0 = 1 to the
    * 2^-M sum via the (m - nb) correction term. The linear-counting
    * fallback below 2.5m divides through ln() — the one step whose
    * last ulp is not pinned across engines; oracle-checked data must
    * keep clear of it (SketchSpec asserts this for the verified SFs).
    */
  def estimate(registers: DataFrame, groupCols: Seq[String],
               mjCol: String = "mj"): DataFrame = {
    val g = registers.groupBy(groupCols.map(col): _*).agg(
      sum(call_function("shiftleft", lit(1L),
        (lit(RhoMax) - col(mjCol)).cast("int"))
        .cast("decimal(38,0)")).as("sp"),
      count(lit(1)).as("nb"))
    val v = lit(M.toLong) - col("nb")
    val sTot = (col("sp") + v.cast("decimal(38,0)") *
      lit(Scale).cast("decimal(38,0)")).cast("double")
    val eRaw = lit(Num) / sTot
    val est = when(eRaw <= lit(2.5 * M) && v > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / v.cast("double")))
      .otherwise(eRaw)
    g.select(groupCols.map(col) :+
      floor(est + 0.5).cast("long").as("est_nd"): _*)
  }
}
