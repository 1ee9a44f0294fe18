package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve layout — the multi-column clustering pass a
  * 100 TB lakehouse runs at write time so that LATER scans can skip
  * files on more than one predicate column at once.
  *
  * A plain `orderBy(a)` layout gives perfect file-level min/max
  * pruning on `a` and none on `b`: every file spans b's full range.
  * Interleaving the bits of both keys (the Morton curve, Morton 1966;
  * the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`) and
  * range-partitioning on the interleaved key bounds BOTH columns per
  * file — each file covers a rectangle of the (a, b) plane with area
  * ~total/numFiles instead of a full-width stripe. Parquet stores
  * per-file column min/max, so a reader with a predicate on either
  * (or both) columns prunes most files before any IO.
  *
  * The bit-spread is the classic magic-mask doubling: 5 shift+mask
  * rounds spread a 32-bit value onto the even bit positions of a
  * 64-bit word. Everything is BIGINT shift/AND/OR — integer-exact and
  * implemented identically by Spark and DuckDB, so [[spreadSql]] can
  * interpolate the SAME masks into an oracle query (the
  * one-definition rule used throughout; see WebQ.BlockedDomains).
  *
  * Scale shape of [[layout]]: one `repartitionByRange` on the morton
  * key (a range exchange driven by a sampled boundary estimate — the
  * standard Spark total-order machinery) + an in-partition sort.
  * No driver collect, no second shuffle; the sort is per-file-sized.
  */
object ZOrder {

  /** (shift, mask) rounds spreading bits 0..31 onto even positions.
    * After round i, bit j of the input sits at position j << 1 within
    * groups of 2^(5-i) — the standard doubling masks:
    * 0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F,
    * 0x3333333333333333, 0x5555555555555555.
    */
  val SpreadRounds: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  private val Mask32 = 0xFFFFFFFFL

  /** Spread the low 32 bits of `v` onto the even bit positions of a
    * long. Pure shift/AND/OR over BIGINT — whole-stage-codegen'd.
    */
  def spread(v: Column): Column =
    SpreadRounds.foldLeft(v.cast("long").bitwiseAND(lit(Mask32))) {
      case (e, (sh, mask)) => (e.bitwiseOR(shiftleft(e, sh))).bitwiseAND(lit(mask))
    }

  /** The DuckDB mirror of [[spread]], interpolated from the SAME
    * rounds so the two engines cannot drift.
    */
  def spreadSql(v: String): String =
    SpreadRounds.foldLeft(s"(CAST($v AS BIGINT) & ${Mask32})") {
      case (e, (sh, mask)) => s"(($e | ($e << $sh)) & $mask)"
    }

  /** Admissible input domains, PER SIDE — the bound each column's
    * top bit maps to a sign-safe key position under:
    *  - column `a` (even positions): bit 31 spreads to position 62,
    *    below the sign bit — the full unsigned-32 domain [0, 2^32)
    *    is safe;
    *  - column `b` (odd positions): bit 31 spreads to position 62 and
    *    the subsequent `<< 1` pushes it onto the SIGN bit — the key
    *    goes negative and the range partitioner sorts those rows
    *    FIRST, the worst-case layout, produced silently. So `b`
    *    admits only [0, 2^31).
    * ONE definition interpolated into both engine faces (the
    * one-definition rule; see [[SpreadRounds]]).
    */
  val BoundA: Long = 1L << 32
  val BoundB: Long = 1L << 31

  /** Loud range guard: [[spread]] masks to the low 32 bits, so an
    * out-of-domain value does not error on its own — it silently
    * aliases onto another curve cell (a negative's sign extension is
    * masked away) or inverts the sort (b ≥ 2^31, see [[BoundB]]).
    * Misuse must degrade loudly: any out-of-range value raises
    * per-row instead of corrupting the clustering. Codegen'd branch —
    * one compare per row, free next to the spread rounds.
    */
  private def checked(c: Column, side: String, bound: Long): Column = {
    val v = c.cast("long")
    when(v >= 0 && v < lit(bound), v).otherwise(raise_error(concat(
      lit(s"zorder: $side value out of [0, $bound): "), v.cast("string"))))
  }

  /** The DuckDB mirror of [[checked]] — same bounds, same loud raise
    * (`error()`), so both engine faces agree on the whole domain
    * INCLUDING the rejection of values outside it. Shaped as a
    * BIGINT 0 (in-domain) that [[zkeySql]] ORs into the spread —
    * the OR is an identity, so the guard text appears and evaluates
    * ONCE per side (wrapping the spread INPUT instead would be
    * duplicated 2⁵ = 32 times by the doubling fold's interpolation).
    */
  private def guardSql(v: String, side: String, bound: Long): String =
    s"(CASE WHEN CAST($v AS BIGINT) BETWEEN 0 AND ${bound - 1} " +
      s"THEN CAST(0 AS BIGINT) ELSE CAST(error(" +
      s"'zorder: $side value out of [0, $bound): ' || CAST($v AS VARCHAR)" +
      s") AS BIGINT) END)"

  /** 64-bit Morton key of `a` ∈ [0, [[BoundA]]) and `b` ∈
    * [0, [[BoundB]]): a's bits on even positions, b's on odd.
    * Equal-magnitude keys interleave evenly; a much-wider column
    * simply contributes more high bits (its natural weight on the
    * curve). Out-of-range values raise (see [[checked]]) rather than
    * silently inverting the layout.
    */
  def zkey(a: Column, b: Column): Column =
    spread(checked(a, "a", BoundA))
      .bitwiseOR(shiftleft(spread(checked(b, "b", BoundB)), 1))

  /** DuckDB mirror of [[zkey]] — guard included, so the two faces
    * agree everywhere (same key in-domain, same raise out).
    */
  def zkeySql(a: String, b: String): String =
    s"((${guardSql(a, "a", BoundA)} | ${spreadSql(a)}) | " +
      s"((${guardSql(b, "b", BoundB)} | ${spreadSql(b)}) << 1))"

  /** Write-time layout: range-partition on the Morton key into
    * `numFiles` output partitions and sort within each, so per-file
    * (min, max) statistics bound BOTH key columns. The sort column is
    * dropped after the in-partition sort (dropping a projection does
    * not disturb row order).
    */
  def layout(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    // withColumn would silently REPLACE a caller column of this name
    // and the final drop would erase it from the output
    require(!df.columns.contains("_zkey"),
      "zorder layout: input already has a _zkey column; rename it first")
    df.withColumn("_zkey", zkey(a, b))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }
}
