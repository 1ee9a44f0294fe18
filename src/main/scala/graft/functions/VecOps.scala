package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * All math is promoted to double FIRST (float→double is exact) and
  * accumulated left-to-right, so results are bit-identical to any
  * engine that does the same — this is what makes the DuckDB oracle
  * comparison exact rather than epsilon-based.
  */
object VecOps {

  /** Promote array<float> to array<double>. */
  def toDoubles(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product, sequential left-to-right accumulation in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Deterministic pseudo-random hyperplane component w(bit, i):
    * uniform in [-1, 1] derived from md5("bit_i") — reproducible
    * across runs/executors with no RNG state to ship, and
    * engine-portable (DuckDB rebuilds the identical plane matrix for
    * the q35/q36 oracles). The weight depends only on (bit, i), so
    * executors can precompute the whole matrix once (the native
    * RhpSignature does).
    */
  def planeWeight(bit: Column, i: Column): Column =
    (conv(substring(md5(concat(bit.cast("string"), lit("_"),
      i.cast("string")).cast("binary")), 1, 15), 16, 10).cast("long")
      % 2001 - 1000).cast("double") / 1000.0

  /** Random-hyperplane (SRP) LSH signature: `nBits` sign bits of
    * v·w(bit) packed into a long (Charikar '02). Cosine-similar
    * vectors agree on most bits.
    */
  def rhpSignature(v: Column, nBits: Int, dim: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nBits - 1)), bit => {
        val d = aggregate(
          zip_with(v, sequence(lit(0), lit(dim - 1)),
            (x, i) => x * planeWeight(bit, i)),
          lit(0.0), (acc, t) => acc + t)
        when(d > 0, call_function("shiftleft", lit(1L), bit))
          .otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Band keys over a packed signature: `nBands` contiguous bit
    * groups of `width` bits each — vectors sharing any band value are
    * ANN candidates.
    */
  def sigBands(sig: Column, nBands: Int, width: Int): Column = {
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(nBands - 1)),
      i => call_function("shiftright", sig, i * lit(width))
        .bitwiseAND(lit(mask)))
  }
}
