package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2
  * row 52). The `functions._`-composed forms in
  * [[graft.functions.VecOps]] stay as the reference semantics; these
  * produce bit-identical values (same left-to-right double
  * accumulation, same murmur3-derived hyperplanes) in one tight loop
  * per row instead of interpreted `aggregate`/`zip_with` trees — the
  * difference between an ANN candidate pass that takes seconds and one
  * that takes minutes once pair counts reach the millions.
  */
object VecExprs {

  private def c(e: Expression): Column = Bridge.column(e)
  private def x(col: Column): Expression = Bridge.expression(col)

  /** Dot product of two array<double>, left-to-right accumulation. */
  def dot(a: Column, b: Column): Column = c(DotProduct(x(a), x(b)))

  /** L2 norm of an array<double>. */
  def l2(a: Column): Column = c(L2Norm(x(a)))

  /** Random-hyperplane LSH signature (nBits sign bits packed into a
    * long); identical values to VecOps.rhpSignature.
    */
  def rhpSignature(v: Column, nBits: Int): Column = c(RhpSignature(x(v), nBits))

  /** Squared L2 distance of two array<double>, left-to-right
    * accumulation of squared differences — value-identical to the
    * composed `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), ...)`
    * form (same sequential double arithmetic, so the PQ oracles and
    * specs that pin that form still hold).
    */
  def sqDist(a: Column, b: Column): Column = c(SqDist(x(a), x(b)))

  /** ADC lookup sum: codes array<int>, tbl array<array<double>> —
    * sum over j of tbl[j][codes[j]] (0-based), left-to-right. The PQ
    * query hot path: m table reads per candidate row.
    */
  def adcDist(codes: Column, tbl: Column): Column = c(AdcDist(x(codes), x(tbl)))
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += va.getDouble(i) * vb.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class L2Norm(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = v.numElements()
    while (i < n) { val d = v.getDouble(i); acc += d * d; i += 1 }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Squared L2 distance — the PQ training/encoding kernel
  * ([[graft.operators.PqCodec]]): one O(dim) JVM loop per row instead
  * of an interpreted zip_with+aggregate tree. Accumulation order and
  * IEEE arithmetic match the composed form exactly — INCLUDING the
  * degenerate cases: unequal lengths yield NULL (zip_with pads the
  * short side with nulls, which nulls the composed sum), never a
  * plausible-looking partial distance over the overlapping prefix.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = va.numElements()
    if (n != vb.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null ELEMENT nulls the whole distance too — getDouble on a
      // null slot would read 0.0 and produce a plausible wrong number
      if (va.isNullAt(i) || vb.isNullAt(i)) return null
      val d = va.getDouble(i) - vb.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ADC (asymmetric distance computation) lookup sum — the PQ QUERY
  * hot path ([[graft.operators.PqCodec.adcDist]]): for each candidate
  * row, m table lookups tbl[j][codes[j]] accumulated left-to-right.
  * Runs per (candidate × query) pair, so the interpreted-HOF overhead
  * of the composed form multiplies with the shortlist size — this is
  * the loop profiles would surface first at billion scale.
  */
case class AdcDist(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // codes may arrive as array<int> (fresh encode) or array<bigint>
  // (e.g. read back through an engine that widened them)
  private lazy val codeAt: (ArrayData, Int) => Int = left.dataType match {
    case ArrayType(LongType, _) => (a, i) => a.getLong(i).toInt
    case _ => (a, i) => a.getInt(i)
  }

  override def nullSafeEval(c: Any, t: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val tbl = t.asInstanceOf[ArrayData]
    val n = codes.numElements()
    // degenerate inputs — a codes/codebook shape mismatch (e.g. codes
    // written under a different ksub or m) or a null code — must
    // surface as NULL exactly like the composed element_at form, not
    // as an unchecked UnsafeArrayData read of arbitrary memory
    if (n != tbl.numElements()) return null
    var acc = 0.0
    var j = 0
    while (j < n) {
      if (codes.isNullAt(j) || tbl.isNullAt(j)) return null
      val row = tbl.getArray(j)
      val code = codeAt(codes, j)
      if (code < 0 || code >= row.numElements() || row.isNullAt(code))
        return null
      acc += row.getDouble(code)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Sign-random-projection signature (Charikar '02): bit b of the
  * result is set iff v · w(b) > 0, where hyperplane component
  * w(b)(i) = (parse15(md5("b_i")) mod 2001 - 1000) / 1000 — the exact
  * deterministic pseudo-hyperplane VecOps.planeWeight builds (and the
  * q35/q36 DuckDB oracles rebuild), so all three forms agree
  * bit-for-bit with no RNG state to ship to executors.
  *
  * The matrix depends only on (b, i): it is computed ONCE per
  * (executor, dim) and cached — the per-row cost is nBits·dim
  * multiply-adds, with no hashing at all on the hot path.
  */
case class RhpSignature(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val planes = RhpSignature.planes(nBits, dim)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val w = planes(b)
      var d = 0.0
      var i = 0
      while (i < dim) { d += v.getDouble(i) * w(i); i += 1 }
      if (d > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object RhpSignature {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** w(b)(i) for all b < nBits, i < dim — identical to
    * VecOps.planeWeight(b, i) and to the oracle SQL's plane CTE.
    */
  def planes(nBits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nBits, dim), { case (nb, d) =>
      Array.tabulate(nb, d) { (b, i) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"${b}_$i".getBytes("UTF-8"))
          .map(x => f"$x%02x").mkString
        ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001)
          - 1000).toDouble / 1000.0
      }
    })
}
