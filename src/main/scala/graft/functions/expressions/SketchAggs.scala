package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native AGGREGATE sketches — the first `TypedImperativeAggregate`
  * in the repo (scalar expressions live in TextExprs/VecExprs; an
  * aggregate needs the typed-buffer API so its state can be a bounded
  * heap instead of a Catalyst row).
  */
object SketchAggs {

  /** Deterministic bottom-k sample of (hash, value) pairs as a Column
    * aggregate: the k smallest rows per group by `(h, v)` order. See
    * [[BottomKSample]].
    */
  def bottomK(h: Column, v: Column, k: Int): Column =
    Bridge.column(BottomKSample(Bridge.expression(h),
      Bridge.expression(v), k).toAggregateExpression())
}

/** Bounded deterministic bottom-k sampling aggregate — the mergeable
  * quantile-sketch state [[graft.pipeline.StatsMaintain]] maintains
  * (the design choice over KLL, stated plainly: a KLL's compactor
  * schedule is replayable only by re-implementing KLL in the oracle
  * engine, while "the k rows whose md5 row-key hash is smallest" is
  * ONE closed-form SQL clause — `row_number() OVER (ORDER BY
  * md5_number_lower(key)) <= k` — so the whole sketch stays inside
  * the repo's exact-oracle discipline; at k=1024 the sample quantile
  * carries a ~1/√k ≈ 3% rank error, against the log2 histogram's
  * factor-2 value bound).
  *
  * Semantics: the k smallest `(h, v)` pairs of the group, ascending —
  * a uniform-without-replacement row sample when `h` is the
  * md5Lower64 of a UNIQUE row key (the q46 hash-sampling discipline;
  * duplicate keys collapse the effective sample). Bottom-k of a union
  * is bottom-k of the parts' bottom-ks, so the fold is associative,
  * commutative, and BIT-identical however batches arrive. Null `h` or
  * `v` rows are skipped (the other families' isNotNull convention).
  *
  * Buffer: a size-capped binary max-heap ordered by `(h, v)` —
  * update O(log k) only while the candidate beats the current worst,
  * merge O(k log k), serialized as 16-byte little-endian pairs.
  * Evaluates to array<struct<h bigint, v double>> sorted ascending.
  */
case class BottomKSample(left: Expression, right: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKSample.Buf] {

  require(k > 0, s"bottomK needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): BottomKSample.Buf =
    new BottomKSample.Buf(k)

  override def update(buf: BottomKSample.Buf,
                      input: InternalRow): BottomKSample.Buf = {
    val h = left.eval(input)
    if (h != null) {
      val v = right.eval(input)
      if (v != null)
        buf.offer(h.asInstanceOf[Long], v match {
          case d: Double => d
          case f: Float => f.toDouble
          case n: java.lang.Number => n.doubleValue()
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
        })
    }
    buf
  }

  override def merge(buf: BottomKSample.Buf,
                     other: BottomKSample.Buf): BottomKSample.Buf = {
    other.foreach((h, v) => buf.offer(h, v))
    buf
  }

  override def eval(buf: BottomKSample.Buf): Any = {
    val arr = buf.sortedPairs
    new GenericArrayData(arr.map { case (h, v) =>
      InternalRow(h, v)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: BottomKSample.Buf): Array[Byte] = {
    val pairs = buf.sortedPairs
    val bb = java.nio.ByteBuffer.allocate(pairs.length * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    pairs.foreach { case (h, v) => bb.putLong(h).putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKSample.Buf = {
    val buf = new BottomKSample.Buf(k)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() >= 16) buf.offer(bb.getLong, bb.getDouble)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(left = cs(0), right = cs(1))
  override def prettyName: String = "graft_bottom_k"
}

object BottomKSample {

  /** Size-capped max-heap of (h, v) pairs under ascending (h, v)
    * order — holds the k SMALLEST pairs seen; the root is the worst
    * retained pair, evicted when a smaller candidate arrives.
    */
  final class Buf(k: Int) {
    private val hs = new Array[Long](k)
    private val vs = new Array[Double](k)
    private var n = 0

    private def less(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
      h1 < h2 || (h1 == h2 && v1 < v2)

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && less(hs((i - 1) / 2), vs((i - 1) / 2), hs(i), vs(i))) {
        val p = (i - 1) / 2
        val th = hs(i); val tv = vs(i)
        hs(i) = hs(p); vs(i) = vs(p); hs(p) = th; vs(p) = tv
        i = p
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && less(hs(m), vs(m), hs(l), vs(l))) m = l
        if (r < n && less(hs(m), vs(m), hs(r), vs(r))) m = r
        if (m == i) done = true
        else {
          val th = hs(i); val tv = vs(i)
          hs(i) = hs(m); vs(i) = vs(m); hs(m) = th; vs(m) = tv
          i = m
        }
      }
    }

    def offer(h: Long, v: Double): Unit =
      if (n < k) {
        hs(n) = h; vs(n) = v; n += 1; siftUp(n - 1)
      } else if (less(h, v, hs(0), vs(0))) {
        hs(0) = h; vs(0) = v; siftDown()
      }

    def foreach(f: (Long, Double) => Unit): Unit = {
      var i = 0
      while (i < n) { f(hs(i), vs(i)); i += 1 }
    }

    /** The retained pairs, ascending by (h, v). */
    def sortedPairs: Array[(Long, Double)] = {
      val out = new Array[(Long, Double)](n)
      var i = 0
      while (i < n) { out(i) = (hs(i), vs(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Double), b: (Long, Double)) =>
          a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }
  }
}
