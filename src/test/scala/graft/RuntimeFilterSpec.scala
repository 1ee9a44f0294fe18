package graft

import graft.operators.RuntimeFilter
import graft.queries.{CoreB, Q}
import org.apache.spark.sql.functions._

/** The Bloom semi-join reduction's contract: bit-identical join
  * results (no false negatives; the join eats the false positives), a
  * pure-predicate plan (no extra join), and a loud empty-build-side
  * short-circuit.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloomReduce join == plain join, and the prefilter is plan-visible") {
    val t = Tables(spark, sf)
    val hot = t.orders.filter(col("o_totalprice") > 200000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val reduced = RuntimeFilter.bloomReduce(
      t.lineitem, col("l_orderkey"), hot, col("o_orderkey"))

    // the reduced frame is a FILTER of lineitem: plan carries the
    // native probe, no join nodes
    val plan = reduced.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloomseen"),
      s"prefilter missing from the plan:\n$plan")
    assert(!plan.toLowerCase.contains("join"),
      s"the reduction must be a pure filter:\n$plan")

    // joined results are bit-identical to the plain join
    def agg(li: org.apache.spark.sql.DataFrame) =
      li.join(hot, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(Q.dec(col("l_quantity"))).cast("double").as("q"))
        .orderBy(col("o_orderpriority")).collect().toSeq
    assert(agg(reduced) == agg(t.lineitem))

    // no false negatives even at a coarse fp rate
    val coarse = RuntimeFilter.bloomReduce(
      t.lineitem, col("l_orderkey"), hot, col("o_orderkey"), fpp = 0.3)
    assert(agg(coarse) == agg(t.lineitem))
  }

  test("empty build side short-circuits to an empty frame") {
    val t = Tables(spark, sf)
    val none = t.orders.filter(lit(false))
      .select(col("o_orderkey"))
    val reduced = RuntimeFilter.bloomReduce(
      t.lineitem, col("l_orderkey"), none, col("o_orderkey"))
    assert(reduced.count() == 0)
  }

  test("q87 matches the plain-join recomputation") {
    val got = CoreB.q87(spark, sf).collect().toSeq
    val t = Tables(spark, sf)
    val hot = t.orders
      .filter(col("o_totalprice") > 450000.0 &&
        col("o_orderdate").between("1996-01-01", "1996-12-31"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val want = t.lineitem
      .join(hot, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(Q.dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(Q.discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    assert(got == want)
    assert(got.nonEmpty, "the 1996 high-value slice must not be empty at sf0.001")
  }
}
