package graft

import org.apache.spark.sql.functions._

import graft.queries.SubQ

/** The correlated-subquery faces (q106/q107) rechecked against
  * independently-derived flattened formulations — the oracle proves
  * DuckDB parity; these prove the SQL means what the scaladoc says.
  */
class SubQSpec extends SparkSpec {

  test("q106 == window-flattened reformulation (per-part aggregates)") {
    val t = Tables(spark, sf)
    val li = t.lineitem
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_partkey")
    val flat = li
      .withColumn("n_part", count(lit(1)).over(w))
      .withColumn("sum_qty", sum(col("l_quantity").cast("long")).over(w))
      .where(lit(5) * col("l_quantity").cast("long") * col("n_part") <
        col("sum_qty"))
      .join(t.part, col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_small"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .orderBy("p_brand")
    val got = SubQ.q106(spark, sf).collect().toSeq.map(_.toSeq)
    val want = flat.collect().toSeq.map(_.toSeq)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q107 == hand-flattened semi/anti joins (sole-blame late supplier)") {
    val t = Tables(spark, sf)
    val lag = SubQ.LateLagDays
    val li = t.lineitem
    val late = li
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL '$lag' DAY"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val base = late
      .join(t.orders.where(col("o_orderstatus") === "F"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"))
    // EXISTS other-supplier lineitem on the same order
    val others = li.select(
      col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
    val withOther = base.join(others,
      col("o2_orderkey") === col("l_orderkey") &&
        col("o2_suppkey") =!= col("l_suppkey"), "leftsemi")
    // NOT EXISTS other-supplier LATE lineitem on the same order
    val lateOthers = late.select(
      col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
    val soleBlame = withOther.join(lateOthers,
      col("o3_orderkey") === col("l_orderkey") &&
        col("o3_suppkey") =!= col("l_suppkey"), "leftanti")
    val flat = soleBlame
      .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
    val got = SubQ.q107(spark, sf).collect().toSeq.map(_.toSeq)
    val want = flat.collect().toSeq.map(_.toSeq)
    assert(got == want)
    assert(got.nonEmpty, "fixture threshold yields no late rows at sf0.001")
  }
}
