package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  test("bucketed join on the bucket key plans with NO exchange") {
    val t = Tables(spark, sf)
    Bucketed.write(t.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice"),
      "li_bucketed", "l_orderkey", 4)
    Bucketed.write(t.orders.select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 4)
    // at test size the planner prefers broadcast (also shuffle-free);
    // force the sort-merge path to prove the bucketed layout carries
    // the partitioning — this is the plan a 100 TB fact-fact join gets
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not a merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    // and the result is correct vs a plain join
    val plain = Tables(spark, sf).lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
  }

  test("aggregation on the bucket key needs no exchange") {
    val agg = spark.table("li_bucketed")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed aggregation still shuffles:\n$plan")
    assert(agg.count() ==
      Tables(spark, sf).lineitem.select("l_orderkey").distinct().count())
  }
}
