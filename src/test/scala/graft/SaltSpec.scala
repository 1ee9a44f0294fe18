package graft

import graft.util.Salt
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {

  test("skewAgg equals plain aggregation, with groups spread over salts") {
    val li = Tables(spark, sf).lineitem
    val skewed = Salt.skewAgg(
      li.select("l_returnflag", "l_quantity", "l_extendedprice"),
      Seq("l_returnflag"), factor = 8,
      partialAggs = Seq(
        sum("l_quantity").as("q"), count(lit(1)).as("n")),
      mergeAggs = Seq(
        sum("q").as("sum_qty"), sum("n").as("n_rows")))
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
    assert(skewed.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(skewed).count() == 0)
    // the salt really spreads each key across multiple partial groups
    val spread = Salt.addSalt(li.select("l_returnflag", "l_quantity"), 8)
      .groupBy("l_returnflag").agg(countDistinct(Salt.SaltCol).as("n_salts"))
    assert(spread.filter(col("n_salts") < 2).count() == 0)
  }

  test("skewJoin equals plain join") {
    val t = Tables(spark, sf)
    val plain = t.orders.join(t.customer.select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    val salted = Salt.skewJoin(t.orders,
      t.customer.select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey"),
      "o_custkey", factor = 4)
    assert(salted.count() == plain.count())
    assert(salted.select("o_orderkey", "c_mktsegment")
      .exceptAll(plain.select("o_orderkey", "c_mktsegment")).count() == 0)
  }

  test("salt is deterministic across evaluations") {
    val li = Tables(spark, sf).lineitem.limit(1000)
    val a = Salt.addSalt(li, 16)
    val b = Salt.addSalt(li, 16)
    assert(a.exceptAll(b).count() == 0)
  }
}
