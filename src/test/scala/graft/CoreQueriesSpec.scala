package graft

import graft.queries.Core
import org.apache.spark.sql.functions._

class CoreQueriesSpec extends SparkSpec {

  test("every core entry runs and returns rows on sf0.001") {
    Core.entries.foreach { e =>
      val df = e.run(spark, sf)
      assert(df.count() > 0, s"${e.name} returned no rows")
    }
  }

  test("q01 aggregates are internally consistent") {
    val rows = Core.q01(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val base = r.getAs[Double]("sum_base_price")
      val disc = r.getAs[Double]("sum_disc_price")
      assert(disc <= base, "discounted <= base")
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q05 emits at most 3 rows per customer, rank-ordered") {
    val df = Core.q05(spark, sf)
    val worst = df.groupBy(col("o_custkey")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(worst <= 3)
  }

  test("q06 is the global top-10 by totalprice") {
    val top = Core.q06(spark, sf).collect().map(_.getAs[Double]("o_totalprice"))
    assert(top.length == 10)
    assert(top.sameElements(top.sorted.reverse))
  }

  test("q02 predicate+projection push down to the parquet scan") {
    val plan = Core.q02(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && !plan.contains("PushedFilters: []"))
  }
}
