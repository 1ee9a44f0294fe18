package graft

import graft.queries.CoreB
import org.apache.spark.sql.functions._

class CoreBQueriesSpec extends SparkSpec {

  test("every CoreB entry runs and returns rows on sf0.001") {
    CoreB.entries.foreach { e =>
      assert(e.run(spark, sf).count() > 0, s"${e.name} returned no rows")
    }
  }

  test("q09 pivot cells sum to the order count") {
    val total = Tables(spark, sf).orders.count()
    val pivoted = CoreB.q09(spark, sf)
      .select((col("F") + col("O") + col("P")).as("s"))
      .agg(sum(col("s"))).collect()(0).getLong(0)
    assert(pivoted == total)
  }

  test("q21 as-of event is at-or-before its purchase, and mostly found") {
    val t = Tables(spark, sf)
    val res = CoreB.q21(spark, sf).cache()
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val joined = res
      .join(purchases, "purchase_id")
      .join(t.events.select(col("event_id").as("asof_event_id"),
        col("ts").as("e_ts")), Seq("asof_event_id"))
    assert(joined.filter(col("e_ts") > col("p_ts")).count() == 0)
    // the as-of join must actually find matches, not be vacuously null
    assert(res.filter(col("asof_event_id").isNotNull).count() > 0)
    res.unpersist()
  }

  test("q22 session events sum to the event count, sessions are gap-consistent") {
    val t = Tables(spark, sf)
    val sess = CoreB.q22(spark, sf).cache()
    val sum_n = sess.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(sum_n == t.events.count())
    // session bounds ordered
    assert(sess.filter(col("t_end") < col("t_start")).count() == 0)
    sess.unpersist()
  }

  test("q25 returns exactly one row per user") {
    val t = Tables(spark, sf)
    val users = t.events.select(col("user_id")).distinct().count()
    assert(CoreB.q25(spark, sf).count() == users)
  }
}
