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

  test("q80 funnel: stage times are ordered, in-order-only counting verified against a driver replay") {
    val rows = CoreB.q80(spark, sf).collect()
    val t = Tables(spark, sf)
    assert(rows.length == t.events.select(col("user_id")).distinct().count())
    rows.foreach { r =>
      val (stage, t1, t2, t3) = (r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getTimestamp(4))
      // stage k implies times 1..k present and non-decreasing, k+1.. absent
      assert((stage >= 1) == (t1 != null) && (stage >= 2) == (t2 != null) &&
        (stage >= 3) == (t3 != null), s"stage/time mismatch: $r")
      if (t2 != null) assert(!t2.before(t1))
      if (t3 != null) assert(!t3.before(t2))
    }
    // driver replay of the in-order rule on a handful of users
    val ev = t.events.select(col("user_id"), col("ts"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .groupBy(_._1)
    rows.take(30).foreach { r =>
      val uid = r.getLong(0)
      val es = ev(uid).sortBy(_._2.getTime)
      val v1 = es.filter(_._3 == "view").map(_._2).sorted.headOption
      val v2 = v1.flatMap(a => es.filter(e => e._3 == "click" &&
        !e._2.before(a)).map(_._2).sorted.headOption)
      val v3 = v2.flatMap(a => es.filter(e => e._3 == "purchase" &&
        !e._2.before(a)).map(_._2).sorted.headOption)
      assert(r.getTimestamp(2) == v1.orNull && r.getTimestamp(3) == v2.orNull &&
        r.getTimestamp(4) == v3.orNull, s"user $uid diverges from replay")
    }
    // one user-keyed pass: a single hash exchange feeds all three
    // chained windows and the per-user collapse
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val plan = CoreB.q80(spark, sf).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val hashEx = plan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashEx.length == 1, s"expected ONE user-keyed exchange, got ${hashEx.length}")
  }

  test("q81 retention: week-0 cells cover every cohort member; rates bounded and consistent") {
    val rows = CoreB.q81(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, nAct, nCoh, rate) =>
      assert(off >= 0 && nAct >= 1 && nAct <= nCoh,
        s"impossible cell ($off, $nAct, $nCoh)")
      assert(math.abs(rate - nAct.toDouble / nCoh) == 0.0)
    }
    // every signup is active in its own week 0 (the signup event
    // itself counts), so the week-0 cell equals the cohort size
    rows.filter(_._2 == 0L).foreach { case (cw, _, nAct, nCoh, _) =>
      assert(nAct == nCoh, s"cohort $cw week-0 active $nAct != size $nCoh")
    }
    // cohort sizes sum to the signup-user population
    val t = Tables(spark, sf)
    val signups = t.events.filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(rows.filter(_._2 == 0L).map(_._4).sum == signups)
  }

  test("q82 active users: WAU >= DAU, bounded by population, and matches a driver replay") {
    val rows = CoreB.q82(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val t = Tables(spark, sf)
    val population = t.events.select(col("user_id")).distinct().count()
    rows.foreach { case (day, dau, wau) =>
      assert(dau >= 1 && dau <= wau && wau <= population,
        s"day $day: dau $dau wau $wau population $population")
    }
    // driver replay over the (small) distinct day-user set
    val du = t.events
      .select(expr("unix_micros(ts) DIV 86400000000L").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = du.groupBy(_._1)
    rows.foreach { case (day, dau, wau) =>
      assert(dau == byDay(day).map(_._2).distinct.length)
      val want = du.filter(p => p._1 >= day - 6 && p._1 <= day)
        .map(_._2).distinct.length
      assert(wau == want, s"day $day wau $wau != replay $want")
    }
  }

  test("q83 quality audit: injected violations detected exactly, clean rules report zero") {
    val rows = CoreB.q83(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.keySet == Set("lineitem_orphan_order", "order_orphan_customer",
      "nonpositive_quantity", "discount_out_of_range"))
    val t = Tables(spark, sf)
    val nLi = t.lineitem.count()
    val nCorrupt = t.lineitem
      .filter(pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(97)) === 0)
      .count()
    assert(nCorrupt > 0, "fixture must inject at least one corrupt row")
    // every injected row violates all three lineitem rules, exactly
    Seq("lineitem_orphan_order", "nonpositive_quantity",
        "discount_out_of_range").foreach { rule =>
      val (checked, viol, rate) = rows(rule)
      assert(checked == nLi + nCorrupt, s"$rule checked $checked")
      assert(viol == nCorrupt, s"$rule violations $viol != injected $nCorrupt")
      assert(rate == viol.toDouble / checked)
    }
    // the untouched dimension chain stays clean
    assert(rows("order_orphan_customer")._2 == 0L)
  }

  test("q92: pointer-doubled closure equals a driver walk of the injected forest") {
    val out = CoreB.q92(spark, sf).collect()
    val n = Tables(spark, sf).documents.count()
    assert(out.length == n, "closure must be total over the forest")
    def parent(id: Long): Option[Long] =
      if (id < 7) None else Some(id / 3 - 2)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // replay the chain on the driver: same root, same depth
      var cur = id; var d = 0L
      while (parent(cur).isDefined) { cur = parent(cur).get; d += 1 }
      assert(r.getAs[Long]("root_id") == cur,
        s"id=$id root ${r.getAs[Long]("root_id")} != walked $cur")
      assert(r.getAs[Long]("depth") == d,
        s"id=$id depth ${r.getAs[Long]("depth")} != walked $d")
    }
    // the doubling bound: 6 rounds must dominate the actual max depth
    val maxDepth = out.map(_.getAs[Long]("depth")).max
    assert(maxDepth <= 64, s"depth $maxDepth exceeds the 6-round bound")
    assert(maxDepth >= 3, "fixture too shallow to exercise doubling")
  }

  test("q98: sweep-line peaks equal a driver replay of the injected intervals") {
    import org.apache.spark.sql.functions._
    val got = CoreB.q98(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("peak_concurrency"),
          r.getAs[Long]("first_peak_us"))).toMap
    // replay: same half-open sweep, same tie rule, plain Scala
    val evs = Tables(spark, sf).events
      .select(col("event_type"), unix_micros(col("ts")).as("s"),
        col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(1) + (r.getLong(2) % 7 + 1) * 60000000L))
    evs.groupBy(_._1).foreach { case (tpe, iv) =>
      val pts = iv.flatMap { case (_, s, e) => Seq((s, 1L), (e, -1L)) }
        .sortBy(p => (p._1, p._2))
      var run = 0L; var mx = 0L; var first = Long.MaxValue
      pts.foreach { case (t, d) =>
        run += d
        if (run > mx) { mx = run; first = t }
      }
      val (n, peak, fp) = got(tpe)
      assert(n == iv.length.toLong, s"$tpe n")
      assert(peak == mx, s"$tpe peak $peak != $mx")
      assert(fp == first, s"$tpe first_peak $fp != $first")
      assert(peak >= 2, s"$tpe fixture degenerate (no overlap)")
    }
  }
}
