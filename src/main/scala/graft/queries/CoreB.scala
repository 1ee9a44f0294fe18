package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Core relational / ETL operators, part 2 (SURVEY.md §2 rows 8–25). */
object CoreB {

  /** q08: union of heterogeneous sources + dedup — the "many files into
    * one table" shape of the reference's repeated uploads into one
    * template (/root/reference/import.js:86).
    */
  def q08(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val c = t.customer.select(col("c_name").as("name"), lit("customer").as("src"))
    val u = t.supplier.select(col("s_name").as("name"), lit("supplier").as("src"))
    c.unionByName(u).distinct().orderBy(col("name"), col("src"))
  }

  val q08Sql: String =
    """SELECT DISTINCT name, src FROM (
      |  SELECT c_name AS name, 'customer' AS src FROM customer
      |  UNION ALL
      |  SELECT s_name AS name, 'supplier' AS src FROM supplier)
      |ORDER BY name, src""".stripMargin

  /** q09: pivot — categorical values become columns (conditional agg). */
  def q09(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy(col("o_orderpriority"))
  }

  val q09Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q10: unpivot/melt — wide metrics to long rows. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.part
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(
        Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")),
        "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))
  }

  val q10Sql: String =
    """SELECT p_partkey, metric, value FROM (
      |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice FROM part)
      |UNPIVOT (value FOR metric IN (p_size, p_retailprice))
      |ORDER BY p_partkey, metric""".stripMargin

  /** q11: the reference template's column transforms — rename, cast,
    * trim/upper, null defaults, derived (bucketed) columns — compiled
    * to one narrow projection (single pass, codegen'd).
    */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer.select(
      col("c_custkey").as("customer_id"),
      upper(trim(col("c_name"))).as("customer_name"),
      coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
      dec(col("c_acctbal")).cast("double").as("acctbal"),
      when(col("c_acctbal") >= 7000, "GOLD")
        .when(col("c_acctbal") >= 3000, "SILVER")
        .otherwise("BRONZE").as("tier"))
      .orderBy(col("customer_id"))
  }

  val q11Sql: String =
    """SELECT c_custkey AS customer_id,
      |  UPPER(TRIM(c_name)) AS customer_name,
      |  COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
      |  CASE WHEN c_acctbal >= 7000 THEN 'GOLD'
      |       WHEN c_acctbal >= 3000 THEN 'SILVER'
      |       ELSE 'BRONZE' END AS tier
      |FROM customer ORDER BY customer_id""".stripMargin

  /** q12: left-semi (EXISTS) + left-anti (NOT EXISTS) in one result. */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val keys = t.orders.select(col("o_custkey"))
    val semi = t.customer.join(keys, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_orders").as("status"))
    val anti = t.customer.join(keys, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("status"))
    semi.unionByName(anti).orderBy(col("c_custkey"))
  }

  val q12Sql: String =
    """SELECT c_custkey, status FROM (
      |  SELECT c_custkey, 'has_orders' AS status FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, 'no_orders' AS status FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
      |ORDER BY c_custkey""".stripMargin

  /** q13: rollup — hierarchical subtotals in one pass. */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        col("n"), col("total"))
      .orderBy(col("status"), col("prio"))
  }

  val q13Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS prio,
      |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, prio""".stripMargin

  /** q14: cube — all grouping-set combinations. */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .withColumn("order_year", year(col("o_orderdate")).cast("bigint"))
      .cube(col("o_orderstatus"), col("order_year"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("order_year"), lit(-1L)).as("order_year"),
        col("n"))
      .orderBy(col("status"), col("order_year"))
  }

  val q14Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(order_year, -1) AS order_year, COUNT(*) AS n
      |FROM (SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS order_year FROM orders)
      |GROUP BY CUBE(o_orderstatus, order_year)
      |ORDER BY status, order_year""".stripMargin

  /** q15: running/cumulative window aggregate (frame-based), exact
    * decimal so partition order cannot perturb the totals.
    */
  def q15(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.orders
      .withColumn("running_total",
        sum(dec(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q15Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q16: lag/lead offset window functions over the event stream. */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q16Sql: String =
    """SELECT user_id, event_id,
      |  LAG(value) OVER w AS prev_value,
      |  LEAD(value) OVER w AS next_value,
      |  LAG(event_type) OVER w AS prev_type
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** q17: exact percentiles/median per group (linear interpolation).
    * Presentation rounding via the portable [[Q.round4]].
    */
  def q17(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round4(expr("percentile(l_quantity, 0.5)")).as("med_qty"),
        round4(expr("percentile(l_extendedprice, 0.9)")).as("p90_price"),
        round4(expr("percentile(l_discount, 0.25)")).as("p25_disc"))
      .orderBy(col("l_returnflag"))
  }

  val q17Sql: String =
    s"""SELECT l_returnflag,
       |  ${round4Sql("quantile_cont(l_quantity, 0.5)")} AS med_qty,
       |  ${round4Sql("quantile_cont(l_extendedprice, 0.9)")} AS p90_price,
       |  ${round4Sql("quantile_cont(l_discount, 0.25)")} AS p25_disc
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q18: conditional aggregation (FILTER / CASE inside agg). */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_discount") > 0.05, dec(col("l_extendedprice"))))
          .cast("double").as("hi_disc_rev"),
        count(when(col("l_quantity") > 25, lit(1))).as("bulk_items"),
        sum(when(col("l_tax") > 0.04, dec(col("l_extendedprice")))
          .otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("taxed_rev"))
      .orderBy(col("l_returnflag"))
  }

  val q18Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS hi_disc_rev,
      |  COUNT(*) FILTER (WHERE l_quantity > 25) AS bulk_items,
      |  CAST(SUM(CASE WHEN l_tax > 0.04 THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS taxed_rev
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q19: full-outer join + coalesce null-repair (dim reconciliation). */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val c = t.customer.groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    val u = t.supplier.groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(u, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q19Sql: String =
    """SELECT COALESCE(nk_c, nk_s) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nk_c, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey AS nk_s, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      |  ON nk_c = nk_s
      |ORDER BY nationkey""".stripMargin

  /** q20: range (inequality) join, anchored on an equi-key so the plan
    * stays a hash join + residual range filter — a pure range join
    * would be a cross product at 100 TB. Finds line items shipped
    * within 60 days of their order date.
    */
  def q20(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_early_ships"),
        sum(dec(col("l_extendedprice"))).cast("double").as("early_revenue"))
      .orderBy(col("o_orderkey"))
  }

  val q20Sql: String =
    """SELECT o_orderkey, COUNT(*) AS n_early_ships,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS early_revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  AND l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin

  /** q21: as-of join — for each purchase event, the latest
    * non-purchase event of the same user at-or-before it. Spark lacks
    * ASOF JOIN; the scalable composition is union + last(ignoreNulls)
    * over a single per-key window: ONE shuffle on the key, no per-row
    * probing, no cross product — survives 100 TB where a correlated
    * subquery or broadcast-loop would not.
    */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val ev = t.events
    val others = ev.filter(col("event_type") =!= "purchase").select(
      col("user_id").as("uid"), col("ts").as("t"),
      col("event_id").as("ev_id"),
      lit(null).cast("bigint").as("purchase_id"), lit(0).as("is_anchor"))
    val buys = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("uid"), col("ts").as("t"),
      lit(null).cast("bigint").as("ev_id"),
      col("event_id").as("purchase_id"), lit(1).as("is_anchor"))
    // At equal ts the non-purchase sorts first (is_anchor 0 < 1), so a
    // same-instant event counts as "at-or-before"; ev_id asc makes
    // last() pick the max event_id on ts ties — mirroring the oracle's
    // ORDER BY ts DESC, event_id DESC LIMIT 1.
    val w = Window.partitionBy(col("uid"))
      .orderBy(col("t"), col("is_anchor"), col("ev_id"), col("purchase_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    others.unionByName(buys)
      .withColumn("asof_event_id", last(col("ev_id"), ignoreNulls = true).over(w))
      .filter(col("is_anchor") === 1)
      .select(col("purchase_id"), col("uid").as("user_id"), col("asof_event_id"))
      .orderBy(col("purchase_id"))
  }

  val q21Sql: String =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  (SELECT e.event_id FROM events e
      |   WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
      |     AND e.ts <= p.ts
      |   ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS asof_event_id
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  /** q22: sessionization — gap > 30 min starts a new session. Gap math
    * in integer microseconds (exact in both engines; interval/double
    * comparisons are not portable at the boundary).
    */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"),
        max(col("ts")).as("t_end"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q22Sql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS t_start, MAX(ts) AS t_end,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** q23: tumbling time-window aggregation — batch mirror of the
    * streaming windowed agg in graft.streaming.
    */
  def q23(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.events
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  val q23Sql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  /** q24: per-group top-k values as a bounded list. collect_list is
    * safe here because k and group cardinality are bounded; sorting
    * happens inside the array, not via a per-group shuffle. The list
    * is RENDERED as a comma-joined string (see Q's output convention:
    * array columns are not comparable by the verification harness).
    */
  def q24(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer
      .groupBy(col("c_mktsegment"))
      .agg(concat_ws(",", transform(
        slice(array_sort(collect_list(struct(
          (-col("c_acctbal")).as("neg_bal"), col("c_custkey").as("k")))), 1, 3),
        x => x.getField("k").cast("string"))).as("top3"))
      .orderBy(col("c_mktsegment"))
  }

  val q24Sql: String =
    """SELECT c_mktsegment,
      |  array_to_string((list(c_custkey ORDER BY c_acctbal DESC, c_custkey))[1:3], ',') AS top3
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q25: latest-record-per-key (SCD compaction / dedup-by-recency). */
  def q25(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  val q25Sql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** q26: set operations — INTERSECT (customers with both finished and
    * open orders) and EXCEPT (finished-only), labeled and unioned into
    * one result. Spark plans these as aggregates/anti-joins on the key
    * — one shuffle each, no materialized distinct lists.
    */
  def q26(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    def custsWith(status: String) =
      t.orders.filter(col("o_orderstatus") === status)
        .select(col("o_custkey"))
    val f = custsWith("F")
    val o = custsWith("O")
    f.intersect(o).select(lit("both").as("set_op"), col("o_custkey"))
      .unionAll(
        f.except(o).select(lit("f_only").as("set_op"), col("o_custkey")))
      .orderBy(col("set_op"), col("o_custkey"))
  }

  val q26Sql: String =
    """SELECT 'both' AS set_op, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'f_only' AS set_op, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |ORDER BY set_op, o_custkey""".stripMargin

  /** q27: RANGE-frame window — per order, the customer's trailing
    * 30-day order total (value-based frame over epoch seconds, so all
    * same-instant rows are in frame regardless of tie order — the
    * property that makes the result deterministic where a ROWS frame
    * on a tied key would not be).
    */
  def q27(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od_s"))
      .rangeBetween(-30L * 86400, 0)
    t.orders
      // NTZ → TS is a no-op under the pinned UTC session zone; the
      // epoch seconds then match DuckDB's epoch() of the naive value
      .withColumn("od_s",
        col("o_orderdate").cast("timestamp").cast("long"))
      .withColumn("trailing30_total",
        sum(dec(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("trailing30_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q27Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing30_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q28: moment statistics — per-returnflag sample stddev/variance of
    * quantity and the price↔discount correlation. NOT the builtin
    * stddev/corr: Spark's streaming central-moment merge is partition-
    * order dependent in its float error, so two runs of the same query
    * can differ in late digits (and DuckDB's algorithm differs again).
    * Instead the raw power sums are accumulated in EXACT decimal
    * (associative — any partition order yields the identical sums) and
    * the closed-form moments are computed from them in one final
    * double step: deterministic, engine-identical, still one scan and
    * one map-side-combined aggregation.
    */
  def q28(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    // decimal(27,8): quantity < 10^2 with ≤ 2 decimals, price < 10^5
    // with 2 decimals → squares/products have ≤ 4 decimals and fit
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(27,8)")
    val q = col("l_quantity")
    val p = col("l_extendedprice")
    val disc = col("l_discount")
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(d(q)).as("sq"), sum(d(q) * d(q)).as("sqq"),
        sum(d(p)).as("sp"), sum(d(p) * d(p)).as("spp"),
        sum(d(disc)).as("sd"), sum(d(disc) * d(disc)).as("sdd"),
        sum(d(p) * d(disc)).as("spd"))
      // the SUMS are exact decimal (order-independent); every moment
      // formula then runs in DOUBLE on the decimal→double casts — NOT
      // in decimal, whose division scale/rounding rules differ between
      // engines. Identical inputs + identical IEEE op sequence =
      // identical doubles.
      .select(col("l_returnflag"), col("n"),
        col("sq").cast("double").as("dsq"),
        col("sqq").cast("double").as("dsqq"),
        col("sp").cast("double").as("dsp"),
        col("spp").cast("double").as("dspp"),
        col("sd").cast("double").as("dsd"),
        col("sdd").cast("double").as("dsdd"),
        col("spd").cast("double").as("dspd"),
        col("n").cast("double").as("dn"))
      .select(Seq(col("l_returnflag"), col("n")) ++ {
        // degenerate-group guards, mirrored in the oracle: a 1-row
        // group gets NULL (not NaN-vs-error divergence), sums-of-
        // squares are floored at 0 before sqrt (float cancellation can
        // dip epsilon-negative — Spark would NaN, DuckDB would ABORT),
        // and a zero corr denominator gets NULL (Spark Inf vs DuckDB
        // NULL otherwise)
        val ssq = greatest(col("dsqq") - col("dsq") * col("dsq") / col("dn"), lit(0.0))
        val ssp = greatest(col("dspp") - col("dsp") * col("dsp") / col("dn"), lit(0.0))
        val ssd = greatest(col("dsdd") - col("dsd") * col("dsd") / col("dn"), lit(0.0))
        val spd0 = col("dspd") - col("dsp") * col("dsd") / col("dn")
        val denom = sqrt(ssp) * sqrt(ssd)
        Seq(
          Q.round4(when(col("dn") > 1.0, ssq / (col("dn") - 1.0)))
            .as("var_qty4"),
          Q.round4(when(col("dn") > 1.0, sqrt(ssq / (col("dn") - 1.0))))
            .as("std_qty4"),
          Q.round4(when(col("dn") > 1.0 && denom > 0.0, spd0 / denom))
            .as("corr_price_disc4"))
      }: _*)
      .orderBy(col("l_returnflag"))
  }

  val q28Sql: String = {
    val r4 = Q.round4Sql _
    s"""WITH s AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    SUM(CAST(l_quantity AS DECIMAL(27,8))) AS sq,
       |    SUM(CAST(l_quantity AS DECIMAL(27,8)) * CAST(l_quantity AS DECIMAL(27,8))) AS sqq,
       |    SUM(CAST(l_extendedprice AS DECIMAL(27,8))) AS sp,
       |    SUM(CAST(l_extendedprice AS DECIMAL(27,8)) * CAST(l_extendedprice AS DECIMAL(27,8))) AS spp,
       |    SUM(CAST(l_discount AS DECIMAL(27,8))) AS sd,
       |    SUM(CAST(l_discount AS DECIMAL(27,8)) * CAST(l_discount AS DECIMAL(27,8))) AS sdd,
       |    SUM(CAST(l_extendedprice AS DECIMAL(27,8)) * CAST(l_discount AS DECIMAL(27,8))) AS spd
       |  FROM lineitem GROUP BY l_returnflag),
       |d AS (
       |  SELECT l_returnflag, n,
       |    CAST(sq AS DOUBLE) AS dsq, CAST(sqq AS DOUBLE) AS dsqq,
       |    CAST(sp AS DOUBLE) AS dsp, CAST(spp AS DOUBLE) AS dspp,
       |    CAST(sd AS DOUBLE) AS dsd, CAST(sdd AS DOUBLE) AS dsdd,
       |    CAST(spd AS DOUBLE) AS dspd, CAST(n AS DOUBLE) AS dn
       |  FROM s)
       |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       |  ${r4("""CASE WHEN dn > 1.0
       |    THEN GREATEST(dsqq - dsq * dsq / dn, 0.0) / (dn - 1.0) END""")} AS var_qty4,
       |  ${r4("""CASE WHEN dn > 1.0
       |    THEN sqrt(GREATEST(dsqq - dsq * dsq / dn, 0.0) / (dn - 1.0)) END""")} AS std_qty4,
       |  ${r4("""CASE WHEN dn > 1.0 AND
       |      sqrt(GREATEST(dspp - dsp * dsp / dn, 0.0)) * sqrt(GREATEST(dsdd - dsd * dsd / dn, 0.0)) > 0.0
       |    THEN (dspd - dsp * dsd / dn) /
       |      (sqrt(GREATEST(dspp - dsp * dsp / dn, 0.0)) * sqrt(GREATEST(dsdd - dsd * dsd / dn, 0.0))) END""")}
       |    AS corr_price_disc4
       |FROM d ORDER BY l_returnflag""".stripMargin
  }

  /** q80: ordered-funnel analysis — per user, the earliest time each
    * stage of view → click → purchase was reached IN ORDER (a click
    * before the first view does not count; the standard product-
    * analytics funnel). `stage` is how deep the user got (0–3).
    *
    * The stage-k time depends on the stage-(k−1) time, which a single
    * aggregation cannot express; instead three chained per-user
    * window minima compute t1/t2/t3 — all three share one partition
    * spec, so the plan carries ONE exchange on user_id and the final
    * per-user collapse reuses it (no second shuffle). At 100 TB this
    * is a single user-keyed pass, the same shape as q22.
    */
  def q80(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("user_id"))
    t.events
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") >= col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") >= col("t2"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(first(col("t1")).as("t_view"), first(col("t2")).as("t_click"),
        first(col("t3")).as("t_purchase"))
      .select(col("user_id"),
        (when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L)
          .when(col("t_view").isNotNull, 1L)
          .otherwise(0L)).as("stage"),
        col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy(col("user_id"))
  }

  val q80Sql: String =
    """WITH a AS (
      |  SELECT user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1
      |  FROM events),
      |b AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
      |    OVER (PARTITION BY user_id) AS t2
      |  FROM a),
      |c AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
      |    OVER (PARTITION BY user_id) AS t3
      |  FROM b)
      |SELECT user_id,
      |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |    WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
      |  t1 AS t_view, t2 AS t_click, t3 AS t_purchase
      |FROM c GROUP BY user_id, t1, t2, t3
      |ORDER BY user_id""".stripMargin

  /** q81: cohort retention — users bucketed by signup week, and for
    * each (cohort, weeks-since-signup) cell the count and fraction of
    * the cohort active that week. The second classic product-
    * analytics shape next to q80's funnel.
    *
    * Weeks are CALENDAR-FREE on purpose: cohort_week is the signup
    * timestamp's integer 7-day bucket since the epoch and week_offset
    * the integer 7-day bucket of (event − signup) — pure BIGINT
    * epoch-microsecond division, exact and identical in both engines,
    * where date_trunc('week') would drag in calendar/ISO conventions
    * for no analytic gain. Events before the user's signup (data
    * noise) are excluded; rate is an exact BIGINT÷BIGINT double.
    *
    * Scale shape: one user-keyed aggregation for signup times, one
    * co-keyed join back to the event stream (both sides hash on
    * user_id), a distinct on (cohort, offset, user) and the cell
    * aggregate — shuffles carry ids and 64-bit buckets only; the
    * cohort-size side is cohort-count rows, broadcast by AQE.
    */
  def q81(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val WeekUs = 604800000000L // 7 * 86400 * 1e6
    val su = t.events.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("signup_us"))
      .withColumn("cohort_week", expr(s"signup_us DIV ${WeekUs}L"))
    val cohortSize = su.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    val active = t.events
      .select(col("user_id"), unix_micros(col("ts")).as("ev_us"))
      .join(su, "user_id")
      .filter(col("ev_us") >= col("signup_us"))
      .select(col("cohort_week"),
        expr(s"(ev_us - signup_us) DIV ${WeekUs}L").as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(cohortSize, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort")).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q81Sql: String =
    """WITH su AS (
      |  SELECT user_id, min(epoch_us(ts)) AS signup_us
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |co AS (SELECT user_id, signup_us, signup_us // 604800000000 AS cohort_week FROM su),
      |cs AS (SELECT cohort_week, COUNT(*) AS n_cohort FROM co GROUP BY cohort_week),
      |act AS (
      |  SELECT DISTINCT co.cohort_week,
      |    (epoch_us(e.ts) - co.signup_us) // 604800000000 AS week_offset,
      |    e.user_id
      |  FROM events e JOIN co ON e.user_id = co.user_id
      |  WHERE epoch_us(e.ts) >= co.signup_us),
      |cell AS (
      |  SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM act GROUP BY cohort_week, week_offset)
      |SELECT cell.cohort_week, cell.week_offset, cell.n_active,
      |  CAST(cs.n_cohort AS BIGINT) AS n_cohort,
      |  CAST(cell.n_active AS DOUBLE) / cs.n_cohort AS retention
      |FROM cell JOIN cs USING (cohort_week)
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** q82: rolling active users — per event day, the distinct users
    * active that day (DAU) and over the trailing 7 days (WAU). The
    * third product-analytics staple (q80 funnel, q81 retention,
    * q82 engagement).
    *
    * Distinct-over-a-sliding-window is the classically hard shape at
    * scale: a naive 7-day self-join re-scans events, and a windowed
    * count_distinct holds per-window user sets. The scale-correct
    * decomposition: collapse the corpus ONCE to distinct (day, user)
    * pairs — users × days, ≪ events — then each pair CONTRIBUTES to
    * the 7 window-days it can satisfy (explode of a 7-element
    * sequence on the collapsed frame, not the event stream), distinct
    * again, and count per day. Days are the q81 integer epoch buckets
    * (calendar-free, engine-exact); only days with events emit.
    */
  def q82(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val DayUs = 86400000000L
    val du = t.events
      .select(expr(s"unix_micros(ts) DIV ${DayUs}L").as("day"), col("user_id"))
      .distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(expr("sequence(day, day + 6)")).as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day") // inner: only observed event days emit
      .select(col("day"), col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  val q82Sql: String =
    """WITH du AS (
      |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
      |  FROM events),
      |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day),
      |contrib AS (
      |  SELECT DISTINCT day + d AS day, user_id
      |  FROM du, generate_series(0, 6) AS g(d)),
      |wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM contrib GROUP BY day)
      |SELECT dau.day, dau.dau, wau.wau
      |FROM dau JOIN wau USING (day)
      |ORDER BY day""".stripMargin

  /** q83: relational quality audit — the constraint-validation heart
    * of an ETL tool as one query: referential integrity (orphaned
    * lineitems, orders with unknown customers) and domain rules
    * (non-positive quantity, discount outside [0,1]), each reported
    * as (rule, n_checked, n_violations, violation_rate).
    *
    * The clean synthetic corpus would make every count 0 and the
    * oracle vacuous, so (the q52 injection device) the audited frame
    * is lineitem UNION a deterministic corrupt slice — every 97th row
    * re-emitted with its order key pushed past the key space, its
    * quantity negated and its discount bumped past 1 — so both
    * engines must DETECT the same known violations, not just agree
    * on zero.
    *
    * Scale shape: each referential rule is one left-anti-style
    * existence join on the key (dim side broadcast under AQE), domain
    * rules are map-side conditional sums fused into one aggregate
    * over the audited scan; the output is rules-sized.
    */
  def q83(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val corrupt = t.lineitem
      .filter(pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(97)) === 0)
      .withColumn("l_orderkey", col("l_orderkey") + 1000000000L)
      .withColumn("l_quantity", -col("l_quantity"))
      .withColumn("l_discount", col("l_discount") + lit(1.5))
    val audited = t.lineitem.unionByName(corrupt)
    val orders = t.orders.select(col("o_orderkey"), col("o_custkey"))
    val custKeys = t.customer.select(col("c_custkey"))
    // referential: lineitem -> orders (on the audited frame)
    val liOrph = audited.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("lineitem_orphan_order").as("rule"),
        col("n_checked"), col("n_violations"))
    // referential: orders -> customer (the clean dim: expected 0)
    val ordOrph = orders
      .join(custKeys, col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("order_orphan_customer").as("rule"),
        col("n_checked"), col("n_violations"))
    // domain rules: one fused aggregate over the audited scan
    val dom = audited.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("bad_qty"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L)
        .otherwise(0L)).as("bad_disc"))
    val domRules = dom.select(lit("nonpositive_quantity").as("rule"),
        col("n").as("n_checked"), col("bad_qty").as("n_violations"))
      .unionByName(dom.select(lit("discount_out_of_range").as("rule"),
        col("n").as("n_checked"), col("bad_disc").as("n_violations")))
    liOrph.unionByName(ordOrph).unionByName(domRules)
      .select(col("rule"), col("n_checked"), col("n_violations"),
        (col("n_violations").cast("double") / col("n_checked")).as("violation_rate"))
      .orderBy(col("rule"))
  }

  val q83Sql: String =
    """WITH corrupt AS (
      |  SELECT l_orderkey + 1000000000 AS l_orderkey, l_linenumber,
      |    -l_quantity AS l_quantity, l_discount + 1.5 AS l_discount
      |  FROM lineitem WHERE (l_orderkey * 31 + l_linenumber) % 97 = 0),
      |audited AS (
      |  SELECT l_orderkey, l_quantity, l_discount FROM lineitem
      |  UNION ALL SELECT l_orderkey, l_quantity, l_discount FROM corrupt),
      |r1 AS (
      |  SELECT 'lineitem_orphan_order' AS rule,
      |    CAST(COUNT(*) AS BIGINT) AS n_checked,
      |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |  FROM audited a LEFT JOIN orders o ON a.l_orderkey = o.o_orderkey),
      |r2 AS (
      |  SELECT 'order_orphan_customer' AS rule,
      |    CAST(COUNT(*) AS BIGINT) AS n_checked,
      |    CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
      |d AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
      |    CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc
      |  FROM audited),
      |r3 AS (SELECT 'nonpositive_quantity' AS rule, n AS n_checked, bad_qty AS n_violations FROM d),
      |r4 AS (SELECT 'discount_out_of_range' AS rule, n AS n_checked, bad_disc AS n_violations FROM d),
      |allr AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
      |  UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4)
      |SELECT rule, n_checked, n_violations,
      |  CAST(n_violations AS DOUBLE) / n_checked AS violation_rate
      |FROM allr ORDER BY rule""".stripMargin

  /** q87: Bloom-reduced selective fact↔dim join
    * ([[graft.operators.RuntimeFilter.bloomReduce]]) — lineitems of
    * high-value 1996 orders, aggregated by order priority. The build
    * side (the filtered orders) keeps a small fraction of the key
    * space, so the runtime filter drops most lineitem rows BEFORE the
    * join's exchange: at 100 TB the shuffle moves only the ~matching
    * slice of the fact, not all of it. The oracle is the PLAIN join —
    * the Bloom prefilter has no false negatives and the join removes
    * its false positives, so the reduced plan is bit-identical by
    * construction (that equivalence is the point of the check).
    *
    * Scale shape: two sketch-building jobs over the dim (count +
    * distributed bloom aggregate, driver holds only the filter bits),
    * then one map-side probe per fact row and an equi-join whose
    * probe side is pre-thinned; the aggregate is priority-sized.
    */
  def q87(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val hot = t.orders
      .filter(col("o_totalprice") > 450000.0 &&
        col("o_orderdate").between("1996-01-01", "1996-12-31"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = graft.operators.RuntimeFilter.bloomReduce(
      t.lineitem, col("l_orderkey"), hot, col("o_orderkey"))
    li.join(hot, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(Q.dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(Q.discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q87Sql: String =
    """SELECT o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_totalprice > 450000.0
      |  AND o_orderdate BETWEEN '1996-01-01' AND '1996-12-31'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q88: time-series gap-fill + forward fill (resample) — the missing-
    * bucket repair every downstream window/trend computation assumes
    * has already happened: per event type, the DENSE daily calendar
    * from its first to its last active day, absent days materialized
    * with n_events=0 and the metric forward-filled (LOCF) from the
    * last observed day. Without this stage a trailing-window average
    * silently skips gap days instead of counting them as zero traffic.
    *
    * The filled metric is the day's MAX(value): max over identical
    * parquet doubles is exact and order-independent in both engines
    * (a float SUM would be neither — the q28 rationale). Days are the
    * q82 integer epoch-day convention, calendar-free and engine-exact.
    *
    * Scale shape: one keyed daily aggregate (map-side combined), a
    * types-sized bounds aggregate whose calendar explode is ~days per
    * type (≪ events), one co-keyed left join back, and ONE window per
    * type ordered by day for the fill — partitions are type-sized
    * timelines; nothing is ever all-pairs and the explode output is
    * bounded by types × days, not by event volume.
    */
  def q88(s: SparkSession, dir: String): DataFrame = {
    // integral DIV (Column./ on longs is a double divide); epoch days
    // are non-negative here so DIV == floor-divide == DuckDB's //
    val day = expr("unix_micros(ts) DIV 86400000000").as("day")
    val daily = Tables(s, dir).events
      .select(col("event_type"), day, col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("day_max"))
    val cal = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.cast("bigint").as("is_gap"),
        last(col("day_max"), ignoreNulls = true).over(w).as("filled_max"))
      .orderBy(col("event_type"), col("day"))
  }

  val q88Sql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n_events, MAX(value) AS day_max
      |  FROM events GROUP BY 1, 2),
      |cal AS (
      |  SELECT event_type, unnest(generate_series(MIN(day), MAX(day))) AS day
      |  FROM daily GROUP BY event_type)
      |SELECT cal.event_type, cal.day,
      |  coalesce(d.n_events, 0) AS n_events,
      |  CAST(d.n_events IS NULL AS BIGINT) AS is_gap,
      |  last_value(d.day_max IGNORE NULLS) OVER (
      |    PARTITION BY cal.event_type ORDER BY cal.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_max
      |FROM cal LEFT JOIN daily d
      |  ON d.event_type = cal.event_type AND d.day = cal.day
      |ORDER BY cal.event_type, cal.day""".stripMargin

  /** q92: hierarchy flattening (transitive closure to the root) — the
    * recursive-CTE workload (org charts, BOM explosion, category
    * trees) Spark has no native recursion for, expressed as POINTER
    * DOUBLING: each round every node's known ancestor pointer jumps
    * twice as far (join state to itself on `anc = id`, add the
    * depths), so a hierarchy of depth d flattens in ⌈log₂ d⌉ rounds —
    * 6 rounds cover depth ≤ 64, far past any real org/BOM tree, and a
    * corpus-scale taxonomy at 10¹² nodes is still depth ~40 ⇒ the
    * SAME 6 rounds (the q53 label-doubling discipline; at production
    * scale each round would localCheckpoint like q53 does).
    *
    * The corpus has no parent column, so (the q89 device) a
    * deterministic FOREST is injected: ids 0–6 are roots, every other
    * node's parent is `id DIV 3 - 2` (always ≥ 0 and < id, so the
    * forest is well-founded and spans all docs — spec-asserted).
    * Roots carry `anc = self, d = 0`: the doubling join is then total
    * (a root joins itself, adding 0) and needs no null arms.
    *
    * Scale shape: 6 self-equi-joins on the id key + one presentation
    * sort — each round is one co-keyed shuffle of (id, anc, d)
    * triples; no window, no explode, no driver state at all. The
    * oracle replays the closure as a DuckDB recursive CTE — exact.
    *
    * This fixed-depth unroll is the ORACLE FACE of the general
    * operator: [[graft.operators.Hierarchy.closure]] adds convergence
    * detection (stops when no pointer moves — unknown depth), a loud
    * round-budget error (cycles), per-round lineage truncation, and a
    * row-conservation check for dangling parents — HierarchySpec pins
    * closure == this unroll on the same forest and covers depth > 64.
    * Here the depth bound the 6 rounds assume (≤ 64) is enforced
    * PER ROW: a final ancestor that is not an injected root (id < 7)
    * raises instead of silently reporting a non-root ancestor.
    */
  def q92(s: SparkSession, dir: String): DataFrame = {
    val init = Tables(s, dir).documents.select(
      col("doc_id").as("id"),
      when(col("doc_id") < 7, col("doc_id"))
        .otherwise(expr("doc_id DIV 3 - 2")).as("anc"),
      when(col("doc_id") < 7, 0L).otherwise(1L).as("d"))
    var st = init
    for (_ <- 1 to 6) {
      val p = st.select(col("id").as("p_id"), col("anc").as("p_anc"),
        col("d").as("p_d"))
      st = st.join(p, st("anc") === p("p_id"))
        .select(col("id"), col("p_anc").as("anc"),
          (col("d") + col("p_d")).as("d"))
    }
    st.select(col("id").as("doc_id"),
      when(col("anc") < 7, col("anc")).otherwise(raise_error(concat(
        lit("q92: depth > 64 — 6 doubling rounds left a non-root ancestor "),
        col("anc").cast("string"),
        lit("; use Hierarchy.closure for unknown depth")))).as("root_id"),
      col("d").cast("bigint").as("depth"))
      .orderBy(col("doc_id"))
  }

  val q92Sql: String =
    """WITH RECURSIVE nodes AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN doc_id < 7 THEN NULL ELSE doc_id // 3 - 2 END AS parent
      |  FROM documents),
      |r AS (
      |  SELECT id, id AS root_id, CAST(0 AS BIGINT) AS depth
      |  FROM nodes WHERE parent IS NULL
      |  UNION ALL
      |  SELECT n.id, r.root_id, CAST(r.depth + 1 AS BIGINT)
      |  FROM nodes n JOIN r ON n.parent = r.id)
      |SELECT id AS doc_id, root_id, depth FROM r ORDER BY doc_id""".stripMargin

  /** q98: interval-overlap analytics by SWEEP LINE — per event type,
    * the peak number of simultaneously-open intervals and the first
    * instant it is reached (capacity planning / max-concurrency, the
    * classic interval problem a naive self-join answers in O(n²)
    * pairs). Each event opens a half-open interval
    * [ts, ts + (event_id mod 7 + 1) minutes) — the deterministic-
    * injection device (q84/q90): the events table has no duration
    * column, and the modular spread exercises every overlap shape.
    *
    * Sweep line: every interval contributes (+1 at start, −1 at end);
    * processed in (time, delta) order — the −1 first on ties, which
    * IS the half-open convention — the running delta sum at each
    * point is the exact concurrency, its partition max the peak. Tie
    * groups are identical rows, so every permutation of a
    * nondeterministic sort-within-ties yields the same prefix-sum
    * multiset — the output is deterministic even though row order
    * inside a tie is not. Both engines pin ROWS frames (DuckDB's
    * default RANGE frame gives peers their group-final value —
    * same max, but only by accident).
    *
    * Scale shape: one explode (2 rows per event), ONE exchange on
    * event_type reused by both windows and the final aggregate —
    * epoch-microsecond BIGINTs only.
    */
  def q98(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val MinuteUs = 60000000L
    val pts = t.events
      .select(col("event_type"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          (pmod(col("event_id"), lit(7)) + 1) * MinuteUs).as("e_us"))
      .select(col("event_type"), explode(array(
        struct(col("s_us").as("t"), lit(1L).as("d")),
        struct(col("e_us").as("t"), lit(-1L).as("d")))).as("p"))
      .select(col("event_type"), col("p.t").as("t"), col("p.d").as("d"))
    val wRun = Window.partitionBy(col("event_type"))
      .orderBy(col("t").asc, col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val run = pts
      .withColumn("run", sum(col("d")).over(wRun))
      .withColumn("mx", max(col("run")).over(wAll))
    run.groupBy(col("event_type"))
      .agg(
        (count(lit(1)) / 2).cast("long").as("n_events"),
        max(col("run")).as("peak_concurrency"),
        min(when(col("run") === col("mx"), col("t"))).as("first_peak_us"))
      .orderBy(col("event_type"))
  }

  val q98Sql: String =
    """WITH iv AS (
      |  SELECT event_type, epoch_us(ts) AS s_us,
      |    epoch_us(ts) + ((event_id % 7) + 1) * 60000000 AS e_us
      |  FROM events),
      |pts AS (
      |  SELECT event_type, s_us AS t, CAST(1 AS BIGINT) AS d FROM iv
      |  UNION ALL
      |  SELECT event_type, e_us AS t, CAST(-1 AS BIGINT) AS d FROM iv),
      |r AS (
      |  SELECT event_type, t, d,
      |    SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM pts),
      |m AS (
      |  SELECT event_type, t, run,
      |    MAX(run) OVER (PARTITION BY event_type) AS mx
      |  FROM r)
      |SELECT event_type,
      |  CAST(count(*) / 2 AS BIGINT) AS n_events,
      |  CAST(max(run) AS BIGINT) AS peak_concurrency,
      |  CAST(min(CASE WHEN run = mx THEN t END) AS BIGINT) AS first_peak_us
      |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q101: semi-structured (JSON) property extraction — the events
    * table's `props` column parsed with a TYPED schema (`from_json`,
    * Spark's codegen'd Jackson path — the native alternative to
    * per-field `get_json_object` string probing) and aggregated by
    * the extracted value. The injection device (q84/q90) corrupts a
    * deterministic slice so both engines must agree on the THREE
    * distinct failure shapes, not just the happy path: unparseable
    * JSON (from_json → null struct / json_valid false), valid JSON
    * missing the key (null field / null extract), and present values.
    *
    * Scale shape: one codegen'd projection (parse + classify) feeding
    * one hash aggregate on event_type — the parse never repeats per
    * field the way chained get_json_object calls would.
    */
  def q101(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val dirty = when(pmod(col("event_id"), lit(5)) === 0, lit("not json"))
      .when(pmod(col("event_id"), lit(5)) === 1, lit("""{"other": 1}"""))
      .otherwise(col("props"))
    // PERMISSIVE from_json yields an all-null STRUCT for malformed
    // input (never a null struct), so "unparseable" must be observed
    // through the corrupt-record column, not struct nullness
    val parsed = from_json(dirty,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_c",
          org.apache.spark.sql.types.StringType))),
      Map("columnNameOfCorruptRecord" -> "_c"))
    // a NULL props row is mirrored EXPLICITLY as missing (not bad) in
    // both engines: Spark's from_json(NULL) yields a null struct
    // (j._c null, j.k null → would land in "missing" by accident),
    // while DuckDB's json_valid(NULL) is NULL and its CASE arms both
    // fall to 0 — without the explicit p IS NULL arm the engines
    // disagree the day the driver regenerates events with null props
    t.events
      .select(col("event_type"), dirty.as("p"), parsed.as("j"))
      .select(col("event_type"),
        (col("p").isNotNull && col("j._c").isNotNull).cast("long").as("bad"),
        (col("p").isNull ||
          (col("j._c").isNull && col("j.k").isNull)).cast("long").as("missing"),
        col("j.k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("bad")).as("n_bad"),
        sum(col("missing")).as("n_missing"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val q101Sql: String =
    """WITH d AS (
      |  SELECT event_type,
      |    CASE WHEN event_id % 5 = 0 THEN 'not json'
      |         WHEN event_id % 5 = 1 THEN '{"other": 1}'
      |         ELSE props END AS p
      |  FROM events),
      |c AS (
      |  SELECT event_type,
      |    CASE WHEN p IS NOT NULL AND NOT json_valid(p) THEN 1 ELSE 0 END AS bad,
      |    CASE WHEN p IS NULL OR (json_valid(p) AND json_extract(p, '$.k') IS NULL)
      |      THEN 1 ELSE 0 END AS missing,
      |    CASE WHEN json_valid(p)
      |      THEN CAST(json_extract(p, '$.k') AS BIGINT) END AS k
      |  FROM d)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(bad) AS BIGINT) AS n_bad,
      |  CAST(sum(missing) AS BIGINT) AS n_missing,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(max(k) AS BIGINT) AS max_k
      |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q102: arbitrary GROUPING SETS — the general form q13 (rollup)
    * and q14 (cube) specialize: an explicit lattice of aggregation
    * levels including the cross-dimension slices a rollup skips,
    * computed in ONE pass (Catalyst's Expand: each input row fans to
    * one row per set, then a single hash aggregate — never one
    * aggregate per set unioned). The DataFrame API exposes only
    * rollup/cube, so this query is the `spark.sql` path over a temp
    * view — exercising the SQL front door the brief names.
    *
    * The grouping id is computed EXPLICITLY as
    * grouping(a)·2 + grouping(b) in both engines rather than relying
    * on builtin grouping_id() bit conventions agreeing; NULL group
    * columns at aggregated-away levels render identically.
    */
  def q102(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).lineitem.createOrReplaceTempView("graft_q102_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM graft_q102_lineitem
        |GROUP BY GROUPING SETS (
        |  (l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  val q102Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS (
      |  (l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** q103: UNKNOWN-depth hierarchy flattening — the general
    * [[graft.operators.Hierarchy.closure]] operator (pointer doubling
    * with convergence detection) under the driver's DuckDB oracle,
    * on an injection q92's fixed 6-round unroll PROVABLY cannot
    * answer: deterministic chains of length up to 96 (roots where
    * doc_id mod 10⁸ ≡ 0 mod 97, every other node's parent is
    * doc_id − 1), so depths reach 96 > 64 = 2⁶ and q92's per-row root
    * guard would raise. closure stops by itself when no pointer moves
    * (⌈log₂ 96⌉ = 7 doubling rounds here — unknown to the query).
    * The root rule is SLICE-LOCAL (mod 10⁸ first — a no-op for every
    * driver corpus, whose ids sit far below 10⁸) so the ScaleCheck
    * sf1 corpus, whose salted copies live at id + k·10⁸, roots each
    * copy's first id instead of dangling its parent into the previous
    * copy and (correctly) tripping the row-conservation refusal.
    *
    * Scale shape: the operator's own — per round ONE co-keyed
    * self-equi-join exchanging (id, anc, d) triples, round state
    * cached and retired, lineage truncated; the oracle replays the
    * closure as a recursive CTE — exact.
    */
  def q103(s: SparkSession, dir: String): DataFrame =
    graft.operators.Hierarchy.closure(
      Tables(s, dir).documents.select(
        col("doc_id").as("id"),
        when(pmod(pmod(col("doc_id"), lit(100000000L)), lit(97)) === 0,
          lit(null).cast("long"))
          .otherwise(col("doc_id") - 1).as("parent")))
      .select(col("id").as("doc_id"), col("root_id"), col("depth"))
      .orderBy(col("doc_id"))

  val q103Sql: String =
    """WITH RECURSIVE nodes AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN (doc_id % 100000000) % 97 = 0 THEN NULL
      |         ELSE doc_id - 1 END AS parent
      |  FROM documents),
      |r AS (
      |  SELECT id, id AS root_id, CAST(0 AS BIGINT) AS depth
      |  FROM nodes WHERE parent IS NULL
      |  UNION ALL
      |  SELECT n.id, r.root_id, CAST(r.depth + 1 AS BIGINT)
      |  FROM nodes n JOIN r ON n.parent = r.id)
      |SELECT id AS doc_id, root_id, depth FROM r ORDER BY doc_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q08_union_dedup", q08, Some(q08Sql)),
    Entry("q09_pivot", q09, Some(q09Sql)),
    Entry("q10_unpivot", q10, Some(q10Sql)),
    Entry("q11_cast_clean", q11, Some(q11Sql)),
    Entry("q12_semi_anti", q12, Some(q12Sql)),
    Entry("q13_rollup", q13, Some(q13Sql)),
    Entry("q14_cube", q14, Some(q14Sql)),
    Entry("q15_running_window", q15, Some(q15Sql)),
    Entry("q16_lag_lead", q16, Some(q16Sql)),
    Entry("q17_percentiles", q17, Some(q17Sql)),
    Entry("q18_conditional_agg", q18, Some(q18Sql)),
    Entry("q19_outer_join_coalesce", q19, Some(q19Sql)),
    Entry("q20_range_join", q20, Some(q20Sql)),
    Entry("q21_asof_join", q21, Some(q21Sql)),
    Entry("q22_sessionize", q22, Some(q22Sql)),
    Entry("q23_event_window", q23, Some(q23Sql)),
    Entry("q24_grouped_topk_values", q24, Some(q24Sql)),
    Entry("q25_scd_latest", q25, Some(q25Sql)),
    Entry("q26_intersect_except", q26, Some(q26Sql)),
    Entry("q27_range_frame", q27, Some(q27Sql)),
    Entry("q28_stats_agg", q28, Some(q28Sql)),
    Entry("q80_funnel", q80, Some(q80Sql)),
    Entry("q81_retention", q81, Some(q81Sql)),
    Entry("q82_active_users", q82, Some(q82Sql)),
    Entry("q83_quality_audit", q83, Some(q83Sql)),
    Entry("q87_bloom_join", q87, Some(q87Sql)),
    Entry("q88_gapfill", q88, Some(q88Sql)),
    Entry("q92_hierarchy", q92, Some(q92Sql)),
    Entry("q98_concurrency", q98, Some(q98Sql)),
    Entry("q101_json_extract", q101, Some(q101Sql)),
    Entry("q102_grouping_sets", q102, Some(q102Sql)),
    Entry("q103_closure", q103, Some(q103Sql)),
  )
}
