package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Core relational / ETL operators (SURVEY.md §2 rows 1–25).
  *
  * Each query is the Spark-native form of a transformation the
  * reference pipeline performs server-side after upload
  * (/root/reference/src/api/templates.js:131 startWithFile): declared
  * via the DataFrame API so Catalyst handles pushdown, pruning, join
  * strategy and AQE — nothing here hand-schedules execution.
  */
object Core {

  /** q01: group-by aggregation over the fact table (TPC-H Q1 shape).
    * Money sums use exact decimal arithmetic (partition-order
    * independent); the scan reads only the 7 referenced columns.
    */
  def q01(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: filter + projection. Both the predicate and the 3-column
    * read schema push down to the parquet scan.
    */
  def q02(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .filter(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q03: fact ⋈ dim with an explicit broadcast hint — at 100 TB the
    * customer dim is small relative to orders, so the join must not
    * shuffle the fact side.
    */
  def q03(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("c_mktsegment"))
  }

  val q03Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q04: multi-way join (fact ⋈ orders ⋈ customer ⋈ nation ⋈ region)
    * + aggregation (TPC-H Q5 shape). Dim chain broadcasts; only the
    * lineitem⋈orders join exchanges data.
    */
  def q04(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val dims = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q04Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** q05: window top-N per group — row_number over a tie-free ordering
    * so results are deterministic under any partitioning.
    */
  def q05(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q05Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** q06: global sort + limit. Spark plans this as TakeOrderedAndProject
    * (per-partition top-K then merge), never a full global sort.
    */
  def q06(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(10)
  }

  val q06Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** q07: distinct + count-distinct (exact; the approximate HLL variant
    * is covered by a spec, not the oracle, since its value is
    * implementation-defined).
    */
  def q07(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders.agg(
      countDistinct(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderstatus")).as("n_status"),
      countDistinct(col("o_orderpriority")).as("n_prio"))
  }

  val q07Sql: String =
    """SELECT COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(DISTINCT o_orderstatus) AS n_status,
      |  COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q01_agg_pricing", q01, Some(q01Sql)),
    Entry("q02_filter_project", q02, Some(q02Sql)),
    Entry("q03_join_broadcast", q03, Some(q03Sql)),
    Entry("q04_multi_join", q04, Some(q04Sql)),
    Entry("q05_window_topn", q05, Some(q05Sql)),
    Entry("q06_sort_limit", q06, Some(q06Sql)),
    Entry("q07_distinct_count", q07, Some(q07Sql)),
  )
}
