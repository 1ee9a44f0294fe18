package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.Tables
import graft.quality.Checks
import graft.quality.Checks._

/** q108: the data-quality audit face — [[graft.quality.Checks]] over
  * the orders table. The constraint suite below is the kind an ingest
  * gate would pin on this feed: key integrity (o_orderkey non-null +
  * unique), referential completeness (o_custkey), domain checks
  * (status/priority/price), and cardinality plausibility. One
  * constraint (`unique o_custkey`) is DELIBERATELY violated by the
  * data — customers place many orders — so the report's failure arm
  * is exercised under the oracle, not just the all-green path.
  *
  * Both engine faces are GENERATED from the same constraint list
  * (Checks.report / Checks.reportSql) — the one-definition rule
  * applied to a whole query.
  *
  * Scale shape: one scan of orders; every non-distinct metric folds
  * map-side; the two distinct metrics (unique keys, status
  * cardinality) ride Spark's single Expand. No second action: the
  * report rows are an inline over the 1-row aggregate.
  */
object QualityQ {

  /** The audited suite — single-sourced into both faces. */
  val OrdersSuite: Seq[Constraint] = Seq(
    NotNull("o_orderkey"),
    Unique(Seq("o_orderkey")),
    Unique(Seq("o_custkey")), // deliberately violated: many orders/customer
    Complete("o_custkey", 1.0),
    InRange("o_totalprice", 0.0, 1000000.0),
    InSet("o_orderstatus", Seq("F", "O", "P")),
    MatchesRegex("o_orderpriority", "^[1-5]-"),
    DistinctBetween("o_orderstatus", 1, 5),
    RowsBetween(1L, 10000000000L))

  def q108(s: SparkSession, dir: String): DataFrame =
    Checks.report(Tables(s, dir).orders, OrdersSuite)

  val q108Sql: String = Checks.reportSql("orders", OrdersSuite)

  /** q111: the REFERENTIAL-INTEGRITY face — [[Checks.InForeignKey]]
    * over orders against the customer dimension, with an injected
    * orphan slice (every o_orderkey % 100 == 0 row gets a NEGATED
    * custkey in a derived `cust2` column, absent from customer by
    * construction) so BOTH arms run under the oracle: the untouched
    * o_custkey passes (TPC-H referential integrity holds), the
    * derived column fails with the exact orphan count. The FK metric
    * is the suite's documented second pass: a broadcast anti-probe
    * against the distinct customer keys, cross-joined onto the fused
    * single-scan metrics row — the SQL face keeps the whole suite in
    * one SELECT via an uncorrelated NOT IN subquery.
    */
  val FkInject = "CASE WHEN o_orderkey % 100 = 0 THEN -o_custkey " +
    "ELSE o_custkey END"

  val FkSuite: Seq[Constraint] = Seq(
    InForeignKey("o_custkey", "customer", "c_custkey"), // passes
    InForeignKey("cust2", "customer", "c_custkey"),     // injected orphans
    NotNull("cust2"),
    Complete("o_custkey", 1.0))

  def q111(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val audited = t.orders.withColumn("cust2", expr(FkInject))
    Checks.report(audited, FkSuite, {
      case "customer" => t.customer
      case other => throw new IllegalArgumentException(
        s"q111 resolver knows only customer, got $other")
    })
  }

  val q111Sql: String = Checks.reportSql(
    s"(SELECT *, $FkInject AS cust2 FROM orders) AS audited", FkSuite)

  val entries: Seq[Entry] = Seq(
    Entry("q108_data_checks", q108, Some(q108Sql)),
    Entry("q111_fk_checks", q111, Some(q111Sql)))
}
