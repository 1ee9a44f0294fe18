package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Correlated-subquery relational shapes — the decorrelation surface.
  *
  * The reference's hosted engine accepts ANSI SQL with correlated
  * subqueries (scalar aggregates in WHERE, EXISTS / NOT EXISTS chains
  * — the TPC-H Q17/Q21 shapes); everything graft registered so far
  * expresses those semantics pre-flattened (q12's semi/anti, q24's
  * windows). These two queries put the UNFLATTENED SQL itself under
  * the oracle, so Catalyst's decorrelation (`RewriteCorrelatedScalarSubquery`,
  * `RewritePredicateSubquery`) is the machinery being verified — a
  * user migrating correlated SQL verbatim gets the same rows.
  *
  * Scale shape: Catalyst rewrites the scalar subqueries into ONE
  * aggregate-then-join per distinct subquery (merged when bodies
  * agree) and the EXISTS chain into hash-partitioned semi/anti joins
  * — never a per-row re-execution. At 100 TB the plan is the same
  * agg+join pipeline a hand-flattened query would produce; the win is
  * that the optimizer, not the author, owns that rewrite.
  */
object SubQ {

  /** Single-sourced "late shipment" lag for q107 — interpolated into
    * BOTH engine faces (one-definition rule, §4).
    */
  val LateLagDays = 1700

  /** q106: small-quantity revenue by brand (TPC-H Q17 shape) — for
    * every lineitem, compare its quantity against a CORRELATED
    * per-part aggregate (`5 · qty · n_part < sum_qty_part`, the
    * integer-exact form of `qty < 0.2 · avg`), then aggregate the
    * qualifying revenue per brand.
    *
    * Exactness: l_quantity is integral in this data, so the
    * avg-comparison is cross-multiplied into pure BIGINT arithmetic —
    * no division, no float threshold, portable bit-for-bit. Revenue
    * sums decimal-cast addends (§4) and emits DOUBLE.
    *
    * Plan (audited at sf0.1): Catalyst decorrelates each scalar
    * subquery into a per-part aggregate broadcast-joined on
    * l_partkey — two extra lineitem scans (MergeScalarSubqueries
    * merges only UNcorrelated twins, so the shared body is not
    * fused). That is the faithful cost of verbatim correlated SQL;
    * an author-optimized hot path would pre-aggregate once (the
    * flattened shapes q05/q24 already pin). This query pins the
    * verbatim-SQL semantics, not the hand-tuned plan.
    */
  def q106(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem.createOrReplaceTempView("graft_q106_lineitem")
    t.part.createOrReplaceTempView("graft_q106_part")
    s.sql(
      """SELECT p_brand,
        |  CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM graft_q106_lineitem l
        |JOIN graft_q106_part p ON p.p_partkey = l.l_partkey
        |WHERE 5 * CAST(l.l_quantity AS BIGINT) *
        |      (SELECT count(*) FROM graft_q106_lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
        |       FROM graft_q106_lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  val q106Sql: String =
    """SELECT p_brand,
      |  CAST(count(*) AS BIGINT) AS n_small,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE 5 * CAST(l.l_quantity AS BIGINT) *
      |      (SELECT count(*) FROM lineitem l2
      |       WHERE l2.l_partkey = l.l_partkey)
      |    < (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
      |       FROM lineitem l2
      |       WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** q107: sole-blame late suppliers (TPC-H Q21 shape) — suppliers
    * whose shipment on a finished multi-supplier order was late
    * (shipdate > orderdate + [[LateLagDays]]) while EVERY other
    * supplier on the same order shipped on time: a correlated EXISTS
    * (another supplier participated) AND a correlated NOT EXISTS
    * (no other supplier was also late, itself re-joining orders for
    * the lag test).
    *
    * Catalyst decorrelates the pair into a LeftSemi and a LeftAnti
    * hash join on l_orderkey — the NOT EXISTS' internal orders join
    * executes once as a relation, not per outer row.
    */
  def q107(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem.createOrReplaceTempView("graft_q107_lineitem")
    t.orders.createOrReplaceTempView("graft_q107_orders")
    t.supplier.createOrReplaceTempView("graft_q107_supplier")
    s.sql(
      s"""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
         |FROM graft_q107_supplier
         |JOIN graft_q107_lineitem l1 ON s_suppkey = l1.l_suppkey
         |JOIN graft_q107_orders o ON o.o_orderkey = l1.l_orderkey
         |WHERE o.o_orderstatus = 'F'
         |  AND l1.l_shipdate > o.o_orderdate + INTERVAL '$LateLagDays' DAY
         |  AND EXISTS (
         |    SELECT 1 FROM graft_q107_lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM graft_q107_lineitem l3
         |    JOIN graft_q107_orders o3 ON o3.o_orderkey = l3.l_orderkey
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_suppkey <> l1.l_suppkey
         |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL '$LateLagDays' DAY)
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name""".stripMargin)
  }

  val q107Sql: String =
    s"""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       |FROM supplier
       |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       |JOIN orders o ON o.o_orderkey = l1.l_orderkey
       |WHERE o.o_orderstatus = 'F'
       |  AND l1.l_shipdate > o.o_orderdate + INTERVAL $LateLagDays DAY
       |  AND EXISTS (
       |    SELECT 1 FROM lineitem l2
       |    WHERE l2.l_orderkey = l1.l_orderkey
       |      AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM lineitem l3
       |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
       |    WHERE l3.l_orderkey = l1.l_orderkey
       |      AND l3.l_suppkey <> l1.l_suppkey
       |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL $LateLagDays DAY)
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q106_correlated_scalar", q106, Some(q106Sql)),
    Entry("q107_exists_chain", q107, Some(q107Sql)))
}
