package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.quality.Checks
import graft.quality.Checks._

/** Constraint-suite semantics on a fixture with KNOWN violations —
  * every constraint kind exercised on both its pass and fail side,
  * plus the one-scan plan pin (the q97 fusion rule applied to
  * validation). DuckDB value parity of the generated SQL face is
  * covered by q108's oracle row.
  */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  // id: unique non-null; cat: one null, small domain; score: one
  // out-of-range; code: one regex violation + the null (regex audits
  // non-null only); dupKey: duplicates incl. a NULL pair.
  private lazy val fixture = Seq(
    (1L, Some("a"), 10.0, Some("X-1"), Some(7L), "x"),
    (2L, Some("b"), 20.0, Some("X-2"), Some(7L), "y"),
    (3L, None, 999.0, Some("bad"), None, "x"),
    (4L, Some("a"), 30.0, None, None, "y")
  ).toDF("id", "cat", "score", "code", "dupKey", "seg")

  private def resultMap(suite: Seq[Constraint]) =
    Checks.report(fixture, suite).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap

  test("each constraint kind: metric value and verdict on pass and fail sides") {
    val m = resultMap(Seq(
      NotNull("id"), NotNull("cat"),
      Unique(Seq("id")), Unique(Seq("dupKey")),
      Complete("cat", 0.7), Complete("code", 0.9),
      InRange("score", 0.0, 100.0), InRange("id", 0.0, 10.0),
      InSet("cat", Seq("a", "b")), InSet("seg", Seq("x", "y")),
      MatchesRegex("code", "^X-[0-9]$"), MatchesRegex("cat", "^[ab]$"),
      DistinctBetween("cat", 1, 2), DistinctBetween("id", 1, 10)))
    assert(m(("not_null", "id")) == ((0.0, 1L)))
    assert(m(("not_null", "cat")) == ((1.0, 0L)))
    assert(m(("unique", "id")) == ((0.0, 1L)))
    // dupKey: values 7,7,NULL,NULL -> 2 distinct structs, 2 dup rows
    assert(m(("unique", "dupKey")) == ((2.0, 0L)))
    assert(m(("complete", "cat")) == ((0.75, 1L)))
    assert(m(("complete", "code")) == ((0.75, 0L)))
    assert(m(("in_range", "score")) == ((1.0, 0L)))
    assert(m(("in_range", "id")) == ((0.0, 1L)))
    // cat: NULL violates in_set
    assert(m(("in_set", "cat")) == ((1.0, 0L)))
    assert(m(("in_set", "seg")) == ((0.0, 1L)))
    // regex audits non-null only: "bad" fails; the NULL does not count
    assert(m(("matches_regex", "code")) == ((1.0, 0L)))
    assert(m(("matches_regex", "cat")) == ((0.0, 1L)))
    // cat distinct structs: a, b, NULL -> 3 (NULL is a value here)
    assert(m(("distinct_between", "cat")) == ((3.0, 0L)))
    assert(m(("distinct_between", "id")) == ((4.0, 1L)))
  }

  test("complete: the gate sees the EXACT ratio while the report rounds — 1 null in 25k rows fails minRatio = 1.0") {
    import spark.implicits._
    // ratio 24999/25000 = 0.99996 rounds (round4, half-up) to exactly
    // 1.0: the PRESENTED metric must read 1.0 while the verdict fails,
    // or a minRatio = 1.0 audit silently admits violating rows
    val df = (1 to 25000).map(i => if (i == 1) None else Some(i.toLong))
      .toDF("v")
    val rows = Checks.report(df, Seq(Complete("v", 1.0), Complete("v", 0.999)))
      .collect()
    assert(rows(0).getDouble(2) == 1.0, "presented metric is round4")
    assert(rows(0).getLong(3) == 0L, "exact gate must fail minRatio=1.0")
    assert(rows(1).getLong(3) == 1L, "0.99996 passes minRatio=0.999")
    // the generated SQL face carries the same split: rounded metric
    // column, exact gate column
    val sql = Checks.reportSql("t", Seq(Complete("v", 1.0)))
    assert(sql.contains("FLOOR((CAST(COUNT(v)"), "presented arm rounds")
    assert(sql.contains("_g0 >= 1.0") ||
      sql.contains("WHEN CAST(COUNT(v) AS DOUBLE)"), sql)
  }

  test("in_foreign_key: orphans counted, null FKs and null ref keys excluded; plain report() refuses without a resolver") {
    import spark.implicits._
    val dim = Seq(Some(7L), Some(8L), None).toDF("ref_id")
    // dupKey values: 7,7,NULL,NULL -> two non-null refs hit 7; the
    // NULLs are optional references, not orphans. id 1-4: ids 1,2 are
    // orphans vs dim {7,8}
    val rows = Checks.report(fixture, Seq(
      InForeignKey("dupKey", "dim", "ref_id"),
      InForeignKey("id", "dim", "ref_id")),
      { case "dim" => dim })
      .collect().map(r => r.getString(1) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(rows("dupKey") == ((0.0, 1L)), "non-null 7s match, NULLs skip")
    assert(rows("id") == ((4.0, 0L)), "all four ids are orphans vs {7,8}")
    // mixed with scan-fused constraints: same single action, suite order
    val mixed = Checks.report(fixture,
      Seq(NotNull("id"), InForeignKey("dupKey", "dim", "ref_id"),
        RowsBetween(1, 10)), { case "dim" => dim }).collect()
    assert(mixed.map(_.getString(0)).toSeq ==
      Seq("not_null", "in_foreign_key", "rows_between"))
    assert(mixed(1).getLong(3) == 1L)
    // no resolver -> loud refusal naming the table
    val e = intercept[IllegalArgumentException] {
      Checks.report(fixture, Seq(InForeignKey("id", "dim", "ref_id")))
        .collect()
    }
    assert(e.getMessage.contains("dim"), e.getMessage)
    // generated SQL face: uncorrelated NOT IN with nulls excluded
    val sql = Checks.reportSql("t", Seq(InForeignKey("a", "d", "b")))
    assert(sql.contains("a NOT IN (SELECT b FROM d WHERE b IS NOT NULL)"))
  }

  test("rows_between: same metric under two thresholds, suite order kept") {
    val rows = Checks.report(fixture,
      Seq(RowsBetween(1, 4), RowsBetween(5, 9))).collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(3) == 1L && rows(1).getLong(3) == 0L)
    assert(rows(0).getDouble(2) == 4.0 && rows(1).getDouble(2) == 4.0)
  }

  test("suite of any size is ONE scan (metrics fused into one aggregate)") {
    val df = Checks.report(fixture, Seq(
      NotNull("id"), Unique(Seq("id")), Complete("cat", 0.5),
      InRange("score", 0, 1000), InSet("cat", Seq("a", "b")),
      MatchesRegex("code", "^X"), DistinctBetween("cat", 1, 3),
      RowsBetween(1, 100)))
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    val scans = plan.linesIterator.count(l =>
      l.contains("LocalTableScan") || l.contains("Scan parquet"))
    assert(scans == 1, s"expected ONE scan:\n$plan")
  }

  test("generated SQL face mirrors the suite one arm per constraint") {
    val sql = Checks.reportSql("orders", Seq(
      NotNull("o_orderkey"), Unique(Seq("o_orderkey", "o_custkey")),
      InSet("o_orderstatus", Seq("F", "O'Neil"))))
    assert(sql.contains("COUNT(DISTINCT ROW(o_orderkey, o_custkey))"))
    assert(sql.contains("'O''Neil'"), "single quotes must be escaped")
    assert(sql.linesIterator.count(_.startsWith("UNION ALL")) == 2)
    assert(sql.contains("FROM orders"))
  }

  test("empty suite refuses loudly") {
    intercept[IllegalArgumentException] { Checks.report(fixture, Nil) }
    intercept[IllegalArgumentException] { Checks.reportSql("t", Nil) }
  }
}
