package graft

import org.apache.spark.sql.functions._

/** The SQL surface of the native expressions, injected by
  * [[GraftExtensions]] through EngineConf (the shared test session is
  * built with the extensions on, so plain `spark.sql` sees them).
  */
class ExtensionsSpec extends SparkSpec {

  test("extension functions are callable from SQL and match the Column API") {
    Tables(spark, sf).registerAll()
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash64(split(trim(lower(regexp_replace(text, '\\s+', ' '))), '\\s+')) AS sh,
        |  graft_minhash_sig(split(trim(lower(regexp_replace(text, '\\s+', ' '))), '\\s+'), 3, 8) AS mh
        |FROM documents""".stripMargin)
    val toks = graft.functions.TextOps.tokens(
      graft.functions.TextOps.normText(col("text")))
    val viaCol = Tables(spark, sf).documents.select(
      col("doc_id"),
      graft.functions.expressions.TextExprs.simhash64(toks).as("sh"),
      graft.functions.expressions.TextExprs.minhashShingleSig(toks, 3, 8).as("mh"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
  }

  test("vector SQL functions: dot, l2, rhp signature") {
    val row = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |       graft_l2(array(3.0d, 4.0d)) AS n,
        |       graft_rhp_sig(array(1.0d, 0.0d), 8) AS s""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(1) == 5.0)
    // signature must be deterministic and within 8 bits
    assert(row.getLong(2) == spark.sql(
      "SELECT graft_rhp_sig(array(1.0d, 0.0d), 8)").collect()(0).getLong(0))
    assert((row.getLong(2) & ~0xffL) == 0L)
  }

  test("graft_nfc composes canonically-equivalent text from SQL") {
    val row = spark.sql(
      "SELECT graft_nfc('cafe\u0301') AS a, graft_nfc('caf\u00e9') AS b, " +
        "graft_nfc('ascii') AS c, graft_nfc('\u212b') AS d").collect()(0)
    assert(row.getString(0) == "caf\u00e9") // decomposed composes
    assert(row.getString(1) == "caf\u00e9") // precomposed fixed point
    assert(row.getString(2) == "ascii")     // ascii untouched
    assert(row.getString(3) == "\u00c5")    // singleton swap
  }

  test("PQ SQL functions: graft_sqdist, graft_adc") {
    val row = spark.sql(
      """SELECT graft_sqdist(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS d,
        |       graft_adc(array(1, 0), array(array(1.5d, 2.5d), array(10.0d, 20.0d))) AS a""".stripMargin)
      .collect()(0)
    assert(row.getDouble(0) == 25.0) // 3^2 + 4^2
    assert(row.getDouble(1) == 12.5) // tbl[0][1] + tbl[1][0]
  }

  test("graft_charset_decode and the graft_bottom_k AGGREGATE work from SQL") {
    val row = spark.sql(
      """SELECT graft_charset_decode(X'636166E9', 'iso-8859-1') AS latin,
        |       graft_charset_decode(X'636166E9', 'no-such-charset') AS fb
        |""".stripMargin).collect()(0)
    assert(row.getString(0) == "café",
      "declared latin-1 must decode 0xE9 as é")
    assert(row.getString(1) == "caf�",
      "unknown label falls back to utf-8 with replacement")
    // the aggregate: analyzer wraps the bare AggregateFunction like a
    // built-in; bottom-2 of 4 rows by (h, v)
    val agg = spark.sql(
      """SELECT g, graft_bottom_k(h, v, 2) AS s FROM VALUES
        |  ('a', 30L, 1.0d), ('a', 10L, 2.0d), ('a', 20L, 3.0d),
        |  ('b', 5L, 9.0d) AS t(g, h, v)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val aRows = agg(0).getSeq[org.apache.spark.sql.Row](1)
    assert(aRows.map(r => (r.getLong(0), r.getDouble(1))) ==
      Seq((10L, 2.0), (20L, 3.0)), s"got $aRows")
    assert(agg(1).getSeq[org.apache.spark.sql.Row](1).size == 1)
  }

  test("non-literal size argument is rejected with a clear error") {
    Tables(spark, sf).registerAll()
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(split(text, ' '), doc_id, 8) FROM documents")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
