package graft

import graft.operators.Hll
import graft.pipeline.StatsMaintain
import graft.pipeline.StatsMaintain.Spec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintenance invariant: folding batches one at a time into the
  * snapshot yields EXACTLY the stats of aggregating all rows at once —
  * counts, exact decimal sums, min/max, and the HLL register vectors
  * element-for-element (hence identical distinct estimates). Plus the
  * crash-recovery and bootstrap paths of the shared Snapshot publish.
  */
class StatsMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Spec(
    keys = Seq("grp"),
    sums = Seq("amount"),
    minMax = Seq("amount"),
    distincts = Seq("user"))

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-stats").toString + "/stats"

  private def batch(rows: (String, Long, String)*): DataFrame =
    rows.toSeq.toDF("grp", "amount", "user")

  private val b1 = Seq(
    ("a", 10L, "u1"), ("a", 20L, "u2"), ("b", 5L, "u1"))
  private val b2 = Seq(
    ("a", 30L, "u2"), ("b", -5L, "u3"), ("c", 7L, "u4"))
  private val b3 = Seq(
    ("a", 1L, "u5"), ("a", 2L, "u1"), ("c", 7L, "u4"), ("c", 9L, null))

  private def snap(path: String) = spark.read.parquet(path)

  test("incremental fold equals one-shot aggregation, register vectors included") {
    val path = tmpDir()
    val s1 = StatsMaintain.maintain(spark, path, batch(b1: _*), spec)
    assert(s1.batchRows == 3 && s1.groups == 2 && s1.newGroups == 2, s"$s1")
    val s2 = StatsMaintain.maintain(spark, path, batch(b2: _*), spec)
    assert(s2.groups == 3 && s2.newGroups == 1, s"$s2")
    val s3 = StatsMaintain.maintain(spark, path, batch(b3: _*), spec)
    assert(s3.groups == 3 && s3.newGroups == 0, s"$s3")

    val oneShot = StatsMaintain.partials(batch((b1 ++ b2 ++ b3): _*), spec)
    def canon(df: DataFrame) = df
      .select(col("grp"), col("n"), col("sum_amount"),
        col("min_amount"), col("max_amount"),
        concat_ws(",", col("hll_user")).as("vec"))
      .collect().map(_.toSeq).toSet
    assert(canon(snap(path)) == canon(oneShot),
      s"maintained ${canon(snap(path))} != one-shot ${canon(oneShot)}")
  }

  test("report estimates equal the Hll.estimate of the concatenated data, group for group") {
    val path = tmpDir()
    Seq(b1, b2, b3).foreach(b =>
      StatsMaintain.maintain(spark, path, batch(b: _*), spec))
    val reported = StatsMaintain.report(snap(path), spec)
      .select("grp", "nd_user").as[(String, Long)].collect().toMap

    // independent recompute through the register-ROW form q45 verifies
    val all = batch((b1 ++ b2 ++ b3): _*).filter(col("user").isNotNull)
    val regs = all
      .groupBy(col("grp"), Hll.reg(col("user")).as("reg"))
      .agg(max(Hll.rho(col("user"))).as("mj"))
    val direct = Hll.estimate(regs, Seq("grp"))
      .as[(String, Long)].collect().toMap
    assert(reported == direct, s"$reported vs $direct")
    // sanity on magnitude: tiny cardinalities estimate near-exact
    assert(reported("a") >= 3 && reported("a") <= 5, s"$reported")
  }

  test("all-null distinct column yields the empty sketch and estimate 0") {
    val path = tmpDir()
    StatsMaintain.maintain(spark, path,
      Seq(("x", 1L, null: String)).toDF("grp", "amount", "user"), spec)
    val r = StatsMaintain.report(snap(path), spec)
      .select("grp", "n", "nd_user").as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("x", 1L, 0L)), s"$r")
  }

  test("crash between the publish renames is repaired on the next maintain") {
    val path = tmpDir()
    StatsMaintain.maintain(spark, path, batch(b1: _*), spec)
    // simulate the crash window: snapshot retired, target missing
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "._graft_old")))
    val s = StatsMaintain.maintain(spark, path, batch(b2: _*), spec)
    // recovery reinstated b1's groups: b2 alone would have 3 groups
    // with c new — a fresh bootstrap would report newGroups == 3
    assert(s.groups == 3 && s.newGroups == 1, s"recovery lost the snapshot: $s")
    val n = snap(path).agg(sum("n")).head.getLong(0)
    assert(n == 6L, s"expected all 6 rows counted, got $n")
  }
}
