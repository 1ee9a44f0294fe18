package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.pipeline.ViewMaintain
import graft.pipeline.ViewMaintain.Spec

/** ViewMaintain: every maintained state must equal the one-shot join
  * of the CURRENT bases — inserts, updates, join-key moves, and
  * tombstones on both sides, plus idempotent replay.
  */
class ViewMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Spec("ok", "ck", "c_ck")

  private def dir(): String =
    Files.createTempDirectory("graft-vm").resolve("view").toString

  private def l(rows: (Long, Long, Double)*): DataFrame =
    rows.toSeq.toDF("ok", "ck", "amount")
  private def r(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("c_ck", "seg")

  private def viewRows(path: String): Set[(Long, Long, Double, Long, String)] =
    spark.read.parquet(path)
      .select("ok", "ck", "amount", "c_ck", "seg")
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getDouble(2),
          x.getLong(3), x.getString(4))).toSet

  private def oneShot(left: DataFrame, right: DataFrame) =
    left.join(right, left("ck") === right("c_ck"))
      .select("ok", "ck", "amount", "c_ck", "seg")
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getDouble(2),
          x.getLong(3), x.getString(4))).toSet

  test("maintained view == one-shot join across every delta shape") {
    val path = dir()
    val l0 = l((1L, 10L, 5.0), (2L, 10L, 6.0), (3L, 20L, 7.0))
    val r0 = r((10L, "gold"), (20L, "iron"), (30L, "idle"))
    ViewMaintain.build(spark, path, l0, r0, spec)
    assert(viewRows(path) == oneShot(l0, r0))

    // ΔL: insert ok=4, update ok=2's amount, MOVE ok=3 to ck=30,
    // tombstone ok=1 (absent from the new base)
    val l1 = l((2L, 10L, 60.0), (3L, 30L, 7.0), (4L, 20L, 8.0))
    val dl1 = Seq(1L, 2L, 3L, 4L).toDF("ok") // keys only, incl. tombstone
    ViewMaintain.maintain(spark, path, l1, r0,
      dl1, r0.limit(0), spec)
    assert(viewRows(path) == oneShot(l1, r0))

    // ΔR: re-segment ck=10, insert ck=40, delete ck=20 (ok=4 must
    // drop from the inner view)
    val r2 = r((10L, "plat"), (30L, "idle"), (40L, "new"))
    val dr2 = Seq(10L, 20L, 40L).toDF("c_ck")
    ViewMaintain.maintain(spark, path, l1, r2,
      l1.limit(0), dr2, spec)
    assert(viewRows(path) == oneShot(l1, r2))

    // replay the SAME maintain: idempotent (pure function of bases)
    ViewMaintain.maintain(spark, path, l1, r2, l1.limit(0), dr2, spec)
    assert(viewRows(path) == oneShot(l1, r2))

    // both-sides batch in one cycle
    val l3 = l((2L, 40L, 61.0), (3L, 30L, 7.0), (4L, 20L, 8.0), (5L, 10L, 9.0))
    val r3 = r((10L, "plat"), (20L, "back"), (30L, "idle"), (40L, "new"))
    ViewMaintain.maintain(spark, path, l3, r3,
      Seq(2L, 5L).toDF("ok"), Seq(20L).toDF("c_ck"), spec)
    assert(viewRows(path) == oneShot(l3, r3))

    // empty deltas: no-op
    ViewMaintain.maintain(spark, path, l3, r3,
      l3.limit(0), r3.limit(0), spec)
    assert(viewRows(path) == oneShot(l3, r3))
  }

  test("maintainPartitioned: untouched partition files stay byte-identical (mtime-pinned); repaired partitions match the one-shot join") {
    val path = dir()
    // partition the view by the left row's region (p): three regions,
    // dimensions shared across them
    def lp(rows: (Long, Long, Double, String)*): DataFrame =
      rows.toSeq.toDF("ok", "ck", "amount", "p")
    val l0 = lp((1L, 10L, 5.0, "a"), (2L, 10L, 6.0, "a"),
      (3L, 20L, 7.0, "b"), (4L, 30L, 8.0, "c"))
    val r0 = r((10L, "gold"), (20L, "iron"), (30L, "idle"))
    ViewMaintain.buildPartitioned(spark, path, l0, r0, spec, "p")

    def partFiles(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/p=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    def wholeView: Set[(Long, Long, Double, Long, String, String)] =
      spark.read.parquet(path)
        .select("ok", "ck", "amount", "c_ck", "seg", "p")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
          x.getLong(3), x.getString(4), x.getString(5))).toSet
    def oneShotP(left: DataFrame, right: DataFrame) =
      left.join(right, left("ck") === right("c_ck"))
        .select("ok", "ck", "amount", "c_ck", "seg", "p")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
          x.getLong(3), x.getString(4), x.getString(5))).toSet
    assert(wholeView == oneShotP(l0, r0))

    val bBefore = partFiles("b"); val cBefore = partFiles("c")
    // ΔL touches only region a (update ok=1, insert ok=5): regions b/c
    // must not be opened, let alone rewritten
    Thread.sleep(1100) // mtime granularity
    val l1 = lp((1L, 10L, 50.0, "a"), (2L, 10L, 6.0, "a"),
      (5L, 20L, 9.0, "a"), (3L, 20L, 7.0, "b"), (4L, 30L, 8.0, "c"))
    ViewMaintain.maintainPartitioned(spark, path, l1, r0,
      lp((1L, 10L, 50.0, "a"), (5L, 20L, 9.0, "a")), r0.limit(0), spec, "p")
    assert(wholeView == oneShotP(l1, r0))
    assert(partFiles("b") == bBefore, "region b files must be untouched")
    assert(partFiles("c") == cBefore, "region c files must be untouched")

    // ΔR on ck=20 touches exactly the partitions holding ck=20 left
    // rows (a via ok=5, b via ok=3) — c stays byte-identical
    Thread.sleep(1100)
    val cBefore2 = partFiles("c")
    val r2 = r((10L, "gold"), (20L, "steel"), (30L, "idle"))
    ViewMaintain.maintainPartitioned(spark, path, l1, r2,
      l1.limit(0), Seq(20L).toDF("c_ck"), spec, "p")
    assert(wholeView == oneShotP(l1, r2))
    assert(partFiles("c") == cBefore2, "region c files must be untouched")

    // a NEW partition value bootstraps its own directory; tombstones
    // carried with their partition value repair in place
    Thread.sleep(1100)
    val aBefore = partFiles("a")
    val l3 = lp((1L, 10L, 50.0, "a"), (2L, 10L, 6.0, "a"),
      (5L, 20L, 9.0, "a"), (6L, 10L, 1.0, "d"))
    ViewMaintain.maintainPartitioned(spark, path, l3, r2,
      lp((3L, 20L, 7.0, "b"), (4L, 30L, 8.0, "c"), (6L, 10L, 1.0, "d")),
      r2.limit(0), spec, "p")
    assert(wholeView == oneShotP(l3, r2))
    assert(partFiles("a") == aBefore, "region a files must be untouched")

    // replay of the same partitioned maintain is idempotent
    ViewMaintain.maintainPartitioned(spark, path, l3, r2,
      lp((6L, 10L, 1.0, "d")), r2.limit(0), spec, "p")
    assert(wholeView == oneShotP(l3, r2))

    // a null partition value refuses loudly
    intercept[IllegalArgumentException] {
      ViewMaintain.maintainPartitioned(spark, path, l3, r2,
        Seq((7L, 10L, 1.0, null: String)).toDF("ok", "ck", "amount", "p"),
        r2.limit(0), spec, "p")
    }
  }

  test("maintainPartitioned is FUSED: Spark job count is O(1) in touched partitions") {
    val path = dir()
    def lp(rows: (Long, Long, Double, String)*): DataFrame =
      rows.toSeq.toDF("ok", "ck", "amount", "p")
    // 8 partitions p0..p7, one row each, all joining ck=10
    val rows0 = (0L until 8L).map(i => (i, 10L, i.toDouble, s"p$i"))
    val r0 = r((10L, "gold"))
    ViewMaintain.buildPartitioned(spark, path, lp(rows0: _*), r0, spec, "p")

    // count jobs via a job group: the fused cycle must not grow its
    // job count with the touched-partition count (the r11 serial loop
    // paid a full read-repair-publish cycle per partition)
    def jobsIn(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      // the status tracker is fed asynchronously — poll until stable
      var last = -1; var cur = spark.sparkContext.statusTracker
        .getJobIdsForGroup(group).length
      while (cur != last) {
        last = cur; Thread.sleep(200)
        cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      }
      cur
    }
    def touchedDelta(ids: Seq[Long]): DataFrame =
      lp(ids.map(i => (i, 10L, 100.0 + i, s"p$i")): _*)
    val l2 = lp(rows0.map { case (i, ck, _, p) =>
      (i, ck, if (i < 2) 100.0 + i else i.toDouble, p) }: _*)
    val j2 = jobsIn("vm-fused-2") {
      ViewMaintain.maintainPartitioned(spark, path, l2, r0,
        touchedDelta(Seq(0L, 1L)), r0.limit(0), spec, "p")
    }
    val l7 = lp(rows0.map { case (i, ck, _, p) =>
      (i, ck, if (i < 7) 100.0 + i else i.toDouble, p) }: _*)
    val j7 = jobsIn("vm-fused-7") {
      ViewMaintain.maintainPartitioned(spark, path, l7, r0,
        touchedDelta(2L until 7L), r0.limit(0), spec, "p")
    }
    assert(j2 > 0, "job-group counting must observe the 2-partition cycle")
    assert(j7 <= j2 + 1,
      s"fused maintain touching 5 partitions ran $j7 jobs vs $j2 for 2 — " +
        "the job count must not scale with touched partitions")
  }

  test("maintain on a missing view bootstraps the full join") {
    val path = dir()
    val l0 = l((1L, 10L, 5.0))
    val r0 = r((10L, "gold"))
    ViewMaintain.maintain(spark, path, l0, r0, l0.limit(0), r0.limit(0), spec)
    assert(viewRows(path) == oneShot(l0, r0))
  }

  test("shared column names refuse loudly (ambiguous view)") {
    val path = dir()
    val bad = Seq((10L, "x")).toDF("c_ck", "amount") // collides with left
    intercept[IllegalArgumentException] {
      ViewMaintain.build(spark, path, l((1L, 10L, 5.0)), bad, spec)
    }
  }
}
