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
