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
    distincts = Seq("user"),
    hists = Seq("amount"))

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
        concat_ws(",", col("hll_user")).as("vec"),
        concat_ws(",", col("hist_amount")).as("hvec"))
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

  test("histogram quantiles: maintained bound within 2x of truth, reference-exact binning") {
    val path = tmpDir()
    // values 1..1000 over two maintenance rounds, one group
    val r1 = (1L to 500L).map(v => ("g", v, s"u$v"))
    val r2 = (501L to 1000L).map(v => ("g", v, s"u$v"))
    StatsMaintain.maintain(spark, path, batch(r1: _*), spec)
    StatsMaintain.maintain(spark, path, batch(r2: _*), spec)
    val row = StatsMaintain.report(snap(path), spec)
      .select("p50_amount", "p99_amount").head
    val (p50, p99) = (row.getLong(0), row.getLong(1))

    // driver reference of the SAME histogram math: bin = bits(v),
    // estimate = 2^bin - 1 at rank ceil(q n)
    def refQ(vals: Seq[Long], num: Int, den: Int): Long = {
      val bins = vals.map(v => if (v <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = vals.size.toLong
      val rank = (n * num + den - 1) / den
      var cum = 0L
      (0 until StatsMaintain.HistBins).foreach { b =>
        val prev = cum; cum += bins.getOrElse(b, 0L)
        if (prev < rank && cum >= rank && b > 0) return (1L << b) - 1
      }
      0L
    }
    val all = (1L to 1000L)
    assert(p50 == refQ(all, 1, 2), s"p50 $p50 != ref ${refQ(all, 1, 2)}")
    assert(p99 == refQ(all, 99, 100), s"p99 $p99 != ref ${refQ(all, 99, 100)}")
    // the factor-2 guarantee vs the exact quantiles (500, 991)
    assert(p50 >= 500 && p50 < 1000, s"p50 $p50 outside [q, 2q)")
    assert(p99 >= 991 && p99 < 1982, s"p99 $p99 outside [q, 2q)")
    assert(p50 <= p99)
  }

  test("maintainBatch: the in-snapshot ledger makes additive folding exactly-once with NO crash window") {
    val path = tmpDir()
    val s1 = StatsMaintain.maintainBatch(spark, path, batch(b1: _*), spec, 0L)
    assert(s1.isDefined && s1.get.batchRows == 3)
    val before = snap(path).collect().map(_.toString).sorted.toSeq
    // replay of batchId 0: refused by the ledger INSIDE the published
    // snapshot — there is no external state whose loss could separate
    // "data applied" from "batch recorded"
    val replay = StatsMaintain.maintainBatch(spark, path, batch(b1: _*), spec, 0L)
    assert(replay.isEmpty, "replayed batch must be refused")
    assert(snap(path).collect().map(_.toString).sorted.toSeq == before,
      "refused replay must not change the snapshot")
    assert(StatsMaintain.appliedBatches(spark, path) == Set(0L))
    // a fresh id applies, and the ledger accumulates
    assert(StatsMaintain.maintainBatch(spark, path, batch(b2: _*), spec, 1L).isDefined)
    assert(StatsMaintain.appliedBatches(spark, path) == Set(0L, 1L))
    // an UN-ledgered maintain between ledgered ones must PRESERVE the
    // ledger (else a later replay of 0/1 would double-apply)
    StatsMaintain.maintain(spark, path, batch(b3: _*), spec)
    assert(StatsMaintain.appliedBatches(spark, path) == Set(0L, 1L),
      "plain maintain wiped the in-snapshot ledger")
    assert(StatsMaintain.maintainBatch(spark, path, batch(b1: _*), spec, 1L).isEmpty)
    // final state equals the one-shot over all three batches
    val oneShot = StatsMaintain.partials(batch((b1 ++ b2 ++ b3): _*), spec)
    def canon(df: DataFrame) = df
      .select(col("grp"), col("n"), col("sum_amount"),
        concat_ws(",", col("hll_user")).as("v"),
        concat_ws(",", col("hist_amount")).as("h"))
      .collect().map(_.toSeq).toSet
    assert(canon(snap(path)) == canon(oneShot))
  }

  test("statsSink: a change stream maintains the stats snapshot exactly-once end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-stats").toString
    val target = s"$dir/stats"
    val input = MemoryStream[(String, Long, String)](spark)
    val q = graft.streaming.Streams.statsSink(
        input.toDF().toDF("grp", "amount", "user"), target, spec)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = StatsMaintain.partials(batch((b1 ++ b2): _*), spec)
    def canon(df: DataFrame) = df
      .select(col("grp"), col("n"), col("sum_amount"),
        concat_ws(",", col("hll_user")).as("v"),
        concat_ws(",", col("hist_amount")).as("h"))
      .collect().map(_.toSeq).toSet
    assert(canon(spark.read.parquet(target)) == canon(oneShot))
    assert(StatsMaintain.appliedBatches(spark, target).nonEmpty)
  }

  test("retract: exactly reverses folded contributions; zeroed groups vanish; over-retraction and max-fold specs refuse; ledger replay no-ops") {
    val rSpec = Spec(keys = Seq("grp"), sums = Seq("amount"),
      hists = Seq("amount"))
    val path = tmpDir()
    StatsMaintain.maintain(spark, path, batch(b1: _*), rSpec)
    StatsMaintain.maintain(spark, path, batch(b2: _*), rSpec)

    // forget u1's rows (one in 'a', one in 'b') — the snapshot must be
    // BIT-IDENTICAL to never having folded them
    val victims = Seq(("a", 10L, "u1"), ("b", 5L, "u1"))
    val s = StatsMaintain.retract(spark, path, batch(victims: _*), rSpec,
      deliveredAtMostOnce = true)
    assert(s.victimRows == 2 && s.groupsDropped == 0, s"$s")
    val expectPath = tmpDir()
    StatsMaintain.maintain(spark, expectPath,
      batch((b1 ++ b2).filterNot(victims.contains): _*), rSpec)
    assert(snap(path).collect().map(_.toString).sorted.toSeq ==
      snap(expectPath).collect().map(_.toString).sorted.toSeq,
      "retraction must equal never-folded, bit for bit")

    // retract ALL of c's rows: the group row must vanish
    val s2 = StatsMaintain.retract(spark, path,
      batch(("c", 7L, "u4")), rSpec, deliveredAtMostOnce = true)
    assert(s2.groupsDropped == 1, s"$s2")
    assert(snap(path).filter(col("grp") === "c").isEmpty)

    // over-retraction and value-mismatch refuse loudly, each through
    // the invariant the folded state CAN check: count below zero;
    // a zeroed group left with nonzero residue (one bogus row
    // retracted against group b's single real row); a histogram bin
    // driven negative (999 lands in a bin group a never populated)
    val e = intercept[IllegalArgumentException] {
      StatsMaintain.retract(spark, path, batch(("b", 999L, "zz"),
        ("b", 999L, "zz")), rSpec, deliveredAtMostOnce = true)
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
    val eResidue = intercept[IllegalArgumentException] {
      StatsMaintain.retract(spark, path, batch(("b", 999L, "zz")), rSpec,
        deliveredAtMostOnce = true)
    }
    assert(eResidue.getMessage.contains("does not match"), eResidue.getMessage)
    val eBin = intercept[IllegalArgumentException] {
      StatsMaintain.retract(spark, path, batch(("a", 999L, "zz")), rSpec,
        deliveredAtMostOnce = true)
    }
    assert(eBin.getMessage.contains("does not match"), eBin.getMessage)

    // an empty victim set is a FREE no-op — and against a path never
    // maintained it must not fabricate a snapshot
    val ghost = tmpDir()
    val s0 = StatsMaintain.retract(spark, ghost, batch(b1: _*).limit(0), rSpec,
      deliveredAtMostOnce = true)
    assert(s0 == StatsMaintain.RetractStats(0L, 0L, 0L))
    assert(!new java.io.File(ghost).exists(),
      "empty retraction must not fabricate a snapshot")

    // a spec carrying max-folds refuses (irreversible by construction)
    val e2 = intercept[IllegalArgumentException] {
      StatsMaintain.retract(spark, path, batch(("a", 20L, "u2")), spec,
        deliveredAtMostOnce = true)
    }
    assert(e2.getMessage.contains("max-folds"), e2.getMessage)

    // ledgered retraction: a replayed id is a no-op (shared id space)
    val before = snap(path).collect().map(_.toString).sorted.toSeq
    assert(StatsMaintain.retractBatch(spark, path,
      batch(("a", 20L, "u2")), rSpec, batchId = 901L).isDefined)
    assert(StatsMaintain.retractBatch(spark, path,
      batch(("a", 20L, "u2")), rSpec, batchId = 901L).isEmpty,
      "replayed retraction must not double-subtract")
    val after = snap(path).collect().map(_.toString).sorted.toSeq
    assert(before != after, "the first ledgered retraction must apply")
  }

  test("bottom-k quantile sample: fold == one-shot bit-identical, eviction exercised; retraction + un-acked retract refuse") {
    val qSpec = Spec(keys = Seq("grp"), quants = Seq("amount"),
      quantKey = Some("rk"), quantK = 4)
    def qb(rows: (String, Long, String)*): DataFrame =
      rows.toSeq.toDF("grp", "amount", "rk")
    // 12 unique row keys in group a (3× the k=4 cap — eviction runs in
    // every batch AND in the snapshot merges), 3 in group b
    val rows = (1 to 12).map(i => ("a", i * 10L, f"a-$i%02d")) ++
      (1 to 3).map(i => ("b", i * 7L, s"b-$i"))
    val (p1, p2, p3) = (rows.take(5), rows.slice(5, 10), rows.drop(10))
    val path = tmpDir()
    StatsMaintain.maintain(spark, path, qb(p1: _*), qSpec)
    StatsMaintain.maintain(spark, path, qb(p2: _*), qSpec)
    StatsMaintain.maintain(spark, path, qb(p3: _*), qSpec)
    val oneShot = StatsMaintain.partials(qb(rows: _*), qSpec)
    def canon(df: DataFrame) = df
      .select(col("grp"), col("n"),
        to_json(col("qs_amount")).as("qs"))
      .collect().map(_.toSeq).toSet
    assert(canon(snap(path)) == canon(oneShot),
      s"maintained sample ${canon(snap(path))} != one-shot ${canon(oneShot)}")
    // the sample really is the bottom-k BY HASH: k rows, every hash ≤
    // the max over group a's full hash set would be circular — pin
    // instead that it is a SUBSET of the group's rows with exactly
    // qKk entries and ascending h
    val aSample = snap(path).filter(col("grp") === "a")
      .select(explode(col("qs_amount")).as("e"))
      .select(col("e.h"), col("e.v")).collect()
    assert(aSample.length == 4)
    assert(aSample.map(_.getLong(0)).toSeq ==
      aSample.map(_.getLong(0)).sorted.toSeq, "ascending by h")
    assert(aSample.map(_.getDouble(1)).forall(v =>
      rows.exists(r => r._1 == "a" && r._2.toDouble == v)),
      "sampled values must come from the group's rows")
    // report: sampled quantiles come back, exact over the sample
    val rep = StatsMaintain.report(snap(path), qSpec)
      .filter(col("grp") === "a")
      .select("p50s_amount", "p99s_amount").collect()(0)
    val vs = aSample.map(_.getDouble(1)).sorted
    def interp(q: Double): Double = {
      val r = q * (vs.length - 1); val lo = math.floor(r).toInt
      val hi = math.min(lo + 1, vs.length - 1)
      vs(lo) + (vs(hi) - vs(lo)) * (r - math.floor(r))
    }
    assert(rep.getDouble(0) == interp(0.5) && rep.getDouble(1) == interp(0.99),
      s"report ${rep} != driver interpolation ${interp(0.5)}/${interp(0.99)}")

    // a min-fold like min/max: retraction refuses
    val eQ = intercept[IllegalArgumentException] {
      StatsMaintain.retract(spark, path, qb(rows.head), qSpec,
        deliveredAtMostOnce = true)
    }
    assert(eQ.getMessage.contains("bottom-k"), eQ.getMessage)
    // quants without a row key refuse at the partials face
    val eK = intercept[IllegalArgumentException] {
      StatsMaintain.partials(qb(rows.head), qSpec.copy(quantKey = None))
    }
    assert(eK.getMessage.contains("quantKey"), eK.getMessage)
    // the unledgered retract face demands the at-most-once ack
    val rPath = tmpDir()
    val rSpec = Spec(keys = Seq("grp"), sums = Seq("amount"))
    StatsMaintain.maintain(spark, rPath, batch(b1: _*), rSpec)
    val eAck = intercept[IllegalArgumentException] {
      StatsMaintain.retract(spark, rPath, batch(b1.head), rSpec,
        deliveredAtMostOnce = false)
    }
    assert(eAck.getMessage.contains("retractBatch"), eAck.getMessage)
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

  test("single-writer lock: a concurrent maintainer fails loudly; a clean run leaves no lock") {
    val path = tmpDir()
    StatsMaintain.maintain(spark, path, batch(b1: _*), spec)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(path + "._graft_lock")
    // a clean publish released its lock
    assert(!fs.exists(lock), "publish left its maintainer lock behind")
    // simulate another maintainer mid-publish: its lock is present —
    // a second maintainer must refuse rather than delete its tmp /
    // interleave the rename swap (the single-writer contract)
    fs.create(lock, false).close()
    val e = intercept[IllegalStateException] {
      StatsMaintain.maintain(spark, path, batch(b2: _*), spec)
    }
    assert(e.getMessage.contains("lock"), e.getMessage)
    // a hard-killed maintainer's stale lock clears via forceUnlock
    // (package-private; the operational path is deleting the file)
    fs.delete(lock, false)
    val s = StatsMaintain.maintain(spark, path, batch(b2: _*), spec)
    assert(s.groups == 3, s"post-unlock maintain broken: $s")
  }
}
