package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Replicates the bench's interleaved rep structure for a query LIST
  * and prints the per-stage attribution of ONE probe query's last
  * rep: `runMain graft.InterleaveProbe <probe> <q1,q2,...> [sfDir]`.
  * The r18 tool for "query X is slow in the bench but fast alone".
  */
object InterleaveProbe {
  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val others = args(1).split(',').toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = EngineConf(
      appName = "graft-interleave-probe",
      master = Some("local[32]"),
      shufflePartitions = Some(32),
      extraConf = Map("spark.ui.enabled" -> "false")).session()
    spark.sparkContext.setLogLevel("WARN")
    final case class Row(stage: Int, nTasks: Int, runMs: Long, cpuMs: Long)
    val rows = mutable.ArrayBuffer.empty[Row]
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = sc.stageInfo
          rows += Row(i.stageId, i.numTasks,
            i.taskMetrics.executorRunTime,
            i.taskMetrics.executorCpuTime / 1000000L)
        }
    })
    // replicate the bench's warmup when asked (the r18 inflation hunt:
    // the probe is clean without it, inflated in the real bench)
    if (sys.env.get("PROBE_WARMUP").contains("1")) {
      val t = Tables(spark, sfDir)
      t.lineitem.count(); t.documents.count(); t.embeddings.count()
      // ONE definition with the bench (r19, the r18 advice): the probe
      // exists to reproduce the bench environment, so it warms exactly
      // Bench.WarmupQueries — it had drifted when the r18 decode warms
      // were added to the bench only
      Bench.WarmupQueries
        .foreach(q => try SparkEntry.queries(q)(spark, sfDir).count()
                      catch { case _: Throwable => () })
    }
    val all = others :+ probe
    for (rep <- 1 to 3; n <- all.sorted) {
      val last = rep == 3 && n == probe
      if (last) {
        org.apache.spark.graftbench.BenchBridge.snapshot(spark.sparkContext)
        record = true
      }
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      if (last) {
        org.apache.spark.graftbench.BenchBridge.snapshot(spark.sparkContext)
        record = false
        println(f"== probe $probe rep3: $sec%.3f s")
        rows.sortBy(-_.cpuMs).take(8).foreach(r =>
          println(f"stage ${r.stage}%5d tasks=${r.nTasks}%3d run=${r.runMs}%6d ms cpu=${r.cpuMs}%6d ms"))
        println(f"TOTAL run=${rows.map(_.runMs).sum} ms cpu=${rows.map(_.cpuMs).sum} ms")
      }
    }
    spark.stop()
  }
}
