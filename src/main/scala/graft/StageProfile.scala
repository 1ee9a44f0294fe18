package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage CPU/task-time attribution for ONE registered query:
  * `runMain graft.StageProfile <queryName> [sfDir] [reps]` runs the
  * query warm and prints, for the LAST rep, each completed stage's
  * name, task count, executorRunTime and executorCpuTime — the tool
  * that answers "WHICH stage burns the CPU" when the bench's
  * per-query totals move (the r18 spread-inflation triage).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = EngineConf(
      appName = "graft-stage-profile",
      master = Some("local[32]"),
      shufflePartitions = Some(32),
      extraConf = Map("spark.ui.enabled" -> "false")).session()
    spark.sparkContext.setLogLevel("WARN")
    final case class Row(stage: Int, nTasks: Int, runMs: Long,
                         cpuMs: Long, site: String)
    val rows = mutable.ArrayBuffer.empty[Row]
    val listener = new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        rows += Row(i.stageId, i.numTasks,
          i.taskMetrics.executorRunTime,
          i.taskMetrics.executorCpuTime / 1000000L,
          i.details.linesIterator.find(l =>
            l.contains("graft") && !l.contains("StageProfile"))
            .getOrElse(i.name).trim.take(90))
      }
    }
    // optional 4th arg: comma-separated SIBLING queries to run first —
    // the JIT-profile-pollution probe (does running q124/q126/q128
    // through the shared lumaStatsFace call site slow q148?)
    if (args.length > 3)
      args(3).split(',').foreach(s =>
        (1 to 2).foreach(_ => SparkEntry.queries(s)(spark, sfDir).count()))
    val fn = SparkEntry.queries(name)
    (1 until reps).foreach(_ => fn(spark, sfDir).count())
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // drain the bus so every stage of the last rep is in `rows`
    org.apache.spark.graftbench.BenchBridge.snapshot(spark.sparkContext)
    println(f"== $name warm rep: $wall%.3f s ($n rows), stages: ${rows.size}")
    rows.sortBy(-_.cpuMs).foreach { r =>
      println(f"stage ${r.stage}%4d tasks=${r.nTasks}%3d run=${r.runMs}%6d ms cpu=${r.cpuMs}%6d ms  ${r.site}")
    }
    println(f"TOTAL run=${rows.map(_.runMs).sum}%d ms cpu=${rows.map(_.cpuMs).sum}%d ms")
    spark.stop()
  }
}
