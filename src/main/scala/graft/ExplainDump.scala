package graft

/** Batch plan dumper: `runMain graft.ExplainDump <outDir> <q1,q2,...|all>
  * [sfDir]` writes each query's `.explain("formatted")` text to
  * `<outDir>/<name>.txt` in ONE session — the per-round plan-evidence
  * artifact (plans/rNN/<query>_before|after.txt) without paying a JVM
  * per query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names =
      if (args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(',').toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = EngineConf(
      appName = "graft-explain-dump",
      master = Some("local[32]"),
      shufflePartitions = Some(32),
      extraConf = Map("spark.ui.enabled" -> "false")).session()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val plan =
        try SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$n.txt"),
        plan.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
