package graft

/** Plan/timing inspector for one registered query:
  * `runMain graft.Explain <queryName> [sfDir] [reps]` prints the
  * formatted physical plan (pushdown, exchanges, codegen spans) and
  * wall-clock for `reps` repeat runs — the .explain feedback loop the
  * scale guidelines call for, kept as a first-class tool.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = EngineConf(
      appName = "graft-explain",
      master = Some("local[32]"),
      shufflePartitions = Some(32),
      extraConf = Map("spark.ui.enabled" -> "false")).session()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
