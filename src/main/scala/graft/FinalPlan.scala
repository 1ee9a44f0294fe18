package graft

/** AQE-final plan inspector: `runMain graft.FinalPlan <probe> [sfDir]`
  * executes a probe frame with the noop sink (guide §1.4) and prints
  * the EXECUTED plan — the post-AQE shape (`isFinalPlan=true`), which
  * is where coalesced stage widths and runtime join-strategy changes
  * live. `Explain`/`ExplainDump` print the pre-execution plan, which
  * for the AQE-sized stages (the q96 verify coalescing) says nothing
  * about the widths that actually ran.
  *
  * Probes cover the frames whose registered entry hides the interesting
  * plan behind an eager localCheckpoint (q96's Scoped form) — the same
  * inner frames the plan-shape specs pin.
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = EngineConf(
      appName = "graft-final-plan",
      master = Some("local[32]"),
      shufflePartitions = Some(32),
      extraConf = Map("spark.ui.enabled" -> "false")).session()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents
    val df = probe match {
      case "q96_inner" =>
        graft.operators.SimJoin.joinPairs(docs,
          graft.queries.SimQ.SimShingle, graft.queries.SimQ.SimNum,
          graft.queries.SimQ.SimDen)
      case other => SparkEntry.queries(other)(spark, sfDir)
    }
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
