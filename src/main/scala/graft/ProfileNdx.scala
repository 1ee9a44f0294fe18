package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Scratch profiler: Spark-job census of one NearDupIndex maintain
  * cycle at sf0.1 (the r12 verdict's ask #5 — where do ~10 s of fixed
  * per-cycle overhead go). Prints one line per job with duration and
  * description.
  */
object ProfileNdx {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = EngineConf(
      appName = "graft-profile-ndx",
      master = Some("local[32]"),
      shufflePartitions = Some(32),
      extraConf = Map("spark.ui.enabled" -> "false")).session()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (record) starts.put(js.jobId, (js.time,
          s"${js.stageInfos.size} stages | " +
            js.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
              .mkString(" ; ").take(160)))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (record) Option(starts.get(je.jobId)).foreach { case (t0, d) =>
          lines.add(f"job ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.3f s  $d")
        }
    })

    val ipath = "target/profile_ndx"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    val docs = Tables(spark, sfDir).documents
    // 3 cold-index rounds: build over docs ≥ 750, then three warm
    // maintains of disjoint 250-doc deltas — the 2nd/3rd maintains are
    // the JIT-warm numbers comparable across variants
    (1 to 2).foreach { round =>
      rm(new java.io.File(ipath))
      val t0 = System.nanoTime()
      graft.operators.NearDupIndex.build(spark, ipath,
        docs.filter(col("doc_id") >= 750))
      println(f"round $round build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Seq(0L, 250L, 500L).zipWithIndex.foreach { case (lo, i) =>
        record = round == 2 && i == 2
        val t1 = System.nanoTime()
        val st = graft.operators.NearDupIndex.maintain(spark, ipath,
          docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 250))
        val sec = (System.nanoTime() - t1) / 1e9
        record = false
        println(f"round $round maintain $i: $sec%.2f s, stats=$st")
      }
    }
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    lines.asScala.toSeq.sorted.foreach(println)
    spark.stop()
  }
}
