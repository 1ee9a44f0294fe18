package graft

import org.apache.spark.sql.SparkSession

/** Explicit engine configuration — the Spark-native replacement for the
  * reference's env-var config (/root/reference/src/config.js: API
  * endpoint, retry counts, log directory all from `process.env`). A
  * library must not couple to the environment; everything is a
  * constructor argument with scale-aware defaults.
  *
  * The defaults encode the 100 TB posture:
  *  - AQE on (runtime coalescing, skew-join splitting, plan re-opt);
  *  - session timezone pinned to UTC (timestamp semantics must not
  *    depend on cluster locale);
  *  - shuffle partitions left to the CLUSTER default unless the caller
  *    sets `shufflePartitions` — operator code never hard-codes a
  *    partition count.
  */
final case class EngineConf(
    appName: String = "graft",
    master: Option[String] = None,          // None: whatever the cluster provides
    shufflePartitions: Option[Int] = None,  // None: cluster default / AQE
    timezone: String = "UTC",
    adaptiveEnabled: Boolean = true,
    extensionsEnabled: Boolean = true,
    extraConf: Map[String, String] = Map.empty) {

  /** Build (or reuse) a SparkSession configured for this engine. */
  def session(): SparkSession = {
    var b = SparkSession.builder().appName(appName)
    master.foreach(m => b = b.master(m))
    shufflePartitions.foreach(n =>
      b = b.config("spark.sql.shuffle.partitions", n.toString))
    b = b
      .config("spark.sql.session.timeZone", timezone)
      .config("spark.sql.adaptive.enabled", adaptiveEnabled.toString)
      .config("spark.sql.adaptive.skewJoin.enabled", adaptiveEnabled.toString)
    if (extensionsEnabled)
      b = b.config("spark.sql.extensions", classOf[GraftExtensions].getName)
    extraConf.foreach { case (k, v) => b = b.config(k, v) }
    b.getOrCreate()
  }
}
