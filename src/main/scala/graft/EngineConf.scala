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
      // engine-level policy, set once and visibly here (not as a hidden
      // side effect of a table read): TIMESTAMP(NANOS) parquet columns
      // surface as long, and Tables.events rebuilds TimestampType from
      // them — without this the vectorized reader rejects such files
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // r18 (guide §2.2): the bypass-merge shuffle writer creates one
      // physical file PER REDUCER per map task and then concatenates
      // them — M×R file creates per exchange. Profiled on the widened
      // text kernels: executor threads spent their "CPU" in
      // FileOutputStream.open0/copyFileStreamNIO, ~100 ms per task of
      // pure file churn on 32-reducer exchanges. Below the threshold
      // Spark picks the serialized (Unsafe) writer: ONE spill file +
      // index per map task, no concat. At production scale reducer
      // counts are far above 200, bypass never fires, and this
      // setting is inert — it only removes the small-R pathology.
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      // r18 (guide §2): let AQE coalesce INSIDE cached plans. The
      // iterative operators (LabelProp, Hierarchy) cache each round's
      // label frame; with this off (the Spark default) a cached plan
      // keeps its full static shuffle width, so every round of q53's
      // loop ran 32-to-64-task stages over ~500-row frames — profiled
      // at 10+ s of task time for 2 s of wall, nearly all scheduler /
      // fetch wait. With it on, AQE sizes the cached rounds like any
      // other exchange (tiny here, wide at 100 TB — the setting is
      // size-adaptive by construction, not a local constant).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
    if (extensionsEnabled)
      b = b.config("spark.sql.extensions", classOf[GraftExtensions].getName)
    extraConf.foreach { case (k, v) => b = b.config(k, v) }
    val s = b.getOrCreate()
    // spark.sql.extensions is a STATIC conf: if a session already
    // existed, getOrCreate returns it untouched and the graft_* SQL
    // functions are silently missing — surface that loudly
    if (extensionsEnabled && !s.catalog.functionExists("graft_dot"))
      System.err.println(
        "[graft] WARNING: existing SparkSession without GraftExtensions — " +
          "graft_* SQL functions unavailable (DataFrame API unaffected)")
    s
  }
}
