package graft.operators

import graft.functions.expressions.TextExprs
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED, INCREMENTALLY-MAINTAINED near-dup component index — the
  * maintainer form of q53. A 100 TB corpus takes monthly snapshot
  * refreshes of new crawl data; re-running signatures + LSH + label
  * propagation over the WHOLE corpus per refresh is the O(corpus)
  * re-join the maintainer family exists to kill (StatsMaintain for
  * aggregates, ViewMaintain for joins — this is the same contract for
  * near-dup clustering). [[maintain]]'s WORK is delta-sized — only
  * the NEW docs' signatures, the LSH buckets they collide into, and
  * the members of components those collisions reach generate pairs or
  * relabels; unaffected label shards' FILES are never rewritten
  * (mtime-pinned). IO, stated honestly: each maintain runs one
  * column-pruned scan each of the bands store (semi-probed by the
  * batch's bucket keys), the sigs store (probed by matched ids) and
  * the labels tree (row-pruned by touched components) — corpus-
  * RESCAN-free, linear over the stores; at 100 TB, bucket bands/sigs
  * by their probe keys so those scans prune to the probed buckets
  * too.
  *
  * Layout under `path/`:
  *  - `labels/shard=K/…` — (doc_id, component), component = min
  *    reachable doc_id (the q53 convention; docs in NO pair are
  *    absent = singletons). Maintained via
  *    [[graft.pipeline.Merge.upsertPartitioned]], so a maintain
  *    rewrites ONLY shards holding relabeled docs and each shard
  *    swaps atomically (shard = doc_id mod nShards).
  *  - `sigs/`, `bands/` — append-only stores of every indexed doc's
  *    MinHash signature and LSH band rows: what lets a later maintain
  *    find old↔new collisions WITHOUT re-signaturing the corpus. (At
  *    100 TB, bucket the bands store by bkey to prune the collision
  *    probe's IO; the plain layout here costs one column-pruned scan
  *    + semi join per maintain, still corpus-scan-free.)
  *  - `meta/` — (minEst, cap, nShards, ver).
  *
  * Incremental relabeling: verified new pairs ∪ one anchor edge
  * (member → its current component id) per member of every TOUCHED
  * component feed the SAME [[LabelProp]] kernel q53 runs — the
  * subgraph is candidate-sized, never corpus-sized, and since the
  * component id IS its minimum member id (a real node), min-label
  * propagation over anchors + new edges yields exactly the one-shot
  * labels: two old components merged by a bridging new doc both pull
  * their members in and relabel to the global min.
  *
  * Consistency with one-shot q53: identical except at the hot-bucket
  * cap boundary — a bucket whose FULL population exceeds `cap` but
  * whose build-time slice did not contributes its build-slice pairs
  * here and none one-shot. The cap exists to kill degenerate
  * boilerplate buckets (q31 scaladoc); on such buckets both paths
  * agree (always over cap). Maintains evaluate the cap over the
  * bucket's full (resident + new) population.
  *
  * Crash contract (the [[graft.pipeline.Snapshot]] family's): every
  * entry point runs under the whole-cycle [[graft.util.PathLock]]; a
  * crashed maintain MUST be re-run with the SAME batch (the streaming
  * sink's ledger guarantees this) — re-running converges: the probe
  * dedupes store rows and treats the batch's ids as purely new again,
  * the label upsert re-publishes the same winners, and leftover
  * duplicate store rows only bloat (correctness-neutral — the cap and
  * candidates see DISTINCT docs). A HARD KILL can leave lock markers
  * at BOTH levels — `<path>._graft_lock` and, if it died inside the
  * label publish, a per-shard `labels/shard=K._graft_lock` — delete
  * every `*._graft_lock` under the tree after confirming no live
  * writer, then re-run the batch.
  */
object NearDupIndex {

  final case class Stats(newDocs: Long, verifiedPairs: Long,
                         relabeled: Long)

  private def metaPath(path: String) = s"$path/meta"
  private def labelsPath(path: String) = s"$path/labels"
  private def sigsPath(path: String) = s"$path/sigs"
  private def bandsPath(path: String) = s"$path/bands"

  private final case class Meta(minEst: Double, cap: Int, nShards: Int,
                                ver: Long)

  private def readMeta(spark: SparkSession, path: String): Meta = {
    // another process's maintain overwrote meta/ under the lock we
    // now hold — drop any cached listing or this read serves (or
    // trips over) the retired part file
    spark.catalog.refreshByPath(metaPath(path))
    val r = spark.read.parquet(metaPath(path)).head()
    Meta(r.getAs[Double]("minEst"), r.getAs[Int]("cap"),
      r.getAs[Int]("nShards"), r.getAs[Long]("ver"))
  }

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit =
    spark.createDataFrame(Seq((m.minEst, m.cap, m.nShards, m.ver)))
      .toDF("minEst", "cap", "nShards", "ver")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(metaPath(path))

  /** Band rows (band, bkey, doc_id, sig) for a signature frame. */
  private def bandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
      posexplode(TextExprs.bandKeys(col("sig"), NearDup.B, NearDup.R))
        .as(Seq("band", "bkey")))
      .select(col("band"), col("bkey"), col("doc_id"), col("sig"))

  /** Publish `labels` (node, component) into the sharded layout at
    * version `ver` — only shards holding relabeled docs are rewritten.
    */
  private def publishLabels(spark: SparkSession, path: String,
                            labels: DataFrame, nShards: Int,
                            ver: Long): Unit = {
    val upd = labels.select(col("node").as("doc_id"), col("component"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("ver", lit(ver))
    graft.pipeline.Merge.upsertPartitioned(spark, labelsPath(path), upd,
      "shard", Seq("doc_id"), "ver")
    ()
  }

  /** Build the index from the initial corpus snapshot. */
  def build(spark: SparkSession, path: String, docs: DataFrame,
            minEst: Double = 0.5, cap: Int = 100,
            nShards: Int = 16): Stats =
    graft.util.PathLock.withLock(spark, path,
      what = "near-dup index maintainer") {
      val sigs = NearDup.signatures(docs).cache()
      try {
        val pairs = NearDup.scoredCandidates(sigs, minEst, cap)
          .select(col("doc_a"), col("doc_b")).cache()
        val lbl = LabelProp.components(pairs, "doc_a", "doc_b")
        val (nPairs, nLabeled) = try {
          // bootstrap is ONE partitioned write, not a per-shard merge
          // cycle (the target is empty — there is nothing to merge
          // with, and nShards per-shard upserts would cost nShards
          // read-merge-publish rounds for no semantic gain); the
          // resulting shard=K dirs are exactly what maintain's
          // per-shard Merge.upsert then swaps
          lbl.select(col("node").as("doc_id"), col("component"))
            .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
            .withColumn("ver", lit(0L))
            .write.partitionBy("shard")
            .mode(SaveMode.Overwrite).parquet(labelsPath(path))
          (pairs.count(), lbl.count())
        } finally { pairs.unpersist(); () }
        bandRows(sigs).drop("sig")
          .write.mode(SaveMode.Overwrite).parquet(bandsPath(path))
        sigs.write.mode(SaveMode.Overwrite).parquet(sigsPath(path))
        writeMeta(spark, path, Meta(minEst, cap, nShards, ver = 0L))
        Stats(sigs.count(), nPairs, nLabeled)
      } finally { sigs.unpersist(); () }
    }

  /** Fold a batch of NEW docs (ids disjoint from everything indexed —
    * the corpus-snapshot append contract) into the index. Only the
    * batch's signatures, its colliding buckets and the members of
    * components those collisions reach are touched.
    */
  def maintain(spark: SparkSession, path: String, newDocs: DataFrame,
               lockWaitMs: Long = 0L): Stats =
    graft.util.PathLock.withLock(spark, path, lockWaitMs,
      what = "near-dup index maintainer") {
      val meta = readMeta(spark, path)
      val sigsNew = NearDup.signatures(newDocs).cache()
      try {
        val newRows = bandRows(sigsNew).withColumn("is_new", lit(true))
        // resident band rows in COLLIDING buckets only (never the
        // whole store's buckets) + their signatures
        spark.catalog.refreshByPath(bandsPath(path))
        spark.catalog.refreshByPath(sigsPath(path))
        // dedupe + exclude current-batch ids: a crashed attempt's
        // replay leaves duplicate store rows for this batch's docs;
        // without the dedup each duplicated doc contributes n_bands ×
        // n_sigs rows and the hot-bucket cap below counts ROWS — a
        // 40-doc bucket with replay duplicates would read over-cap
        // forever, silently dropping every future pair in it (the cap
        // must see DISTINCT docs, exactly like one-shot banding); the
        // anti join makes a replayed doc purely "new" again
        val newIds = newRows.select(col("doc_id")).distinct()
        val oldRel = spark.read.parquet(bandsPath(path))
          .join(newRows.select(col("band"), col("bkey")).distinct(),
            Seq("band", "bkey"))
          .dropDuplicates("band", "bkey", "doc_id")
          .join(newIds, Seq("doc_id"), "left_anti")
          .join(spark.read.parquet(sigsPath(path))
            .dropDuplicates("doc_id"), Seq("doc_id"))
          .select(col("band"), col("bkey"), col("doc_id"), col("sig"))
          .withColumn("is_new", lit(false))
        // the cap is evaluated over the bucket's FULL population —
        // resident + new — matching what a one-shot build over the
        // grown corpus would see
        val wB = Window.partitionBy(col("band"), col("bkey"))
        val allRows = newRows.unionByName(oldRel)
          .withColumn("bucket_n", count(lit(1)).over(wB))
          .filter(col("bucket_n") <= meta.cap)
          .cache()
        val lhs = allRows.select(col("band"), col("bkey"),
          col("doc_id").as("doc_a"), col("sig").as("sig_a"),
          col("is_new").as("new_a"))
        val rhs = allRows.select(col("band"), col("bkey"),
          col("doc_id").as("doc_b"), col("sig").as("sig_b"),
          col("is_new").as("new_b"))
        // old↔old pairs were generated when the later of the two
        // arrived — only pairs touching a new doc are delta work
        val pairs = lhs.join(rhs, Seq("band", "bkey"))
          .filter(col("doc_a") < col("doc_b") &&
            (col("new_a") || col("new_b")))
          .select(col("doc_a"), col("doc_b"),
            TextExprs.sigAgree(col("sig_a"), col("sig_b"), NearDup.K)
              .as("est_jaccard"))
          .filter(col("est_jaccard") >= meta.minEst)
          .dropDuplicates("doc_a", "doc_b")
          .select(col("doc_a"), col("doc_b"))
          .cache()
        try {
          val nPairs = pairs.count()
          val stats = if (nPairs == 0) Stats(sigsNew.count(), 0L, 0L)
          else {
            // members of every component a verified pair reaches,
            // anchored to their current component id (itself a real
            // node — the min member), so merged components relabel to
            // the global min through the anchors
            val oldLabels = labels(spark, path)
            val touched = pairs.select(col("doc_a").as("doc_id"))
              .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
            val affComps = oldLabels
              .join(touched, Seq("doc_id"), "left_semi")
              .select(col("component")).distinct()
            val anchors = oldLabels
              .join(affComps, Seq("component"), "left_semi")
              .select(col("doc_id").as("doc_a"),
                col("component").as("doc_b"))
            val sub = LabelProp.components(
              pairs.unionByName(anchors), "doc_a", "doc_b").cache()
            try {
              val relabeled = sub.count()
              publishLabels(spark, path, sub, meta.nShards, meta.ver + 1)
              Stats(sigsNew.count(), nPairs, relabeled)
            } finally { sub.unpersist(); () }
          }
          // stores appended AFTER the labels publish: a crash between
          // them leaves labeled-but-not-yet-probe-visible docs, which
          // the mandatory same-batch re-run repairs (see the crash
          // contract above)
          bandRows(sigsNew).drop("sig")
            .write.mode(SaveMode.Append).parquet(bandsPath(path))
          sigsNew.write.mode(SaveMode.Append).parquet(sigsPath(path))
          writeMeta(spark, path, meta.copy(ver = meta.ver + 1))
          stats
        } finally { pairs.unpersist(); allRows.unpersist(); () }
      } finally { sigsNew.unpersist(); () }
    }

  /** Current labels (doc_id, component) — docs in no near-dup pair
    * are absent (singletons). Reads the whole sharded layout; a
    * consumer wanting one doc's component reads only its shard
    * (`labels/shard=<doc_id mod nShards>`).
    */
  def labels(spark: SparkSession, path: String): DataFrame = {
    spark.catalog.refreshByPath(labelsPath(path))
    val p = new org.apache.hadoop.fs.Path(labelsPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // "no labels yet" = no shard directory (a pair-free bootstrap
    // leaves only _SUCCESS markers behind)
    if (!fs.exists(p) ||
        !fs.listStatus(p).exists(_.getPath.getName.startsWith("shard=")))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("component",
            org.apache.spark.sql.types.LongType))))
    else spark.read.parquet(labelsPath(path))
      .select(col("doc_id"), col("component"))
  }
}
