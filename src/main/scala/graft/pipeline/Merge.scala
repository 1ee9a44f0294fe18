package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert/merge into a parquet snapshot — the "apply this batch
  * of changes to the table" operator (SCD-1 semantics: latest version
  * per key wins; optional tombstone column for deletes).
  *
  * The merge itself is ONE window over the union — no join: both sides
  * shuffle once on the key, the per-key winner is picked by
  * (version, source) rank, and ties go to the incoming batch. The
  * result is written to a sibling temp directory and published with
  * two renames: readers see the previous complete snapshot until the
  * publish, then the new one — never a half-written directory. (The
  * instant between the two renames has no directory at the target; a
  * reader there fails fast with not-found rather than reading partial
  * data, and a crash there is repaired by the next upsert, which
  * reinstates the retired snapshot before merging.)
  *
  * Scale path: for a 100 TB table, wrap this with partition pruning —
  * take the update batch's distinct partition values, rewrite ONLY the
  * touched `part=`-directories, and leave the rest of the snapshot in
  * place. The single-snapshot form below is the building block each
  * touched partition runs.
  */
object Merge {

  final case class Stats(
      targetRows: Long, updateRows: Long, resultRows: Long,
      inserted: Long, updated: Long, deleted: Long)

  /** Merge `updates` into the snapshot at `targetPath`.
    *
    * @param keys       primary-key columns (row identity)
    * @param versionCol monotone version/timestamp column; per key the
    *                   highest version wins, updates beating the
    *                   snapshot on equal versions (two update rows for
    *                   the same key and version tie-break by full-row
    *                   hash, so reruns and task retries pick the same
    *                   winner)
    * @param deleteCol  optional boolean column on `updates`: winning
    *                   rows with it true are tombstones — the key is
    *                   dropped from the result (and the column never
    *                   lands in the snapshot). A tombstone for an
    *                   absent key is a no-op.
    */
  def upsert(spark: SparkSession, targetPath: String, updates: DataFrame,
             keys: Seq[String], versionCol: String,
             deleteCol: Option[String] = None): Stats = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val fs = new Path(targetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the single-writer lock spans the whole read-merge-write cycle
    // (not just the swap): a concurrent maintainer publishing between
    // this read and this publish would be silently overwritten
    Snapshot.withMaintainerLock(fs, targetPath) { lease =>
    // crash recovery first (see [[Snapshot]]): skipping it would treat
    // a half-published target as a fresh bootstrap and drop data
    val exists = Snapshot.recoverAndExists(fs, targetPath, lease)

    val del = deleteCol.getOrElse("_graft_delete")
    // one materialization of the caller's plan: it feeds the union AND
    // the updateRows stat, and may be an expensive computation
    val upd = (if (deleteCol.isDefined) updates
               else updates.withColumn(del, lit(false)))
      .withColumn("_graft_src", lit(1))
      .cache()
    // add-column schema evolution: columns NEW in the update batch are
    // added to the snapshot side as typed nulls, so the published
    // snapshot carries the evolved schema (existing rows read null for
    // the new column until an update touches them). The reverse —
    // updates MISSING a snapshot column — stays an error: silently
    // null-filling the update side would erase that column's value on
    // every key the batch touches (SCD-1 winners replace whole rows).
    val updData = updates.drop(deleteCol.toSeq: _*)
    val tgtRaw = if (exists) spark.read.parquet(targetPath)
                 else spark.createDataFrame(
                   spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                   updData.schema)
    // name matching follows the session's resolution semantics: Spark
    // resolves column names per spark.sql.caseSensitive (default
    // case-INSENSITIVE), so a batch column differing only in case is
    // the SAME column, not a new one (treating it as new would produce
    // a duplicate/ambiguous column in the published snapshot)
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def norm(n: String): String =
      if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val updNames = updData.columns.map(norm).toSet
    val tgtNames = tgtRaw.columns.map(norm).toSet
    val missingInUpd = tgtRaw.columns.toSeq.filterNot(c => updNames(norm(c)))
    require(missingInUpd.isEmpty,
      s"merge: update batch is missing snapshot column(s) ${missingInUpd.mkString(", ")}; " +
        "add-column evolution only goes forward")
    val newCols = updData.schema.fields
      .filterNot(f => tgtNames(norm(f.name)))
    val tgt = newCols.foldLeft(tgtRaw) { (df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType))
      }
      .withColumn(del, lit(false))
      .withColumn("_graft_src", lit(0))

    // ONE shuffle on the key: rank picks the winner, the unbounded
    // max() over the same partitioning records whether the key existed
    // in the snapshot (for the stats — no extra exchange, the window
    // partitioning is reused). The full-row hash is the LAST tiebreak:
    // without it, two same-key same-version update rows would be
    // ranked by shuffle arrival order and a rerun could publish a
    // different payload. The hash must include the delete flag — a
    // same-key same-version tombstone vs live row is otherwise
    // hash-equal and the winner would again be arrival order.
    val dataCols = updates.drop(deleteCol.toSeq: _*).columns.toSeq :+ del
    val wRank = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_graft_src").desc,
        xxhash64(dataCols.map(col): _*).asc)
    val wKey = Window.partitionBy(keys.map(col): _*)
    val merged = tgt.unionByName(upd)
      .withColumn("_graft_rn", row_number().over(wRank))
      .withColumn("_graft_had_tgt",
        max(when(col("_graft_src") === 0, 1).otherwise(0)).over(wKey))
      .filter(col("_graft_rn") === 1)
      .cache()

    try {
      val a = merged.groupBy().agg(
        count(lit(1)).as("winners"),
        count(when(!col(del), 1)).as("kept"),
        count(when(col(del) && col("_graft_had_tgt") === 1, 1)).as("deleted"),
        count(when(col("_graft_src") === 1 && !col(del) &&
          col("_graft_had_tgt") === 0, 1)).as("inserted"),
        count(when(col("_graft_src") === 1 && !col(del) &&
          col("_graft_had_tgt") === 1, 1)).as("updated"),
        count(when(col("_graft_had_tgt") === 1, 1)).as("target_keys"))
        .collect()(0)

      val result = merged.filter(!col(del))
        .drop(del, "_graft_src", "_graft_rn", "_graft_had_tgt")

      Snapshot.publish(fs, targetPath, exists, result, lease)

      Stats(
        targetRows = a.getLong(5),
        updateRows = upd.count(),
        resultRows = a.getLong(1),
        inserted = a.getLong(3),
        updated = a.getLong(4),
        deleted = a.getLong(2))
    } finally { merged.unpersist(); upd.unpersist(); () }
    }
  }

  /** Partition-pruned merge into a snapshot laid out as
    * `targetPath/partCol=value/…`: only the partitions the update
    * batch actually touches are read, merged and swapped — the rest of
    * a 100 TB snapshot is never opened; untouched directories stay
    * byte-identical (mtime-pinned in the spec).
    *
    * FUSED, not serial (r11): all touched partitions merge in ONE
    * Spark job — the window partitions by (partCol, keys), so each
    * partition's winners are exactly what its standalone single-window
    * merge would pick — and the result is written partitioned-by-
    * partCol to one sibling tmp tree, then swapped per partition with
    * pure METADATA renames. The first cut ran a full read-merge-publish
    * cycle per touched partition serially; a delta relabeling docs
    * across 16 shards paid 16 driver round-trip cycles (~0.7 s each —
    * measured dominating NearDupIndex.maintain at 14 s for a 500-doc
    * batch), and at 1000 touched partitions of a real table the
    * driver-serial loop IS the wall clock. The fused job keeps the
    * pruning (only touched dirs are read or written) and the per-
    * partition crash contract (each dir swaps through the same
    * `._graft_old` two-rename protocol, repaired by the next cycle's
    * recovery), while the job count stays O(1) in touched partitions.
    *
    * All touched partitions' maintainer locks are held for the whole
    * cycle, acquired in sorted path order (two concurrent fused
    * maintainers with overlapping sets contend in a consistent order
    * — the second fails fast at the first contended lock, the
    * single-writer convention, never deadlocks). A crash mid-swap
    * leaves some partitions published and some retired at
    * `._graft_old`; the next maintain's per-partition recovery
    * reinstates them — same contract as the serial form.
    *
    * Requires every update row to carry its partition value (rows
    * cannot move between partitions in one merge — changing the
    * partition value of a key is a delete in one partition plus an
    * insert in another).
    *
    * `needStats = false` skips the merge-statistics aggregation (one
    * full extra pass over the merged output plus its cache) and
    * returns zeroed [[Stats]] — for maintainer callers that discard
    * them (NearDupIndex's label publish runs one such merge per
    * maintain cycle; the pass was ~1 s of its fixed per-cycle cost).
    *
    * `clusterWrite = true` repartitions the merged output by partCol
    * before the partitioned write: one task — one FILE — per touched
    * partition, instead of (shuffle partitions × dirs) tiny files
    * whose create/commit renames dominate a small merge (measured
    * 3.1 s → sub-second on NearDupIndex's 16-shard label publish).
    * Leave it false when a single partition's merge output is big
    * enough that serializing it through one task costs more than the
    * file churn — the caller knows its distribution; the default
    * preserves write parallelism.
    */
  def upsertPartitioned(spark: SparkSession, targetPath: String,
                        updates: DataFrame, partCol: String,
                        keys: Seq[String], versionCol: String,
                        deleteCol: Option[String] = None,
                        needStats: Boolean = true,
                        clusterWrite: Boolean = false): Stats = {
    // resolve the caller's partCol to the frame's OWN attribute case
    // ONCE (per the session's resolution semantics): the partitioned
    // writer names directories after the ATTRIBUTE, so a caller-cased
    // 'Shard' against a 'shard' column would probe `Shard=…` while the
    // writer wrote `shard=…` — every partition "missing", every swap a
    // fabricated empty snapshot over the real merged output
    val caseSensitiveRes =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def normName(n: String): String =
      if (caseSensitiveRes) n else n.toLowerCase(java.util.Locale.ROOT)
    val partColR = updates.columns.find(c => normName(c) == normName(partCol))
      .getOrElse(throw new IllegalArgumentException(
        s"upsertPartitioned: partition column $partCol not found in " +
          s"update batch columns ${updates.columns.mkString(", ")}"))
    require(!keys.exists(k => normName(k) == normName(partColR)),
      "partition column is implicit per-partition; keys must not repeat it")
    val upd = updates.cache() // feeds the distinct, the union and the count
    try {
      // collect each touched value TWICE: the typed value (re-attached
      // as a literal to the partition reads) and Spark's OWN string
      // form (`cast(string)` — exactly what the partitioned writer
      // stringifies before escaping). Deriving the dir name from
      // v.toString instead would diverge for types whose JVM toString
      // differs from the SQL cast (java.sql.Timestamp renders a
      // trailing ".0" the writer does not) — and a name mismatch here
      // would make the swap below publish a fabricated empty dir over
      // the real merged output
      val touched = upd
        .select(col(partColR), col(partColR).cast("string").as("_str"))
        .distinct().collect().map(r => (r.get(0), r.getString(1)))
      // a null partition value has no `partCol=` directory to live in
      // (and === never matches null, so its rows would silently merge
      // NOWHERE) — reject loudly instead of losing data
      require(!touched.exists(_._1 == null),
        s"upsertPartitioned: update batch has rows with null $partCol")
      if (touched.isEmpty) return Stats(0, 0, 0, 0, 0, 0)
      val fs = new Path(targetPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(targetPath))
      // escape exactly as Spark's partitioned writer does, so values
      // with '/', '=', '%', … produce the directory names partition
      // discovery expects (and the tmp tree's dirs line up 1:1)
      val parts = touched.map { case (v, str) =>
        val dirName = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.escapePathName(str)
        (v, dirName, s"$targetPath/$partColR=$dirName")
      }.sortBy(_._2).toList
      // acquire every touched partition's lock (sorted order), recover
      // each, then run the fused cycle with all leases in hand — the
      // iterative multi-lock, so stack depth never tracks the touched
      // count
      Snapshot.withMaintainerLocks(fs, parts.map(_._3)) { ls =>
        fusedCycle(spark, fs, targetPath, upd, partColR, keys,
          versionCol, deleteCol,
          parts.zip(ls).map { case ((v, dn, p), (lease, exists)) =>
            (v, dn, p, lease, exists)
          }, needStats, clusterWrite)
      }
    } finally { upd.unpersist(); () }
  }

  /** The fused merge-and-swap, with every touched partition's lock
    * held and recovery done ([[upsertPartitioned]]).
    */
  private def fusedCycle(spark: SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         targetPath: String, upd: DataFrame, partCol: String,
                         keys: Seq[String], versionCol: String,
                         deleteCol: Option[String],
                         parts: List[(Any, String, String, Snapshot.Lease, Boolean)],
                         needStats: Boolean, clusterWrite: Boolean)
      : Stats = {
    val del = deleteCol.getOrElse("_graft_delete")
    val updData = upd.drop(deleteCol.toSeq: _*)
    // target side: each existing partition dir read DIRECTLY (no
    // partition discovery — its value re-attaches as a typed literal,
    // sidestepping discovery's int32 narrowing), united into one scan
    // set. The union schema over the touched dirs is inferred in ONE
    // mergeSchema read (needed for the evolution refusal below — the
    // update batch's schema cannot stand in for what the target
    // actually holds); the per-dir reads then carry it EXPLICITLY —
    // a bare spark.read.parquet(dir) costs a schema-inference footer
    // JOB per dir (measured: one ~25 ms driver round trip per touched
    // shard per maintain in the r12 NearDupIndex profile — the serial
    // cost this fused cycle exists to remove). Partitions written
    // before an add-column evolution read null for the newer columns
    // (an explicit schema's missing fields), exactly as their
    // standalone merge would via allowMissingColumns.
    val existingDirs = parts.collect { case (_, _, p, _, true) => p }
    val tgtSchema: Option[org.apache.spark.sql.types.StructType] =
      if (existingDirs.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(existingDirs: _*).schema)
    val tgtFrames = parts.collect { case (v, _, p, _, true) =>
      spark.read.schema(tgtSchema.get).parquet(p)
        .withColumn(partCol, lit(v))
    }
    val tgtRaw = if (tgtFrames.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], updData.schema)
    else tgtFrames.reduce(_.unionByName(_, allowMissingColumns = true))
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def norm(n: String): String =
      if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val updNames = updData.columns.map(norm).toSet
    val tgtNames = tgtRaw.columns.map(norm).toSet
    val missingInUpd = tgtRaw.columns.toSeq.filterNot(c => updNames(norm(c)))
    require(missingInUpd.isEmpty,
      s"merge: update batch is missing snapshot column(s) ${missingInUpd.mkString(", ")}; " +
        "add-column evolution only goes forward")
    val newCols = updData.schema.fields
      .filterNot(f => tgtNames(norm(f.name)))
    val tgt = newCols.foldLeft(tgtRaw) { (df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType))
      }
      .withColumn(del, lit(false))
      .withColumn("_graft_src", lit(0))
    val updTagged = (if (deleteCol.isDefined) upd
                     else upd.withColumn(del, lit(false)))
      .withColumn("_graft_src", lit(1))
    // the per-partition single-window merge, fused: partCol leads the
    // window partitioning, so each partition's winners are picked
    // independently — identical to its standalone merge
    val grp = (partCol +: keys).map(col)
    val dataCols = updData.columns.toSeq :+ del
    val wRank = Window.partitionBy(grp: _*)
      .orderBy(col(versionCol).desc, col("_graft_src").desc,
        xxhash64(dataCols.map(col): _*).asc)
    val wKey = Window.partitionBy(grp: _*)
    val merged0 = tgt.unionByName(updTagged)
      .withColumn("_graft_rn", row_number().over(wRank))
      .withColumn("_graft_had_tgt",
        max(when(col("_graft_src") === 0, 1).otherwise(0)).over(wKey))
      .filter(col("_graft_rn") === 1)
    // without the stats pass the write below is merged's ONLY
    // consumer — caching would just add a materialization job
    val merged = if (needStats) merged0.cache() else merged0
    try {
      val a = if (!needStats) None else Some(merged.groupBy().agg(
        count(lit(1)).as("winners"),
        count(when(!col(del), 1)).as("kept"),
        count(when(col(del) && col("_graft_had_tgt") === 1, 1)).as("deleted"),
        count(when(col("_graft_src") === 1 && !col(del) &&
          col("_graft_had_tgt") === 0, 1)).as("inserted"),
        count(when(col("_graft_src") === 1 && !col(del) &&
          col("_graft_had_tgt") === 1, 1)).as("updated"),
        count(when(col("_graft_had_tgt") === 1, 1)).as("target_keys"))
        .collect()(0))
      val result = merged.filter(!col(del))
        .drop(del, "_graft_src", "_graft_rn", "_graft_had_tgt")
      // ONE write job produces every partition's new contents under a
      // sibling tmp tree (a stray one is crash garbage — clear it).
      // No repartition-by-partCol here (contrast the append-mode index
      // stores): every dir is swap-REPLACED so files never accumulate
      // across cycles, and one-task-per-partition would serialize a
      // large partition's merge output through a single task
      val tmpRoot = new Path(targetPath + "._graft_ptmp")
      if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true)
      (if (clusterWrite) result.repartition(col(partCol)) else result)
        .write.partitionBy(partCol)
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpRoot.toString)
      // A partition whose rows were ALL tombstoned gets no tmp dir
      // from the writer — publish a ZERO-ROW parquet snapshot (with
      // schema: a bare _SUCCESS dir would crash the NEXT merge's
      // spark.read with "unable to infer schema"), matching the serial
      // form, which published the empty frame through Snapshot.publish.
      // The empty snapshot is WRITTEN ONCE and FS-copied per missing
      // partition — per-partition zero-row write JOBS would re-create
      // the serial driver-round-trip cost this fused cycle removes
      // (a retention delta can tombstone hundreds of partitions).
      // partCol filter uses the same resolution semantics as the
      // schema checks above (the column name is the caller's frame's
      // attribute, already case-resolved by upsertPartitioned).
      val missing = parts.filterNot { case (_, dirName, _, _, _) =>
        fs.exists(new Path(s"$tmpRoot/$partCol=$dirName")) }
      if (missing.nonEmpty) {
        val emptySchema = org.apache.spark.sql.types.StructType(
          result.schema.fields.filterNot(f => norm(f.name) == norm(partCol)))
        val emptyDir = new Path(s"$tmpRoot/_graft_empty")
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(emptyDir.toString)
        missing.foreach { case (_, dirName, _, _, _) =>
          org.apache.hadoop.fs.FileUtil.copy(fs, emptyDir, fs,
            new Path(s"$tmpRoot/$partCol=$dirName"), false,
            spark.sparkContext.hadoopConfiguration)
          ()
        }
      }
      // swap each partition in: metadata renames only
      parts.foreach { case (_, dirName, partPath, lease, exists) =>
        Snapshot.publishWritten(fs, partPath, exists,
          new Path(s"$tmpRoot/$partCol=$dirName"), lease)
      }
      fs.delete(tmpRoot, true)
      a match {
        case Some(r) => Stats(
          targetRows = r.getLong(5),
          updateRows = upd.count(),
          resultRows = r.getLong(1),
          inserted = r.getLong(3),
          updated = r.getLong(4),
          deleted = r.getLong(2))
        case None => Stats(0, 0, 0, 0, 0, 0)
      }
    } finally { if (needStats) merged.unpersist(); () }
  }

  /** Time travel over an SCD-2 snapshot: the rows as they were AT
    * version `v` — every interval with `_valid_from ≤ v` and
    * (`_valid_to` open or `> v`). An interval closed exactly at v is
    * NOT visible at v (the closing change takes effect at its own
    * version — the half-open [from, to) convention [[scd2]] writes).
    * Pure filter + projection: partition/stats pruning applies, no
    * shuffle.
    */
  def asOf(history: DataFrame, v: Column): DataFrame =
    history
      .filter(col("_valid_from") <= v &&
        (col("_valid_to").isNull || col("_valid_to") > v))
      .drop("_valid_to", "_is_current")
      .withColumnRenamed("_valid_from", "_as_of_from")

  /** Temporal (as-of-each-row) join: every fact row joins the
    * dimension state that was current AT ITS OWN version — the
    * history-correct enrichment an `asOf(latest)` join silently gets
    * wrong for late-arriving facts (a January order must see January's
    * customer tier, not today's). Interval semantics match [[asOf]]:
    * half-open [from, to), so a fact at exactly the change version
    * sees the NEW state.
    *
    * Shape: ONE equi-join on the keys (both sides hash-partition; the
    * dimension side is interval rows, typically ≪ facts and
    * AQE-broadcast) followed by the interval filter — never a range
    * join over time. A key's intervals never overlap ([[scd2]]'s
    * construction), so each fact matches AT MOST one row: facts
    * before the key's first interval, during a tombstone gap, or with
    * no key at all are kept with null dimension columns when
    * `keepUnmatched` (the audit-friendly default), dropped otherwise.
    */
  def temporalJoin(facts: DataFrame, history: DataFrame, keys: Seq[String],
                   factVersion: Column,
                   keepUnmatched: Boolean = true): DataFrame = {
    val dim = history
      .withColumnRenamed("_valid_from", "_tj_from")
      .withColumnRenamed("_valid_to", "_tj_to")
      .drop("_is_current")
    val joined = facts.join(dim,
      keys.map(k => facts(k) === dim(k)).reduce(_ && _) &&
        dim("_tj_from") <= factVersion &&
        (dim("_tj_to").isNull || dim("_tj_to") > factVersion),
      if (keepUnmatched) "left" else "inner")
    keys.foldLeft(joined)((df, k) => df.drop(dim(k)))
      .drop("_tj_from", "_tj_to")
  }

  final case class Scd2Stats(
      updateRows: Long, inserted: Long, closed: Long, deleted: Long,
      suppressed: Long, resultRows: Long, currentRows: Long)

  /** SCD-2 (history-keeping) merge: instead of replacing a key's row,
    * each change CLOSES the key's current validity interval and opens
    * a new one — the snapshot answers "what did this row look like at
    * version v" for every v, the dimension-table contract `upsert`'s
    * SCD-1 semantics discard.
    *
    * Snapshot schema = payload columns + `_valid_from` (the version
    * that opened the interval), `_valid_to` (the version that closed
    * it; null while open) and `_is_current`. Update rows carry the
    * payload plus `versionCol` (the effective-from value) and the
    * optional tombstone column.
    *
    * Semantics per key, applied in version order within one merge:
    *  - a row whose payload DIFFERS from the key's latest surviving
    *    state closes that state at its version and opens a new
    *    interval [version, next-change);
    *  - a payload-identical row is SUPPRESSED (idempotence: re-running
    *    yesterday's feed inserts nothing and closes nothing);
    *  - a tombstone closes the open interval and opens none (the key
    *    has no current row until a later update re-inserts it —
    *    which is NOT suppressed even if payload-identical, because
    *    the preceding state is "absent");
    *  - rows at or below the key's HIGH-WATER MARK — the last version
    *    that opened or closed ANY of its intervals, tombstone closes
    *    included — are LATE duplicates and are dropped (history
    *    rewrite is restore-from-snapshot territory, not a merge; the
    *    whole-history mark, not just the open interval, is what makes
    *    a replayed tombstone-ending batch a no-op);
    *  - two update rows with the same key AND version keep one
    *    deterministic winner (full-row-hash order, the upsert rule).
    *
    * Shape: closed history passes through untouched; the key's open
    * row unions with the batch and ONE window partitioning (shared by
    * the dedup rank, the change-suppression lag and the interval-
    * closing lead) does everything — no join anywhere. The publish is
    * the same two-rename swap as [[upsert]], so readers never see a
    * half-written snapshot. At 100 TB, wrap with the
    * [[upsertPartitioned]] pruning device: only partitions the batch
    * touches are rewritten.
    */
  def scd2(spark: SparkSession, targetPath: String, updates: DataFrame,
           keys: Seq[String], versionCol: String,
           deleteCol: Option[String] = None): Scd2Stats = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val metaCols = Seq("_valid_from", "_valid_to", "_is_current")
    require(!updates.columns.exists(metaCols.contains),
      s"scd2: update batch must not carry ${metaCols.mkString("/")}")
    val fs = new Path(targetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // lock the whole read-merge-write cycle — see [[upsert]]
    Snapshot.withMaintainerLock(fs, targetPath) { lease =>
    val exists = Snapshot.recoverAndExists(fs, targetPath, lease)

    val del = deleteCol.getOrElse("_graft_delete")
    val updData = updates.drop(deleteCol.toSeq: _*)
    val payload = updData.columns.filterNot(c =>
      keys.contains(c) || c == versionCol).toSeq
    val upd = (if (deleteCol.isDefined)
                 // a NULL tombstone flag means "not a tombstone" — and
                 // downstream lag(del) must be null ONLY at the
                 // sequence head
                 updates.withColumn(del, coalesce(col(del), lit(false)))
               else updates.withColumn(del, lit(false)))
      .withColumn("_graft_src", lit(1))
      .cache()

    val tgt = if (exists) spark.read.parquet(targetPath)
              else spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                org.apache.spark.sql.types.StructType(
                  updData.schema.fields.filterNot(_.name == versionCol) ++
                    Seq(
                      updData.schema(versionCol).copy(name = "_valid_from"),
                      // open intervals store null: nullable regardless
                      // of the version column's own nullability
                      updData.schema(versionCol)
                        .copy(name = "_valid_to", nullable = true),
                      org.apache.spark.sql.types.StructField(
                        "_is_current", org.apache.spark.sql.types.BooleanType))))
    require(tgt.columns.map(_.toLowerCase).sorted.toSeq ==
      ((keys ++ payload).map(_.toLowerCase) ++ metaCols).sorted,
      s"scd2: snapshot schema ${tgt.columns.toSeq} does not match batch + metadata")

    val hist = tgt.filter(!col("_is_current"))
    val active = tgt.filter(col("_is_current"))
      .select((keys ++ payload).map(col) :+
        col("_valid_from").as(versionCol): _*)
      .withColumn(del, lit(false))
      .withColumn("_graft_src", lit(0))

    // the late gate compares against the key's HIGH-WATER MARK over
    // the WHOLE history — the last version that opened or closed any
    // interval (coalesce(_valid_to, _valid_from) row-wise, max over
    // the key). Gating on only the OPEN interval is a hole: a
    // tombstoned key has no open interval, so a late or replayed row
    // would sail through and re-open closed history (overlapping
    // intervals, duplicated rows on crash replay). The hwm frame is
    // key-count-sized; AQE broadcasts it.
    val hwm = tgt.groupBy(keys.map(col): _*)
      .agg(max(coalesce(col("_valid_to"), col("_valid_from"))).as("_hwm"))

    // deterministic total order WITHOUT hashing: Spark's hash family
    // skips null children, so xxhash64 of a payload cannot tell
    // (null, "x") from ("x", null) — ordering and equality both run
    // on the payload COLUMNS themselves (orderable types; interior
    // nulls compare null-safely in struct/ordering semantics)
    val orderCols = payload.map(c => col(c).asc) :+ col(del).asc
    val wKey = Window.partitionBy(keys.map(col): _*)
    val wSeq = wKey.orderBy(
      col(versionCol).asc +: col("_graft_src").asc +: orderCols: _*)

    val unioned = active.unionByName(upd.select(active.columns.map(col): _*))
      // same-key same-version duplicates: deterministic single winner
      .withColumn("_dup_rn", row_number().over(
        Window.partitionBy((keys :+ versionCol).map(col): _*)
          .orderBy(col("_graft_src").asc +: orderCols: _*)))
      .filter(col("_dup_rn") === 1)
      // late rows: at or below the key's whole-history high-water mark
      .join(hwm, keys, "left")
      .filter(col("_graft_src") === 0 ||
        col("_hwm").isNull || col(versionCol) > col("_hwm"))

    // payload equality for change suppression: null-safe STRUCT
    // compare, not a hash — see orderCols. A keys+version-only
    // dimension (presence tracking) has an empty payload: constant
    // stands in, so every live row is "payload-identical".
    val pay = if (payload.nonEmpty) struct(payload.map(col): _*) else lit(0)
    val staged = unioned
      .withColumn("_prev_pay", lag(pay, 1).over(wSeq))
      .withColumn("_prev_tomb", lag(col(del), 1).over(wSeq))
      // survivors: first-ever live row / re-insert after tombstone /
      // tombstone of a live state / genuine payload change
      .withColumn("_keep",
        (col("_prev_tomb").isNull && !col(del)) ||
          (col("_prev_tomb").isNotNull && col("_prev_tomb") && !col(del)) ||
          (col("_prev_tomb").isNotNull && !col("_prev_tomb") && col(del)) ||
          (col("_prev_tomb").isNotNull && !col("_prev_tomb") && !col(del) &&
            !(pay <=> col("_prev_pay"))))
      .filter(col("_keep"))
      // interval close: next SURVIVOR's version (tombstones close and
      // then vanish); computed over the same key partitioning
      .withColumn("_valid_to", lead(col(versionCol), 1).over(wSeq))
      .cache()

    try {
      // every stat derives from the staged frame + a footer-cheap
      // hist count — no re-read of the published snapshot (the
      // streaming sink pays this per micro-batch)
      val a = staged.groupBy().agg(
        count(when(!col(del) && col("_graft_src") === 1, 1)).as("inserted"),
        count(when(col("_valid_to").isNotNull, 1)).as("closed"),
        count(when(col(del), 1)).as("deleted"),
        count(when(col("_graft_src") === 1, 1)).as("kept_upd"),
        count(when(!col(del), 1)).as("kept_out"),
        count(when(!col(del) && col("_valid_to").isNull, 1)).as("cur"))
        .collect()(0)

      val out = staged.filter(!col(del))
        .select((keys ++ payload).map(col) ++ Seq(
          col(versionCol).as("_valid_from"),
          col("_valid_to"),
          col("_valid_to").isNull.as("_is_current")): _*)
        .unionByName(hist)

      val histRows = hist.count()
      Snapshot.publish(fs, targetPath, exists, out, lease)

      val updRows = upd.count()
      Scd2Stats(
        updateRows = updRows,
        inserted = a.getLong(0),
        closed = a.getLong(1),
        deleted = a.getLong(2),
        suppressed = updRows - a.getLong(3),
        resultRows = histRows + a.getLong(4),
        currentRows = a.getLong(5))
    } finally { staged.unpersist(); upd.unpersist(); () }
    }
  }
}
