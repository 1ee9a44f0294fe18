package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** The ONE implementation of the delete-bitmap tombstone log every
  * persisted artifact's RTBF face shares ([[graft.operators.Search]]
  * postings, [[graft.operators.NearDupIndex]] stores,
  * [[graft.operators.IvfIndex]] vectors): an append-only parquet
  * directory of BIGINT ids, read distinct, anti-filtered against by
  * every query/probe path until a compaction reclaims the bytes and
  * clears the log.
  *
  * Crash contract by MONOTONICITY: an interrupted append leaves a
  * prefix of the batch visible — safe, because tombstoning only ever
  * removes, and the mandated re-run completes the set. Callers own
  * locking (each artifact's whole-cycle maintainer lock) and the
  * log's lifecycle (in-tree logs die with their tree's atomic swap —
  * the reclaim-and-clear-cannot-separate property; sibling logs are
  * cleared explicitly after a compaction rewrite).
  */
object TombstoneLog {

  /** The tombstoned ids (one `idCol` BIGINT column), or None when no
    * id was ever tombstoned (no log directory).
    */
  def ids(spark: SparkSession, dir: String,
          idCol: String): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) None
    else {
      // another writer (or a compaction clear) may have changed the
      // dir since the session last listed it
      spark.catalog.refreshByPath(dir)
      Some(spark.read.schema(s"$idCol LONG").parquet(dir).distinct())
    }
  }

  /** Append a batch of ids (the caller holds the artifact lock). */
  def append(spark: SparkSession, dir: String, idCol: String,
             idsToAdd: Seq[Long]): Unit = {
    import spark.implicits._
    idsToAdd.toDF(idCol).select(col(idCol).cast("long"))
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
  }

  /** `df` net of tombstones: a broadcast anti-probe on `idCol` —
    * delete-list-sized, no shuffle of `df`, partition/bucket pruning
    * on `df`'s own filters untouched.
    */
  def anti(spark: SparkSession, dir: String, idCol: String,
           df: DataFrame): DataFrame =
    ids(spark, dir, idCol) match {
      case Some(dead) => df.join(broadcast(dead), Seq(idCol), "left_anti")
      case None => df
    }
}
