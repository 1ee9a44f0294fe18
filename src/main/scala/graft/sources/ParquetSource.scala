package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet read/write with scale-aware layout controls.
  *
  * The reference's "load" step is an opaque hosted import
  * (/root/reference/src/api/templates.js:131-196); here the load target
  * is columnar files, written with the knobs that matter at 100 TB:
  * partition columns for pruning, optional bucketing-by-repartition so
  * downstream joins on the key are co-located, and no driver-side data
  * movement anywhere.
  */
object ParquetSource {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Plain append/overwrite write. */
  def write(df: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Hive-style partitioned write: one directory level per partition
    * column → partition pruning on read. `maxRecordsPerFile` bounds
    * file size so a skewed partition still splits into parallel tasks.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite,
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Write clustered by a join/agg key: rows with equal keys land in
    * the same file, so a downstream read that aggregates or joins on
    * `key` starts from co-located data (the poor-man's bucketing that
    * needs no metastore).
    */
  def writeClustered(df: DataFrame, path: String, key: String, numFiles: Int,
                     mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(numFiles, df(key))
      .sortWithinPartitions(key)
      .write.mode(mode).parquet(path)
}
