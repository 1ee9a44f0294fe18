package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction. High-rate ingest (one `Importer` run or one
  * streaming micro-batch per arrival) accumulates thousands of tiny
  * parquet files; at 100 TB the file-listing and per-file open costs
  * come to dominate scans. Compaction rewrites a directory into files
  * near a target size — sized from the ACTUAL on-disk bytes, not a
  * row-count guess, so the result is right for wide and narrow tables
  * alike.
  */
object Compactor {

  final case class Stats(
      filesBefore: Int, bytes: Long, filesAfter: Int)

  /** Rewrite `inPath` into `outPath` with files of ~`targetFileBytes`.
    * Uses a round-robin repartition (no key): compaction must not
    * reorder semantics, only layout. To preserve co-location, compact
    * with `key` set — rows repartition by the key instead.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              key: Option[String] = None): Stats = {
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(inPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val repart = key match {
      case Some(k) => df.repartition(nOut, df(k))
      case None    => df.repartition(nOut)
    }
    repart.write.mode(SaveMode.Overwrite).parquet(outPath)
    val after = fs.listStatus(new Path(outPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    Stats(files.length, totalBytes, after)
  }
}
