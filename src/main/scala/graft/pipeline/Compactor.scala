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
    // recursive: partitioned layouts nest files under key=value dirs
    val it = fs.listFiles(new Path(inPath), true)
    var nFiles = 0
    var totalBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        nFiles += 1; totalBytes += f.getLen
      }
    }
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val repart = key match {
      case Some(k) => df.repartition(nOut, df(k))
      case None    => df.repartition(nOut)
    }
    repart.write.mode(SaveMode.Overwrite).parquet(outPath)
    var after = 0
    // outPath may live on a DIFFERENT filesystem than inPath (e.g.
    // compacting local/HDFS ingest into object storage) — the handle
    // must come from the output path, not be reused from the input
    val outFs = new Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outIt = outFs.listFiles(new Path(outPath), true)
    while (outIt.hasNext) {
      val f = outIt.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) after += 1
    }
    Stats(nFiles, totalBytes, after)
  }
}
