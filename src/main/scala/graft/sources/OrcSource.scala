package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ORC read/write — the same layout controls as [[ParquetSource]] for
  * shops whose lake standard is ORC (both are Spark built-ins with
  * predicate pushdown, column pruning and partition pruning; graft's
  * operators are format-agnostic, so the sink choice is purely an
  * interop decision).
  */
object OrcSource {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def write(df: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Hive-style partitioned write → partition pruning on read. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite,
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .orc(path)
}
