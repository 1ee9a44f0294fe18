package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON / JSONL source and sink. The reference both consumes JSON (its
  * API responses) and produces JSONL (its audit histories,
  * /root/reference/src/utils/logging.js); Spark reads line-delimited
  * JSON natively and in parallel — one file per task split, schema
  * either supplied or inferred from a sample.
  */
object JsonSource {

  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  def write(df: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}
