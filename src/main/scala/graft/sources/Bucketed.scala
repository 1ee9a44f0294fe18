package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table write/read path: the persistent co-location layout
  * for keys that are joined or aggregated REPEATEDLY.
  *
  * A shuffle join on a 100 TB fact table pays a full exchange of both
  * sides every query. Writing the table bucketed by the join key
  * (hash(key) mod n buckets, recorded in the session catalog) lets
  * every later equi-join or aggregation on that key run with NO
  * exchange at all — the scan itself reports hash partitioning. The
  * write costs one shuffle, once, instead of one per downstream query.
  */
object Bucketed {

  /** Write `df` as a bucketed (and bucket-sorted) managed table. */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Join two tables bucketed on the same key with the same bucket
    * count — planner produces a shuffle-free sort-merge join.
    */
  def join(spark: SparkSession, left: String, right: String,
           key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
