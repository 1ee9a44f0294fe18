package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table catalog over a scale-factor directory of parquet files.
  *
  * The reference tool's data surface is "a file lands, a template
  * describes it, a job loads it" (/root/reference/import.js:86-140);
  * here the catalog is the Spark-native equivalent: named tables over
  * columnar files, read lazily so Catalyst can push filters and prune
  * columns down to the scan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** The events table's `ts` physical type has drifted across data
    * regenerations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long, rebuild micros with integer DIV; a
    * double division would lose precision above 2^53 ns), then plain
    * `timestamp[us]` without the UTC-adjusted flag (which Spark reads
    * as TIMESTAMP_NTZ — useless to `unix_micros`, watermarks, and
    * window(): all require TIMESTAMP). Normalize every variant to
    * TimestampType here so downstream code sees ONE type. The
    * NTZ→TZ cast is value-identical because EngineConf pins the
    * session timezone to UTC.
    *
    * The nanos branch requires `spark.sql.legacy.parquet.nanosAsLong=
    * true` — an EngineConf default; the set below only covers sessions
    * built elsewhere, and is skipped when already satisfied so a
    * shared session isn't mutated gratuitously.
    */
  def events: DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table("events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every table as a temp view so spark.sql works too
    * (events goes through the nanos-aware reader, not the raw scan).
    */
  def registerAll(): Unit = Tables.names.foreach { n =>
    val df = if (n == "events") events else table(n)
    df.createOrReplaceTempView(n)
  }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
