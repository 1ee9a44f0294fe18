package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Physical-type drift guard for the events table.
  *
  * The driver-side data generator has already shipped `events.ts` as
  * TIMESTAMP(NANOS) (rounds ≤6) and as plain `timestamp[us]` without
  * the UTC-adjusted flag (round 7 — Spark reads TIMESTAMP_NTZ), each
  * time without notice, and each variant broke a different reader
  * path (vectorized reject / unix_micros analysis error). This spec
  * round-trips the SAME fixture rows through every physical variant
  * `Tables.events` claims to normalize and asserts the q22
  * sessionization output is byte-identical — so the NEXT drift fails
  * one named test instead of a whole round's correctness artifact.
  */
class TablesDriftSpec extends SparkSpec {

  /** Write the sf0.001 events rows as `$tmp/<variant>/events.parquet`
    * with ts in the given physical shape, and return the variant dir.
    */
  private def writeVariant(name: String, shape: DataFrame => DataFrame): String = {
    val base = java.nio.file.Files.createTempDirectory(s"drift-$name").toString
    shape(Tables(spark, sf).events)
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    base
  }

  private def runQ22(dir: String): Seq[String] =
    queries.CoreB.q22(spark, dir).collect().map(_.toString).toSeq

  test("Tables.events normalizes micros-TZ, micros-NTZ, and nanos-as-long to identical q22 output") {
    // 1. micros with timezone — the "native" TimestampType shape
    val tzDir = writeVariant("tz", df => df.withColumn("ts", col("ts").cast(TimestampType)))
    // 2. micros without timezone — Spark writes/reads TIMESTAMP_NTZ
    //    (the round-7 regeneration's shape; value-identical under the
    //    pinned UTC session timezone)
    val ntzDir = writeVariant("ntz", df => df.withColumn("ts", col("ts").cast(TimestampNTZType)))
    // 3. nanos-as-long — what the nanosAsLong=true reader surfaces for
    //    TIMESTAMP(NANOS) files (rounds ≤6). Spark cannot WRITE nanos
    //    parquet, so simulate the read result: a LongType ts column.
    val nanosDir = writeVariant("nanos",
      df => df.withColumn("ts", (unix_micros(col("ts")) * 1000L).cast("long")))

    // sanity: each variant really landed as the type it claims to test
    assert(spark.read.parquet(s"$tzDir/events.parquet").schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType == TimestampNTZType)
    // and the catalog normalizes every one of them back to TimestampType
    Seq(tzDir, ntzDir, nanosDir).foreach { d =>
      assert(Tables(spark, d).events.schema("ts").dataType == TimestampType,
        s"Tables.events failed to normalize the variant at $d")
    }

    val expected = runQ22(tzDir)
    assert(expected.nonEmpty, "fixture produced no sessions — spec is vacuous")
    assert(runQ22(ntzDir) == expected, "NTZ variant diverged from TZ")
    assert(runQ22(nanosDir) == expected, "nanos-as-long variant diverged from TZ")
  }
}
