package graft

import java.nio.file.Files

import graft.pipeline.Compactor

class CompactorSpec extends SparkSpec {

  test("compact rewrites many small files into few, preserving rows") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val li = Tables(spark, sf).lineitem
    li.repartition(40).write.parquet(s"$tmp/small")
    val stats = Compactor.compact(spark, s"$tmp/small", s"$tmp/big",
      targetFileBytes = 8L * 1024 * 1024)
    assert(stats.filesBefore == 40)
    assert(stats.filesAfter < 40 && stats.filesAfter >= 1)
    val back = spark.read.parquet(s"$tmp/big")
    assert(back.count() == li.count())
    assert(back.exceptAll(li).count() == 0)
  }

  test("keyed compaction keeps co-location (one key -> one file)") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft-compact2").toString
    val docs = Tables(spark, sf).documents
    docs.repartition(20).write.parquet(s"$tmp/small")
    Compactor.compact(spark, s"$tmp/small", s"$tmp/big",
      targetFileBytes = 4L * 1024 * 1024, key = Some("source"))
    val spread = spark.read.parquet(s"$tmp/big")
      .select(col("source"), input_file_name().as("f"))
      .groupBy("source").agg(countDistinct("f").as("nf"))
      .filter(col("nf") > 1).count()
    assert(spread == 0)
  }
}
