package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file read/write — the remaining interchange format
  * ([[ParquetSource]]/[[OrcSource]]/[[CsvSource]]/[[JsonSource]] cover
  * the rest). Spark ships the Avro LIBRARY but not the `avro` data
  * source module, so this is a real reader in the repo's per-file
  * kernel discipline (the [[WarcSource]] shape): `binaryFile` plans
  * one row per `.avro` file and packs files into tasks by size, the
  * executor kernel walks the container blocks with `DataFileReader`
  * (sync-marker framing, deflate/null codecs — whatever the writer
  * used, the container layer handles), and rows decode straight to
  * the schema the DRIVER read once from the first file's header
  * (container files carry their schema; reading one header costs a
  * few hundred bytes, not a scan).
  *
  * Type profile (both directions): boolean, int, long, float, double,
  * string, bytes, timestamp (the standard `timestamp-micros` logical
  * type on long) and date (`date` on int), arrays of those, and
  * nullable unions `[null, T]` — the interchange subset every graft
  * table needs (embeddings' `array<float>` and events' `ts`
  * included). Nested records/maps/enums fence loudly at
  * schema-translation time rather than mis-decoding. Files whose
  * schema differs from the first file's fence per-file (an
  * unreadable container yields no rows, the WARC archive discipline —
  * never a half-decoded frame).
  *
  * The writer mirrors [[OrcSource]]'s surface: a distributed write of
  * one container file per partition into a temp dir, atomically
  * swapped over the target (the Snapshot publish convention), plus a
  * `_SUCCESS` marker — readable back by this reader, Avro tooling,
  * or spark-avro where that module exists.
  */
object AvroSource {

  // ---------------------------------------------------------------
  // Schema translation
  // ---------------------------------------------------------------

  /** Spark → Avro schema (record of the profile's field types). */
  private[graft] def toAvroSchema(schema: StructType, name: String): Schema = {
    def fieldType(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType => // the standard interchange encoding
        org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case DateType =>
        org.apache.avro.LogicalTypes.date()
          .addToSchema(Schema.create(Schema.Type.INT))
      case ArrayType(et, containsNull) =>
        // Spark's default array is null-tolerant; dropping that here
        // would make a null ELEMENT a mid-partition task death at
        // write time instead of a representable value
        val e = fieldType(et)
        Schema.createArray(
          if (containsNull)
            Schema.createUnion(Schema.create(Schema.Type.NULL), e)
          else e)
      case other => throw new IllegalArgumentException(
        s"AvroSource profile does not carry $other — " +
          "cast to a supported interchange type first")
    }
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    val done = schema.fields.foldLeft(fields) { (acc, f) =>
      val base = fieldType(f.dataType)
      if (f.nullable)
        acc.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else acc.name(f.name).`type`(base).noDefault()
    }
    done.endRecord()
  }

  /** Avro → Spark schema for the same profile. */
  private[graft] def toSparkSchema(schema: Schema): StructType = {
    def dataType(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT =>
        (if (s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Date])
          DateType
        else IntegerType, false)
      case Schema.Type.LONG =>
        (if (s.getLogicalType
            .isInstanceOf[org.apache.avro.LogicalTypes.TimestampMicros])
          TimestampType
        else LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case Schema.Type.ARRAY =>
        val (et, en) = dataType(s.getElementType)
        (ArrayType(et, containsNull = en), false)
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        if (branches.size != 1) throw new IllegalArgumentException(
          s"AvroSource profile carries only [null, T] unions, got $s")
        (dataType(branches.head)._1, true)
      case other => throw new IllegalArgumentException(
        s"AvroSource profile does not carry Avro $other")
    }
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = dataType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def fromAvroValue(v: Any, s: Schema): Any = {
    val t = nonNull(s)
    v match {
      case null => null
      case u: org.apache.avro.util.Utf8 => u.toString
      case str: String => str
      case bb: java.nio.ByteBuffer =>
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case l: java.lang.Long if t.getLogicalType
          .isInstanceOf[org.apache.avro.LogicalTypes.TimestampMicros] =>
        // micros → java.sql.Timestamp, negative-safe floor division
        val micros = l.longValue()
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      case i: java.lang.Integer if t.getLogicalType
          .isInstanceOf[org.apache.avro.LogicalTypes.Date] =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
      case l: java.util.List[_] =>
        l.asScala.toSeq.map(x => fromAvroValue(x, t.getElementType))
      case other => other // primitives pass through boxed
    }
  }

  private def toAvroValue(v: Any, s: Schema): Any = {
    val target = nonNull(s)
    v match {
      case null => null
      case str: String => str
      case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
      case ts: java.sql.Timestamp => // → timestamp-micros
        val inst = ts.toInstant
        Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
          inst.getNano / 1000L)
      case inst: java.time.Instant => // java8 datetime API sessions
        Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
          inst.getNano / 1000L)
      case d: java.sql.Date => // → date (epoch days)
        d.toLocalDate.toEpochDay.toInt
      case ld: java.time.LocalDate => // java8 datetime API sessions
        ld.toEpochDay.toInt
      case seq: scala.collection.Seq[_] =>
        seq.map(x => toAvroValue(x, target.getElementType)).asJava
      case other => other
    }
  }

  // ---------------------------------------------------------------
  // Read
  // ---------------------------------------------------------------

  /** The Avro schema of the first `.avro` file under `path` — a
    * header-only driver read (the container carries its schema).
    */
  private def peekSchema(spark: SparkSession, path: String): Schema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var schema: Schema = null
    var sawAny = false
    // first READABLE header wins — a corrupt container that happens to
    // sort first must not fail the whole read (it fences per-file in
    // the data pass like any other damaged sibling)
    while (schema == null && it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".avro")) {
        sawAny = true
        try {
          val in = fs.open(f.getPath)
          try {
            val stream = new org.apache.avro.file.DataFileStream(
              in, new GenericDatumReader[GenericRecord]())
            try schema = stream.getSchema finally stream.close()
          } finally scala.util.Try(in.close())
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    require(sawAny, s"no .avro files under $path")
    require(schema != null, s"no readable .avro container under $path")
    schema
  }

  /** All rows of every `.avro` container file under `path`
    * (recursive). One task per file-pack (the binaryFile planner);
    * a corrupt container or one whose schema drifted from the first
    * file's yields no rows (per-file fence) rather than a task death.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = peekSchema(spark, path)
    val sparkSchema = toSparkSchema(avroSchema)
    val schemaJson = avroSchema.toString // Schema is not serializable-stable; ship JSON
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select("content")
    val rows = bin.rdd.flatMap { r =>
      val bytes = r.getAs[Array[Byte]](0)
      val expected = new Schema.Parser().parse(schemaJson)
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        val reader = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord](expected))
        try {
          val fields = expected.getFields.asScala.toSeq
          while (reader.hasNext) {
            val rec = reader.next()
            out += Row.fromSeq(fields.map(f =>
              fromAvroValue(rec.get(f.pos()), f.schema())))
          }
        } finally reader.close()
      } catch {
        case scala.util.control.NonFatal(_) => out.clear() // fenced file
      }
      out
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  // ---------------------------------------------------------------
  // Write
  // ---------------------------------------------------------------

  /** Distributed write: one container file per partition into a temp
    * sibling, atomically swapped over `path` (delete-then-rename, the
    * Snapshot convention), `_SUCCESS` last. Deflate-coded blocks.
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val avroSchema = toAvroSchema(schema, "GraftRecord")
    val schemaJson = avroSchema.toString
    val confS = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val tmp = path + "._graft_avro_tmp"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp))
    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        // task-commit protocol: write under an attempt-unique
        // IN-PROGRESS name (invisible to the reader's *.avro glob),
        // then rename to the DETERMINISTIC per-partition name — a
        // retried or speculative duplicate attempt that loses the
        // rename deletes its own file, so exactly one complete
        // container per partition ever publishes (raw foreachPartition
        // has no Spark committer; without this, two completed attempts
        // of one partition would BOTH swap in and read() would return
        // the partition's rows twice)
        val inProgress = new org.apache.hadoop.fs.Path(
          tmp, f"part-$pid%05d-$attempt.inprogress")
        val target = new org.apache.hadoop.fs.Path(
          tmp, f"part-$pid%05d.avro")
        val pfs = inProgress.getFileSystem(confS.value)
        val sch = new Schema.Parser().parse(schemaJson)
        val fieldSchemas = sch.getFields.asScala.toSeq.map(_.schema())
        val out = pfs.create(inProgress, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](sch))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        writer.create(sch, out)
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(sch)
            var i = 0
            while (i < fieldSchemas.length) {
              rec.put(i, toAvroValue(row.get(i), fieldSchemas(i)))
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close() // closes the stream too
        if (!pfs.rename(inProgress, target)) {
          // another attempt of this partition already published — the
          // content is deterministic per partition, so drop ours
          pfs.delete(inProgress, false)
          ()
        }
      }
    }
    // atomic-ish publish: retire the old tree, swap the new one in
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"AvroSource.write: rename $tmp -> $path failed")
    fs.create(new org.apache.hadoop.fs.Path(dst, "_SUCCESS"), true).close()
  }
}
