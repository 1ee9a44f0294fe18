package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-enforced CSV ingest with distributed validation.
  *
  * The reference validates a CSV driver-side before upload — existence,
  * extension, size (/root/reference/src/utils/fileHandling.js:12-46) —
  * then ships the bytes to a hosted loader. Spark-native, validation is
  * part of the scan itself: PERMISSIVE mode captures malformed rows in
  * a `_corrupt_record` column, and the validation report is one
  * aggregation over the data — it works the same on a 10 KB file and a
  * 10 TB directory of files, with no driver-side row loop.
  */
object CsvSource {

  val CorruptCol = "_graft_corrupt"

  final case class Validation(
      totalRows: Long,
      badRows: Long,
      files: Long,
      totalBytes: Long = 0L,
      warnings: Seq[String] = Nil) {
    def ok: Boolean = badRows == 0
  }

  /** Driver-side pre-flight over the input's FILE METADATA — the
    * Spark-native form of the reference's pre-upload checks
    * (/root/reference/src/utils/fileHandling.js:12-38): existence is
    * fatal (like the reference's `success: false`), a non-`.csv`
    * extension is a warning ("proceeding anyway", fileHandling.js:25-30),
    * and the byte size is reported (fileHandling.js:36). Metadata only —
    * no data bytes are read driver-side; row-level validation stays in
    * the distributed scan.
    *
    * @return (totalBytes, warnings)
    */
  def preflight(spark: SparkSession, path: String,
                recursive: Boolean = false): (Long, Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus resolves literal paths AND glob patterns — Spark's
    // reader accepts both, so the pre-flight must too (a bare exists()
    // would reject /data/batch-*.csv that the scan happily reads)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    if (matched.isEmpty)
      throw new java.io.FileNotFoundException(s"File not found: $path")
    var bytes = 0L
    var nonCsv = 0L
    var first: String = null
    def visit(name: String, len: Long): Unit = {
      // hidden/marker files (_SUCCESS, .crc) are invisible to Spark's
      // reader — excluded from BOTH the byte total and the warning
      if (!name.startsWith("_") && !name.startsWith(".")) {
        bytes += len
        if (!name.toLowerCase.endsWith(".csv")) {
          nonCsv += 1
          if (first == null) first = name
        }
      }
    }
    matched.foreach { st =>
      if (st.isDirectory) {
        // list only the depth the scan will consume: Spark's CSV read
        // of a directory is NOT recursive unless recursiveFileLookup
        // is set, so a recursive walk here would count nested files
        // the reader never touches (pass recursive=true to match a
        // read with that option on)
        val it = fs.listFiles(st.getPath, recursive)
        while (it.hasNext) {
          val f = it.next()
          visit(f.getPath.getName, f.getLen)
        }
      } else visit(st.getPath.getName, st.getLen)
    }
    val warnings =
      if (nonCsv > 0)
        Seq(s"$nonCsv input file(s) without a .csv extension (e.g. $first). " +
          "Proceeding anyway, but this might cause issues.")
      else Nil
    (bytes, warnings)
  }

  final case class Loaded(data: DataFrame, corrupt: DataFrame,
                          report: Validation,
                          private val raw: DataFrame) {
    /** Release the scan cache once `data`/`corrupt` have been consumed
      * (written out or materialized). A service looping over imports
      * would otherwise accumulate cached scans.
      *
      * Caveat: Spark caches by logical-plan equality, so two
      * CONCURRENT reads of the same path share one entry and the
      * first release drops it for both (the second read then
      * recomputes — correct, just not single-scan). Serialize imports
      * of the same path if that matters.
      */
    def release(): Unit = { raw.unpersist(); () }
  }

  /** Dialect knobs beyond header/delimiter — quoted fields with
    * embedded delimiters/newlines, escape conventions, null markers,
    * non-UTF8 exports. Defaults match the common RFC-4180-ish CSV.
    *
    * Scale note: `multiline = true` disables line-based file SPLITTING
    * (a quoted newline means record boundaries can't be found without
    * parsing), so each file becomes one task — keep multiline exports
    * in many medium files, never one giant one.
    */
  final case class Dialect(
      quote: String = "\"",
      escape: String = "\\",
      multiline: Boolean = false,
      nullValue: String = "",
      encoding: String = "UTF-8",
      emptyValue: String = "")

  /** Read CSV(s) under `path` with the given schema enforced.
    * Malformed rows (wrong arity, uncastable values) land in `corrupt`
    * with the raw line preserved; clean rows in `data` without the
    * corrupt column. One pass computes the report.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true, delimiter: String = ",",
           dialect: Dialect = Dialect()): Loaded = {
    // pre-flight FIRST: a missing path fails fast here (like the
    // reference's success:false), before any distributed work
    val (bytes, warnings) = preflight(spark, path)
    val withCorrupt = schema.add(CorruptCol, "string")
    val raw = spark.read
      .option("header", header)
      .option("sep", delimiter)
      .option("quote", dialect.quote)
      .option("escape", dialect.escape)
      .option("multiLine", dialect.multiline)
      .option("nullValue", dialect.nullValue)
      .option("emptyValue", dialect.emptyValue)
      .option("encoding", dialect.encoding)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .csv(path)
      // PERMISSIVE corrupt-record capture requires the parsed rows to be
      // materialized before filtering on the corrupt column (Spark
      // requirement: corrupt-column filters cannot be pushed into the
      // parser). A cache here keeps it one scan for data + corrupt + report.
      .cache()
    try {
      val isBad: Column = col(CorruptCol).isNotNull
      val data = raw.filter(!isBad).drop(CorruptCol)
      val corrupt = raw.filter(isBad)
      val Array(total, bad) = raw
        .select(count(lit(1)), count(when(isBad, 1)))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      val files = spark.read.text(path).inputFiles.length.toLong
      Loaded(data, corrupt, Validation(total, bad, files, bytes, warnings), raw)
    } catch {
      // the caller gets no Loaded handle on failure, so the cache must
      // be freed here or it is pinned with no way to release it
      case e: Throwable => raw.unpersist(); throw e
    }
  }

  /** Schema-drift check: columns present in the file header but not in
    * the expected schema, and vice versa (distributed-safe: reads only
    * the header line of each file via a limited scan).
    */
  def drift(spark: SparkSession, path: String, expected: StructType,
            delimiter: String = ","): (Seq[String], Seq[String]) = {
    val actual = spark.read
      .option("header", true).option("sep", delimiter)
      .csv(path).schema.fieldNames.toSeq
    val exp = expected.fieldNames.toSeq
    (actual.diff(exp), exp.diff(actual))
  }
}
