package graft.pipeline

import graft.sources.{CsvSource, ParquetSource}
import graft.util.{AuditLog, Retry}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference tool's headline flow, end to end
  * (/root/reference/import.js `upload` command: validate the CSV →
  * upload into a template → get a job id → check status / cancel,
  * with every step audited). Spark-native, the same flow is:
  * distributed-validated CSV scan → template-compiled DataFrame plan →
  * async write job with status/cancel → JSONL audit trail — except the
  * transform+load that the reference delegates to a hosted service
  * runs here, on the cluster, at whatever scale the input has.
  */
final class Importer(
    spark: SparkSession,
    templates: Templates,
    audit: AuditLog,
    retry: Retry.Policy = Retry.Policy()) {

  private val runner = new JobRunner(spark, Some(audit))

  final case class ImportHandle(
      jobId: String,
      report: CsvSource.Validation,
      constraintViolations: Map[String, Long])

  /** Import a CSV into a registered template: validate, compile, and
    * submit the load as a cancellable async job writing parquet at
    * `outPath`. Corrupt rows are quarantined next to the output
    * (`<outPath>_corrupt`) rather than failing the load — the
    * validation report says how many. The write itself goes through
    * Retry (transient storage failures), mirroring the reference's
    * fetchWithRetry around its upload.
    */
  def importCsv(csvPath: String, schema: StructType, templateId: String,
                outPath: String): ImportHandle = {
    val template = templates.get(templateId).getOrElse {
      audit.logError("action" -> "import", "file" -> csvPath,
        "error" -> s"unknown template $templateId")
      throw new NoSuchElementException(s"template $templateId not registered")
    }
    val loaded = CsvSource.read(spark, csvPath, schema)
    try {
      audit.logUpload(
        "file" -> csvPath, "templateId" -> templateId,
        "rows" -> loaded.report.totalRows.toString,
        "badRows" -> loaded.report.badRows.toString,
        "bytes" -> loaded.report.totalBytes.toString,
        "warnings" -> loaded.report.warnings.mkString("; "))
      val compiled = template.compile(loaded.data)
      val violations = template.check(loaded.data)
      val jobId = runner.submitWithId(s"import:$csvPath") { (_, id) =>
        // a deliberately-cancelled write must not be retried to
        // completion behind the caller's back
        try Retry(retry,
          onRetry = (attempt, e) =>
            audit.logError("action" -> "import-write",
              "attempt" -> attempt.toString,
              "error" -> String.valueOf(e.getMessage)),
          retryIf = _ => !runner.isCancelled(id)) {
          if (loaded.report.badRows > 0)
            loaded.corrupt.write.mode(SaveMode.Overwrite)
              .json(outPath + "_corrupt")
          ParquetSource.write(compiled, outPath)
        } finally loaded.release()
      }
      ImportHandle(jobId, loaded.report, violations)
    } catch {
      // compile/check failed before the job owned the cache: release
      // here or the cached scan leaks with no handle to free it
      case e: Throwable => loaded.release(); throw e
    }
  }

  def status(jobId: String): JobRunner.Status = runner.status(jobId)
  def cancel(jobId: String): Unit = runner.cancel(jobId)
  def await(jobId: String,
            timeout: scala.concurrent.duration.Duration =
              scala.concurrent.duration.Duration.Inf): JobRunner.Status =
    runner.await(jobId, timeout)
}
