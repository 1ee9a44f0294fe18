package graft.util

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSONL audit histories, the Spark-native form of the reference's
  * logging module (/root/reference/src/utils/logging.js: upload-history
  * / job-history / api-history / error JSONL files, one JSON object per
  * line with an ISO timestamp prepended).
  *
  * Events append driver-side (tiny, sequential) to `dir` on the
  * DRIVER's filesystem; `history()` reads it back through
  * `spark.read.json` with an explicit `file:` scheme. On a real
  * cluster, point `dir` at storage the executors share (NFS mount,
  * fuse-mounted object store) — with driver-local paths, history()
  * works in local mode only.
  */
final class AuditLog(dir: String) {

  import AuditLog._

  Files.createDirectories(Paths.get(dir))

  private def path(kind: String): Path = Paths.get(dir, s"$kind-history.jsonl")

  /** Append one event. `fields` values are rendered as JSON strings. */
  def log(kind: String, fields: (String, String)*): Unit = synchronized {
    val entry = (("timestamp" -> Instant.now().toString) +: fields)
      .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ", ", "}\n")
    Files.write(path(kind), entry.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def logUpload(fields: (String, String)*): Unit = log("upload", fields: _*)
  def logJob(fields: (String, String)*): Unit = log("job", fields: _*)
  def logApi(fields: (String, String)*): Unit = log("api", fields: _*)
  def logError(fields: (String, String)*): Unit = log("error", fields: _*)

  /** A history as a DataFrame (schema inferred from the JSONL). */
  def history(spark: SparkSession, kind: String): DataFrame = {
    val p = path(kind)
    require(Files.exists(p), s"no $kind history at $p")
    // explicit scheme: a bare path would resolve against fs.defaultFS
    // (HDFS/S3 on a cluster), not the filesystem the log was written to
    spark.read.json(p.toUri.toString)
  }
}

object AuditLog {
  /** Minimal JSON string escaping (quote, backslash, control chars). */
  private[graft] def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
