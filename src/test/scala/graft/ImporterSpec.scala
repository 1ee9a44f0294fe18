package graft

import java.nio.file.{Files, Paths}

import graft.pipeline._
import graft.util.AuditLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.concurrent.duration._

class ImporterSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  private def mkImporter(tmp: String): (Importer, Templates, AuditLog) = {
    val templates = new Templates
    templates.register(Template("t-clean", "clean-import", Seq(
      Step.Trim("name"),
      Step.Upper("name"),
      Step.NullDefault("amount", "0.0"),
      Step.Derive("amount_cents", "CAST(amount * 100 AS BIGINT)"),
      Step.Constraint("positive_amount", "amount >= 0"))))
    val audit = new AuditLog(tmp + "/logs")
    (new Importer(spark, templates, audit), templates, audit)
  }

  test("importCsv: validate -> compile -> async load -> audit, corrupt rows quarantined") {
    val tmp = Files.createTempDirectory("graft-import").toString
    Files.writeString(Paths.get(s"$tmp/in.csv"),
      "id,name,amount\n1,  alpha ,10.5\n2,beta,\nbad-id,gamma,xyz\n4,delta,-3.0\n")
    val (importer, _, audit) = mkImporter(tmp)
    val h = importer.importCsv(s"$tmp/in.csv", schema, "t-clean", s"$tmp/out")
    assert(importer.await(h.jobId, 120.seconds) == JobRunner.Succeeded)

    // validation report: 4 raw rows, 1 corrupt
    assert(h.report.totalRows == 4 && h.report.badRows == 1)
    // constraint evaluated over clean rows: one negative amount
    assert(h.constraintViolations("positive_amount") == 1)

    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 3)
    assert(out.columns.contains("amount_cents"))
    // trim+upper applied; null amount defaulted
    assert(out.filter(col("name") === "ALPHA").count() == 1)
    assert(out.filter(col("id") === 2 && col("amount") === 0.0).count() == 1)
    // quarantine holds the malformed raw line
    val corrupt = spark.read.json(s"$tmp/out_corrupt")
    assert(corrupt.count() == 1)

    // audit trail: upload logged with row counts, job submit+finish
    val up = audit.history(spark, "upload")
    assert(up.filter(col("rows") === "4" && col("badRows") === "1").count() == 1)
    val job = audit.history(spark, "job")
    assert(job.filter(col("jobId") === h.jobId).count() >= 2)
  }

  test("pre-flight: non-.csv extension warns (reference fileHandling.js:25-30), size reported") {
    val tmp = Files.createTempDirectory("graft-import3").toString
    Files.writeString(Paths.get(s"$tmp/in.txt"),
      "id,name,amount\n1,a,1.0\n2,b,2.0\n")
    val (importer, _, audit) = mkImporter(tmp)
    val h = importer.importCsv(s"$tmp/in.txt", schema, "t-clean", s"$tmp/out")
    assert(importer.await(h.jobId, 120.seconds) == JobRunner.Succeeded)
    // the reference warns but proceeds on a non-.csv extension; so do we
    assert(h.report.warnings.exists(_.contains(".csv extension")))
    assert(h.report.totalBytes == Files.size(Paths.get(s"$tmp/in.txt")))
    assert(h.report.totalRows == 2 && h.report.badRows == 0)
    // warning lands in the audit trail too
    assert(audit.history(spark, "upload")
      .filter(col("warnings").contains(".csv extension")).count() == 1)

    // a .csv input produces no warning
    Files.writeString(Paths.get(s"$tmp/in2.csv"), "id,name,amount\n1,a,1.0\n")
    val h2 = importer.importCsv(s"$tmp/in2.csv", schema, "t-clean", s"$tmp/out2")
    assert(importer.await(h2.jobId, 120.seconds) == JobRunner.Succeeded)
    assert(h2.report.warnings.isEmpty)

    // a missing path fails fast, like the reference's success:false
    intercept[java.io.FileNotFoundException] {
      graft.sources.CsvSource.preflight(spark, s"$tmp/nope.csv")
    }
  }

  test("importCsv with unknown template fails fast and audits the error") {
    val tmp = Files.createTempDirectory("graft-import2").toString
    Files.writeString(Paths.get(s"$tmp/in.csv"), "id,name,amount\n1,a,1.0\n")
    val (importer, _, audit) = mkImporter(tmp)
    intercept[NoSuchElementException] {
      importer.importCsv(s"$tmp/in.csv", schema, "nope", s"$tmp/out")
    }
    assert(audit.history(spark, "error")
      .filter(col("error").contains("nope")).count() == 1)
  }
}
