package graft

import java.nio.file.Files

import graft.pipeline._
import graft.util.{AuditLog, Retry}
import org.apache.spark.sql.functions._

import scala.concurrent.duration._

class PipelineSpec extends SparkSpec {

  private def docs = Tables(spark, sf).documents

  test("Template compiles rename/cast/trim/derive/filter/select into one plan") {
    val t = Template("t1", "docs-clean", Seq(
      Step.Rename("text", "body"),
      Step.Trim("body"),
      Step.Lower("source"),
      Step.Derive("n_words", "size(split(body, '\\\\s+'))"),
      Step.Cast("n_words", "bigint"),
      Step.Filter("n_chars > 0"),
      Step.Select(Seq("doc_id", "body", "source", "n_words"))))
    val out = t.compile(docs)
    assert(out.columns.toSeq == Seq("doc_id", "body", "source", "n_words"))
    assert(out.schema("n_words").dataType.typeName == "long")
    assert(out.count() > 0)
    assert(out.filter(col("source") =!= lower(col("source"))).count() == 0)
  }

  test("Template.check counts constraint violations in one pass, without dropping rows") {
    val t = Template("t2", "docs-check", Seq(
      Step.Constraint("doc_id_nonneg", "doc_id >= 0"),
      Step.Constraint("impossible", "n_chars < 0")))
    val report = t.check(docs)
    assert(report("doc_id_nonneg") == 0)
    assert(report("impossible") == docs.count())
    assert(t.compile(docs).count() == docs.count())
  }

  test("Templates registry lists and describes as DataFrames") {
    val reg = new Templates
    reg.register(Template("a", "first", Seq(Step.Trim("x"))))
    reg.register(Template("b", "second", Seq(Step.Trim("x"), Step.Upper("x"))))
    val listed = reg.list(spark).collect()
    assert(listed.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(listed.map(_.getInt(2)).toSeq == Seq(1, 2))
    val desc = reg.describe(spark, "b").collect()
    assert(desc.length == 2 && desc(1).getString(1).contains("upper"))
    intercept[NoSuchElementException](reg.describe(spark, "zzz"))
  }

  test("JobRunner: submit → running → succeeded, with audit trail") {
    val dir = Files.createTempDirectory("graft-audit").toString
    val audit = new AuditLog(dir)
    val runner = new JobRunner(spark, Some(audit))
    val out = Files.createTempDirectory("graft-job-out").toString
    val id = runner.submit("count-docs") { s =>
      Tables(s, sf).documents.groupBy("source").count()
        .write.mode("overwrite").parquet(s"$out/counts")
    }
    assert(runner.await(id, 120.seconds) == JobRunner.Succeeded)
    assert(spark.read.parquet(s"$out/counts").count() > 0)
    val hist = audit.history(spark, "job")
    assert(hist.filter(col("jobId") === id && col("action") === "submit").count() == 1)
    assert(hist.filter(col("jobId") === id && col("action") === "finish").count() == 1)
  }

  test("JobRunner: failing job reports Failed with error message") {
    val runner = new JobRunner(spark)
    val id = runner.submit("boom") { s =>
      s.read.parquet("/nonexistent/definitely-missing").count(); ()
    }
    assert(runner.await(id, 120.seconds) == JobRunner.Failed)
    assert(runner.info(id).error.nonEmpty)
  }

  test("JobRunner: cancel interrupts a running job group") {
    val runner = new JobRunner(spark)
    val id = runner.submit("slow") { s =>
      import s.implicits._
      // worst case (cancel misses entirely) is ~50 s per task, not
      // minutes — a miss must fail THIS test, not starve the next ones
      s.range(0, 200000, 1, 8)
        .map { i => Thread.sleep(2); i }.count(); ()
    }
    // wait until the job actually starts running, then cancel
    var waited = 0
    while (runner.status(id) == JobRunner.Pending && waited < 200) {
      Thread.sleep(25); waited += 1
    }
    Thread.sleep(200)
    runner.cancel(id)
    val fin = runner.await(id, 120.seconds)
    assert(fin == JobRunner.Cancelled, s"expected Cancelled, got $fin")
  }

  test("JobRunner: cancel of unknown/finished jobs is a no-op; prune drops terminal entries and flags") {
    val runner = new JobRunner(spark)
    // unknown id: must not leave a pre-cancel flag behind
    runner.cancel("job-does-not-exist")
    assert(!runner.isCancelled("job-does-not-exist"))
    val id = runner.submit("quick")(_.range(10).count())
    assert(runner.await(id, 120.seconds) == JobRunner.Succeeded)
    // finished: cancel is a no-op, status stays Succeeded
    runner.cancel(id)
    assert(runner.status(id) == JobRunner.Succeeded && !runner.isCancelled(id))
    // prune with retain 0 drops the terminal entry
    assert(runner.prune(retainMs = -1) == 1)
    intercept[NoSuchElementException](runner.status(id))
  }

  test("Retry backs off and eventually succeeds / rethrows") {
    var calls = 0
    val got = Retry(Retry.Policy(attempts = 3, firstBackoff = 1.milli)) {
      calls += 1
      if (calls < 3) sys.error("transient")
      42
    }
    assert(got == 42 && calls == 3)
    var calls2 = 0
    intercept[RuntimeException] {
      Retry(Retry.Policy(attempts = 2, firstBackoff = 1.milli)) {
        calls2 += 1; sys.error("always")
      }
    }
    assert(calls2 == 2)
  }

  test("AuditLog appends JSONL readable as a DataFrame, escaping control chars") {
    val dir = Files.createTempDirectory("graft-audit2").toString
    val audit = new AuditLog(dir)
    audit.logUpload("fileName" -> "a.csv", "status" -> "success")
    audit.logUpload("fileName" -> "b.csv", "status" -> "error",
      "error" -> "line1\nline2\t\"quoted\"")
    val hist = audit.history(spark, "upload")
    assert(hist.count() == 2)
    assert(hist.filter(col("fileName") === "b.csv")
      .select("error").collect()(0).getString(0) == "line1\nline2\t\"quoted\"")
    assert(hist.schema.fieldNames.contains("timestamp"))
  }
}
