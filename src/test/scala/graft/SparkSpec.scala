package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = EngineConf(
      appName = "graft-test",
      master = Some("local[4]"),
      shufflePartitions = Some(4),
      extraConf = Map(
        "spark.ui.enabled" -> "false",
        "spark.sql.warehouse.dir" ->
          java.nio.file.Files.createTempDirectory("graft-warehouse").toString
      )).session()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
}
