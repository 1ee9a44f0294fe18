package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** In-library template registry — the Spark-native form of the
  * reference's template API (list: /root/reference/src/api/templates.js:47-81,
  * detail: :88-126). List/describe surface as DataFrames so registry
  * introspection composes with every other graft operator.
  */
final class Templates {
  private val reg = new ConcurrentHashMap[String, Template]()

  def register(t: Template): Template = { reg.put(t.id, t); t }
  def get(id: String): Option[Template] = Option(reg.get(id))
  def remove(id: String): Unit = reg.remove(id)

  /** All templates: (id, name, n_steps). */
  def list(spark: SparkSession): DataFrame = {
    import spark.implicits._
    reg.values.asScala.toSeq.sortBy(_.id)
      .map(t => (t.id, t.name, t.steps.size))
      .toDF("template_id", "name", "n_steps")
  }

  /** One template's steps: (step_idx, description). */
  def describe(spark: SparkSession, id: String): DataFrame = {
    import spark.implicits._
    val t = get(id).getOrElse(
      throw new NoSuchElementException(s"template $id not registered"))
    t.describe.zipWithIndex.map { case (d, i) => (i, d) }
      .toDF("step_idx", "step")
  }
}
