package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative import template → DataFrame plan compiler.
  *
  * The reference's template is a hosted typed import spec that a CSV is
  * uploaded into (/root/reference/src/api/templates.js:131-196 —
  * `startWithFile`): the server maps, casts, and validates columns.
  * Spark-native, the template IS the plan: each step compiles to a
  * declarative transformation, so Catalyst sees one tree and can push
  * casts/filters into the scan. Nothing here executes — `compile`
  * returns a lazy DataFrame.
  *
  * Steps are data (a small ADT), so templates can be listed, described,
  * diffed, and persisted by [[Templates]].
  */
sealed trait Step {
  def describe: String
  def apply(df: DataFrame): DataFrame
}

object Step {
  /** Rename a source column. */
  final case class Rename(from: String, to: String) extends Step {
    def describe = s"rename $from -> $to"
    def apply(df: DataFrame): DataFrame = df.withColumnRenamed(from, to)
  }

  /** Cast a column to a Spark SQL type (e.g. "decimal(18,2)"). */
  final case class Cast(column: String, to: String) extends Step {
    def describe = s"cast $column as $to"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, col(column).cast(to))
  }

  /** Trim whitespace. */
  final case class Trim(column: String) extends Step {
    def describe = s"trim $column"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, trim(col(column)))
  }

  /** Uppercase / lowercase normalization. */
  final case class Upper(column: String) extends Step {
    def describe = s"upper $column"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, upper(col(column)))
  }
  final case class Lower(column: String) extends Step {
    def describe = s"lower $column"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, lower(col(column)))
  }

  /** Replace nulls with a default (SQL literal expression). */
  final case class NullDefault(column: String, defaultExpr: String) extends Step {
    def describe = s"null-default $column = $defaultExpr"
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, coalesce(col(column), expr(defaultExpr)))
  }

  /** Derived column from a SQL expression over prior columns. */
  final case class Derive(column: String, sqlExpr: String) extends Step {
    def describe = s"derive $column = $sqlExpr"
    def apply(df: DataFrame): DataFrame = df.withColumn(column, expr(sqlExpr))
  }

  /** Row filter (SQL predicate); rows failing it are dropped. */
  final case class Filter(predicate: String) extends Step {
    def describe = s"filter $predicate"
    def apply(df: DataFrame): DataFrame = df.filter(expr(predicate))
  }

  /** Keep only these columns, in this order (projection/pruning). */
  final case class Select(columns: Seq[String]) extends Step {
    def describe = s"select ${columns.mkString(", ")}"
    def apply(df: DataFrame): DataFrame = df.select(columns.map(col): _*)
  }

  /** Declarative constraint; violations are COUNTED, not dropped —
    * `Template.check` surfaces them, `Filter` drops them.
    */
  final case class Constraint(name: String, predicate: String) extends Step {
    def describe = s"constraint $name: $predicate"
    def apply(df: DataFrame): DataFrame = df // non-transforming
  }
}

final case class Template(
    id: String,
    name: String,
    steps: Seq[Step]) {

  /** Compile the template against an input — pure plan construction. */
  def compile(input: DataFrame): DataFrame =
    steps.foldLeft(input)((df, s) => s(df))

  /** Evaluate all constraints in ONE aggregation pass: name → number
    * of violating rows. Distributed; no per-constraint scan.
    */
  def check(input: DataFrame): Map[String, Long] = {
    val cs = steps.collect { case c: Step.Constraint => c }
    if (cs.isEmpty) return Map.empty
    val compiled = compile(input)
    val aggs: Seq[Column] = cs.map(c =>
      count(when(!expr(c.predicate), 1)).as(c.name))
    val row = compiled.select(aggs: _*).collect()(0)
    cs.map(_.name).zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }.toMap
  }

  def describe: Seq[String] = steps.map(_.describe)
}
