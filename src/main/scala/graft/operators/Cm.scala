package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE definition of graft's portable count-min sketch building
  * blocks (Cormode & Muthukrishnan 2005), shared by the
  * oracle-verified batch q49 and the streaming windowed mirror. d=4
  * hash rows × w=1024 buckets; the rows come from the SAME
  * Kirsch–Mitzenmacher double-hashing family as MinHash (one md5
  * digest per token, h_j = (x1 + j·x2) mod w), so every cell and
  * estimate is engine-portable and DuckDB replays it exactly.
  *
  * Cell counts are plain sums — associative, so partial aggregation
  * reduces any corpus to d·w counters per group per task before the
  * one tiny shuffle, and a streaming window's state is d·w longs no
  * matter how many tokens flow through it.
  */
object Cm {

  val D = 4     // hash rows
  val W = 1024  // buckets per row

  /** Expand rows carrying a `tok` column to D rows each with (j,
    * bucket) cell coordinates, preserving every other column.
    */
  def withCells(df: DataFrame): DataFrame = {
    val keep = df.columns.map(col).toSeq
    df.withColumn("_b", TextOps.minhashBases(col("tok")))
      .select(keep :+ col("_b") :+
        explode(array((0 until D).map(lit(_)): _*)).as("j"): _*)
      .withColumn("bucket", (col("_b.x1") + col("j") * col("_b.x2")) % W)
      .drop("_b")
  }
}
