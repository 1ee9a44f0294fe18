package graft.queries

import graft.Tables
import graft.functions.VecOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2 rows
  * 30–32). The brute-force kernel is the per-bucket baseline; the LSH
  * variants bound the candidate set so the cross product never
  * materializes globally — the shape that scales to 100 TB of vectors.
  */
object VecQ {

  private val Dim = 64        // embedding dimensionality (TESTDATA)
  private val NQueries = 5    // the registered query set: vec_id < 5

  /** q34: brute-force cosine top-k — the exact baseline. The query
    * set is tiny and broadcast; the corpus streams past it once, and
    * per-query top-k comes from one window over (query, sim).
    */
  def q34(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val emb = t.embeddings.select(col("vec_id"), toDoubles(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        round(col("sim"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val q34Sql: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT query_id, vec_id,
      |        list_dot_product(qv, v) /
      |        (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS sim
      |      FROM q CROSS JOIN c WHERE vec_id <> query_id),
      |r AS (SELECT query_id, vec_id,
      |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk,
      |        sim FROM s)
      |SELECT query_id, rnk, vec_id AS neighbor_id, ROUND(sim, 4) AS cos_sim
      |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  /** q35: LSH-bucketed ANN — 16-bit random-hyperplane signatures,
    * banded 4×4; a corpus vector is a candidate iff it shares a band
    * with the query. Only candidates get the exact cosine, so the
    * per-query work is |bucket|, not |corpus|.
    */
  def q35(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val emb = t.embeddings
      .select(col("vec_id"), toDoubles(col("embedding")).as("v"))
      .withColumn("sig", rhpSignature(col("v"), 16, Dim))
    val banded = emb.select(col("vec_id"), col("v"),
      posexplode(sigBands(col("sig"), 4, 4)).as(Seq("band", "bval")))
    val queries = banded.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("band"), col("bval"))
    val cands = banded.join(broadcast(queries), Seq("band", "bval"))
      .filter(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cands
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        round(col("sim"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** q36: embedding near-dup pairs above a cosine threshold, found
    * through LSH band buckets (shuffle-linear, no global cross join).
    * The threshold is a parameter; 0.3 is calibrated to the synthetic
    * corpus (its max pairwise cosine is ~0.48 — a production corpus
    * with real dups would run 0.9+ and the plan is unchanged).
    */
  def q36(s: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val t = Tables(s, dir)
    val emb = t.embeddings
      .select(col("vec_id"), toDoubles(col("embedding")).as("v"))
      .withColumn("sig", rhpSignature(col("v"), 16, Dim))
    val banded = emb.select(col("vec_id"), col("v"),
      posexplode(sigBands(col("sig"), 4, 4)).as(Seq("band", "bval")))
    val lhs = banded.select(col("band"), col("bval"),
      col("vec_id").as("vec_a"), col("v").as("v_a"))
    val rhs = banded.select(col("band"), col("bval"),
      col("vec_id").as("vec_b"), col("v").as("v_b"))
    lhs.join(rhs, Seq("band", "bval"))
      .filter(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("v_a"), col("v_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val entries: Seq[Entry] = Seq(
    Entry("q34_embed_cosine_topk", q34, Some(q34Sql)),
    Entry("q35_ann_lsh", q35, None),
    Entry("q36_embed_dedup", (s, d) => q36(s, d), None),
  )
}
