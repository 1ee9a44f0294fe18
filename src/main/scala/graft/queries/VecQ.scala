package graft.queries

import graft.Tables
import graft.functions.VecOps._
import graft.functions.expressions.VecExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2 rows
  * 30–32). The brute-force kernel is the per-bucket baseline; the LSH
  * variants bound the candidate set so the cross product never
  * materializes globally — the shape that scales to 100 TB of vectors.
  *
  * Hot-path kernels are native expressions ([[VecExprs]]): per-vector
  * L2 norms are computed ONCE and carried as a column, so each
  * candidate pair costs a single dot product, and signatures/dots are
  * tight JVM loops rather than interpreted expression trees.
  */
object VecQ {

  private val NQueries = 5    // the registered query set: vec_id < 5
  private val SigBits = 64    // random-hyperplane signature width
  private val Bands = 8       // LSH bands ...
  private val BandBits = 8    // ... of this many bits each (8x8 = 64)

  /** Corpus projection: doubles + precomputed norm (norms are reused
    * across every pair; recomputing per pair doubles the kernel cost).
    */
  private def emb(t: Tables): DataFrame =
    t.embeddings
      .select(col("vec_id"), toDoubles(col("embedding")).as("v"))
      .withColumn("nrm", VecExprs.l2(col("v")))

  /** q34: brute-force cosine top-k — the exact baseline. The query
    * set is tiny and broadcast; the corpus streams past it once, and
    * per-query top-k comes from one window over (query, sim).
    */
  def q34(s: SparkSession, dir: String): DataFrame = {
    val e = emb(Tables(s, dir))
    val queries = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (VecExprs.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
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

  /** Banded signature exploded to (band, bval) bucket keys. */
  private def banded(e: DataFrame): DataFrame =
    e.withColumn("sig", VecExprs.rhpSignature(col("v"), SigBits))
      .select(col("vec_id"), col("v"), col("nrm"),
        posexplode(sigBands(col("sig"), Bands, BandBits)).as(Seq("band", "bval")))

  /** q35: LSH-bucketed ANN — 64-bit random-hyperplane signatures,
    * banded 8×8; a corpus vector is a candidate iff it shares a band
    * bucket with the query. Only candidates get the exact cosine, so
    * per-query work is the bucket volume, not |corpus|.
    */
  def q35(s: SparkSession, dir: String): DataFrame = {
    val b = banded(emb(Tables(s, dir)))
    val queries = b.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("band"), col("bval"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    // sim computed BEFORE the dedup shuffle: a multi-band collision
    // recomputes a cheap dot, but the shuffle carries (id, id, sim)
    // rows instead of 2×64 doubles of vector payload per row
    b.join(broadcast(queries), Seq("band", "bval"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (VecExprs.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        round(col("sim"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** q36: embedding near-dup pairs above a cosine threshold via LSH
    * band buckets — shuffle-linear, pairs generated only inside
    * buckets. 8 bands × 8 bits targets production dedup thresholds
    * (cos ≥ 0.9 ⇒ per-band collision ≈ 0.29, recall ≈ 93%); at the
    * low threshold the synthetic corpus forces, recall is partial by
    * design — banding, not brute force, is what survives 10⁹ vectors.
    * Hot buckets beyond `cap` are dropped (degenerate hyperplane
    * regions would otherwise go quadratic; real dups still collide on
    * their other 7 bands).
    */
  def q36(s: SparkSession, dir: String, threshold: Double = 0.3,
          cap: Int = 2000): DataFrame = {
    val b = banded(emb(Tables(s, dir)))
    val wB = Window.partitionBy(col("band"), col("bval"))
    val capped = b.withColumn("bucket_n", count(lit(1)).over(wB))
      .filter(col("bucket_n") <= cap)
    val lhs = capped.select(col("band"), col("bval"),
      col("vec_id").as("vec_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val rhs = capped.select(col("band"), col("bval"),
      col("vec_id").as("vec_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    // cos computed in-bucket BEFORE dedup: the threshold filter prunes
    // the vast majority of pairs pre-shuffle, and the dedup exchange
    // moves (id, id, sim) rows, never vector payloads
    // no join-strategy hint: at this corpus size AQE broadcasts one
    // side (duplicating the cheap native signature pass); past the
    // broadcast threshold it switches to a sort-merge join that reuses
    // the band exchange — both are the right plan at their scale
    lhs.join(rhs, Seq("band", "bval"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VecExprs.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")),
          4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .dropDuplicates("vec_a", "vec_b")
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val entries: Seq[Entry] = Seq(
    Entry("q34_embed_cosine_topk", q34, Some(q34Sql)),
    Entry("q35_ann_lsh", q35, None),
    Entry("q36_embed_dedup", (s, d) => q36(s, d), None),
  )
}
