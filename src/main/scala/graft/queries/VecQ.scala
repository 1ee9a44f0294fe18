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

  /** Shared top-k tail: rank candidates per query by similarity (ties
    * broken by id), keep k, present (query_id, rnk, neighbor_id,
    * cos_sim). One definition so the exact baseline (q34) and the ANN
    * variants it serves as recall oracle for can never drift apart.
    * Input needs columns query_id, vec_id, sim.
    */
  private def topK(scored: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        // RAW double, deliberately: both engines compute the identical
        // sequential dot product, and builtin ROUND(x,4) is not
        // portable at half-boundaries (see Q.round4's scaladoc)
        col("sim").as("cos_sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

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
    topK(e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (VecExprs.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim")))
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
      |SELECT query_id, rnk, vec_id AS neighbor_id, sim AS cos_sim
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
    // sim computed BEFORE the dedup shuffle: a multi-band collision
    // recomputes a cheap dot, but the shuffle carries (id, id, sim)
    // rows instead of 2×64 doubles of vector payload per row
    topK(b.join(broadcast(queries), Seq("band", "bval"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (VecExprs.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      .dropDuplicates("query_id", "vec_id"))
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
        (VecExprs.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .dropDuplicates("vec_a", "vec_b")
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // ---- IVF (inverted-file) ANN: coarse k-means quantizer ----

  /** Nearest-centroid assignment: vectors × broadcast centroids, keep
    * the `keep` closest clusters per vector (keep=1 builds the index;
    * keep=nprobe routes queries). Cosine distance.
    */
  private def assign(vectors: DataFrame, centroids: DataFrame,
                     keep: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cluster_id"))
    vectors.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("nrm"), col("cluster_id"),
        (lit(1.0) - VecExprs.dot(col("v"), col("cv")) /
          (col("nrm") * col("cnrm"))).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= keep)
      .drop("rn", "dist")
  }

  /** Element-wise mean of each cluster's vectors (the Lloyd update):
    * explode to (cluster, pos, component), average, reassemble.
    */
  private def recenter(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster_id"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("cluster_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cluster_id"),
        transform(col("pm"), e => e.getField("m")).as("cv"))
      .withColumn("cnrm", VecExprs.l2(col("cv")))

  /** q37: IVF ANN — a k-means coarse quantizer (deterministic seed
    * vectors, `iters` Lloyd rounds) partitions the corpus into K
    * inverted lists; each query probes only its `nprobe` nearest
    * lists, so per-query work is nprobe/K of the corpus instead of a
    * full scan. The index build is batch-amortized (at 100 TB: built
    * once, persisted bucketed by cluster_id); recall/latency trades
    * via nprobe with no plan change. Two Lloyd rounds are the default:
    * the coarse quantizer only routes probes (exact cosine re-ranks
    * inside the probed lists), so loose centroids cost a little
    * recall, never correctness; raise `iters` when recall targets
    * tighten.
    */
  def q37(s: SparkSession, dir: String, k: Int = 16, nprobe: Int = 4,
          iters: Int = 2): DataFrame = {
    val e = emb(Tables(s, dir))
    import s.implicits._
    // deterministic seeds: the k lowest vec_ids
    var centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    var it = 0
    while (it < iters) {
      // collect the k tiny centroid rows to the driver each round (the
      // MLlib pattern): the next iteration starts from a local
      // relation instead of chaining every previous round's plan into
      // every downstream consumer
      val rows = recenter(assign(e, centroids, keep = 1)).collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      centroids = rows.toDF("cluster_id", "cv", "cnrm")
      it += 1
    }
    val index = assign(e, centroids, keep = 1)
      .select(col("cluster_id"), col("vec_id"), col("v"), col("nrm"))
    val probes = assign(
      e.filter(col("vec_id") < NQueries), centroids, keep = nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cluster_id"))
    topK(index.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (VecExprs.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      .dropDuplicates("query_id", "vec_id"))
  }

  val entries: Seq[Entry] = Seq(
    Entry("q34_embed_cosine_topk", q34, Some(q34Sql)),
    Entry("q35_ann_lsh", q35, None),
    Entry("q36_embed_dedup", (s, d) => q36(s, d), None),
    Entry("q37_ann_ivf", (s, d) => q37(s, d), None),
  )
}
