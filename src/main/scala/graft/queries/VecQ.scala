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
  private def emb(t: Tables): DataFrame = embProjection(t.embeddings)

  /** The same projection over any (vec_id, embedding) frame —
    * ScaleCheck's entry into [[semanticDedup]] for its synthetic 10×
    * embeddings table.
    */
  private[graft] def embProjection(raw: DataFrame): DataFrame =
    raw.select(col("vec_id"), toDoubles(col("embedding")).as("v"))
      .withColumn("nrm", VecExprs.l2(col("v")))

  /** q34: brute-force cosine top-k — the exact baseline. The query
    * set is tiny and broadcast; the corpus streams past it once, and
    * per-query top-k comes from one window over (query, sim).
    *
    * Perf note (round-4 re-measure of the flagged 1.0→2.4 s bench
    * drift): warm steady-state is 0.6–0.8 s at sf0.1 and the scoring
    * sub-plan alone is ~0.45 s for the 10k candidate pairs — the
    * data path is milliseconds; the cold bench number is Catalyst
    * planning + Janino codegen + first-run JIT plus the broadcast
    * build job, and moves with machine load, not with this plan. The
    * norm precompute is kept: it is what makes each pair one dot
    * product instead of three.
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

  /** Shared oracle-SQL CTE chain rebuilding the SRP-LSH pipeline in
    * DuckDB: the md5-derived hyperplane matrix (identical to
    * VecOps.planeWeight / the native RhpSignature), 64-bit sign
    * signatures, and 8×8-bit band buckets. All dot products are
    * sequential double accumulation — bit-identical to VecExprs.
    */
  private val srpCte: String =
    """emb AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |d AS (SELECT CAST(max(len(v)) AS INT) AS dim FROM emb),
      |planes AS (
      |  SELECT r.b AS b, list_transform(range(0, (SELECT dim FROM d)), i ->
      |    CAST(list_reduce(list_transform(range(1,16), q -> CAST(strpos('0123456789abcdef',
      |      substr(md5(CAST(r.b AS VARCHAR) || '_' || CAST(i AS VARCHAR)), CAST(q AS INT), 1)) - 1 AS BIGINT)),
      |      (a,c) -> a*16+c) % 2001 - 1000 AS DOUBLE) / 1000.0) AS w
      |  FROM range(0,64) r(b)),
      |sigs AS (
      |  SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm,
      |    CAST(SUM(CASE WHEN list_dot_product(e.v, p.w) > 0
      |      THEN CAST(1 AS UBIGINT) << CAST(p.b AS INT) ELSE CAST(0 AS UBIGINT) END)
      |      AS UBIGINT) AS sig
      |  FROM emb e CROSS JOIN planes p GROUP BY e.vec_id, e.v),
      |bandedv AS (
      |  SELECT vec_id, v, nrm, sig, CAST(r.band AS INT) AS band,
      |    (sig >> CAST(r.band*8 AS INT)) & 255 AS bval
      |  FROM sigs, range(0,8) r(band))""".stripMargin

  val q35Sql: String =
    s"""WITH $srpCte,
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, band, bval
       |      FROM bandedv WHERE vec_id < 5),
       |cand AS (
       |  SELECT DISTINCT q.query_id, b.vec_id,
       |    list_dot_product(q.qv, b.v) / (q.qn * b.nrm) AS sim
       |  FROM bandedv b JOIN q ON b.band = q.band AND b.bval = q.bval
       |    AND b.vec_id <> q.query_id),
       |r AS (SELECT query_id, vec_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
       |  FROM cand)
       |SELECT query_id, rnk, vec_id AS neighbor_id, sim AS cos_sim
       |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  val q36Sql: String =
    s"""WITH $srpCte,
       |capped AS (
       |  SELECT vec_id, v, nrm, band, bval, COUNT(*) OVER (PARTITION BY band, bval) AS bn
       |  FROM bandedv QUALIFY bn <= 2000),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos_sim FROM pairs
       |WHERE cos_sim >= 0.3 ORDER BY vec_a, vec_b""".stripMargin

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
  // assignment + exact-sum Lloyd update live in graft.operators
  // .VecKmeans — ONE definition shared with the persisted IvfIndex so
  // the index can never drift from these oracle-verified semantics
  import graft.operators.VecKmeans
  import VecKmeans.Center

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
  /** The deterministic k-means build + full-corpus assignment shared
    * by q37 (IVF probe) and q68 (semantic dedup) — ONE Scala
    * definition feeding the ONE SQL mirror ([[kmeansIdxCte]]'s `idx`),
    * so the two queries cannot drift from each other or from the
    * oracle. Seeds = the k lowest vec_ids (collected to the driver —
    * centroids live driver-local for the whole build, so every
    * assignment is a shuffle-free projection); `iters` exact-sum Lloyd
    * rounds. Returns (the projected corpus with its cluster
    * assignment attached as `idx`, the final centroids).
    */
  private[graft] def kmeansIndex(e: DataFrame, k: Int, iters: Int)
      : (DataFrame, Seq[Center]) = {
    var centroids: Seq[Center] = VecKmeans.collectCenters(
      e.filter(col("vec_id") < k)
        .select(col("vec_id"), col("v"), col("nrm")))
    var it = 0
    while (it < iters) {
      centroids = VecKmeans.collectCenters(
        VecKmeans.recenter(VecKmeans.assign(e, centroids, keep = 1)))
      it += 1
    }
    (VecKmeans.assign(e, centroids, keep = 1)
      .select(col("cluster_id"), col("vec_id"), col("v"), col("nrm")),
      centroids)
  }

  def q37(s: SparkSession, dir: String, k: Int = 16, nprobe: Int = 4,
          iters: Int = 2): DataFrame = {
    val e = emb(Tables(s, dir))
    val (index, centroids) = kmeansIndex(e, k, iters)
    val probes = VecKmeans.assign(
      e.filter(col("vec_id") < NQueries), centroids, keep = nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cluster_id"))
    topK(index.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (VecExprs.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
      .dropDuplicates("query_id", "vec_id"))
  }

  /** DuckDB mirror of q37: the whole IVF build is deterministic (seed
    * centroids = 16 lowest vec_ids; exact-sum Lloyd means; every dot
    * product sequential double math), so the two unrolled Lloyd
    * rounds, the index, the nprobe=4 routing and the in-list re-rank
    * replay exactly.
    */
  /** Shared oracle CTE chain: the fully deterministic k=16 / 2-Lloyd-
    * round k-means build unrolled in SQL, ending in `idx` =
    * (cluster_id, vec_id, v, nrm) — consumed by the q37 (IVF probe)
    * and q68 (semantic dedup) oracles, which differ only in what they
    * do with the clustered corpus.
    */
  private val kmeansIdxCte: String =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |    sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |                          list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cluster_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id < 16),
      |a0 AS (
      |  SELECT vec_id, v, cluster_id FROM (
      |    SELECT e.vec_id, e.v, c.cluster_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY (1.0 - list_dot_product(e.v, c.cv) / (e.nrm * c.cnrm)), c.cluster_id) AS rn
      |    FROM e CROSS JOIN c0 c) WHERE rn = 1),
      |m0 AS (
      |  SELECT cluster_id, pos,
      |    CAST(SUM(CAST(x AS DECIMAL(27,14))) AS DOUBLE) / COUNT(*) AS m
      |  FROM (SELECT cluster_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM a0)
      |  GROUP BY cluster_id, pos),
      |c1 AS (
      |  SELECT cluster_id, list(m ORDER BY pos) AS cv,
      |    sqrt(list_dot_product(list(m ORDER BY pos), list(m ORDER BY pos))) AS cnrm
      |  FROM m0 GROUP BY cluster_id),
      |a1 AS (
      |  SELECT vec_id, v, cluster_id FROM (
      |    SELECT e.vec_id, e.v, c.cluster_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY (1.0 - list_dot_product(e.v, c.cv) / (e.nrm * c.cnrm)), c.cluster_id) AS rn
      |    FROM e CROSS JOIN c1 c) WHERE rn = 1),
      |m1 AS (
      |  SELECT cluster_id, pos,
      |    CAST(SUM(CAST(x AS DECIMAL(27,14))) AS DOUBLE) / COUNT(*) AS m
      |  FROM (SELECT cluster_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM a1)
      |  GROUP BY cluster_id, pos),
      |c2 AS (
      |  SELECT cluster_id, list(m ORDER BY pos) AS cv,
      |    sqrt(list_dot_product(list(m ORDER BY pos), list(m ORDER BY pos))) AS cnrm
      |  FROM m1 GROUP BY cluster_id),
      |idx AS (
      |  SELECT cluster_id, vec_id, v, nrm FROM (
      |    SELECT e.vec_id, e.v, e.nrm, c.cluster_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY (1.0 - list_dot_product(e.v, c.cv) / (e.nrm * c.cnrm)), c.cluster_id) AS rn
      |    FROM e CROSS JOIN c2 c) WHERE rn = 1)""".stripMargin

  val q37Sql: String =
    s"""WITH $kmeansIdxCte,
      |probes AS (
      |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cluster_id FROM (
      |    SELECT e.vec_id, e.v, e.nrm, c.cluster_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY (1.0 - list_dot_product(e.v, c.cv) / (e.nrm * c.cnrm)), c.cluster_id) AS rn
      |    FROM e CROSS JOIN c2 c WHERE e.vec_id < 5) WHERE rn <= 4),
      |cand AS (
      |  SELECT DISTINCT p.query_id, i.vec_id,
      |    list_dot_product(p.qv, i.v) / (p.qn * i.nrm) AS sim
      |  FROM idx i JOIN probes p USING (cluster_id)
      |  WHERE i.vec_id <> p.query_id),
      |r AS (SELECT query_id, vec_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
      |  FROM cand)
      |SELECT query_id, rnk, vec_id AS neighbor_id, sim AS cos_sim
      |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  /** q68: SEMANTIC (embedding-cluster) dedup — the SemDeDup recipe
    * (Abbas et al., 2023, arXiv:2303.09540): k-means-cluster the
    * embeddings, then WITHIN each cluster drop every vector whose
    * cosine to a LOWER-id cluster-mate reaches the threshold
    * (keep-lowest, the same deterministic survivor rule as the whole
    * text-dedup family q30/q31/q53). Catches paraphrases and
    * re-encodings that share no n-grams — the dup class MinHash/
    * SimHash structurally cannot see.
    *
    * Scale shape: the cluster build is q37's (deterministic seeds,
    * driver-resident centroids, shuffle-free assignment); pair
    * generation is an equi-join on cluster_id, so the candidate set
    * is sum-of-cluster-sizes-squared, never corpus² — k scales with N
    * (SemDeDup runs k=50k on LAION-scale corpora) to keep clusters
    * bounded, and the pair shuffle carries (id, id, sim) rows only.
    * Output: every vector with its cluster, its max lower-id
    * same-cluster cosine (round4'd; NULL when alone/lowest), and the
    * keep verdict.
    */
  /** q68's dup threshold — ONE constant interpolated into both the
    * Spark path and [[q68Sql]] (the k=16 / 2-round cluster build is
    * pinned structurally by [[kmeansIdxCte]]'s unrolled SQL, so those
    * are not parameters: a different build needs a different oracle).
    */
  private val SemDedupThreshold = 0.3

  def q68(s: SparkSession, dir: String): DataFrame =
    semanticDedup(emb(Tables(s, dir)), k = 16, iters = 2)

  /** The q68 kernel with the cluster count as a parameter — the
    * registered entry pins k = 16 (the oracle's unrolled CTE build),
    * but k IS the scale knob: SemDeDup keeps clusters bounded by
    * growing k with N (50k at LAION scale), so a 10× corpus runs 10×
    * the clusters at the SAME cluster size and the within-cluster
    * pair volume grows linearly, not quadratically. ScaleCheck
    * measures exactly that: this kernel at sf1 with k scaled 10×.
    * Input: (vec_id, v, nrm) — the [[emb]] projection.
    */
  private[graft] def semanticDedup(e: DataFrame, k: Int,
                                   iters: Int = 2): DataFrame = {
    val (assigned, _) = kmeansIndex(e, k = k, iters = iters)
    val lhs = assigned.select(col("cluster_id"), col("vec_id"),
      col("v"), col("nrm"))
    val rhs = assigned.select(col("cluster_id"),
      col("vec_id").as("vec_lo"), col("v").as("v_lo"), col("nrm").as("n_lo"))
    // max cosine to a lower id in the SAME cluster — sim computed
    // in-bucket before the per-vector aggregate, so the exchange
    // carries scalars, not vector payloads. Zero-norm guard (the q56
    // degenerate-denominator pattern): 0/0 would be NaN here but NULL
    // in DuckDB — both sides emit NULL, max() ignores it, and an
    // unmeasurable vector is KEPT, never dropped as a dup of nothing
    val maxLower = lhs.join(rhs, Seq("cluster_id"))
      .filter(col("vec_lo") < col("vec_id"))
      .select(col("vec_id"),
        when(col("nrm") * col("n_lo") > 0,
          VecExprs.dot(col("v"), col("v_lo")) / (col("nrm") * col("n_lo")))
          .as("sim"))
      .groupBy(col("vec_id")).agg(max(col("sim")).as("ms"))
    assigned
      .join(maxLower, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id").cast("bigint").as("cluster_id"),
        Q.round4(col("ms")).as("max_lower_sim4"),
        (col("ms").isNull || col("ms") < SemDedupThreshold)
          .cast("bigint").as("kept"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB mirror of q68: the [[kmeansIdxCte]] cluster build, then
    * the same within-cluster lower-id max-cosine and keep verdict.
    */
  val q68Sql: String =
    s"""WITH $kmeansIdxCte,
      |lower_sim AS (
      |  SELECT a.vec_id,
      |    max(CASE WHEN a.nrm * b.nrm > 0
      |      THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END) AS ms
      |  FROM idx a JOIN idx b USING (cluster_id)
      |  WHERE b.vec_id < a.vec_id
      |  GROUP BY a.vec_id)
      |SELECT i.vec_id, CAST(i.cluster_id AS BIGINT) AS cluster_id,
      |  ${Q.round4Sql("p.ms")} AS max_lower_sim4,
      |  CAST(p.ms IS NULL OR p.ms < $SemDedupThreshold AS BIGINT) AS kept
      |FROM idx i LEFT JOIN lower_sim p ON i.vec_id = p.vec_id
      |ORDER BY i.vec_id""".stripMargin

  /** q56: scalar (int8) embedding quantization — the storage-scale
    * path for vector corpora: per-dimension symmetric max-abs scales
    * (the faiss SQ8 form), codes in [-127, 127], 4× smaller than
    * float32 and 8× smaller than the double working form. Reports
    * per-vector saturation count and relative reconstruction error.
    *
    * The dim scales are collected driver-side (dim doubles — the
    * ship-model-to-data pattern, like VecKmeans centroids) and
    * embedded as a literal, so quantization itself is a pure
    * projection: one corpus pass for the scales, one for the codes,
    * no joins, no shuffles beyond the dim-row scale aggregate.
    */
  def q56(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).embeddings
      .select(col("vec_id"), toDoubles(col("embedding")).as("v"))
    val scales = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(max(abs(col("x"))).as("s"))
      .orderBy(col("pos"))
      .collect().map { r =>
        val sc = r.getDouble(1)
        if (sc == 0.0) 1.0 else sc // an all-zero dim quantizes to code 0
      }.toSeq
    val sArr = typedlit(scales)
    val codes = zip_with(col("v"), sArr, (x, sc) =>
      greatest(lit(-127L), least(lit(127L), floor(x * 127.0 / sc + 0.5))))
    val dq = zip_with(col("codes"), sArr, (c, sc) => c * sc / 127.0)
    val diff = zip_with(col("v"), col("dq"), (a, b) => a - b)
    e.withColumn("codes", codes)
      .withColumn("dq", dq)
      .select(col("vec_id"),
        size(filter(col("codes"), c => abs(c) === 127L))
          .cast("bigint").as("n_sat"),
        // zero-norm guard: an all-zero vector reconstructs exactly but
        // 0/0 is NaN with engine-dependent rendering — report NULL (the
        // q28 degenerate-denominator pattern), mirrored in q56Sql
        when(VecExprs.l2(col("v")) > 0,
          Q.round4(VecExprs.l2(diff) / VecExprs.l2(col("v")))).as("rel_err4"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB mirror of q56: same max-abs scales (max is
    * order-independent, so exact), same floor(+0.5) rounding, same
    * sequential-double norms. DuckDB's index lambda is 1-based like
    * its list indexing.
    */
  val q56Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |sc0 AS (
       |  SELECT pos, max(abs(x)) AS s
       |  FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
       |  GROUP BY pos),
       |sc AS (SELECT list(CASE WHEN s = 0 THEN 1.0 ELSE s END ORDER BY pos) AS sl
       |       FROM sc0),
       |q AS (
       |  SELECT vec_id, v,
       |    list_transform(v, (x, i) ->
       |      greatest(-127.0, least(127.0, floor(x * 127.0 / sl[i] + 0.5)))) AS codes
       |  FROM e CROSS JOIN sc),
       |d AS (
       |  SELECT vec_id, v,
       |    len(list_filter(codes, c -> abs(c) = 127.0)) AS n_sat,
       |    list_transform(codes, (c, i) -> v[i] - c * sl[i] / 127.0) AS diff
       |  FROM q CROSS JOIN sc)
       |SELECT vec_id, CAST(n_sat AS BIGINT) AS n_sat,
       |  CASE WHEN list_dot_product(v, v) > 0
       |       THEN ${Q.round4Sql("sqrt(list_dot_product(diff, diff)) / sqrt(list_dot_product(v, v))")}
       |  END AS rel_err4
       |FROM d ORDER BY vec_id""".stripMargin

  /** q73: cluster-quota diversity sampling — a deterministic
    * `quota`-per-cluster pick over the q37/q68 k-means partition of
    * the embedding space, the embedding-space analogue of q55's
    * per-stratum bottom-k: where q55 balances a LABEL (language), this
    * balances the corpus's own semantic geometry, the standard
    * cure for "the random sample is 90% the dominant content type"
    * when curating finetuning/eval subsets.
    *
    * Within each cluster the pick is the `quota` smallest
    * domain-separated hashes ("div:" prefix decorrelates from the
    * q47/q48/q55 gates), unsigned-compared via the q48 `h >>> 1`
    * device, so the sample is invariant to partitioning, retries and
    * row order. Scale shape: the cluster build is q37's (shuffle-free
    * assignment against literal centroids); the pick is ONE shuffle
    * on cluster_id + a per-cluster sort of hash scalars — never
    * vector payloads (v/nrm are projected away before the exchange).
    */
  /** q73's per-cluster quota — ONE definition interpolated into both
    * the Scala default and the DuckDB mirror (the SemDedupThreshold
    * pattern), so the registered query and its oracle cannot drift.
    */
  val DiverseQuota: Int = 8

  def q73(s: SparkSession, dir: String, quota: Int = DiverseQuota): DataFrame = {
    import graft.functions.expressions.TextExprs.md5Lower64
    val e = emb(Tables(s, dir))
    val (assigned, _) = kmeansIndex(e, k = 16, iters = 2)
    val h = md5Lower64(concat(lit("div:"), col("vec_id").cast("string")))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("ord"), col("vec_id"))
    assigned
      .select(col("vec_id"), col("cluster_id").cast("bigint").as("cluster_id"),
        call_function("shiftrightunsigned", h, lit(1)).as("ord"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= quota)
      .select(col("cluster_id"), col("rk"), col("vec_id"))
      .orderBy(col("cluster_id"), col("rk"))
  }

  /** DuckDB mirror of q73: the [[kmeansIdxCte]] cluster build, then
    * the same per-cluster bottom-`quota` by unsigned domain hash.
    */
  val q73Sql: String =
    s"""WITH $kmeansIdxCte,
      |r AS (
      |  SELECT CAST(cluster_id AS BIGINT) AS cluster_id, vec_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY cluster_id
      |      ORDER BY md5_number_lower('div:' || CAST(vec_id AS VARCHAR)) >> 1,
      |        vec_id) AS BIGINT) AS rk
      |  FROM idx)
      |SELECT cluster_id, rk, vec_id FROM r WHERE rk <= $DiverseQuota
      |ORDER BY cluster_id, rk""".stripMargin

  /** q115's benchmark membership rule and contamination threshold —
    * single-sourced into [[q115Sql]]. Benchmark = vec_id ≡ 0 (mod 97):
    * a held-out slice in the q54 even/odd spirit but sized like a real
    * eval set (~1% of the corpus). The synthetic embeddings have no
    * natural near-benchmark corpus vectors (max cosine ≈ 0.50 at
    * every SF), so — the q54/q83 injection device — the corpus rows
    * at vec_id ≡ 1 (mod 97) carry a LEAKED copy of their predecessor
    * benchmark vector (cosine exactly 1.0, a verbatim eval leak):
    * both engines must DETECT identical known contamination, not
    * agree on zero, and the 0.92 threshold sits in the wide gap
    * between the natural ceiling and the leak.
    */
  private val DeconMod = 97
  private[graft] val DeconThreshold = 0.92

  /** q115: SEMANTIC benchmark decontamination — the embedding-space
    * complement of q54's n-gram overlap test (n-gram decontamination
    * misses paraphrased eval questions exactly the way MinHash misses
    * paraphrased near-dups; q68's lesson applied to the train/eval
    * boundary): every corpus vector's MAX cosine to any held-out
    * benchmark vector, and the drop verdict at [[DeconThreshold]].
    *
    * Scale shape: the BENCHMARK side broadcasts — eval sets are
    * thousands of rows against a corpus of billions, the q34/q54
    * invariant — and the corpus streams past it exactly once; the
    * per-vector max partially aggregates map-side, so the exchange
    * carries one (vec_id, max_sim) row per corpus vector, never the
    * |corpus|×|bench| pair set. A benchmark too large to broadcast
    * switches to the q35 LSH-bucketed candidate path (same kernel,
    * bucketed pairs) — the knob is explicit, like q74 vs q78. MAX
    * over an identical double set is order-free, so the raw
    * similarity is engine-exact (the q34 precedent).
    */
  def q115(s: SparkSession, dir: String): DataFrame = {
    val e = emb(Tables(s, dir))
    val bench = e.filter(col("vec_id") % DeconMod === 0)
    // deterministic leak injection (scaladoc above): corpus row
    // bench_id+1 carries the benchmark vector verbatim — a broadcast
    // equi-join on the derived id, row-preserving
    val leaks = bench.select((col("vec_id") + 1).as("vec_id"),
      col("v").as("lv"), col("nrm").as("ln"))
    val corp = e.filter(col("vec_id") % DeconMod =!= 0)
      .join(broadcast(leaks), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("lv"), col("v")).as("v"),
        coalesce(col("ln"), col("nrm")).as("nrm"))
    corp.crossJoin(broadcast(
        bench.select(col("v").as("bv"), col("nrm").as("bn"))))
      .select(col("vec_id"),
        (VecExprs.dot(col("v"), col("bv")) / (col("nrm") * col("bn"))).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max(col("sim")).as("max_sim"))
      .withColumn("contaminated",
        when(col("max_sim") >= DeconThreshold, 1L).otherwise(0L))
      .orderBy(col("vec_id"))
  }

  val q115Sql: String =
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |bench AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % $DeconMod = 0),
       |corp AS (
       |  SELECT c.vec_id, coalesce(l.v, c.v) AS v, coalesce(l.nrm, c.nrm) AS nrm
       |  FROM n c LEFT JOIN bench l ON c.vec_id = l.vec_id + 1
       |  WHERE c.vec_id % $DeconMod <> 0),
       |s AS (
       |  SELECT c.vec_id, max(list_dot_product(c.v, b.v) / (c.nrm * b.nrm)) AS max_sim
       |  FROM corp c CROSS JOIN bench b GROUP BY c.vec_id)
       |SELECT vec_id, max_sim,
       |  CAST(CASE WHEN max_sim >= $DeconThreshold THEN 1 ELSE 0 END AS BIGINT) AS contaminated
       |FROM s ORDER BY vec_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q34_embed_cosine_topk", q34, Some(q34Sql)),
    Entry("q35_ann_lsh", q35, Some(q35Sql)),
    Entry("q36_embed_dedup", (s, d) => q36(s, d), Some(q36Sql)),
    Entry("q37_ann_ivf", (s, d) => q37(s, d), Some(q37Sql)),
    Entry("q56_embed_quantize", q56, Some(q56Sql)),
    Entry("q68_semantic_dedup", (s, d) => q68(s, d), Some(q68Sql)),
    Entry("q73_diverse_sample", (s, d) => q73(s, d), Some(q73Sql)),
    Entry("q115_semantic_decon", q115, Some(q115Sql)),
  )
}
