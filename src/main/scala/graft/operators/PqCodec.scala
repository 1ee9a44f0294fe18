package graft.operators

import graft.functions.VecOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., PAMI 2011) — the compression
  * half of the billion-scale ANN recipe (IVF routes, PQ compresses):
  * split each vector into `m` subspaces, k-means each subspace to
  * `ksub` centers, and store each vector as m small codes. At
  * m=8 × ksub=16 a 64-dim float32 vector becomes 8 nibble codes —
  * 64× smaller — and queries rank candidates with an ADC table
  * (per-query distance to every subspace center, m·ksub floats)
  * without ever touching the original vectors.
  *
  * Design mirrors [[IvfIndex]]/[[VecKmeans]]: every "random" choice is
  * hash-deterministic (rebuilds are byte-identical), the codebook is
  * DRIVER-LOCAL (m·ksub·dsub doubles — kilobytes) and ships to the
  * data as a literal, so assignment/encoding are pure projections with
  * no joins and no shuffles; training runs on a deterministic
  * bottom-N hash sample (the standard practice — codebooks converge on
  * a sample long before they see 10⁹ vectors).
  */
object PqCodec {

  /** Default training params — referenced by [[train]], by
    * [[IvfIndex.buildPq]], and by IvfIndex's pre-pq/meta retrain
    * fallback, so the three can never drift apart.
    */
  val DefaultIters = 2
  val DefaultSampleN = 2000

  /** Driver-local codebook: centers(j)(k) is subspace j's k-th center
    * (dsub doubles).
    */
  final case class Codebook(m: Int, ksub: Int, dsub: Int,
                            centers: Seq[Seq[Seq[Double]]])

  private def cbLit(cb: Codebook): Column = typedlit(cb.centers)

  /** Squared L2 distance between two equal-length double arrays,
    * sequential accumulation — the native
    * [[graft.functions.expressions.SqDist]] kernel (one JVM loop per
    * row; value-identical to the composed zip_with+aggregate form,
    * which NativeExprSpec pins).
    */
  private def sqDist(a: Column, b: Column): Column =
    graft.functions.expressions.VecExprs.sqDist(a, b)

  /** Dimension gate: a vector whose length differs from the codebook's
    * m·dsub must ERROR, not silently slice short subvectors that
    * SqDist then nulls and argmin resolves to code 0 — corrupt input
    * producing plausible codes is the worst failure mode. A NULL
    * vector is named as such (size(NULL) would report -1 and send the
    * operator hunting for a negative-dim vector). Apply ONCE per row
    * in a projection, never inside a per-element lambda.
    */
  private def checkedDim(v: Column, expected: Int): Column =
    when(size(v) === expected, v).otherwise(raise_error(concat(
      lit(s"PQ dim mismatch: codebook expects $expected, vector has "),
      when(v.isNull, lit("NULL")).otherwise(size(v).cast("string")))))

  /** (vec_id, j, sv) — each vector exploded into its m subvectors. */
  private def subvectors(e: DataFrame, m: Int, dsub: Int): DataFrame =
    e.select(col("vec_id"), checkedDim(col("v"), m * dsub).as("v"))
      .select(col("vec_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("v"), j * dsub + 1, lit(dsub))))
          .as(Seq("j", "sv")))

  /** Nearest-center code per (j, sv) row against the literal codebook:
    * argmin over (sqdist, k) via array_min of structs — lexicographic,
    * so ties break to the lowest code deterministically. A pure
    * projection (the VecKmeans ship-model-to-data pattern).
    */
  private def assign(sub: DataFrame, cb: Codebook): DataFrame =
    sub.withColumn("code",
      array_min(transform(element_at(cbLit(cb), col("j") + 1),
        (c, k) => struct(sqDist(col("sv"), c).as("d"), k.as("k"))))
        .getField("k"))

  /** Train a codebook on the deterministic bottom-`sampleN` hash
    * sample of the corpus (domain-separated "pq:" hash — uncorrelated
    * with sharding/sampling picks elsewhere). Init: subspace j's
    * centers are the subvectors of the ksub lowest-hash sample rows.
    * `iters` Lloyd rounds with exact-decimal means (partition-order
    * independent, like VecKmeans.recenter); empty clusters keep their
    * previous center.
    */
  def train(embeddings: DataFrame, m: Int = 8, ksub: Int = 16,
            iters: Int = DefaultIters,
            sampleN: Int = DefaultSampleN): Codebook = {
    val e0 = embeddings
      .select(col("vec_id"), VecOps.toDoubles(col("embedding")).as("v"))
    val dim = e0.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val h = graft.functions.expressions.TextExprs
      .md5Lower64(concat(lit("pq:"), col("vec_id").cast("string")))
    // bottom-N by hash via orderBy+limit: plans as TakeOrdered (each
    // task keeps N, driver merges) — never a global one-partition sort
    val sample = e0
      .orderBy(call_function("shiftrightunsigned", h, lit(1)),
        col("vec_id"))
      .limit(sampleN)
      .cache()
    try {
      val sub = subvectors(sample, m, dsub).cache()
      try {
        // init: per subspace, the subvectors of the ksub lowest-hash
        // sample rows (one tiny collect)
        val seedIds = sample
          .select(col("vec_id"))
          .orderBy(call_function("shiftrightunsigned", h, lit(1)),
            col("vec_id"))
          .limit(ksub).collect().map(_.getLong(0))
        val seedRows = sub
          .filter(col("vec_id").isin(seedIds.toSeq: _*))
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
        val order = seedIds.zipWithIndex.toMap
        var centers: Seq[Seq[Seq[Double]]] = (0 until m).map { j =>
          seedRows.filter(_._2 == j).sortBy(r => order(r._1))
            .map(_._3).toSeq
        }
        require(centers.forall(_.length == ksub),
          s"need >= $ksub sample vectors to seed, corpus too small")
        var it = 0
        while (it < iters) {
          val cb = Codebook(m, ksub, dsub, centers)
          // exact-decimal element-wise means per (j, code, pos):
          // partial-aggregated map-side, k·m·dsub rows to the driver
          val means = assign(sub, cb)
            .select(col("j"), col("code"),
              posexplode(col("sv")).as(Seq("pos", "x")))
            .groupBy(col("j"), col("code"), col("pos"))
            .agg((sum(col("x").cast("decimal(27,14)")).cast("double") /
              count(lit(1))).as("mu"))
            .collect()
            .groupBy(r => (r.getInt(0), r.getInt(1)))
            .map { case ((j, k), rows) =>
              (j, k) -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
            }
          centers = (0 until m).map { j =>
            (0 until ksub).map { k =>
              means.getOrElse((j, k), centers(j)(k)) // empty cluster: keep
            }
          }
          it += 1
        }
        Codebook(m, ksub, dsub, centers)
      } finally { sub.unpersist(); () }
    } finally { sample.unpersist(); () }
  }

  /** Encode the corpus: (vec_id, codes array<int> of length m). A
    * projection + one groupBy(vec_id) reassembly; at scale, encode
    * per-partition and write bucketed by the IVF cluster for the
    * IVF-PQ layout.
    */
  def encode(embeddings: DataFrame, cb: Codebook): DataFrame = {
    val e = embeddings
      .select(col("vec_id"), VecOps.toDoubles(col("embedding")).as("v"))
    assign(subvectors(e, cb.m, cb.dsub), cb)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("code")))).as("jc"))
      .select(col("vec_id"),
        transform(col("jc"), e2 => e2.getField("code")).as("codes"))
  }

  /** Per-query ADC distance table: (query_id, tbl) where tbl[j][k] is
    * the exact squared L2 distance from the query's j-th subvector to
    * subspace j's k-th center — m·ksub doubles per query, one
    * projection. The building block adcTopK and IvfIndex.queryPq rank
    * candidates with.
    */
  def distTable(queries: DataFrame, cb: Codebook): DataFrame =
    queries
      .select(col("vec_id").as("query_id"),
        VecOps.toDoubles(col("embedding")).as("qv"))
      .withColumn("qv", checkedDim(col("qv"), cb.m * cb.dsub))
      .withColumn("tbl",
        transform(cbLit(cb), (centersJ, j) =>
          transform(centersJ,
            c => sqDist(slice(col("qv"), j * cb.dsub + 1, lit(cb.dsub)), c))))
      .select(col("query_id"), col("tbl"))

  /** Approximate squared L2 distance of a code row against a distance
    * table: m table lookups, no vector reads — the native
    * [[graft.functions.expressions.AdcDist]] kernel (the composed
    * `aggregate(zip_with(codes, tbl, (c, row) => element_at(row, c+1)))`
    * form costs an interpreted HOF tree per candidate×query pair;
    * NativeExprSpec pins value parity between the two).
    */
  def adcDist(codes: Column, tbl: Column): Column =
    graft.functions.expressions.VecExprs.adcDist(codes, tbl)

  /** ADC (asymmetric distance computation) top-k: per query, the
    * distance table is one projection over the query row; each
    * candidate costs m table lookups — the original vectors are never
    * read. Queries broadcast; candidates stream.
    */
  def adcTopK(codes: DataFrame, cb: Codebook, queries: DataFrame,
              topk: Int = 10): DataFrame = {
    val q = distTable(queries, cb)
    // nulls LAST: a null ADC distance (corrupt codes row) must lose,
    // not rank first under the ascending default
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist").asc_nulls_last, col("vec_id"))
    codes.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx_dist", adcDist(col("codes"), col("tbl")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topk)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("approx_dist"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Persist a codebook as (j, k, center) rows — tiny, one file. */
  def save(spark: org.apache.spark.sql.SparkSession, cb: Codebook,
           path: String): Unit = {
    val rows = for {
      j <- 0 until cb.m
      k <- 0 until cb.ksub
    } yield (j, k, cb.centers(j)(k))
    spark.createDataFrame(rows).toDF("j", "k", "center")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Codebook = {
    val rows = spark.read.parquet(path)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val m = rows.map(_._1).max + 1
    val ksub = rows.map(_._2).max + 1
    val byJk = rows.map(r => (r._1, r._2) -> r._3).toMap
    Codebook(m, ksub, byJk.head._2.length,
      (0 until m).map(j => (0 until ksub).map(k => byJk((j, k)))))
  }
}
