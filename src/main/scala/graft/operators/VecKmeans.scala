package graft.operators

import graft.functions.expressions.VecExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE definition of the k-means building blocks shared by the
  * verified q37 query (graft.queries.VecQ) and the persisted
  * [[IvfIndex]] — assignment ranking and the Lloyd update must never
  * drift between the two, or the persisted index would silently stop
  * matching the oracle-checked semantics.
  *
  * Centroids are DRIVER-LOCAL (k·dim doubles — kilobytes even at
  * k=4096): every Lloyd round collects them anyway, so assignment
  * embeds them as a literal array of structs and ranks per row with
  * array_sort — a pure projection. The alternative (crossJoin with a
  * centroid DataFrame + a row_number window) expands the corpus k×
  * and SHUFFLES it once per iteration just to rank k candidates per
  * vector; at 10⁹ vectors that shuffle is the whole job. This is the
  * MLlib pattern: ship the model to the data, never join against it.
  */
private[graft] object VecKmeans {

  /** A driver-local centroid: (cluster_id, vector, L2 norm). */
  type Center = (Long, Seq[Double], Double)

  /** Collect a (cluster_id, cv, cnrm) DataFrame (e.g. the persisted
    * `centroids/` parquet, or a recenter result) to driver-local form.
    */
  def collectCenters(df: DataFrame): Seq[Center] =
    df.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toSeq

  private def centerArray(centroids: Seq[Center]): Column = {
    require(centroids.nonEmpty, "k-means needs at least one centroid")
    array(centroids.map { case (id, cv, cn) =>
      struct(lit(id).as("cluster_id"), typedlit(cv).as("cv"),
        lit(cn).as("cnrm"))
    }: _*)
  }

  /** Cosine distance of row vector (v, nrm) to centroid struct `c` —
    * the exact arithmetic the DuckDB oracle replays; must not change.
    */
  private def cosDist(c: Column): Column =
    lit(1.0) - VecExprs.dot(col("v"), c.getField("cv")) /
      (col("nrm") * c.getField("cnrm"))

  /** Nearest-centroid assignment: keep the `keep` closest clusters per
    * vector (keep=1 builds an index; keep=nprobe routes queries).
    * Ranking is array_sort over (dist, cluster_id) structs —
    * lexicographic, so exactly the old ORDER BY dist, cluster_id
    * tie-break — evaluated per row with no shuffle and no k× blow-up.
    */
  def assign(vectors: DataFrame, centroids: Seq[Center],
             keep: Int): DataFrame = {
    val ranked = array_sort(transform(centerArray(centroids), c =>
      struct(cosDist(c).as("dist"),
        c.getField("cluster_id").as("cluster_id"))))
    vectors
      .select(col("vec_id"), col("v"), col("nrm"),
        explode(slice(ranked, 1, keep)).as("rc"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("rc").getField("cluster_id").as("cluster_id"))
  }

  /** Squared cosine distance to the NEAREST center, per vector — the
    * k-means|| sampling weight. One projection, no shuffle.
    */
  def minDistSq(vectors: DataFrame, centroids: Seq[Center]): DataFrame = {
    val dmin = array_min(transform(centerArray(centroids), cosDist(_)))
    vectors.select(col("vec_id"), col("v"), col("nrm"), dmin.as("d"))
      .withColumn("d2", col("d") * col("d"))
  }

  /** Element-wise mean of each cluster's vectors (the Lloyd update):
    * explode to (cluster, pos, component), average, reassemble. The
    * mean is EXACT-sum based (decimal accumulate, then one double
    * division): a plain double avg() depends on partition order, which
    * would make results non-deterministic across runs/cluster layouts
    * — and the mean DuckDB-reproducible for the q37 oracle.
    * decimal(27,14) holds any |x| < 10^13 addend exactly enough that
    * no double can land on a rounding tie (a tie at scale 14 needs a
    * factor 5^14 denominator, which no binary fraction has).
    *
    * The 64× posexplode expansion combines map-side (partial sum/count
    * per (cluster, pos)) before the exchange, so the shuffle carries
    * at most k·dim rows per task regardless of corpus size.
    */
  def recenter(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster_id"), col("pos"))
      .agg((sum(col("x").cast("decimal(27,14)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("cluster_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cluster_id"),
        transform(col("pm"), e => e.getField("m")).as("cv"))
      .withColumn("cnrm", VecExprs.l2(col("cv")))
}
