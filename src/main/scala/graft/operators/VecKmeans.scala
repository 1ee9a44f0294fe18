package graft.operators

import graft.functions.expressions.VecExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ONE definition of the k-means building blocks shared by the
  * verified q37 query (graft.queries.VecQ) and the persisted
  * [[IvfIndex]] — assignment ranking and the Lloyd update must never
  * drift between the two, or the persisted index would silently stop
  * matching the oracle-checked semantics.
  */
private[graft] object VecKmeans {

  /** Nearest-centroid assignment: vectors × broadcast centroids
    * (columns cluster_id, cv, cnrm), keep the `keep` closest clusters
    * per vector (keep=1 builds an index; keep=nprobe routes queries).
    * Cosine distance; ties break on cluster_id.
    */
  def assign(vectors: DataFrame, centroids: DataFrame, keep: Int): DataFrame = {
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
    * explode to (cluster, pos, component), average, reassemble. The
    * mean is EXACT-sum based (decimal accumulate, then one double
    * division): a plain double avg() depends on partition order, which
    * would make results non-deterministic across runs/cluster layouts
    * — and the mean DuckDB-reproducible for the q37 oracle.
    * decimal(27,14) holds any |x| < 10^13 addend exactly enough that
    * no double can land on a rounding tie (a tie at scale 14 needs a
    * factor 5^14 denominator, which no binary fraction has).
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
