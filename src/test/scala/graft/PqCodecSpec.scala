package graft

import graft.operators.PqCodec
import org.apache.spark.sql.functions._

class PqCodecSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf).embeddings

  test("train is deterministic: two builds yield the identical codebook") {
    val a = PqCodec.train(emb, m = 8, ksub = 16, iters = 2, sampleN = 500)
    val b = PqCodec.train(emb, m = 8, ksub = 16, iters = 2, sampleN = 500)
    assert(a == b, "codebook must be a pure function of the data")
    assert(a.centers.length == 8 && a.centers.forall(_.length == 16))
    assert(a.centers.forall(_.forall(_.length == a.dsub)))
  }

  test("encode: m codes per vector, all within [0, ksub)") {
    val cb = PqCodec.train(emb, m = 8, ksub = 16, iters = 2, sampleN = 500)
    val codes = PqCodec.encode(emb, cb)
    assert(codes.count() == emb.count())
    val bad = codes.filter(
      size(col("codes")) =!= cb.m ||
        exists(col("codes"), c => c < 0 || c >= cb.ksub)).count()
    assert(bad == 0, "every vector must get m codes in [0, ksub)")
  }

  test("encode raises on dimension mismatch instead of emitting plausible codes") {
    import spark.implicits._
    val cb = PqCodec.Codebook(2, 1, 2,
      Seq(Seq(Seq(0.0, 0.0)), Seq(Seq(0.0, 0.0))))
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    def msgs(t: Throwable): String =
      if (t == null) "" else t.toString + msgs(t.getCause)
    val ex = intercept[Exception] { PqCodec.encode(bad, cb).collect() }
    assert(msgs(ex).contains("PQ dim mismatch"), msgs(ex).take(500))
  }

  test("ADC top-k beats random ranking: decent recall vs exact L2 neighbors") {
    import spark.implicits._
    val cb = PqCodec.train(emb, m = 8, ksub = 16, iters = 2, sampleN = 500)
    val codes = PqCodec.encode(emb, cb).cache()
    val queries = emb.filter(col("vec_id") < 5)
    val approx = PqCodec.adcTopK(codes, cb, queries, topk = 10)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    // exact L2 ground truth, same tie-break shape
    val e = emb.select(col("vec_id"),
      graft.functions.VecOps.toDoubles(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d"), col("vec_id"))
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d",
        aggregate(zip_with(col("qv"), col("v"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    codes.unpersist()
    val recall = (approx & exact).size.toDouble / exact.size
    // 8 subspaces x 16 centers on 64-dim synthetic data: recall well
    // above chance (10/2000 = 0.005); floor set loose against noise
    assert(recall >= 0.3, s"ADC recall@10 too low: $recall")
  }
}
