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

  test("sampleFrames: every stride-th fixed-size frame as its own row; oversize fenced") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, payload,
        Multimodal.MediaMeta("video/raw", 1000L, 7L)),
      Multimodal.MediaRow(2L, Array.tabulate[Byte](10)(_.toByte),
        Multimodal.MediaMeta("video/raw", 10L, 8L)),
      Multimodal.MediaRow(3L, payload,
        Multimodal.MediaMeta("video/raw", 5000L, 9L))).toDS()
    val frames = Multimodal
      .sampleFrames(media, frameBytes = 256, stride = 2, maxBytes = 2000L)
      .collect().groupBy(_.doc_id)
    // doc 1: 4 frames (256,256,256,232 bytes), stride 2 → idx 0 and 2
    assert(frames(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(frames(1L).forall(f => f.ok && f.frame.length == 256))
    // doc 2: one short frame (the whole 10-byte payload)
    assert(frames(2L).map(f => (f.frame_idx, f.frame.length)).toSeq ==
      Seq((0, 10)))
    // doc 3: over maxBytes → one fenced row, no frames
    assert(frames(3L).map(f => (f.frame_idx, f.ok)).toSeq == Seq((-1, false)))
    // deterministic: replay emits identical frames
    val again = Multimodal
      .sampleFrames(media, frameBytes = 256, stride = 2, maxBytes = 2000L)
      .collect().map(f => (f.doc_id, f.frame_idx, f.frame.toSeq)).sortBy(x => (x._1, x._2))
    assert(again.toSeq == frames.values.flatten.toSeq
      .map(f => (f.doc_id, f.frame_idx, f.frame.toSeq)).sortBy(x => (x._1, x._2)))
  }

  test("resize: payload shrinks by the factor and meta describes the NEW payload") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](100)(i => i.toByte)
    val media = Seq(Multimodal.MediaRow(1L, payload,
      Multimodal.MediaMeta("image/raw", 100L, 42L))).toDS()
    val out = Multimodal.resize(media, factor = 4).collect()(0)
    assert(out.payload.length == 25)
    assert(out.payload.toSeq == (0 until 100 by 4).map(_.toByte))
    assert(out.meta.n_bytes == 25L)
    // the module-wide definition: xxhash64-of-bytes, same as blobTable
    assert(out.meta.checksum == Multimodal.payloadChecksum(out.payload),
      "checksum must match the resized bytes")
    // resized output feeds the decode stage unchanged (same row type)
    val feats = Multimodal.extractFeatures(Multimodal.resize(media, 4)).collect()
    assert(feats.length == 1 && feats(0).ok)
  }
}
