package graft

import graft.operators.IvfIndex
import graft.queries.VecQ
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val indexPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(spark, embeddings, p, k = 16, initRounds = 2, lloydIters = 2)
    p
  }

  test("IVF-PQ: sidecar encodes every indexed vector; queryPq matches query()'s schema with decent agreement") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    IvfIndex.build(spark, embeddings, p, k = 16, initRounds = 2, lloydIters = 2)
    IvfIndex.buildPq(spark, p, m = 8, ksub = 16, iters = 2, sampleN = 500)
    // every indexed vector has exactly one m-code row, partition-aligned
    val codes = spark.read.parquet(s"$p/pq/codes")
    assert(codes.count() == embeddings.count())
    assert(codes.filter(size(col("codes")) =!= 8).count() == 0)
    // codebook round-trips
    val cb = graft.operators.PqCodec.load(spark, s"$p/pq/codebook")
    assert(cb.m == 8 && cb.ksub == 16)

    val queries = embeddings.filter(col("vec_id") < 5)
    val viaPq = IvfIndex.queryPq(spark, p, queries, nprobe = 8, topk = 10,
      rerank = 40)
    val viaRaw = IvfIndex.query(spark, p, queries, nprobe = 8, topk = 10)
    // identical output contract
    assert(viaPq.columns.toSeq == viaRaw.columns.toSeq)
    val gotPq = viaPq.select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val gotRaw = viaRaw.select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    assert(viaPq.groupBy(col("query_id")).count()
      .filter(col("count") =!= 10).count() == 0, "10 neighbors per query")
    // the exact re-rank restores most of the raw ranking — the ADC
    // shortlist only costs recall when the true neighbor falls outside
    // the rerank window
    val agree = (gotPq & gotRaw).size.toDouble / gotRaw.size
    assert(agree >= 0.5, s"IVF-PQ agreement with raw IVF too low: $agree")
    // returned cosines are exact (same kernel): values for common pairs match
    val simPq = viaPq.select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val simRaw = viaRaw.select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    (gotPq & gotRaw).foreach { k =>
      assert(simPq(k) == simRaw(k), s"cosine drift on $k")
    }
  }

  test("IVF-PQ lifecycle: append keeps the code sidecar in lockstep; retrain rebuilds it") {
    val p = java.nio.file.Files.createTempDirectory("graft-ivfpq2").toString
    val head = embeddings.filter(col("vec_id") < 350)
    val tail = embeddings.filter(col("vec_id") >= 350)
    IvfIndex.build(spark, head, p, k = 8, initRounds = 1, lloydIters = 1)
    IvfIndex.buildPq(spark, p, m = 8, ksub = 16, iters = 1, sampleN = 300)
    IvfIndex.append(spark, p, tail)
    // every appended vector got codes with the frozen codebook
    assert(spark.read.parquet(s"$p/pq/codes").count() == embeddings.count(),
      "append must encode new vectors into the sidecar")
    // and queryPq CAN surface appended vectors (generous rerank)
    val appended = IvfIndex.queryPq(spark, p,
      embeddings.filter(col("vec_id") < 3), nprobe = 8, topk = 10,
      rerank = 2000)
      .filter(col("neighbor_id") >= 350).count()
    val viaRaw = IvfIndex.query(spark, p,
      embeddings.filter(col("vec_id") < 3), nprobe = 8, topk = 10)
      .filter(col("neighbor_id") >= 350).count()
    assert(appended == viaRaw,
      s"appended vectors reachable via PQ ($appended) must match raw ($viaRaw)")

    // retrain (volume-triggered) must leave a WORKING sidecar behind
    assert(IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25).isDefined)
    assert(spark.read.parquet(s"$p/pq/codes").count() == embeddings.count(),
      "retrain must rebuild the sidecar over the full corpus")
    assert(IvfIndex.queryPq(spark, p,
      embeddings.filter(col("vec_id") < 3), nprobe = 8, topk = 10)
      .count() == 30)
  }

  test("build persists centroids and a cluster-partitioned index covering the corpus") {
    val n = embeddings.count()
    val idx = spark.read.parquet(s"$indexPath/index")
    assert(idx.count() == n, "every vector must be in exactly one inverted list")
    assert(idx.select(col("vec_id")).distinct().count() == n)
    val k = spark.read.parquet(s"$indexPath/centroids").count()
    assert(k > 1 && k <= 16)
    // physically partitioned: cluster_id=… directories on disk
    val dirs = new java.io.File(s"$indexPath/index").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("cluster_id=")) == k.toInt,
      s"expected $k cluster directories, got ${dirs.toSeq}")
  }

  test("query prunes to the probed partitions and reaches decent recall vs brute force") {
    val queries = embeddings.filter(col("vec_id") < 5)
    val res = IvfIndex.query(spark, indexPath, queries, nprobe = 4, topk = 10)
    val plan = res.queryExecution.executedPlan.toString
    // the probe filter must reach the scan as a partition filter, and
    // it must actually prune (nprobe=4 over 5 queries < 16 clusters)
    assert(plan.contains("PartitionFilters: [cluster_id"),
      s"cluster_id not pushed as partition filter:\n$plan")
    val rows = res.collect()
    assert(rows.length == 5 * 10)
    // per-query ranks are 1..10 with cos_sim non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 10))
      val sims = sorted.map(_.getDouble(3)).toSeq
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // recall@10 vs the brute-force baseline — loose floor: the synthetic
    // corpus is near-uniform, the worst case for IVF routing
    val brute = VecQ.q34(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = brute.keys.toSeq.map { q =>
      (got.getOrElse(q, Set.empty) & brute(q)).size.toDouble / 10.0
    }.sum / brute.size
    assert(recall >= 0.3, s"recall@10 $recall too low even for nprobe=4/16")
  }

  test("append assigns new vectors to existing centroids without touching resident files") {
    val p = java.nio.file.Files.createTempDirectory("graft-ivf3").toString
    val head = embeddings.filter(col("vec_id") < 100)
    val tail = embeddings.filter(col("vec_id") >= 100)
    IvfIndex.build(spark, head, p, k = 8, initRounds = 1, lloydIters = 1)
    val centroidsBefore = spark.read.parquet(s"$p/centroids").collect().toSet
    val n = IvfIndex.append(spark, p, tail)
    assert(n == tail.count())
    val idx = spark.read.parquet(s"$p/index")
    assert(idx.count() == embeddings.count(),
      "appended index must cover the full corpus")
    assert(spark.read.parquet(s"$p/centroids").collect().toSet == centroidsBefore,
      "append must not re-train centroids")
    // appended vectors are queryable through the same probe path
    val res = IvfIndex.query(spark, p,
      embeddings.filter(col("vec_id") < 3), nprobe = 4, topk = 5)
    assert(res.count() == 15)
  }

  test("retrainIfNeeded: fresh index is left alone; past-threshold drift triggers a full rebuild") {
    val p = java.nio.file.Files.createTempDirectory("graft-ivf4").toString
    val head = embeddings.filter(col("vec_id") < 300)
    val tail = embeddings.filter(col("vec_id") >= 300 && col("vec_id") < 450)
    IvfIndex.build(spark, head, p, k = 8, initRounds = 1, lloydIters = 1)
    assert(IvfIndex.appendedFraction(spark, p) == 0.0)
    assert(IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25).isEmpty,
      "no appends yet — must not rebuild")
    IvfIndex.append(spark, p, tail)
    val frac = IvfIndex.appendedFraction(spark, p)
    assert(frac > 0.25, s"appended fraction $frac should exceed threshold")
    val info = IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25)
    assert(info.nonEmpty, "past-threshold drift must rebuild")
    assert(info.get.nVectors == head.count() + tail.count(),
      "rebuild must cover resident + appended vectors")
    // the swap published a complete index: meta resets the drift
    // baseline and the re-trained centroids serve queries
    assert(IvfIndex.appendedFraction(spark, p) == 0.0)
    assert(IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25).isEmpty)
    assert(spark.read.parquet(s"$p/index").count() == info.get.nVectors)
    val res = IvfIndex.query(spark, p,
      embeddings.filter(col("vec_id") < 3), nprobe = 4, topk = 5)
    assert(res.count() == 15)
    assert(!new java.io.File(p + "._graft_retrain").exists())
    assert(!new java.io.File(p + "._graft_old").exists())
  }

  test("retrainIfNeeded: a crashed retrain's leftover tmp tree (stale pq sidecar) is wiped, not published") {
    val p = java.nio.file.Files.createTempDirectory("graft-ivf6").toString
    val head = embeddings.filter(col("vec_id") < 300)
    val tail = embeddings.filter(col("vec_id") >= 300 && col("vec_id") < 450)
    IvfIndex.build(spark, head, p, k = 8, initRounds = 1, lloydIters = 1)
    // simulate the crash artifact: a prior retrain attempt that built a
    // PQ sidecar (against old centroids) into tmp and died before the
    // rename — the CURRENT index has no sidecar, so if the tmp survives
    // the rebuild, its stale codes get published with the fresh index
    val tmp = p + "._graft_retrain"
    IvfIndex.build(spark, head, tmp, k = 8, initRounds = 1, lloydIters = 1)
    IvfIndex.buildPq(spark, tmp, m = 4, ksub = 8)
    assert(IvfIndex.hasPq(spark, tmp))
    IvfIndex.append(spark, p, tail)
    assert(IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25).nonEmpty)
    // the published tree contains ONLY what this retrain wrote: the
    // index had no sidecar, so the result must not have one either
    assert(!IvfIndex.hasPq(spark, p),
      "stale pq/ sidecar from the crashed attempt must not be published")
    assert(!new java.io.File(tmp).exists())
    assert(spark.read.parquet(s"$p/index").count() == head.count() + tail.count())
  }

  test("recall measurement: sane bounds, and a recall floor can trigger a rebuild") {
    val r = IvfIndex.recall(spark, indexPath, sampleN = 10, nprobe = 8, topk = 5)
    assert(r >= 0.0 && r <= 1.0)
    // nprobe = half the clusters on a tiny corpus: recall should be strong
    assert(r > 0.6, s"recall $r implausibly low for nprobe=8 of k=16")
    val p = java.nio.file.Files.createTempDirectory("graft-ivf5").toString
    IvfIndex.build(spark, embeddings.filter(col("vec_id") < 200), p,
      k = 4, initRounds = 1, lloydIters = 1)
    // no appended drift: a rebuild cannot raise INTRINSIC recall, so
    // even an unreachable floor must not trigger one (else an index
    // below its floor would rebuild on every call, forever)
    assert(IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25,
      minRecall = Some(1.1), nprobe = 2).isEmpty)
    // with drift present (but under the volume threshold), the recall
    // floor decides — measured at the CALLER's nprobe, not a default
    IvfIndex.append(spark, p,
      embeddings.filter(col("vec_id") >= 200 && col("vec_id") < 220))
    assert(IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25,
      minRecall = Some(0.0), nprobe = 2).isEmpty)
    assert(IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25,
      minRecall = Some(1.1), nprobe = 2).nonEmpty)
    // the rebuild absorbed the drift: the same floor no longer fires
    assert(IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25,
      minRecall = Some(1.1), nprobe = 2).isEmpty)
  }

  test("maintainer lock: a held lock refuses a second writer loudly; a completed cycle leaves no lock behind") {
    val p = java.nio.file.Files.createTempDirectory("graft-ivflock").toString + "/idx"
    IvfIndex.build(spark, embeddings.filter(col("vec_id") < 200), p,
      k = 4, initRounds = 1, lloydIters = 1)
    val more = embeddings.filter(col("vec_id") >= 200 && col("vec_id") < 210)
    val lock = new org.apache.hadoop.fs.Path(p + "._graft_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // while one maintainer's cycle holds the lock, every other mutator
    // fails at acquisition (waitMs = 0, the batch convention) — the
    // retrain-swap-drops-a-ledgered-append lost update cannot form
    IvfIndex.withIndexLock(spark, p) {
      assert(fs.exists(lock))
      for (attempt <- Seq(
          () => IvfIndex.append(spark, p, more),
          () => IvfIndex.retrainIfNeeded(spark, p, threshold = 0.0),
          () => IvfIndex.dedupeVectors(spark, p),
          () => IvfIndex.buildPq(spark, p, m = 4, ksub = 4))) {
        val e = intercept[IllegalStateException] { attempt(); () }
        assert(e.getMessage.contains("lock"), e.getMessage)
      }
    }
    // released: mutators run again and clean up after themselves
    assert(!fs.exists(lock))
    IvfIndex.append(spark, p, more)
    assert(!fs.exists(lock), "a completed append must release the lock")
    assert(spark.read.parquet(s"$p/index").count() == 210)
    // reader recovery refuses to "repair" a mid-swap target while a
    // live maintainer holds the lock (it would race the second rename)
    IvfIndex.withIndexLock(spark, p) {
      val dst = new org.apache.hadoop.fs.Path(p)
      val old = new org.apache.hadoop.fs.Path(p + "._graft_old")
      assert(fs.rename(dst, old))
      try {
        val e = intercept[IllegalStateException] {
          IvfIndex.query(spark, p, embeddings.filter(col("vec_id") < 2))
        }
        assert(e.getMessage.contains("mid-publish"), e.getMessage)
      } finally assert(fs.rename(old, dst))
    }
  }

  test("deleteVectors: tombstoned vectors leave every query face at once; compaction reclaims the bytes; re-adds refuse") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-ivfdel").toString
    IvfIndex.build(spark, embeddings, p, k = 16, initRounds = 2,
      lloydIters = 2)
    IvfIndex.buildPq(spark, p, m = 8, ksub = 16, iters = 2, sampleN = 500)
    // victim = some query's own top raw neighbor, so its absence is
    // observable in the result, not just plausible
    val q1 = embeddings.filter(col("vec_id") === 3L)
    val victim = IvfIndex.query(spark, p, q1, nprobe = 8, topk = 5)
      .select(col("neighbor_id")).head().getLong(0)
    IvfIndex.deleteVectors(spark, p, Seq(victim))

    def neighbors(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("neighbor_id")).as[Long].collect().toSet
    val raw = IvfIndex.query(spark, p, q1, nprobe = 8, topk = 5)
    assert(!neighbors(raw).contains(victim),
      "tombstoned vector served by query()")
    assert(raw.count() == 5, "the shortlist must backfill, not shrink")
    val pq = IvfIndex.queryPq(spark, p, q1, nprobe = 8, topk = 5,
      rerank = 40)
    assert(!neighbors(pq).contains(victim),
      "tombstoned vector served by queryPq()")
    // recall: truth side is net of tombstones too — must stay sane
    val r = IvfIndex.recall(spark, p, sampleN = 5, nprobe = 8, topk = 5)
    assert(r >= 0.0 && r <= 1.0)

    // a batch re-adding the tombstoned id refuses loudly
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, p, embeddings.filter(col("vec_id") === victim))
    }
    assert(e.getMessage.contains("dedupeVectors"), e.getMessage)

    // compaction physically reclaims raw bytes AND pq codes, and the
    // in-tree log dies with the retired tree in the same swap
    IvfIndex.dedupeVectors(spark, p)
    assert(spark.read.parquet(s"$p/index")
      .filter(col("vec_id") === victim).isEmpty, "raw bytes survived")
    assert(spark.read.parquet(s"$p/pq/codes")
      .filter(col("vec_id") === victim).isEmpty, "pq codes survived")
    assert(IvfIndex.deletedIds(spark, p).isEmpty,
      "compaction must clear the tombstone log")
    // post-compaction, the id may return as a new vector
    assert(IvfIndex.append(spark, p,
      embeddings.filter(col("vec_id") === victim)) == 1L)
  }

  test("a retrain rebuild applies tombstones physically (the rebuild IS a compaction)") {
    val p = java.nio.file.Files.createTempDirectory("graft-ivfdel2").toString
    val head = embeddings.filter(col("vec_id") < 300)
    IvfIndex.build(spark, head, p, k = 8, initRounds = 2, lloydIters = 2)
    val victim = 7L
    IvfIndex.deleteVectors(spark, p, Seq(victim))
    // push appended fraction past the threshold to force the rebuild
    IvfIndex.append(spark, p, embeddings.filter(col("vec_id") >= 300))
    val rebuilt = IvfIndex.retrainIfNeeded(spark, p, threshold = 0.25)
    assert(rebuilt.isDefined, "drift past threshold must rebuild")
    assert(spark.read.parquet(s"$p/index")
      .filter(col("vec_id") === victim).isEmpty,
      "rebuild must not resurrect a tombstoned vector")
    assert(IvfIndex.deletedIds(spark, p).isEmpty,
      "the new tree starts log-free")
  }

  test("index build is deterministic: rebuilding yields identical centroids") {
    val p2 = java.nio.file.Files.createTempDirectory("graft-ivf2").toString
    IvfIndex.build(spark, embeddings, p2, k = 16, initRounds = 2, lloydIters = 2)
    val a = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("cluster_id").collect().map(_.toString).toSeq
    val b = spark.read.parquet(s"$p2/centroids")
      .orderBy("cluster_id").collect().map(_.toString).toSeq
    assert(a == b, "k-means|| init + exact-sum Lloyd must be reproducible")
  }
}
