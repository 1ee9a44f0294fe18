package graft.pipeline

import graft.operators.Hll
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance: keep a per-group statistics
  * snapshot (counts, sums, min/max, distinct-count sketch) up to date
  * by merging each arriving batch's PARTIALS into the snapshot —
  * never rescanning the corpus. At 100 TB this is the difference
  * between "nightly stats = nightly full scan" and "nightly stats =
  * one pass over the day's increment + a merge the size of the group
  * count".
  *
  * Everything stored is a MERGEABLE partial, so maintenance is an
  * associative fold and the maintained snapshot is bit-identical to
  * recomputing from all data at once (the StatsMaintainSpec
  * invariant):
  *  - `n` — row count (merge: sum);
  *  - `sum_<c>` — sums in decimal(38,6): exact, partition-order
  *    independent, overflow-checked (a double sum would drift with
  *    merge order and the invariant above would be unprovable);
  *  - `min_<c>` / `max_<c>` — merge: min/max;
  *  - `hll_<c>` — the [[graft.operators.Hll]] register vector as a
  *    fixed array<int> of m=64 (index j = max rho seen in register
  *    j, 0 = never hit); merge: element-wise max. The estimate read
  *    off the merged vector equals the q45 batch estimate on the
  *    concatenated data EXACTLY — same registers, same integer sum,
  *    same one double division.
  *
  *  - `qs_<c>` — (r13) a bounded deterministic bottom-k row sample
  *    (array<struct<h,v>> of the k smallest md5-of-row-key hashes
  *    with their values; [[graft.functions.expressions
  *    .BottomKSample]]); merge: union → re-bottom-k — exact, so the
  *    maintained sample quantiles (`p50s_<c>`/`p99s_<c>`, ~1/√k rank
  *    error) carry the q46 sampled-quantile answer into the
  *    maintained view, an order of magnitude tighter than the log2
  *    histogram's factor-2 bound.
  *
  * What is NOT here, deliberately: non-mergeable aggregates (exact
  * median, exact distinct). Those need the raw data by definition;
  * the mergeable stand-ins (the bottom-k sample, the HLL) are the
  * 100 TB answers.
  */
object StatsMaintain {

  /** What to maintain: group keys, sum columns, min/max columns,
    * distinct-count (HLL) columns, histogram (quantile-bound)
    * columns, and SAMPLED-quantile columns (`quants` — see
    * [[graft.functions.expressions.BottomKSample]]): a bounded
    * deterministic bottom-k row sample per group whose sample
    * quantiles carry ~1/√k rank error (k=1024 ⇒ ~3%), against the
    * log2 histogram's factor-2 value bound. `quants` requires
    * `quantKey` — a column UNIQUELY identifying rows (the q46
    * hash-sampling discipline): the sample keeps the rows whose
    * md5Lower64(key) is smallest, a pure function of the data, so the
    * maintained sketch is bit-identical to one-shot and DuckDB
    * replays it in closed form (`WHERE v IS NOT NULL` + `row_number()
    * OVER (ORDER BY md5_number_lower(key) >> 1) <= k` — null values
    * are SKIPPED by the aggregate, the other families' isNotNull
    * convention, so the replay must filter them before ranking or a
    * null-v row would displace a real sample member).
    */
  final case class Spec(
      keys: Seq[String],
      sums: Seq[String] = Nil,
      minMax: Seq[String] = Nil,
      distincts: Seq[String] = Nil,
      hists: Seq[String] = Nil,
      quants: Seq[String] = Nil,
      quantKey: Option[String] = None,
      quantK: Int = 1024)

  /** Log2-histogram bins: bin 0 holds values ≤ 0, bin k (1 ≤ k ≤ 63)
    * holds [2^(k−1), 2^k) — so a quantile read back off the histogram
    * is exact to within a factor of 2, the monitoring-grade guarantee
    * that IS achievable from a mergeable fixed-size state (an exact
    * quantile needs the raw data by definition; q46's sampled
    * quantiles are the other trade). Bin counts merge by vector add.
    */
  val HistBins = 64

  final case class Stats(batchRows: Long, groups: Long, newGroups: Long)

  private def hllCol(c: String) = s"hll_$c"
  private def histCol(c: String) = s"hist_$c"
  private def quantCol(c: String) = s"qs_$c"

  /** The bin of one value: 0 for v ≤ 0, else ⌊log2 v⌋ + 1 — computed
    * as length(bin(v)), the binary-string length (codegen'd, and the
    * same trick [[graft.operators.Hll.rho]] uses for leading zeros).
    */
  private def binOf(v: Column): Column =
    when(v <= 0, lit(0))
      .otherwise(length(bin(v.cast("long"))).cast("int"))

  /** Per-group mergeable partials of one batch. One row per group:
    * n, sum_*, min_*, max_*, hll_* (array<int> of m), hist_*
    * (array<bigint> of [[HistBins]]).
    *
    * ONE scan and ONE shuffle for every stat family: sketch vectors
    * fuse into the same aggregate as the scalars via fixed-width
    * conditional aggregation — register j of a sketch is
    * `max(when(_reg = j, _rho))`, bin j of a histogram
    * `sum(when(_bin = j, 1))` — all commutative, so map-side partial
    * aggregation applies to everything at once. (The alternative — a
    * (keys, reg) pre-aggregate per sketch joined back — reads the
    * batch once PER FAMILY; at corpus scale the extra scans are the
    * whole cost.) The register/bin derivations are projected BEFORE
    * the aggregate so each row digests its value exactly once,
    * whatever the vector width.
    */
  def partials(batch: DataFrame, spec: Spec): DataFrame = {
    require(spec.keys.nonEmpty, "stats need at least one group key")
    require(spec.quants.isEmpty || spec.quantKey.nonEmpty,
      "sampled quantiles (quants) need quantKey — the unique row key " +
        "whose md5 hash drives the deterministic bottom-k sample")
    val prep = batch.select(
      spec.keys.map(col) ++
        spec.sums.map(c => col(c).cast("decimal(38,6)").as(s"_s_$c")) ++
        spec.minMax.map(c => col(c).as(s"_m_$c")) ++
        spec.distincts.flatMap(c => Seq(
          when(col(c).isNotNull, Hll.reg(col(c))).as(s"_reg_$c"),
          when(col(c).isNotNull, Hll.rho(col(c))).as(s"_rho_$c"))) ++
        spec.hists.map(c =>
          when(col(c).isNotNull, binOf(col(c))).as(s"_bin_$c")) ++
        // one hash per ROW, shared by every quant column. Ordered by
        // the UNSIGNED hash via >>> 1 (the q48 convention): Spark's
        // md5Lower64 is DuckDB's md5_number_lower REINTERPRETED as a
        // signed long, so signed order would diverge from the oracle's
        // unsigned order — the logical shift drops the sign bit into
        // the same non-negative range in both engines, bit for bit
        (if (spec.quants.isEmpty) Nil
         else Seq(shiftrightunsigned(graft.functions.expressions.TextExprs
           .md5Lower64(col(spec.quantKey.get).cast("string")), 1)
           .as("_qh")) ++
           spec.quants.map(c => col(c).cast("double").as(s"_qv_$c"))): _*)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        spec.sums.map(c => sum(col(s"_s_$c")).as(s"sum_$c")) ++
        spec.minMax.flatMap(c =>
          Seq(min(col(s"_m_$c")).as(s"min_$c"),
            max(col(s"_m_$c")).as(s"max_$c"))) ++
        spec.distincts.map { c =>
          array((0 until Hll.M).map(j =>
            coalesce(max(when(col(s"_reg_$c") === j, col(s"_rho_$c"))),
              lit(0))): _*).as(hllCol(c))
        } ++
        spec.hists.map { c =>
          array((0 until HistBins).map(j =>
            sum(when(col(s"_bin_$c") === j, 1L).otherwise(0L))): _*)
            .as(histCol(c))
        } ++
        spec.quants.map { c =>
          // the one typed-buffer aggregate: mixing it in switches the
          // operator to ObjectHashAggregate, still ONE pass and ONE
          // shuffle with map-side partials for every family at once
          graft.functions.expressions.SketchAggs
            .bottomK(col("_qh"), col(s"_qv_$c"), spec.quantK)
            .as(quantCol(c))
        }
    prep.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of partial rows per group into one — the
    * associative fold. Counts/sums add, min/max fold, register
    * vectors take the element-wise max.
    */
  def merge(parts: DataFrame, spec: Spec): DataFrame = {
    val aggs: Seq[Column] =
      Seq(sum(col("n")).as("n")) ++
        spec.sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        spec.minMax.flatMap(c =>
          Seq(min(col(s"min_$c")).as(s"min_$c"),
            max(col(s"max_$c")).as(s"max_$c"))) ++
        spec.distincts.map { c =>
          // element-wise max across the group's vectors: fold the
          // collected list — at most one row per input snapshot/batch
          // per group, so the list is tiny and max is order-free
          aggregate(
            collect_list(col(hllCol(c))),
            array_repeat(lit(0), Hll.M),
            (acc, x) => zip_with(acc, x, (a, b) => greatest(a, b)))
            .as(hllCol(c))
        } ++
        spec.hists.map { c =>
          // histograms merge by element-wise ADD — order-free likewise
          aggregate(
            collect_list(col(histCol(c))),
            array_repeat(lit(0L), HistBins),
            (acc, x) => zip_with(acc, x, (a, b) => a + b))
            .as(histCol(c))
        } ++
        spec.quants.map { c =>
          // bottom-k of a union IS bottom-k of the parts' bottom-ks:
          // flatten the (≤ one per snapshot/batch) arrays, sort by
          // (h, v) — array_sort orders structs field-wise — keep k
          slice(array_sort(flatten(collect_list(col(quantCol(c))))),
            1, spec.quantK).as(quantCol(c))
        }
    parts.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The HLL estimate read off a maintained register vector —
    * IDENTICAL arithmetic to [[graft.operators.Hll.estimate]] (which
    * consumes one row per occupied register): the same exact integer
    * Σ2^(RhoMax−mj), the same single double division, the same
    * linear-counting fallback.
    */
  def estimateFromVector(vec: Column): Column = {
    val sp = aggregate(filter(vec, mj => mj > 0),
      lit(0L).cast("decimal(38,0)"),
      (acc, mj) => acc + call_function("shiftleft", lit(1L),
        (lit(Hll.RhoMax) - mj).cast("int")).cast("decimal(38,0)"))
    val nb = size(filter(vec, mj => mj > 0)).cast("long")
    val v = lit(Hll.M.toLong) - nb
    val sTot = (sp + v.cast("decimal(38,0)") *
      lit(Hll.Scale).cast("decimal(38,0)")).cast("double")
    val eRaw = lit(Hll.Num) / sTot
    val est = when(eRaw <= lit(2.5 * Hll.M) && v > 0,
      lit(Hll.M.toDouble) * log(lit(Hll.M.toDouble) / v.cast("double")))
      .otherwise(eRaw)
    floor(est + 0.5).cast("long")
  }

  /** The q-quantile (q = qNum/qDen) read off a maintained log2
    * histogram: find the bin where the cumulative count reaches
    * rank ⌈q·n⌉ and return its inclusive upper bound 2^bin − 1 —
    * always ≥ the true quantile and < 2× it (bin 0 returns 0). One
    * integer fold over the 64-length vector, deterministic in any
    * engine. Empty histogram → 0.
    */
  def quantileFromHist(h: Column, qNum: Int, qDen: Int): Column = {
    require(qNum >= 0 && qDen > 0 && qNum <= qDen, s"bad quantile $qNum/$qDen")
    val n = aggregate(h, lit(0L), (a, x) => a + x)
    val rank = floor((n * qNum + (qDen - 1)).cast("decimal(38,0)") / qDen)
      .cast("long")
    // fold state: (cumulative count, found bin or -1, running index)
    val folded = aggregate(h,
      struct(lit(0L).as("cum"), lit(-1).as("bin"), lit(0).as("i")),
      (acc, x) => struct(
        (acc.getField("cum") + x).as("cum"),
        when(acc.getField("bin") >= 0, acc.getField("bin"))
          .when(acc.getField("cum") + x >= rank, acc.getField("i"))
          .otherwise(lit(-1)).as("bin"),
        (acc.getField("i") + 1).as("i")))
    val bin = folded.getField("bin")
    when(n === 0 || bin <= 0, lit(0L))
      .otherwise(call_function("shiftleft", lit(1L), bin) - 1L)
  }

  /** The q-quantile read off a maintained bottom-k sample: the exact
    * linearly-interpolated quantile OVER THE SAMPLE's values —
    * r = q·(n−1) on the ascending values, result = v⌊r⌋ +
    * (v⌊r⌋₊₁ − v⌊r⌋)·(r − ⌊r⌋), the quantile_cont definition written
    * out operation-for-operation so the DuckDB oracle can replay the
    * identical IEEE arithmetic (see q97Sql's smp CTEs). Null for an
    * empty sample. Within the sample this is exact; as an estimate of
    * the data quantile it carries the sample's ~1/√k rank error.
    */
  def quantileFromSample(s: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"bad quantile $q")
    val vals = array_sort(transform(s, x => x.getField("v")))
    val n = size(vals)
    val r = lit(q) * (n - 1).cast("double")
    val lo = floor(r).cast("int")
    val frac = r - floor(r)
    val vLo = element_at(vals, lo + 1)
    val vHi = element_at(vals, least(lo + 2, n))
    when(n === 0, lit(null).cast("double"))
      .otherwise(vLo + (vHi - vLo) * frac)
  }

  /** Human-readable view of a maintained snapshot: register vectors
    * finalized to `nd_<c>` distinct estimates, histograms to
    * `p50_<c>`/`p99_<c>` quantile bounds, bottom-k samples to
    * `p50s_<c>`/`p99s_<c>` sampled quantiles, everything else passed
    * through ([[quantileFromHist]]/[[quantileFromSample]] serve other
    * ranks).
    */
  def report(snapshot: DataFrame, spec: Spec): DataFrame = {
    val withNd = spec.distincts.foldLeft(snapshot) { (acc, c) =>
      acc.withColumn(s"nd_$c", estimateFromVector(col(hllCol(c))))
        .drop(hllCol(c))
    }
    val withHist = spec.hists.foldLeft(withNd) { (acc, c) =>
      acc
        .withColumn(s"p50_$c", quantileFromHist(col(histCol(c)), 1, 2))
        .withColumn(s"p99_$c", quantileFromHist(col(histCol(c)), 99, 100))
        .drop(histCol(c))
    }
    spec.quants.foldLeft(withHist) { (acc, c) =>
      acc
        .withColumn(s"p50s_$c", quantileFromSample(col(quantCol(c)), 0.5))
        .withColumn(s"p99s_$c", quantileFromSample(col(quantCol(c)), 0.99))
        .drop(quantCol(c))
    }
  }

  /** Fold one batch into the stats snapshot at `targetPath` and
    * publish atomically ([[Snapshot]] two-rename swap). The merge
    * reads the snapshot (group-count-sized, NOT corpus-sized) and the
    * batch's partials only.
    */
  def maintain(spark: SparkSession, targetPath: String, batch: DataFrame,
               spec: Spec): Stats =
    maintainImpl(spark, targetPath, batch, spec, batchId = None).get

  /** [[maintain]] with EXACTLY-ONCE semantics for replayed batches
    * (the Structured Streaming micro-batch contract): the applied-
    * batch ledger lives INSIDE the snapshot directory (`_applied`, an
    * underscore file parquet readers ignore) and is written into the
    * temp directory BEFORE the atomic swap — so the folded data and
    * the record of its folding become visible in the same rename and
    * no crash can separate them. This matters here and not for the
    * SCD sinks: scd2/upsert re-merges are no-ops by construction,
    * but stats folding is ADDITIVE — replaying a batch would double-
    * count, so the sidecar-ledger pattern (external file, written
    * after publish) has a real double-apply window this design
    * closes. Returns None when the ledger says the batch already
    * applied (no job runs).
    *
    * `legacyBatchIds`: ADDITIONAL ids that mean "this batch already
    * applied" — for ledgers written under a superseded id scheme
    * (CorpusPrep's pre-widening 32-bit ids). They are checked against
    * the ledger INSIDE the maintainer lock, after crash recovery —
    * a caller-side pre-probe would read the ledger without recovery
    * (a mid-swap crash leaves it under the retired directory → probe
    * misses → double count) and outside the single-writer exclusion.
    * Only `batchId` is ever RECORDED; legacy ids are read-only.
    */
  def maintainBatch(spark: SparkSession, targetPath: String, batch: DataFrame,
                    spec: Spec, batchId: Long,
                    legacyBatchIds: Set[Long] = Set.empty): Option[Stats] =
    maintainImpl(spark, targetPath, batch, spec, Some(batchId), legacyBatchIds)

  final case class RetractStats(victimRows: Long, groups: Long,
                                groupsDropped: Long)

  /** Right-to-be-forgotten for the AGGREGATE view — the retraction
    * face of the additive families (row-holding artifacts tombstone +
    * compact; an additive view SUBTRACTS). `victimRows` must be
    * exactly rows previously folded — their n/sum/histogram
    * contributions are reversed EXACTLY (decimal sums, integer
    * counts — the result is bit-identical to having never folded
    * them, the same associative-fold invariant maintain() carries),
    * and a group whose count reaches zero is DROPPED from the
    * snapshot. The previously-folded contract is GUARDED as far as
    * the folded state can tell: a retraction that would drive any
    * group's count or any histogram bin negative, or that zeroes a
    * group's count while sums/bins remain nonzero, refuses loudly
    * before publishing (a value-level mismatch that stays inside
    * those invariants is indistinguishable from valid input by
    * construction — only the caller knows which rows were folded).
    * An empty victim set is a free no-op (no job, no publish, no
    * fabricated snapshot).
    *
    * What CANNOT be retracted, stated plainly: min/max and the HLL
    * register vectors are max-folds — irreversible by construction
    * (the information to "un-max" is deliberately not stored; that
    * is what makes them mergeable at 100 TB). A spec carrying those
    * families refuses — rebuild the view over the surviving corpus
    * instead, or maintain a retractable spec alongside. That is also
    * the honest story for [[CorpusPrep]]'s own stats view: its spec
    * carries min/max(n_tokens), so corpus RTBF refreshes that view by
    * rebuild, not retraction — retract() serves views whose spec
    * stays within the additive families. Note the sketches hold only
    * hashes, never payloads — the refusal is about STALENESS of the
    * stats, not about victim content surviving.
    *
    * Replay: retraction is additive-negative, so a replayed retract
    * double-subtracts — and unlike a replayed fold, the damage is
    * SILENT whenever the second subtraction happens not to trip the
    * negative-count/bin guard (large groups absorb it). That hazard
    * must not be scaladoc-only, so [[retractBatch]] (the in-snapshot
    * ledger) is the PRIMARY face, and this unledgered face demands
    * the caller acknowledge at-most-once delivery explicitly:
    * `deliveredAtMostOnce = true` says "this call site cannot be
    * crash-replayed" (a driver-side one-shot job, a test). Anything
    * driven by a retrying scheduler or a streaming sink uses
    * [[retractBatch]]. Ledgered folds and retractions share ONE id
    * space per snapshot.
    */
  def retract(spark: SparkSession, targetPath: String,
              victimRows: DataFrame, spec: Spec,
              deliveredAtMostOnce: Boolean): RetractStats = {
    require(deliveredAtMostOnce,
      "unledgered retraction double-subtracts SILENTLY under " +
        "crash-replay delivery — pass deliveredAtMostOnce = true only " +
        "if this call site cannot replay; otherwise use retractBatch")
    retractImpl(spark, targetPath, victimRows, spec, batchId = None).get
  }

  /** [[retract]] with exactly-once replay semantics (the
    * [[maintainBatch]] in-snapshot ledger).
    */
  def retractBatch(spark: SparkSession, targetPath: String,
                   victimRows: DataFrame, spec: Spec,
                   batchId: Long): Option[RetractStats] =
    retractImpl(spark, targetPath, victimRows, spec, Some(batchId))

  private def retractImpl(spark: SparkSession, targetPath: String,
                          victimRows: DataFrame, spec: Spec,
                          batchId: Option[Long]): Option[RetractStats] = {
    require(spec.minMax.isEmpty && spec.distincts.isEmpty,
      "stats retraction: min/max and HLL register vectors are " +
        "max-folds — irreversible by construction; rebuild the view " +
        "over the surviving corpus for those families")
    require(spec.quants.isEmpty,
      "stats retraction: the bottom-k quantile sample is a min-fold — " +
        "a victim inside the sample cannot be un-sampled (the k+1-th " +
        "row was deliberately not stored); rebuild the view over the " +
        "surviving corpus, the min/max contract")
    // a victim set that turns out empty must not pay a full
    // read-merge-publish rewrite — or, against a path never
    // maintained, FABRICATE an empty snapshot out of nothing
    if (victimRows.isEmpty) return Some(RetractStats(0L, 0L, 0L))
    maintainImpl(spark, targetPath, victimRows, spec, batchId,
      sign = -1).map(s =>
      RetractStats(victimRows = s.batchRows, groups = s.groups,
        groupsDropped = -s.newGroups))
  }

  private def appliedFile(dir: String) =
    new Path(dir, "_applied")

  /** Batch ids already folded into the snapshot at `targetPath`. */
  def appliedBatches(spark: SparkSession, targetPath: String): Set[Long] = {
    val p = appliedFile(targetPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map(_.toLong).toSet
      finally in.close()
    }
  }

  private def maintainImpl(spark: SparkSession, targetPath: String,
                           batch: DataFrame, spec: Spec,
                           batchId: Option[Long],
                           legacyBatchIds: Set[Long] = Set.empty,
                           sign: Int = 1)
      : Option[Stats] = {
    val fs = new Path(targetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the lock spans the WHOLE read-merge-write cycle, not just the
    // publish: stats folding is additive, so a second maintainer
    // reading the snapshot before this one publishes would silently
    // discard this fold (lost update) — it must fail at acquisition
    Snapshot.withMaintainerLock(fs, targetPath) { lease =>
      val exists = Snapshot.recoverAndExists(fs, targetPath, lease)
      // the ledger is read (and re-written below) even for un-ledgered
      // maintain() calls: a mixed sequence — maintainBatch, maintain,
      // crash, replay — must still find the ids the earlier batches
      // recorded, or the replay double-applies them
      val applied =
        if (exists) appliedBatches(spark, targetPath) else Set.empty[Long]
      if (batchId.exists(applied.contains) ||
          legacyBatchIds.exists(applied.contains)) None
      else {
        // delta is group-count-sized: cache it so the batch (the
        // corpus-sized side) is scanned exactly ONCE — batchRows reads
        // off the cached partials, never the batch again
        val deltaPos = partials(batch, spec).cache()
        // retraction (sign < 0): the additive families negate — the
        // merge then SUBTRACTS them (decimal/integer exact). minMax/
        // distincts are require()d empty by the retract face.
        val delta = if (sign >= 0) deltaPos
        else deltaPos.select(
          spec.keys.map(col) ++
            Seq((-col("n")).as("n")) ++
            spec.sums.map(c => (-col(s"sum_$c")).as(s"sum_$c")) ++
            spec.hists.map(c =>
              transform(col(histCol(c)), x => -x).as(histCol(c))): _*)
        // ONE merge computation: the retraction guard and the output
        // both derive from this cached frame (group-count-sized)
        val merged =
          (if (exists) merge(spark.read.parquet(targetPath).unionByName(delta), spec)
           else merge(delta, spec)).cache()
        val out = if (sign >= 0) merged
                  // fully-retracted groups VANISH (guarded below)
                  else merged.filter(col("n") > 0)
        try {
          if (sign < 0) {
            // every violation the folded state CAN detect, one pass:
            // a negative count, a negative histogram bin (bin counts
            // are never legitimately negative), or a zeroed group
            // with nonzero residue (its row would silently vanish
            // while logically still holding data) all mean the
            // victims were not exactly previously-folded rows
            val arrayHas = org.apache.spark.sql.functions.exists _
            val histBad = spec.hists.map(c =>
              arrayHas(col(histCol(c)), x => x < 0L))
              .foldLeft(lit(false))(_ || _)
            val sumBad = spec.sums.map(c => col(s"sum_$c") =!= 0)
              .foldLeft(lit(false))(_ || _)
            val histNonzero = spec.hists.map(c =>
              arrayHas(col(histCol(c)), x => x =!= 0L))
              .foldLeft(lit(false))(_ || _)
            val bad = col("n") < 0 || histBad ||
              (col("n") === 0 && (sumBad || histNonzero))
            require(merged.filter(bad).limit(1).count() == 0L,
              "stats retraction does not match the folded " +
                "contributions for at least one group (negative count " +
                "or histogram bin, or a zeroed group with nonzero " +
                "residue) — victimRows must be exactly rows previously " +
                "folded into this snapshot")
          }
          val batchRows = deltaPos.agg(sum(col("n"))).head.get(0) match {
            case null => 0L
            case v: java.lang.Long => v.longValue
            case v: java.math.BigDecimal => v.longValueExact
          }
          val groups = out.count()
          val newGroups =
            if (exists)
              groups - spark.read.parquet(targetPath).select(spec.keys.map(col): _*)
                .distinct().count()
            else groups
          Snapshot.publish(fs, targetPath, exists, out, lease, tmp => {
            val ids = applied ++ batchId
            if (ids.nonEmpty) {
              val o = fs.create(appliedFile(tmp.toString), true)
              try o.write(ids.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
              finally o.close()
            }
          })
          Some(Stats(batchRows = batchRows, groups = groups, newGroups = newGroups))
        } finally { merged.unpersist(); deltaPos.unpersist(); () }
      }
    }
  }
}
