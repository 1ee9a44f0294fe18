package graft

import graft.operators.SimJoin
import org.apache.spark.sql.DataFrame

/** Exactness pins for the AllPairs similarity join (q96). The oracle
  * already brute-forces the semantics in DuckDB; these pin the SAME
  * no-false-negative property against a driver-side reference on
  * fixtures the synthetic corpus doesn't exercise (threshold-edge
  * ties, fuzzed vocab mixes), plus the scale plan shape.
  */
class SimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  /** Driver reference: the exact shingle-set Jaccard join, sharing
    * nothing with the Spark path but the published tokenization rule
    * (lowercase, whitespace-split, distinct space-joined n-grams).
    */
  private def ref(rows: Seq[(Long, String)], n: Int, tNum: Int, tDen: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.replaceAll("\\s+", " ")
        .split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < n) Set.empty
      else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toSet
    }
    val sets = rows.map { case (id, t) => id -> shingles(Option(t).getOrElse("")) }
      .filter(_._2.nonEmpty)
    for {
      (ia, sa) <- sets
      (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * tDen >= tNum * union
    } yield (ia, ib, inter, union, inter * 1000000000L / union)
  }

  private def run(rows: Seq[(Long, String)], n: Int, tNum: Int, tDen: Int) = {
    val sc = SimJoin.joinPairsScoped(docs(rows: _*), n, tNum, tDen)
    try sc.df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    finally sc.release()
  }

  test("hand fixture: near-dup pair found with exact counts, distinct doc excluded") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val rows = Seq(
      1L -> base,
      2L -> (base + " tail"),      // one extra token -> high overlap
      3L -> "completely different words that share no trigram at all")
    val got = run(rows, 3, 3, 5)
    val want = ref(rows, 3, 3, 5).sortBy(p => (p._1, p._2))
    assert(got == want, s"got $got want $want")
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"$got")
  }

  test("threshold edge: a pair at exactly t qualifies (integer compare, no float)") {
    // construct sets with inter*den == num*union: 12 shared shingles,
    // union 20 -> jac = 12/20 = 3/5 exactly. 14-token overlap gives 12
    // shared trigrams; 4 distinct leading tokens on each side add 4
    // unique shingles each: union = 12 + 4 + 4 = 20.
    val shared = (1 to 14).map(i => s"c$i").mkString(" ")
    val rows = Seq(
      1L -> s"a1 a2 a3 a4 $shared",
      2L -> s"b1 b2 b3 b4 $shared")
    // per side: 16 distinct shingles (2 bridging + 2 own-prefix... the
    // reference computes the truth; assert agreement AND inclusion
    val got = run(rows, 3, 3, 5)
    val want = ref(rows, 3, 3, 5)
    assert(got == want.sortBy(p => (p._1, p._2)), s"got $got want $want")
    assert(got.nonEmpty, "edge pair must be included")
    val (_, _, i, u, _) = got.head
    assert(i * 5 == 3 * u, s"fixture not at the exact threshold: $i/$u")
  }

  test("fuzz: prefix-filtered join equals brute force on 60 vocab-mixed docs") {
    val rnd = new scala.util.Random(96)
    val vocab = (1 to 30).map(i => s"w$i")
    val rows = (1L to 60L).map { id =>
      val len = 5 + rnd.nextInt(20)
      val base = (0 until len).map(_ => vocab(rnd.nextInt(vocab.length)))
      // make some docs near-copies of earlier ones to force pairs
      val text =
        if (id % 5 == 0) (base.take(2) ++ base).mkString(" ")
        else base.mkString(" ")
      id -> text
    }
    // seeded copies: doc id and id+30 share most text
    val withCopies = rows.map { case (id, t) =>
      if (id > 30 && id % 3 == 0) (id, rows((id - 31).toInt)._2 + " x y z")
      else (id, t)
    }
    for ((tn, td) <- Seq((3, 5), (4, 5), (1, 2))) {
      val got = run(withCopies, 3, tn, td)
      val want = ref(withCopies, 3, tn, td).sortBy(p => (p._1, p._2))
      assert(got == want, s"t=$tn/$td: got ${got.size} want ${want.size}\n$got\n$want")
    }
  }

  test("q96 plan: shingle strings die map-side — no exchange carries a string or array") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // the LAZY operator form: the registered q96 wrapper returns an
    // eagerly checkpointed frame (its plan is a LogicalRDD scan), so
    // the plan pin inspects the operator it materializes
    val sc = SimJoin.joinPairsScoped(Tables(spark, sf).documents,
      queries.SimQ.SimShingle, queries.SimQ.SimNum, queries.SimQ.SimDen)
    try {
      val qe = sc.df.queryExecution
      val plan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty)
      // shingle STRINGS must die map-side (the md5-64 projection);
      // arrays of LONG hashes are the r12 verify stage's designed
      // payload (one doc-array row per candidate instead of |doc|
      // expanded rows) — so the pin forbids strings and string
      // arrays anywhere in an exchange, and long arrays are expected
      exchanges.foreach(e =>
        assert(!e.output.exists(a => a.dataType == StringType ||
          (a.dataType match {
            case ArrayType(et, _) => et == StringType
            case _ => false
          })),
          s"a q96 exchange carries shingle strings: ${e.output}"))
    } finally sc.release()
  }

  test("scoped cache: release drops the shingle entry; the q96 wrapper leaves none behind") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.storage.StorageLevel
    val rows = Seq(1L -> "a b c d e f", 2L -> "a b c d e g")
    val sc = SimJoin.joinPairsScoped(docs(rows: _*), 3, 1, 2)
    val out = sc.df.localCheckpoint()
    assert(sc.cached.storageLevel != StorageLevel.NONE, "builder must cache")
    sc.release()
    assert(sc.cached.storageLevel == StorageLevel.NONE, "release must drop the entry")
    assert(out.count() >= 1, "checkpointed result survives the release")
    // the REGISTERED wrapper: run it, then probe the cache manager with
    // the exact canonicalized plan its internal cache was keyed on — a
    // leaked entry would answer the storageLevel lookup (Dataset
    // .storageLevel resolves through CacheManager by plan equality)
    assert(queries.SimQ.q96(spark, sf).count() >= 0)
    val probe = SimJoin.shingleFrame(Tables(spark, sf).documents,
      queries.SimQ.SimShingle, col("doc_id"), col("text"))
    assert(probe.storageLevel == StorageLevel.NONE,
      "q96 leaked its shingle cache entry into the session")
  }
}
