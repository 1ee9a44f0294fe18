package graft

import graft.operators.Search
import org.apache.spark.sql.DataFrame

/** Fixture pins for the positional phrase kernel (q99): overlap
  * convention, multi-term chains, and the plan's term-filtered
  * postings. The oracle carries corpus-level exactness.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def run(d: DataFrame, terms: String*): Map[Long, (Long, Long)] =
    Search.phrase(d, terms).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("two-term phrase: counts, positions, overlap convention, case/whitespace normalization") {
    val d = docs(
      1L -> "x batch stream y batch stream",   // two separate matches
      2L -> "batch batch stream",              // one (at pos 2)
      3L -> "stream batch",                    // reversed: none
      4L -> "  Batch\tSTREAM extra",           // normalization -> pos 1
      5L -> "batch",                           // incomplete
      6L -> "")
    val got = run(d, "batch", "stream")
    assert(got == Map(
      1L -> (2L, 2L),
      2L -> (1L, 2L),
      4L -> (1L, 1L)), s"$got")
  }

  test("repeated-term phrase overlaps count: 'a a a a' holds 'a a' three times") {
    val got = run(docs(1L -> "a a a a", 2L -> "a b a"), "a", "a")
    assert(got == Map(1L -> (3L, 1L)), s"$got")
  }

  test("three-term chain: only full consecutive runs match") {
    val d = docs(
      1L -> "q batch stream merge w",
      2L -> "batch stream x merge",        // broken chain
      3L -> "batch stream merge batch stream merge")
    val got = run(d, "batch", "stream", "merge")
    assert(got == Map(1L -> (1L, 2L), 3L -> (2L, 1L)), s"$got")
  }

  test("fuzz: phrase counts equal a driver scan over 200 random docs and phrases") {
    val rnd = new scala.util.Random(99100)
    val vocab = Vector("a", "b", "c", "d")   // tiny vocab -> dense matches
    val rows = (1L to 200L).map { id =>
      id -> (0 until 3 + rnd.nextInt(25))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val d = docs(rows: _*)
    (1 to 5).foreach { _ =>
      val plen = 1 + rnd.nextInt(3)
      val phrase = (0 until plen).map(_ => vocab(rnd.nextInt(vocab.length)))
      val got = run(d, phrase: _*)
      val want = rows.flatMap { case (id, text) =>
        val toks = text.split(" ").toSeq
        val hits = (0 to toks.length - plen)
          .filter(i => toks.slice(i, i + plen) == phrase)
        if (hits.isEmpty) None
        else Some(id -> (hits.length.toLong, hits.min.toLong + 1))
      }.toMap
      assert(got == want, s"phrase $phrase: got $got want $want")
    }
  }

  test("q99 plan: postings are term-filtered map-side — exchanges carry no strings") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val qe = queries.SearchQ.q99(spark, sf).queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty)
    exchanges.foreach(e =>
      assert(!e.output.exists(a => a.dataType == StringType ||
        a.dataType.isInstanceOf[ArrayType]),
        s"a q99 exchange carries strings/arrays: ${e.output}"))
  }
}
