package graft

import graft.operators.Hierarchy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The general hierarchy-closure operator (the production form of
  * q92's fixed-depth unroll): convergence detection past any fixed
  * round budget, loud cycle failure, dangling-parent refusal, and
  * agreement with q92's unroll on its own injected forest.
  */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def nodes(rows: (Long, Option[Long])*): DataFrame =
    rows.toSeq.toDF("id", "parent")

  private def got(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("depth > 64: a 200-node chain settles (q92's 6-round unroll could not)") {
    // node 0 is the root; node i hangs off i-1 — depth 199 needs
    // ceil(log2(199)) = 8 doubling rounds plus the convergence pass
    val chain = (0L to 199L).map(i =>
      i -> (if (i == 0) None else Some(i - 1)))
    val out = got(Hierarchy.closure(nodes(chain: _*)))
    assert(out == (0L to 199L).map(i => (i, 0L, i)),
      s"chain closure wrong: ${out.take(5)}...")
  }

  test("forest parity: closure == q92's unroll rule on the same injected forest") {
    // the q92 parent rule over 0..499: roots 0-6, parent = id DIV 3 - 2
    val forest = (0L until 500L).map(i =>
      i -> (if (i < 7) None else Some(i / 3 - 2)))
    val out = got(Hierarchy.closure(nodes(forest: _*)))
    // driver reference walk
    val parent = forest.toMap
    def walk(i: Long): (Long, Long) = {
      var (n, d) = (i, 0L)
      while (parent(n).isDefined) { n = parent(n).get; d += 1 }
      (n, d)
    }
    val want = (0L until 500L).map { i => val (r, d) = walk(i); (i, r, d) }
    assert(out == want)
  }

  test("cycle fails loudly at the round budget instead of reporting a bogus root") {
    val cyc = nodes(1L -> Some(2L), 2L -> Some(1L), 3L -> None)
    val e = intercept[IllegalStateException] {
      Hierarchy.closure(cyc, maxRounds = 6).collect()
    }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  test("dangling parent (missing id) refuses instead of silently dropping the subtree") {
    val dangling = nodes(1L -> None, 2L -> Some(1L), 3L -> Some(99L))
    val e = intercept[IllegalArgumentException] {
      Hierarchy.closure(dangling).collect()
    }
    assert(e.getMessage.contains("missing"), e.getMessage)
  }

  test("degenerate shapes: all roots, single node, empty input") {
    assert(got(Hierarchy.closure(nodes(1L -> None, 2L -> None))) ==
      Seq((1L, 1L, 0L), (2L, 2L, 0L)))
    assert(got(Hierarchy.closure(nodes(5L -> None))) == Seq((5L, 5L, 0L)))
    assert(got(Hierarchy.closure(nodes())) == Seq.empty)
  }

  test("loop caches are released: no round state outlives the call") {
    import org.apache.spark.storage.StorageLevel
    val chain = (0L to 40L).map(i => i -> (if (i == 0) None else Some(i - 1)))
    val d = nodes(chain: _*)
    val out = Hierarchy.closure(d)
    assert(out.count() == 41)
    // the init frame's canonicalized plan must no longer be cached
    val probe = d.select(col("id"),
      coalesce(col("parent"), col("id")).as("anc"),
      when(col("parent").isNull, 0L).otherwise(1L).as("d"))
    assert(probe.storageLevel == StorageLevel.NONE,
      "closure leaked its init cache entry")
  }

  test("odd maxRounds: convergence landing exactly on the final in-budget round is observed, not mis-reported as a cycle") {
    // depth-16 chain: settles at round 4, moved==0 first observable at
    // round 5 — with maxRounds = 5 (odd), the every-2nd-round schedule
    // must force a check on the final in-budget round or the budget
    // guard would throw on a valid acyclic input
    val chain = (0L to 16L).map(i => i -> (if (i == 0) None else Some(i - 1)))
    val out = got(Hierarchy.closure(nodes(chain: _*), maxRounds = 5))
    assert(out == (0L to 16L).map(i => (i, 0L, i)),
      s"odd-budget closure wrong: ${out.take(5)}...")
  }

  test("checkpoint blocks: intermediates freed in-loop; Scoped.release frees the result's") {
    // depth 200 -> 8 doubling rounds -> the round-8 in-loop checkpoint
    // fires, so BOTH checkpoint lifecycles are exercised
    val chain = (0L to 200L).map(i => i -> (if (i == 0) None else Some(i - 1)))
    def persisted: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = persisted
    val scoped = Hierarchy.closureScoped(nodes(chain: _*))
    assert(scoped.df.count() == 201)
    val held = persisted -- before
    // everything the loop pinned is gone except the RESULT's own
    // checkpoint (localCheckpoint registers exactly one persisted RDD)
    assert(held.size == 1,
      s"loop left ${held.size} persisted RDDs behind (want 1: the result)")
    scoped.release()
    assert((persisted -- before).isEmpty,
      "Scoped.release did not free the result's checkpoint blocks")
  }
}
