package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchy flattening (transitive closure to the root) as a REAL
  * operator — the production form q92 pins as a fixed-depth oracle
  * face (queries/CoreB.scala q92): org charts, BOM explosion,
  * category trees — the recursive-CTE workload Spark has no native
  * recursion for.
  *
  * POINTER DOUBLING with CONVERGENCE DETECTION: each round every
  * node's known-ancestor pointer jumps twice as far (one self-equi-
  * join on the id key, depths add), so depth d settles in ⌈log₂ d⌉
  * rounds — and unlike q92's fixed 6-round unroll, the loop STOPS
  * when a round moves no pointer (every node's ancestor is a root)
  * and FAILS LOUDLY when the round budget is exhausted with pointers
  * still moving, which for any acyclic input can only mean depth >
  * 2^maxRounds and for a cyclic input is the only correct answer
  * (a cycle never reaches a root; q92's silent wrong answer past
  * depth 64 was the gap this closes).
  *
  * Scale shape (the q53 label-propagation discipline): per round ONE
  * co-keyed exchange of (id, anc, d) triples; the round state is
  * cached and the previous round unpersisted (no recompute
  * cascade), lineage is truncated by a localCheckpoint every
  * [[CheckpointEvery]] rounds (the plan otherwise doubles per round —
  * q92's documented caveat), and the driver sees only a per-round
  * moved COUNT, never data. The returned frame is checkpointed, so
  * consuming it never re-runs the loop.
  */
object Hierarchy {

  /** Truncate lineage this often: rarely reached (a 10¹²-node
    * taxonomy settles in ~40 doubling rounds; real trees in ≤ 6), but
    * without it a deep chain's plan tree doubles per round.
    */
  val CheckpointEvery = 8

  /** Flatten `nodes` (one row per node: id + parent, parent NULL for
    * roots) to (id, root_id, depth), ordered by id.
    *
    * @param maxRounds loud-failure budget: acyclic inputs of depth ≤
    *   2^maxRounds always converge inside it, so the default 64 can
    *   only trip on a CYCLE (or a parent pointing at a missing id —
    *   see the require below). Lower it when a domain bound is known
    *   (6 covers depth 64, any org chart).
    */
  def closure(nodes: DataFrame,
              idCol: Column = col("id"),
              parentCol: Column = col("parent"),
              maxRounds: Int = 64): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    // roots point at themselves with depth 0: the doubling join is
    // then TOTAL (a settled node joins the root's self-row and adds
    // 0) — no null arms, and "moved" is simply "joined a row that
    // still had distance to go" (p_d > 0)
    var st = nodes.select(
        idCol.as("id"),
        coalesce(parentCol, idCol).as("anc"),
        when(parentCol.isNull, 0L).otherwise(1L).as("d"))
      .cache()
    var round = 0
    var moved = 1L
    try {
      while (moved > 0) {
        round += 1
        if (round > maxRounds)
          throw new IllegalStateException(
            s"hierarchy closure did not converge in $maxRounds doubling " +
              s"rounds (covers depth <= 2^$maxRounds): the parent graph " +
              "has a cycle, or parents reference missing ids")
        val p = st.select(col("id").as("p_id"), col("anc").as("p_anc"),
          col("d").as("p_d"))
        // INNER join: a dangling parent (anc references no node row)
        // would silently DROP its whole subtree here — refuse instead,
        // via the row-conservation check below (count is free: it
        // shares the cached round frame with the moved-sum)
        val next = st.join(p, st("anc") === p("p_id"))
          .select(col("id"), col("p_anc").as("anc"),
            (col("d") + col("p_d")).as("d"),
            (col("p_d") > 0).cast("long").as("_moved"))
        val ck = if (round % CheckpointEvery == 0) next.localCheckpoint(true)
                 else next.cache()
        val agg = ck.agg(sum(col("_moved")), count(lit(1))).head()
        moved = if (agg.isNullAt(0)) 0L else agg.getLong(0)
        val before = st
        st = ck.drop("_moved")
        val after = agg.getLong(1)
        if (round == 1) {
          val n = before.count()
          if (after != n) {
            throw new IllegalArgumentException(
              s"hierarchy closure: $n nodes but $after survived the " +
                "ancestor join — some parent ids reference missing nodes")
          }
        }
        before.unpersist()
      }
      // truncate the iterative lineage and release the loop cache: the
      // returned plan must not re-run the doubling (q53 discipline)
      val out = st
        .select(col("id"), col("anc").as("root_id"),
          col("d").cast("bigint").as("depth"))
        .orderBy(col("id"))
        .localCheckpoint(true)
      out
    } finally { st.unpersist(); () }
  }
}
