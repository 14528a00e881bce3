package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Connected-component resolution over near-duplicate pair lists — the step
  * after candidate generation that every dedup pipeline needs: pair lists
  * ([[Dedup.minhashPairs]] et al.) say "a ~ b", but what a corpus keeps is
  * one representative per transitive CLUSTER (a ~ b ~ c collapses to one
  * document even when (a, c) was never emitted as a pair).
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
  * MapReduce and Beyond", SoCC 2014 — public). Each round is two
  * groupBy-explode passes over the EDGE list only; the edge set provably
  * shrinks toward a star forest in O(log² n) rounds (O(log n) observed),
  * independent of component diameter — a chain of 10⁶ near-identical crawl
  * snapshots resolves in ~20 passes, where naive label propagation needs
  * 10⁶. No driver-side data beyond a per-round 2-long convergence
  * signature; no vertex state table — the edges ARE the state.
  */
object Clusters {

  /** One large-star round: every node connects its LARGER neighbors to the
    * minimum of its neighborhood (including itself). Input edges may be in
    * any orientation; output edges are (hi, lo)-oriented and self-loop-free.
    *
    * Skew bound (round-7 rewrite): the textbook formulation collects a
    * node's whole neighborhood into one `collect_set` aggregation buffer —
    * memory ∝ the LARGEST DEGREE, so a giant near-dup component's hub
    * (millions of crawl snapshots of one page) materializes millions of
    * ids in a single row at 100 TB. Instead, aggregate only the
    * constant-size per-node minimum and JOIN it back to the edge list:
    * `(w, m)` emissions stream through the join row-by-row, no per-node
    * buffer exists anywhere, and a skewed `u` is just a skewed join key —
    * which AQE's skew-join handling already splits. Semantics are
    * IDENTICAL to the buffered form (same emitted set; the trailing
    * `distinct` dedups either way), so resolve() results are bit-equal.
    * Cost: one extra exchange of the (shrinking) edge list per round —
    * the price of a degree-independent memory bound. */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    nbrs.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** One small-star round over (hi, lo)-oriented edges: every node connects
    * its smaller neighbors (and itself) to the minimum among them. Same
    * join-based, buffer-free shape as [[largeStar]]: the `array(u)` element
    * of the buffered form becomes the `mins` self-emission branch of the
    * union. */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy(col("u")).agg(min(col("v")).as("m"))
    edges.join(mins, Seq("u"))
      .select(col("v").as("w"), col("m"))
      .union(mins.select(col("u").as("w"), col("m")))
      .filter(col("w") =!= col("m"))
      .select(col("w").as("u"), col("m").as("v"))
      .distinct()
  }

  /** True iff the (hi, lo)-oriented edge set is a star forest: every hi has
    * exactly one edge, and no node is both a hi and a lo. One aggregation +
    * one semi-join — exact, not a hash heuristic. */
  private def isStarForest(edges: DataFrame): Boolean = {
    val multiOut = edges.groupBy(col("u")).count().filter(col("count") > 1)
    val both = edges.select(col("u")).join(
      edges.select(col("v").as("u")), Seq("u"), "left_semi")
    multiOut.isEmpty && both.isEmpty
  }

  /** Unpersist a checkpointed round's blocks once a later round has
    * materialized past it. No-op for non-checkpointed plans (e.g. an
    * identity `checkpoint` in tests). Without this, a long-lived session
    * (a curation service, a bench loop) accumulates every round of every
    * invocation in the block manager until the context cleaner happens to
    * run. */
  private def freeBlocks(df: DataFrame): Unit = graft.core.Checkpoint.free(df)

  /** Resolve pairs into clusters: returns one row per node that appears in
    * `pairs`, with `rep` = the minimum id of its connected component. The
    * result is materialized through `checkpoint` before returning, so every
    * intermediate round's blocks are already freed — the caller holds ONE
    * small (id, rep) table, not the whole contraction history.
    *
    * `checkpoint` truncates the per-round plan lineage (without it the plan
    * doubles every round and analysis cost explodes). Checkpoints are LAZY
    * in local mode: each round's convergence-signature aggregation doubles
    * as its materializing action, so a round costs one job, not two.
    * (Reliable mode is always eager — Spark writes only the topmost marked
    * RDD per job, so laziness would skip the checkpoint entirely; a round
    * there pays one compute plus a cache-read DFS write.) The default
    * strategy follows the session's [[graft.core.Checkpoint]] conf:
    * `local` for local mode and tests; on a real cluster set
    * `spark.graft.checkpoint.mode=reliable` (+ a DFS dir) so a lost
    * executor doesn't kill a 20-round job (superseded rounds are freed
    * as the loop advances, so recompute can't reach back anyway). Tests
    * may still inject any strategy through the `checkpoint` parameter.
    *
    * Convergence is detected by a cheap per-round (count, hash-sum)
    * signature and then CONFIRMED by the exact star-forest predicate, so a
    * signature collision can only cost one extra round, never a wrong
    * answer. Throws if `maxIters` rounds don't converge (loud beats wrong);
    * the theoretical bound is O(log² n) rounds, so 30 covers any corpus. */
  def resolve(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 30,
      checkpoint: DataFrame => DataFrame = graft.core.Checkpoint(_, eager = false),
      rounds: Option[LongAccumulator] = None): DataFrame = {
    // materialize the pair list ONCE: nodes and the initial edge set both
    // read it, and the final label join reads nodes — without this the
    // (possibly expensive) upstream pair-generation plan runs twice
    val raw = checkpoint(pairs.select(
      col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v")))
    val nodes = raw.select(col("u").as("id"))
      .union(raw.select(col("v").as("id"))).distinct()
    var edges = checkpoint(raw
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct())

    var converged = false
    var prevSig: (Long, Long) = null
    var iters = 0
    try {
      while (!converged && iters < maxIters) {
        val next = checkpoint(smallStar(largeStar(edges)))
        // xor-fold of edge hashes: an overflow-free (ANSI-safe) set signature;
        // collisions only delay detection — the exact predicate below confirms.
        // This aggregation IS the round's materializing action (lazy checkpoint).
        val row = next.agg(
          count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
        freeBlocks(edges) // superseded: `next` is materialized past it
        edges = next
        val sig = (row.getLong(0), row.getLong(1))
        if (sig == prevSig && isStarForest(edges)) converged = true
        prevSig = sig
        iters += 1
      }
      require(converged, s"connected components did not converge in $maxIters rounds")
      rounds.foreach(_.add(iters.toLong))

      // star edges are (member, root); roots and any isolated nodes label themselves
      val out = checkpoint(
        nodes.join(edges.select(col("u").as("id"), col("v").as("rep")), Seq("id"), "left")
          .select(col("id"), coalesce(col("rep"), col("id")).as("rep")))
      out.count(): Unit // materialize so the inputs freed below aren't needed
      out
    } finally {
      // success AND failure paths: the pair list and the last materialized
      // round must never outlive the call (a curation service retrying a
      // non-converging resolve would otherwise accumulate pinned blocks)
      freeBlocks(raw)
      freeBlocks(edges)
    }
  }

  /** [[resolve]] with a QUALITY-aware survivor choice: instead of the
    * min-id representative keeping by accident of numbering, each cluster
    * keeps its highest-`scoreCol` member (ties: min id) — the keep rule a
    * curation pipeline actually wants, since near-dup clusters routinely
    * contain one clean copy and N mangled ones.
    *
    * `scores` maps `idCol` → `scoreCol` (any per-doc score: the quality
    * kernel, probe margins, …). Output: (id, cluster, score, keep) for
    * every clustered doc. Cost over [[resolve]]: one keyed join with the
    * score frame plus one per-cluster `row_number` window — cluster sizes
    * are near-dup cliques (bounded by the pair caps upstream), so the
    * window partition is small by construction. */
  def resolveKeepBest(
      pairs: DataFrame, aCol: String, bCol: String,
      scores: DataFrame, idCol: String, scoreCol: String,
      maxIters: Int = 30): DataFrame = {
    val labels = resolve(pairs, aCol, bCol, maxIters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("score").desc_nulls_last, col("id").asc)
    // LEFT join: an unscored member must stay IN its cluster (silently
    // dropping it would mis-state membership vs [[resolve]]); NULL scores
    // order last, so an unscored member never beats a scored one for keep
    labels.select(col("id"), col("rep").as("cluster"))
      .join(scores.select(col(idCol).as("id"), col(scoreCol).as("score")),
        Seq("id"), "left")
      .withColumn("__rk", row_number().over(w))
      .select(col("id"), col("cluster"), col("score"),
        (col("__rk") === 1).cast("int").as("keep"))
  }
}
