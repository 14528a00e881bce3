package graft.operators

import graft.core.Checkpoint.Ops
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — the curation signal web-crawl pipelines
  * rank sources with: PageRank (Page, Brin, Motwani, Winograd, "The
  * PageRank Citation Ranking: Bringing Order to the Web", 1999 — public).
  * CommonCrawl publishes exactly this family over its host graph, and
  * CCNet-style curation buckets domains by it; the reference has no graph
  * tier at all, so this extends SURVEY §2.3's quality-signal family.
  *
  * ALL-INTEGER iteration, the [[Probe]]/[[Similarity.kmeansCentroids]]
  * discipline: ranks are longs in units of 10⁻¹² of the total mass
  * ([[Graph.RankScale]]), every per-edge share and the damping blend are
  * integer floor-divisions, and every aggregate is a LONG sum — the whole
  * power iteration is therefore order-independent, hence BIT-REPRODUCIBLE
  * on any partitioning and any engine (the DuckDB oracle replays the
  * rounds exactly; partitioning-invariance is asserted in GraphSpec).
  *
  * 100 TB shape: per iteration, ONE ranks⋈edges shuffle join on `src`
  * plus ONE aggregation shuffle on `dst` — the standard edge-partitioned
  * PageRank; the ranks table is node-cardinality (≪ edges) and each
  * round's result is checkpointed so plan lineage stays constant across
  * iterations (the [[Clusters.resolve]] pattern, superseded rounds
  * freed). No driver-side data beyond the O(1) node count at init.
  */
object Graph {

  /** Rank scale: total rank mass = 10¹², so a rank long is a picorank.
    * Headroom: the per-edge product r·w must fit a long, so edge weights
    * up to ~9·10⁶ are safe at this scale (r ≤ 10¹²); for heavier
    * multigraph weights, pre-divide weights or lower the scale — the
    * iteration only needs the w/ow ratios. */
  val RankScale: Long = 1000000000000L

  /** Per-user consecutive-event transition edges over an item expression:
    * within each user's timeline — ordered by (ts, tie), a TOTAL and
    * deterministic order — each adjacent pair (prev → next) is one
    * transition, aggregated to (src, dst, w). Self-loops (the same item
    * twice in a row) are real transitions and are kept; the iteration
    * treats them like any edge. One user-partitioned window + one
    * aggregation — no global sort, no shuffle wider than the edge key. */
  def transitionEdges(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, item: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      .select(col(userCol), col(tsCol), col(tieCol), item.as("item"))
      .withColumn("src", lag(col("item"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("item"))
      .agg(count(lit(1)).as("w"))
      .select(col("src"), col("item").as("dst"), col("w"))
  }

  /** Damped PageRank over a weighted edge list, `iters` exact integer
    * power-iteration rounds (damping = dampNum/dampDen, default 85/100).
    *
    * Per round, with S = [[RankScale]] and N = node count:
    *   share(e)   = (r[src]·w) div ow[src]          (per edge, integer)
    *   contrib[v] = Σ share(e) over in-edges        (long sum)
    *   deach      = (Σ r over dangling nodes) div N (dangling mass split)
    *   r'[v]      = (S − (dampNum·S) div dampDen) div N
    *                + (dampNum·(contrib[v] + deach)) div dampDen
    *
    * Dangling nodes (no out-edges) redistribute their mass uniformly —
    * the standard stochastic completion — via an in-plan 1-row broadcast,
    * not a driver collect. Floor-division leaks at most a few N·iters
    * picoranks of mass; ranks ORDER is what callers consume.
    *
    * Returns (node, rank_q, rank_frac): the exact integer picorank and
    * its double fraction of total mass (one IEEE division — identical in
    * any engine). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int = 5,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the (edge, out-weight) join is ROUND-INVARIANT: materialize it
        // once and every iteration joins only the (small) ranks table
        // against it — one join per round instead of two
        val ew = e.join(outw, "src")
          .select(col("src"), col("dst"), col("w"), col("ow"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = nodes.count() // O(1) driver scalar: the node count
          require(n > 0, "pageRank over an empty edge list")
          val base = (RankScale - dampNum * RankScale / dampDen) / n
          var ranks = nodes.withColumn("r", lit(RankScale / n))
          var prev: Option[DataFrame] = None
          for (_ <- 0 until iters) {
            val contrib = ew
              .join(ranks.withColumnRenamed("node", "src"), "src")
              .select(col("dst").as("node"), expr("(r * w) div ow").as("share"))
              .groupBy(col("node")).agg(sum(col("share")).as("contrib"))
            val dang = ranks
              .join(outw.select(col("src").as("node")), Seq("node"), "left_anti")
              .agg(coalesce(sum(col("r")), lit(0L)).as("dmass"))
              .select(expr(s"dmass div ${n}L").as("deach"))
            val next = nodes
              .join(contrib, Seq("node"), "left")
              .crossJoin(broadcast(dang))
              .select(col("node"),
                (lit(base) + expr(
                  s"($dampNum * (coalesce(contrib, 0L) + deach)) div $dampDen"))
                  .as("r"))
              .graftCheckpoint()
            prev.foreach(freeBlocks)
            prev = Some(next)
            ranks = next
          }
          ranks.select(col("node"), col("r").as("rank_q"),
            (col("r").cast("double") / lit(RankScale.toDouble)).as("rank_frac"))
        } finally {
          ew.unpersist(blocking = false): Unit
          outw.unpersist(blocking = false): Unit
        }
      } finally nodes.unpersist(blocking = false): Unit
    } finally e.unpersist(blocking = false): Unit
  }

  /** Multi-source BFS: exact minimum hop distance from any seed node over
    * a directed edge list, bounded at `maxDepth` levels. Frontier
    * expansion — each round joins ONLY the newly-reached nodes against the
    * (persisted, round-invariant) edge list and anti-joins the visited
    * set, so per-round work is O(frontier · avg-degree), never O(V·E).
    * Rounds checkpoint through the session's [[graft.core.Checkpoint]]
    * strategy (the [[pageRank]] discipline) so the plan stays flat across
    * iterations; the loop count is a fixed literal, no data-dependent
    * driver actions.
    *
    * The breadth order makes the first discovery the minimum: a node in
    * frontier d has no path of length < d (it would have been discovered
    * then and anti-joined away), so (node, dist) is exactly the shortest
    * hop count ≤ maxDepth — the same answer as a recursive-CTE
    * reachability with MIN(dist), which is how the oracle checks it. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 16, s"maxDepth $maxDepth out of [1,16]")
    // null endpoints are dropped: a null "node" would re-enter every
    // frontier (anti-join equality is null-unsafe) and has no graph meaning
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val f0 = seeds.select(col(seedCol).as("node")).distinct()
        .filter(col("node").isNotNull)
        .withColumn("dist", lit(0L))
        .graftCheckpoint()
      val frontiers = scala.collection.mutable.ListBuffer(f0)
      for (d <- 1 to maxDepth) {
        val visited = frontiers.map(_.select(col("node"))).reduce(_ union _)
        val next = frontiers.last.select(col("node").as("src"))
          .join(e, "src")
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("dist", lit(d.toLong))
          .graftCheckpoint()
        frontiers += next
      }
      frontiers.map(_.select(col("node"), col("dist"))).reduce(_ unionByName _)
    } finally e.unpersist(blocking = false): Unit
  }

  /** Unpersist a superseded round's checkpoint blocks (the
    * [[Clusters]] cleanup discipline — without this a long-lived session
    * pins every round of every invocation until the context cleaner
    * runs). */
  private def freeBlocks(df: DataFrame): Unit = graft.core.Checkpoint.free(df)
}
