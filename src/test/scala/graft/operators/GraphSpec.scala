package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {

  import spark.implicits._

  private val S = Graph.RankScale

  /** Driver-side replica of one integer round — the same formula
    * [[Graph.pageRank]] documents, on plain longs. */
  private def replay(
      edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val ow = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = (S - 85L * S / 100L) / n
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 0 until iters) {
      val contrib = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (s0, _, w) => r(s0) * w / ow(s0) }.sum)
        .toMap
      val dangling = nodes.filterNot(ow.contains).map(r).sum
      val deach = dangling / n
      r = nodes.map(v =>
        v -> (base + 85L * (contrib.getOrElse(v, 0L) + deach) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node exchange matches the hand-replayed integer rounds") {
    // 1 -> 2 and 2 -> 1: mass oscillates toward the uniform fixpoint
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L))
    for (iters <- Seq(1, 3, 5))
      assert(run(edges, iters) == replay(edges, iters), s"iters=$iters")
  }

  test("dangling node redistributes its mass uniformly; authority orders as expected") {
    // 1 -> 3, 2 -> 3, 3 dangles: 3 is the authority, its mass flows back evenly
    val edges = Seq((1L, 3L, 1L), (2L, 3L, 1L))
    val got = run(edges, 5)
    assert(got == replay(edges, 5))
    assert(got(3L) > got(1L) && got(3L) > got(2L),
      s"the sink of all links must out-rank its sources: $got")
    assert(got(1L) == got(2L), "symmetric sources must tie exactly")
    // integer mass conservation: floor-division leaks at most a few
    // picoranks per node per round, never gains
    val total = got.values.sum
    assert(total <= S && total >= S - 10L * got.size * 5)
  }

  test("weighted edges split a source's mass proportionally") {
    // 1 sends 3/4 of its mass to 2 and 1/4 to 3
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val got = run(edges, 4)
    assert(got == replay(edges, 4))
    assert(got(2L) > got(3L), "the heavier edge's target must out-rank")
  }

  test("ranks are bit-identical on any partitioning (all-integer iteration)") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, (rnd.nextInt(5) + 1).toLong))
    val df = edges.toDF("src", "dst", "w")
    val a = Graph.pageRank(df, "src", "dst", "w", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Graph.pageRank(df.repartition(13), "src", "dst", "w", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    assert(run(edges, 5) == replay(edges, 5),
      "distributed integer rounds must equal the driver replay on a random graph")
  }

  test("transitionEdges: consecutive per-user pairs, ties broken by the tie column, self-loops kept") {
    val ev = Seq(
      // user 1 timeline: 10 -> 20 -> 20 (self-loop transition kept)
      (1L, 1L, 1L, 10L), (1L, 2L, 2L, 20L), (1L, 3L, 3L, 20L),
      // user 2: same ts, event_id breaks the tie -> 30 precedes 40
      (2L, 5L, 1L, 30L), (2L, 5L, 2L, 40L))
      .toDF("user_id", "ts", "event_id", "item")
    val got = Graph.transitionEdges(ev, "user_id", "ts", "event_id", col("item"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 20L, 1L), (20L, 20L, 1L), (30L, 40L, 1L)))
  }

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long], depth: Int): Map[Long, Long] =
    Graph.bfsDistances(
      edges.toDF("src", "dst"), "src", "dst",
      seeds.toDF("node"), "node", depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfsDistances: shortest hops on a chain with a shortcut, cycles safe") {
    // 1→2→3→4→5 with shortcut 1→4 and back-edge 4→1 (cycle)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (4L, 1L))
    assert(bfs(edges, Seq(1L), 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("bfsDistances: depth bound truncates, unreachable nodes are absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
    assert(bfs(edges, Seq(1L), 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // node 7/8 component unreachable from seed 1; 4 beyond depth 2
  }

  test("bfsDistances: multi-source takes the minimum over seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 4L))
    assert(bfs(edges, Seq(1L, 9L), 3) ==
      Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }
}
