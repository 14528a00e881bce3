package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkTestBase {

  private def resolveMap(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clusters.resolve(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find over the same pairs. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to its minimum despite no direct pair") {
    val got = resolveMap(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("long chain (diameter 200) converges within the round budget") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = resolveMap(chain)
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("contraction rounds stay logarithmic, not diameter-bound (5k chain)") {
    import spark.implicits._
    val n = 5000L
    val rounds = spark.sparkContext.longAccumulator("cc_rounds")
    val labels = Clusters.resolve(
      (0L until n).map(i => (i, i + 1)).toDF("a", "b"), "a", "b",
      rounds = Some(rounds))
    assert(labels.filter(col("rep") =!= 0L).isEmpty)
    assert(labels.count() == n + 1)
    // a diameter-5000 path resolves in ~log rounds; propagation would need 5000
    assert(rounds.value <= 20, s"took ${rounds.value} rounds")
  }

  test("multiple components, duplicate and reversed pairs, self-loops") {
    val got = resolveMap(Seq(
      (2L, 1L), (1L, 2L), (2L, 2L), (3L, 1L),
      (10L, 11L), (11L, 10L),
      (20L, 20L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L))
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 150
      val pairs = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(resolveMap(pairs) == unionFind(pairs), s"trial $trial")
    }
  }

  test("resolve works with a reliable checkpoint (the cluster deployment path)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val labels = Clusters.resolve(
        Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"), "a", "b",
        checkpoint = _.checkpoint())
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }

  test("planted hub (degree 100k) resolves without any per-node neighborhood buffer") {
    import spark.implicits._
    // a single giant near-dup component centered on a hub — the 100 TB
    // skew case: node 0 pairs with 1..100000, plus a chain hanging off the
    // last spoke so the component isn't already a star
    val n = 100000L
    val hub = (1L to n).map(i => (0L, i))
    val chain = (0L until 50L).map(i => (n + i, n + i + 1))
    val rounds = spark.sparkContext.longAccumulator("hub_rounds")
    val labels = Clusters.resolve(
      (hub ++ chain).toDF("a", "b"), "a", "b", rounds = Some(rounds))
    assert(labels.filter(col("rep") =!= 0L).isEmpty,
      "every node of the hub component must label to the minimum (0)")
    assert(labels.count() == n + 51)
    assert(rounds.value <= 20, s"took ${rounds.value} rounds")
  }

  test("star rounds are join-based: no collect_set/ObjectHashAggregate buffer in the plan") {
    import spark.implicits._
    val edges = Seq((5L, 2L), (9L, 2L), (9L, 7L)).toDF("u", "v")
    for (step <- Seq(Clusters.largeStar(edges), Clusters.smallStar(edges))) {
      val plan = step.queryExecution.executedPlan.toString
      assert(!plan.contains("collect_set") && !plan.contains("ObjectHashAggregate"),
        s"star contraction must not materialize a per-node neighborhood buffer:\n$plan")
    }
  }

  test("largeStar/smallStar preserve (hi, lo) orientation") {
    import spark.implicits._
    val edges = Seq((5L, 2L), (9L, 2L), (9L, 7L), (4L, 3L))
      .toDF("u", "v")
    for (step <- Seq(Clusters.largeStar(edges), Clusters.smallStar(edges))) {
      val rows = step.collect()
      assert(rows.forall(r => r.getLong(0) > r.getLong(1)))
    }
  }

  test("resolveKeepBest keeps the quality argmax, not the min id") {
    import spark.implicits._
    // two clusters: {1,2,3} (transitive via 2) and {10,11}; best members
    // are 3 and 10 — one of them NOT the min-id representative
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val scores = Seq(
      (1L, 0.2), (2L, 0.5), (3L, 0.9), (10L, 0.7), (11L, 0.7))
      .toDF("doc_id", "q")
    val got = Clusters.resolveKeepBest(pairs, "a", "b", scores, "doc_id", "q")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // membership matches resolve(); exactly one keeper per cluster
    assert(got.map(t => t._1 -> t._2).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val keepers = got.filter(_._4 == 1).map(t => t._2 -> t._1).toMap
    assert(keepers == Map(1L -> 3L, 10L -> 10L),
      s"keepers must be the (quality, then min-id) argmax: $keepers")
    assert(got.groupBy(_._2).values.forall(_.count(_._4 == 1) == 1),
      "exactly one keeper per cluster")
  }

  test("resolveKeepBest keeps unscored members in their cluster, never as keeper over a scored one") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val scores = Seq((2L, 0.4)).toDF("doc_id", "q") // 1 and 3 unscored
    val got = Clusters.resolveKeepBest(pairs, "a", "b", scores, "doc_id", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L),
      "unscored members must keep their cluster membership")
    val keepers = got.filter(_._4 == 1)
    assert(keepers.map(_._1).toSeq == Seq(2L),
      s"the only scored member must be the keeper: ${keepers.toSeq}")
  }
}
