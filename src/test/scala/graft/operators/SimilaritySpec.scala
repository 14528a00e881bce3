package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val query: Seq[Float] =
    embs.orderBy(col("vec_id")).limit(1).select("embedding").head().getSeq[Float](0)

  test("bruteForceTopK: self is rank 1 with cosine 1; scores descending") {
    GraftFunctions.register(spark)
    val top = Similarity.bruteForceTopK(embs, "vec_id", "embedding", query, 10).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("ivfTopK: subset of corpus with exact cosines; finds self; decent recall") {
    GraftFunctions.register(spark)
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(embs, "vec_id", "embedding", query, 20,
      nCells = 16, nprobe = 4).collect()
    assert(ivf.map(_.getLong(0)).contains(0L))
    // exact scores on returned candidates
    val bruteScores = Similarity.bruteForceTopK(embs, "vec_id", "embedding", query, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach(r => assert(math.abs(bruteScores(r.getLong(0)) - r.getDouble(1)) < 1e-12))
    val recall = ivf.map(_.getLong(0)).count(brute.contains).toDouble / 20
    assert(recall >= 0.2, s"ivf recall $recall") // nprobe 4/16 on random data
  }

  test("IVF on-disk index: probe ≡ in-memory probe, scan prunes non-probed cell partitions") {
    GraftFunctions.register(spark)
    val path = s"target/ivf_index_${System.nanoTime()}"
    val centroids = Similarity.writeIvfIndex(embs, "vec_id", "embedding", path, nCells = 16)
    val fromIndex = Similarity.ivfTopKFromIndex(
      spark, path, centroids, "vec_id", "embedding", query, k = 20, nprobe = 4)
    // identical results to the in-memory probe (same centroids, same cells)
    val inMem = Similarity.ivfTopK(embs, "vec_id", "embedding", query, 20,
      nCells = 16, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == inMem)
    // the cell filter must reach the scan as a PARTITION filter: non-probed
    // cell directories are pruned at planning time, never opened
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell filter not pushed as partition filter:\n$plan")
    val probed = Similarity.nearestCells(centroids, query, 4)
    val cellSizes = spark.read.parquet(path).groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probedScan = spark.read.parquet(path)
      .filter(col("cell").isin(probed: _*)).count()
    assert(probedScan == probed.map(cellSizes.getOrElse(_, 0L)).sum)
    assert(probedScan < embs.count()) // strictly less data than a full scan
  }

  test("saveCentroids/loadCentroids round-trip bit-exactly; loaded centroids probe identically") {
    GraftFunctions.register(spark)
    val path = s"target/ivf_cent_${System.nanoTime()}"
    val idx = s"target/ivf_cent_idx_${System.nanoTime()}"
    val cents = Similarity.writeIvfIndex(embs, "vec_id", "embedding", idx, nCells = 16)
    Similarity.saveCentroids(spark, path, cents)
    val loaded = Similarity.loadCentroids(spark, path)
    assert(loaded == cents, "artifact round-trip must be the identity")
    val a = Similarity.ivfTopKFromIndex(spark, idx, cents, "vec_id", "embedding",
      query, k = 10, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Similarity.ivfTopKFromIndex(spark, idx, loaded, "vec_id", "embedding",
      query, k = 10, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("delete lifecycle: tombstone masks immediately, compact rewrites ONLY affected cells, append composes") {
    GraftFunctions.register(spark)
    val path = s"target/ivf_delete_${System.nanoTime()}"
    val centroids = Similarity.writeIvfIndex(embs, "vec_id", "embedding", path, nCells = 16)

    // plant the delete set inside the probed cells so the probe result MUST change
    val probedCells = Similarity.nearestCells(centroids, query, 4)
    val pre = Similarity.ivfTopKFromIndex(
      spark, path, centroids, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val deleteIds = pre.map(_._1).take(5) // 5 of the current top-20
    import spark.implicits._
    Similarity.tombstoneIvfIndex(spark, path, "vec_id", deleteIds.toDF("vec_id"))

    // phase 1 (tombstones pending): deleted ids are already invisible,
    // and the brute-force oracle over the surviving rows agrees exactly
    val masked = Similarity.ivfTopKFromIndex(
      spark, path, centroids, "vec_id", "embedding", query, k = 20, nprobe = 4)
    val maskedRows = masked.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(maskedRows.map(_._1).toSet.intersect(deleteIds.toSet).isEmpty)
    val oracle = Similarity.bruteForceTopK(
      Similarity.withIvfCell(embs, "embedding", centroids)
        .filter(col("cell").isin(probedCells: _*))
        .filter(!col("vec_id").isin(deleteIds: _*)),
      "vec_id", "embedding", query, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(maskedRows == oracle, "tombstone-masked probe must equal the surviving-row oracle")
    // the mask is a broadcast anti-join: cell partition pruning is undisturbed
    val plan = masked.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))

    // the BATCH probe masks pending tombstones too (same readIndex path)
    val queries2 = embs.orderBy(col("vec_id").asc).limit(2)
      .select(col("vec_id").as("qid"), col("embedding"))
    val batchProbed = Similarity.ivfTopKBatch(
      spark, path, centroids, queries2, "qid", "embedding",
      "vec_id", "embedding", k = 20, nprobe = 4)
      .collect().map(_.getLong(2)).toSet
    assert(batchProbed.intersect(deleteIds.toSet).isEmpty,
      "batch probe must not return tombstoned ids")

    // snapshot per-cell file listings (name -> (len, mtime)) before compaction
    def cellFiles(c: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$path/cell=$c")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val allCells = spark.read.parquet(path).select(col("cell").cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val affectedExpected = Similarity.withIvfCell(embs, "embedding", centroids)
      .filter(col("vec_id").isin(deleteIds: _*))
      .select(col("cell")).distinct().collect().map(_.getInt(0)).sorted.toSeq
    val beforeListing = allCells.map(c => c -> cellFiles(c)).toMap

    // phase 2: compact — only the affected cell partitions rewrite
    val (deleted, affected) = Similarity.compactIvfIndex(spark, path, "vec_id")
    assert(deleted == deleteIds.size.toLong)
    assert(affected == affectedExpected)
    allCells.foreach { c =>
      if (affected.contains(c))
        assert(cellFiles(c) != beforeListing(c), s"affected cell $c must be rewritten")
      else
        assert(cellFiles(c) == beforeListing(c), s"untouched cell $c must keep its exact files")
    }
    assert(!new java.io.File(s"$path/_graft_tombstones").exists, "tombstones cleared")

    // post-compaction probe ≡ the pending-tombstone probe
    val compacted = Similarity.ivfTopKFromIndex(
      spark, path, centroids, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(compacted == maskedRows)

    // composes with append: re-adding the deleted vectors restores the original top-20
    Similarity.appendToIvfIndex(
      embs.filter(col("vec_id").isin(deleteIds: _*)), "vec_id", "embedding",
      path, centroids)
    val restored = Similarity.ivfTopKFromIndex(
      spark, path, centroids, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(restored == pre, "append after compaction must restore the pre-delete probe")
  }

  test("delete + compaction on the quantized (q8) tier: rows rewritten as stored, probe stays bit-exact") {
    GraftFunctions.register(spark)
    val path = s"target/ivf_delete_q8_${System.nanoTime()}"
    val centroids = Similarity.writeIvfIndex(
      embs, "vec_id", "embedding", path, nCells = 16, quantize = true)
    val pre = Similarity.ivfTopKFromIndex(
      spark, path, centroids, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val deleteIds = pre.map(_._1).take(4)
    import spark.implicits._
    Similarity.tombstoneIvfIndex(spark, path, "vec_id", deleteIds.toDF("vec_id"))
    val masked = Similarity.ivfTopKFromIndex(
      spark, path, centroids, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (deleted, _) = Similarity.compactIvfIndex(spark, path, "vec_id")
    assert(deleted == deleteIds.size.toLong)
    // rewritten q8 rows must decode identically: post-compaction probe ==
    // the tombstone-masked probe, and the storage schema is unchanged
    val compacted = Similarity.ivfTopKFromIndex(
      spark, path, centroids, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(compacted == masked)
    val cols = spark.read.parquet(path).columns.toSet
    assert(cols.contains("qcodes") && cols.contains("scale") && !cols.contains("embedding"),
      s"compaction must preserve the quantized storage layout: $cols")
  }

  test("compactIvfIndex: a fully-emptied cell's directory is removed; empty tombstone set is a no-op") {
    GraftFunctions.register(spark)
    val path = s"target/ivf_empty_${System.nanoTime()}"
    val centroids = Similarity.writeIvfIndex(embs, "vec_id", "embedding", path, nCells = 16)
    // no tombstones at all: no-op
    assert(Similarity.compactIvfIndex(spark, path, "vec_id") == ((0L, Seq.empty[Int])))
    // tombstone EVERY row of one cell
    val victim = spark.read.parquet(path).select(col("cell").cast("int"))
      .groupBy("cell").count().orderBy(col("count").asc, col("cell").asc)
      .head().getInt(0)
    val ids = spark.read.parquet(path).filter(col("cell") === victim)
      .select(col("vec_id"))
    val n = ids.count()
    Similarity.tombstoneIvfIndex(spark, path, "vec_id", ids)
    val (deleted, affected) = Similarity.compactIvfIndex(spark, path, "vec_id")
    assert(deleted == n && affected == Seq(victim))
    assert(!new java.io.File(s"$path/cell=$victim").exists,
      "an emptied cell's partition directory must be removed")
    // the rest of the index still reads and probes
    assert(spark.read.parquet(path).filter(col("cell") === victim).isEmpty)
    assert(Similarity.ivfTopKFromIndex(spark, path, centroids, "vec_id",
      "embedding", query, k = 5, nprobe = 4).count() == 5)
  }

  test("withIvfCell: fused argmax ≡ cosine-array formulation; plan holds ONE node at 1024 cells") {
    GraftFunctions.register(spark)
    val centroids = Similarity.ivfCentroids(embs, "vec_id", "embedding", 16)
    val fused = Similarity.withIvfCell(embs, "embedding", centroids)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference: the nCells-wide expression array the fused kernel replaced
    val sims = centroids.map { case (_, c) =>
      GraftFunctions.cosineSim(col("embedding"), typedLit(c))
    }
    val simArr = array(sims: _*)
    val ref = embs.withColumn("cell",
        (array_position(simArr, array_max(simArr)) - 1).cast("int"))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fused == ref)

    // at 1024 cells the plan must still carry a single assignment node
    // (the old formulation embedded 1024 cosine expressions)
    val rnd = new scala.util.Random(1)
    val big = (0 until 1024).map(i => i -> Seq.fill(64)(rnd.nextGaussian().toFloat))
    val assigned = Similarity.withIvfCell(embs, "embedding", big)
    val planStr = assigned.queryExecution.analyzed.toString
    assert(!planStr.contains("graft_cosine"))
    val cells = assigned.select("cell").collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 1024))
  }

  test("kmeansCentroids: refined probe recall beats first-n-by-id seeds on clustered data") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 8 well-separated clusters in 32 dims; ids ordered so the first 16
    // (the first-n centroid seeds) ALL sit in cluster 0 — the degenerate
    // seeding a real corpus with sorted ingest produces
    val rnd = new scala.util.Random(5)
    val centers = Seq.fill(8)(Seq.fill(32)(rnd.nextGaussian().toFloat))
    def member(c: Int): Seq[Float] =
      centers(c).map(x => x * 4f + rnd.nextGaussian().toFloat)
    val rows =
      (0 until 16).map(i => (i.toLong, member(0))) ++
        (16 until 320).map(i => (i.toLong, member(i % 8)))
    val df = rows.toDF("vec_id", "vec")
    val query = member(5)

    val brute = Similarity.bruteForceTopK(df, "vec_id", "vec", query, 20)
      .collect().map(_.getLong(0)).toSet
    def recallWith(cents: Seq[(Int, Seq[Float])]): Double =
      Similarity.ivfTopKWith(df, "vec_id", "vec", cents, query, 20, nprobe = 2)
        .collect().map(_.getLong(0)).count(brute.contains).toDouble / 20
    val firstN = recallWith(Similarity.ivfCentroids(df, "vec_id", "vec", 16))
    val refined = recallWith(Similarity.kmeansCentroids(df, "vec_id", "vec", 16, iters = 5))
    assert(refined > firstN,
      s"k-means recall $refined not above first-n recall $firstN")
    assert(refined >= 0.9, s"k-means recall $refined below 0.9")
  }

  test("semanticDedupDrops: planted near-dups drop to the min id; cross-cluster pairs survive") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(4)(Seq.fill(16)(rnd.nextGaussian().toFloat))
    def near(c: Int, eps: Float): Seq[Float] =
      centers(c).map(x => x * 10f + rnd.nextGaussian().toFloat * eps)
    // per cluster: a base member, a near-duplicate of it (ids base+100),
    // and a far member that must NOT drop
    val rows = (0 until 4).flatMap { c =>
      val base = near(c, 0.01f)
      Seq((c.toLong, base),
        (c.toLong + 100L, base.map(_ + rnd.nextGaussian().toFloat * 0.01f)),
        (c.toLong + 200L, near(c, 8f)))
    }
    val df = rows.toDF("vec_id", "vec")
    val cents = Similarity.kmeansCentroids(df, "vec_id", "vec", nCells = 4, iters = 5)
    val drops = Similarity.semanticDedupDrops(df, "vec_id", "vec", cents, tau = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every planted near-dup (base+100) drops, kept by its base
    (0 until 4).foreach { c =>
      assert(drops.get(c.toLong + 100L).contains(c.toLong),
        s"cluster $c near-dup not dropped by its base: $drops")
    }
    // bases and far members survive
    assert(drops.keySet.intersect((0 until 4).map(_.toLong).toSet).isEmpty)
    assert(drops.keySet.intersect((200 until 204).map(_.toLong).toSet).isEmpty)
  }

  test("semanticDedupDrops plan: one cell-keyed join, no cartesian product") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = (0 until 64).map(i => (i.toLong, Seq.fill(8)(i.toFloat)))
      .toDF("vec_id", "vec")
    val cents = Similarity.ivfCentroids(df, "vec_id", "vec", 4)
    val plan = Similarity.semanticDedupDrops(df, "vec_id", "vec", cents, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
  }

  test("clusterReport: counts cover every vector; quantized mean tracks the true mean") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(4)(Seq.fill(8)(rnd.nextGaussian().toFloat))
    val rows = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => x * 6f + rnd.nextGaussian().toFloat * 0.3f))
    }
    val df = rows.toDF("vec_id", "vec")
    val cents = Similarity.kmeansCentroids(df, "vec_id", "vec", nCells = 4, iters = 4)
    val rep = Similarity.clusterReport(df, "vec_id", "vec", cents).collect()
    assert(rep.map(_.getLong(1)).sum == 200L, "member counts must cover the corpus")
    rep.foreach { r =>
      val n = r.getLong(1); val mn = r.getDouble(2); val mx = r.getDouble(3)
      val meanQ = r.getDouble(5)
      assert(mn <= mx && meanQ >= mn - 1e-6 && meanQ <= mx,
        s"cell ${r.getInt(0)}: mean $meanQ outside [$mn, $mx]")
      // tight clusters around strong centers → coherent cells
      assert(n > 0 && meanQ > 0.9, s"cell ${r.getInt(0)} incoherent: mean $meanQ n $n")
    }
    // quantized-sum aggregation is partitioning-independent
    val rep2 = Similarity.clusterReport(df.repartition(17), "vec_id", "vec", cents)
      .collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    rep.foreach(r => assert(rep2(r.getInt(0)) == r.getLong(4)))
  }

  test("quantizeInt8: codes bounded, reconstruction within s/254 per component, ANN recall holds") {
    GraftFunctions.register(spark)
    val e = embs
    val q = Similarity.quantizeInt8(e, "vec_id", "embedding")
    val joined = Similarity.dequantizeInt8(q)
      .join(e, "vec_id")
      .select(col("vec_id"), col("scale"), col("qvec"), col("vec"), col("embedding"))
      .collect()
    joined.foreach { r =>
      val s = r.getDouble(1)
      val codes = r.getSeq[Int](2)
      assert(codes.forall(c => c >= -127 && c <= 127), s"codes out of range")
      val deq = r.getSeq[Float](3)
      val orig = r.getSeq[Float](4)
      deq.zip(orig).foreach { case (d, o) =>
        assert(math.abs(d - o) <= s / 254.0 + 1e-6,
          s"vec ${r.getLong(0)}: reconstruction error ${math.abs(d - o)} above ${s / 254.0}")
      }
    }
    // brute-force top-k over dequantized vectors stays close to exact top-k
    val query = e.orderBy(col("vec_id")).limit(1).select(col("embedding"))
      .head().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    val deqVecs = Similarity.dequantizeInt8(q).select(col("vec_id"), col("vec"))
    val approx = Similarity.bruteForceTopK(deqVecs, "vec_id", "vec", query, 20)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / 20
    assert(recall >= 0.8, s"int8 ANN recall $recall below 0.8")
  }

  test("kmeansCentroids: quantized-integer-sum Lloyd updates are partitioning-invariant") {
    GraftFunctions.register(spark)
    val a = Similarity.kmeansCentroids(embs, "vec_id", "embedding", 16, iters = 3)
    val b = Similarity.kmeansCentroids(
      embs.repartition(17), "vec_id", "embedding", 16, iters = 3)
    assert(a == b,
      "refined centroids must be bit-identical on any partitioning")
  }

  test("semanticDedupDrops: maxCellSize drops giant cells, accumulator observes, small cells unaffected") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val c0 = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val c1 = Seq.fill(16)(rnd.nextGaussian().toFloat)
    def near(c: Seq[Float], eps: Float): Seq[Float] =
      c.map(x => x * 10f + rnd.nextGaussian().toFloat * eps)
    // giant cell: 30 near-identical members around c0; small cell: a planted
    // near-dup pair (100, 101) + one far member around c1
    val base1 = near(c1, 0.01f)
    val rows =
      (0 until 30).map(i => (i.toLong, near(c0, 0.01f))) ++
        Seq((100L, base1),
          (101L, base1.map(_ + rnd.nextGaussian().toFloat * 0.01f)),
          (102L, near(c1, 8f)))
    val df = rows.toDF("vec_id", "vec")
    val cents = Similarity.kmeansCentroids(df, "vec_id", "vec", nCells = 2, iters = 5)
    // uncapped: the giant cell floods the drop list
    val uncapped = Similarity.semanticDedupDrops(df, "vec_id", "vec", cents, tau = 0.999)
      .collect().map(_.getLong(0)).toSet
    assert(uncapped.count(_ < 30L) >= 25, s"giant cell should flood uncapped drops: $uncapped")
    assert(uncapped.contains(101L))
    // capped: the giant cell is excluded from pair generation entirely,
    // the small cell's dedup is untouched, and the cap is observable
    val acc = spark.sparkContext.longAccumulator("droppedCells")
    val capped = Similarity.semanticDedupDrops(df, "vec_id", "vec", cents, tau = 0.999,
        maxCellSize = 10, droppedCells = Some(acc))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped.keySet.forall(_ >= 100L), s"giant-cell ids must not appear: $capped")
    assert(capped.get(101L).contains(100L))
    assert(acc.value == 1L, s"exactly one cell over the cap, got ${acc.value}")
  }

  test("quantized IVF index: >=3x smaller on disk, probe ≡ dequantized in-memory search, partitions prune") {
    GraftFunctions.register(spark)
    val p32 = s"target/ivf_f32_${System.nanoTime()}"
    val p8 = s"target/ivf_q8_${System.nanoTime()}"
    val c32 = Similarity.writeIvfIndex(embs, "vec_id", "embedding", p32,
      nCells = 16, refineIters = 2)
    val c8 = Similarity.writeIvfIndex(embs, "vec_id", "embedding", p8,
      nCells = 16, refineIters = 2, quantize = true)
    assert(c32 == c8, "quantization must not perturb the centroids")
    def bytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.startsWith("part-")) f.length()
        else 0L
      walk(new java.io.File(dir))
    }
    // size ratio measured where payload dominates parquet footers: 4000
    // incompressible random vectors over 4 cells (the 50-row fixture is
    // ~90% per-partition-file footer overhead, which caps any ratio)
    {
      import spark.implicits._
      val rnd = new scala.util.Random(3)
      val big = (0 until 4000).map(i =>
        (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "vec")
      val bp32 = s"target/ivf_sz_f32_${System.nanoTime()}"
      val bp8 = s"target/ivf_sz_q8_${System.nanoTime()}"
      Similarity.writeIvfIndex(big, "vec_id", "vec", bp32, nCells = 4)
      Similarity.writeIvfIndex(big, "vec_id", "vec", bp8, nCells = 4, quantize = true)
      val (b32, b8) = (bytes(bp32), bytes(bp8))
      assert(b8 * 3 <= b32, s"int8 index $b8 B not >=3x smaller than float32 $b32 B")
    }
    // probe over the quantized index ≡ probing the dequantized vectors with
    // the same cells — bit-exact, not approximate
    val fromQ8 = Similarity.ivfTopKFromIndex(
        spark, p8, c8, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val deq = Similarity.dequantizeInt8(
      Similarity.quantizeInt8(embs, "vec_id", "embedding"))
      .select(col("vec_id"), col("vec"))
    val probed = Similarity.nearestCells(c8, query, 4)
    val expected = Similarity.withIvfCell(embs, "embedding", c8)
      .filter(col("cell").isin(probed: _*))
      .select(col("vec_id")).join(deq, "vec_id")
      .select(col("vec_id"),
        GraftFunctions.cosineSim(col("vec"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromQ8 == expected)
    // quantization keeps the probe's answer quality: >=0.8 overlap with the
    // float32 index probe (same cells, full-precision vectors)
    val fromF32 = Similarity.ivfTopKFromIndex(
        spark, p32, c32, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = fromQ8.map(_._1).count(fromF32.contains).toDouble / 20
    assert(recall >= 0.8, s"q8 index recall $recall below 0.8")
    // the cell filter still prunes partitions on the quantized layout
    val plan = Similarity.ivfTopKFromIndex(
      spark, p8, c8, "vec_id", "embedding", query, k = 20, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
  }

  test("ivfTopKBatch: ≡ per-query probes, constant job count in N, index scan dynamically pruned") {
    GraftFunctions.register(spark)
    val path = s"target/ivf_batch_${System.nanoTime()}"
    val cents = Similarity.writeIvfIndex(embs, "vec_id", "embedding", path,
      nCells = 16, refineIters = 2)
    def queriesWhere(mod: Int) = embs.filter(pmod(col("vec_id"), lit(mod)) === 0)
      .select(col("vec_id"), col("embedding"))
    val batch = Similarity.ivfTopKBatch(spark, path, cents,
      queriesWhere(10), "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 4)
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    // every query's block equals its single-query probe, bit-exact
    val qvecs = queriesWhere(10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.keySet == qvecs.keySet)
    qvecs.foreach { case (qid, qv) =>
      val single = Similarity.ivfTopKFromIndex(
          spark, path, cents, "vec_id", "embedding", qv, k = 5, nprobe = 4)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1)) }.toSeq
      assert(got(qid).sortBy(_._2).toSeq == single, s"query $qid diverges from single probe")
    }
    // job count must not scale with the number of queries
    def jobsFor(mod: Int): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        Similarity.ivfTopKBatch(spark, path, cents, queriesWhere(mod),
          "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 4).count()
        Thread.sleep(500) // listener delivery is async
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    val (j5, j25) = (jobsFor(10), jobsFor(2))
    assert(j5 == j25, s"job count scales with query count: $j5 vs $j25 — a per-query loop")
    // the broadcast side's selective predicate lets dynamic partition
    // pruning attach to the index scan's cell partition column
    val planStr = batch.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the index scan:\n$planStr")
  }

  test("appendToIvfIndex: probe over base+appended ≡ in-memory union with frozen centroids; quantized layout appends cleanly") {
    GraftFunctions.register(spark)
    for (q8 <- Seq(false, true)) {
      val path = s"target/ivf_app_${q8}_${System.nanoTime()}"
      val base = embs.filter(pmod(col("vec_id"), lit(2)) === 0)
      val incr = embs.filter(pmod(col("vec_id"), lit(2)) =!= 0)
      val cents = Similarity.writeIvfIndex(base, "vec_id", "embedding", path,
        nCells = 16, refineIters = 2, quantize = q8)
      // the storage tier is auto-detected from the standing index's schema
      Similarity.appendToIvfIndex(incr, "vec_id", "embedding", path, cents)
      val got = Similarity.ivfTopKFromIndex(
          spark, path, cents, "vec_id", "embedding", query, k = 20, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // expected: the same frozen-centroid probe over the in-memory union,
      // through the same storage transform the index applied
      val union = base.unionByName(incr)
      val mem =
        if (!q8) union
        else Similarity.dequantizeInt8(
            Similarity.quantizeInt8(union, "vec_id", "embedding"))
          .select(col("vec_id"), col("vec").as("embedding"))
      val probed = Similarity.nearestCells(cents, query, 4)
      val expected = Similarity.withIvfCell(union, "embedding", cents)
        .filter(col("cell").isin(probed: _*))
        .select(col("vec_id")).join(mem, "vec_id")
        .select(col("vec_id"),
          GraftFunctions.cosineSim(col("embedding"), typedLit(query)).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc).limit(20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expected, s"append probe diverges (quantize=$q8)")
      // appended rows actually reach the probe results
      assert(got.exists(_._1 % 2 == 1), s"no appended (odd) vector in top-20 (quantize=$q8)")
      // the base partitions were appended to, not rewritten: every cell dir
      // holding both halves has >1 part file
      val cells = new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cells.nonEmpty)
      val multi = cells.count(c =>
        c.listFiles().count(_.getName.startsWith("part-")) > 1)
      assert(multi > 0, "append should add part files beside the base ones")
    }
  }

  test("lshTopK: finds self, exact cosines on candidates") {
    GraftFunctions.register(spark)
    val got = Similarity.lshTopK(embs, "vec_id", "embedding", 64, query, 10).collect()
    assert(got.map(_.getLong(0)).contains(0L))
    val scores = got.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("lshTopK plan: scan → filter → TakeOrdered, zero exchanges") {
    GraftFunctions.register(spark)
    val plan = Similarity.lshTopK(embs, "vec_id", "embedding", 64, query, 10)
      .queryExecution.executedPlan.toString
    // candidates are per-row bucket-array matches — no posexplode row
    // multiplication and no pair-dedup shuffle
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("lshKnnJoin: planted twin is rank 1 both ways; per-row ranking is dense and ordered") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // corpus + an exact duplicate of vec 0 under a fresh id
    val twinId = 100000L
    val twinRow = embs.filter(col("vec_id") === 0L)
      .select(lit(twinId).as("vec_id"), col("embedding"))
    val withTwin = embs.select(col("vec_id"), col("embedding")).union(twinRow)
    val got = Similarity.lshKnnJoin(withTwin, "vec_id", "embedding", 64, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byRow = got.groupBy(_._1)
    // identical vectors share every bucket → each is the other's rank 1 at cosine 1
    assert(byRow(0L).find(_._2 == 1L).exists(t => t._3 == twinId && t._4 == 1.0))
    assert(byRow(twinId).find(_._2 == 1L).exists(t => t._3 == 0L && t._4 == 1.0))
    byRow.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"ranks not dense for $id")
      val cos = sorted.map(_._4).toSeq
      assert(cos == cos.sorted.reverse, s"cosines not descending for $id")
      assert(rows.forall(_._3 != id), s"self-neighbor for $id")
      assert(rows.length <= 5)
    }
  }

  test("multimodal resize and frame sampling keep the partition-local batch shape") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.withPayload(docs)
    val resized = Multimodal.resize(spark, media, targetW = 8, targetH = 8).collect()
    assert(resized.length == 500)
    assert(resized.forall(r => r.width == 8 && r.height == 8 && r.payload.nonEmpty))
    val frames = Multimodal.frameSample(spark, media, frameBytes = 64, everyNth = 4)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    // every 4th 64-byte chunk: frame numbers are 0,4,8,…
    byDoc.values.foreach(fs => assert(fs.forall(_.frame_no % 4 == 0)))
    // deterministic across runs
    val again = Multimodal.frameSample(spark, media).collect()
    assert(again.length == frames.collect().length)
  }

  test("multimodal real decode: BMP payloads resize to valid re-parseable images distributed") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.withMediaPayload(spark, docs)
      .filter(col("mime") === "image/bmp")
    val resized = Multimodal.resize(spark, media, targetW = 8, targetH = 8).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val img = MediaCodecs.decodeBmp(r.payload) // a REAL BMP came back
      assert(img.width == 8 && img.height == 8)
    }
  }

  test("multimodal feature pipeline: real per-modality decode, per-source aggregates") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Multimodal.featurePipeline(spark, docs).collect()
    // 20 sources × 2 modalities (even ids: BMP, odd: WAV)
    assert(out.map(_.getString(0)).distinct.length == 20)
    assert(out.map(_.getString(1)).distinct.sorted.toSeq == Seq("audio/wav", "image/bmp"))
    assert(out.map(_.getLong(2)).sum == 500) // every doc decoded once
    // audio rows aggregate a real RMS: a half-amplitude sine has RMS ≈ 0.3536
    out.filter(_.getString(1) == "audio/wav")
      .foreach(r => assert(math.abs(r.getDouble(4) - 0.3536) < 0.01, r))
    // decode is deterministic: run twice, same result
    val out2 = Multimodal.featurePipeline(spark, docs).collect()
    assert(out.map(_.toSeq).toSet == out2.map(_.toSeq).toSet)
  }

  test("multimodal theory pins: decoded features and sizes equal closed-form values bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // every per-(source, modality) group must report an exact theory match
    val out = Multimodal.featurePipeline(spark, docs).collect()
    out.foreach { r =>
      assert(r.getBoolean(5), s"feature[0] diverged from theory in $r")
      assert(r.getBoolean(6), s"payload size diverged from theory in $r")
    }
    // per-doc: the full synth → encode → parse → feature path reproduces
    // the closed-form value EXACTLY (Float ==, no tolerance), for every doc
    val media = Multimodal.withMediaPayload(spark, docs)
    val perDoc = Multimodal.decodeFeatures(spark, media).collect()
    assert(perDoc.length == 500)
    perDoc.foreach { f =>
      assert(f.feature(0) == Multimodal.theoryFeature0(f.doc_id),
        s"doc ${f.doc_id}: decoded ${f.feature(0)} != theory ${Multimodal.theoryFeature0(f.doc_id)}")
      assert(f.n_bytes == Multimodal.theoryByteCount(f.doc_id), s"doc ${f.doc_id} size")
    }
    // aggregate pin: group averages equal the theory-computed averages up
    // to double-summation order (the only nondeterminism left)
    val srcOf = docs.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perDoc.groupBy(f => (srcOf(f.doc_id), f.mime)).map {
      case (k, fs) =>
        k -> (fs.length.toLong,
          fs.map(_.doc_id).sorted.map(Multimodal.theoryByteCount).sum,
          fs.map(_.doc_id).sorted.map(id => Multimodal.theoryFeature0(id).toDouble).sum / fs.length)
    }
    out.foreach { r =>
      val (n, bytes, avgF) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n && r.getLong(3) == bytes)
      assert(math.abs(r.getDouble(4) - avgF) < 1e-12,
        s"avg_feat0 ${r.getDouble(4)} != theory $avgF for ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("multimodal featureGate: integer gate shape, exactness counts saturate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Multimodal.featureGate(spark, docs).collect()
    assert(out.map(_.getLong(2)).sum == 500)
    out.foreach { r =>
      val n = r.getLong(2)
      // oracle contract: every doc's decoded feature[0] and byte count
      // match the closed-form theory values
      assert(r.getLong(4) == n, s"n_feat0_exact < n_docs in $r")
      assert(r.getLong(5) == n, s"n_bytes_exact < n_docs in $r")
      assert(r.getLong(3) > 0)
    }
  }
}
