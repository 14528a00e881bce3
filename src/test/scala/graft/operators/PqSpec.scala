package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class PqSpec extends SparkTestBase {

  lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val query: Seq[Float] =
    embs.orderBy(col("vec_id")).limit(1).select("embedding").head().getSeq[Float](0)

  private val M = 8
  private val Ksub = 16

  test("saveCodebook/loadCodebook round-trip bit-exactly; loaded codebook decodes identically") {
    GraftFunctions.register(spark)
    val cb = Pq.trainCodebook(embs, "vec_id", "embedding", M, Ksub, iters = 1)
    val path = s"target/pq_artifact_${System.nanoTime()}"
    Pq.saveCodebook(spark, path, cb, Ksub)
    val (cb2, ksub2) = Pq.loadCodebook(spark, path)
    assert(cb2 == cb && ksub2 == Ksub, "artifact round-trip must be the identity on floats")
    val enc = Pq.encode(embs, "vec_id", "embedding", cb, Ksub)
    val viaTrained = enc.select(col("vec_id"), Pq.decodeCol(col("pqcodes"), cb, Ksub).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val viaLoaded = enc.select(col("vec_id"), Pq.decodeCol(col("pqcodes"), cb2, ksub2).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    assert(viaLoaded == viaTrained)
  }

  test("trainCodebook: bit-identical on any partitioning; subspace-major shape") {
    GraftFunctions.register(spark)
    val a = Pq.trainCodebook(embs, "vec_id", "embedding", M, Ksub, iters = 2)
    val b = Pq.trainCodebook(embs.repartition(7), "vec_id", "embedding", M, Ksub, iters = 2)
    assert(a == b, "codebook depends on partitioning — Lloyd update not order-independent")
    assert(a.length == M * Ksub)
    assert(a.forall(_.length == 64 / M))
    // refinement moved the seeds: at least one entry differs from its seed slice
    val seeds = Pq.trainCodebook(embs, "vec_id", "embedding", M, Ksub, iters = 0)
    assert(a != seeds, "Lloyd rounds did not move any sub-centroid")
  }

  test("pqTopK: scores are exact cosines of reconstructions; recall vs exact top-k") {
    GraftFunctions.register(spark)
    val cb = Pq.trainCodebook(embs, "vec_id", "embedding", M, Ksub, iters = 2)
    val top = Pq.pqTopK(embs, "vec_id", "embedding", cb, Ksub, query, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // scores equal driver-side reconstruction cosines, bit-exact
    val vecs = embs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def recon(v: Seq[Float]): Seq[Float] =
      (0 until M).flatMap { s =>
        val sub = v.slice(s * 8, s * 8 + 8)
        val best = (0 until Ksub).minBy { c =>
          val ct = cb(s * Ksub + c)
          sub.zip(ct).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum
        }
        cb(s * Ksub + best)
      }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    top.foreach { case (id, c) =>
      assert(c == cos(recon(vecs(id)), query), s"score for $id is not the reconstruction cosine")
    }
    // the fixture is i.i.d. Gaussian — PQ's worst case (nothing for the
    // subspace quantizers to exploit, and all pairwise cosines cluster
    // near 0 so quantization noise reorders freely). Pin only a floor
    // here; the meaningful recall bound is on structured data below.
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    val recall = top.map(_._1).count(exact.contains).toDouble / 20
    assert(recall >= 0.2, s"pq recall $recall below 0.2 even on noise")
  }

  test("pqTopK: high recall on clustered data — the corpus shape PQ exists for") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 8 well-separated clusters in 64 dims (the kmeansCentroids fixture
    // shape): real embedding corpora are locally clustered, which is what
    // the per-subspace codebooks capture
    val rnd = new scala.util.Random(5)
    val centers = Seq.fill(8)(Seq.fill(64)(rnd.nextGaussian().toFloat))
    def member(c: Int): Seq[Float] =
      centers(c).map(x => x * 4f + rnd.nextGaussian().toFloat)
    val df = (0 until 320).map(i => (i.toLong, member(i % 8))).toDF("vec_id", "vec")
    val q = member(5)
    val cb = Pq.trainCodebook(df, "vec_id", "vec", M, Ksub, iters = 3)
    val exact = Similarity.bruteForceTopK(df, "vec_id", "vec", q, 20)
      .collect().map(_.getLong(0)).toSet
    // cluster identity survives quantization: every PQ top-20 hit is a
    // cluster-5 member (ids ≡ 5 mod 8)
    val pq20 = Pq.pqTopK(df, "vec_id", "vec", cb, Ksub, q, 20)
      .collect().map(_.getLong(0))
    assert(pq20.forall(_ % 8 == 5), "pq top-20 leaked out of the query's cluster")
    // the deployment contract is shortlist-then-rerank: WITHIN a cluster
    // the reconstruction collapses members toward shared codes, so ranks
    // shuffle at noise level — but a 2k shortlist must contain (almost)
    // all of the exact top-k for the exact re-rank to recover it
    val shortlist = Pq.pqTopK(df, "vec_id", "vec", cb, Ksub, q, 40)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.count(shortlist.contains).toDouble / 20
    assert(recall >= 0.9, s"exact top-20 recall $recall in the 40-deep pq shortlist below 0.9")
  }

  test("encode: one byte per subspace; PQ index ≥6x smaller than float32 on disk") {
    GraftFunctions.register(spark)
    val cb = Pq.trainCodebook(embs, "vec_id", "embedding", M, Ksub, iters = 2)
    val codes = Pq.encode(embs, "vec_id", "embedding", cb, Ksub).collect()
    codes.foreach { r =>
      val bytes = r.getAs[Array[Byte]](1)
      assert(bytes.length == M, s"expected $M code bytes, got ${bytes.length}")
      bytes.foreach(b => assert(b >= 0 && b < Ksub, s"code $b out of [0, $Ksub)"))
    }
    // size ratio measured where payload dominates parquet footers (the
    // SimilaritySpec q8 discipline): 4000 incompressible random vectors
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val big = (0 until 4000).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "vec")
    val bigCb = Pq.trainCodebook(big, "vec_id", "vec", M, Ksub, iters = 2)
    val p32 = s"target/pq_sz_f32_${System.nanoTime()}"
    val ppq = s"target/pq_sz_pq_${System.nanoTime()}"
    Similarity.writeIvfIndex(big, "vec_id", "vec", p32, nCells = 4)
    Similarity.writeIvfIndex(big, "vec_id", "vec", ppq, nCells = 4,
      pq = Some((bigCb, Ksub)))
    def bytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.startsWith("part-")) f.length()
        else 0L
      walk(new java.io.File(dir))
    }
    val (b32, bpq) = (bytes(p32), bytes(ppq))
    assert(bpq * 6 <= b32, s"pq index $bpq B not >=6x smaller than float32 $b32 B")
  }

  test("IVF-PQ index: probe ≡ in-memory reconstruction scoring; partitions prune; append; codebook required") {
    GraftFunctions.register(spark)
    val cb = Pq.trainCodebook(embs, "vec_id", "embedding", M, Ksub, iters = 2)
    val pq = Some((cb, Ksub))
    val path = s"target/ivf_pq_${System.nanoTime()}"
    val cents = Similarity.writeIvfIndex(embs, "vec_id", "embedding", path,
      nCells = 16, refineIters = 2, pq = pq)
    val fromIdx = Similarity.ivfTopKFromIndex(
      spark, path, cents, "vec_id", "embedding", query, k = 20, nprobe = 4, pq = pq)
    val got = fromIdx.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // expected: same frozen cells, scored against in-plan reconstructions
    val probed = Similarity.nearestCells(cents, query, 4)
    val expected = Similarity.withIvfCell(embs, "embedding", cents)
      .filter(col("cell").isin(probed: _*))
      .select(col("vec_id"),
        GraftFunctions.cosineSim(
          Pq.decodeCol(GraftFunctions.pqAssign(col("embedding"), cb, Ksub), cb, Ksub),
          typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected, "index probe diverges from in-memory reconstruction scoring")
    // partition pruning still applies on the PQ layout
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    // probing without the codebook fails fast, not silently
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFromIndex(
        spark, path, cents, "vec_id", "embedding", query, k = 20, nprobe = 4)
    }
    assert(err.getMessage.contains("codebook"))
    // appending without the codebook is rejected before any write
    val errApp = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(embs, "vec_id", "embedding", path, cents)
    }
    assert(errApp.getMessage.contains("codebook"))
    // append WITH the codebook: probe over base+appended ≡ union scoring
    val path2 = s"target/ivf_pq_app_${System.nanoTime()}"
    val base = embs.filter(pmod(col("vec_id"), lit(2)) === 0)
    val incr = embs.filter(pmod(col("vec_id"), lit(2)) =!= 0)
    val cents2 = Similarity.writeIvfIndex(base, "vec_id", "embedding", path2,
      nCells = 16, refineIters = 2, pq = pq)
    Similarity.appendToIvfIndex(incr, "vec_id", "embedding", path2, cents2, pq = pq)
    val got2 = Similarity.ivfTopKFromIndex(
        spark, path2, cents2, "vec_id", "embedding", query, k = 20, nprobe = 4, pq = pq)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val union = base.unionByName(incr)
    val probed2 = Similarity.nearestCells(cents2, query, 4)
    val expected2 = Similarity.withIvfCell(union, "embedding", cents2)
      .filter(col("cell").isin(probed2: _*))
      .select(col("vec_id"),
        GraftFunctions.cosineSim(
          Pq.decodeCol(GraftFunctions.pqAssign(col("embedding"), cb, Ksub), cb, Ksub),
          typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got2 == expected2, "append probe diverges")
    assert(got2.exists(_._1 % 2 == 1), "no appended (odd) vector in top-20")
  }

  test("ivfTopKBatch over a PQ index ≡ per-query single probes") {
    GraftFunctions.register(spark)
    val cb = Pq.trainCodebook(embs, "vec_id", "embedding", M, Ksub, iters = 2)
    val pq = Some((cb, Ksub))
    val path = s"target/ivf_pq_batch_${System.nanoTime()}"
    val cents = Similarity.writeIvfIndex(embs, "vec_id", "embedding", path,
      nCells = 16, refineIters = 2, pq = pq)
    val queries = embs.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), col("embedding"))
    val got = Similarity.ivfTopKBatch(spark, path, cents, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 4, pq = pq)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val qvecs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.keySet == qvecs.keySet)
    qvecs.foreach { case (qid, qv) =>
      val single = Similarity.ivfTopKFromIndex(
          spark, path, cents, "vec_id", "embedding", qv, k = 5, nprobe = 4, pq = pq)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1)) }.toSeq
      assert(got(qid).sortBy(_._2).toSeq == single, s"query $qid diverges from single probe")
    }
  }

  test("shortlistRerank: ≡ exact top-k restricted to the shortlist; full-depth shortlist recovers brute force; id filter pushes to the scan") {
    GraftFunctions.register(spark)
    val cb = Pq.trainCodebook(embs, "vec_id", "embedding", M, Ksub, iters = 2)
    val path = s"target/pq_rerank_${System.nanoTime()}"
    val cents = Similarity.writeIvfIndex(embs, "vec_id", "embedding", path,
      nCells = 16, refineIters = 2, pq = Some((cb, Ksub)))
    val got = Pq.shortlistRerank(spark, path, cents, cb, Ksub,
        embs, "vec_id", "embedding", query, k = 10, shortlistK = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the result is the exact cosine ranking over exactly the shortlist ids
    val shortlist = Similarity.ivfTopKFromIndex(spark, path, cents,
        "vec_id", "embedding", query, k = 30, nprobe = 4, pq = Some((cb, Ksub)))
      .collect().map(_.getLong(0)).toSet
    val expected = Similarity.bruteForceTopK(embs, "vec_id", "embedding", query, 500)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(p => shortlist.contains(p._1)).take(10).toSeq
    assert(got == expected, "rerank diverges from exact ranking over the shortlist")
    // rerank scores are FULL-precision cosines (not reconstruction cosines)
    val exactScores = expected.toMap
    got.foreach { case (id, c) => assert(c == exactScores(id)) }
    // with the shortlist as deep as the probed cells, rerank ≡ the exact
    // probe over those cells — the recall knob reaches exactness
    val deep = Pq.shortlistRerank(spark, path, cents, cb, Ksub,
        embs, "vec_id", "embedding", query, k = 10, shortlistK = 500)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probed = Similarity.nearestCells(cents, query, 4)
    val exactProbe = Similarity.withIvfCell(embs, "embedding", cents)
      .filter(col("cell").isin(probed: _*))
      .select(col("vec_id"),
        GraftFunctions.cosineSim(col("embedding"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(deep == exactProbe, "full-depth rerank should equal the exact probe")
    // the exact pass reads via a PUSHED id predicate, not a full unpruned scan
    val ids = shortlist.toSeq.sorted
    val plan = embs.filter(col("vec_id").isin(ids: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(vec_id"),
      s"shortlist id filter not pushed to the parquet scan:\n$plan")
  }
}
