package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the ANN storage tier below int8: split each
  * dim-wide vector into `m` contiguous subspaces of dsub = dim/m
  * components, k-means each subspace independently (`ksub` sub-centroids),
  * and store ONE BYTE per subspace (the sub-centroid code). At dim=64 /
  * m=8 that is 8 bytes per vector against 256 bytes of float32 — a 32×
  * shrink (vs int8's 4×), the compression that makes billion-vector
  * indexes RAM-resident (Jégou, Douze, Schmid, "Product quantization for
  * nearest neighbor search", TPAMI 2011 — public).
  *
  * Search scores against the RECONSTRUCTION (concatenated coded
  * sub-centroids): cosine(query, decode(codes)) — the asymmetric-distance
  * contract: the query stays exact, only the corpus side is quantized.
  *
  * Determinism: sub-centroid updates use the same floor-quantized
  * integer-sum mean as the coarse k-means ([[Similarity.CentroidQuanta]]),
  * so training is BIT-REPRODUCIBLE on any partitioning and any engine —
  * the DuckDB oracle replays the per-subspace Lloyd rounds exactly.
  *
  * 100 TB shape: training is `iters` single-aggregation passes (the
  * per-subspace explode multiplies rows ×m but divides payload ÷m — byte
  * volume is unchanged) collecting only m·ksub centroid rows per round;
  * encode/decode are one fused plan node each, constant in codebook size
  * ([[graft.functions.PqAssign]]/[[graft.functions.PqDecode]]); nothing
  * per-vector ever reaches the driver.
  */
object Pq {

  /** Train a subspace-major codebook (entry `s*ksub + code`, each dsub
    * wide): seeds are the first `ksub` vectors by id (each contributing
    * its s-th slice to subspace s — the [[Similarity.ivfCentroids]]
    * convention), refined by `iters` Lloyd rounds. Assignment is
    * argmin-squared-L2 with first-min tie-break; the update is the
    * quantized-integer-sum mean (empty codes keep their centroid). One
    * aggregation job per round; m·ksub rows collected per round. */
  def trainCodebook(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int): Seq[Seq[Float]] = {
    GraftFunctions.register(df.sparkSession)
    val seeds = df.orderBy(col(idCol).asc).limit(ksub)
      .select(col(vecCol)).collect()
      .toIndexedSeq.map(_.getSeq[Float](0))
    require(seeds.nonEmpty, "pq training corpus is empty")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    require(seeds.length == ksub,
      s"pq needs at least ksub=$ksub training rows, got ${seeds.length}")
    var cb: IndexedSeq[Seq[Float]] = for {
      s <- 0 until m
      c <- 0 until ksub
    } yield seeds(c).slice(s * dsub, (s + 1) * dsub)
    val q = Similarity.CentroidQuanta
    for (_ <- 0 until iters) {
      val sums = (0 until dsub).map(i =>
        sum(floor(element_at(col("v"), col("s") * dsub + i + 1).cast("double") * lit(q))
          .cast("long")).as(s"s$i"))
      val rows = df
        .select(col(vecCol).as("v"),
          posexplode(GraftFunctions.pqAssign(col(vecCol), cb, ksub)).as(Seq("s", "code")))
        .groupBy(col("s"), col("code"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      val updated = rows.map { r =>
        val n = r.getLong(2).toDouble
        (r.getInt(0), r.getInt(1)) -> (0 until dsub).map(i =>
          (r.getLong(i + 3).toDouble / n / q).toFloat)
      }.toMap
      cb = for {
        s <- 0 until m
        c <- 0 until ksub
      } yield updated.getOrElse((s, c), cb(s * ksub + c))
    }
    cb
  }

  /** Persist a trained codebook next to its index — the artifact every
    * PQ probe needs at serve time ([[graft.operators.Similarity]] probes
    * take the codebook as a parameter; this is its durable form). One
    * row per entry in subspace-major order, `ksub` carried per row;
    * floats round-trip parquet bit-exactly, so a loaded codebook
    * decodes identically to the trained one (asserted in PqSpec). */
  def saveCodebook(
      spark: org.apache.spark.sql.SparkSession, path: String,
      codebook: Seq[Seq[Float]], ksub: Int): Unit = {
    import spark.implicits._
    codebook.zipWithIndex.map { case (e, i) => (i, e, ksub) }
      .toDF("idx", "entry", "ksub")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveCodebook]] artifact: (codebook, ksub). */
  def loadCodebook(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[Seq[Float]], Int) = {
    val rows = spark.read.parquet(path)
      .select(col("idx"), col("entry"), col("ksub")).collect()
    require(rows.nonEmpty, s"empty pq codebook at $path")
    val cb = rows.sortBy(_.getInt(0)).toSeq.map(_.getSeq[Float](1).toSeq)
    (cb, rows.head.getInt(2))
  }

  /** The packed PQ code column (binary, one byte per subspace) of a
    * float-vector column — the storage form. */
  def codesCol(vec: Column, codebook: Seq[Seq[Float]], ksub: Int): Column =
    GraftFunctions.packInt8(GraftFunctions.pqAssign(vec, codebook, ksub))

  /** The reconstructed float32 vector of a code column (array<int> or
    * packed binary). */
  def decodeCol(codes: Column, codebook: Seq[Seq[Float]], ksub: Int): Column =
    GraftFunctions.pqDecode(codes, codebook, ksub)

  /** Encode a corpus: (idCol, pqcodes binary). One narrow projection. */
  def encode(
      df: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[Seq[Float]], ksub: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), codesCol(col(vecCol), codebook, ksub).as("pqcodes"))
  }

  /** Shortlist-then-rerank — the PQ DEPLOYMENT contract: within a cell,
    * members share codes, so PQ ranks degrade at noise level; production
    * search therefore takes a `shortlistK`-deep candidate list from the
    * compressed index and re-ranks ONLY those rows against their
    * full-precision vectors (Jégou et al. 2011's ADC + re-rank recipe).
    *
    * 100 TB shape: job 1 probes the 32×-compressed IVF-PQ index
    * (partition-pruned to nprobe cells) and collects shortlistK IDS ONLY
    * (k·O(1) longs — the bounded-collect discipline of the centroid
    * fetches); job 2 fetches those rows from the full-precision store
    * with an `isin` filter that reaches the parquet scan as a pushed
    * predicate — against an id-sorted store, row-group min/max stats
    * prune all but the touched groups, so the exact pass reads
    * O(shortlistK) rows, not the corpus. */
  def shortlistRerank(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      centroids: Seq[(Int, Seq[Float])], codebook: Seq[Seq[Float]], ksub: Int,
      fullVectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, shortlistK: Int, nprobe: Int = 4): DataFrame = {
    GraftFunctions.register(spark)
    GraftFunctions.register(fullVectors.sparkSession)
    val shortIds = Similarity.ivfTopKFromIndex(
        spark, indexPath, centroids, idCol, vecCol, query, shortlistK, nprobe,
        pq = Some((codebook, ksub)))
      .select(col(idCol)).collect().map(_.getLong(0)).toSeq
    fullVectors
      .filter(col(idCol).isin(shortIds: _*))
      .select(
        col(idCol),
        GraftFunctions.cosineSim(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact-query-vs-quantized-corpus top-k (asymmetric distance): encode +
    * decode in-plan, cosine against the literal query, TakeOrdered — the
    * [[Similarity.bruteForceTopK]] shape over the 32×-compressed
    * representation. */
  def pqTopK(
      df: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[Seq[Float]], ksub: Int,
      query: Seq[Float], k: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val recon = decodeCol(
      GraftFunctions.pqAssign(col(vecCol), codebook, ksub), codebook, ksub)
    df.select(
        col(idCol),
        GraftFunctions.cosineSim(recon, typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
