package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star ops, SURVEY §2.3; `embeddings.parquet` fixture:
  * `vec_id bigint, embedding array<float>, label int`).
  *
  * Three tiers:
  *  - [[bruteForceTopK]]: exact scan + top-k. Compiles to a single
  *    TakeOrderedAndProject over the scan — no shuffle; the right baseline
  *    and still the right answer for one-off queries at any scale.
  *  - [[withLshBucketArray]] / [[lshTopK]] / [[lshKnnJoin]]:
  *    random-hyperplane LSH — candidates share a sign-pattern bucket in
  *    ≥1 table; cost ∝ bucket size. lshTopK filters on the per-row bucket
  *    ARRAY (no row multiplication, zero exchanges).
  *  - [[ivfTopK]]: inverted-file index — vectors partitioned by nearest
  *    coarse centroid, queries probe the `nprobe` nearest cells. The cell
  *    assignment is itself a column, so a table can be *written partitioned
  *    by cell* and probing prunes partitions at scan time at 100 TB.
  */
object Similarity {

  /** Deterministic pseudo-random unit hyperplanes (driver-side, tiny).
    * `private[graft]` so the oracle-SQL builder can embed the identical
    * plane constants as literals. */
  private[graft] def planes(
      n: Int, dim: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)((rnd.nextGaussian()).toFloat))
  }

  /** Exact cosine top-k against a literal query vector. */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(
        col(idCol),
        GraftFunctions.cosineSim(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch kNN JOIN: for EVERY row, its k most-similar neighbors among the
    * LSH-candidate set (hard-negative mining, cluster seeding — the
    * all-rows companion of the single-query [[lshTopK]]). Candidate pairs
    * come from [[Dedup.embeddingNearDupPairs]] with the threshold open
    * (each qualifying pair exists exactly once, no dedup shuffle), are
    * symmetrized, and ranked per row by exact cosine; rows whose buckets
    * collide with fewer than k others return fewer neighbors — the
    * standard LSH-recall contract (raise `tables` for higher recall).
    * Shuffles carry ids + an 8-byte bucket array, the verify join carries
    * vectors once, and the final ranking is one window over the candidate
    * pairs (bounded by bucket sizes, not n²). */
  def lshKnnJoin(
      df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      planesPerTable: Int = 8, tables: Int = 4, seed: Long = 42L): DataFrame = {
    val pairs = Dedup.embeddingNearDupPairs(
      df, idCol, vecCol, dim, threshold = -1.0, planesPerTable, tables, seed)
    // symmetrize by exploding each pair into both directions IN PLACE — a
    // self-union would compile to two independent copies of the whole
    // candidate-generation subplan (bucket agg + vector joins + cosine)
    val sym = pairs
      .select(explode(array(
        struct(col("id_a").as(idCol), col("id_b").as("neighbor_id"), col("cosine")),
        struct(col("id_b").as(idCol), col("id_a").as("neighbor_id"), col("cosine"))))
        .as("e"))
      .select(col(s"e.$idCol"), col("e.neighbor_id"), col("e.cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** Attach the per-table LSH bucket ARRAY per row: tbs[t] = sign-bit
    * bucket of the row vector against table t's `planesPerTable`
    * hyperplanes. One row per input row — the array form is what the
    * first-colliding-table dedup kernel consumes. */
  def withLshBucketArray(
      df: DataFrame, vecCol: String, dim: Int,
      planesPerTable: Int, tables: Int, seed: Long): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val all = planes(planesPerTable * tables, dim, seed)
    val tableBuckets: Seq[Column] = (0 until tables).map { t =>
      (0 until planesPerTable).map { p =>
        val plane = all(t * planesPerTable + p)
        when(GraftFunctions.dotProduct(col(vecCol), typedLit(plane)) > 0d,
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    df.withColumn("tbs", array(tableBuckets: _*))
  }

  /** LSH-bucketed approximate top-k: candidates = rows sharing any table's
    * bucket with the query; exact cosine re-rank on candidates only.
    * Works on the per-row bucket ARRAY ([[withLshBucketArray]]) — one row
    * per input row matched against the query's bucket per table — so a
    * row is a candidate at most once by construction: no posexplode row
    * multiplication and no pair-dedup exchange (the former
    * `dropDuplicates(id)` shuffle). The whole query is scan → filter →
    * TakeOrderedAndProject: zero exchanges at any corpus size. */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      query: Seq[Float], k: Int,
      planesPerTable: Int = 10, tables: Int = 6, seed: Long = 42L): DataFrame = {
    val all = planes(planesPerTable * tables, dim, seed)
    def bucketOf(vec: Seq[Float], t: Int): Long =
      (0 until planesPerTable).map { p =>
        val plane = all(t * planesPerTable + p)
        val d = vec.zip(plane).map { case (x, y) => x.toDouble * y.toDouble }.sum
        if (d > 0) 1L << p else 0L
      }.sum
    val queryBuckets = (0 until tables).map(t => (t, bucketOf(query, t)))

    val bucketed = withLshBucketArray(df, vecCol, dim, planesPerTable, tables, seed)
    val cond = queryBuckets
      .map { case (t, b) => col("tbs").getItem(t) === b }
      .reduce(_ || _)
    bucketed.filter(cond)
      .select(
        col(idCol),
        GraftFunctions.cosineSim(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Coarse centroids for IVF: the first `nCells` vectors by id (seeded,
    * deterministic). A production build would run k-means refinement; the
    * index structure and probing are identical. */
  def ivfCentroids(
      df: DataFrame, idCol: String, vecCol: String, nCells: Int): Seq[(Int, Seq[Float])] =
    df.orderBy(col(idCol).asc).limit(nCells)
      .select(col(vecCol)).collect()
      .toIndexedSeq.zipWithIndex
      .map { case (row, i) => (i, row.getSeq[Float](0)) }

  /** Assign each row to its nearest centroid cell — ONE fused codegen
    * expression over the constant centroid matrix (plan size constant in
    * nCells; no shuffle). Centroids must be cell-indexed 0..n-1 in order —
    * the kernel's argmax index IS the cell id. Bitwise-equal to the
    * nCells-wide cosine-array formulation it replaces, which blew up the
    * expression tree and codegen at realistic 4k–64k cell counts. */
  def withIvfCell(
      df: DataFrame, vecCol: String, centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    require(centroids.zipWithIndex.forall { case ((c, _), i) => c == i },
      "centroids must be densely indexed 0..n-1 in cell order")
    df.withColumn("cell",
      GraftFunctions.ivfCell(col(vecCol), centroids.map(_._2)))
  }

  /** Lloyd (k-means) refinement of the coarse IVF centroids: `iters`
    * assignment/update rounds, each a single DataFrame aggregation —
    * assignment is the fused [[withIvfCell]] expression, the update a
    * groupBy(cell) per-dimension average. Only the nCells-row centroid
    * table is ever collected (once per iteration). Deterministic for a
    * fixed input/seed count up to float-sum ordering in the averages.
    * Empty cells keep their previous centroid. On clustered corpora this
    * lifts probe recall well above the first-n-by-id seeds (recall
    * asserted in SimilaritySpec); the index/probe structure is unchanged. */
  def kmeansCentroids(
      df: DataFrame, idCol: String, vecCol: String, nCells: Int,
      iters: Int = 3): Seq[(Int, Seq[Float])] = {
    var cents = ivfCentroids(df, idCol, vecCol, nCells)
    val dim = cents.head._2.length
    val vecs = df.select(col(vecCol))
    for (_ <- 0 until iters) {
      val avgs = (0 until dim).map(i => avg(col(vecCol).getItem(i)).as(s"c$i"))
      val rows = withIvfCell(vecs, vecCol, cents)
        .groupBy(col("cell"))
        .agg(avgs.head, avgs.tail: _*)
        .collect()
      val byCell = rows.map { r =>
        r.getInt(0) -> (0 until dim).map(i => r.getDouble(i + 1).toFloat)
      }.toMap
      cents = cents.map { case (c, old) => (c, byCell.getOrElse(c, old)) }
    }
    cents
  }

  private def cosDriver(a: Seq[Float], b: Seq[Float]): Double = {
    // same fail-fast dimension contract as VectorOps.cosine
    require(a.length == b.length,
      s"graft vector ops require equal dimensions, got ${a.length} vs ${b.length}")
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  /** The `nprobe` cell ids whose centroids are nearest the query. */
  def nearestCells(
      centroids: Seq[(Int, Seq[Float])], query: Seq[Float], nprobe: Int): Seq[Int] =
    centroids.sortBy { case (_, c) => -cosDriver(query, c) }
      .take(nprobe).map(_._1)

  /** IVF probe with caller-supplied centroids (first-n, k-means-refined,
    * or persisted): search only the `nprobe` cells whose centroids are
    * nearest the query, exact cosine within them. */
  def ivfTopKWith(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Float])],
      query: Seq[Float], k: Int, nprobe: Int): DataFrame = {
    val probed = nearestCells(centroids, query, nprobe)
    withIvfCell(df, vecCol, centroids)
      .filter(col("cell").isin(probed: _*))
      .select(
        col(idCol),
        GraftFunctions.cosineSim(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF probe: search only the `nprobe` cells whose centroids are nearest
    * the query, exact cosine within them. */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int,
      nCells: Int = 16, nprobe: Int = 4): DataFrame =
    ivfTopKWith(df, idCol, vecCol,
      ivfCentroids(df, idCol, vecCol, nCells), query, k, nprobe)

  /** Materialize the corpus as an on-disk IVF index: rows written
    * partitioned BY CELL, so probing reads only nprobe/nCells of the data —
    * at 100 TB the scan cost of a query drops with the partition count
    * instead of the corpus size. Returns the centroids (k rows, tiny) for
    * the caller to persist alongside. */
  def writeIvfIndex(
      df: DataFrame, idCol: String, vecCol: String,
      path: String, nCells: Int = 16, refineIters: Int = 0): Seq[(Int, Seq[Float])] = {
    val centroids =
      if (refineIters > 0) kmeansCentroids(df, idCol, vecCol, nCells, refineIters)
      else ivfCentroids(df, idCol, vecCol, nCells)
    withIvfCell(df, vecCol, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    centroids
  }

  /** SemDeDup-style semantic deduplication (Abbas, Tirumala, Simig,
    * Ganguli, Morcos, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication", 2023 — public): cluster the
    * embedding space with k-means, then compare pairs ONLY within a
    * cluster — the clustering is what makes semantic dedup tractable
    * (pairs are O(Σ m_c²) over cell sizes, never corpus²).
    *
    * Returns the DROP list with evidence: each row is a document that has
    * a same-cell witness with cosine ≥ `tau` and a smaller id — (vec_id,
    * cell, kept_by = smallest such witness, cosine to that witness). The
    * kept corpus = input ∖ drops; keeping the minimum id per near-dup
    * group is the same deterministic convention as the text-dedup tier.
    *
    * 100 TB shape: ONE fused cell assignment (no shuffle), then a single
    * cell-keyed self-join — vectors ride that one exchange because the
    * verifying cosine needs them (the SemDeDup trade: cluster-bounded
    * candidate volume in exchange for vector-payload shuffles; cells
    * should be sized ~10⁴-vector — skewed giant cells are visible as
    * straggler tasks and split by raising nCells). */
  def semanticDedupDrops(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Float])], tau: Double): DataFrame = {
    val assigned = withIvfCell(df, vecCol, centroids)
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"), col("cell"))
    val witnesses = assigned
      .select(col("vec_id").as("wit_id"), col("v").as("wv"), col("cell"))
    assigned.join(witnesses, Seq("cell"))
      .filter(col("wit_id") < col("vec_id"))
      .withColumn("cosine", GraftFunctions.cosineSim(col("v"), col("wv")))
      .filter(col("cosine") >= tau)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("wit_id").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("wit_id").as("kept_by"), col("cosine"))
  }

  /** Clustering-quality report for a centroid set: per cell — member
    * count, exact min/max cosine-to-centroid, and the mean in quantized
    * micro-cosine units (each member's cosine floored to 1e-6 before the
    * integer sum, so the aggregate is ORDER-INDEPENDENT and exact on any
    * partitioning/engine — a raw double mean would depend on summation
    * order). The observability face of the k-means tier: skewed or
    * incoherent cells (huge n, low mean) are where IVF probes degrade and
    * SemDeDup pair volume concentrates.
    *
    * 100 TB shape: fused cell assignment + a broadcast nCells-row centroid
    * join + ONE cell-keyed aggregation (map-side partial; no per-group
    * arrays, no collects). */
  def clusterReport(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    val centDf = df.sparkSession.createDataFrame(centroids)
      .toDF("cell", "cv")
    withIvfCell(df, vecCol, centroids)
      .join(broadcast(centDf), "cell")
      .withColumn("cos", GraftFunctions.cosineSim(col(vecCol), col("cv")))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).cast("long").as("n_members"),
        min(col("cos")).as("min_cos"),
        max(col("cos")).as("max_cos"),
        sum(floor(col("cos") * lit(1000000.0)).cast("long")).as("sum_cos_q6"))
      .select(col("cell"), col("n_members"), col("min_cos"), col("max_cos"),
        col("sum_cos_q6"),
        (col("sum_cos_q6").cast("double") / col("n_members").cast("double")
          / lit(1000000.0)).as("mean_cos_q"))
  }

  /** Symmetric int8 scalar quantization of an embedding column — the
    * storage tier of the ANN index (4× smaller than float32; the standard
    * compression for billion-vector IVF deployments). Per vector: scale
    * s = max |v_i|; q_i = floor(v_i/s·127 + 0.5) ∈ [−127, 127]
    * (round-half-up via floor, deterministic and engine-portable — no
    * banker's-rounding divergence). Reconstruction v̂_i = q_i·s/127 has
    * per-component error ≤ s/254. Zero vectors quantize to all-zero with
    * scale 0. One narrow projection, no shuffle. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // alias the max-abs scale ONCE before the per-element lambda reads it:
    // higher-order-function bodies sit outside subexpression elimination,
    // so an inlined scale would recompute the O(d) max per component
    // (O(d²) per row) — the CollapseProject lesson, one level down
    df.select(col(idCol), v.as("v"),
        array_max(transform(v, x => abs(x))).cast("double").as("scale"))
      .select(
        col(idCol),
        col("scale"),
        when(col("scale") === 0d, transform(col("v"), _ => lit(0)))
          .otherwise(transform(col("v"), x =>
            floor(x.cast("double") / col("scale") * lit(127.0) + lit(0.5)).cast("int")))
          .as("qvec"))
  }

  /** Dequantized vectors from [[quantizeInt8]] output (float32, the ANN
    * operators' input type). */
  def dequantizeInt8(df: DataFrame): DataFrame =
    df.withColumn("vec",
      transform(col("qvec"), q =>
        (q.cast("double") * col("scale") / lit(127.0)).cast("float")))

  /** Probe an on-disk IVF index: the `cell` filter is a PARTITION filter —
    * Spark prunes non-probed cell directories at planning time and never
    * opens their files (plan-asserted in SimilaritySpec). */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Seq[(Int, Seq[Float])], idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nprobe: Int = 4): DataFrame = {
    GraftFunctions.register(spark)
    val probed = nearestCells(centroids, query, nprobe)
    spark.read.parquet(path)
      .filter(col("cell").isin(probed: _*))
      .select(
        col(idCol),
        GraftFunctions.cosineSim(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
