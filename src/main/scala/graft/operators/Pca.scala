package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic power-iteration PCA over an embedding column — the
  * dimensionality-reduction step an ANN/semantic-dedup tier runs before
  * indexing (project 64-dim → top-k principal components, then build the
  * IVF/LSH index in the reduced space; cf. Jolliffe, "Principal Component
  * Analysis", and the standard power-iteration + deflation scheme in
  * Golub & Van Loan §8).
  *
  * Built in the [[Probe]] / [[Similarity.kmeansCentroids]] determinism
  * family so training is replayable ACROSS ENGINES, bit for bit:
  *
  *   - the mean and every power-iteration matrix application accumulate
  *     floor(x·10⁹) INTEGER sums — order-independent, so the result is
  *     identical on any partitioning and any cluster size;
  *   - per (component, iteration) the corpus sees ONE aggregation job;
  *     only dim+1 values (the quantized image vector and the count) reach
  *     the driver — the probe-GD shape;
  *   - normalization is sqrt/divide on exact longs-as-doubles: IEEE sqrt
  *     and division are correctly rounded everywhere, so the unit vectors
  *     match to the last bit;
  *   - deflation (component c ⊥ previous components) subtracts fixed-order
  *     projections per row IN-PLAN — no second data pass, no extra
  *     exchange.
  *
  * Quantization bound: centered coordinates of unit-scale embeddings stay
  * |xc| ≲ 2 and |dot| ≤ ‖xc‖² ≲ 4, so per-row quanta are ≤ ~10¹⁰ and the
  * long sum holds ~10⁸ rows per aggregation; shard or lower the quanta
  * beyond that (the [[Probe]] headroom note).
  */
object Pca {

  val Quanta = 1e9

  /** Mean vector via quantized integer sums — exact on any partitioning. */
  def meanVector(df: DataFrame, vecCol: String, dim: Int): Seq[Double] = {
    val sums = (0 until dim).map(j =>
      sum(floor(col(vecCol).getItem(j).cast("double") * lit(Quanta))
        .cast("long")).as(s"s$j"))
    val row = df.agg(count(lit(1)).as("n"), sums: _*).head()
    require(row.getLong(0) > 0L, "Pca.meanVector: empty input")
    val n = row.getLong(0).toDouble
    (0 until dim).map(j => row.getLong(j + 1).toDouble / n / Quanta)
  }

  /** Centered coordinates as ONE aliased array column (the CollapseProject
    * discipline: a non-cheap alias referenced many times is never
    * inlined, so the 64 subtractions run once per row). */
  private def centered(vecCol: String, m: Seq[Double]): Column =
    array(m.indices.map(j => col(vecCol).getItem(j).cast("double") - lit(m(j))): _*)

  /** Fixed-order dot product of an array column with a driver vector —
    * the left fold every replica (JVM and SQL) shares. */
  private def dotWith(arr: Column, v: Seq[Double]): Column =
    v.indices.map(j => arr.getItem(j) * lit(v(j))).reduce(_ + _)

  /** Top `nComponents` principal directions of the centered data by power
    * iteration with deflation: per component, `iters` rounds of
    * v ← normalize(Σ_rows xc·(xc·v)), starting from the exact seed
    * 1/√dim (= 0.125 at dim 64 — exactly representable, identical
    * literal in every engine). Returns (mean, components). */
  def components(
      df: DataFrame, vecCol: String, dim: Int,
      nComponents: Int = 2, iters: Int = 3): (Seq[Double], Seq[Seq[Double]]) = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      "Pca seed 1/sqrt(dim) must be exactly representable: dim must be a power of two")
    val m = meanVector(df, vecCol, dim)
    val seed = 1.0 / math.sqrt(dim.toDouble)
    val cached = df.select(centered(vecCol, m).as("xc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val comps = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
      for (_ <- 0 until nComponents) {
        // deflate AGAINST the components found so far: per prior component
        // one projection pair — the scalar d = z·c aliased ONCE, then the
        // rebuilt z = z − d·c (d inlined into 64 elements would re-run the
        // 64-term fold per element; the alias is never inlined)
        val base = comps.foldLeft(cached.select(col("xc").as("z"))) { (df0, c) =>
          df0.select(col("z"), dotWith(col("z"), c).as("d"))
            .select(array(
              c.indices.map(j => col("z").getItem(j) - col("d") * lit(c(j))): _*).as("z"))
        }
        var v = Seq.fill(dim)(seed)
        for (_ <- 0 until iters) {
          val withDot = base.select(col("z"), dotWith(col("z"), v).as("dt"))
          val sums = (0 until dim).map(j =>
            sum(floor(col("dt") * col("z").getItem(j) * lit(Quanta))
              .cast("long")).as(s"u$j"))
          val row = withDot.agg(count(lit(1)).as("n"), sums: _*).head()
          require(row.getLong(0) > 0L, "Pca.components: empty input")
          val us = (0 until dim).map(j => row.getLong(j + 1))
          val norm = math.sqrt(
            us.map(u => u.toDouble * u.toDouble).reduce(_ + _))
          require(norm > 0.0, "Pca.components: degenerate (zero) iteration image")
          v = us.map(_.toDouble / norm)
        }
        comps += v
      }
      (m, comps.toSeq)
    } finally { cached.unpersist(blocking = false): Unit }
  }

  /** Persist (mean, components) as an on-disk artifact — the deployment
    * split the probe/k-means tier already has: train ONCE batch-side,
    * then every downstream composition (reduced-space search, an index
    * build, a scoring stream) LOADS the frozen artifact instead of
    * replaying training. One row per vector (`idx` −1 = the mean,
    * 0..n−1 = components in order); doubles round-trip parquet
    * bit-exactly, so load ∘ save is the identity (asserted in PcaSpec)
    * and a loaded projection is bit-equal to a freshly-trained one. */
  def saveComponents(
      spark: org.apache.spark.sql.SparkSession, path: String,
      m: Seq[Double], comps: Seq[Seq[Double]]): Unit = {
    import spark.implicits._
    ((-1, m) +: comps.zipWithIndex.map { case (c, i) => (i, c) })
      .toDF("idx", "vector")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveComponents]] artifact: (mean, components). */
  def loadComponents(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[Double], Seq[Seq[Double]]) = {
    val rows = spark.read.parquet(path)
      .select(col("idx"), col("vector")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    val comps = (0 until rows.size - 1).map(rows(_))
    (rows(-1), comps)
  }

  /** Project every row onto the components: p_c = (x − m)·c, the exact
    * fixed-order fold — a narrow in-plan map, no shuffle, no driver. */
  def project(
      df: DataFrame, idCol: String, vecCol: String,
      m: Seq[Double], comps: Seq[Seq[Double]]): DataFrame = {
    val projections = comps.zipWithIndex.map { case (c, i) =>
      dotWith(col("xc"), c).as(s"p${i + 1}")
    }
    df.select(col(idCol), centered(vecCol, m).as("xc"))
      .select(col(idCol) +: projections: _*)
  }
}
