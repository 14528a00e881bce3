package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("saveComponents/loadComponents round-trip bit-exactly; loaded projection ≡ trained projection") {
    val (m, comps) = Pca.components(embs, "embedding", 64, nComponents = 2, iters = 3)
    val path = s"target/pca_artifact_${System.nanoTime()}"
    Pca.saveComponents(spark, path, m, comps)
    val (m2, comps2) = Pca.loadComponents(spark, path)
    assert(m2 == m && comps2 == comps, "artifact round-trip must be the identity on doubles")
    val trained = Pca.project(embs, "vec_id", "embedding", m, comps)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val loaded = Pca.project(embs, "vec_id", "embedding", m2, comps2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(loaded == trained)
  }

  test("components are bit-identical on any partitioning (quantized-sum power iteration)") {
    val a = Pca.components(embs, "embedding", 64, nComponents = 2, iters = 3)
    val b = Pca.components(embs.repartition(17), "embedding", 64, nComponents = 2, iters = 3)
    assert(a == b, "PCA must be partitioning-invariant bit for bit")
  }

  test("recovers a planted dominant direction; components are unit-norm and near-orthogonal") {
    val rnd = new scala.util.Random(7)
    val dir1 = Array.fill(64)(rnd.nextGaussian())
    val n1 = math.sqrt(dir1.map(x => x * x).sum)
    val d1 = dir1.map(_ / n1)
    val rows = (0 until 400).map { i =>
      val scale = rnd.nextGaussian() * 10.0
      val noise = Array.fill(64)(rnd.nextGaussian() * 0.3)
      (i.toLong, d1.indices.map(j => (d1(j) * scale + noise(j)).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "vec")
    val (_, comps) = Pca.components(df, "vec", 64, nComponents = 2, iters = 4)
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val c1 = comps.head
    assert(math.abs(math.sqrt(dot(c1, c1)) - 1.0) < 1e-12, "c1 must be unit norm")
    val align = math.abs(dot(c1, d1.toSeq))
    assert(align > 0.99, s"c1 must align with the planted direction, cos=$align")
    val c2 = comps(1)
    assert(math.abs(math.sqrt(dot(c2, c2)) - 1.0) < 1e-12, "c2 must be unit norm")
    assert(math.abs(dot(c1, c2)) < 0.05, s"c1·c2=${dot(c1, c2)} not near-orthogonal")
  }

  test("projection is exchange-free and captures more variance on c1 than c2") {
    val (m, comps) = Pca.components(embs, "embedding", 64, nComponents = 2, iters = 3)
    val proj = Pca.project(embs, "vec_id", "embedding", m, comps)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    val row = proj.agg(
      // population variance of the centered projections; p-mean ≈ 0 already
      avg(col("p1") * col("p1")).as("v1"),
      avg(col("p2") * col("p2")).as("v2")).head()
    assert(row.getDouble(0) >= row.getDouble(1),
      s"c1 variance ${row.getDouble(0)} must be >= c2 variance ${row.getDouble(1)}")
  }

  test("reduced-space ANN agrees with full-space brute force on a planted near-duplicate") {
    val rnd = new scala.util.Random(11)
    // a genuine 2-D principal subspace (directions A ⊥ B) with the twin
    // pair (ids 1000/1001) planted in a far corner of that plane
    def unit(a: Array[Double]): Array[Double] = {
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
    }
    val dirA = unit(Array.fill(64)(rnd.nextGaussian()))
    val rawB = Array.fill(64)(rnd.nextGaussian())
    val dAB = dirA.zip(rawB).map { case (x, y) => x * y }.sum
    val dirB = unit(rawB.indices.map(j => rawB(j) - dAB * dirA(j)).toArray)
    def mk(sA: Double, sB: Double, eps: Double): Seq[Float] =
      dirA.indices.map(j =>
        (dirA(j) * sA + dirB(j) * sB + rnd.nextGaussian() * 0.1 + eps).toFloat).toSeq
    val rows = (0 until 200).map(i =>
      (i.toLong, mk(rnd.nextGaussian() * 4.0, rnd.nextGaussian() * 4.0, 0.0))) ++
      Seq((1000L, mk(15.0, -15.0, 0.0)), (1001L, mk(15.0, -15.0, 0.001)))
    val df = rows.toDF("vec_id", "vec")
    val (m, comps) = Pca.components(df, "vec", 64, nComponents = 2, iters = 4)
    val proj = Pca.project(df, "vec_id", "vec", m, comps)
    // 1001's nearest reduced-space neighbor (euclidean in 2D) must be 1000
    val pq = proj.filter(col("vec_id") === 1001L).head()
    val (q1, q2) = (pq.getDouble(1), pq.getDouble(2))
    val nearest = proj.filter(col("vec_id") =!= 1001L)
      .select(col("vec_id"),
        ((col("p1") - q1) * (col("p1") - q1) +
          (col("p2") - q2) * (col("p2") - q2)).as("d2"))
      .orderBy(col("d2").asc).limit(1).head().getLong(0)
    assert(nearest == 1000L, s"reduced-space nearest of the planted twin is $nearest, not 1000")
  }
}
