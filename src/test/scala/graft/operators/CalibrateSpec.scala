package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Quantile-calibrated thresholding: kept fraction tracks the request,
  * the cut cleanly separates kept from dropped, the result is
  * partitioning-invariant, and the sketch path lands within the GK rank
  * bound of the exact cutoff. */
class CalibrateSpec extends SparkTestBase {

  private lazy val scored = {
    import spark.implicits._
    // deterministic non-uniform scores with ties
    (0L until 2000L).map(i => (i, ((i * 137) % 1000) / 1000.0))
      .toDF("id", "score")
  }

  test("keepTopFraction keeps ~the requested fraction and separates cleanly") {
    val n = scored.count()
    for (f <- Seq(0.25, 0.5, 0.7)) {
      val kept = Calibrate.keepTopFraction(scored, col("score"), f)
      val k = kept.count()
      assert(math.abs(k.toDouble / n - f) <= 2.0 / math.sqrt(n.toDouble) + 2.0 / n,
        s"kept $k of $n at keepFraction=$f")
      val minKept = kept.agg(min(col("score"))).head().getDouble(0)
      val dropped = scored.filter(col("score") < lit(minKept))
      assert(dropped.count() == n - k - scored.filter(col("score") === lit(minKept))
        .count() + kept.filter(col("score") === lit(minKept)).count(),
        "kept/dropped must partition the corpus at the cut")
      assert(dropped.agg(max(col("score"))).head().getDouble(0) < minKept,
        "every dropped score must sit below every kept score")
    }
  }

  test("cutoff is partitioning-invariant") {
    val a = Calibrate.quantileThreshold(scored.repartition(1), col("score"), 0.7)
    val b = Calibrate.quantileThreshold(scored.repartition(13), col("score"), 0.7)
    assert(a == b, s"exact percentile must not depend on partitioning: $a vs $b")
  }

  test("empty or all-null input fails loudly, not with an opaque NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "score")
    val e = intercept[IllegalArgumentException] {
      Calibrate.quantileThreshold(empty, col("score"), 0.5)
    }
    assert(e.getMessage.contains("no non-null scores"))
  }

  test("approx path lands within the GK rank bound of the exact cutoff") {
    val acc = 100
    val exact = Calibrate.quantileThreshold(scored, col("score"), 0.7)
    val approx = Calibrate.quantileThreshold(scored, col("score"), 0.7, approxAccuracy = acc)
    val n = scored.count().toDouble
    // rank distance between the two cut values, in rows
    val lo = math.min(exact, approx); val hi = math.max(exact, approx)
    val between = scored.filter(col("score") > lit(lo) && col("score") <= lit(hi)).count()
    assert(between <= (n / acc + n / 1000.0 + 1).toLong,
      s"sketch cut $approx vs exact $exact strays $between rows (bound ${n / acc})")
  }
}
