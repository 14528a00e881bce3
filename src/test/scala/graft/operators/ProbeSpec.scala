package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProbeSpec extends SparkTestBase {

  import spark.implicits._

  // a linearly separable toy: label = 1 iff feature 0 dominates
  private def toyData(n: Int) = {
    val rnd = new scala.util.Random(3)
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val v = Array.fill(4)(rnd.nextFloat() * 0.2f)
      if (pos) v(0) = 0.9f else v(1) = 0.9f
      (v.toSeq, if (pos) 1.0 else 0.0)
    }.toDF("x", "y")
  }

  test("GD drives the margin to separate the classes; exact hand-replay of round 1") {
    val df = toyData(200)
    val w = Probe.trainLinear(df, "x", "y", dim = 4, iters = 5, lr = 0.5)
    // learned direction: w0 strongly positive vs w1
    assert(w(0) > w(1) + 0.1, s"weights did not separate: $w")
    val margins = Probe.score(df, "x", w)
      .select(col("y"), col("margin")).collect()
    val posMin = margins.filter(_.getDouble(0) == 1.0).map(_.getDouble(1)).min
    val negMax = margins.filter(_.getDouble(0) == 0.0).map(_.getDouble(1)).max
    assert(posMin > negMax, s"margins overlap: posMin=$posMin negMax=$negMax")

    // round 1 from w=0: grad_j = Σ floor(-y·x_j·1e9)/n/1e9, w_j = -0.5·grad_j
    val rows = df.collect().map(r => (r.getSeq[Float](0), r.getDouble(1)))
    val n = rows.length.toDouble
    val expected = (0 until 4).map { j =>
      val g = rows.map { case (x, y) =>
        math.floor((0.0 - y) * x(j).toDouble * 1e9).toLong
      }.sum
      0.0 - 0.5 * (g.toDouble / n / 1e9)
    }
    val w1 = Probe.trainLinear(df, "x", "y", dim = 4, iters = 1, lr = 0.5)
    assert(w1 == expected, s"round-1 weights $w1 != hand-replay $expected")
  }

  test("quantized gradients make training partitioning-invariant bit-for-bit") {
    val df = toyData(300)
    val a = Probe.trainLinear(df, "x", "y", 4, iters = 3)
    val b = Probe.trainLinear(df.repartition(13), "x", "y", 4, iters = 3)
    val c = Probe.trainLinear(df.repartition(1), "x", "y", 4, iters = 3)
    assert(a == b && b == c, s"weights drift across partitionings: $a / $b / $c")
  }
}
