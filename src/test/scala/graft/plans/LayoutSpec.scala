package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Z-order layout: key math vs a reference Morton implementation, per-file
  * multi-dimension locality vs a single-column sort, and actual row-group
  * skipping on the second dimension (the one a linear layout can never
  * serve). */
class LayoutSpec extends SparkTestBase {

  lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  val dims = Seq("l_partkey", "l_suppkey")

  /** Reference Morton code, bit-by-bit (the slow obvious form). */
  private def morton(qs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (d <- qs.indices; i <- 0 until bits)
      z |= ((qs(d) >> i) & 1L) << (i * qs.length + d)
    z
  }

  test("zValue equals the reference interleave on real rows") {
    val ranges = Layout.dimRanges(li, dims)
    val got = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        Layout.zValue(dims, ranges).as("z"))
      .limit(200).collect()
    got.foreach { r =>
      val qs = Seq(r.getLong(2), r.getLong(3)).zip(ranges).map { case (v, (mn, mx)) =>
        if (mx == mn) 0L else (v - mn) * 65535L / (mx - mn)
      }
      assert(r.getLong(4) == morton(qs, 16),
        s"z mismatch for (${r.getLong(2)}, ${r.getLong(3)})")
    }
  }

  /** Average per-file (max−min) extent of `dim`, as a fraction of its
    * global extent. */
  private def avgSpan(dir: String, dim: String): Double = {
    val df = spark.read.parquet(dir)
    val g = df.agg(min(col(dim)).cast("double"), max(col(dim)).cast("double")).head()
    val global = math.max(g.getDouble(1) - g.getDouble(0), 1e-9)
    val spans = df.groupBy(input_file_name())
      .agg((max(col(dim)) - min(col(dim))).cast("double").as("span"))
      .collect().map(_.getDouble(1))
    spans.sum / spans.length / global
  }

  test("z-order localizes BOTH dimensions per file; a linear sort only one") {
    val zdir = s"target/zorder_${System.nanoTime()}"
    val ldir = s"target/linear_${System.nanoTime()}"
    Layout.zorderWrite(li, dims, zdir, numFiles = 8)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(ldir)

    val zPart = avgSpan(zdir, "l_partkey"); val zSupp = avgSpan(zdir, "l_suppkey")
    val lPart = avgSpan(ldir, "l_partkey"); val lSupp = avgSpan(ldir, "l_suppkey")
    assert(zPart < 0.7, s"z layout does not localize l_partkey: $zPart")
    assert(zSupp < 0.7, s"z layout does not localize l_suppkey: $zSupp")
    assert(lPart < 0.3, s"linear layout should localize its sort column: $lPart")
    assert(lSupp > 0.8, s"linear layout cannot localize l_suppkey: $lSupp")
  }

  test("overflow-wide ranges and empty inputs fail loudly") {
    // a signed domain wider than Long must hit the guard, not wrap past it
    val e1 = intercept[IllegalArgumentException] {
      Layout.zValue(Seq("x"), Seq((Long.MinValue / 2, Long.MaxValue / 2)))
    }
    assert(e1.getMessage.contains("overflows the quantizer"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.dimRanges(li.filter(col("l_orderkey") < 0), dims)
    }
    assert(e2.getMessage.contains("no non-null values"))
  }

  test("three-dimension z-order localizes all three dims per file") {
    val dims3 = Seq("l_partkey", "l_suppkey", "l_orderkey")
    // reference-interleave agreement at D=3 (key uses 48 of 63 bits)
    val ranges = Layout.dimRanges(li, dims3)
    val sample = li.select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        Layout.zValue(dims3, ranges).as("z"))
      .limit(50).collect()
    sample.foreach { r =>
      val qs = (0 until 3).map(i => (r.getLong(i), ranges(i))).map { case (v, (mn, mx)) =>
        if (mx == mn) 0L else (v - mn) * 65535L / (mx - mn)
      }
      assert(r.getLong(3) == morton(qs, 16))
    }
    val zdir = s"target/zorder3_${System.nanoTime()}"
    Layout.zorderWrite(li, dims3, zdir, numFiles = 8)
    dims3.foreach { d =>
      val span = avgSpan(zdir, d)
      assert(span < 0.85, s"3-dim z layout does not localize $d: $span")
    }
  }

  /** Rows surviving parquet row-group pruning for `filter` over `dir`
    * (scan-node numOutputRows; AQE off so the executed tree is directly
    * traversable). */
  private def rowsScanned(dir: String, filterExpr: String): Long = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.read.parquet(dir).filter(filterExpr)
      val qe = df.queryExecution
      qe.toRdd.count()
      qe.executedPlan.collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("second-dimension filters skip row groups on the z layout, not the linear one") {
    val zdir = s"target/zorder_skip_${System.nanoTime()}"
    val ldir = s"target/linear_skip_${System.nanoTime()}"
    Layout.zorderWrite(li, dims, zdir, numFiles = 8)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(ldir)

    val total = li.count()
    val smin = li.agg(min(col("l_suppkey"))).head().getLong(0)
    val f = s"l_suppkey = $smin"
    val zRows = rowsScanned(zdir, f)
    val lRows = rowsScanned(ldir, f)
    assert(lRows >= (total * 0.9).toLong,
      s"linear layout unexpectedly skipped on the second dim: $lRows of $total")
    assert(zRows <= (total * 0.7).toLong,
      s"z layout skipped nothing on the second dim: $zRows of $total")
    assert(zRows < lRows, s"z layout must scan fewer rows: $zRows vs $lRows")
  }
}
