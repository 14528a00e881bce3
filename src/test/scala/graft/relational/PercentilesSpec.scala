package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val li =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("distributed rank-select ≡ the builtin percentile aggregate, bit-for-bit") {
    val specs = Seq(
      ("l_quantity", 0.5, "p50"), ("l_quantity", 0.9, "p90"),
      ("l_extendedprice", 0.25, "p25"), ("l_extendedprice", 1.0, "p100"),
      ("l_quantity", 0.0, "p0"))
    val got = Percentiles.exactInterpolated(li, "l_returnflag", specs)
      .orderBy(col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 1.0)").as("p100"),
        expr("percentile(l_quantity, 0.0)").as("p0"))
      .orderBy(col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == builtin.toSeq)
  }

  test("hand-checked interpolation, single-row group, null exclusion") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(4.0)), ("a", None),
      ("b", Some(7.0)))
      .toDF("g", "v")
    val got = Percentiles.exactInterpolated(df, "g",
      Seq(("v", 0.5, "p50"), ("v", 0.75, "p75")))
      .orderBy(col("g")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    // group a (nulls excluded, n=3): p50 = 2.0; p75: k = 1.5 -> 2 + 0.5*(4-2) = 3.0
    // group b (n=1): both percentiles = the single value
    assert(got == Seq(("a", 2.0, 3.0), ("b", 7.0, 7.0)))
  }

  test("results are partitioning-invariant and the plan holds no full-group aggregate buffer") {
    val specs = Seq(("l_quantity", 0.9, "p90"))
    val a = Percentiles.exactInterpolated(li, "l_returnflag", specs)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val b = Percentiles.exactInterpolated(li.repartition(17), "l_returnflag", specs)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(a == b)
    val plan = Percentiles.exactInterpolated(li, "l_returnflag", specs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"),
      s"the distributed form must not fall back to the buffering aggregate:\n$plan")
  }

  test("one scan and one shuffle per distinct value column (r16 plan shape)") {
    // two distinct value columns, three specs: the former per-column count
    // aggregate + broadcast join re-scanned and re-shuffled the input once
    // per column (4 scans / 4 shuffles here); the count now rides the rank
    // window's own sort
    val specs = Seq(
      ("l_quantity", 0.5, "p50"), ("l_quantity", 0.9, "p90"),
      ("l_extendedprice", 0.25, "p25"))
    val plan = Percentiles.exactInterpolated(li, "l_returnflag", specs)
      .queryExecution.executedPlan.toString
    def count(needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    // "Scan parquet" is a substring of "FileScan parquet" — counting the
    // shorter form covers both spellings exactly once per scan node
    assert(count("Scan parquet") == 2,
      s"expected exactly one scan per distinct value column:\n$plan")
    assert(count("Exchange hashpartitioning") <= 2,
      s"expected at most one shuffle per distinct value column:\n$plan")
  }
}
