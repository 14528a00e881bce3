package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkTestBase {

  private val base = "target/sources_test"

  test("csv round-trip preserves schema-on-read and values") {
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    Sources.writeCsv(customer, s"$base/customer_csv")
    val back = Sources.readCsv(spark, s"$base/customer_csv", customer.schema)
    assert(back.schema == customer.schema)
    assert(back.count() == customer.count())
    val a = customer.orderBy("c_custkey").collect().map(_.toSeq)
    val b = back.orderBy("c_custkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("json round-trip preserves values") {
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    Sources.writeJson(nation, s"$base/nation_json")
    val back = Sources.readJson(spark, s"$base/nation_json", nation.schema)
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq ==
      nation.orderBy("n_nationkey").collect().map(_.toSeq).toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("status", col("o_orderstatus"))
    Sources.writeParquet(orders, s"$base/orders_part", partitionBy = Seq("status"))
    val pruned = spark.read.parquet(s"$base/orders_part").filter(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must land in the scan, not a post-filter
    assert(plan.contains("PartitionFilters") && plan.contains("status"), plan)
    assert(pruned.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
  }
}
