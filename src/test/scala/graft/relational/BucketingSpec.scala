package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Proves the SCALE.md claim that bucketing both sides of a fact join on the
  * join key removes the shuffle exchange entirely — the plan property that
  * turns a repeated 100 TB join into a scan-local merge. */
class BucketingSpec extends SparkTestBase {

  test("bucketed co-partitioned join has no shuffle exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    // the in-memory catalog forgets tables between sessions but the managed
    // locations persist — clear them or saveAsTable refuses
    Seq("orders_bkt", "customer_bkt").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"spark-warehouse/$t"))
    }
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bkt")

    // force the sort-merge path (the tiny test table would auto-broadcast,
    // which also avoids shuffles but proves nothing about bucketing)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      finally ()

    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(plan.contains("SortMergeJoin"), plan)
    // bucketed scans satisfy the join's distribution: no exchange below the
    // join — the only allowed exchange is the final aggregation's
    val joinPart = plan.split("SortMergeJoin").last
    assert(!joinPart.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")

    // same result as the plain join
    val expected = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(joined.collect().map(_.toSeq).toSet == expected)
  }
}
