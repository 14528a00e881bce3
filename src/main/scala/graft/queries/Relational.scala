package graft.queries

import graft.Tables
import graft.queries.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.2) expressed Spark-first.
  *
  * The reference delegates all relational execution to Slick
  * (reference: documentation/doc-01.md:154, doc-03.md:84-86); here each
  * capability is a native DataFrame pipeline that Catalyst optimizes
  * (pushdown, pruning, broadcast, whole-stage codegen). Every query takes
  * `(spark, sfDir)` and has a DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** TPC-H Q1 flavor: scan + filter + groupBy aggregation with map-side
    * partial aggregation; the shipdate filter is pushed to the parquet scan. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (rate(lit(1)) - rate(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (rate(lit(1)) - rate(col("l_discount")))
          * (rate(lit(1)) + rate(col("l_tax")))).cast("double").as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  SUM(l_quantity) AS sum_qty,
       |  ${sqlSumMoney("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(${sqlDec2("l_extendedprice")} * (${sqlRate("1")} - ${sqlRate("l_discount")})) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM(${sqlDec2("l_extendedprice")} * (${sqlRate("1")} - ${sqlRate("l_discount")}) * (${sqlRate("1")} + ${sqlRate("l_tax")})) AS DOUBLE) AS sum_charge,
       |  AVG(l_quantity) AS avg_qty,
       |  ${sqlAvgMoney("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
