package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: one entry per implemented operator
  * from SURVEY.md §2; `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible query (same column names, bit-exact numerics — see
  * [[graft.queries.Exact]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q.Relational.q1Agg _),
    // reference declaration surface (SURVEY §2.1)
    "c1_projection" -> (q.CoreSurface.projection _),
    "c4_order_page" -> (q.CoreSurface.orderPage _),
    "c6_hidden_sort" -> (q.CoreSurface.hiddenSort _),
    "c8_dynamic_filter" -> (q.CoreSurface.dynamicFilter _),
    "c9_poly_derive" -> (q.CoreSurface.polyDerive _),
    "c18_default_value" -> (q.CoreSurface.defaultValue _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> q.Relational.q1AggSql,
    "c1_projection" -> q.CoreSurface.projectionSql,
    "c4_order_page" -> q.CoreSurface.orderPageSql,
    "c6_hidden_sort" -> q.CoreSurface.hiddenSortSql,
    "c8_dynamic_filter" -> q.CoreSurface.dynamicFilterSql,
    "c9_poly_derive" -> q.CoreSurface.polyDeriveSql,
    "c18_default_value" -> q.CoreSurface.defaultValueSql,
  )
}
