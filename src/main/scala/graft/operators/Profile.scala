package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data profiling — the data-quality report every pipeline
  * runs before trusting a new source: row count, null count, exact
  * distinct cardinality, min and max per column, as ONE aggregation pass
  * (a single wide agg over the scan; multiple exact distincts expand via
  * Catalyst's Expand operator — still one scan, map-side partial per
  * leg). The wide 1-row result is unpivoted driver-free with `stack`
  * into the (column, stats...) long form reports join against.
  *
  * min/max are computed on the NATIVE type (so numeric columns order
  * numerically) and cast to string only for the uniform output schema.
  * For web-scale profiling swap `count_distinct` for
  * `approx_count_distinct` via `exact = false` — same shape, bounded
  * sketch state (the HLL discipline); the gate uses the exact form so
  * the oracle can replay it.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val wide = df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c")
      .mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_value, max_value)")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
