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
    // positional aggregate aliases + backtick-quoted references: a column
    // named `user name` (or carrying quotes/dots) must profile, not crash
    // the stack() parse; the display label is escaped as a SQL literal
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$i"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"nd_$i"),
        min(col(c)).cast("string").as(s"mn_$i"),
        max(col(c)).cast("string").as(s"mx_$i"))
    } :+ count(lit(1)).as("n_rows")
    val wide = df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) =>
        val label = c.replace("\\", "\\\\").replace("'", "\\'")
        s"'$label', `nn_$i`, `nd_$i`, `mn_$i`, `mx_$i`"
      }
      .mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_value, max_value)")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
