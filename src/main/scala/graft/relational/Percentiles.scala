package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated percentiles, distributed — the 100 TB shape of the
  * exact tier (the approx twin is the GK sketch, `r_percentiles_approx`).
  *
  * Spark's builtin `percentile` aggregate buffers EVERY group member in a
  * single in-memory aggregation buffer (an OpenHashMap of counts — no
  * spill path): honest at sf0.1, an executor-memory killer when one group
  * holds billions of rows. This operator computes the identical
  * interpolated value from a sort-rank instead:
  *
  *   1. per value column, rank rows within each group by a window
  *      `row_number` (WindowExec sorts with a SPILLABLE buffer — memory
  *      is bounded by the sorter, not the group) with the per-group
  *      non-null count `n` riding the same window sort as an unordered
  *      whole-partition `count` (nulls sort last, so ranks over the
  *      non-null prefix are unchanged);
  *   2. the interpolated percentile needs only rows at ranks
  *      floor(k)+1 and ceil(k)+1 where k = (n−1)·p — selected with
  *      conditional aggregates in ONE per-group pass;
  *   3. value = (ceil(k)−k)·v_lo + (k−floor(k))·v_hi (v_lo when the rank
  *      is integral) — the exact TWO-PRODUCT interpolation of Spark's
  *      `Percentile.getPercentile` (NOT the algebraically-equal
  *      v_lo + Δ·frac form, which differs in the last ulp), so results
  *      are BIT-IDENTICAL to the builtin aggregate (and to DuckDB's
  *      `quantile_cont`, the gate oracle) — asserted in PercentilesSpec,
  *      gated hash-exact in `r_percentiles`.
  *
  * Cost: ONE exchange of the input shared by every value column (plus
  * one in-partition sort per column) vs the builtin's single agg
  * exchange — the price of
  * bounded memory. All percentiles of one column ride ONE ranked frame
  * and ONE aggregation.
  */
object Percentiles {

  /** `specs`: (valueCol, p, outName) triples; percentiles of the same
    * value column share one sort. Output: groupCol, then one column per
    * spec in the given order.
    *
    * Plan shape (r16, guide §2.4): ONE scan and ONE exchange per value
    * column — the per-group non-null count `n` rides the SAME window
    * sort as the ranks (an unordered whole-partition `count` plans as a
    * second Window over the first's sort: no new exchange, no new
    * sort), replacing the former per-column count aggregate + broadcast
    * join, which re-scanned and re-shuffled the input once per column
    * (plan audit: 4 scans / 4 exchanges → 2 / 2 for the two-column
    * gate). The optimizer's column pruning deliberately keeps one
    * NARROW pipeline per value column rather than one wide shared
    * exchange — columnar scans make two one-column passes ≈ one
    * two-column pass, so this is the right 100 TB shape. The per-group
    * aggregate after the window reuses the window's hash partitioning
    * (no further exchange). Nulls sort LAST (rank > n, so the
    * rank-select conditions can never pick one) — rank arithmetic over
    * the non-null prefix is identical to the old filter-then-rank form,
    * and all-null groups drop exactly as the former inner join dropped
    * them (`n > 0` post-filter). */
  def exactInterpolated(
      df: DataFrame, groupCol: String,
      specs: Seq[(String, Double, String)]): DataFrame = {
    require(specs.nonEmpty, "no percentile specs")
    require(specs.forall { case (_, p, _) => p >= 0.0 && p <= 1.0 },
      "percentile p must be in [0, 1]")
    val byCol = specs.groupBy(_._1)
    val valueCols = specs.map(_._1).distinct
    // one shared projection: identical exchange children across columns
    // is exactly what lets ReuseExchange collapse them to one shuffle
    val base = df.select((groupCol +: valueCols).distinct.map(col): _*)
    val parts = valueCols.map { v =>
      val w = Window.partitionBy(col(groupCol)).orderBy(col(v).asc_nulls_last)
      val wp = Window.partitionBy(col(groupCol))
      val ranked = base
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(col(v)).over(wp))
      val aggs = byCol(v).map { case (_, p, out) =>
        val k = (col("__n") - 1).cast("double") * lit(p)
        val lo = floor(k).cast("long") + 1
        val hi = ceil(k).cast("long") + 1
        val vlo = max(when(col("__rn") === lo, col(v).cast("double")))
        val vhi = max(when(col("__rn") === hi, col(v).cast("double")))
        // k, floor(k), ceil(k) are group constants (n is); max() just
        // lifts them through the aggregation. The two-product form with
        // an integral-rank branch is Percentile.getPercentile verbatim.
        when(max(ceil(k)) === max(floor(k)), vlo)
          .otherwise(
            (max(ceil(k)) - max(k)) * vlo + (max(k) - max(floor(k))) * vhi)
          .as(out)
      }
      ranked.groupBy(col(groupCol))
        .agg(aggs.head, (aggs.tail :+ max(col("__n")).as("__n")): _*)
        .filter(col("__n") > 0).drop("__n")
    }
    parts.reduce((a, b) => a.join(b, Seq(groupCol)))
      .select(col(groupCol) +: specs.map { case (_, _, out) => col(out) }: _*)
  }
}
