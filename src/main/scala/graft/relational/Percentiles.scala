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
  *      is bounded by the sorter, not the group) and broadcast-join the
  *      per-group non-null count `n` (groups are few by definition of a
  *      grouped report);
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
  * Cost: one sort exchange per distinct value column (shared by all its
  * percentiles) vs the builtin's single agg exchange — the price of
  * bounded memory. All percentiles of one column ride ONE ranked frame
  * and ONE aggregation.
  */
object Percentiles {

  /** `specs`: (valueCol, p, outName) triples; percentiles of the same
    * value column share one sort. Output: groupCol, then one column per
    * spec in the given order. */
  def exactInterpolated(
      df: DataFrame, groupCol: String,
      specs: Seq[(String, Double, String)]): DataFrame = {
    require(specs.nonEmpty, "no percentile specs")
    require(specs.forall { case (_, p, _) => p >= 0.0 && p <= 1.0 },
      "percentile p must be in [0, 1]")
    val byCol = specs.groupBy(_._1)
    val parts = specs.map(_._1).distinct.map { v =>
      val w = Window.partitionBy(col(groupCol)).orderBy(col(v).asc)
      val counts = df.filter(col(v).isNotNull)
        .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      val ranked = df.filter(col(v).isNotNull)
        .select(col(groupCol), col(v))
        .withColumn("__rn", row_number().over(w))
        .join(broadcast(counts), Seq(groupCol))
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
      ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    }
    parts.reduce((a, b) => a.join(b, Seq(groupCol)))
      .select(col(groupCol) +: specs.map { case (_, _, out) => col(out) }: _*)
  }
}
