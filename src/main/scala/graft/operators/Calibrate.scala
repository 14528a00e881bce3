package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile-calibrated threshold filtering — the "keep the top X% by
  * score" step of the CCNet/GPT-3-style curation recipes, where the
  * cutoff is a property of the corpus distribution rather than a magic
  * constant (CCNet buckets by LM-perplexity terciles; quality-classifier
  * recipes keep a score quantile).
  *
  * The cutoff is ONE aggregation job and one double to the driver (the
  * bounded-collect discipline); the filter is then a codegen'd scan
  * predicate. Exact `percentile` buffers the score column in a single
  * aggregation buffer — fine up to ~10⁸ rows; at 100 TB pass
  * `approxAccuracy > 0` to use the Greenwald-Khanna sketch
  * (`percentile_approx`, bounded state, rank error ≤ n/accuracy), the
  * same exact/sketch twin discipline as the percentile gates. */
object Calibrate {

  /** The score value at quantile `1 − keepFraction`: filtering at
    * `score ≥` this cutoff keeps ~`keepFraction` of rows (exact to
    * interpolation at the boundary). */
  def quantileThreshold(
      df: DataFrame, score: Column, keepFraction: Double,
      approxAccuracy: Int = 0): Double = {
    require(keepFraction > 0.0 && keepFraction < 1.0,
      s"keepFraction must be in (0, 1), got $keepFraction")
    val p = 1.0 - keepFraction
    val cut =
      if (approxAccuracy > 0)
        percentile_approx(score, lit(p), lit(approxAccuracy))
      else call_function("percentile", score, lit(p))
    val row = df.agg(cut.cast("double").as("cut")).head()
    require(!row.isNullAt(0),
      "quantileThreshold: no non-null scores to calibrate against (empty input?)")
    row.getDouble(0)
  }

  /** Rows whose `score` is at or above the [[quantileThreshold]] cutoff —
    * approximately the top `keepFraction` of the distribution. */
  def keepTopFraction(
      df: DataFrame, score: Column, keepFraction: Double,
      approxAccuracy: Int = 0): DataFrame =
    df.filter(score >= lit(quantileThreshold(df, score, keepFraction, approxAccuracy)))
}
