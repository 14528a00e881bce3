package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling and sequence packing for
  * training-data pipelines (north-star ops, SURVEY §2.3 family).
  *
  * Sampling is HASH-based, not RNG-based: a row's membership depends only
  * on its key, so the sample is reproducible under any partitioning, any
  * engine, any corpus subset, and any re-run — the property a training
  * pipeline needs so an ablation's subsets never drift between runs.
  * The hash is the ALT FNV-1a stream ([[graft.functions.TextHash.fnv1a64Alt]]),
  * deliberately independent of the primary stream used by
  * `LlmOps.trainSplit`, so sampling and split assignment don't correlate. */
object Sampling {

  /** Buckets in [0, 1e6): fraction resolution of one part per million. */
  private val Resolution = 1000000L

  private[graft] def bucket(key: Column): Column =
    pmod(GraftFunctions.fingerprint64Alt(key.cast("string")), lit(Resolution))

  private[graft] def threshold(fraction: Double): Long =
    math.round(fraction * Resolution)

  /** Keep each row iff hash(key) mod 1e6 < fraction·1e6. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.filter(bucket(key) < lit(threshold(fraction)))
  }

  /** Deterministic per-group cap (the RefinedWeb/C4-style per-domain
    * limit): keep the first `maxN` rows of each group in
    * (`orderCol`, `idCol`) order — with a content-stable hash as
    * `orderCol`, an unbiased reproducible subsample of every
    * over-represented source.
    *
    * 100 TB shape: a single `row_number` window sorts each group in ONE
    * task, so a dominant domain (a third of the crawl is not unusual)
    * becomes a straggler. This runs TWO bounded phases instead: per
    * (group, salt) top-`maxN` — `salts` parallel tasks bound any group's
    * sort at its salt-slice size — then top-`maxN` over the ≤ salts·maxN
    * survivors. Phase-2 input is capped regardless of group size, and the
    * result provably equals the single-window form: each group's global
    * first-maxN rows all survive their salt slice (a row ahead of them in
    * phase 1 is ahead globally). Equivalence + cap + partitioning
    * invariance pinned in SamplingSpec; the `d_source_cap` oracle is the
    * single-window form. */
  def capPerGroup(
      df: DataFrame, groupCol: String, idCol: String,
      orderCol: Column, maxN: Int, salts: Int = 8): DataFrame = {
    require(maxN >= 1 && salts >= 1, s"need maxN, salts >= 1: $maxN, $salts")
    val w1 = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(orderCol.asc, col(idCol).asc)
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(orderCol.asc, col(idCol).asc)
    // hash-based salt: works for ANY id type (a long cast would go NULL on
    // string ids and silently collapse every salt slice into one task —
    // the exact straggler this function exists to prevent). The salt only
    // routes rows; the phase-2 window makes the result salt-independent.
    df.withColumn("__salt", pmod(hash(col(idCol)), lit(salts)))
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= maxN)
      .withColumn("__r2", row_number().over(w2))
      .filter(col("__r2") <= maxN)
      .drop("__salt", "__r1", "__r2")
  }

  /** Per-stratum fractions (strata not listed fall back to `default`) —
    * the content-stable analog of `DataFrameStatFunctions.sampleBy`. One
    * codegen'd filter, no shuffle, no RNG state. */
  def stratifiedSample(
      df: DataFrame, key: Column, strata: Column,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val limit = fractions.toSeq.sortBy(_._1).foldLeft(lit(threshold(default))) {
      case (acc, (s, f)) => when(strata === s, lit(threshold(f))).otherwise(acc)
    }
    df.filter(bucket(key) < limit)
  }

  /** Rebalance a corpus to a target group mixture by per-group
    * deterministic downsampling — the domain-weighting step of training-set
    * assembly (e.g. "40% web, 20% code, …"). Keeps the LARGEST corpus
    * consistent with the target: the binding group g* = argmin n_g/w_g is
    * kept whole and every other group is hash-downsampled to
    * n_total·w_g rows, where n_total = min_g n_g/w_g.
    *
    * Everything stays in-plan: the per-group count/threshold table is one
    * tiny aggregation broadcast back into the scan (no driver collect), and
    * membership is the same content-stable ALT-hash bucket as
    * [[deterministicSample]], so the rebalanced corpus is reproducible
    * under any partitioning or subset. Groups missing from `weights` are
    * dropped (weight 0). Thresholds use double arithmetic in a fixed
    * association order so an external oracle can replicate them exactly. */
  def rebalanceToMixture(
      df: DataFrame, key: Column, group: Column,
      weights: Map[String, Double]): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val counts = df.groupBy(group.as("g"))
      .agg(count(lit(1)).cast("double").as("n_g"))
    val wCol = weights.toSeq.sortBy(_._1).foldLeft(lit(Double.NaN)) {
      case (acc, (g, w)) => when(col("g") === g, lit(w)).otherwise(acc)
    }
    val weighted = counts.withColumn("w_g", wCol).filter(!isnan(col("w_g")))
    val total = weighted.agg(min(col("n_g") / col("w_g")).as("n_total"))
    // The binding group (n_g/w_g == n_total — the same double computed the
    // same way, so the equality is exact) is pinned to keep-everything
    // explicitly: (n_total·w_g)/n_g can round to 0.99999… in IEEE double,
    // and flooring that would silently drop its bucket-999999 rows.
    val thresholds = weighted.crossJoin(broadcast(total))
      .select(col("g"),
        when(col("n_g") / col("w_g") === col("n_total"), lit(Resolution))
          .otherwise(floor(
            col("n_total") * col("w_g") / col("n_g") * lit(Resolution.toDouble))
            .cast("long"))
          .as("thr"))
    df.join(broadcast(thresholds), group === col("g"))
      .filter(bucket(key) < col("thr"))
      .drop("g", "thr")
  }

  /** Pack rows into ≤`budget`-token bins per `part`, greedily in `order`
    * order, via cumulative-offset binning: a row belongs to the bin where
    * its token range STARTS (bin = floor((cumsum − n) / budget)), so a row
    * straddling a boundary stays in the earlier bin and that bin overshoots
    * by at most one row's tokens — the standard pack-then-truncate/carry
    * contract of sequence packing, expressible as ONE window function
    * (a strict never-exceed next-fit is inherently sequential state).
    * Adds `bin`; one shuffle on `part`. */
  def packByTokenBudget(
      df: DataFrame, order: Column, nTokens: Column, part: Column,
      budget: Int): DataFrame = {
    val w = Window.partitionBy(part).orderBy(order)
    val cum = sum(nTokens.cast("long")).over(w)
    df.withColumn("bin",
      floor((cum - nTokens.cast("long")) / lit(budget.toDouble)).cast("long"))
  }
}
