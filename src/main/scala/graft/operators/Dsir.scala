package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection by hashed-n-gram importance weighting — the DSIR recipe
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023 — public): fit bag-of-hashed-n-gram models on
  * a target slice and on the raw corpus, and score every document by how
  * much more likely its features are under the target model than the raw
  * model. High scores = "looks like the data you want more of".
  *
  * Two deviations from the paper, both in the repo's determinism posture:
  *
  *   - the per-document statistic is the MEAN feature likelihood ratio
  *     folded in position order, not the log-likelihood-ratio sum — every
  *     contribution is IEEE division/addition of exact integer counts in
  *     ONE association order, so the score is bit-reproducible across
  *     engines (no `ln`; the [[LangModel]] mean-probability posture);
  *   - selection is a threshold on the score (ratio ≥ 1 = more target-like
  *     than not), not Gumbel-top-k resampling — no RNG in the engine.
  *
  * 100 TB shape: the "model" is two `dim`-row count tables plus their
  * 1-row totals, all broadcast; the corpus pays the feature explode and
  * ONE doc-keyed aggregation (position-sorted fold, state bounded by
  * document length). Nothing is collected; no shuffle carries text.
  */
object Dsir {

  /** Broadcastability contract of [[systematicResample]]'s offsets table:
    * at 8B weight + 8B bucket id per row, ~1M rows ≈ 16 MB — comfortably
    * inside Spark's broadcast regime and far below driver pressure. */
  val DsirMaxOffsetRows: Long = 1L << 20

  /** Importance scores for every document: n_feats (hashed word-bigram
    * features, the whole text as one feature below 2 tokens), imp_ratio
    * (mean target/raw likelihood ratio, add-one smoothed over `dim`
    * buckets), selected (ratio ≥ 1). `isTarget` marks the target-
    * distribution rows (e.g. `col("lang") === "en"` or a quality verdict);
    * target docs are scored too — self-selection is the DSIR sanity
    * check. */
  def importanceScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      dim: Int = 64): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two for the unsigned-mod bucket identity, got $dim")
    GraftFunctions.register(docs.sparkSession)

    // hashed-bigram feature stream with per-doc positions (pmod of the
    // signed FNV ≡ unsigned mod for a power-of-two dim — the
    // hashedTfVector identity the doc-vector oracle already pins)
    val feats = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        posexplode(GraftFunctions.wordShingles(col(textCol), 2)))
      .select(col("doc_id"), col("is_t"), col("pos"),
        pmod(GraftFunctions.fingerprint64(col("col")), lit(dim.toLong)).as("b"))

    val ct = feats.filter(col("is_t")).groupBy(col("b"))
      .agg(count(lit(1)).as("c_t"))
    val cr = feats.groupBy(col("b")).agg(count(lit(1)).as("c_r"))
    // totals derived from the tiny count tables, not another corpus pass
    val tot = ct.agg(sum(col("c_t")).as("t"))
      .crossJoin(broadcast(cr.agg(sum(col("c_r")).as("r"))))

    val pT = (coalesce(col("c_t"), lit(0L)).cast("double") + lit(1d)) /
      (col("t").cast("double") + lit(dim.toDouble))
    val pR = (coalesce(col("c_r"), lit(0L)).cast("double") + lit(1d)) /
      (col("r").cast("double") + lit(dim.toDouble))
    val contrib = feats
      .join(broadcast(ct), Seq("b"), "left")
      .join(broadcast(cr), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("pos"), (pT / pR).as("p"))

    // position-sorted sequential fold (the LangModel.scoreBigram shape):
    // one association order on any partitioning, and in the oracle
    contrib.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"),
        size(col("ps")).cast("long").as("n_feats"),
        (aggregate(col("ps"), lit(0d), (acc, x) => acc + x.getField("p")) /
          size(col("ps")).cast("double")).as("imp_ratio"))
      .withColumn("selected", (col("imp_ratio") >= 1d).cast("int"))
  }

  /** The resampling half of DSIR, deterministically: SYSTEMATIC sampling
    * over integer weights — lay every document's weight on a number line
    * in doc-id order and select one representative at every `step =
    * total/k` marks, so a document is drawn n_select = ⌊cum/step⌋ −
    * ⌊(cum−w)/step⌋ times (heavy docs can be drawn repeatedly — that IS
    * proportional-to-weight sampling, with zero RNG).
    *
    * Scale shape: the global prefix sum is two passes, never one global
    * window — in-bucket running sums (floor(id / `bucketSpan`) buckets
    * are CONTIGUOUS id ranges, so bucket order ≡ id order) plus a
    * broadcast of the per-bucket exclusive offsets. All arithmetic is
    * 64-bit integer, so the two-pass sum is bit-equal to the oracle's
    * flat window cumsum regardless of association order — and therefore
    * regardless of `bucketSpan` (DsirSpec pins span-invariance), which
    * frees the span to be an efficiency knob only.
    *
    * `bucketSpan = 0` (the default) AUTO-SCALES: one bounded min/max
    * action derives a span keeping the offsets table ≤
    * [[DsirMaxOffsetRows]] rows, so the offsets stay broadcast-sized at
    * ANY corpus size (a fixed span of 1024 stops being broadcastable
    * around 10¹⁰ docs — round-7 VERDICT note #3). An explicit span is
    * honored but `require`d to that same bound, documenting the limit.
    * Bucketing uses floor semantics built from the RESOLVED id column
    * (`(id - pmod(id, span)) div span` — exact integer division since
    * pmod is non-negative), not `DIV`'s truncate-toward-zero, so
    * negative ids keep bucket order ≡ id order (e.g. −5 and +5 no
    * longer share bucket 0). */
  def systematicResample(
      scored: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      bucketSpan: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val id = col(idCol)
    val w = col(weightCol)
    val base = scored.select(id.cast("long").as("doc_id"), w.as("w"))
    // ONE bounded 1-row action (the centroid-fetch discipline) feeds both
    // the auto-derivation and the explicit-span bound check — the id
    // range alone sizes the span; ids need not be dense
    val span = {
      val r = base.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx")).head()
      val width = if (r.isNullAt(0)) 1L
        else math.subtractExact(r.getLong(1), r.getLong(0)) + 1L
      if (bucketSpan > 0) {
        require((width + bucketSpan - 1L) / bucketSpan <= DsirMaxOffsetRows,
          s"bucketSpan=$bucketSpan yields more than $DsirMaxOffsetRows offset rows " +
            "over this id range - the offsets table would no longer be " +
            "broadcast-sized; pass bucketSpan=0 to auto-scale")
        bucketSpan
      } else math.max(1L, (width + DsirMaxOffsetRows - 1L) / DsirMaxOffsetRows)
    }
    // floor-division bucketing from the resolved column: pmod >= 0 makes
    // (doc_id - pmod) exactly divisible, so DIV's truncation is moot
    val bucketed = base
      .withColumn("pm", pmod(col("doc_id"), lit(span)))
      .withColumn("bucket", expr(s"(doc_id - pm) DIV ${span}L"))
      .drop("pm")
    val within = W.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val withCumIn = bucketed.withColumn("cum_in", sum(col("w")).over(within))
    // tiny: one row per bucket; exclusive running offset over bucket order
    val offsets = bucketed.groupBy(col("bucket")).agg(sum(col("w")).as("bw"))
      .withColumn("offset",
        coalesce(sum(col("bw")).over(
          W.orderBy(col("bucket")).rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    val total = bucketed.agg(sum(col("w")).as("total"))
    withCumIn
      .join(broadcast(offsets), "bucket")
      .crossJoin(broadcast(total))
      .withColumn("cum", col("offset") + col("cum_in"))
      .withColumn("step", greatest(lit(1L), expr(s"total DIV $k")))
      // integer floor-division throughout (weights are non-negative), so
      // selection counts are exact on both engines
      .selectExpr("doc_id", "w",
        "CAST(cum DIV step - (cum - w) DIV step AS BIGINT) AS n_select")
      .withColumn("selected", (col("n_select") > 0).cast("int"))
  }
}
