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
      .crossJoin(cr.agg(sum(col("c_r")).as("r")))

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
}
