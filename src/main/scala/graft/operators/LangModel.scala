package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model predictability scoring — the CCNet-style
  * corpus-quality tier (Wenzek et al., "CCNet: Extracting high quality
  * monolingual datasets from web crawl data", 2020 — public): train an
  * n-gram LM on a reference corpus, score every document by how predictable
  * its text is under that model, and gate the tail. Degenerate/boilerplate
  * text scores abnormally high, gibberish abnormally low.
  *
  * This implementation is a bigram model with add-one smoothing scored by
  * MEAN CONDITIONAL PROBABILITY rather than log-perplexity: every
  * per-position probability is a ratio of exact integer counts, and the
  * per-document mean folds those ratios in position order — so the score is
  * bit-reproducible across engines (a log-perplexity variant is one
  * `ln` away, but engine libm ulps differ; same posture as the BM25/TF-IDF
  * gates, except here the score itself can be EMITTED exactly).
  *
  * 100 TB shape: the model is two count aggregations (bigram- and
  * unigram-keyed — vocabulary-bounded, map-side partial); scoring is two
  * key-shuffled joins of the positioned bigram stream against those tables
  * and one doc-keyed re-aggregation. Nothing is collected; the vocabulary
  * size rides a broadcast 1-row aggregate. Per-doc state is bounded by
  * document length (the position-sorted fold array), never corpus size.
  */
object LangModel {

  /** Score `docs` under a bigram LM trained on `reference` (pass the same
    * frame to self-score a corpus). Output per document with ≥ 2 tokens:
    * n_bigrams, mean_p = mean over positions of
    * (c(w₋₁w) + 1) / (c(w₋₁) + V), and lm_ok = mean_p ≥ minMeanP. */
  def scoreBigram(
      reference: DataFrame, docs: DataFrame,
      idCol: String, textCol: String,
      minMeanP: Double): DataFrame = {
    val s = docs.sparkSession
    GraftFunctions.register(s)

    val refToks = reference.select(
      explode(GraftFunctions.tokens(col(textCol))).as("token"))
    val uni = refToks.groupBy(col("token")).agg(count(lit(1)).as("c_uni"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = reference
      .select(explode(GraftFunctions.wordShingles(col(textCol), 2)).as("bg"))
      .filter(col("bg").contains(" ")) // single-token docs degrade to [text]
      .groupBy(col("bg")).agg(count(lit(1)).as("c_bi"))

    val positioned = docs
      .filter(size(GraftFunctions.tokens(col(textCol))) >= 2)
      .select(col(idCol).as("doc_id"),
        posexplode(GraftFunctions.wordShingles(col(textCol), 2)))
      .select(col("doc_id"), col("pos"), col("col").as("bg"),
        substring_index(col("col"), " ", 1).as("prev"))

    val contrib = positioned
      .join(bi, Seq("bg"), "left")
      .join(uni.withColumnRenamed("token", "prev"), Seq("prev"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("pos"),
        ((coalesce(col("c_bi"), lit(0L)).cast("double") + lit(1d)) /
          (coalesce(col("c_uni"), lit(0L)).cast("double") + col("v").cast("double")))
          .as("p"))

    // position-sorted sequential fold: the double sum has ONE association
    // order on any partitioning (and in the oracle)
    contrib.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"),
        size(col("ps")).cast("long").as("n_bigrams"),
        (aggregate(col("ps"), lit(0d), (acc, x) => acc + x.getField("p")) /
          size(col("ps")).cast("double")).as("mean_p"))
      .withColumn("lm_ok", col("mean_p") >= minMeanP)
  }
}
