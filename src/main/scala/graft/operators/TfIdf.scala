package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF scoring and hashed feature vectors — the text-representation tier
  * of the training-data pipeline (SURVEY §2.3): corpus statistics feed both
  * keyword extraction and the vector ops (the hashed vectors plug directly
  * into [[Similarity]]'s cosine/LSH/IVF operators).
  *
  * Shapes: document frequencies are one token-keyed aggregation (bounded by
  * vocabulary size, not corpus size); scoring joins the DF table back on
  * token — both shuffles are vocabulary-sized. The corpus size is folded
  * into the plan as a broadcast 1-row aggregate, so the whole computation
  * is a single Spark action (no separate count() pass over the corpus).
  * Vectorization is a fused codegen expression — no object deserialization.
  */
object TfIdf {

  /** Document frequency per token + smoothed idf = ln((N+1)/(df+1)) + 1.
    *
    * N is computed in-plan: a 1-row count aggregate broadcast-joined into
    * the idf projection. At 100 TB a separate `docs.count()` action would
    * be a second full corpus scan charged to every caller; here the count
    * and the token explode share one job (and, under AQE, the broadcast is
    * a single scalar row). */
  def idfTable(docs: DataFrame, textCol: String): DataFrame = {
    val n1 = docs.agg(count(lit(1)).cast("double").as("corpus_n"))
    docs
      .select(explode(array_distinct(GraftFunctions.tokens(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n1))
      .withColumn("idf",
        log((col("corpus_n") + 1d) / (col("df").cast("double") + 1d)) + 1d)
      .drop("corpus_n")
  }

  /** Top-k terms per document by tf·idf (ties broken alphabetically). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(GraftFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf.join(idfTable(docs, textCol), "token")
      .withColumn("tfidf", col("tf").cast("double") * col("idf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"),
        col("tf"), col("df"), col("tfidf"))
  }

  /** Feature-hashed tf vector (the "hashing trick"): token → FNV bucket in
    * [0, dim), accumulate counts, L2-normalize. No vocabulary broadcast —
    * the property that matters when the vocabulary itself no longer fits
    * anywhere at corpus scale. The whole vector is one fused codegen
    * expression ([[graft.functions.HashedTfVector]]), so the projection
    * stays inside whole-stage codegen (the earlier typed-mapPartitions
    * version forced a DeserializeToObject boundary). Output plugs into
    * [[Similarity.bruteForceTopK]] / [[Dedup.embeddingNearDupPairs]]. */
  def hashedVectors(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, dim: Int = 64): DataFrame = {
    GraftFunctions.register(spark)
    docs.select(col(idCol).as("doc_id"),
      GraftFunctions.hashedTfVector(split(col(textCol), " "), dim).as("vector"))
  }
}
