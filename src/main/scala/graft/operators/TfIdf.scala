package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF scoring and hashed feature vectors — the text-representation tier
  * of the training-data pipeline (SURVEY §2.3): corpus statistics feed both
  * keyword extraction and the vector ops (the hashed vectors plug directly
  * into [[Similarity]]'s cosine/LSH/IVF operators).
  *
  * Shapes: document frequencies are one token-keyed aggregation (bounded by
  * vocabulary size, not corpus size); scoring joins the DF table back on
  * token — both shuffles are vocabulary-sized. Vectorization is
  * partition-local (mapPartitions, fixed-width output).
  */
object TfIdf {

  /** Document frequency per token + smoothed idf = ln((N+1)/(df+1)) + 1. */
  def idfTable(docs: DataFrame, textCol: String): DataFrame = {
    val n = docs.count() // corpus size: one scalar, computed once
    docs
      .select(explode(array_distinct(GraftFunctions.tokens(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf",
        log((lit(n.toDouble) + 1d) / (col("df").cast("double") + 1d)) + 1d)
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
      .select(col("doc_id"), col("rank"), col("token"), col("tfidf"))
  }

  final case class DocVector(doc_id: Long, vector: Array[Float])
  /** public: Catalyst's generated deserializer must construct it */
  final case class DocTokens(doc_id: Long, tokens: Seq[String])

  /** Feature-hashed tf vector (the "hashing trick"): token → FNV bucket in
    * [0, dim), accumulate counts, L2-normalize. Partition-local, no
    * vocabulary broadcast — the property that matters when the vocabulary
    * itself no longer fits anywhere at corpus scale. Output plugs into
    * [[Similarity.bruteForceTopK]] / [[Dedup.embeddingNearDupPairs]]. */
  def hashedVectors(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, dim: Int = 64): Dataset[DocVector] = {
    import spark.implicits._
    docs
      .select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("tokens"))
      .as[DocTokens]
      .mapPartitions { rows =>
        rows.map { r =>
          val v = new Array[Float](dim)
          r.tokens.foreach { t =>
            val b = ((graft.functions.TextHash.fnv1a64(
              t.getBytes("UTF-8")) % dim).toInt + dim) % dim
            v(b) += 1f
          }
          var norm = 0.0
          var i = 0
          while (i < dim) { norm += v(i).toDouble * v(i).toDouble; i += 1 }
          val s = math.sqrt(norm)
          if (s > 0) { i = 0; while (i < dim) { v(i) = (v(i) / s).toFloat; i += 1 } }
          DocVector(r.doc_id, v)
        }
      }
  }
}
