package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 top-k retrieval over the corpus — the keyword-search tier
  * next to [[TfIdf]] (which ranks a document's own terms; BM25 ranks
  * documents against a query). Public formula: Robertson et al., TREC-3;
  * the +1-inside-the-log idf variant is the Lucene/standard non-negative
  * form.
  *
  * 100 TB shape: the query-term filter runs BEFORE the explode, so the
  * only per-document shuffle rows are actual term hits (corpus scans with
  * zero hits contribute nothing); per-document term frequencies are ONE
  * doc-keyed aggregation with conditional sums (no (doc, term) pre-shuffle);
  * corpus stats (N, Σdl) and per-term document frequencies are two 1-row
  * aggregates broadcast back into the scoring projection; the final top-k
  * is TakeOrderedAndProject (no global sort). Score arithmetic folds the
  * per-term contributions in FIXED term order, so the double result is
  * reproducible across partitionings and engines.
  */
object Bm25 {

  /** Top-k documents for a bag-of-words query. Output: rank, doc id, dl,
    * and the per-term tf columns (`tf_<term>`) — the integer evidence for
    * the ranking; the BM25 score itself orders but is not emitted (its idf
    * log is the one non-rational term, and ranking is what the operator
    * promises — same posture as [[TfIdf.topTerms]]). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      s"terms must be non-empty and distinct: $terms")
    val toks = GraftFunctions.tokens(col(textCol))

    // 1-row corpus stats; avgdl stays an exact-integer ratio until the one
    // double division, so no aggregation-order variance can reach the score
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("total_dl"))

    // hit rows only — the isin filter runs inside the scan projection,
    // BEFORE the explode, so non-matching tokens never become rows
    val hits = docs.select(
      col(idCol).as("doc_id"),
      size(toks).cast("long").as("dl"),
      explode(filter(toks, t => t.isInCollection(terms))).as("term"))

    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$i")
    }
    val perDoc = hits.groupBy(col("doc_id"))
      .agg(min(col("dl")).as("dl"), tfCols: _*)

    val dfCols = terms.indices.map { i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")
    }
    val dfAgg = perDoc.agg(dfCols.head, dfCols.tail: _*)

    val nd = col("n_docs").cast("double")
    val avgdl = col("total_dl").cast("double") / nd
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val dfc = col(s"df_$i").cast("double")
      val idf = log(lit(1d) + (nd - dfc + lit(0.5)) / (dfc + lit(0.5)))
      idf * (tf * (lit(k1) + lit(1d))) /
        (tf + lit(k1) * ((lit(1d) - lit(b)) + lit(b) * col("dl").cast("double") / avgdl))
    }
    // fixed fold order over terms — bit-reproducible double sum
    val score = terms.indices.map(contrib).reduce(_ + _)

    val top = perDoc
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfAgg))
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    // rank materializes the order for sorted-row comparison; the window
    // runs over at most k already-selected rows
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("rank") +: col("doc_id") +: col("dl") +:
        terms.zipWithIndex.map { case (t, i) => col(s"tf_$i").as(s"tf_$t") }: _*)
  }
}
