package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the dataset-iteration tool: given two
  * versions of a corpus, classify every document id as added / removed /
  * modified / unchanged by CONTENT fingerprint (raw-text 128-bit FNV, two
  * independent streams), so a curation team can audit exactly what a
  * re-crawl, a new filter, or an upstream fix changed before retraining.
  *
  * 100 TB shape: each side reduces to (id, 16-byte fingerprint) in its
  * scan projection — the one shuffle is the id-keyed full-outer join of
  * those narrow rows; document payloads never move. Runs incrementally
  * against a persisted fingerprint manifest the same way
  * [[Dedup.dedupAgainstCorpus]] does. */
object Versioning {

  def diff(
      oldCorpus: DataFrame, newCorpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(oldCorpus.sparkSession)
    GraftFunctions.register(newCorpus.sparkSession)
    def fps(df: DataFrame, side: String): DataFrame = df.select(
      col(idCol).as(s"${side}_id"),
      GraftFunctions.fingerprint128(col(textCol)).as(s"${side}_fp"))
    fps(oldCorpus, "o")
      .join(fps(newCorpus, "n"), col("o_id") === col("n_id"), "full_outer")
      .select(
        coalesce(col("o_id"), col("n_id")).as("doc_id"),
        when(col("n_id").isNull, "removed")
          .when(col("o_id").isNull, "added")
          .when(col("o_fp") === col("n_fp"), "unchanged")
          .otherwise("modified").as("status"))
  }
}
