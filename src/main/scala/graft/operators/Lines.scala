package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level deduplication — the CCNet boilerplate pass (Wenzek et al.
  * 2020, public): a line that recurs across many documents is template
  * furniture (navigation, cookie banners, "read more" tails), not
  * content; dropping recurring LINES removes boilerplate surgically where
  * document-level dedup would either keep it or drop whole pages.
  *
  * Scale shape: one line-keyed count aggregation (map-side partial — the
  * dominant boilerplate lines collapse to one row per partition before
  * the exchange), one join of the positioned line stream against the
  * boilerplate verdict, one doc-keyed re-assembly whose state is bounded
  * by document length (position-sorted fold, the LangModel discipline).
  * The verdict join is keyed by the line's 128-bit fingerprint (the
  * `exactCanonicalHashed` pattern) with NO forced broadcast hint: a web
  * corpus's "lines recurring in ≥ minDocs documents" set is itself
  * corpus-sized (billions of rows), so the join must degrade to a
  * shuffle when AQE measures it large — a hint would OOM executors or
  * abort past the broadcast limit instead. The exchange carries 16-byte
  * keys, never full line text. The DuckDB oracle joins on the line
  * string — equivalent because the 128-bit key makes a colliding pair
  * of distinct lines a < 10⁻¹⁸ event (see `Dedup.exactCanonicalHashed`).
  */
object Lines {

  private def positioned(docs: DataFrame, idCol: String, textCol: Column): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(split(textCol, "\n")).as(Seq("pos", "line")))

  /** The boilerplate line set of a corpus: non-empty lines recurring in ≥
    * `minDocs` DISTINCT documents. Corpus-sized at web scale — feed it to
    * [[dropAgainst]] (batch backfill or per micro-batch in a stream),
    * which joins it by fingerprint and lets AQE pick broadcast vs
    * shuffle from its measured size. */
  def boilerplate(
      docs: DataFrame, idCol: String, textCol: Column, minDocs: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    positioned(docs, idCol, textCol)
      .groupBy(col("line"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs && col("line") =!= "")
      .select(col("line"), lit(1).as("is_boiler"))
  }

  /** Per-document line dedup report over an already-line-structured text
    * column: total lines, lines dropped as boilerplate (recurring in ≥
    * `minDocs` DISTINCT documents), and the surviving text re-assembled
    * in line order (pinned by length + FNV fingerprint). Empty lines are
    * kept verbatim — structure, not boilerplate. */
  def dedupLines(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      minDocs: Int): DataFrame =
    dropAgainst(docs, idCol, textCol,
      boilerplate(docs, idCol, textCol, minDocs))

  /** Drop an ALREADY-BUILT boilerplate set from every document — per-doc
    * decisions against a static set, so a stream applying this per
    * micro-batch equals the batch backfill at any batching (the
    * static-band-index discipline). The join is keyed by the line's
    * 128-bit fingerprint, unforced: AQE broadcasts a genuinely small set
    * and shuffles a corpus-sized one, and either way the exchange carries
    * 16-byte keys instead of line text. */
  def dropAgainst(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      boiler: DataFrame): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val verdict = boiler.select(
      GraftFunctions.fingerprint128(col("line")).as("line_fp"),
      col("is_boiler"))
    positioned(docs, idCol, textCol)
      .withColumn("line_fp", GraftFunctions.fingerprint128(col("line")))
      .join(verdict, Seq("line_fp"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler") === 1, 1L).otherwise(0L)).as("n_dropped"),
        sort_array(collect_list(
          when(col("is_boiler").isNull, struct(col("pos"), col("line")))))
          .as("kept"))
      .select(col("doc_id"), col("n_lines"), col("n_dropped"),
        array_join(transform(col("kept"), k => k.getField("line")), "\n")
          .as("kept_text"))
      .select(col("doc_id"), col("n_lines"), col("n_dropped"),
        length(col("kept_text")).cast("long").as("kept_len"),
        GraftFunctions.fingerprint64(col("kept_text")).as("kept_fp"))
  }
}
