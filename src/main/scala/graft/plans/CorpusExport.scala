package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The terminal step of the curation pipeline: MATERIALIZE the training
  * corpus. Curated survivors join back to their text, get stamped with the
  * deterministic content-stable split, and are written partitioned by
  * split — so a trainer reads `split=train` with partition pruning and the
  * held-out slices can never leak in by path construction. The manifest
  * (per (split, lang): docs + token totals) is written next to the corpus
  * from the SAME cached materialization ([[Channels.multiSink]]) — one
  * compute of the full pipeline, not one per output.
  *
  * 100 TB shape: the export is one declarative plan ending in a
  * partitioned write; the manifest is a tiny aggregate over the cached
  * intermediate. Nothing is collected.
  */
object CorpusExport {

  /** Recursive delete for export temp directories (shared by the gate
    * wrapper and specs — `deleteOnExit` cannot remove non-empty dirs). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Write corpus + manifest under `outPath`, then return the manifest
    * recomputed FROM THE WRITTEN CORPUS (read-back) — callers (and the
    * driver gate) therefore verify the on-disk artifact end to end, not
    * the in-memory plan that produced it. */
  def writeCurated(s: SparkSession, dir: String, outPath: String): DataFrame = {
    val curated = graft.queries.LlmOps.curationPipeline(s, dir)
    val splits = graft.queries.LlmOps.splitAssignments(s, dir)
      .select(col("doc_id"), col("split"))
    val text = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    val full = curated.join(splits, "doc_id").join(text, "doc_id")

    def manifestOf(df: DataFrame): DataFrame = df
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"))

    Channels.multiSink(full)(Seq[DataFrame => Unit](
      df => df.write.mode("overwrite").partitionBy("split")
        .parquet(s"$outPath/corpus"),
      df => manifestOf(df).coalesce(1)
        .write.mode("overwrite").json(s"$outPath/_manifest")
    ))
    manifestOf(s.read.parquet(s"$outPath/corpus"))
  }
}
