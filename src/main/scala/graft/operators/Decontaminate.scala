package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with an evaluation corpus, so eval answers never leak into the
  * training set (the standard n-gram-overlap protocol published with GPT-3,
  * PaLM, and Llama — typically 8–13-gram on real text).
  *
  * Scale shape: eval suites are MBs against a 100 TB corpus, so the eval
  * side collapses to a distinct set of 8-byte n-gram fingerprints and rides
  * a BROADCAST into the scan of the training side — no shuffle touches the
  * corpus until the final per-doc count, which partial-aggregates map-side.
  * Joining on [[GraftFunctions.fingerprint64]] rather than the n-gram string
  * keeps the broadcast and the hash probes fixed-width; an FNV collision
  * (P ≈ n_train·n_eval / 2⁶⁴) can only over-flag a doc, never clear one.
  */
object Decontaminate {

  /** Per-document overlap counts: one row per `train` document with the
    * number of distinct n-gram fingerprints it shares with `eval`, and the
    * contaminated verdict. Documents shorter than `n` tokens contribute
    * their whole text as a single gram (the [[GraftFunctions.wordShingles]]
    * degenerate case), so nothing is silently exempt. */
  def overlapNgrams(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    GraftFunctions.register(train.sparkSession)
    def gramFps(df: DataFrame): DataFrame = df
      .select(col(idCol),
        explode(array_distinct(GraftFunctions.wordShingles(col(textCol), n))).as("g"))
      .select(col(idCol), GraftFunctions.fingerprint64(col("g")).as("gfp"))

    val evalFps = gramFps(eval).select(col("gfp")).distinct()
      .withColumn("hit", lit(1))
    gramFps(train)
      .join(broadcast(evalFps), Seq("gfp"), "left")
      .groupBy(col(idCol))
      .agg(count_distinct(when(col("hit") === 1, col("gfp"))).as("n_overlap"))
      .withColumn("contaminated", (col("n_overlap") > 0).cast("int"))
  }
}
