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
      n: Int): DataFrame =
    overlapAgainstFingerprints(train,
      evalFingerprints(eval, idCol, textCol, n), idCol, textCol, n)

  /** The eval suite reduced to its distinct n-gram fingerprint set — the
    * MATERIALIZABLE artifact of the protocol (one `gfp` long per distinct
    * gram): a production pipeline computes it once per eval-suite release,
    * persists it, and every decontamination pass (batch backfill or
    * per-micro-batch ingest filter) broadcasts the stored set instead of
    * re-shingling the eval corpus. */
  def evalFingerprints(
      eval: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    GraftFunctions.register(eval.sparkSession)
    eval
      .select(col(idCol),
        explode(array_distinct(GraftFunctions.wordShingles(col(textCol), n))).as("g"))
      .select(GraftFunctions.fingerprint64(col("g")).as("gfp"))
      .distinct()
  }

  /** [[overlapNgrams]] against an ALREADY-REDUCED eval fingerprint set
    * ([[evalFingerprints]] output, or its persisted form read back).
    * Verdicts are per-document against the static set, so a stream
    * applying this per micro-batch equals the batch backfill at any
    * batching — the static-artifact discipline the band-index and
    * boilerplate streaming tiers follow. */
  def overlapAgainstFingerprints(
      train: DataFrame,
      evalFps: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    GraftFunctions.register(train.sparkSession)
    // no defensive distinct here: [[evalFingerprints]] already emits a
    // distinct set, and a per-call distinct would re-shuffle the whole
    // static artifact inside EVERY micro-batch of the streaming tier.
    // A caller-supplied set with duplicates costs only join fan-out —
    // the per-doc count below is COUNT(DISTINCT gfp), so the verdict is
    // unchanged either way.
    val hits = evalFps.select(col("gfp")).withColumn("hit", lit(1))
    train
      .select(col(idCol),
        explode(array_distinct(GraftFunctions.wordShingles(col(textCol), n))).as("g"))
      .select(col(idCol), GraftFunctions.fingerprint64(col("g")).as("gfp"))
      .join(broadcast(hits), Seq("gfp"), "left")
      .groupBy(col(idCol))
      .agg(count_distinct(when(col("hit") === 1, col("gfp"))).as("n_overlap"))
      .withColumn("contaminated", (col("n_overlap") > 0).cast("int"))
  }

  /** Contamination SPAN localization — the surgical tier of the n-gram
    * protocol: instead of dropping every contaminated document on
    * [[overlapNgrams]]'s verdict, emit the exact token extents where the
    * training text overlaps the eval suite, so curation can excise the
    * leaked passage and keep the rest of the document (the find/cut split
    * of Lee et al. 2022's ExactSubstr applied to decontamination).
    *
    * Scale shape: the eval fingerprint set broadcasts exactly as in
    * [[overlapNgrams]]; the train side pays one posexplode into positioned
    * 8-byte window fingerprints (never text) whose broadcast-join
    * survivors — a tiny fraction of any healthy corpus — feed the per-doc
    * interval-union window ([[Spans.mergeExtents]]). No shuffle carries
    * the corpus. Documents shorter than `n` tokens contribute their whole
    * text as one degenerate gram (nothing silently exempt), with the span
    * end clamped to the real token count.
    *
    * Output: (doc_id, span_start, span_end, span_tokens) — token
    * positions 0-based inclusive; overlapping/adjacent matched windows
    * merge into maximal extents. */
  def contaminationSpans(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    GraftFunctions.register(train.sparkSession)
    val evalFps = eval
      .select(explode(array_distinct(
        GraftFunctions.wordShingles(col(textCol), n))).as("g"))
      .select(GraftFunctions.fingerprint64(col("g")).as("gfp"))
      .distinct()
    val positioned = train
      .select(col(idCol).as("doc_id"),
        (size(GraftFunctions.tokens(col(textCol))) - 1).as("last_tok"),
        posexplode(GraftFunctions.wordShingles(col(textCol), n)).as(Seq("p", "g")))
      .select(col("doc_id"), col("p"), col("last_tok"),
        GraftFunctions.fingerprint64(col("g")).as("gfp"))
    val matched = positioned.join(broadcast(evalFps), "gfp")
      .select(col("doc_id"), col("p"),
        least(col("p") + n - 1, col("last_tok")).as("e"))
    Spans.mergeExtents(matched)
      .select(col("doc_id"),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long").as("span_tokens"))
  }

  /** The CUT composed with the find: training docs with every
    * eval-overlap extent ([[contaminationSpans]]) excised — the deployed
    * decontamination that keeps the document and removes the leak.
    * One row per train doc: token counts before/removed plus the cleaned
    * text pinned by length + fingerprint ([[Spans.stripExtents]], the
    * same cut the repeated-span tier runs). */
  def stripContamination(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    Spans.stripExtents(train, idCol, textCol,
      contaminationSpans(train, eval, idCol, textCol, n))

  /** FUZZY decontamination: flag training documents NEAR-duplicating any
    * eval document (MinHash-banded candidates, exact-Jaccard verified at
    * `threshold`) — the protocol for eval leakage that survived paraphrase
    * or light editing, where the exact-n-gram test of [[overlapNgrams]]
    * goes blind. Thresholds here run well below dedup's (0.5 vs 0.8):
    * sharing half the shingle mass with a benchmark item is leakage.
    *
    * Scale shape: the eval suite is MBs against a 100 TB corpus, so BOTH
    * eval artifacts — its banded index and its shingle sets — ride
    * broadcasts; the corpus side is one fused signature projection joined
    * band-to-band against the broadcast index, and the per-doc report
    * joins back into the corpus as another broadcast (matched docs only).
    * No shuffle ever carries the training corpus.
    *
    * One row per `train` document: distinct eval matches at or above
    * `threshold`, the best-matching eval doc (highest Jaccard, ties to the
    * smallest eval id), and the contaminated verdict. */
  def fuzzyOverlap(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 48,
      bands: Int = 16,
      threshold: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(train.sparkSession)
    def shingleSets(df: DataFrame, as: String): DataFrame = df.select(
      col(idCol).as(as),
      array_distinct(GraftFunctions.wordShingles(col(textCol), shingleK)).as(s"sh_$as"))

    val evalIdx = Dedup.bandedIndex(eval, idCol, textCol, shingleK, numHashes, bands, seed)
      .select(col("doc_id").as("eval_id"), col("band"), col("bucket"))
    val cand = Dedup.bandedIndex(train, idCol, textCol, shingleK, numHashes, bands, seed)
      .join(broadcast(evalIdx), Seq("band", "bucket"))
      .select(col("doc_id"), col("eval_id")).distinct()

    val inter = size(array_intersect(col("sh_doc_id"), col("sh_eval_id"))).cast("double")
    val union = (size(col("sh_doc_id")) + size(col("sh_eval_id"))).cast("double") - inter
    val verified = cand
      .join(shingleSets(train, "doc_id"), "doc_id")
      .join(broadcast(shingleSets(eval, "eval_id")), "eval_id")
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)

    // best match = lexicographic max of (jaccard, -eval_id): highest
    // similarity, ties to the smallest eval id — replicated verbatim by
    // the oracle's struct_pack MAX
    val report = verified.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_matches"),
      max(struct(col("jaccard").as("j"), (-col("eval_id")).as("ne"))).as("best"))
    train.select(col(idCol).as("doc_id"))
      .join(broadcast(report), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        (-col("best.ne")).as("best_eval_id"),
        col("best.j").as("best_jaccard"),
        col("n_matches").isNotNull.cast("int").as("contaminated"))
  }
}
