package graft.plans

import graft.core.Checkpoint.Ops
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The orchestrated incremental day — ONE composition of the standing-
  * artifact maintenance operators, end to end, the way a production
  * ingest service runs them nightly:
  *
  *   new-day batch
  *     → bloom-routed exact dedup vs the standing corpus
  *       ([[graft.operators.Dedup.bloomDedupAgainstCorpus]])
  *     → curation under FROZEN day-0 artifacts (the stateless quality
  *       tier + the batch-trained probe weights — the exact transforms
  *       the streaming deployment runs,
  *       [[graft.streaming.EventPipeline.curationFilterStream]] /
  *       `probeScoreStream`)
  *     → split-partitioned DELTA export of the curated day
  *     → idempotent ANN index append of the curated day's vectors
  *       ([[graft.operators.Similarity.appendBatchToIvfIndex]]),
  *       committed-replay refused in the same run.
  *
  * Every fact in the returned report is recomputed from the WRITTEN
  * artifacts (delta files read back; the day's index rows read from
  * their batch-tagged files), so the gate verifies the on-disk state,
  * not the in-memory plan. An UNCHANGED day (every document's content
  * already in the corpus) writes ZERO delta part files and ZERO index
  * data files — the zero-work invariant IncrementalDaySpec pins.
  *
  * 100 TB shape: each stage keeps its own proven posture — scan-local
  * bloom probe + residual anti-join on 16-byte keys, one stateless
  * scoring projection, one split-partitioned write of only the day's
  * survivors, one partition-local index append touching only the day's
  * assigned cells. Nothing reprocesses the standing corpus beyond the
  * fingerprint store and frozen artifacts it already maintains.
  */
object IncrementalDay {

  /** Run one day's ingest; see the object doc. `splitRule` is the shared
    * content-stable split expression
    * ([[graft.queries.LlmOps.splitColumnFor]]); `embeddings` maps
    * vec_id ≡ doc_id. Returns the per-(split, lang) manifest of the
    * written delta with the day's index-row/cell facts alongside. */
  def ingestDay(
      s: SparkSession,
      incoming: DataFrame,
      standing: DataFrame,
      probeWeights: Seq[Double],
      probeMargin: Double,
      splitRule: Column => Column,
      embeddings: DataFrame,
      indexPath: String,
      centroids: Seq[(Int, Seq[Float])],
      deltaPath: String,
      dayTag: String,
      bloomBits: Int = 1 << 23,
      bloomProbes: Int = 5): DataFrame = {
    import graft.operators.{Dedup, Similarity}
    GraftFunctions.register(s)
    val (curated0, batch) = curatedDay(
      s, incoming,
      b => Dedup.bloomDedupAgainstCorpus(b, standing, "text", bloomBits, bloomProbes),
      probeWeights, probeMargin)
    // persisted: the delta write and the index append both consume it,
    // and recomputing would re-run the bloom + anti-join + scoring
    val curated = curated0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dayVecs = embeddings
        .join(curated.select(col("doc_id").as("vec_id")), "vec_id")

      // 3. replay guard — BEFORE the delta overwrite. A dayTag already
      // committed to the index is only safe to re-run when the indexed
      // day matches the incoming day (the crash-recovery replay: driver
      // died after the index commit, orchestrator retries). A replay
      // with DIFFERENT data must refuse the whole day HERE — letting it
      // proceed would overwrite the delta export while the index kept
      // the old day's vectors, silently drifting the two artifacts.
      // Compared by cheap order-independent fingerprint (row count +
      // id sum over the day's index files).
      val marker = new org.apache.hadoop.fs.Path(
        indexPath, s"_graft_ingest_$dayTag.committed")
      val alreadyCommitted = marker
        .getFileSystem(s.sparkContext.hadoopConfiguration).exists(marker)
      if (alreadyCommitted) {
        val indexed = dayIndexFingerprint(s, indexPath, dayTag)
        val incoming = dayVecs
          .agg(count(lit(1)).cast("long").as("n"),
            coalesce(sum(col("vec_id")), lit(0L)).cast("long").as("idsum"))
          .head()
        if (indexed != ((incoming.getLong(0), incoming.getLong(1))))
          throw graft.core.GraftAnalysisException(Seq(
            s"day $dayTag is already committed to the index with different " +
              s"data (indexed rows/idsum $indexed vs incoming " +
              s"(${incoming.getLong(0)},${incoming.getLong(1)})) — refusing " +
              "to overwrite the delta export against a drifted index"))
      }

      // 4. split-partitioned delta export of the curated day
      graft.core.Distribute.forWrite(
          curated
            .join(batch.select(col("doc_id"), col("text")), "doc_id")
            .withColumn("split", splitRule(col("doc_id")))
            .select(col("doc_id"), col("lang"), col("n_tokens"),
              col("quality"), col("text"), col("split")),
          "split", scope = "export", scopeDefault = "rebalance")
        .write.mode("overwrite").partitionBy("split").parquet(deltaPath)

      // 5. idempotent ANN append of the curated day's vectors. A FALSE
      // return means the day's marker already exists — the verified
      // replay above; the delta write is overwrite-idempotent and the
      // report below reads written artifacts, so the rerun completes
      // the day instead of poisoning every retry. The in-run proof of
      // the refusal contract is the SECOND call, which must always
      // come back false.
      Similarity.appendBatchToIvfIndex(
        dayVecs, "vec_id", "embedding", indexPath, centroids, dayTag): Unit
      require(!Similarity.appendBatchToIvfIndex(
        dayVecs, "vec_id", "embedding", indexPath, centroids, dayTag),
        s"replay of committed day $dayTag must be refused")

      // 6. report — every fact from the WRITTEN artifacts
      val deltaBack = s.read.schema(
          "doc_id long, lang string, n_tokens long, quality double, " +
            "text string, split string")
        .parquet(deltaPath)
      val idxFacts = dayIndexFacts(s, indexPath, dayTag)
      deltaBack.groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .crossJoin(broadcast(idxFacts))
        .graftCheckpoint()
    } finally { curated.unpersist(blocking = false); () }
  }

  /** The day pipeline's CURATION front half, shared by [[ingestDay]] and
    * [[ingestDayVersioned]]: in-batch doc_id dedup → `admit` (the
    * corpus-dedup step — a fresh bloom build for the one-shot day, the
    * PREBUILT standing artifact for the multi-day store) → the
    * frozen-artifact quality + probe tiers. Returns (curated admissions
    * `(doc_id, lang, n_tokens, quality)`, the deduped batch — the text
    * source for the delta projection). Nothing is persisted here; each
    * caller owns caching for its own consumption pattern. */
  private def curatedDay(
      s: SparkSession,
      incoming: DataFrame,
      admit: DataFrame => DataFrame,
      probeWeights: Seq[Double],
      probeMargin: Double): (DataFrame, DataFrame) = {
    import graft.streaming.EventPipeline

    // 0. one row per doc_id: a re-sent document inside ONE batch would
    // otherwise fan out multiplicatively through the doc_id joins below
    // (2 quality rows × 2 probe rows × 2 text rows = 8 delta rows and a
    // duplicated index vector) — the dedup tier is text-vs-CORPUS and
    // never sees the in-batch twin. Keep is deterministic on any
    // partitioning (ordered by the payload columns, first row wins).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(incoming.columns.filter(_ != "doc_id").map(col).toIndexedSeq: _*)
    val batch = incoming
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    // 1. ingest dedup: definitely-new rows bypass the anti-join via the
    // corpus bloom; the residual join decides the sliver
    val admitted = admit(batch)

    // 2. curation under frozen artifacts — the same stateless transforms
    // the streaming deployment binds, so day-batch and live-stream
    // admission can never disagree
    val quality = EventPipeline.curationFilterStream(admitted)
    val probeOk = EventPipeline
      .probeScoreStream(admitted, probeWeights, probeMargin)
      .select(col("doc_id"))
    (quality.join(probeOk, "doc_id"), batch)
  }

  /** The snapshot-store-backed day lifecycle: day N commits as VERSION
    * N+1 of a [[Snapshots]] store (v1 = the empty day-0 store), so any
    * prior day is a `readAt` away — the reproducibility [[ingestDay]]'s
    * in-place delta export cannot give — and replay protection comes
    * from the store's durable TAGGED-commit ledger instead of
    * hand-rolled marker files (each day commits with `tag = dayTag`; the
    * gate REDELIVERS every day's commit and requires the ledger to
    * answer with the already-committed version). Removals are
    * split-keyed (empty here), so each day's commit IO is bounded by the
    * splits the day lands in. Returns the per-version `(version, split,
    * lang, n_docs, total_tokens)` manifests, every row computed by
    * `readAt` AFTER all commits landed — version k's manifest still
    * aggregating to day ≤ k's content is the time-travel proof.
    * `indexRoot` maintains a standing [[DocIndex]] beside the corpus:
    * materialized on day 1, CDC-refreshed after every day's commit, and
    * REQUIRED to end at the corpus head — doc_id-only takedowns
    * ([[DocIndex.removeByIds]]) stay index-speed for free. */
  def ingestDayVersioned(
      s: SparkSession,
      standing: DataFrame,
      days: Seq[(String, DataFrame)],
      probeWeights: Seq[Double],
      probeMargin: Double,
      splitRule: Column => Column,
      root: String,
      bloomBits: Int = 1 << 23,
      bloomProbes: Int = 5,
      indexRoot: Option[String] = None): DataFrame = {
    import graft.operators.Dedup
    require(days.nonEmpty, "ingestDayVersioned needs at least one day")
    GraftFunctions.register(s)
    val deltaSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, lang STRING, n_tokens BIGINT, quality DOUBLE, " +
        "text STRING, split STRING")
    val v1 = Snapshots.commitFull(s,
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        deltaSchema), root)

    // the standing dedup artifact (fingerprint store + bloom) is built
    // ONCE and reused for every day — the deployed service's shape: the
    // snapshot artifact is a batch product maintained beside the corpus,
    // not rebuilt per day
    val corpusFp = standing
      .withColumn("dedup_fp", GraftFunctions.fingerprint128(
        GraftFunctions.canonicalKey(col("text"))))
      .select(col("dedup_fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val committed =
      try {
        val bloom = Dedup.bloomOfCorpus(
          corpusFp.select(col("dedup_fp.f1").as("f1")), "f1",
          bloomBits, bloomProbes)
        days.map { case (dayTag, incoming) =>
          val (curated, batch) = curatedDay(
            s, incoming,
            b => Dedup.bloomDedupAgainstFingerprints(
              b, corpusFp, "text", bloom, bloomProbes),
            probeWeights, probeMargin)
          val delta = curated
            .join(batch.select(col("doc_id"), col("text")), "doc_id")
            .withColumn("split", splitRule(col("doc_id")))
            .select(deltaSchema.fieldNames.map(col).toIndexedSeq: _*)
          val none = delta.select(col("split"), col("doc_id")).limit(0)
          val v = Snapshots.commitDelta(s, root, delta, none, tag = Some(dayTag))
          // the at-least-once replay the tagged ledger exists for: the same
          // day redelivered must come back as ITS version, not a duplicate
          require(Snapshots.commitDelta(s, root, delta, none, tag = Some(dayTag)) == v,
            s"redelivered day $dayTag must return its committed version")
          // the standing doc_id → split index rides the day lifecycle:
          // CDC-refreshed per commit, so a takedown pipeline is always
          // index-speed without an operator remembering to refresh
          indexRoot.foreach(ir => DocIndex.sync(s, root, ir): Unit)
          v
        }
      } finally { corpusFp.unpersist(blocking = false); () }
    require(Snapshots.latestVersion(s, root) == v1 + days.length,
      "one version per day: redeliveries must not lengthen the chain")
    indexRoot.foreach { ir =>
      require(DocIndex.indexedVersion(s, ir) == Snapshots.latestVersion(s, root),
        "the standing index must end the lifecycle at the corpus head")
    }

    committed.map { v =>
      Snapshots.readAt(s, root, v)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .select(lit(s"v$v").as("version"), col("split"), col("lang"),
          col("n_docs"), col("total_tokens"))
    }.reduce(_ unionAll _).graftCheckpoint()
  }

  /** (rows, sum(vec_id)) over the day's batch-tagged index files — the
    * cheap order-independent fingerprint the replay guard compares
    * against the incoming batch. Empty day → (0, 0). */
  private def dayIndexFingerprint(
      s: SparkSession, indexPath: String, dayTag: String): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(indexPath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(
      new Path(s"$indexPath/cell=*/ingest-$dayTag-*.parquet")))
      .getOrElse(Array.empty)
    if (matches.isEmpty) (0L, 0L)
    else {
      val row = s.read.option("basePath", indexPath)
        .parquet(matches.map(_.getPath.toString).toIndexedSeq: _*)
        .agg(count(lit(1)).cast("long").as("n"),
          coalesce(sum(col("vec_id")), lit(0L)).cast("long").as("idsum"))
        .head()
      (row.getLong(0), row.getLong(1))
    }
  }

  /** (day_index_rows, day_index_cells) read back from the day's
    * batch-tagged index files — 1 row. An empty day has no such files
    * (globStatus, not a throwing read), reporting (0, 0). */
  private def dayIndexFacts(
      s: SparkSession, indexPath: String, dayTag: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(indexPath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(
      new Path(s"$indexPath/cell=*/ingest-$dayTag-*.parquet")))
      .getOrElse(Array.empty)
    if (matches.isEmpty)
      s.range(1).select(lit(0L).as("day_index_rows"), lit(0L).as("day_index_cells"))
    else
      s.read.option("basePath", indexPath)
        .parquet(matches.map(_.getPath.toString).toIndexedSeq: _*)
        .agg(count(lit(1)).as("day_index_rows"),
          count_distinct(col("cell")).as("day_index_cells"))
  }
}
