package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing doc_id → split INDEX for a [[Snapshots]] corpus store — the
  * missing half of takedown discovery: split-keyed removals commit with
  * IO bounded by their splits, but a caller who only knows doc_ids
  * (the GDPR request, the upstream retraction feed) had to pay a
  * corpus-wide semi-join to find where its victims live. This index
  * answers that lookup at (index ∩ ids) cost instead.
  *
  * The index IS ITSELF a snapshot store — of rows
  * `(doc_id, split = bucket, target_split)`, where `bucket` hashes the
  * doc_id into [[Buckets]] partitions — so every property the corpus
  * store already proves carries over for free: a refresh rewrites ONLY
  * the buckets holding changed doc_ids (the store's affected-split
  * contract), updates are replacements, removals are split-keyed,
  * versions give the index its own time travel, and the atomic
  * version-file commit point makes refreshes crash-safe. Maintenance is
  * CDC-driven: [[refresh]] reads `changesBetween(lastIndexed, head)` —
  * pointer-pruned, so a daily delta refreshes the index by what the day
  * touched, never the corpus. Each refresh commit is TAGGED with the
  * corpus version it reflects (`v{N}`) — the durable ledger makes a
  * redelivered refresh idempotent — and the reflected version rides a
  * tiny atomically-replaced meta marker that survives index vacuums.
  *
  * [[Snapshots.commitRemove]] + [[resolveSplits]] compose into
  * [[removeByIds]]: the doc_id-only takedown a 100 TB corpus can
  * actually afford — index lookup, then a split-keyed merge-on-read
  * tombstone commit.
  */
object DocIndex {

  /** Index bucketing width: doc_ids hash into this many index splits,
    * so a refresh touching k doc_ids rewrites ≤ min(k, buckets) index
    * partitions and a lookup prunes to the probed ids' buckets. Session
    * knob `spark.graft.docindex.buckets` (default 64) — size it to the
    * corpus: ~corpus_rows × 16 bytes / buckets should be a comfortable
    * partition (4096 buckets for a 10^10-doc corpus). Fixed at
    * [[materialize]] time for the index's lifetime — the bucket
    * function must stay stable across refreshes, so the chosen width is
    * recorded in the index's own rows (every row's `split` came from
    * it) and [[refresh]] re-reads the session knob; change it only with
    * a fresh materialize. */
  def buckets(s: SparkSession): Int =
    s.conf.getOption("spark.graft.docindex.buckets")
      .map(_.toInt).getOrElse(64)

  private def bucketCol(s: SparkSession,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("b"), pmod(abs(hash(c)), lit(buckets(s))).cast("string"))

  private def indexRows(s: SparkSession, corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), bucketCol(s, col("doc_id")).as("split"),
      col("split").as("target_split"))

  /** Build the index from scratch at the corpus head — one
    * column-pruned scan of (doc_id, split). Returns the corpus version
    * indexed. */
  def materialize(s: SparkSession, corpusRoot: String,
      indexRoot: String): Int = {
    val head = Snapshots.latestVersion(s, corpusRoot)
    require(head >= 1, s"materialize on an empty corpus store at $corpusRoot")
    require(Snapshots.latestVersion(s, indexRoot) == 0,
      s"index store at $indexRoot already exists — refresh it, or point " +
        "at a fresh root")
    val corpus = Snapshots.readAt(s, corpusRoot, head)
      .select(col("doc_id"), col("split"))
    Snapshots.commitFull(s, indexRows(s, corpus), indexRoot)
    writeIndexedVersion(s, indexRoot, head)
    head
  }

  private val MetaFile = "_docidx.meta"

  /** The corpus version the index currently reflects — a tiny marker
    * updated by atomic replace after every materialize/refresh, so it
    * survives index-store vacuums and redelivered refreshes alike. */
  def indexedVersion(s: SparkSession, indexRoot: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$indexRoot/$MetaFile")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no doc index at $indexRoot — materialize first")
    val in = fs.open(p)
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
    text.trim.toInt
  }

  private def writeIndexedVersion(s: SparkSession, indexRoot: String,
      v: Int): Unit = {
    val dirP = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = dirP.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirP): Unit
    val tmp = new org.apache.hadoop.fs.Path(dirP,
      s".$MetaFile.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(dirP, MetaFile)
    val qTmp = fs.makeQualified(tmp)
    if (qTmp.toUri.getScheme == "file")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(qTmp.toUri.getPath),
        java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    else {
      fs.delete(dst, false): Unit
      if (!fs.rename(tmp, dst)) {
        fs.delete(tmp, false): Unit
        throw graft.core.GraftAnalysisException(Seq(
          s"doc-index meta swap lost a race at $indexRoot — refresh " +
            "serially (one maintainer per index)"))
      }
    }
  }

  /** Bring the index up to the corpus head incrementally: ONE tagged
    * index-store delta derived from the corpus CDC diff — adds/updates
    * upsert `(doc_id → split)` (an update carries the doc's NEW split,
    * so cross-split moves index correctly), removes delete the entry.
    * Index IO ∝ the buckets holding changed doc_ids; corpus IO ∝ the
    * diff's pointer-changed splits. Idempotent per corpus version (the
    * tag ledger skips a redelivered refresh). Returns the corpus
    * version now indexed. */
  def refresh(s: SparkSession, corpusRoot: String, indexRoot: String): Int = {
    val last = indexedVersion(s, indexRoot)
    val head = Snapshots.latestVersion(s, corpusRoot)
    require(head >= last,
      s"corpus store at $corpusRoot is at v$head, behind the index's " +
        s"v$last — the index was built against a different (or recreated) " +
        "store")
    if (head == last) return last
    val ch = Snapshots.changesBetween(s, corpusRoot, last, head)
    val upserts = indexRows(s,
      ch.filter(col("change") =!= "remove").select(col("doc_id"), col("split")))
    val removals = ch.filter(col("change") === "remove")
      .select(col("doc_id"), bucketCol(s, col("doc_id")).as("split"))
      .select(col("split"), col("doc_id"))
    Snapshots.commitDelta(s, indexRoot, adds = upserts,
      removedIds = removals, tag = Some(s"v$head"))
    writeIndexedVersion(s, indexRoot, head)
    head
  }

  /** The current index contents (`doc_id`, `target_split`). */
  def read(s: SparkSession, indexRoot: String): DataFrame =
    Snapshots.readAt(s, indexRoot,
        Snapshots.latestVersion(s, indexRoot))
      .select(col("doc_id"), col("target_split"))

  /** Resolve bare doc_ids to the SPLIT-KEYED `(split, doc_id)` shape
    * every store takedown wants, via the index — never a corpus scan.
    * Ids absent from the index simply don't resolve (the caller's
    * already-deleted no-op). The index must be refreshed to the corpus
    * head first ([[refresh]] — enforced, because resolving against a
    * stale index would miss moves/adds since). */
  def resolveSplits(s: SparkSession, corpusRoot: String, indexRoot: String,
      ids: DataFrame): DataFrame = {
    val head = Snapshots.latestVersion(s, corpusRoot)
    val indexed = indexedVersion(s, indexRoot)
    if (indexed != head)
      throw graft.core.GraftAnalysisException(Seq(
        s"doc index at $indexRoot reflects corpus v$indexed but the " +
          s"store at $corpusRoot is at v$head — refresh the index first " +
          "(resolving against a stale index would mis-key takedowns)"))
    read(s, indexRoot)
      .join(ids.select(col("doc_id")).distinct(), "doc_id")
      .select(col("target_split").as("split"), col("doc_id"))
  }

  /** Doc_id-only takedown at index cost: resolve splits through the
    * index, then commit a split-keyed DELETION-VECTOR takedown
    * ([[Snapshots.commitRemove]] — sidecar only, no split rewrite).
    * The 100 TB replacement for commitDelta's corpus-wide-semi-join
    * fallback. Returns the new corpus version. Refresh the index
    * afterwards like after any commit. */
  def removeByIds(s: SparkSession, corpusRoot: String, indexRoot: String,
      ids: DataFrame, tag: Option[String] = None): Int =
    Snapshots.commitRemove(s, corpusRoot,
      resolveSplits(s, corpusRoot, indexRoot, ids), tag)
}
