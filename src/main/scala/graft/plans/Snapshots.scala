package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned copy-on-write corpus store: snapshot isolation + time travel
  * for an evolving training corpus.
  *
  * [[CorpusExport.applyDelta]] merges a delta into the base IN PLACE —
  * the right call when one logical corpus is all anyone needs. But a
  * training run that starts Monday must read the SAME corpus Friday
  * (reproducibility), while curation keeps committing daily deltas. An
  * in-place store cannot give both; this store can, by never mutating a
  * written file:
  *
  *   - Each commit writes ONLY its affected split partitions into a
  *     fresh ATTEMPT-UNIQUE `root/v{N}-{attempt}/split=…/` tree —
  *     untouched splits are carried by POINTER to the version dir that
  *     last wrote them, so a daily delta touching 3 of 3,000 date-keyed
  *     splits writes 3 partitions, not the corpus.
  *   - The version FILE (`root/_versions/v{N}.list`) is the commit
  *     point, written to a temp name and atomically renamed. Readers
  *     resolve a version to concrete immutable paths; a reader at v3 is
  *     untouchable by the v4 commit racing alongside it — that is the
  *     whole point.
  *   - The rename doubles as optimistic concurrency control: HDFS
  *     rename refuses an existing destination, so two racing committers
  *     produce ONE v{N+1} and one loud failure — and because each
  *     attempt writes its own data dir, the loser's overwrite can never
  *     touch files the winner's version file references; its dir is
  *     unreferenced debris for [[vacuum]]. POSIX/local rename OVERWRITES
  *     instead, so same-process races are additionally serialized by a
  *     JVM lock + exists check; cross-DRIVER commits need a filesystem
  *     with exclusive rename (HDFS) or external coordination (raw S3
  *     likewise — front `_versions/` with a store that has it).
  *
  * Version files are tiny driver-side artifacts (one line per split),
  * exactly like the manifest conventions of [[CorpusExport]]; everything
  * row-sized stays distributed. A long delta chain accumulates referenced
  * version dirs — `readAt` unions one scan per REFERENCED DIR, not per
  * commit — and the standing fix is the same as every LSM: periodically
  * [[commitFull]] a fresh consolidated version and vacuum dirs no live
  * version references.
  */
object Snapshots {

  private val VersionsDir = "_versions"

  private final case class SplitRef(split: String, dir: String, nRows: Long)

  /** ATTEMPT-UNIQUE data dir for a commit targeting version `v`. Racing
    * committers for the same v therefore write DISJOINT trees — if they
    * shared `v{N}/`, the rename-loser's overwrite could destroy files
    * the winner's just-committed version file already references. One
    * wins the version-file rename; the loser's dir becomes unreferenced
    * debris for [[vacuum]]. */
  private def attemptDir(v: Int): String =
    s"v$v-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Version number encoded in a data-dir name (`v{N}-{attempt}`), used
    * by [[vacuum]]'s newer-than-latest guard. */
  private def dirVersion(name: String): Option[Int] =
    if (!name.startsWith("v")) None
    else name.stripPrefix("v").takeWhile(_.isDigit).toIntOption

  /** Commit the FULL corpus as the next version (v1 on an empty root; a
    * consolidation commit on a live one): every split rewrites into
    * `root/v{N}/`, the new version file points only there. Returns the
    * committed version number. `df` must carry a `split` column. */
  def commitFull(s: SparkSession, df: DataFrame, root: String): Int = {
    val v = latestVersion(s, root) + 1
    val dir = attemptDir(v)
    df.write.mode("overwrite").partitionBy("split")
      .parquet(s"$root/$dir")
    // explicit schema: an EMPTY corpus writes no part files, and an
    // inference-based read-back would refuse instead of recording v1
    val written = s.read.schema(df.schema)
      .option("basePath", s"$root/$dir")
      .parquet(s"$root/$dir")
    val refs = written.groupBy(col("split"))
      .agg(count(lit(1)).as("n"))
      .collect() // bounded: one row per split partition (the applyDelta bound)
      .map(r => SplitRef(r.getString(0), dir, r.getLong(1)))
    writeVersionFile(s, root, v, df.schema, refs.toIndexedSeq)
    v
  }

  /** Commit a DELTA as the next version: `adds` are new/updated documents
    * (an updated doc_id replaces its old row — the [[CorpusExport]] delta
    * contract), `removedIds` (`doc_id`) are takedowns. Only the split
    * partitions holding adds or removals are rewritten, into this
    * attempt's own dir; every other split keeps its existing pointer. The
    * new content of an affected split is computed against the CURRENT
    * latest version — immutable inputs, so the rewrite itself is
    * replayable until the version-file rename lands. Returns the new
    * version number. */
  def commitDelta(s: SparkSession, root: String,
      adds: DataFrame, removedIds: DataFrame): Int =
    commitDelta(s, root, adds, removedIds, tag = None)

  /** [[commitDelta]] with an IDEMPOTENCE TAG — the at-least-once glue:
    * a `foreachBatch` ingest stream commits each micro-batch with
    * `tag = Some(s"b$batchId")`, and a redelivered batch finds its tag
    * on an already-committed version and returns THAT version instead
    * of committing a duplicate (the [[graft.sources.Sources
    * .commitBatchJdbc]] ledger discipline, carried by the version files
    * themselves — no side table). The tag scan is driver-side over the
    * live version files, bounded by the retention window. */
  def commitDelta(s: SparkSession, root: String,
      adds: DataFrame, removedIds: DataFrame, tag: Option[String]): Int = {
    val base = latestVersion(s, root)
    require(base >= 1, s"commitDelta on an empty store at $root — commitFull first")
    tag.foreach { t =>
      val dirP = new org.apache.hadoop.fs.Path(s"$root/$VersionsDir")
      val fs = dirP.getFileSystem(s.sparkContext.hadoopConfiguration)
      listVersions(fs, dirP).foreach { v =>
        if (readTag(s, root, v).contains(t)) return v
      }
    }
    val (schema, refs) = readVersionFile(s, root, base)
    val v = base + 1
    val dir = attemptDir(v)

    val gone = removedIds.select(col("doc_id"))
      .unionByName(adds.select(col("doc_id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val current = readRefs(s, root, schema, refs)
      // affected = splits receiving adds ∪ splits losing docs. Bounded
      // driver collect: one row per AFFECTED split (a daily delta touches
      // few of many splits — the design point).
      val affected = adds.select(col("split"))
        .unionByName(current.join(gone, "doc_id").select(col("split")))
        .distinct().collect().map(_.getString(0)).toSet

      val newRefs0: Seq[SplitRef] =
        if (affected.isEmpty) refs
        else {
          val rewritten = current
            .filter(col("split").isin(affected.toSeq: _*))
            .join(gone, Seq("doc_id"), "left_anti")
            .unionByName(adds.filter(col("split").isin(affected.toSeq: _*)))
          rewritten.write.mode("overwrite").partitionBy("split")
            .parquet(s"$root/$dir")
          // read-back counts from the WRITTEN files (the manifest
          // verification contract); a split rewritten to EMPTY has no
          // files — its ref records 0 rows and readAt skips it
          val counts = s.read.schema(rewritten.schema)
            .option("basePath", s"$root/$dir").parquet(s"$root/$dir")
            .groupBy(col("split")).agg(count(lit(1)).as("n"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val kept = refs.filterNot(r => affected.contains(r.split))
          val touched = affected.toSeq.sorted.map(sp =>
            SplitRef(sp, dir, counts.getOrElse(sp, 0L)))
          kept ++ touched
        }
      writeVersionFile(s, root, v, schema, newRefs0, tag)
      v
    } finally { gone.unpersist(blocking = false); () }
  }

  /** Read the corpus AS OF `version` — immutable: later commits write
    * new dirs and new version files, so this plan's input files can
    * never change underneath it. One scan per referenced version dir
    * (not per split, not per commit), unioned. */
  def readAt(s: SparkSession, root: String, version: Int): DataFrame = {
    val (schema, refs) = readVersionFile(s, root, version)
    readRefs(s, root, schema, refs)
  }

  /** Retention vacuum: drop all but the `keepLast` newest versions and
    * delete every data dir no SURVIVING version references. Pointer
    * carry makes this subtler than "delete old dirs": the latest
    * version's untouched splits still point INTO old version dirs, and
    * those dirs must survive — only dirs referenced by no survivor go.
    * Readers pinned to a vacuumed version break loudly on their next
    * `readAt` (no version file) — that is the retention contract; run
    * vacuum with a `keepLast` covering every training run still
    * replaying. Dirs NEWER than the latest committed version are never
    * touched (a concurrent commit may be mid-write there — its version
    * file is its commit point, not its data dir). Returns
    * (droppedVersions, deletedDirs). */
  def vacuum(s: SparkSession, root: String, keepLast: Int): (Seq[Int], Seq[String]) = {
    require(keepLast >= 1, s"vacuum keepLast must be >= 1, got $keepLast")
    val dirP = new org.apache.hadoop.fs.Path(s"$root/$VersionsDir")
    val fs = dirP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val versions = listVersions(fs, dirP)
    if (versions.isEmpty) return (Nil, Nil)
    val latest = versions.last
    val (dropped, survivors) = versions.splitAt(math.max(0, versions.length - keepLast))
    val referenced: Set[String] = survivors
      .flatMap(v => readVersionFile(s, root, v)._2.filter(_.nRows > 0).map(_.dir))
      .toSet
    // drop version files FIRST: a crash mid-vacuum must never leave a
    // live version file pointing at a dir the dir-sweep already deleted
    dropped.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(dirP, s"v$v.list"), false): Unit
    }
    val rootP = new org.apache.hadoop.fs.Path(root)
    val deletable = fs.listStatus(rootP).map(_.getPath.getName)
      .flatMap(n => dirVersion(n).map(n -> _))
      .filter { case (name, k) => k <= latest && !referenced.contains(name) }
      .map(_._1).sorted.toIndexedSeq
    deletable.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(rootP, d), true): Unit
    }
    (dropped, deletable)
  }

  /** Latest committed version at `root` (0 = empty store): the largest N
    * with a COMPLETE `v{N}.list` — a crashed commit's data dir without
    * its version file is invisible, by design. */
  def latestVersion(s: SparkSession, root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$VersionsDir")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    listVersions(fs, p).lastOption.getOrElse(0)
  }

  /** The committed version numbers at `dir` (complete `v{N}.list` files
    * only), ascending — the ONE parse of the naming scheme shared by
    * [[latestVersion]] and [[vacuum]]. */
  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): IndexedSeq[Int] =
    if (!fs.exists(dir)) IndexedSeq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .flatMap { n =>
        if (n.startsWith("v") && n.endsWith(".list"))
          n.stripPrefix("v").stripSuffix(".list").toIntOption
        else None
      }.sorted.toIndexedSeq

  /** Version file format (driver-side, dependency-free, exact):
    * line 1 = the schema DDL (readers need it when every ref is empty);
    * optional `#tag=<url-encoded>` metadata line (the idempotence tag);
    * each further line = `url-encoded-split \t dir \t n_rows`. Written
    * to a temp name and atomically renamed — the COMMIT POINT; rename
    * onto an existing destination fails, which is the concurrency
    * control. */
  private def writeVersionFile(s: SparkSession, root: String, v: Int,
      schema: org.apache.spark.sql.types.StructType,
      refs: Seq[SplitRef], tag: Option[String] = None): Unit = {
    val body = (Seq(schema.toDDL) ++
      tag.map(t => s"#tag=${escape(t)}") ++
      refs.sortBy(_.split).map(r =>
        s"${escape(r.split)}\t${r.dir}\t${r.nRows}"))
      .mkString("", "\n", "\n")
    val dirP = new org.apache.hadoop.fs.Path(s"$root/$VersionsDir")
    val fs = dirP.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirP): Unit
    val tmp = new org.apache.hadoop.fs.Path(dirP,
      s".v$v.list.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(dirP, s"v$v.list")
    // HDFS rename refuses an existing destination (true cross-driver
    // exclusivity), but POSIX/local rename OVERWRITES — a racing loser
    // would silently replace the winner's committed file. The JVM lock +
    // exists check closes the race for every committer in THIS process
    // (the common orchestrator shape); cross-DRIVER commits to one store
    // need a filesystem with exclusive rename (HDFS) or external
    // coordination — documented in SCALE.md.
    val won = commitLock.synchronized {
      !fs.exists(dst) && fs.rename(tmp, dst)
    }
    if (!won) {
      fs.delete(tmp, false): Unit
      throw graft.core.GraftAnalysisException(Seq(
        s"concurrent commit detected at $root: v$v already exists — " +
          "re-read the latest version and retry the delta against it"))
    }
  }

  /** Serializes same-process commit-point renames (see above). */
  private val commitLock = new Object

  private def readVersionFile(s: SparkSession, root: String, v: Int)
      : (org.apache.spark.sql.types.StructType, Seq[SplitRef]) = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$VersionsDir/v$v.list")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no committed version v$v at $root")
    val lines = readWhole(fs, p).split("\n").toIndexedSeq.filter(_.nonEmpty)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(lines.head)
    val refs = lines.tail.filterNot(_.startsWith("#")).map { l =>
      val Array(sp, dir, n) = l.split("\t", 3)
      SplitRef(unescape(sp), dir, n.toLong)
    }
    (schema, refs)
  }

  /** The idempotence tag recorded in `v{N}.list`, if any. */
  private def readTag(s: SparkSession, root: String, v: Int): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$VersionsDir/v$v.list")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else readWhole(fs, p).split("\n").find(_.startsWith("#tag="))
      .map(l => unescape(l.stripPrefix("#tag=")))
  }

  private def readWhole(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** One scan per referenced version dir, each PRUNED to the splits the
    * version actually takes from that dir (a dir written by a later
    * commit holds splits this version must NOT see). The pruning is a
    * partition filter — planning-time, never a data pass — and avoids
    * constructing `split=…` paths by hand, which would have to replicate
    * Spark's partition-value escaping exactly. */
  private def readRefs(s: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType,
      refs: Seq[SplitRef]): DataFrame = {
    val live = refs.filter(_.nRows > 0)
    val byDir = live.groupBy(_.dir).toSeq.sortBy(_._1)
    byDir.map { case (dir, rs) =>
      s.read.schema(schema).option("basePath", s"$root/$dir")
        .parquet(s"$root/$dir")
        .filter(col("split").isin(rs.map(_.split): _*))
        // partition columns can surface out of schema order — pin the
        // stored order so every version reads back shape-identical
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }.reduceOption(_ unionByName _)
      .getOrElse(s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
  }

  /** Split values round-trip MY version-file format via URL-encoding
    * (tab/newline-safe); partition paths are never hand-constructed —
    * see [[readRefs]]. */
  private def escape(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def unescape(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")
}
