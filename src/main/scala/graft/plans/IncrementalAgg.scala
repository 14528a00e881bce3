package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a [[Snapshots]]
  * store — the view-maintenance tier: a dashboard-grade rollup
  * (`GROUP BY …` with count + additive sums) that REFRESHES in time
  * proportional to what the store's deltas touched, never the corpus.
  *
  * The classic incremental-view-maintenance recipe, composed from the
  * store's own CDC read:
  *
  *   - [[materialize]] computes the aggregate at the store's head and
  *     writes it beside a tiny meta file recording the spec and the
  *     version it reflects.
  *   - [[refresh]] diffs the store between the materialized version and
  *     the current head ([[Snapshots.changesWithOld]] — pointer-pruned,
  *     so only splits the deltas touched are read), explodes each change
  *     into ±contributions (add → +new, remove → −old, update → −old
  *     +new, which also handles a row MOVING between groups), aggregates
  *     the contributions per group, and full-outer merges them into the
  *     stored rollup. Groups whose count reaches zero drop out.
  *   - The refreshed view swaps in exactly like the store's commits:
  *     data lands in a fresh attempt-unique dir, then the meta file is
  *     atomically renamed over the old one — readers never see a
  *     half-refreshed view, and crashed or superseded generations are
  *     swept by the next successful swap (the view keeps ONE live
  *     generation: it is derived and rebuildable, so a reader holding a
  *     DataFrame across a refresh must re-resolve with [[read]]).
  *
  * Supported measures: `n_docs` (count) and one `sum_<c>` per requested
  * numeric column. Sums are EXACT for integral and decimal columns;
  * floating-point sums are subject to the same reassociation drift as
  * any distributed sum (refresh order ≠ recompute order). Averages are
  * a read-time division away and deliberately not stored — they do not
  * compose under ±.
  *
  * 100 TB shape: a daily delta touching 3 of 3,000 splits refreshes the
  * view by reading those 3 splits' two versions, one tiny ± aggregate,
  * and one merge join against the view — the view itself is
  * group-count-sized, not corpus-sized. A from-scratch rebuild is one
  * [[materialize]] call away and always available as the audit path.
  */
object IncrementalAgg {

  /** View definition: group-by columns, numeric columns to sum, and
    * columns to track approximate distinct counts for (`ndv_<c>`,
    * DataSketches HLL via Spark's `hll_sketch_agg`). Fixed at
    * [[materialize]] time and recorded in the meta file.
    *
    * NDV caveat: HLL sketches MERGE but cannot RETRACT, so a view with
    * `ndvCols` incrementally refreshes only over ADD-ONLY diffs (the
    * streaming-ingest shape). What a diff with removes/updates does is
    * `ndvRebuild`'s choice:
    *
    *   - `false` (default): refuse loudly naming the blocking change
    *     classes; the caller re-materializes (the audit path).
    *   - `true`: PARTIAL RE-MATERIALIZE — the refresh recomputes ONLY
    *     the groups the diff touched (both their old and new group
    *     keys, so moves are covered) wholesale from the store head, and
    *     keeps every untouched group's stored row verbatim. Exact for
    *     counts and sums, fresh sketches for NDV; cost ∝ the affected
    *     groups' data, never the corpus — a takedown day no longer
    *     forces a full rebuild of the dashboard tier.
    *
    * Count and sum measures carry no such restriction either way. */
  final case class Spec(groupCols: Seq[String], sumCols: Seq[String],
      ndvCols: Seq[String] = Nil, ndvRebuild: Boolean = false)

  /** lgK for the view's HLL sketches (2^12 registers ≈ 1.6% rse —
    * dashboard-grade; fixed so stored and delta sketches always merge). */
  private val NdvLgK = 12

  /** Estimate column for a tracked NDV sketch at read time:
    * `ndvEstimate("lang")` over [[read]]'s frame. */
  def ndvEstimate(c: String): Column =
    expr(s"hll_sketch_estimate(`ndv_$c`)").as(s"ndv_$c")

  private val MetaFile = "_agg.meta"

  /** Build the view from scratch at the store's current head. Returns
    * the store version the view now reflects. */
  def materialize(s: SparkSession, root: String, viewPath: String,
      spec: Spec): Int = {
    require(spec.groupCols.nonEmpty, "IncrementalAgg needs group columns")
    val head = Snapshots.latestVersion(s, root)
    require(head >= 1, s"materialize on an empty store at $root")
    val base = Snapshots.readAt(s, root, head)
    val missing = (spec.groupCols ++ spec.sumCols ++ spec.ndvCols)
      .filterNot(base.columns.contains)
    if (missing.nonEmpty)
      throw graft.core.GraftAnalysisException(
        s"IncrementalAgg spec names columns absent from the store at $root" +:
          missing.map(c => s"missing column '$c'").toIndexedSeq)
    val nonNumeric = spec.sumCols.filterNot(c => base.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType])
    if (nonNumeric.nonEmpty)
      throw graft.core.GraftAnalysisException(
        s"IncrementalAgg sum columns must be numeric" +:
          nonNumeric.map(c =>
            s"column '$c' has type ${base.schema(c).dataType.sql}").toIndexedSeq)
    val view = base.groupBy(spec.groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        spec.sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
          spec.ndvCols.map(c =>
            expr(s"hll_sketch_agg(`$c`, $NdvLgK)").as(s"ndv_$c")): _*)
    writeView(s, viewPath, view, head, spec)
    head
  }

  /** Bring the view up to the store's head incrementally. Returns the
    * version the view now reflects (unchanged head = no-op, nothing
    * rewritten). */
  def refresh(s: SparkSession, root: String, viewPath: String): Int = {
    val (last, spec, _) = readMeta(s, viewPath)
    val head = Snapshots.latestVersion(s, root)
    require(head >= last,
      s"store at $root is at v$head, behind the view's v$last — the view " +
        "was built against a different (or recreated) store")
    if (head == last) return last

    val ch0 = Snapshots.changesWithOld(s, root, last, head)
    val ch =
      if (spec.ndvCols.isEmpty) ch0
      else {
        // sketches merge but cannot retract: an ndv-tracking view is
        // INCREMENTALLY maintainable over ADD-ONLY diffs only (the
        // streaming-ingest shape). Anything else either refuses
        // (re-materialize is the audit path) or, with ndvRebuild,
        // recomputes just the touched groups from the head.
        val p = ch0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val blocking = p.filter(col("change") =!= "add")
          .groupBy(col("change")).count().collect()
        if (blocking.nonEmpty && spec.ndvRebuild) {
          try return refreshByGroupRebuild(s, root, viewPath, spec, p, head)
          finally p.unpersist(blocking = false): Unit
        }
        if (blocking.nonEmpty) {
          p.unpersist(blocking = false): Unit
          throw graft.core.GraftAnalysisException(
            (s"view at $viewPath tracks approximate distinct counts " +
              s"(${spec.ndvCols.mkString(", ")}), which merge but cannot " +
              "retract — the diff v" + last + "..v" + head + " is not " +
              "add-only; re-materialize the view, or declare the view " +
              "with ndvRebuild = true (refresh then recomputes only the " +
              "touched groups from the head)") +:
              blocking.map(r =>
                s"${r.getLong(1)} '${r.getString(0)}' changes").toIndexedSeq)
        }
        p
      }
    def oldCol(c: String): Column =
      if (c == "doc_id") col("doc_id") else col(s"__old.$c")
    val plus = ch.filter(col("change") =!= "remove")
      .select((spec.groupCols.map(col) :+ lit(1L).as("__dn")) ++
        spec.sumCols.map(c => col(c).as(s"__ds_$c")) ++
        spec.ndvCols.map(c => col(c).as(s"__dv_$c")): _*)
    val minus = ch.filter(col("change") =!= "add")
      .select((spec.groupCols.map(c => oldCol(c).as(c)) :+
        lit(-1L).as("__dn")) ++
        spec.sumCols.map(c => (-oldCol(c)).as(s"__ds_$c")) ++
        // unreachable when ndvCols is non-empty (add-only enforced);
        // typed null keeps the union shape aligned
        spec.ndvCols.map(c => lit(null).cast(ch.schema(c).dataType)
          .as(s"__dv_$c")): _*)
    val delta = plus.unionByName(minus)
      .groupBy(spec.groupCols.map(col): _*)
      .agg(sum(col("__dn")).as("__dn"),
        spec.sumCols.map(c => sum(col(s"__ds_$c")).as(s"__ds_$c")) ++
          spec.ndvCols.map(c =>
            expr(s"hll_sketch_agg(`__dv_$c`, $NdvLgK)").as(s"__dv_$c")): _*)

    val stored = read(s, viewPath)
    // full-outer merge on NULL-SAFE group equality: groupBy treats null
    // as a group, so the merge must too — a plain equi-join would leave
    // a null-keyed group duplicated instead of merged. Brand-new groups
    // arrive with no stored row; emptied groups drop on n_docs = 0;
    // all-null sum contributions coalesce to the stored value.
    val deltaR = spec.groupCols.foldLeft(delta)((acc, c) =>
      acc.withColumnRenamed(c, s"__g_$c"))
    val joinCond = spec.groupCols.map(c => col(c) <=> col(s"__g_$c"))
      .reduce(_ && _)
    val merged = stored.join(deltaR, joinCond, "full_outer")
      .select((spec.groupCols.map(c =>
        coalesce(col(c), col(s"__g_$c")).as(c)) :+
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("__dn"), lit(0L))).as("n_docs")) ++
        spec.sumCols.map { c =>
          val st = col(s"sum_$c")
          val d = col(s"__ds_$c")
          when(st.isNull, d).when(d.isNull, st).otherwise(st + d).as(s"sum_$c")
        } ++
        spec.ndvCols.map { c =>
          val st = col(s"ndv_$c")
          val d = col(s"__dv_$c")
          when(st.isNull, d).when(d.isNull, st)
            .otherwise(expr(s"hll_union(`ndv_$c`, `__dv_$c`)")).as(s"ndv_$c")
        }: _*)
      .filter(col("n_docs") > 0L)
    try {
      writeView(s, viewPath, merged, head, spec)
    } finally if (spec.ndvCols.nonEmpty) ch.unpersist(blocking = false): Unit
    head
  }

  /** PARTIAL RE-MATERIALIZE (the `ndvRebuild` path): recompute every
    * measure — count, sums AND sketches — for exactly the groups the
    * diff touched (new-side and old-side keys, so a row moving between
    * groups refreshes both), wholesale from the store head; untouched
    * groups keep their stored row verbatim. The affected-group set is
    * diff-sized, the head scan is filtered by a null-safe semi join on
    * it (group-key row-group skipping bites when the group column is a
    * stats/cluster column), and the sketch rebuild prices only the
    * affected groups' rows — never the corpus. */
  private def refreshByGroupRebuild(s: SparkSession, root: String,
      viewPath: String, spec: Spec, ch: DataFrame, head: Int): Int = {
    def oldCol(c: String): Column =
      if (c == "doc_id") col("doc_id") else col(s"__old.$c")
    val affected = ch.filter(col("change") =!= "remove")
      .select(spec.groupCols.map(col): _*)
      .unionByName(ch.filter(col("change") =!= "add")
        .select(spec.groupCols.map(c => oldCol(c).as(c)): _*))
      .distinct()
    val affectedR = spec.groupCols.foldLeft(affected)((acc, c) =>
      acc.withColumnRenamed(c, s"__g_$c"))
    // null-safe keys: groupBy treats null as a group, the joins must too
    def keyCond(left: DataFrame): Column = spec.groupCols
      .map(c => left(c) <=> affectedR(s"__g_$c")).reduce(_ && _)
    val headData = Snapshots.readAt(s, root, head)
    val recomputed = headData.join(affectedR, keyCond(headData), "left_semi")
      .groupBy(spec.groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        spec.sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
          spec.ndvCols.map(c =>
            expr(s"hll_sketch_agg(`$c`, $NdvLgK)").as(s"ndv_$c")): _*)
    val stored = read(s, viewPath)
    val untouched = stored.join(affectedR, keyCond(stored), "left_anti")
    // a group the diff emptied has no head rows — it simply never
    // reappears from the recompute side (the n_docs = 0 drop, for free)
    writeView(s, viewPath, untouched.unionByName(recomputed), head, spec)
    head
  }

  /** The current view contents (group columns, `n_docs`, `sum_<c>`…). */
  def read(s: SparkSession, viewPath: String): DataFrame = {
    val (_, _, dataDir) = readMeta(s, viewPath)
    s.read.parquet(s"$viewPath/$dataDir")
  }

  /** The store version the view currently reflects. */
  def version(s: SparkSession, viewPath: String): Int =
    readMeta(s, viewPath)._1

  /** Meta format: line 1 `version \t dataDir`, line 2 group columns
    * (url-encoded, comma-joined), line 3 sum columns, line 4 ndv
    * columns, line 5 `1` when ndvRebuild. Temp + atomic rename, the
    * store's own commit-point convention. */
  private def writeView(s: SparkSession, viewPath: String, view: DataFrame,
      version: Int, spec: Spec): Unit = {
    val dataDir = s"v$version-${java.util.UUID.randomUUID().toString.take(8)}"
    // the merge reads the CURRENT view files; materialize the new one
    // fully before the meta swap so a reader (or this writer) never
    // sees a half-written generation
    view.write.mode("overwrite").parquet(s"$viewPath/$dataDir")
    val meta = Seq(
      s"$version\t$dataDir",
      spec.groupCols.map(esc).mkString(","),
      spec.sumCols.map(esc).mkString(","),
      spec.ndvCols.map(esc).mkString(","),
      if (spec.ndvRebuild) "1" else "").mkString("", "\n", "\n")
    val dirP = new org.apache.hadoop.fs.Path(viewPath)
    val fs = dirP.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirP): Unit
    val tmp = new org.apache.hadoop.fs.Path(dirP,
      s".$MetaFile.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(dirP, MetaFile)
    // ATOMIC replace where the filesystem gives us one (POSIX rename
    // replaces; Hadoop's local rename refuses onto an existing path) —
    // a reader must never observe the view meta-less mid-refresh
    val qTmp = fs.makeQualified(tmp)
    if (qTmp.toUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(qTmp.toUri.getPath),
        java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    } else {
      fs.delete(dst, false): Unit
      if (!fs.rename(tmp, dst)) {
        fs.delete(tmp, false): Unit
        throw graft.core.GraftAnalysisException(Seq(
          s"IncrementalAgg meta swap lost a race at $viewPath — refresh " +
            "serially (one maintainer per view)"))
      }
    }
    // sweep superseded and crashed generations (anything but the one
    // the fresh meta points at) — the view keeps ONE live generation
    fs.listStatus(dirP).map(_.getPath)
      .filter(p => p.getName.startsWith("v") && p.getName != dataDir)
      .foreach(p => fs.delete(p, true): Unit)
  }

  private def readMeta(s: SparkSession, viewPath: String): (Int, Spec, String) = {
    val p = new org.apache.hadoop.fs.Path(s"$viewPath/$MetaFile")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no materialized view at $viewPath — materialize first")
    val in = fs.open(p)
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
    val lines = text.split("\n").toIndexedSeq
    val Array(v, dataDir) = lines(0).split("\t", 2)
    def cols(l: String): Seq[String] =
      if (l.isEmpty) Nil else l.split(",").toIndexedSeq.map(unesc)
    (v.toInt,
      Spec(cols(lines(1)), cols(lines(2)), cols(lines.lift(3).getOrElse("")),
        lines.lift(4).exists(_.trim == "1")),
      dataDir)
  }

  private def esc(x: String): String = java.net.URLEncoder.encode(x, "UTF-8")
  private def unesc(x: String): String = java.net.URLDecoder.decode(x, "UTF-8")
}
