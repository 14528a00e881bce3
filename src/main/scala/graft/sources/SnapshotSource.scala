package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, Filter, InsertableRelation, PrunedFilteredScan, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.plans.Snapshots

/** The SQL/DataSourceV2 FRONT DOOR for the [[graft.plans.Snapshots]]
  * corpus store — the open entry point the reference's dynamic-query
  * thesis asks for (queries built from runtime descriptions,
  * `/root/reference/documentation/doc-03.md:84`, `doc-01.md:136-158`)
  * applied to the storage tier: a third-party Spark SQL / BI tool that
  * has never heard of this codebase reads a versioned corpus with
  *
  * {{{
  *   spark.read.format("graft-snapshot")
  *     .option("versionAsOf", 5)         // or timestampAsOf / tag / branch
  *     .load(root)
  *
  *   CREATE TEMPORARY VIEW corpus
  *   USING `graft-snapshot` OPTIONS (path '<root>', versionAsOf '5')
  * }}}
  *
  * and gets the WHOLE read tier for free: snapshot isolation (the scan
  * is pinned to immutable version refs), merge-on-read deletion-vector
  * anti-joins, and the stats/bloom manifest pruner — pushed filters are
  * routed through [[Snapshots.readAtWhere]], so a range/equality/IN
  * predicate on a tracked column skips provably-disjoint splits before
  * any file is opened, exactly as the Scala API does.
  *
  * The door is full-duplex: writes (`df.write.format(…)`, SQL
  * `INSERT INTO`/`OVERWRITE` — [[writeInto]]), row-level `DELETE FROM`
  * (DSv2 `SupportsDelete`, sidecar-only deletion vectors —
  * [[deleteFrom]]), and a STREAMING tail of the row-level change feed
  * (`spark.readStream` + `changeFeed=true` — [[SnapshotChangeFeed]]).
  *
  * Both connector generations are served by one class so every SQL
  * surface resolves it:
  *   - [[TableProvider]] (DataSourceV2) for `spark.read.format(...)`:
  *     the [[ScanBuilder]] implements [[SupportsPushDownFilters]] +
  *     [[SupportsPushDownRequiredColumns]] and the resulting [[Scan]]
  *     is a [[V1Scan]] — Spark plans it as a row-source scan whose
  *     `PushedFilters: [...]` are visible in `explain`, while the scan
  *     body reuses the store's own DataFrame machinery (pruner, DV
  *     anti-join, per-dir partition pruning) instead of re-implementing
  *     a parquet reader.
  *   - [[RelationProvider]] (v1) for `CREATE TEMPORARY VIEW ... USING`:
  *     the same core behind a [[PrunedFilteredScan]].
  *
  * OPTIONS (case-insensitive): `path` (the store root — also the
  * `load(...)` argument), and at most one of `versionAsOf` (int),
  * `timestampAsOf` (epoch millis, ISO-8601 instant, or `yyyy-MM-dd` —
  * resolved through the store's monotonized commit stamps), `tag` (an
  * ingest idempotence tag, resolved through the durable ledger);
  * default = the latest committed version. `branch` reads a branch
  * chain (combinable with `versionAsOf` only — stamps and tags are
  * main-chain concepts). Explicit pins FREEZE the view forever; an
  * unpinned view tracks the HEAD, re-resolving per query — while each
  * individual scan still captures one version at planning and reads
  * only immutable refs (snapshot isolation per query, live view across
  * queries: the Delta-style contract).
  */
class SnapshotSource extends TableProvider with RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  /** WRITE path (`df.write.format("graft-snapshot").mode(…).save(root)`):
    * Append = one tagged-able delta commit against the head
    * (`commitTag` option = the idempotence tag; `branch` targets a
    * branch chain), Overwrite = a full rewrite CARRYING the head's
    * stats/constraint/clustering contract forward (`INSERT OVERWRITE`
    * semantics — a front-door rewrite must not drop the owner's table
    * definition). Writes target EXISTING stores only: creating a store
    * — choosing its statsCols, blooms, constraints — is the owning
    * pipeline's `Snapshots.commitFull` call, not a side effect of a
    * generic save. Read pins (versionAsOf/timestampAsOf/tag) refuse on
    * writes: commits go to the head by definition. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val opts = parameters.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    mode match {
      case SaveMode.Append =>
        SnapshotSource.writeInto(opts, data, overwrite = false)
      case SaveMode.Overwrite =>
        SnapshotSource.writeInto(opts, data, overwrite = true)
      case SaveMode.ErrorIfExists =>
        SnapshotSource.refuse(
          "graft-snapshot: the store already exists (front-door writes " +
            "target existing stores) — use mode append or overwrite; a " +
            "NEW store is created with Snapshots.commitFull, where its " +
            "stats/constraint contract is chosen")
      case SaveMode.Ignore => ()
    }
    new SnapshotSource.SnapshotRelation(sqlContext,
      SnapshotSource.resolve(opts), opts)
  }

  // ---- DataSourceV2 ------------------------------------------------------

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = SnapshotSource.optionMap(options)
    val t = SnapshotSource.resolve(opts)
    val store = Snapshots.readAt(t.spark, t.root, t.version, t.branch).schema
    if (SnapshotSource.changeFeedRequested(opts))
      SnapshotChangeFeed.cdcSchema(store)
    else store
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = SnapshotSource.optionMap(new CaseInsensitiveStringMap(properties))
    new SnapshotSource.SnapshotTable(SnapshotSource.resolve(opts), schema, opts)
  }

  // ---- DataSource v1 (SQL `USING` path) ----------------------------------

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val opts = parameters.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    new SnapshotSource.SnapshotRelation(sqlContext,
      SnapshotSource.resolve(opts), opts)
  }
}

object SnapshotSource {

  /** A resolved read target. An EXPLICIT pin (versionAsOf /
    * timestampAsOf / tag) freezes `version` forever — a historical read
    * stays historical however long the view lives. An UNPINNED target
    * tracks the HEAD: `version` re-resolves on every call, so each scan
    * (one per query) reads the head as of its own planning — a temp
    * view created yesterday serves today's corpus, while the scan
    * itself is still snapshot-isolated (it captures the version once
    * and reads immutable refs). */
  private[sources] final case class Target(spark: SparkSession, root: String,
      pin: Option[Int], branch: Option[String]) {
    def version: Int = pin.getOrElse {
      val head = Snapshots.latestVersion(spark, root, branch)
      if (head < 1)
        refuse(s"graft-snapshot: no committed version at $root" +
          branch.fold("")(b => s" on branch '$b'") +
          " — create the store with Snapshots.commitFull first")
      head
    }
  }

  private def optionMap(options: CaseInsensitiveStringMap): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    options.asCaseSensitiveMap().asScala.toMap
      .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
  }

  private[sources] def refuse(msg: String): Nothing =
    throw graft.core.GraftAnalysisException(Seq(msg))

  /** The lowercased option keys — [[graft.sources.SnapshotCatalog]]
    * builds option maps with these, so the spelling lives in ONE place. */
  private[sources] val VersionAsOfKey = "versionasof"
  private[sources] val TimestampAsOfKey = "timestampasof"
  private[sources] val TagKey = "tag"

  /** `changeFeed=true`: the read serves the row-level CDC stream
    * ([[SnapshotChangeFeed]]) instead of a snapshot. */
  private[sources] def changeFeedRequested(opts: Map[String, String]): Boolean =
    opts.get("changefeed").exists(v =>
      v.equalsIgnoreCase("true") || v == "1")

  /** The `startingVersion` / `endingVersion` options of a change-feed
    * read (ending = batch CDF only). */
  private[sources] def startingVersion(opts: Map[String, String]): Option[Int] =
    opts.get("startingversion").map(v => v.toIntOption.getOrElse(
      refuse(s"graft-snapshot: startingVersion '$v' is not an integer")))
  private[sources] def endingVersion(opts: Map[String, String]): Option[Int] =
    opts.get("endingversion").map(v => v.toIntOption.getOrElse(
      refuse(s"graft-snapshot: endingVersion '$v' is not an integer")))

  /** True when the options PIN a version for reading — a write through
    * such options/views refuses (commits go to the head). */
  private def readPinned(opts: Map[String, String]): Boolean =
    opts.contains(VersionAsOfKey) || opts.contains(TimestampAsOfKey) ||
      opts.contains(TagKey)

  /** The shared WRITE body (DataFrameWriter save and SQL INSERT INTO):
    * append = delta commit (optionally `commitTag`-idempotent, branch
    * aware), overwrite = full rewrite carrying the head's contract
    * ([[Snapshots.commitFullLike]], main-chain only). The data must be
    * split-keyed like every store commit. */
  private[sources] def writeInto(opts: Map[String, String], data: DataFrame,
      overwrite: Boolean): Unit = {
    if (readPinned(opts))
      refuse("graft-snapshot: versionAsOf/timestampAsOf/tag are READ " +
        "pins — a write goes to the store's head; remove them from the " +
        "write options (the commit idempotence tag is `commitTag`)")
    val spark = SparkSession.active
    val root = opts.getOrElse("path",
      refuse("graft-snapshot write needs the store root: .save(<root>)"))
    val branch = opts.get("branch")
    if (!data.columns.contains("split") || !data.columns.contains("doc_id"))
      refuse("graft-snapshot write: store rows are split-keyed — the " +
        "frame must carry `split` and `doc_id` columns")
    // NULL keys (e.g. v2 by-name append NULL-filling a nullable `split`
    // the input frame omitted) refuse INSIDE the commit: the store's
    // stats pass counts them for free pre-publish, so the door adds no
    // extra validation job per append. The persist is cache-only (no
    // action): the commit runs several actions over the adds
    val dataP = data
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try writeCommit(spark, root, branch, opts, dataP, overwrite)
    finally dataP.unpersist(blocking = false): Unit
  }

  private def writeCommit(spark: SparkSession, root: String,
      branch: Option[String], opts: Map[String, String], data: DataFrame,
      overwrite: Boolean): Unit = {
    if (overwrite) {
      if (branch.nonEmpty)
        refuse("graft-snapshot: overwrite is a full rewrite of MAIN — " +
          "branches take deltas (mode append); merge or drop the branch " +
          "for wholesale changes")
      if (opts.contains("committag"))
        refuse("graft-snapshot: commitTag is append-only (full rewrites " +
          "have no redelivery-idempotence ledger)")
      Snapshots.commitFullLike(spark, data, root): Unit
    } else {
      Snapshots.commitDelta(spark, root, adds = data,
        removedIds = data.select(col("split"), col("doc_id")).limit(0),
        tag = opts.get("committag"), branch = branch): Unit
    }
  }

  /** The doc_ids a conjunction of pushed filters pins EXACTLY — i.e.
    * the whole predicate is one `doc_id = v` or `doc_id IN (…)` — or
    * None when the predicate involves anything else (then only the
    * scan path can resolve victims). */
  private def docIdOnlyValues(filters: Array[Filter]): Option[Seq[Any]] =
    filters match {
      case Array(sources.EqualTo("doc_id", v)) => Some(Seq(v))
      case Array(sources.In("doc_id", vs)) => Some(vs.toIndexedSeq)
      case _ => None
    }

  /** The shared DELETE body. Resolution strategy:
    *   - predicate is exactly `doc_id = v` / `doc_id IN (…)` AND the
    *     options name a standing [[graft.plans.DocIndex]] (`docindex`):
    *     victims resolve at INDEX cost — the probed ids' buckets only,
    *     zero corpus scan (assumes doc_id → split is unique corpus-wide,
    *     the index's own contract);
    *   - otherwise: one stats/bloom-PRUNED scan ([[Snapshots
    *     .readAtWhere]]) collects the matching `(split, doc_id)` keys,
    *     plus one bounded guard pass over the affected splits (below).
    * Either way the commit is [[Snapshots.commitRemove]] — sidecar-only
    * deletion vectors, never a split rewrite.
    *
    * KEY-GRANULARITY GUARD: deletion vectors tombstone whole
    * `(split, doc_id)` keys. If the corpus holds duplicated keys and
    * the predicate matches only SOME physical rows of one, deleting the
    * key would remove more than the predicate selected — so the scan
    * path verifies (one pass over the affected splits) that every row
    * of every victim key matches, and refuses naming samples otherwise.
    * An empty filter set (`DELETE FROM t` with no WHERE) tombstones
    * everything — the store's history keeps every prior version
    * readable. */
  private[sources] def deleteFrom(opts: Map[String, String],
      tableSchema: StructType, filters: Array[Filter]): Unit = {
    if (readPinned(opts))
      refuse("graft-snapshot: DELETE commits against the store's HEAD — " +
        "versionAsOf/timestampAsOf/tag pin a historical read, which is " +
        "not a write target; drop the pin (history stays readable: a " +
        "delete only adds a deletion-vector version)")
    val spark = SparkSession.active
    val root = opts.getOrElse("path",
      refuse("graft-snapshot delete needs the store root option `path`"))
    val branch = opts.get("branch")
    val head = Snapshots.latestVersion(spark, root, branch)
    if (head < 1)
      refuse(s"graft-snapshot: no committed version at $root to delete from")
    val idxPath = opts.get("docindex")
    docIdOnlyValues(filters) match {
      case Some(ids) if idxPath.nonEmpty && branch.isEmpty =>
        // index-cost lane: probe ONLY the ids' buckets; ids absent from
        // the index are the already-deleted no-op (SQL DELETE semantics:
        // deleting a non-existent row is not an error)
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row](ids.length)
        ids.foreach(v => rows.add(org.apache.spark.sql.Row(v)))
        val idsDf = spark.createDataFrame(rows, StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            tableSchema("doc_id").dataType))))
        val resolved =
          graft.plans.DocIndex.resolveSplits(spark, root, idxPath.get, idsDf)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (resolved.limit(1).count() > 0)
            Snapshots.commitRemove(spark, root, resolved, None, None): Unit
          // no id resolved: the delete-nothing no-op — no blank version
        } finally resolved.unpersist(blocking = false): Unit
      case _ =>
        val pred = filters.toIndexedSeq.flatMap(toColumn)
          .reduceOption(_ && _).getOrElse(lit(true))
        val victims = Snapshots.readAtWhere(spark, root, head, pred, branch)
          .select(col("split"), col("doc_id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // bounded collect: one name per affected split
          val names = victims.select(col("split")).distinct()
            .collect().map(_.getString(0))
          if (names.nonEmpty) {
            val affected = Snapshots.readAt(spark, root, head, branch)
              .filter(col("split").isin(names.toIndexedSeq: _*))
            val partial = affected
              .join(victims, Seq("split", "doc_id"), "left_semi")
              .filter(!pred).limit(6)
              .select(col("split"), col("doc_id")).collect()
            if (partial.nonEmpty)
              refuse("graft-snapshot DELETE: the predicate matches only " +
                "SOME physical rows of duplicated key(s) " +
                partial.take(5).map(r => s"(${r.get(0)}, ${r.get(1)})")
                  .mkString(", ") +
                (if (partial.length > 5) ", …" else "") +
                " — deletion vectors tombstone whole (split, doc_id) " +
                "keys, so this statement would delete more rows than it " +
                "selected; widen the predicate to whole keys or dedup " +
                "the corpus first")
            Snapshots.commitRemove(spark, root, victims, None, branch): Unit
          }
          // zero victims: SQL DELETE matching nothing is a no-op, not a
          // commit — the chain must not grow a blank version per miss
        } finally victims.unpersist(blocking = false): Unit
    }
  }

  /** Epoch millis of a `timestampAsOf` option value: raw millis, an
    * ISO-8601 instant, or a date (read as midnight UTC — the start of
    * that day, matching "the corpus as of <date>"). */
  private def parseTimestamp(v: String): Long =
    v.toLongOption.getOrElse {
      try java.time.Instant.parse(v).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDate.parse(v)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
          catch {
            case _: java.time.format.DateTimeParseException =>
              refuse(s"graft-snapshot: cannot parse timestampAsOf '$v' — " +
                "pass epoch millis, an ISO-8601 instant " +
                "(2026-01-01T00:00:00Z) or a date (2026-01-01)")
          }
      }
    }

  private[sources] def resolve(opts: Map[String, String]): Target = {
    val spark = SparkSession.active
    val root = opts.getOrElse("path",
      refuse("graft-snapshot needs a store root: .load(<root>) or " +
        "OPTIONS (path '<root>')"))
    val branch = opts.get("branch")
    val pins = Seq(VersionAsOfKey, TimestampAsOfKey, TagKey)
      .filter(opts.contains)
    if (pins.length > 1)
      refuse(s"graft-snapshot: options ${pins.mkString(", ")} are mutually " +
        "exclusive — pin the version one way")
    if (branch.nonEmpty &&
        (opts.contains(TimestampAsOfKey) || opts.contains(TagKey)))
      refuse("graft-snapshot: timestampAsOf and tag resolve through " +
        "main-chain stamps/ledger — combine branch only with versionAsOf")
    val pin: Option[Int] = opts.get(VersionAsOfKey) match {
      case Some(v) =>
        Some(v.toIntOption.getOrElse(
          refuse(s"graft-snapshot: versionAsOf '$v' is not an integer")))
      case None => opts.get(TimestampAsOfKey) match {
        case Some(ts) =>
          Some(Snapshots.versionAsOf(spark, root, parseTimestamp(ts)))
        case None => opts.get(TagKey).map(t =>
          Snapshots.versionForTag(spark, root, t).getOrElse(
            refuse(s"graft-snapshot: no commit tagged '$t' at $root")))
      }
    }
    Target(spark, root, pin, branch)
  }

  /** Pushed v1 filters → one Column predicate for the pruner, or None
    * when nothing translated. Translation is per-filter; an
    * untranslatable filter is simply Spark's to evaluate post-scan
    * (`unhandledFilters` / the ScanBuilder's residual), never a
    * correctness risk. Attribute names with dots are left untranslated —
    * a pushed nested-field reference would need quoting rules this
    * source doesn't want to guess at. */
  private[sources] def toColumn(f: Filter): Option[Column] = {
    def attr(a: String): Option[Column] =
      if (a.contains(".")) None else Some(col(s"`$a`"))
    f match {
      case sources.EqualTo(a, v) => attr(a).map(_ === lit(v))
      case sources.EqualNullSafe(a, v) => attr(a).map(_ <=> lit(v))
      case sources.GreaterThan(a, v) => attr(a).map(_ > lit(v))
      case sources.GreaterThanOrEqual(a, v) => attr(a).map(_ >= lit(v))
      case sources.LessThan(a, v) => attr(a).map(_ < lit(v))
      case sources.LessThanOrEqual(a, v) => attr(a).map(_ <= lit(v))
      case sources.In(a, vs) =>
        attr(a).map(_.isin(vs.toIndexedSeq.map(v => lit(v)): _*))
      case sources.IsNull(a) => attr(a).map(_.isNull)
      case sources.IsNotNull(a) => attr(a).map(_.isNotNull)
      case sources.StringStartsWith(a, v) => attr(a).map(_.startsWith(v))
      case sources.StringEndsWith(a, v) => attr(a).map(_.endsWith(v))
      case sources.StringContains(a, v) => attr(a).map(_.contains(v))
      case sources.And(l, r) =>
        for { a <- toColumn(l); b <- toColumn(r) } yield a && b
      case sources.Or(l, r) =>
        for { a <- toColumn(l); b <- toColumn(r) } yield a || b
      case sources.Not(c) => toColumn(c).map(!_)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  /** The one scan body both connector generations share: version-pinned
    * read, pushed predicate routed through the manifest pruner + DV
    * anti-join ([[Snapshots.readAtWhere]]), then the required-column
    * projection (Catalyst pushes it into the underlying parquet scans
    * when this frame is planned). */
  private[sources] def scanFrame(t: Target, version: Int, pushed: Seq[Filter],
      requiredColumns: Seq[String]): DataFrame = {
    val pred = pushed.flatMap(toColumn).reduceOption(_ && _)
    val base = pred match {
      case Some(p) => Snapshots.readAtWhere(t.spark, t.root, version, p, t.branch)
      case None => Snapshots.readAt(t.spark, t.root, version, t.branch)
    }
    base.select(requiredColumns.map(n => col(s"`$n`")): _*)
  }

  // ---- DSv2 table / scan -------------------------------------------------

  private[sources] final class SnapshotTable(t: Target,
      tableSchema: StructType, opts: Map[String, String])
      extends Table with SupportsRead
      with org.apache.spark.sql.connector.catalog.SupportsWrite
      with org.apache.spark.sql.connector.catalog.SupportsDelete {
    /** SQL `DELETE FROM <catalog>.<store> WHERE <pred>` — the takedown
      * that justifies the DV tier, reachable from plain SQL: victims
      * are resolved through the stats/bloom pruner (or the standing
      * [[graft.plans.DocIndex]] for doc_id-only predicates when the
      * `docindex` option names one) and committed SIDECAR-ONLY
      * ([[Snapshots.commitRemove]]) — no split is rewritten, readers
      * pinned to prior versions are untouched. Only fully-translatable
      * predicates are accepted ([[toColumn]]); Spark refuses the
      * statement otherwise rather than silently deleting the wrong
      * rows. */
    override def canDeleteWhere(filters: Array[Filter]): Boolean =
      filters.forall(f => toColumn(f).nonEmpty)
    override def deleteWhere(filters: Array[Filter]): Unit =
      SnapshotSource.deleteFrom(opts, tableSchema, filters)
    override def name(): String =
      s"graft-snapshot:${t.root}" +
        t.branch.fold("")(b => s"@$b") +
        t.pin.fold("@head")(v => s"@v$v")
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      if (changeFeedRequested(opts)) {
        if (t.pin.nonEmpty)
          refuse("graft-snapshot changeFeed: versionAsOf/timestampAsOf/" +
            "tag pin a SNAPSHOT — a change feed tails the chain; " +
            "position it with startingVersion instead")
        () => new SnapshotChangeFeed.ChangeFeedScan(t.spark, t.root,
          t.branch, startingVersion(opts), endingVersion(opts), tableSchema,
          opts.get("maxversionspertrigger").map(v => v.toIntOption
            .filter(_ > 0).getOrElse(refuse(
              s"graft-snapshot: maxVersionsPerTrigger '$v' is not a " +
                "positive integer"))))
      } else new SnapshotScanBuilder(t, tableSchema)
    /** DSv2 write (`INSERT INTO` a format view, `df.write.mode(…)`),
      * delegated through [[org.apache.spark.sql.connector.write.V1Write]]
      * to the shared [[writeInto]] body — the analyzer has already
      * aligned/cast the input columns to the table schema by the time
      * the relation sees them. Truncate (mode overwrite /
      * `INSERT OVERWRITE`) maps to the contract-carrying full rewrite. */
    override def newWriteBuilder(
        info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.WriteBuilder =
      new org.apache.spark.sql.connector.write.WriteBuilder
          with org.apache.spark.sql.connector.write.SupportsTruncate {
        private var overwrite = false
        override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
          overwrite = true; this
        }
        override def build(): org.apache.spark.sql.connector.write.Write =
          new org.apache.spark.sql.connector.write.V1Write {
            override def toInsertableRelation: InsertableRelation =
              new InsertableRelation {
                override def insert(data: DataFrame, ov: Boolean): Unit =
                  writeInto(opts, data, overwrite || ov)
              }
          }
      }
  }

  private final class SnapshotScanBuilder(t: Target, tableSchema: StructType)
      extends ScanBuilder with SupportsPushDownFilters
      with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
    // ONE version per query: captured when the builder is created, so
    // every stage of this scan (pruning, count, read) sees one snapshot
    private val version = t.version
    private var pushed: Array[Filter] = Array.empty
    private var required: StructType = tableSchema
    private var manifestRow: Option[(Seq[Any], StructType)] = None

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (ok, residual) = filters.partition(f => toColumn(f).nonEmpty)
      pushed = ok
      residual
    }
    override def pushedFilters(): Array[Filter] = pushed
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    /** MANIFEST-ONLY aggregates: an unfiltered, ungrouped combination
      * of COUNT(*) / MIN(col) / MAX(col) is answered straight off the
      * version file with ZERO file IO — on a 100 TB corpus the
      * difference between a catalog lookup and a full scan for the most
      * common dashboard queries there are. COUNT is `Σ nRows − dvRows`
      * (exact under deletion vectors); MIN/MAX come from the stats
      * cells only when provably exact ([[Snapshots.manifestMinMax]]:
      * tracked column, round-trippable type, NO live deletion vectors —
      * a tombstoned row may be the extremum). Any filter, grouping,
      * other aggregate, or unanswerable min/max stands the WHOLE
      * pushdown down to the normal scan: all-or-nothing, never a
      * guessed cell. Evaluated at push time (driver-side, version-file
      * only), so the scan ships precomputed values. */
    private def tryManifest(agg: Aggregation): Option[(Seq[Any], StructType)] = {
      if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty ||
          agg.aggregateExpressions.isEmpty) return None
      def field(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[String] = e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames()(0)).filter(n =>
            tableSchema.fieldNames.contains(n))
        case _ => None
      }
      val out = agg.aggregateExpressions.toIndexedSeq.map {
        case _: CountStar =>
          (Snapshots.effectiveRowCount(t.spark, t.root, version, t.branch): Any,
            org.apache.spark.sql.types.StructField("count(*)",
              org.apache.spark.sql.types.LongType, nullable = false))
        case m: Min =>
          val c = field(m.column()).getOrElse(return None)
          val ans = Snapshots.manifestMinMax(t.spark, t.root, version,
            t.branch, c, wantMax = false).getOrElse(return None)
          (ans.orNull: Any,
            org.apache.spark.sql.types.StructField(s"min($c)",
              tableSchema(c).dataType, nullable = true))
        case m: Max =>
          val c = field(m.column()).getOrElse(return None)
          val ans = Snapshots.manifestMinMax(t.spark, t.root, version,
            t.branch, c, wantMax = true).getOrElse(return None)
          (ans.orNull: Any,
            org.apache.spark.sql.types.StructField(s"max($c)",
              tableSchema(c).dataType, nullable = true))
        case _ => return None
      }
      Some((out.map(_._1), StructType(out.map(_._2))))
    }

    override def supportCompletePushDown(agg: Aggregation): Boolean =
      tryManifest(agg).nonEmpty
    override def pushAggregation(agg: Aggregation): Boolean = {
      manifestRow = tryManifest(agg)
      manifestRow.nonEmpty
    }

    override def build(): Scan = manifestRow match {
      case Some((values, schema)) =>
        new ManifestAggScan(version, values, schema)
      case None => new SnapshotV1Scan(t, version, pushed, required)
    }
  }

  /** The pushed manifest-aggregate scan: one precomputed row, straight
    * off the version file. The read schema is the AGGREGATION's output
    * shape — Spark matches it positionally against the pushed
    * aggregate's expected schema. */
  private final class ManifestAggScan(version: Int, values: Seq[Any],
      aggSchema: StructType) extends V1Scan {
    override def readSchema(): StructType = aggSchema
    override def toV1TableScan[R <: BaseRelation with TableScan](
        context: SQLContext): R =
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = aggSchema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          context.sparkContext.parallelize(
            Seq(org.apache.spark.sql.Row(values: _*)), 1)
      }.asInstanceOf[R]
    override def description(): String =
      s"graft-snapshot v$version manifest-agg [${aggSchema.fieldNames.mkString(", ")}]"
  }

  /** The scan as a [[V1Scan]]: Spark plans it as a row-source scan with
    * the pushed filters visible in `explain` (`PushedFilters: [...]`),
    * and the body delegates to [[scanFrame]] — every stats/bloom/DV
    * behavior the Scala API has, none re-implemented. */
  private final class SnapshotV1Scan(t: Target, version: Int,
      pushed: Array[Filter], required: StructType) extends V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[R <: BaseRelation with TableScan](
        context: SQLContext): R =
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = required
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          scanFrame(t, version, pushed.toIndexedSeq,
            required.fieldNames.toIndexedSeq).rdd
      }.asInstanceOf[R]
    override def description(): String =
      s"graft-snapshot v$version pushed=[${pushed.mkString(", ")}]"
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      refuse("graft-snapshot: streaming reads serve the row-level " +
        "CHANGE FEED — add .option(\"changeFeed\", \"true\") (rows " +
        "arrive as change/…/_version, positioned with startingVersion); " +
        "a plain snapshot is a batch read")
  }

  // ---- v1 relation (SQL `USING` path) ------------------------------------

  /** NOTE on schema lifetime: a `CREATE TEMPORARY VIEW … USING` view
    * pins its SCHEMA at creation (`schema` below is a val — Spark's v1
    * relation contract resolves it once), while its CONTENT tracks the
    * head when unpinned. A widening commit after view creation serves
    * rows through the old column set until the view is recreated; the
    * CATALOG door ([[graft.sources.SnapshotCatalog]]) is immune — it
    * re-infers the schema on every `loadTable`. Delta's USING views
    * behave identically; recreate the view (or use the catalog) after
    * a schema-widening commit. */
  private[sources] final class SnapshotRelation(context: SQLContext,
      t: Target, opts: Map[String, String])
      extends BaseRelation with PrunedFilteredScan with InsertableRelation {
    override def sqlContext: SQLContext = context
    override val schema: StructType =
      Snapshots.readAt(t.spark, t.root, t.version, t.branch).schema
    override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
      filters.filter(f => toColumn(f).isEmpty)
    override def buildScan(requiredColumns: Array[String],
        filters: Array[Filter]): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
      // version resolved PER SCAN: an unpinned view tracks the head
      scanFrame(t, t.version, filters.toIndexedSeq,
        requiredColumns.toIndexedSeq).rdd
    /** SQL `INSERT INTO` / `INSERT OVERWRITE` on a front-door view:
      * columns arrive POSITIONALLY (SQL insert semantics) — realigned
      * to the store's names, then the shared write body commits a delta
      * (or a contract-carrying full rewrite). Version-pinned views
      * refuse inside [[writeInto]]: a historical read is not a write
      * target. NOTE: a `commitTag` baked into the VIEW's options
      * applies to EVERY insert through it — the second distinct insert
      * would be ledger-skipped as a redelivery. Put commitTag on
      * per-write `DataFrameWriter.option(…)` calls, not on views. */
    override def insert(data: DataFrame, overwrite: Boolean): Unit =
      writeInto(opts, data.toDF(schema.fieldNames.toIndexedSeq: _*),
        overwrite)
  }
}
