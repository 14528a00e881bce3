package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider, TableScan}
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
  * main-chain concepts). Version resolution happens at load time and
  * PINS the scan: commits racing the query cannot move it.
  */
class SnapshotSource extends TableProvider with RelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  // ---- DataSourceV2 ------------------------------------------------------

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val t = SnapshotSource.resolve(SnapshotSource.optionMap(options))
    Snapshots.readAt(t.spark, t.root, t.version, t.branch).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SnapshotSource.SnapshotTable(
      SnapshotSource.resolve(SnapshotSource.optionMap(
        new CaseInsensitiveStringMap(properties))), schema)

  // ---- DataSource v1 (SQL `USING` path) ----------------------------------

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val t = SnapshotSource.resolve(
      parameters.map { case (k, v) =>
        k.toLowerCase(java.util.Locale.ROOT) -> v })
    new SnapshotSource.SnapshotRelation(sqlContext, t)
  }
}

object SnapshotSource {

  /** A fully-resolved read target: the version is pinned at load time. */
  private[sources] final case class Target(spark: SparkSession, root: String,
      version: Int, branch: Option[String])

  private def optionMap(options: CaseInsensitiveStringMap): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    options.asCaseSensitiveMap().asScala.toMap
      .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
  }

  private def refuse(msg: String): Nothing =
    throw graft.core.GraftAnalysisException(Seq(msg))

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
    val pins = Seq("versionasof", "timestampasof", "tag").filter(opts.contains)
    if (pins.length > 1)
      refuse(s"graft-snapshot: options ${pins.mkString(", ")} are mutually " +
        "exclusive — pin the version one way")
    if (branch.nonEmpty && (opts.contains("timestampasof") || opts.contains("tag")))
      refuse("graft-snapshot: timestampAsOf and tag resolve through " +
        "main-chain stamps/ledger — combine branch only with versionAsOf")
    val version = opts.get("versionasof") match {
      case Some(v) =>
        v.toIntOption.getOrElse(
          refuse(s"graft-snapshot: versionAsOf '$v' is not an integer"))
      case None => opts.get("timestampasof") match {
        case Some(ts) =>
          Snapshots.versionAsOf(spark, root, parseTimestamp(ts))
        case None => opts.get("tag") match {
          case Some(t) => Snapshots.versionForTag(spark, root, t).getOrElse(
            refuse(s"graft-snapshot: no commit tagged '$t' at $root"))
          case None =>
            val head = Snapshots.latestVersion(spark, root, branch)
            if (head < 1)
              refuse(s"graft-snapshot: no committed version at $root" +
                branch.fold("")(b => s" on branch '$b'"))
            head
        }
      }
    }
    Target(spark, root, version, branch)
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
  private[sources] def scanFrame(t: Target, pushed: Seq[Filter],
      requiredColumns: Seq[String]): DataFrame = {
    val pred = pushed.flatMap(toColumn).reduceOption(_ && _)
    val base = pred match {
      case Some(p) => Snapshots.readAtWhere(t.spark, t.root, t.version, p, t.branch)
      case None => Snapshots.readAt(t.spark, t.root, t.version, t.branch)
    }
    base.select(requiredColumns.map(n => col(s"`$n`")): _*)
  }

  // ---- DSv2 table / scan -------------------------------------------------

  private[sources] final class SnapshotTable(t: Target,
      tableSchema: StructType) extends Table with SupportsRead {
    override def name(): String =
      s"graft-snapshot:${t.root}" +
        t.branch.fold("")(b => s"@$b") + s"@v${t.version}"
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new SnapshotScanBuilder(t, tableSchema)
  }

  private final class SnapshotScanBuilder(t: Target, tableSchema: StructType)
      extends ScanBuilder with SupportsPushDownFilters
      with SupportsPushDownRequiredColumns {
    private var pushed: Array[Filter] = Array.empty
    private var required: StructType = tableSchema

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (ok, residual) = filters.partition(f => toColumn(f).nonEmpty)
      pushed = ok
      residual
    }
    override def pushedFilters(): Array[Filter] = pushed
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new SnapshotV1Scan(t, pushed, required)
  }

  /** The scan as a [[V1Scan]]: Spark plans it as a row-source scan with
    * the pushed filters visible in `explain` (`PushedFilters: [...]`),
    * and the body delegates to [[scanFrame]] — every stats/bloom/DV
    * behavior the Scala API has, none re-implemented. */
  private final class SnapshotV1Scan(t: Target, pushed: Array[Filter],
      required: StructType) extends V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[R <: BaseRelation with TableScan](
        context: SQLContext): R =
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = required
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          scanFrame(t, pushed.toIndexedSeq, required.fieldNames.toIndexedSeq).rdd
      }.asInstanceOf[R]
    override def description(): String =
      s"graft-snapshot v${t.version} pushed=[${pushed.mkString(", ")}]"
  }

  // ---- v1 relation (SQL `USING` path) ------------------------------------

  private[sources] final class SnapshotRelation(context: SQLContext, t: Target)
      extends BaseRelation with PrunedFilteredScan {
    override def sqlContext: SQLContext = context
    override val schema: StructType =
      Snapshots.readAt(t.spark, t.root, t.version, t.branch).schema
    override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
      filters.filter(f => toColumn(f).isEmpty)
    override def buildScan(requiredColumns: Array[String],
        filters: Array[Filter]): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
      scanFrame(t, filters.toIndexedSeq, requiredColumns.toIndexedSeq).rdd
  }
}
