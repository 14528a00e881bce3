package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.plans.Snapshots

/** The CATALOG half of the SQL front door: registers a warehouse
  * directory of [[Snapshots]] stores as a Spark catalog, so the query a
  * lakehouse user actually types —
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.SnapshotCatalog
  *   spark.sql.catalog.graft.root = /warehouse/of/stores
  *
  *   SELECT … FROM graft.corpus VERSION AS OF 5
  *   SELECT … FROM graft.corpus TIMESTAMP AS OF '2026-08-01T00:00:00Z'
  *   INSERT INTO graft.corpus VALUES (…)
  *   DELETE FROM graft.corpus WHERE doc_id IN (7, 21)
  *   SHOW TABLES IN graft
  * }}}
  *
  * — works with no knowledge of this codebase: Spark's native
  * `VERSION AS OF` / `TIMESTAMP AS OF` syntax routes through
  * [[loadTable]]'s time-travel overloads into the store's pinned reads,
  * and every table is the same [[SnapshotSource.SnapshotTable]] the
  * format path serves (manifest pruning, DV anti-joins, pushed
  * COUNT(*), V1Write commits — one implementation, three SQL doors).
  *
  * A TABLE is any direct child directory of `root` holding a committed
  * version chain (`_versions/v1.list`). The catalog is deliberately
  * READ/APPEND-shaped: `CREATE TABLE` / `DROP TABLE` / `ALTER TABLE`
  * refuse with guidance — creating a store means choosing its
  * stats/constraint contract (`Snapshots.commitFull`), deleting one is
  * a retention decision ([[Snapshots.vacuum]] / filesystem ops), and
  * the schema evolves by widening commits, not DDL.
  */
class SnapshotCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _
  private var docIndexFor: Map[String, String] = Map.empty

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("root")).getOrElse(
      throw graft.core.GraftAnalysisException(Seq(
        s"catalog '$name': set spark.sql.catalog.$name.root to the " +
          "warehouse directory whose children are snapshot stores")))
    // spark.sql.catalog.<name>.docindex.<table> = <DocIndex root>:
    // names the standing doc_id → split index a `DELETE FROM
    // <name>.<table> WHERE doc_id IN (…)` resolves victims through
    // (index cost, zero corpus scan) instead of the pruned scan
    import scala.jdk.CollectionConverters._
    docIndexFor = options.asCaseSensitiveMap().asScala.toMap
      .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
      .collect { case (k, v) if k.startsWith("docindex.") =>
        k.stripPrefix("docindex.") -> v }
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** The store root for an identifier — single-part names only, and the
    * name must stay INSIDE the warehouse (a path-traversal table name
    * must not escape it). */
  private def rootFor(ident: Identifier): String = {
    if (ident.namespace.nonEmpty || ident.name.contains("/") ||
        ident.name.contains("\\") || ident.name == ".." || ident.name == ".")
      throw new NoSuchTableException((ident.namespace :+ ident.name).toIndexedSeq)
    s"$warehouse/${ident.name}"
  }

  private def isStore(root: String): Boolean =
    Snapshots.latestVersion(spark, root) >= 1

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) return Array.empty
    val p = new org.apache.hadoop.fs.Path(warehouse)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => isStore(s"$warehouse/$n")).sorted
      .map(n => Identifier.of(Array.empty, n))
  }

  override def tableExists(ident: Identifier): Boolean =
    try isStore(rootFor(ident))
    catch { case _: NoSuchTableException => false }

  /** The DocIndex root configured for a table, if any. Checked LIVE
    * against the session conf first (catalog instances cache per
    * session — a `docindex.<table>` conf set after first use must
    * still apply), falling back to the initialize-time options. */
  private def docIndexOpt(ident: Identifier): Option[String] = {
    val key = s"spark.sql.catalog.$catalogName.docindex.${ident.name}"
    spark.conf.getOption(key)
      .orElse(docIndexFor.get(
        ident.name.toLowerCase(java.util.Locale.ROOT)))
  }

  private def tableAt(ident: Identifier, pin: Option[Int]): Table = {
    val root = rootFor(ident)
    if (!isStore(root)) throw new NoSuchTableException((ident.namespace :+ ident.name).toIndexedSeq)
    val t = SnapshotSource.Target(spark, root, pin, branch = None)
    val opts = Map("path" -> root) ++
      pin.map(v => SnapshotSource.VersionAsOfKey -> v.toString) ++
      docIndexOpt(ident).map("docindex" -> _)
    new SnapshotSource.SnapshotTable(t,
      Snapshots.readAt(spark, root, t.version).schema, opts)
  }

  override def loadTable(ident: Identifier): Table = tableAt(ident, None)

  /** `VERSION AS OF <v>` — Spark hands the version verbatim. */
  override def loadTable(ident: Identifier, version: String): Table =
    tableAt(ident, Some(version.toIntOption.getOrElse(
      throw graft.core.GraftAnalysisException(Seq(
        s"catalog '$catalogName': VERSION AS OF '$version' is not a " +
          s"snapshot-store version number (an integer)")))))

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch;
    * resolved through the store's monotonized commit stamps. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = rootFor(ident)
    if (!isStore(root)) throw new NoSuchTableException((ident.namespace :+ ident.name).toIndexedSeq)
    tableAt(ident,
      Some(Snapshots.versionAsOf(spark, root, timestampMicros / 1000L)))
  }

  override def createTable(ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    throw graft.core.GraftAnalysisException(Seq(
      s"catalog '$catalogName' does not CREATE stores — a new corpus " +
        "store's stats/bloom/constraint contract is the owning " +
        "pipeline's choice: seed it with Snapshots.commitFull at " +
        s"$warehouse/${ident.name}, after which it appears here"))

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw graft.core.GraftAnalysisException(Seq(
      s"catalog '$catalogName' does not ALTER stores — the schema " +
        "evolves by widening commits (new nullable columns on a delta), " +
        "never by DDL"))

  override def dropTable(ident: Identifier): Boolean =
    throw graft.core.GraftAnalysisException(Seq(
      s"catalog '$catalogName' does not DROP stores — deleting a corpus " +
        "is a retention decision: vacuum it, or remove the directory " +
        "with filesystem tooling"))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw graft.core.GraftAnalysisException(Seq(
      s"catalog '$catalogName' does not RENAME stores — move the store " +
        "directory with filesystem tooling (readers resolve by path)"))
}
