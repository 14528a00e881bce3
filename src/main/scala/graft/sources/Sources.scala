package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.2): the reference's multi-format goal
  * (DB ⇄ JSON ⇄ Excel ⇄ CSV, reference: documentation/doc-01.md:109-115)
  * mapped onto Spark's native readers/writers. Parquet is the primary
  * analytical format (TESTDATA.md); CSV/JSON are interchange formats; JDBC
  * mirrors the reference's H2-via-Slick source (sample/commonSlick/.../
  * Helper.scala:13-17). Excel stays out of scope (third-party library;
  * SURVEY §7.4).
  *
  * All readers accept an explicit schema — schema-on-read is what makes the
  * reference's schema-less `SimpleTable` declarations (Models.scala:26-34)
  * work against arbitrary files.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** `multiLine = true` (the DEFAULT here, unlike Spark's) is REQUIRED to
    * round-trip text containing embedded newlines: [[writeCsv]] quotes
    * them, but a multiLine=false read splits records on the raw newline
    * BEFORE CSV parsing — two silently-malformed rows, no error. Callers
    * reading machine-generated newline-free CSV can pass false to get the
    * splittable-scan fast path back. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, multiLine: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString)
      .option("multiLine", multiLine.toString).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** PERMISSIVE JSON ingestion with corrupt-record QUARANTINE: rows that
    * fail to parse land with the raw line in `_corrupt_record` and null
    * data columns instead of killing the job — the ingestion-robustness
    * posture a crawl pipeline needs (a single mangled line in a
    * terabyte JSONL drop must cost one quarantined row, not the batch).
    * The caller splits on `_corrupt_record IS NOT NULL`: clean rows flow
    * on, quarantined lines go to a dead-letter sink for re-crawl.
    * Requires the corrupt column declared in the schema (Spark drops it
    * otherwise). CAVEAT for the dead-letter write: Spark refuses a query
    * over raw JSON whose only referenced column is the internal corrupt
    * column — reference at least one data column alongside it (or
    * `.cache()` the frame first) when dumping the quarantine. */
  def readJsonQuarantine(
      spark: SparkSession, path: String, dataSchema: StructType): DataFrame = {
    // idempotent for schemas that already carry the quarantine column
    // (e.g. re-reading a previously quarantined dump) — a blind add would
    // fail the read with a duplicate column
    val withCorrupt =
      if (dataSchema.fieldNames.contains("_corrupt_record")) dataSchema
      else dataSchema
        .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** ORC — the second columnar format Spark ships natively: same scan
    * machinery as parquet (column pruning, predicate pushdown, partition
    * pruning all apply; SourcesSpec asserts the pushdown). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** JDBC scan with predicate pushdown + partitioned parallel read — the
    * Spark-native replacement for the reference's Slick/H2 source.
    * Round-trip tested against the embedded Derby engine that ships on the
    * Spark classpath (SourcesSpec). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned parallel JDBC scan: `numPartitions` concurrent range
    * queries over `[lower, upper]` of a numeric column — the shape that
    * matters when the relational source is large enough that one
    * connection would serialize the read. Predicates still push down into
    * each range query (asserted in SourcesSpec). */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions, props)

  /** DB write-back INSERT (reference CRUD surface, doc-01.md:156):
    * append/overwrite via the stock JDBC writer. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: String = "append",
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Row-level UPDATE-or-INSERT by key (the reference's `SlickCRUDImplicits`
    * update surface, sample/commonSlick/.../Sample05.scala:15, re-expressed
    * for a bulk engine): existing rows whose key collides with `updates` are
    * replaced, others kept.
    *
    * Scale shape: the merge is a distributed anti-join ∪ union written to a
    * STAGING table, then a driver-side DROP+RENAME swap — never a
    * driver-side collect, and never an overwrite of the table the merge is
    * still reading from (which would truncate the input mid-plan).
    *
    * Swap caveats: the two DDL statements run in ONE transaction, which is
    * genuinely atomic on engines with transactional DDL (Derby, Postgres —
    * the rename statement is dialect-selected, `ALTER TABLE … RENAME TO`
    * there); on engines that auto-commit DDL (MySQL, Oracle) a crash
    * between them can leave only the staging table — recover by renaming
    * it back. The rebuilt table has the JDBC writer's schema: engine-side
    * constraints, indexes and grants on the original are NOT carried over.
    *
    * Identifier handling: `table` is embedded VERBATIM into SQL text, the
    * same contract as Spark's own `dbtable` option — pass it pre-quoted
    * (`"\"My Table\""`) for case-sensitive/special names. The staging name
    * is derived quote-aware (suffix inside the caller's quotes) and
    * carries a per-run unique id, so concurrent upserts of the same table
    * can never clobber each other's staging; on a failed swap the staging
    * table is cleaned up — unless the original table no longer exists, in
    * which case staging holds the only copy of the data and is
    * deliberately left (uniquely named `*_graft_stg_*`) for manual
    * recovery. */
  def upsertJdbc(spark: SparkSession, updates: DataFrame, url: String,
      table: String, keys: Seq[String],
      props: java.util.Properties = new java.util.Properties()): Unit =
    upsertJdbcMulti(spark, Seq((table, updates, keys)), url, props)

  /** Multi-table transactional write-back (the reference's one-request-
    * several-tables surface, doc-01.md:156): every table's merge writes to
    * its own staging table first — all DISTRIBUTED work happens before any
    * DDL — then every DROP+RENAME swap runs in ONE driver-side
    * transaction, so on transactional-DDL engines (Derby, Postgres) the
    * request is atomic across tables: all of them flip to their new
    * contents or none does. Same identifier/staging/cleanup contract as
    * [[upsertJdbc]]. */
  def upsertJdbcMulti(spark: SparkSession,
      updates: Seq[(String, DataFrame, Seq[String])], url: String,
      props: java.util.Properties = new java.util.Properties()): Unit = {
    // the same table twice in one request is ambiguous (which merge wins?)
    // and, worse, on auto-commit-DDL engines the second swap iteration
    // would DROP the data the first just renamed into place — refuse
    require(updates.map(_._1).distinct.length == updates.length,
      s"upsertJdbcMulti: duplicate target tables in ${updates.map(_._1)}")

    // one metadata connection for the whole request: the identifier quote
    // string is connection-invariant, so per-table connections would be
    // pure setup overhead against a remote database
    val quote = withConnection(url, props) { conn =>
      Option(conn.getMetaData.getIdentifierQuoteString)
        .map(_.trim).filter(_.nonEmpty).getOrElse("")
    }
    // per-run unique staging suffix: a CONSTANT name would let two
    // concurrent upserts of the same table clobber each other's staging
    // mid-write and swap half-written data into place. The cost: a run
    // that crashes AFTER its sweep fails leaves a uniquely-named
    // `*_graft_stg_*` table for manual cleanup instead of being reused.
    val runId = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    def stagingNameOf(table: String): String =
      if (quote.nonEmpty && table.length > 2 * quote.length &&
          table.startsWith(quote) && table.endsWith(quote))
        table.dropRight(quote.length) + s"_graft_stg_$runId" + quote
      else table + s"_graft_stg_$runId"

    // staging phase: originals untouched, so on ANY failure here the
    // already-written staging tables are dropped unconditionally and the
    // request has had no effect
    val staged = scala.collection.mutable.ArrayBuffer[(String, String)]()
    try {
      updates.foreach { case (table, ups, keys) =>
        val existing = readJdbc(spark, url, table, props)
        val merged = existing
          .join(ups.select(keys.map(qcol): _*), keys, "left_anti")
          .unionByName(ups.select(existing.columns.map(qcol).toIndexedSeq: _*))
        // registered BEFORE the write: a staging table created by a write
        // that then dies midway must still be swept by the catch below
        val staging = stagingNameOf(table)
        staged += ((table, staging))
        merged.write.mode("overwrite").jdbc(url, staging, props)
      }
    } catch {
      case e: Throwable =>
        // best-effort sweep — a cleanup failure must never mask the
        // original error
        try {
          withConnection(url, props) { conn =>
            staged.foreach { case (_, staging) => dropQuietly(conn, staging) }
          }
        } catch { case c: Throwable => e.addSuppressed(c) }
        throw e
    }

    try {
      withConnection(url, props) { conn =>
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        try {
          staged.foreach { case (table, staging) =>
            st.executeUpdate(s"DROP TABLE $table")
            st.executeUpdate(renameSql(url, staging, table))
          }
          conn.commit()
        } catch {
          case e: Throwable =>
            // the rollback itself can fail (the swap error was likely a
            // dead connection) — that must never mask the swap error
            try conn.rollback()
            catch { case c: Throwable => e.addSuppressed(c) }
            throw e
        } finally st.close()
      }
    } catch {
      case e: Throwable =>
        // best-effort: drop stagings only where the original table still
        // exists (else staging holds the sole copy — leave for recovery);
        // a failure HERE (e.g. the DB is down, which likely caused the
        // swap failure too) must never mask the swap error
        try {
          withConnection(url, props) { conn =>
            staged.foreach { case (table, staging) =>
              if (tableExists(conn, table)) dropQuietly(conn, staging)
            }
          }
        } catch { case c: Throwable => e.addSuppressed(c) }
        throw e
    }
  }

  /** Row-level DELETE by SQL predicate (reference CRUD delete). A targeted
    * DML control statement belongs on the database, not in a scan-rewrite
    * job — this is the one place driver-side JDBC is the scalable answer.
    * Returns the deleted-row count. */
  def deleteJdbc(url: String, table: String, whereSql: String,
      props: java.util.Properties = new java.util.Properties()): Int =
    withStatement(url, props)(_.executeUpdate(s"DELETE FROM $table WHERE $whereSql"))

  /** Exactly-once batch commit into a JDBC table — the transactional
    * kernel of the streaming→RDBMS sink ([[graft.streaming.EventPipeline
    * .jdbcSinkStream]]). `foreachBatch` is AT-LEAST-ONCE: after a failure
    * the engine redelivers the last micro-batch, so an unguarded
    * `df.write.jdbc(append)` double-inserts it. This commit makes the
    * redelivery idempotent with a batch LEDGER committed in the same
    * driver-side transaction as the batch's rows:
    *
    *   1. `(queryId, batchId)` already in `ledgerTable` → the batch
    *      committed in a previous attempt; sweep any stale staging and
    *      return false (skip — the replay contract).
    *   2. Otherwise the batch lands DISTRIBUTED in a deterministic
    *      staging table (overwrite: a crashed attempt's partial staging
    *      is replaced, never appended to), then ONE driver transaction
    *      moves staging → target and inserts the ledger row. Atomic: a
    *      crash before the commit leaves target and ledger both
    *      untouched, and the replay repeats from step 2; a crash after
    *      it leaves both written, and the replay skips at step 1. The
    *      ledger's (query_id, batch_id) PRIMARY KEY backstops the
    *      protocol: even a racing duplicate commit fails the transaction
    *      instead of double-inserting.
    *
    * The target table is created from the batch schema when absent (the
    * Spark JDBC writer's append contract); the ledger is created on
    * first use. Scale shape: the distributed work (staging write) is all
    * of the data movement — the driver transaction is two INSERT
    * statements over engine-side data, so the commit cost is independent
    * of partition count; per-partition `df.write.jdbc` transactions are
    * exactly what this protocol exists to avoid trusting (each partition
    * commits separately — a mid-write crash leaves a fraction of the
    * batch in place). Identifier contract as [[upsertJdbc]]: `table` /
    * `ledgerTable` embed verbatim; `queryId` is sanitized into the
    * staging name. One foreachBatch runs at a time per query (the
    * engine's contract), so the deterministic staging name cannot be
    * clobbered concurrently by its own query. */
  def commitBatchJdbc(batch: DataFrame, url: String, table: String,
      ledgerTable: String, queryId: String, batchId: Long,
      props: java.util.Properties = new java.util.Properties()): Boolean = {
    // the LEDGER key is the full sanitized id (the identity that decides
    // skip-vs-commit — truncating it would let two queries collide and
    // silently drop each other's batches); only the STAGING NAME
    // truncates, to keep `${table}_graft_ep_${fix}_b<n>` under
    // Postgres's 63-byte identifier limit, and it carries a hash of the
    // full id so truncation-twins still stage in distinct tables
    val qid = queryId.replaceAll("[^A-Za-z0-9_]", "_").take(64)
    val stagingFix = qid.take(8) +
      java.lang.Integer.toHexString(qid.hashCode).take(8)
    val staging = s"${table}_graft_ep_${stagingFix}_b$batchId"
    val committed = withConnection(url, props) { conn =>
      if (!tableExists(conn, ledgerTable)) {
        val st = conn.createStatement()
        // race-safe: a concurrent first-use creating it between the check
        // and here surfaces as "already exists" — the table is there,
        // which is all this step needs
        try st.executeUpdate(
          s"""CREATE TABLE $ledgerTable (
             |  query_id VARCHAR(64) NOT NULL,
             |  batch_id BIGINT NOT NULL,
             |  n_rows BIGINT NOT NULL,
             |  PRIMARY KEY (query_id, batch_id))""".stripMargin): Unit
        catch { case _: java.sql.SQLException => () }
        finally st.close()
      }
      val ps = conn.prepareStatement(
        s"SELECT 1 FROM $ledgerTable WHERE query_id = ? AND batch_id = ?")
      val hit = try {
        ps.setString(1, qid); ps.setLong(2, batchId)
        val rs = ps.executeQuery()
        try rs.next() finally rs.close()
      } finally ps.close()
      if (hit) dropQuietly(conn, staging) // stale post-commit crash debris
      hit
    }
    if (committed) return false

    // distributed staging write; overwrite replaces a crashed attempt's
    // partial table rather than appending to it
    batch.write.mode("overwrite").jdbc(url, staging, props)

    withConnection(url, props) { conn =>
      // target created from the batch schema when absent — before the
      // transaction, since DDL auto-commits on some engines (the
      // upsertJdbc caveat); an empty CREATE is idempotent-safe here
      if (!tableExists(conn, table))
        batch.limit(0).write.mode("append").jdbc(url, table, props)
      val quote = Option(conn.getMetaData.getIdentifierQuoteString)
        .map(_.trim).filter(_.nonEmpty).getOrElse("")
      val cols = batch.schema.fieldNames
        .map(n => s"$quote${n.replace(quote, quote + quote)}$quote")
        .mkString(", ")
      conn.setAutoCommit(false)
      try {
        val st = conn.createStatement()
        val n = try {
          val moved = st.executeUpdate(
            s"INSERT INTO $table ($cols) SELECT $cols FROM $staging")
          val ps2 = conn.prepareStatement(
            s"INSERT INTO $ledgerTable (query_id, batch_id, n_rows) VALUES (?, ?, ?)")
          try {
            ps2.setString(1, qid); ps2.setLong(2, batchId); ps2.setLong(3, moved.toLong)
            ps2.executeUpdate(): Unit
          } finally ps2.close()
          moved
        } finally st.close()
        conn.commit()
        n: Unit
      } catch {
        case e: Throwable =>
          try conn.rollback()
          catch { case r: Throwable => e.addSuppressed(r) } // surface BOTH
          throw e
      } finally conn.setAutoCommit(true)
      // post-commit: staging is debris now; a crash before this drop is
      // swept by the replay's step-1 skip path
      dropQuietly(conn, staging)
    }
    true
  }

  /** Column reference by EXACT name — `col("a.b")` would parse as nested
    * field access, failing resolution for JDBC tables with dotted column
    * names; backticks make the name literal. */
  private def qcol(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col("`" + name.replace("`", "``") + "`")

  /** Table-rename DDL by dialect: Postgres only accepts
    * `ALTER TABLE … RENAME TO`; Derby/MySQL use `RENAME TABLE … TO …`.
    * Postgres's RENAME TO takes a BARE identifier (the table stays in its
    * schema) — a schema-qualified target like `myschema.tbl` is a syntax
    * error there, so strip any schema prefix from the target while the
    * source keeps its qualification. */
  private def renameSql(url: String, from: String, to: String): String =
    if (url.startsWith("jdbc:postgresql")) {
      val bare = to.substring(to.lastIndexOf('.') + 1)
      s"ALTER TABLE $from RENAME TO $bare"
    } else s"RENAME TABLE $from TO $to"

  private def withConnection[T](url: String, props: java.util.Properties)(
      f: java.sql.Connection => T): T = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def withStatement[T](url: String, props: java.util.Properties)(
      f: java.sql.Statement => T): T =
    withConnection(url, props) { conn =>
      val st = conn.createStatement()
      try f(st) finally st.close()
    }

  private def tableExists(conn: java.sql.Connection, table: String): Boolean =
    try {
      val st = conn.createStatement()
      try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); true }
      finally st.close()
    } catch { case _: java.sql.SQLException => false }

  private def dropQuietly(conn: java.sql.Connection, table: String): Unit =
    try {
      val st = conn.createStatement()
      try { st.executeUpdate(s"DROP TABLE $table"); () } finally st.close()
    } catch { case _: java.sql.SQLException => () }
}
