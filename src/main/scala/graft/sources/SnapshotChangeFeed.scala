package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.plans.Snapshots

/** The STREAMING half of the SQL front door: third-party jobs tail a
  * versioned corpus store's row-level change feed with
  *
  * {{{
  *   spark.readStream.format("graft-snapshot")
  *     .option("changeFeed", "true")          // required: streams ARE the CDC feed
  *     .option("startingVersion", "7")        // optional: position the tail
  *     .load(root)
  * }}}
  *
  * and no knowledge of this codebase. Rows carry `change`
  * (add/update/remove), the store's columns (`doc_id` first), and
  * `_version` (the commit that produced the change). The per-version
  * body is [[Snapshots.changesOrBootstrap]] — THE SAME implementation
  * behind [[graft.streaming.EventPipeline.snapshotChangesStream]]'s
  * foreachBatch door: a pointer-pruned diff of each new version against
  * its predecessor (only pointer-changed splits are read, never a
  * corpus scan), bootstrapping as a full snapshot of adds when the
  * predecessor file is missing (the chain's first version, or a
  * consumer positioned past a vacuum horizon).
  *
  * EXECUTION SHAPE: offsets are version numbers (the store's version
  * chain IS the write-ahead log — append-only files, published by
  * atomic rename, so "what's new" is one directory listing). At batch
  * planning the driver runs the diff as a normal distributed job and
  * STAGES its rows under the query's checkpoint location as
  * length-prefixed [[UnsafeRow]] blobs (one file per partition, written
  * by the executors — the driver never collects rows); the micro-batch
  * then reads the staged files back partition-per-file. Staging per
  * version is overwrite-idempotent, so the engine's replay of an
  * uncommitted batch after restart re-plans and re-stages exactly;
  * committed batches' staging is swept on [[ChangeFeedStream.commit]].
  * The staged-blob hop costs one extra write+read of each CHANGED row
  * (not the corpus) and buys exact restart-resume through Spark's own
  * offset log; the native
  * [[graft.streaming.EventPipeline.snapshotChangesStream]] stays the
  * zero-copy lane when the consumer can take parquet directories.
  *
  * CAVEATS (documented contract): the feed's schema is pinned when the
  * query starts — restart the stream after a schema-widening commit to
  * see new columns (versions written before the widening null-fill
  * them, exactly like [[Snapshots.changesBetween]]); and a vacuum that
  * outruns an UNCOMMITTED batch's replay window turns that batch's
  * diff into a bootstrap on restart (the retention contract — size
  * retention above every replaying consumer). */
object SnapshotChangeFeed {

  /** Reserved output columns. A store whose schema already uses one of
    * these cannot serve an unambiguous feed and refuses. */
  private val ChangeCol = "change"
  private val VersionCol = "_version"

  /** The feed's schema for a store schema: change, doc_id, payload
    * columns in store order, _version. */
  def cdcSchema(store: StructType): StructType = {
    Seq(ChangeCol, VersionCol).foreach { n =>
      if (store.fieldNames.contains(n))
        SnapshotSource.refuse(s"graft-snapshot changeFeed: the store " +
          s"schema already has a column named '$n' — the feed reserves " +
          "it; rename the store column")
    }
    if (!store.fieldNames.contains("doc_id"))
      SnapshotSource.refuse("graft-snapshot changeFeed: the store " +
        "schema has no doc_id column")
    StructType(
      StructField(ChangeCol, StringType, nullable = false) +:
        store("doc_id") +:
        store.fields.filterNot(_.name == "doc_id").toIndexedSeq :+
        StructField(VersionCol, IntegerType, nullable = false))
  }

  /** A position in the version chain: everything ≤ `version` has been
    * emitted. */
  final case class VersionOffset(version: Int) extends Offset {
    override def json(): String = s"""{"version":$version}"""
  }

  private[sources] def parseOffset(json: String): VersionOffset =
    VersionOffset("""-?\d+""".r.findFirstIn(json).getOrElse(
      SnapshotSource.refuse(
        s"graft-snapshot changeFeed: unreadable offset '$json'")).toInt)

  /** The change-feed Scan, serving BOTH executions:
    *   - STREAMING (`spark.readStream`): the version-chain
    *     [[ChangeFeedStream]];
    *   - BATCH (`spark.read` — the table_changes/CDF shape): the
    *     per-version feeds of every LIVE version in
    *     `[startingVersion, endingVersion]` (defaults: the earliest
    *     live version, the head) unioned into one frame, served as a
    *     [[org.apache.spark.sql.sources.TableScan]] — each version's
    *     rows still come from the ONE shared pointer-pruned CDC body,
    *     so a year of daily single-split deltas reads one split per
    *     version, never the corpus per version. */
  final class ChangeFeedScan(spark: SparkSession, root: String,
      branch: Option[String], startingVersion: Option[Int],
      endingVersion: Option[Int], schema: StructType,
      maxVersionsPerTrigger: Option[Int] = None)
      extends org.apache.spark.sql.connector.read.V1Scan {
    override def readSchema(): StructType = schema
    override def description(): String =
      s"graft-snapshot change feed of $root" +
        branch.fold("")(b => s"@$b") +
        startingVersion.fold("")(v => s" from v$v") +
        endingVersion.fold("")(v => s" to v$v")

    /** The batch CDF frame — resolved lazily so a purely-streaming scan
      * never lists the chain twice. */
    private def batchFrame(): org.apache.spark.sql.DataFrame = {
      val from = startingVersion.getOrElse(
        Snapshots.earliestLiveVersion(spark, root, branch))
      val to = endingVersion.getOrElse(
        Snapshots.latestVersion(spark, root, branch))
      if (from < 1 || to < from)
        SnapshotSource.refuse(s"graft-snapshot changeFeed: empty or " +
          s"invalid version range [$from, $to] — startingVersion must " +
          "be ≥ 1 and ≤ endingVersion (default: earliest live … head)")
      val frames = (from to to).filter(v =>
          Snapshots.versionFileExists(spark, root, v, branch))
        .map { v =>
          val raw = Snapshots.changesOrBootstrap(spark, root, v, branch)
          raw.select(schema.fields.toIndexedSeq.map { f =>
            if (f.name == VersionCol) lit(v).cast(IntegerType).as(VersionCol)
            else if (raw.columns.contains(f.name)) col(f.name).cast(f.dataType)
            else lit(null).cast(f.dataType).as(f.name)
          }: _*)
        }
      if (frames.isEmpty)
        SnapshotSource.refuse(s"graft-snapshot changeFeed: no live " +
          s"version in [$from, $to] at $root — the range may have been " +
          "vacuumed (the retention contract)")
      frames.reduce(_ unionAll _)
    }

    override def toV1TableScan[R <: org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan](
        context: org.apache.spark.sql.SQLContext): R =
      new org.apache.spark.sql.sources.BaseRelation
          with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: org.apache.spark.sql.SQLContext = context
        override def schema: StructType = ChangeFeedScan.this.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          batchFrame().rdd
      }.asInstanceOf[R]

    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
      if (endingVersion.nonEmpty)
        SnapshotSource.refuse("graft-snapshot changeFeed: endingVersion " +
          "bounds a BATCH read of the feed — a stream tails the head; " +
          "drop it (position the start with startingVersion)")
      new ChangeFeedStream(spark, root, branch, startingVersion, schema,
        checkpointLocation, maxVersionsPerTrigger)
    }
  }

  final class ChangeFeedStream(spark: SparkSession, root: String,
      branch: Option[String], startingVersion: Option[Int],
      schema: StructType, checkpointLocation: String,
      maxVersionsPerTrigger: Option[Int] = None)
      extends MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

    private val staging = s"$checkpointLocation/graft-staged"

    /** ADMISSION CONTROL (`maxVersionsPerTrigger`): after a long
      * consumer outage the chain may be hundreds of versions ahead —
      * capping versions-per-batch bounds each batch's staging
      * footprint and commit-to-commit recovery granularity, exactly
      * Delta's maxFilesPerTrigger shape. `maxRows` carries the VERSION
      * cap here (this source's own limit round-trips only to itself). */
    override def getDefaultReadLimit
        : org.apache.spark.sql.connector.read.streaming.ReadLimit =
      maxVersionsPerTrigger.fold(
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())(
        n => org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(n.toLong))

    override def latestOffset(start: Offset,
        limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
      val head = latestOffset().asInstanceOf[VersionOffset].version
      val a = start.asInstanceOf[VersionOffset].version
      limit match {
        case mr: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
          VersionOffset(math.min(head, a + mr.maxRows().toInt))
        case _ => VersionOffset(head)
      }
    }

    override def reportLatestOffset(): Offset = latestOffset()

    private def fs(p: org.apache.hadoop.fs.Path) =
      p.getFileSystem(spark.sessionState.newHadoopConf())

    override def initialOffset(): Offset = VersionOffset(
      startingVersion.map(_ - 1).getOrElse {
        math.max(0, Snapshots.earliestLiveVersion(spark, root, branch) - 1)
      })

    override def latestOffset(): Offset = VersionOffset(
      math.max(Snapshots.latestVersion(spark, root, branch),
        initialOffset().asInstanceOf[VersionOffset].version))

    override def deserializeOffset(json: String): Offset = parseOffset(json)

    override def planInputPartitions(start: Offset,
        end: Offset): Array[InputPartition] = {
      val a = start.asInstanceOf[VersionOffset].version
      val b = end.asInstanceOf[VersionOffset].version
      ((a + 1) to b).flatMap(stageVersion).toArray
    }

    /** Run version `v`'s diff as a distributed job and stage the rows
      * as one blob file per partition (executor-side writes through
      * the session's Hadoop conf). Overwrite-idempotent per version —
      * a replayed batch re-stages byte-compatibly. Returns one
      * partition per staged file; no listing, so a torn earlier
      * attempt can never leak half a batch. */
    private def stageVersion(v: Int): Seq[InputPartition] = {
      val raw = Snapshots.changesOrBootstrap(spark, root, v, branch)
      // project to the query's PINNED schema: versions committed before
      // a widening null-fill the new columns; _version stamps the commit
      val out = raw.select(schema.fields.toIndexedSeq.map { f =>
        if (f.name == VersionCol) lit(v).cast(IntegerType).as(VersionCol)
        else if (raw.columns.contains(f.name)) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
      val dir = s"$staging/v$v"
      val dirP = new org.apache.hadoop.fs.Path(dir)
      fs(dirP).delete(dirP, true): Unit
      fs(dirP).mkdirs(dirP): Unit
      val hconf = new SerializableConfiguration(
        spark.sessionState.newHadoopConf())
      val sch = out.schema
      val rdd = out.queryExecution.toRdd
      val n = rdd.getNumPartitions
      rdd.mapPartitionsWithIndex { (i, it) =>
        val proj = UnsafeProjection.create(sch)
        val path = new org.apache.hadoop.fs.Path(s"$dir/part-$i.bin")
        val os = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          path.getFileSystem(hconf.value).create(path, true), 1 << 16))
        var rows = 0L
        while (it.hasNext) {
          val u = proj(it.next())
          os.writeInt(u.getSizeInBytes)
          u.writeToStream(os, null)
          rows += 1
        }
        os.writeInt(-1)
        os.close()
        Iterator.single(rows)
      }.count(): Unit
      (0 until n).map(i =>
        StagedFilePartition(s"$dir/part-$i.bin", sch.length): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new StagedReaderFactory(new SerializableConfiguration(
        spark.sessionState.newHadoopConf()))

    /** A committed batch's staging is dead weight (restart replays only
      * UNcommitted batches, re-staging them at plan time): sweep it. */
    override def commit(end: Offset): Unit = {
      val b = end.asInstanceOf[VersionOffset].version
      val p = new org.apache.hadoop.fs.Path(staging)
      val f = fs(p)
      if (f.exists(p))
        f.listStatus(p).foreach { st =>
          st.getPath.getName.stripPrefix("v").toIntOption.foreach { v =>
            if (v <= b) f.delete(st.getPath, true): Unit
          }
        }
    }

    override def stop(): Unit = ()
  }

  /** One staged blob file = one input partition. */
  final case class StagedFilePartition(path: String, numFields: Int)
      extends InputPartition

  /** Streams length-prefixed [[UnsafeRow]]s back off a staged file —
    * rows enter the query as-is, no decode beyond the length framing. */
  final class StagedReaderFactory(conf: SerializableConfiguration)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val sp = p.asInstanceOf[StagedFilePartition]
      new PartitionReader[InternalRow] {
        private val path = new org.apache.hadoop.fs.Path(sp.path)
        private val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(
            path.getFileSystem(conf.value).open(path), 1 << 16))
        private val row = new UnsafeRow(sp.numFields)
        private var buf: Array[Byte] = Array.empty
        private var done = false
        override def next(): Boolean =
          if (done) false
          else {
            val size = in.readInt()
            if (size < 0) { done = true; false }
            else {
              if (buf.length < size) buf = new Array[Byte](size)
              in.readFully(buf, 0, size)
              row.pointTo(buf, size)
              true
            }
          }
        override def get(): InternalRow = row
        override def close(): Unit = in.close()
      }
    }
  }
}
