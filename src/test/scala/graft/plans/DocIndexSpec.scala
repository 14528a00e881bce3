package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the CDC-maintained doc_id → split index: lifecycle
  * (materialize/refresh/resolve/removeByIds), cross-split moves,
  * stale-index refusal, refresh idempotence across redelivery and
  * vacuum, and the bucket-bounded refresh IO (corruption-proven). */
class DocIndexSpec extends SparkTestBase {

  private def freshRoot(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_docidx")

  private def doc(id: Long, split: String, text: String) =
    (id, split, text, text.length.toLong)

  private def df(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "split", "text", "n_tokens")
  }

  private val noRm = df(Nil).select(col("split"), col("doc_id"))

  private def indexMap(idx: String): Map[Long, String] =
    DocIndex.read(spark, idx.toString)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("materialize → refresh tracks adds, removals and cross-split moves") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "d1", "one"), doc(2, "d2", "two"))), root.toString)
      assert(DocIndex.materialize(spark, root.toString, idx.toString) === 1)
      assert(indexMap(idx.toString) === Map(1L -> "d1", 2L -> "d2"))

      // v2: add 3, MOVE 1 from d1 to d3, remove 2
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "d2", "three"), doc(1, "d3", "one"))),
        removedIds = df(Seq(doc(1, "d1", "x"), doc(2, "d2", "x")))
          .select(col("split"), col("doc_id")))
      assert(DocIndex.refresh(spark, root.toString, idx.toString) === 2)
      assert(indexMap(idx.toString) === Map(1L -> "d3", 3L -> "d2"))
      assert(DocIndex.indexedVersion(spark, idx.toString) === 2)

      // resolve answers split-keyed pairs; absent ids just don't resolve
      import spark.implicits._
      val resolved = DocIndex.resolveSplits(spark, root.toString,
          idx.toString, Seq(1L, 99L).toDF("doc_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(resolved === Set(("d3", 1L)))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  test("resolving against a stale index refuses; removeByIds is a sidecar-only takedown") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "d1", "one"), doc(2, "d2", "two"))), root.toString)
      DocIndex.materialize(spark, root.toString, idx.toString): Unit
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "d1", "three"))), removedIds = noRm)
      import spark.implicits._
      val e = intercept[graft.core.GraftAnalysisException] {
        DocIndex.resolveSplits(spark, root.toString, idx.toString,
          Seq(1L).toDF("doc_id"))
      }
      assert(e.getMessage.contains("refresh the index first"), e.getMessage)
      DocIndex.refresh(spark, root.toString, idx.toString): Unit

      val v3 = DocIndex.removeByIds(spark, root.toString, idx.toString,
        Seq(1L, 3L).toDF("doc_id"))
      assert(v3 === 3)
      val v3Data = Option(root.toFile.listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("v3-") &&
          !f.getName.endsWith("-dv"))
      assert(v3Data.isEmpty, "an indexed takedown must write no split data")
      assert(Snapshots.readAt(spark, root.toString, 3)
        .collect().map(_.getLong(0)).toSet === Set(2L))
      // the index catches up and mirrors the head
      DocIndex.refresh(spark, root.toString, idx.toString): Unit
      assert(indexMap(idx.toString) === Map(2L -> "d2"))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  test("refresh is idempotent per corpus version and survives an index vacuum") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "d1", "one"))), root.toString)
      DocIndex.materialize(spark, root.toString, idx.toString): Unit
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(2, "d1", "two"))), removedIds = noRm)
      assert(DocIndex.refresh(spark, root.toString, idx.toString) === 2)
      val chainLen = Snapshots.latestVersion(spark, idx.toString)
      // a redelivered refresh answers from the tag ledger: no new commit
      assert(DocIndex.refresh(spark, root.toString, idx.toString) === 2)
      assert(Snapshots.latestVersion(spark, idx.toString) === chainLen)
      // vacuum the index store hard; the meta marker still answers and
      // the next corpus commit still refreshes incrementally
      Snapshots.vacuum(spark, idx.toString, keepLast = 1): Unit
      assert(DocIndex.indexedVersion(spark, idx.toString) === 2)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "d2", "three"))), removedIds = noRm)
      assert(DocIndex.refresh(spark, root.toString, idx.toString) === 3)
      assert(indexMap(idx.toString) ===
        Map(1L -> "d1", 2L -> "d1", 3L -> "d2"))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  test("a refresh rewrites ONLY the buckets holding changed doc_ids (corruption-proven)") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      // 200 docs spread across the index's hash buckets
      val seed = (1L to 200L).map(k => doc(k, s"d${k % 5}", s"t$k"))
      Snapshots.commitFull(spark, df(seed), root.toString)
      DocIndex.materialize(spark, root.toString, idx.toString): Unit
      // one changed doc — find its index bucket with the SAME hash expr
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(7, "d2", "moved"))),
        removedIds = df(Seq(doc(7, "d2", "x")))
          .select(col("split"), col("doc_id")))
      val bucket = spark.range(1).select(concat(lit("b"),
          pmod(abs(hash(lit(7L))), lit(DocIndex.buckets(spark))).cast("string")))
        .collect()(0).getString(0)
      // corrupt EVERY index bucket except the changed doc's — a refresh
      // that read any other bucket would fail
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val victims = walk(idx.toFile).filter(f =>
        f.getName.endsWith(".parquet") &&
          f.getAbsolutePath.contains("split=") &&
          !f.getAbsolutePath.contains(s"split=$bucket/"))
      assert(victims.nonEmpty)
      victims.foreach(f => java.nio.file.Files.write(f.toPath,
        "junk".getBytes("UTF-8")): Unit)
      assert(DocIndex.refresh(spark, root.toString, idx.toString) === 2)
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  // ---- second self-review pass: crash/config/count pins ------------------

  test("a stale meta marker (crash between commit and meta write) can never diverge the index") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(7, "s0", "seven"))), root.toString)
      DocIndex.materialize(spark, root.toString, idx.toString): Unit
      // v2: doc 7 moves s0 -> s1; refresh commits THEN (simulated crash)
      // the meta is forced back to the stale base
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(7, "s1", "seven"))),
        removedIds = df(Seq(doc(7, "s0", "x")))
          .select(col("split"), col("doc_id")))
      DocIndex.refresh(spark, root.toString, idx.toString): Unit
      java.nio.file.Files.write(idx.resolve("_docidx.meta"),
        s"1\n${DocIndex.buckets(spark)}\n".getBytes("UTF-8"))
      // v3: doc 7 moves BACK s1 -> s0 — against the stale base 1 the
      // two moves net out and a naive recovery would leave the index
      // pointing at s1 forever
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(7, "s0", "seven"))),
        removedIds = df(Seq(doc(7, "s1", "x")))
          .select(col("split"), col("doc_id")))
      assert(DocIndex.indexedVersion(spark, idx.toString) === 2,
        "the head refresh tag must override the stale meta")
      assert(DocIndex.refresh(spark, root.toString, idx.toString) === 3)
      assert(indexMap(idx.toString) === Map(7L -> "s0"))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  test("the bucket width rides the meta — a differently-configured maintenance job cannot corrupt the index") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      Snapshots.commitFull(spark, df(
        (1L to 40L).map(k => doc(k, s"d${k % 3}", s"t$k"))), root.toString)
      DocIndex.materialize(spark, root.toString, idx.toString): Unit
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(7, "d2", "moved"))),
        removedIds = df(Seq(doc(7, "d1", "x")))
          .select(col("split"), col("doc_id")))
      // the maintenance job runs with a DIFFERENT session knob — the
      // refresh must keep using the materialize-time width
      spark.conf.set("spark.graft.docindex.buckets", "3")
      try DocIndex.refresh(spark, root.toString, idx.toString): Unit
      finally spark.conf.unset("spark.graft.docindex.buckets")
      assert(indexMap(idx.toString).get(7L) === Some("d2"))
      assert(indexMap(idx.toString).size === 40)
      import spark.implicits._
      assert(DocIndex.resolveSplits(spark, root.toString, idx.toString,
          Seq(7L).toDF("doc_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("d2", 7L)))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  test("resolveSplits reads ONLY the probed ids' buckets (corruption-proven)") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      val seed = (1L to 200L).map(k => doc(k, s"d${k % 5}", s"t$k"))
      Snapshots.commitFull(spark, df(seed), root.toString)
      DocIndex.materialize(spark, root.toString, idx.toString): Unit
      val bucket = spark.range(1).select(concat(lit("b"),
          pmod(abs(hash(lit(7L))), lit(DocIndex.buckets(spark))).cast("string")))
        .collect()(0).getString(0)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(idx.toFile).filter(f =>
          f.getName.endsWith(".parquet") &&
            f.getAbsolutePath.contains("split=") &&
            !f.getAbsolutePath.contains(s"split=$bucket/"))
        .foreach(f => java.nio.file.Files.write(f.toPath,
          "junk".getBytes("UTF-8")): Unit)
      import spark.implicits._
      assert(DocIndex.resolveSplits(spark, root.toString, idx.toString,
          Seq(7L).toDF("doc_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("d2", 7L)))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  // ---- round 15: probe typing + the requireAllFound safety catch ---------

  test("a probe frame with a narrower doc_id type up-casts to the index type before bucketing") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(7, "d1", "seven"), doc(9, "d2", "nine"))), root.toString)
      DocIndex.materialize(spark, root.toString, idx.toString): Unit
      import spark.implicits._
      // INT probe against a BIGINT index: hash() is type-sensitive, so an
      // unaligned probe would bucket elsewhere and silently resolve
      // nothing — the exact GDPR-takedown-no-op the cast prevents
      val intIds = Seq(7).toDF("doc_id") // IntegerType
      assert(DocIndex.resolveSplits(spark, root.toString, idx.toString,
          intIds)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("d1", 7L)))
      // a probe type with no lossless up-cast refuses loudly
      val e = intercept[graft.core.GraftAnalysisException] {
        DocIndex.resolveSplits(spark, root.toString, idx.toString,
          Seq("7").toDF("doc_id"))
      }
      assert(e.getMessage.contains("type-sensitive"), e.getMessage)
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  test("sync materializes on an empty root, refreshes after, and survives a vacuumed CDC base by rebuilding") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "d1", "one"))), root.toString)
      assert(DocIndex.sync(spark, root.toString, idx.toString) === 1)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(2, "d2", "two"))), removedIds = noRm)
      assert(DocIndex.sync(spark, root.toString, idx.toString) === 2)
      assert(indexMap(idx.toString) === Map(1L -> "d1", 2L -> "d2"))
      // the CORPUS store is swept past the index's base (retention ran
      // between refreshes — the long-lived ingest-stream shape): v2, the
      // index's CDC base, must survive nothing; sync falls back to a
      // head rebuild instead of crashing on the missing version file
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "d1", "three"))), removedIds = noRm)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(1, "d3", "one"))),
        removedIds = df(Seq(doc(1, "d1", "x")))
          .select(col("split"), col("doc_id")))
      Snapshots.vacuum(spark, root.toString, keepLast = 1): Unit
      assert(DocIndex.sync(spark, root.toString, idx.toString) === 4)
      assert(indexMap(idx.toString) ===
        Map(1L -> "d3", 2L -> "d2", 3L -> "d1"))
      // and the rebuilt index still resolves takedowns correctly
      import spark.implicits._
      assert(DocIndex.resolveSplits(spark, root.toString, idx.toString,
          Seq(1L).toDF("doc_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("d3", 1L)))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  test("snapshotIngestStream(indexRoot) keeps the standing index at the stream's head") {
    val root = freshRoot(); val idx = freshRoot(); val tmp = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(100, "b", "base"))), root.toString)
      val inDir = tmp.resolve("in")
      java.nio.file.Files.createDirectories(inDir): Unit
      (1 to 3).foreach { k =>
        df(Seq(doc(k.toLong, "a", s"t$k"))).coalesce(1)
          .write.parquet(tmp.resolve(s"f$k").toString)
        val p = tmp.resolve(s"f$k").toFile.listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(p.toPath, inDir.resolve(s"part-$k.parquet")): Unit
      }
      val in = spark.readStream
        .schema("doc_id long, split string, text string, n_tokens long")
        .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      val q = graft.streaming.EventPipeline
        .snapshotIngestStream(in, root.toString, "ix", maintainEvery = Some(2),
          policy = Snapshots.MaintenancePolicy(
            dvCompactFraction = None, consolidateAfterDirs = Some(1),
            vacuumKeepLast = Some(2)),
          indexRoot = Some(idx.toString))
        .option("checkpointLocation", tmp.resolve("ckpt").toString).start()
      try q.processAllAvailable() finally q.stop()
      val head = Snapshots.latestVersion(spark, root.toString)
      assert(DocIndex.indexedVersion(spark, idx.toString) === head,
        "the stream must leave the index at the corpus head")
      assert(indexMap(idx.toString) ===
        Map(100L -> "b", 1L -> "a", 2L -> "a", 3L -> "a"))
      // takedown discovery is immediately index-speed — no manual refresh
      import spark.implicits._
      val v = DocIndex.removeByIds(spark, root.toString, idx.toString,
        Seq(2L).toDF("doc_id"))
      assert(v === head + 1)
      assert(Snapshots.readAt(spark, root.toString, v)
        .collect().map(_.getLong(0)).toSet === Set(100L, 1L, 3L))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
      CorpusExport.deleteRecursively(tmp.toFile)
    }
  }

  test("removeByIds(requireAllFound) refuses when an id does not resolve through the index") {
    val root = freshRoot(); val idx = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "d1", "one"), doc(2, "d2", "two"))), root.toString)
      DocIndex.materialize(spark, root.toString, idx.toString): Unit
      import spark.implicits._
      val e = intercept[graft.core.GraftAnalysisException] {
        DocIndex.removeByIds(spark, root.toString, idx.toString,
          Seq(1L, 99L).toDF("doc_id"), requireAllFound = true)
      }
      assert(e.getMessage.contains("99"), e.getMessage)
      assert(Snapshots.latestVersion(spark, root.toString) === 1,
        "a refused takedown must commit nothing")
      // fully-resolved requests commit (and forward the flag downstream)
      assert(DocIndex.removeByIds(spark, root.toString, idx.toString,
        Seq(1L).toDF("doc_id"), requireAllFound = true) === 2)
      assert(Snapshots.readAt(spark, root.toString, 2)
        .collect().map(_.getLong(0)).toSet === Set(2L))
      // the default stays idempotent: re-deleting resolves nothing and
      // no-ops instead of refusing
      DocIndex.refresh(spark, root.toString, idx.toString): Unit
      assert(DocIndex.removeByIds(spark, root.toString, idx.toString,
        Seq(1L).toDF("doc_id")) === 3)
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }
}
