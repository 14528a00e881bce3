package graft.sources

import graft.SparkTestBase
import graft.plans.{CorpusExport, Snapshots}
import org.apache.spark.sql.functions._

/** Pins the SQL/DataSourceV2 front door for the snapshot store: every
  * read path (format().load, SQL temp view, versionAsOf / timestampAsOf
  * / tag / branch) must agree with the Scala API twin, pushed filters
  * must appear in the physical plan AND engage the manifest pruner
  * (corruption-proven), and deletion vectors must anti-join exactly as
  * they do through [[Snapshots.readAt]]. */
class SnapshotSourceSpec extends SparkTestBase {

  private def freshRoot(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_snapsrc")

  private def doc(id: Long, split: String, text: String) =
    (id, split, text, text.length.toLong)

  private def df(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "split", "text", "n_tokens")
  }

  private def fmt(root: String) =
    spark.read.format("graft-snapshot").load(root)

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
    d.select(col("doc_id"), col("split"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("format read equals the readAt twin at every version pin (versionAsOf / tag / latest / branch)") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one"), doc(2, "b", "two"))), root.toString)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "a", "three"))),
        removedIds = df(Nil).select(col("split"), col("doc_id")),
        tag = Some("day-2"))
      Snapshots.createBranch(spark, root.toString, "exp", 1)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(9, "b", "nine"))),
        removedIds = df(Nil).select(col("split"), col("doc_id")),
        tag = None, branch = Some("exp"))

      assert(rows(fmt(root.toString)) ===
        rows(Snapshots.readAt(spark, root.toString, 2)))
      assert(rows(spark.read.format("graft-snapshot")
          .option("versionAsOf", "1").load(root.toString)) ===
        rows(Snapshots.readAt(spark, root.toString, 1)))
      assert(rows(spark.read.format("graft-snapshot")
          .option("tag", "day-2").load(root.toString)) ===
        rows(Snapshots.readAt(spark, root.toString, 2)))
      assert(rows(spark.read.format("graft-snapshot")
          .option("branch", "exp").load(root.toString)) ===
        rows(Snapshots.readAt(spark, root.toString, 2, Some("exp"))))
      // schema comes through identically (shape-identical contract)
      assert(fmt(root.toString).schema ===
        Snapshots.readAt(spark, root.toString, 2).schema)
      // count(*) (empty required schema) works through the scan
      assert(fmt(root.toString).count() === 3L)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("timestampAsOf resolves through the monotonized commit stamps") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(2, "a", "two"))),
        removedIds = df(Nil).select(col("split"), col("doc_id")))
      val t1 = Snapshots.history(spark, root.toString)
        .filter(col("version") === 1).collect()(0).getLong(4)
      assert(rows(spark.read.format("graft-snapshot")
          .option("timestampAsOf", t1.toString).load(root.toString)) ===
        Set((1L, "a", "one")))
      // ISO instant form parses too
      val iso = java.time.Instant.ofEpochMilli(t1).toString
      assert(rows(spark.read.format("graft-snapshot")
          .option("timestampAsOf", iso).load(root.toString)) ===
        Set((1L, "a", "one")))
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("SQL front door: CREATE TEMPORARY VIEW ... USING graft-snapshot") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one"), doc(2, "b", "two"))), root.toString)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "a", "three"))),
        removedIds = df(Nil).select(col("split"), col("doc_id")))
      spark.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW corpus_v1
           |USING `graft-snapshot`
           |OPTIONS (path '${root.toString}', versionAsOf '1')""".stripMargin)
      try {
        val got = spark.sql(
          "SELECT doc_id, split FROM corpus_v1 WHERE split = 'a'")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got === Set((1L, "a")))
      } finally spark.sql("DROP VIEW corpus_v1"): Unit
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("pushed filters appear in the physical plan and engage the manifest pruner (corruption-proven)") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "lo", "one"), doc(2, "lo", "two"),
        doc(900, "hi", "nine-hundred"), doc(901, "hi", "more"))),
        root.toString, statsCols = Seq("doc_id"))
      // the predicate proves split `hi` (doc_id in [900, 901]) empty
      val q = fmt(root.toString).filter(col("doc_id") < 100L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
        s"pushed filters must be visible in the scan:\n$plan")
      // corrupt EVERY parquet file of the pruned split: a scan that
      // still opened it would fail — pruning must engage THROUGH the
      // DSv2 path, not just in the Scala API
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val victims = walk(root.toFile).filter(f =>
        f.getName.endsWith(".parquet") &&
          f.getAbsolutePath.contains("split=hi/"))
      assert(victims.nonEmpty)
      victims.foreach(f => java.nio.file.Files.write(f.toPath,
        "junk".getBytes("UTF-8")): Unit)
      assert(q.select(col("doc_id")).collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L))
      // and the full predicate still applies to surviving splits: a
      // residual-row leak would surface here
      assert(fmt(root.toString).filter(col("doc_id") === 2L)
        .collect().map(_.getLong(0)).toSet === Set(2L))
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("deletion vectors anti-join through the front door") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one"), doc(2, "a", "two"), doc(3, "b", "three"))),
        root.toString)
      Snapshots.commitRemove(spark, root.toString,
        df(Seq(doc(2, "a", "x"))).select(col("split"), col("doc_id")))
      assert(rows(fmt(root.toString)) ===
        Set((1L, "a", "one"), (3L, "b", "three")))
      // the pre-takedown version still reads complete
      assert(rows(spark.read.format("graft-snapshot")
          .option("versionAsOf", "1").load(root.toString)).size === 3)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("COUNT(*) is answered from the manifest with ZERO file IO (corruption-proven), filtered counts still scan") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one"), doc(2, "a", "two"), doc(3, "b", "three"),
        doc(4, "b", "four"))), root.toString)
      // a DV takedown: the manifest count must be the EFFECTIVE count
      Snapshots.commitRemove(spark, root.toString,
        df(Seq(doc(2, "a", "x"))).select(col("split"), col("doc_id")))
      // corrupt EVERY parquet file — any scan would fail, so a correct
      // answer proves the count never opened a file
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(root.toFile).filter(f => f.getName.endsWith(".parquet") &&
          f.getAbsolutePath.contains("split="))
        .foreach(f => java.nio.file.Files.write(f.toPath,
          "junk".getBytes("UTF-8")): Unit)
      assert(fmt(root.toString).count() === 3L)
      assert(spark.read.format("graft-snapshot")
        .option("versionAsOf", "1").load(root.toString).count() === 4L)
      // a FILTERED count must take the scan path (counts scanned rows) —
      // on the corrupted store that read fails, which proves the
      // manifest shortcut correctly stood down
      intercept[Exception] {
        fmt(root.toString).filter(col("split") === "a").count()
      }
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("MIN/MAX over a tracked column answer from the manifest; deletion vectors stand the shortcut down") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(5, "a", "five"), doc(17, "a", "seventeen"),
        doc(900, "b", "big"), doc(3, "b", "three"))),
        root.toString, statsCols = Seq("doc_id"))
      def walkAndCorrupt(): Unit = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(root.toFile).filter(f => f.getName.endsWith(".parquet") &&
            f.getAbsolutePath.contains("split="))
          .foreach(f => java.nio.file.Files.write(f.toPath,
            "junk".getBytes("UTF-8")): Unit)
      }
      walkAndCorrupt()
      // min/max/count together, answered without opening a single file
      val r = fmt(root.toString)
        .agg(min(col("doc_id")), max(col("doc_id")), count(lit(1)))
        .collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 900L, 4L)))
      // an UNTRACKED column must scan (and here, fail): the shortcut
      // provably stood down instead of guessing
      intercept[Exception] {
        fmt(root.toString).agg(min(col("n_tokens"))).collect()
      }
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("a deletion vector makes manifest MIN/MAX stand down (the extremum may be tombstoned)") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(5, "a", "five"), doc(900, "a", "big"))),
        root.toString, statsCols = Seq("doc_id"))
      Snapshots.commitRemove(spark, root.toString,
        df(Seq(doc(900, "a", "x"))).select(col("split"), col("doc_id")))
      // the stats cell still says max = 900, but 900 is tombstoned —
      // the scan path must answer 5, proving the manifest stood down
      val r = fmt(root.toString).agg(max(col("doc_id"))).collect()(0)
      assert(r.getLong(0) === 5L)
      // count stays manifest-answerable under DVs (exact by dvRows)
      assert(fmt(root.toString).count() === 1L)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("NaN / ±0.0 double stats: pushed MIN answers exactly where sound, NaN and ±0.0 extrema provably stand down") {
    val root = freshRoot()
    try {
      import spark.implicits._
      Seq((1L, "a", Double.NaN), (2L, "a", -3.5d), (3L, "b", 7.25d),
        (4L, "b", 1.0d))
        .toDF("doc_id", "split", "score")
        .write.mode("overwrite").parquet(s"$root/seed")
      Snapshots.commitFull(spark,
        spark.read.parquet(s"$root/seed"), root.toString,
        statsCols = Seq("score"))
      // MIN is manifest-answerable (NaN orders GREATEST, so it can
      // never be the min; the -3.5 cell is exact): corrupt every data
      // file — the answer must still come back
      def corruptData(): Unit = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(root.toFile).filter(f => f.getName.endsWith(".parquet") &&
            f.getAbsolutePath.contains("split="))
          .foreach(f => java.nio.file.Files.write(f.toPath,
            "junk".getBytes("UTF-8")): Unit)
      }
      corruptData()
      val mn = fmt(root.toString).agg(min(col("score"))).collect()(0)
      assert(mn.getDouble(0) === -3.5d)
      // MAX hits the NaN stats cell → unparsable → the WHOLE pushdown
      // stands down to the scan (which here fails on the corrupted
      // files — the proof it stood down instead of guessing)
      intercept[Exception] {
        fmt(root.toString).agg(max(col("score"))).collect()
      }
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("a ±0.0 extremum stands the pushed MIN/MAX down (cell sign vs scan sign is not provable)") {
    val root = freshRoot()
    try {
      import spark.implicits._
      Seq((1L, "a", -0.0d), (2L, "a", 5.5d), (3L, "b", 0.0d),
        (4L, "b", 9.0d))
        .toDF("doc_id", "split", "score")
        .write.mode("overwrite").parquet(s"$root/seed")
      Snapshots.commitFull(spark,
        spark.read.parquet(s"$root/seed"), root.toString,
        statsCols = Seq("score"))
      // min = ±0.0 → must scan (answers, since files are intact) …
      val mn = fmt(root.toString).agg(min(col("score"))).collect()(0)
      assert(mn.getDouble(0) === 0.0d || (1d / mn.getDouble(0)).isNegInfinity)
      // … and PROVABLY scans: corrupted files now fail the min, while
      // max (9.0, not a zero) still answers off the manifest
      def corruptData(): Unit = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(root.toFile).filter(f => f.getName.endsWith(".parquet") &&
            f.getAbsolutePath.contains("split="))
          .foreach(f => java.nio.file.Files.write(f.toPath,
            "junk".getBytes("UTF-8")): Unit)
      }
      corruptData()
      intercept[Exception] {
        fmt(root.toString).agg(min(col("score"))).collect()
      }
      val mx = fmt(root.toString).agg(max(col("score"))).collect()(0)
      assert(mx.getDouble(0) === 9.0d)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("write path: append commits a tagged delta, overwrite carries the head's contract, SQL INSERT INTO works") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one"))), root.toString, statsCols = Seq("doc_id"))
      // DataFrameWriter append = one delta commit, commitTag-idempotent
      df(Seq(doc(2, "b", "two"))).write.format("graft-snapshot")
        .mode("append").option("commitTag", "b0").save(root.toString)
      assert(Snapshots.latestVersion(spark, root.toString) === 2)
      df(Seq(doc(2, "b", "two"))).write.format("graft-snapshot")
        .mode("append").option("commitTag", "b0").save(root.toString)
      assert(Snapshots.latestVersion(spark, root.toString) === 2,
        "a redelivered commitTag write must be ledger-skipped")
      assert(rows(fmt(root.toString)) ===
        Set((1L, "a", "one"), (2L, "b", "two")))
      // SQL INSERT INTO through a front-door view (positional columns)
      spark.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW corpus_w
           |USING `graft-snapshot` OPTIONS (path '${root.toString}')""".stripMargin)
      try {
        spark.sql(
          "INSERT INTO corpus_w VALUES (3, 'a', 'three', 5)")
        assert(Snapshots.latestVersion(spark, root.toString) === 3)
        assert(rows(Snapshots.readAt(spark, root.toString, 3))
          .contains((3L, "a", "three")))
      } finally spark.sql("DROP VIEW corpus_w"): Unit
      // overwrite = full rewrite CARRYING the stats contract: pruning
      // still works on the rewritten store
      df(Seq(doc(10, "lo", "ten"), doc(900, "hi", "big")))
        .write.format("graft-snapshot").mode("overwrite").save(root.toString)
      val v = Snapshots.latestVersion(spark, root.toString)
      assert(rows(Snapshots.readAt(spark, root.toString, v)) ===
        Set((10L, "lo", "ten"), (900L, "hi", "big")))
      assert(Snapshots.pruneReport(spark, root.toString, v,
        col("doc_id") < 100L) === Seq("hi"),
        "overwrite must carry the head's statsCols forward")
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("an unpinned view tracks the head across commits; a pinned view stays frozen") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      spark.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW corpus_live
           |USING `graft-snapshot` OPTIONS (path '${root.toString}')""".stripMargin)
      spark.sql(
        s"""CREATE OR REPLACE TEMPORARY VIEW corpus_pin1
           |USING `graft-snapshot`
           |OPTIONS (path '${root.toString}', versionAsOf '1')""".stripMargin)
      try {
        assert(spark.table("corpus_live").count() === 1L)
        Snapshots.commitDelta(spark, root.toString,
          adds = df(Seq(doc(2, "a", "two"))),
          removedIds = df(Nil).select(col("split"), col("doc_id")))
        // the live view serves the NEW head without being re-created …
        assert(spark.sql("SELECT doc_id FROM corpus_live")
          .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
        // … while the pinned view is a historical read forever
        assert(spark.sql("SELECT doc_id FROM corpus_pin1")
          .collect().map(_.getLong(0)).toSet === Set(1L))
      } finally {
        spark.sql("DROP VIEW corpus_live")
        spark.sql("DROP VIEW corpus_pin1"): Unit
      }
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("write refusals: version-pinned writes, missing split keying, overwrite on a branch") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      val e1 = intercept[graft.core.GraftAnalysisException] {
        df(Seq(doc(2, "a", "two"))).write.format("graft-snapshot")
          .mode("append").option("versionAsOf", "1").save(root.toString)
      }
      assert(e1.getMessage.contains("READ"), e1.getMessage)
      // missing split keying: the v2 by-name resolution refuses at
      // analysis (missing output column) before writeInto's own guard
      // (which still covers the v1 fallback path) is even reached
      val e2 = intercept[Exception] {
        import spark.implicits._
        Seq((9L, "t")).toDF("doc_id", "text").write
          .format("graft-snapshot").mode("append").save(root.toString)
      }
      val e2Chain = Iterator.iterate[Throwable](e2)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(e2Chain.contains("split"), e2Chain)
      Snapshots.createBranch(spark, root.toString, "exp", 1)
      val e3 = intercept[graft.core.GraftAnalysisException] {
        df(Seq(doc(5, "a", "five"))).write.format("graft-snapshot")
          .mode("overwrite").option("branch", "exp").save(root.toString)
      }
      assert(e3.getMessage.contains("MAIN"), e3.getMessage)
      // …while a branch APPEND is the supported experiment shape
      df(Seq(doc(5, "a", "five"))).write.format("graft-snapshot")
        .mode("append").option("branch", "exp").save(root.toString)
      assert(rows(Snapshots.readAt(spark, root.toString, 2, Some("exp")))
        .contains((5L, "a", "five")))
      assert(Snapshots.latestVersion(spark, root.toString) === 1,
        "a branch append must not advance main")
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("NULL-keyed rows refuse PRE-PUBLISH inside the commit (no door-side pre-check pass needed)") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      val bad = df(Seq(doc(2, "a", "two")))
        .withColumn("split", lit(null).cast("string"))
      val e = intercept[graft.core.GraftAnalysisException] {
        bad.write.format("graft-snapshot").mode("append").save(root.toString)
      }
      assert(e.getMessage.contains("NULL"), e.getMessage)
      assert(Snapshots.latestVersion(spark, root.toString) === 1,
        "a refused commit must publish nothing")
      // a null doc_id refuses the same way (it could never be tombstoned)
      val bad2 = df(Seq(doc(3, "a", "three")))
        .withColumn("doc_id", lit(null).cast("long"))
      val e2 = intercept[graft.core.GraftAnalysisException] {
        bad2.write.format("graft-snapshot").mode("append").save(root.toString)
      }
      assert(e2.getMessage.contains("NULL"), e2.getMessage)
      assert(Snapshots.latestVersion(spark, root.toString) === 1)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("front-door append JOB PARITY: exactly as many Spark jobs as the native commitDelta (the null pre-check rides the stats pass)") {
    val root1 = freshRoot()
    val root2 = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root1.toString)
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root2.toString)
      def jobsDuring(body: => Unit): Int = {
        val c = new java.util.concurrent.atomic.AtomicInteger()
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            c.incrementAndGet(): Unit
        }
        spark.sparkContext.addSparkListener(l)
        try { body; Thread.sleep(1500) }
        finally spark.sparkContext.removeSparkListener(l)
        c.get()
      }
      val native = jobsDuring {
        val adds = df(Seq(doc(2, "b", "two")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try Snapshots.commitDelta(spark, root1.toString, adds = adds,
          removedIds = adds.select(col("split"), col("doc_id")).limit(0)): Unit
        finally adds.unpersist(blocking = false): Unit
      }
      val door = jobsDuring {
        df(Seq(doc(2, "b", "two"))).write.format("graft-snapshot")
          .mode("append").save(root2.toString)
      }
      assert(door === native,
        s"front-door append ran $door jobs vs native $native — the door " +
          "must add no validation job of its own")
    } finally {
      CorpusExport.deleteRecursively(root1.toFile)
      CorpusExport.deleteRecursively(root2.toFile)
    }
  }

  test("conflicting or unresolvable pins refuse loudly") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      val e1 = intercept[graft.core.GraftAnalysisException] {
        spark.read.format("graft-snapshot")
          .option("versionAsOf", "1").option("tag", "t").load(root.toString)
      }
      assert(e1.getMessage.contains("mutually"), e1.getMessage)
      val e2 = intercept[graft.core.GraftAnalysisException] {
        spark.read.format("graft-snapshot")
          .option("tag", "no-such-tag").load(root.toString)
      }
      assert(e2.getMessage.contains("no commit tagged"), e2.getMessage)
      val e3 = intercept[graft.core.GraftAnalysisException] {
        spark.read.format("graft-snapshot")
          .option("branch", "b").option("timestampAsOf", "0").load(root.toString)
      }
      assert(e3.getMessage.contains("main-chain"), e3.getMessage)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  // ---- SQL DELETE (SupportsDelete) ---------------------------------------

  private def registerDelCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graftdeltest",
      classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdeltest.root",
      System.getProperty("java.io.tmpdir"))
  }

  private def dataDirs(root: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n == "_versions" || n.endsWith("-dv")).toSet
  }

  test("SQL DELETE through the catalog: sidecar-only commit, pinned history intact, match-nothing is a no-op") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one"), doc(2, "b", "two"), doc(3, "a", "three"))),
        root.toString)
      registerDelCatalog()
      val tbl = s"graftdeltest.`${root.getFileName}`"
      val before = dataDirs(root.toString)
      spark.sql(s"DELETE FROM $tbl WHERE text = 'two'")
      assert(Snapshots.latestVersion(spark, root.toString) === 2)
      assert(dataDirs(root.toString) === before,
        "a DELETE must add only a -dv sidecar, never a data dir")
      assert(rows(fmt(root.toString)) ===
        Set((1L, "a", "one"), (3L, "a", "three")))
      // snapshot isolation: v1 still serves the deleted row
      assert(rows(spark.read.format("graft-snapshot")
          .option("versionAsOf", "1").load(root.toString))
        .contains((2L, "b", "two")))
      // a delete matching nothing must not grow the chain
      spark.sql(s"DELETE FROM $tbl WHERE text = 'zzz'")
      assert(Snapshots.latestVersion(spark, root.toString) === 2)
      // DELETE with no WHERE tombstones everything — still sidecar-only
      spark.sql(s"DELETE FROM $tbl")
      assert(Snapshots.latestVersion(spark, root.toString) === 3)
      assert(dataDirs(root.toString) === before)
      assert(fmt(root.toString).count() === 0L)
      assert(rows(spark.read.format("graft-snapshot")
          .option("versionAsOf", "2").load(root.toString)).nonEmpty)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("DELETE refusal matrix: pinned target, partial-key predicate over duplicated keys, untranslatable predicate") {
    val root = freshRoot()
    try {
      // duplicated (split, doc_id) key with differing payloads
      Snapshots.commitFull(spark, df(Seq(
        doc(5, "a", "x"), doc(5, "a", "y"), doc(6, "b", "z"))),
        root.toString)
      // a version pin is a historical read, not a delete target
      val e1 = intercept[graft.core.GraftAnalysisException] {
        SnapshotSource.deleteFrom(
          Map("path" -> root.toString, "versionasof" -> "1"),
          Snapshots.readAt(spark, root.toString, 1).schema,
          Array.empty)
      }
      assert(e1.getMessage.contains("HEAD"), e1.getMessage)
      // predicate matches only ONE physical row of the duplicated key:
      // key-granular tombstones would over-delete — must refuse
      val e2 = intercept[graft.core.GraftAnalysisException] {
        SnapshotSource.deleteFrom(
          Map("path" -> root.toString),
          Snapshots.readAt(spark, root.toString, 1).schema,
          Array(org.apache.spark.sql.sources.EqualTo("text", "x")))
      }
      assert(e2.getMessage.contains("SOME physical rows"), e2.getMessage)
      assert(Snapshots.latestVersion(spark, root.toString) === 1,
        "a refused delete must not commit")
      // matching BOTH rows of the duplicated key is fine
      SnapshotSource.deleteFrom(Map("path" -> root.toString),
        Snapshots.readAt(spark, root.toString, 1).schema,
        Array(org.apache.spark.sql.sources.EqualTo("doc_id", 5L)))
      assert(rows(fmt(root.toString)) === Set((6L, "b", "z")))
      // an untranslatable predicate refuses at ANALYSIS (canDeleteWhere
      // false) — Spark must not silently delete the wrong rows
      registerDelCatalog()
      val tbl = s"graftdeltest.`${root.getFileName}`"
      val e3 = intercept[Exception] {
        spark.sql(s"DELETE FROM $tbl WHERE doc_id % 2 = 0")
      }
      assert(e3.getMessage.toLowerCase.contains("delete"), e3.getMessage)
      assert(Snapshots.latestVersion(spark, root.toString) === 2)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  // ---- streaming change feed ---------------------------------------------

  test("changeFeed: startingVersion positions the tail; a version before it never arrives") {
    val root = freshRoot()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_snapsrc_ck")
    val out = java.nio.file.Files.createTempDirectory("graft_snapsrc_out")
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(2, "b", "two"))),
        removedIds = df(Nil).select(col("split"), col("doc_id")))
      val q = spark.readStream.format("graft-snapshot")
        .option("changeFeed", "true").option("startingVersion", "2")
        .load(root.toString)
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.read.parquet(out.toString)
        .select(col("_version"), col("change"), col("doc_id"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      // v1 is live, so v2 arrives as its DIFF (doc 2 only) — the v1
      // content itself never emits; bootstrap-as-snapshot happens only
      // when the predecessor file is gone (vacuum horizon)
      assert(got === Set((2, "add", 2L)))
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(ckpt.toFile)
      CorpusExport.deleteRecursively(out.toFile)
    }
  }

  test("batch CDF: spark.read of the change feed replays per-version changes over a range (table_changes shape)") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(2, "b", "two"))),
        removedIds = df(Nil).select(col("split"), col("doc_id")))
      Snapshots.commitRemove(spark, root.toString,
        df(Seq(doc(1, "a", "x"))).select(col("split"), col("doc_id")))
      def cdf(opts: (String, String)*): Set[(Int, String, Long)] =
        opts.foldLeft(spark.read.format("graft-snapshot")
            .option("changeFeed", "true")) { case (r, (k, v)) => r.option(k, v) }
          .load(root.toString)
          .select(col("_version"), col("change"), col("doc_id"))
          .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      // full default range: v1 bootstrap add, v2 add, v3 remove
      assert(cdf() === Set((1, "add", 1L), (2, "add", 2L), (3, "remove", 1L)))
      // bounded range [2, 2]
      assert(cdf("startingVersion" -> "2", "endingVersion" -> "2") ===
        Set((2, "add", 2L)))
      // an all-vacuumed range refuses loudly (retention contract)
      val eR = intercept[graft.core.GraftAnalysisException] {
        cdf("startingVersion" -> "9", "endingVersion" -> "7")
      }
      assert(eR.getMessage.contains("range"), eR.getMessage)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("maxVersionsPerTrigger paces the tail: a backlog drains version-by-version with identical content") {
    val root = freshRoot()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_snapsrc_ck")
    val out = java.nio.file.Files.createTempDirectory("graft_snapsrc_out")
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      val none = df(Nil).select(col("split"), col("doc_id"))
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(2, "b", "two"))), removedIds = none)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "a", "three"))), removedIds = none)
      // the consumer arrives LATE to a 3-version backlog, capped at one
      // version per micro-batch
      val q = spark.readStream.format("graft-snapshot")
        .option("changeFeed", "true").option("maxVersionsPerTrigger", "1")
        .load(root.toString)
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      val dataBatches =
        try {
          q.processAllAvailable()
          q.recentProgress.count(_.numInputRows > 0)
        } finally q.stop()
      val got = spark.read.parquet(out.toString)
        .select(col("_version"), col("change"), col("doc_id"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set((1, "add", 1L), (2, "add", 2L), (3, "add", 3L)))
      // the cap actually paced: three separate data-carrying batches
      assert(dataBatches >= 3,
        s"expected ≥3 paced micro-batches, saw $dataBatches")
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(ckpt.toFile)
      CorpusExport.deleteRecursively(out.toFile)
    }
  }

  test("changeFeed across a vacuum horizon: the earliest LIVE version bootstraps as a full snapshot of adds") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      val none = df(Nil).select(col("split"), col("doc_id"))
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(2, "b", "two"))), removedIds = none)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "a", "three"))), removedIds = none)
      Snapshots.vacuum(spark, root.toString, keepLast = 1)
      // v1/v2 are gone: the default batch CDF starts at the earliest
      // LIVE version (v3), whose missing predecessor forces the
      // bootstrap — the full v3 snapshot as adds, not a diff
      val got = spark.read.format("graft-snapshot")
        .option("changeFeed", "true").load(root.toString)
        .select(col("_version"), col("change"), col("doc_id"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set((3, "add", 1L), (3, "add", 2L), (3, "add", 3L)))
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("changeFeed schema is pinned at query start: pre-widening versions null-fill the new column") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      // widening commit: new nullable column `quality`
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(2, "b", "two"))).withColumn("quality", lit(0.9)),
        removedIds = df(Nil).select(col("split"), col("doc_id")))
      val feed = spark.read.format("graft-snapshot")
        .option("changeFeed", "true").load(root.toString)
      assert(feed.columns.contains("quality"))
      val got = feed.select(col("_version"), col("doc_id"), col("quality"))
        .collect().map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got === Set((1, 1L, None), (2, 2L, Some(0.9))))
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("changeFeed refusal matrix: pinned feed, endingVersion on a stream, plain streaming read without the option") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
      // a pinned change feed is a contradiction (pin = snapshot)
      val e1 = intercept[Throwable] {
        spark.readStream.format("graft-snapshot")
          .option("changeFeed", "true").option("versionAsOf", "1")
          .load(root.toString)
          .writeStream.format("noop").start().processAllAvailable()
      }
      assert(causeChain(e1).exists(_.contains("startingVersion")),
        s"${e1.getMessage}")
      // endingVersion bounds a batch CDF, not a stream
      val e2 = intercept[Throwable] {
        val q = spark.readStream.format("graft-snapshot")
          .option("changeFeed", "true").option("endingVersion", "1")
          .load(root.toString)
          .writeStream.format("noop").start()
        try q.processAllAvailable() finally q.stop()
      }
      assert(causeChain(e2).exists(_.contains("BATCH")), s"${e2.getMessage}")
      // a plain streaming read tells the user about changeFeed
      val e3 = intercept[Throwable] {
        val q = spark.readStream.format("graft-snapshot").load(root.toString)
          .writeStream.format("noop").start()
        try q.processAllAvailable() finally q.stop()
      }
      assert(causeChain(e3).exists(_.contains("changeFeed")),
        s"${e3.getMessage}")
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  private def causeChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(c => Option(c.getMessage)).toSeq

  test("doc_id-only DELETE routes through the standing DocIndex at index cost") {
    val root = freshRoot()
    val idx = java.nio.file.Files.createTempDirectory("graft_snapsrc_idx")
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one"), doc(2, "b", "two"), doc(3, "a", "three"),
        doc(4, "b", "four"))), root.toString)
      graft.plans.DocIndex.materialize(spark, root.toString, idx.toString)
      val opts = Map("path" -> root.toString, "docindex" -> idx.toString)
      val sch = Snapshots.readAt(spark, root.toString, 1).schema
      // ids absent from the index are the already-deleted no-op: no commit
      SnapshotSource.deleteFrom(opts, sch,
        Array(org.apache.spark.sql.sources.In("doc_id",
          Array[Any](99L, 100L))))
      assert(Snapshots.latestVersion(spark, root.toString) === 1)
      // a present id tombstones through the index's resolved split
      SnapshotSource.deleteFrom(opts, sch,
        Array(org.apache.spark.sql.sources.In("doc_id", Array[Any](2L, 99L))))
      assert(Snapshots.latestVersion(spark, root.toString) === 2)
      assert(rows(fmt(root.toString)) ===
        Set((1L, "a", "one"), (3L, "a", "three"), (4L, "b", "four")))
      // the index is now stale (corpus v2, index v1): the lane must
      // REFUSE rather than resolve through stale entries
      val e = intercept[graft.core.GraftAnalysisException] {
        SnapshotSource.deleteFrom(opts, sch,
          Array(org.apache.spark.sql.sources.EqualTo("doc_id", 3L)))
      }
      assert(e.getMessage.contains("refresh the index"), e.getMessage)
    } finally {
      CorpusExport.deleteRecursively(root.toFile)
      CorpusExport.deleteRecursively(idx.toFile)
    }
  }
}
