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
}
