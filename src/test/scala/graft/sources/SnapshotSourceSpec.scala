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
