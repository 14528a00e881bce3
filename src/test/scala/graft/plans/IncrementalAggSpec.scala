package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the incrementally-maintained aggregate view: refresh ≡ rebuild
  * under adds/removes/updates/group moves, pointer-pruned refresh IO,
  * no-op and repeated refreshes, emptied-group drop, and the typed
  * refusals. */
class IncrementalAggSpec extends SparkTestBase {

  private def freshDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  private def doc(id: Long, split: String, text: String, n: Long) =
    (id, split, text, n)

  private def df(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "split", "text", "n_tokens")
  }

  private val noRm = df(Nil).select(col("split"), col("doc_id"))

  private def viewRows(path: String): Set[(String, Long, Long)] =
    IncrementalAgg.read(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("refresh after add/remove/update/group-move equals a from-scratch rebuild") {
    val root = freshDir("graft_iagg_store")
    val view = freshDir("graft_iagg_view")
    val audit = freshDir("graft_iagg_audit")
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one", 5), doc(2, "a", "two", 7),
        doc(3, "b", "three", 100))), root.toString)
      val spec = IncrementalAgg.Spec(Seq("split"), Seq("n_tokens"))
      assert(IncrementalAgg.materialize(spark, root.toString,
        view.toString, spec) === 1)
      assert(viewRows(view.toString) === Set(("a", 2L, 12L), ("b", 1L, 100L)))

      // v2: update 1 in place, move 2 from a to b, add 4 to b, remove 3
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(1, "a", "one", 50), doc(2, "b", "two", 7),
          doc(4, "b", "four", 4))),
        removedIds = df(Seq(doc(2, "a", "x", 0), doc(3, "b", "x", 0)))
          .select(col("split"), col("doc_id")))
      assert(IncrementalAgg.refresh(spark, root.toString, view.toString) === 2)
      assert(viewRows(view.toString) === Set(("a", 1L, 50L), ("b", 2L, 11L)))
      assert(IncrementalAgg.version(spark, view.toString) === 2)

      // audit path: a from-scratch rebuild at the same head agrees
      IncrementalAgg.materialize(spark, root.toString, audit.toString, spec)
      assert(viewRows(audit.toString) === viewRows(view.toString))

      // v3 empties group a entirely — it must drop from the view
      Snapshots.commitDelta(spark, root.toString, adds = df(Nil),
        removedIds = df(Seq(doc(1, "a", "x", 0)))
          .select(col("split"), col("doc_id")))
      IncrementalAgg.refresh(spark, root.toString, view.toString): Unit
      assert(viewRows(view.toString) === Set(("b", 2L, 11L)))
    } finally Seq(root, view, audit).foreach(p =>
      CorpusExport.deleteRecursively(p.toFile))
  }

  test("refresh reads only pointer-changed splits") {
    val root = freshDir("graft_iagg_prune")
    val view = freshDir("graft_iagg_prune_view")
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one", 1), doc(2, "b", "two", 2),
        doc(3, "c", "three", 3))), root.toString)
      IncrementalAgg.materialize(spark, root.toString, view.toString,
        IncrementalAgg.Spec(Seq("split"), Seq("n_tokens"))): Unit
      // corrupt split c's files — untouched by the coming delta
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val cFiles = walk(root.toFile).filter(f =>
        f.getAbsolutePath.contains("split=c") && f.getName.endsWith(".parquet"))
      assert(cFiles.nonEmpty)
      cFiles.foreach(f => java.nio.file.Files.write(f.toPath,
        "junk".getBytes("UTF-8")): Unit)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(1, "a", "one", 10))), removedIds = noRm)
      // incremental refresh diffs only split a — succeeds
      IncrementalAgg.refresh(spark, root.toString, view.toString): Unit
      assert(viewRows(view.toString) ===
        Set(("a", 1L, 10L), ("b", 1L, 2L), ("c", 1L, 3L)))
      // a from-scratch rebuild must open c's files and fail — proving
      // the refresh genuinely skipped those bytes
      intercept[Exception] {
        IncrementalAgg.materialize(spark, root.toString, view.toString,
          IncrementalAgg.Spec(Seq("split"), Seq("n_tokens")))
      }
    } finally Seq(root, view).foreach(p =>
      CorpusExport.deleteRecursively(p.toFile))
  }

  test("no-op and repeated refreshes; null measures contribute nothing") {
    val root = freshDir("graft_iagg_noop")
    val view = freshDir("graft_iagg_noop_view")
    try {
      import spark.implicits._
      val d = Seq((1L, "a", Some(5L)), (2L, "a", None: Option[Long]))
        .toDF("doc_id", "split", "n_tokens")
      Snapshots.commitFull(spark, d, root.toString)
      IncrementalAgg.materialize(spark, root.toString, view.toString,
        IncrementalAgg.Spec(Seq("split"), Seq("n_tokens"))): Unit
      assert(viewRows(view.toString) === Set(("a", 2L, 5L)))
      // head unchanged: refresh is a no-op and rewrites nothing
      val gen0 = IncrementalAgg.version(spark, view.toString)
      assert(IncrementalAgg.refresh(spark, root.toString, view.toString) === gen0)
      // a null-measure update retracts null and adds a value
      Snapshots.commitDelta(spark, root.toString,
        adds = Seq((2L, "a", Some(7L))).toDF("doc_id", "split", "n_tokens"),
        removedIds = Seq.empty[(String, Long)].toDF("split", "doc_id"))
      IncrementalAgg.refresh(spark, root.toString, view.toString): Unit
      IncrementalAgg.refresh(spark, root.toString, view.toString): Unit
      assert(viewRows(view.toString) === Set(("a", 2L, 12L)))
    } finally Seq(root, view).foreach(p =>
      CorpusExport.deleteRecursively(p.toFile))
  }

  test("null group keys merge (never duplicate); one live generation on disk") {
    val root = freshDir("graft_iagg_null")
    val view = freshDir("graft_iagg_null_view")
    try {
      import spark.implicits._
      val d = Seq((1L, "a", Some("en"), 5L), (2L, "a", None, 7L),
        (3L, "b", None, 11L))
        .toDF("doc_id", "split", "lang", "n_tokens")
      Snapshots.commitFull(spark, d, root.toString)
      IncrementalAgg.materialize(spark, root.toString, view.toString,
        IncrementalAgg.Spec(Seq("lang"), Seq("n_tokens"))): Unit
      // update a null-lang doc: the retraction and the addition must
      // land in the SAME null-keyed group row
      Snapshots.commitDelta(spark, root.toString,
        adds = Seq((2L, "a", None: Option[String], 9L))
          .toDF("doc_id", "split", "lang", "n_tokens"),
        removedIds = Seq.empty[(String, Long)].toDF("split", "doc_id"))
      IncrementalAgg.refresh(spark, root.toString, view.toString): Unit
      val rows = IncrementalAgg.read(spark, view.toString)
        .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      assert(rows.toSet === Set(
        (Some("en"), 1L, 5L), (None, 2L, 20L)))
      assert(rows.length === 2) // no duplicated null group
      // exactly one data generation lives beside the meta
      assert(Option(view.toFile.listFiles()).toSeq.flatten
        .count(f => f.isDirectory && f.getName.startsWith("v")) === 1)
    } finally Seq(root, view).foreach(p =>
      CorpusExport.deleteRecursively(p.toFile))
  }

  test("ndv sketches merge across add-only refreshes; non-add-only diffs refuse") {
    val root = freshDir("graft_iagg_ndv")
    val view = freshDir("graft_iagg_ndv_view")
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "x", 1), doc(2, "a", "y", 2), doc(3, "b", "x", 3))),
        root.toString)
      IncrementalAgg.materialize(spark, root.toString, view.toString,
        IncrementalAgg.Spec(Seq("split"), Nil, ndvCols = Seq("text"))): Unit
      // add-only delta: new docs, one repeating an existing text value
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(4, "a", "x", 4), doc(5, "b", "z", 5))),
        removedIds = noRm)
      IncrementalAgg.refresh(spark, root.toString, view.toString): Unit
      // HLL is exact at this cardinality: a={x,y} -> 2, b={x,z} -> 2
      val est = IncrementalAgg.read(spark, view.toString)
        .select(col("split"), col("n_docs"),
          IncrementalAgg.ndvEstimate("text"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(est === Set(("a", 3L, 2L), ("b", 2L, 2L)))

      // a remove makes the diff non-add-only: the ndv view refuses
      Snapshots.commitDelta(spark, root.toString, adds = df(Nil),
        removedIds = df(Seq(doc(1, "a", "x", 0)))
          .select(col("split"), col("doc_id")))
      val e = intercept[graft.core.GraftAnalysisException] {
        IncrementalAgg.refresh(spark, root.toString, view.toString)
      }
      assert(e.getMessage.contains("not add-only") &&
        e.getMessage.contains("'remove'"))
      // the audit path still works: re-materialize at the head
      IncrementalAgg.materialize(spark, root.toString, view.toString,
        IncrementalAgg.Spec(Seq("split"), Nil, ndvCols = Seq("text"))): Unit
      assert(IncrementalAgg.read(spark, view.toString)
        .select(col("split"), IncrementalAgg.ndvEstimate("text"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("a", 2L), ("b", 2L))) // a={x,y} still (doc 4 has x), b={x,z}
    } finally Seq(root, view).foreach(p =>
      CorpusExport.deleteRecursively(p.toFile))
  }

  test("typed refusals: bad spec, missing view, recreated store") {
    val root = freshDir("graft_iagg_bad")
    val view = freshDir("graft_iagg_bad_view")
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one", 1))), root.toString)
      val e1 = intercept[graft.core.GraftAnalysisException] {
        IncrementalAgg.materialize(spark, root.toString, view.toString,
          IncrementalAgg.Spec(Seq("nope"), Nil))
      }
      assert(e1.getMessage.contains("missing column 'nope'"))
      val e2 = intercept[graft.core.GraftAnalysisException] {
        IncrementalAgg.materialize(spark, root.toString, view.toString,
          IncrementalAgg.Spec(Seq("split"), Seq("text")))
      }
      assert(e2.getMessage.contains("must be numeric"))
      val e3 = intercept[IllegalArgumentException] {
        IncrementalAgg.refresh(spark, root.toString, view.toString)
      }
      assert(e3.getMessage.contains("materialize first"))
      // a view ahead of its store refuses (store deleted/recreated
      // shorter than the view's materialized version)
      IncrementalAgg.materialize(spark, root.toString, view.toString,
        IncrementalAgg.Spec(Seq("split"), Seq("n_tokens"))): Unit
      CorpusExport.deleteRecursively(root.toFile)
      val e4 = intercept[IllegalArgumentException] {
        IncrementalAgg.refresh(spark, root.toString, view.toString)
      }
      assert(e4.getMessage.contains("behind the view"))
    } finally Seq(root, view).foreach(p =>
      CorpusExport.deleteRecursively(p.toFile))
  }

  // ---- round 14: NDV views that survive removes (ndvRebuild) ------------

  test("ndvRebuild: a takedown/update diff refreshes by touched-group rebuild, equals a from-scratch rebuild") {
    val root = freshDir("graft_iagg_ndvr")
    val view = freshDir("graft_iagg_ndvr_view")
    val audit = freshDir("graft_iagg_ndvr_audit")
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one", 5), doc(2, "a", "two", 7),
        doc(3, "b", "three", 100), doc(4, "c", "four", 9))), root.toString)
      val spec = IncrementalAgg.Spec(Seq("split"), Seq("n_tokens"),
        ndvCols = Seq("doc_id"), ndvRebuild = true)
      assert(IncrementalAgg.materialize(spark, root.toString,
        view.toString, spec) === 1)
      // v2: remove doc 1 (a), update doc 3 in place (b); c untouched
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(3, "b", "three", 150))),
        removedIds = df(Seq(doc(1, "a", "x", 0)))
          .select(col("split"), col("doc_id")))
      assert(IncrementalAgg.refresh(spark, root.toString, view.toString) === 2)
      assert(viewRows(view.toString) === Set(
        ("a", 1L, 7L), ("b", 1L, 150L), ("c", 1L, 9L)))
      // estimates equal a from-scratch rebuild's EXACTLY (sketches are
      // deterministic for identical input sets)
      IncrementalAgg.materialize(spark, root.toString, audit.toString, spec)
      def ests(p: String): Map[String, Double] =
        IncrementalAgg.read(spark, p)
          .select(col("split"),
            IncrementalAgg.ndvEstimate("doc_id").cast("double"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(ests(view.toString) === ests(audit.toString))
    } finally {
      Seq(root, view, audit).foreach(p => CorpusExport.deleteRecursively(p.toFile))
    }
  }

  test("ndvRebuild: untouched groups keep their stored sketch BYTES verbatim") {
    val root = freshDir("graft_iagg_ndvu")
    val view = freshDir("graft_iagg_ndvu_view")
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one", 5), doc(2, "b", "two", 7),
        doc(3, "b", "three", 9))), root.toString)
      val spec = IncrementalAgg.Spec(Seq("split"), Nil,
        ndvCols = Seq("doc_id"), ndvRebuild = true)
      IncrementalAgg.materialize(spark, root.toString, view.toString, spec): Unit
      def sketchOf(split: String): Seq[Byte] =
        IncrementalAgg.read(spark, view.toString)
          .filter(col("split") === split).select(col("ndv_doc_id"))
          .collect()(0).getAs[Array[Byte]](0).toSeq
      val bBefore = sketchOf("b")
      // the diff touches ONLY group a
      Snapshots.commitDelta(spark, root.toString, adds = df(Nil),
        removedIds = df(Seq(doc(1, "a", "x", 0)))
          .select(col("split"), col("doc_id")))
      IncrementalAgg.refresh(spark, root.toString, view.toString): Unit
      // group a emptied -> dropped; group b's stored row carried verbatim
      assert(IncrementalAgg.read(spark, view.toString)
        .select(col("split"), col("n_docs"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("b", 2L)))
      assert(sketchOf("b") === bBefore,
        "an untouched group must not be recomputed")
    } finally {
      Seq(root, view).foreach(p => CorpusExport.deleteRecursively(p.toFile))
    }
  }

  test("ndvRebuild covers group MOVES: both the old and the new group refresh") {
    val root = freshDir("graft_iagg_ndvm")
    val view = freshDir("graft_iagg_ndvm_view")
    try {
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one", 5), doc(2, "b", "two", 7))), root.toString)
      val spec = IncrementalAgg.Spec(Seq("split"), Seq("n_tokens"),
        ndvCols = Seq("doc_id"), ndvRebuild = true)
      IncrementalAgg.materialize(spark, root.toString, view.toString, spec): Unit
      // move doc 1 from a to b (remove at a + re-add at b)
      Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq(doc(1, "b", "one", 5))),
        removedIds = df(Seq(doc(1, "a", "x", 0)))
          .select(col("split"), col("doc_id")))
      IncrementalAgg.refresh(spark, root.toString, view.toString): Unit
      assert(viewRows(view.toString) === Set(("b", 2L, 12L)))
      val est = IncrementalAgg.read(spark, view.toString)
        .select(IncrementalAgg.ndvEstimate("doc_id").cast("double"))
        .collect()(0).getDouble(0)
      assert(math.abs(est - 2.0) < 0.5, s"fresh sketch must see both docs: $est")
    } finally {
      Seq(root, view).foreach(p => CorpusExport.deleteRecursively(p.toFile))
    }
  }

  test("without ndvRebuild the refusal now names the flag") {
    val root = freshDir("graft_iagg_ndvf")
    val view = freshDir("graft_iagg_ndvf_view")
    try {
      Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one", 5))), root.toString)
      IncrementalAgg.materialize(spark, root.toString, view.toString,
        IncrementalAgg.Spec(Seq("split"), Nil, ndvCols = Seq("doc_id"))): Unit
      Snapshots.commitDelta(spark, root.toString, adds = df(Nil),
        removedIds = df(Seq(doc(1, "a", "x", 0)))
          .select(col("split"), col("doc_id")))
      val e = intercept[graft.core.GraftAnalysisException] {
        IncrementalAgg.refresh(spark, root.toString, view.toString)
      }
      assert(e.getMessage.contains("ndvRebuild"), e.getMessage)
    } finally {
      Seq(root, view).foreach(p => CorpusExport.deleteRecursively(p.toFile))
    }
  }
}
