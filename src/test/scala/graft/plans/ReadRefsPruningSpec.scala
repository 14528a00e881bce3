package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Adversarial pins for the r16 leaf-path split pruning: [[Snapshots]]
  * reads now hand [[org.apache.spark.sql.DataFrameReader.parquet]] the
  * referenced splits' `split=…` leaf dirs (listing IO ∝ splits READ)
  * instead of the whole version dir. Hand-constructing partition paths
  * is only sound if the construction replicates the WRITER's escaping
  * exactly, so this spec attacks precisely that seam:
  *
  *   - hostile split names (every char class `escapePathName` rewrites,
  *     plus unicode and a path separator) must round-trip bit-exact
  *     through commit → readAt → readAtWhere;
  *   - the constructed paths must equal the dirs the writer actually
  *     created (asserted at the filesystem level, not via Spark);
  *   - a POISONED sibling layout inside the version dir (a conflicting
  *     `other=…` partition dir that breaks whole-dir partition
  *     inference) must be invisible to the leaf-path read — the
  *     structural proof the unreferenced layout is never listed;
  *   - a pruned `readAtWhere`'s scan must name ONLY the surviving
  *     splits' files (`inputFiles` — the listing bound, observable);
  *   - values that cannot round-trip (empty string → the Hive
  *     default-partition dir, which reads back NULL) must take the
  *     whole-dir fallback, never a wrong hand-built path.
  */
class ReadRefsPruningSpec extends SparkTestBase {

  private def freshRoot(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_leafpath_spec")

  private def df(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "split", "text", "n_tokens")
  }

  private def contents(root: String, v: Int): Set[(Long, String, String)] =
    Snapshots.readAt(spark, root, v)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  /** Split names covering every class `escapePathName` escapes (`/ : = %
    * # * ? [ ] { ^ \ '` and a control char), plus space (NOT escaped),
    * unicode, and dot-only names a naive path builder would mangle. */
  private val hostile = Seq(
    "a/b", "c:d", "e=f", "g%25h", "i#j", "k*l", "m?n", "o[p]", "q{r",
    "s^t", "u\\v", "w'x", "y\"z", "sp ace", "..", ".hidden",
    "tab\tsep", "%2F",
    // '}' and ',' are the only Hadoop glob metachars NOT in
    // escapePathName's escape set — safe only because '{' IS escaped
    // (no brace group can ever open); pin that reasoning with names
    // that would misbehave if it broke (r17, ADVICE item)
    "b}r", "a,b", "q{r}s")
  // non-ASCII names are escaping-neutral (escapePathName passes them
  // through), and this sandbox JVM cannot create non-UTF-8-mappable
  // paths AT ALL (sun.jnu encoding) — the WRITER refuses before any
  // read-side code runs — so they are deliberately absent here.

  test("hostile split names round-trip the writer's escaping bit-exact") {
    val root = freshRoot()
    try {
      val rows = hostile.zipWithIndex.map { case (sp, i) =>
        (i.toLong, sp, s"text-$i", i.toLong)
      }
      val v1 = Snapshots.commitFull(spark, df(rows), root.toString)
      assert(v1 === 1)
      // the constructed leaf paths ARE the dirs the writer created
      val dir = Option(root.toFile.listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("v1-")).head
      val written = Option(dir.listFiles()).toSeq.flatten
        .filter(_.isDirectory).map(_.getName).toSet
      val constructed = Snapshots
        .splitLeafPaths(root.toString, dir.getName, hostile)
        .get.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
      assert(constructed === written,
        s"hand-built leaf dirs must equal the writer's: " +
          s"missing=${constructed -- written} extra=${written -- constructed}")
      // and the read through them is exact
      assert(contents(root.toString, 1) ===
        rows.map(r => (r._1, r._2, r._3)).toSet)

      // a delta touching ONE hostile split leaves the rest readable and
      // exact at both versions (the delta's rewrite reads via leaf paths
      // too — commitDeltaAttempt rides readRefs)
      val v2 = Snapshots.commitDelta(spark, root.toString,
        adds = df(Seq((100L, "a/b", "updated", 100L))),
        removedIds = df(Nil).select(col("split"), col("doc_id")))
      assert(v2 === 2)
      assert(contents(root.toString, 2) ===
        rows.map(r => (r._1, r._2, r._3)).toSet + ((100L, "a/b", "updated")))
      assert(contents(root.toString, 1) ===
        rows.map(r => (r._1, r._2, r._3)).toSet)
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("poisoned sibling layout: unreferenced dirs are never listed") {
    val root = freshRoot()
    try {
      Snapshots.commitFull(spark, df(Seq(
        (1L, "a", "one", 1L), (2L, "b", "two", 2L))), root.toString)
      val dir = Option(root.toFile.listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("v1-")).head
      // plant a CONFLICTING partition layout inside the version dir: a
      // whole-dir partition inference must now fail (conflicting
      // partition column names), so a read that still answers exactly
      // proves it never looked
      val poison = new java.io.File(dir, "other=1")
      assert(poison.mkdir())
      val junk = new java.io.File(poison, "junk.parquet")
      java.nio.file.Files.write(junk.toPath,
        Array.fill[Byte](64)(0x5A))
      // expected failure types only (r17, ADVICE item): a fatal error
      // (OOM, linkage) must FAIL the suite, not count as "poison works"
      val poisoned =
        try { spark.read.parquet(dir.getAbsolutePath).count(); false }
        catch {
          // expected analysis/runtime refusals only — a fatal error (OOM,
          // linkage) must fail the suite, not count as "poison works".
          // The observed refusal is a SparkThrowable Exception
          // ([CONFLICTING_PARTITION_COLUMN_NAMES]); scala.util.control
          // .NonFatal-style matching on Exception keeps Errors fatal.
          case e: Exception
              if e.isInstanceOf[org.apache.spark.SparkThrowable] ||
                e.isInstanceOf[java.io.IOException] => true
        }
      assert(poisoned,
        "the planted layout must actually break whole-dir inference — " +
          "otherwise this pin proves nothing")
      assert(contents(root.toString, 1) ===
        Set((1L, "a", "one"), (2L, "b", "two")))
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("pruned readAtWhere scans name only the surviving splits' files") {
    val root = freshRoot()
    try {
      val rows = (0L until 40L).map(i =>
        (i, s"s${i / 5}", s"text-$i", i))
      Snapshots.commitFull(spark, df(rows), root.toString,
        statsCols = Seq("n_tokens"))
      // n_tokens within split s_k is [5k, 5k+4] — disjoint ranges, so
      // the predicate n_tokens = 9 survives only split s1
      val pruned = Snapshots.readAtWhere(spark, root.toString, 1,
        col("n_tokens") === 9)
      assert(pruned.collect().map(_.getLong(0)).toSet === Set(9L))
      val files = pruned.inputFiles
      assert(files.nonEmpty)
      assert(files.forall(_.contains("/split=s1/")),
        s"a pruned scan must LIST only surviving splits, got: " +
          files.filterNot(_.contains("/split=s1/")).take(3).mkString(", "))
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("splitLeafPaths refuses values that cannot round-trip") {
    // empty string writes as the Hive default-partition dir and reads
    // back NULL — hand-building `split=` would silently read nothing,
    // so the helper must stand the whole read down to the legacy
    // whole-dir path instead
    assert(Snapshots.splitLeafPaths("/r", "v1-x", Seq("a", "")).isEmpty)
    assert(Snapshots.splitLeafPaths("/r", "v1-x", Seq(null)).isEmpty)
    // and the happy path is deterministic (sorted) and escaped
    assert(Snapshots.splitLeafPaths("/r", "v1-x", Seq("b", "a/b")) ===
      Some(Seq("/r/v1-x/split=a%2Fb", "/r/v1-x/split=b")))
  }
}
