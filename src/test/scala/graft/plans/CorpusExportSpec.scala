package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusExportSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("export writes a split-partitioned corpus whose content equals the pipeline") {
    val out = java.nio.file.Files.createTempDirectory("graft_export_spec")
    try {
      val manifest = CorpusExport.writeCurated(spark, dir, out.toString)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // physical layout: split partition directories
      val dirs = new java.io.File(s"$out/corpus").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.exists(_.startsWith("split=")), s"no split partitions in $dirs")
      // read-back ids equal the curated survivors exactly
      val written = spark.read.parquet(s"$out/corpus")
      val wIds = written.select("doc_id").collect().map(_.getLong(0)).toSet
      val cIds = graft.queries.LlmOps.curationPipeline(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(wIds == cIds, s"written ids diverge: extra ${wIds.diff(cIds).take(3)}")
      // no document lands in two splits; text column rides along
      assert(written.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)
      assert(written.columns.contains("text"))
      // the sidecar manifest agrees with the returned (read-back) manifest
      // on BOTH doc counts and token totals
      val sidecar = spark.read.json(s"$out/_manifest")
        .collect().map(r => (r.getAs[String]("split"), r.getAs[String]("lang"))
          -> (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))).toMap
      assert(sidecar == manifest, s"sidecar $sidecar != read-back $manifest")
    } finally CorpusExport.deleteRecursively(out.toFile)
  }

  test("incremental re-export: unchanged corpus writes ZERO files; a tampered base yields exactly its delta") {
    val out = java.nio.file.Files.createTempDirectory("graft_export_inc")
    try {
      def partFiles(dir: String): Seq[java.io.File] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else if (f.getName.startsWith("part-")) Seq(f) else Seq.empty
        walk(new java.io.File(dir))
      }
      def manifestMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val m0 = manifestMap(CorpusExport.writeCurated(spark, dir, out.toString))

      // 1) unchanged snapshot: the delta holds no corpus files at all, yet
      //    the returned (logical, read-back) manifest still verifies
      val m1 = manifestMap(CorpusExport.writeCuratedDelta(spark, dir, out.toString))
      assert(partFiles(s"$out/delta").isEmpty,
        s"unchanged re-export wrote ${partFiles(s"$out/delta")}")
      assert(m1 == m0, s"logical manifest drifted: $m1 != $m0")

      // 2) tamper the base: modify one doc's text and plant a stale doc the
      //    fresh curation no longer contains
      val base = spark.read.parquet(s"$out/corpus")
      val victim = base.select("doc_id").orderBy("doc_id").head().getLong(0)
      val tampered = base
        .withColumn("text",
          when(col("doc_id") === victim, lit("tampered")).otherwise(col("text")))
        .unionByName(base.filter(col("doc_id") === victim)
          .withColumn("doc_id", lit(999999999L)))
        .localCheckpoint(true) // break file lineage so overwrite-in-place is safe
      tampered.write.mode("overwrite").partitionBy("split")
        .parquet(s"$out/corpus")

      // 3) the delta re-export writes EXACTLY the modified doc, records the
      //    stale doc as removed, and the logical manifest equals a fresh
      //    export's again
      val m2 = manifestMap(CorpusExport.writeCuratedDelta(spark, dir, out.toString))
      val deltaIds = spark.read.parquet(s"$out/delta")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(deltaIds == Seq(victim), s"delta should hold exactly $victim: $deltaIds")
      val removedIds = spark.read.schema("doc_id long").json(s"$out/_removed")
        .collect().map(_.getLong(0)).toSeq
      assert(removedIds == Seq(999999999L), s"removed: $removedIds")
      assert(m2 == m0, s"repaired logical manifest drifted: $m2 != $m0")

      // 4) APPLY the delta: the updated on-disk corpus equals the fresh
      //    export logically, and splits untouched by the delta keep their
      //    EXACT files (name + size + mtime)
      def listing(sp: String): Set[(String, Long, Long)] = {
        val d = new java.io.File(s"$out/corpus/split=$sp")
        if (!d.exists()) Set.empty
        else d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }
      val victimSplit = spark.read.parquet(s"$out/corpus")
        .filter(col("doc_id") === victim).select("split")
        .head().getString(0)
      val staleSplit = spark.read.parquet(s"$out/corpus")
        .filter(col("doc_id") === 999999999L).select("split")
        .head().getString(0)
      val untouched = Set("train", "val", "test") - victimSplit - staleSplit
      val before = untouched.map(sp => sp -> listing(sp)).toMap
      val m3 = manifestMap(CorpusExport.applyDelta(spark, out.toString))
      assert(m3 == m0, s"applied corpus manifest drifted: $m3 != $m0")
      untouched.foreach { sp =>
        assert(listing(sp) == before(sp),
          s"split=$sp was rewritten though the delta never touched it")
      }
      // the tampered doc is repaired and the stale doc gone ON DISK
      val applied = spark.read.parquet(s"$out/corpus")
      assert(applied.filter(col("doc_id") === 999999999L).isEmpty)
      assert(applied.filter(col("doc_id") === victim)
        .head().getAs[String]("text") != "tampered")
    } finally CorpusExport.deleteRecursively(out.toFile)
  }

  /** The design point of the ONE-JOB apply rewrite: a corpus keyed finer
    * than train/val/test (here 40 day-like partitions, 25 of them touched
    * by the delta) must rewrite all affected partitions in one Spark data
    * job — a per-partition loop would launch ~25 sequential jobs and
    * serialize a real corpus's rewrite on the driver. Job count is
    * observed via a listener; untouched partitions keep their exact
    * files; the applied state equals base − removed + delta exactly. */
  test("applyDelta rewrites 25 affected partitions in O(1) jobs, not O(partitions)") {
    val s = spark.newSession()
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_apply_many")
    try {
      // 40-partition corpus: split = d00..d39, 10 docs each
      def mk(ids: Seq[Long]) = ids.map { i =>
        (i, "en", 10L + i % 7, s"doc $i body", f"d${i % 40}%02d")
      }.toDF("doc_id", "lang", "n_tokens", "text", "split")
      mk(0L until 400L).write.mode("overwrite")
        .partitionBy("split").parquet(s"$out/corpus")

      // delta: docs 0..24 modified — their splits are d00..d24, so 25
      // affected partitions; plus 5 removals confined to those splits
      // (distinct docs 41..45 → splits d01..d05, already affected)
      val deltaIds = (0L until 25L).toSeq
      mk(deltaIds).withColumn("text", concat(col("text"), lit(" v2")))
        .write.mode("overwrite").partitionBy("split").parquet(s"$out/delta")
      val removedIds = Seq(41L, 42L, 43L, 44L, 45L)
      removedIds.toDF("doc_id").coalesce(1)
        .write.mode("overwrite").json(s"$out/_removed")

      def listing(sp: String): Set[String] =
        Option(new java.io.File(s"$out/corpus/split=$sp").listFiles())
          .map(_.map(_.getName).filter(_.endsWith(".parquet")).toSet)
          .getOrElse(Set.empty)
      val untouched = (25 until 40).map(i => f"d$i%02d")
      val before = untouched.map(sp => sp -> listing(sp)).toMap

      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
        }
      }
      s.sparkContext.addSparkListener(listener)
      try {
        CorpusExport.applyDelta(s, out.toString).collect(): Unit
        Thread.sleep(200) // listener delivery is async; jobs only undercount
      } finally s.sparkContext.removeSparkListener(listener)

      // fixed job count: 2 affected-split collects + 1 staged write + the
      // manifest checkpoint, each fanned into a few AQE stage-jobs
      // (measured 16 here) — NEVER one data job per affected partition
      // (a per-partition loop would exceed 25 before the manifest runs)
      assert(jobs.get() < 25,
        s"applyDelta launched ${jobs.get()} jobs for 25 affected partitions — per-partition loop?")

      untouched.foreach { sp =>
        assert(listing(sp) == before(sp), s"untouched split=$sp was rewritten")
      }
      assert(!new java.io.File(s"$out/corpus/.apply_delta.staging").exists(),
        "staging root must not survive the apply")

      // applied state ≡ base − removed + delta (modified docs carry ' v2')
      val applied = s.read.parquet(s"$out/corpus")
      assert(applied.count() === 400L - removedIds.length)
      assert(applied.filter(col("doc_id").isin(removedIds: _*)).isEmpty)
      val modified = applied.filter(col("text").endsWith(" v2"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(modified === deltaIds.toSet)

      // crash-safety refusal: a stranded .bak whose live partition is GONE
      // is a previous run's failed rollback still holding the only copy —
      // applyDelta must refuse loudly instead of rewriting over it, and
      // BEFORE paying for the staged rewrite (no staging root appears)
      val sp = "d07"
      val live = new java.io.File(s"$out/corpus/split=$sp")
      val bak = new java.io.File(s"$out/corpus/.split=$sp.bak")
      assert(live.renameTo(bak), "test setup: simulate the failed rollback")
      val ex = intercept[java.io.IOException](CorpusExport.applyDelta(s, out.toString))
      assert(ex.getMessage.contains("recover it first"))
      assert(bak.exists(), "the only copy must survive the refusal")
      assert(!new java.io.File(s"$out/corpus/.apply_delta.staging").exists(),
        "the refusal must fire before any rewrite job")
      assert(bak.renameTo(live), "manual recovery restores the partition")
    } finally CorpusExport.deleteRecursively(out.toFile)
  }

  /** Partition values that Spark ESCAPES in directory names (':' → %3A
    * etc): the live corpus and the staged rewrite both use the escaped
    * form, so applyDelta must address partitions through the same
    * escaping — a raw-name lookup would miss the staged dir, take the
    * all-docs-removed fallback, and silently swap the partition away. */
  test("applyDelta is partition-path-escaping-safe (split values with ':' and ' ')") {
    val s = spark.newSession()
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_apply_escape")
    try {
      def mk(ids: Seq[Long], text: Long => String) = ids.map { i =>
        (i, "en", 5L, text(i), if (i % 2 == 0) "day:1" else "part a/b")
      }.toDF("doc_id", "lang", "n_tokens", "text", "split")
      mk(0L until 20L, i => s"doc $i").write.mode("overwrite")
        .partitionBy("split").parquet(s"$out/corpus")
      // delta modifies docs 0 and 1 — one per escaped partition
      mk(Seq(0L, 1L), i => s"doc $i v2").write.mode("overwrite")
        .partitionBy("split").parquet(s"$out/delta")
      Seq(2L).toDF("doc_id").coalesce(1)
        .write.mode("overwrite").json(s"$out/_removed")

      val manifest = CorpusExport.applyDelta(s, out.toString)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
      // 19 docs survive: 10 even − 1 removed in day:1, 10 odd in "part a/b"
      assert(manifest === Set(("day:1", 9L, 45L), ("part a/b", 10L, 50L)))
      val applied = s.read.parquet(s"$out/corpus")
      assert(applied.count() === 19)
      assert(applied.filter(col("doc_id") === 2L).isEmpty)
      assert(applied.filter(col("text") === "doc 0 v2").count() === 1)
      assert(applied.filter(col("text") === "doc 1 v2").count() === 1)
    } finally CorpusExport.deleteRecursively(out.toFile)
  }

  /** A delta that removes EVERY remaining document leaves only fileless
    * partition dirs — the manifest must come back EMPTY (schema pinned
    * from the pre-apply base), not die in parquet schema inference. */
  test("applyDelta survives a fully-emptied corpus: empty manifest, no inference crash") {
    val s = spark.newSession()
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_apply_empty")
    try {
      val all = (0L until 12L).toSeq
      all.map(i => (i, "en", 3L, s"doc $i", s"d${i % 3}"))
        .toDF("doc_id", "lang", "n_tokens", "text", "split")
        .write.mode("overwrite").partitionBy("split").parquet(s"$out/corpus")
      // empty delta (zero rows, schema-carrying write) + remove everything
      s.read.parquet(s"$out/corpus").limit(0)
        .write.mode("overwrite").partitionBy("split").parquet(s"$out/delta")
      all.toDF("doc_id").coalesce(1)
        .write.mode("overwrite").json(s"$out/_removed")

      val manifest = CorpusExport.applyDelta(s, out.toString)
      assert(manifest.isEmpty, "manifest of an emptied corpus must be empty")
    } finally CorpusExport.deleteRecursively(out.toFile)
  }
}
