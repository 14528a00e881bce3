package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The orchestrated incremental day ([[IncrementalDay.ingestDay]]): the
  * zero-work invariant (an unchanged day writes NO delta part files and
  * NO index data files), the touched-cells bound (the append lands in
  * exactly the cells the day's vectors are assigned to, nothing else),
  * and in-run idempotence (replay refused) are pinned here; the answer
  * itself is the oracle-exact d_incremental_day gate. */
class IncrementalDaySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def countParquet(f: java.io.File): Long =
    Option(f.listFiles()).getOrElse(Array.empty).map {
      case d if d.isDirectory => countParquet(d)
      case p if p.getName.endsWith(".parquet") => 1L
      case _ => 0L
    }.sum

  test("an UNCHANGED day writes zero delta part files and zero index data files") {
    val root = java.nio.file.Files.createTempDirectory("graft_incr_zero")
    try {
      val d = spark.read.parquet(s"$sf/documents.parquet")
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val standing = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
      // the "unchanged day": new ids, but every document's CONTENT is
      // already in the standing corpus
      val incoming = standing.limit(50)
        .withColumn("doc_id", col("doc_id") + 100000L)
      val idx = s"$root/index"
      val cents = graft.operators.Similarity.writeIvfIndex(
        e.filter(pmod(col("vec_id"), lit(4)) =!= 0), "vec_id", "embedding",
        idx, nCells = 16, refineIters = 2)
      val idxFilesBefore = countParquet(new java.io.File(idx))

      val report = IncrementalDay.ingestDay(
        spark, incoming, standing,
        probeWeights = Seq.fill(64)(0.0), probeMargin = -1.0, // probe admits all
        splitRule = c => lit("train"),
        embeddings = e, indexPath = idx, centroids = cents,
        deltaPath = s"$root/delta", dayTag = "dayz",
        bloomBits = 1 << 16, bloomProbes = 4)

      assert(report.collect().isEmpty, "unchanged day must report an empty manifest")
      assert(countParquet(new java.io.File(s"$root/delta")) === 0L,
        "unchanged day must write zero delta part files")
      assert(countParquet(new java.io.File(idx)) === idxFilesBefore,
        "unchanged day must add zero index data files")
      // the commit marker still lands, so the day is replay-refusable
      assert(new java.io.File(idx, "_graft_ingest_dayz.committed").exists())
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("versioned day lifecycle: day N = version N+1, redelivery skipped, prior day reproducible") {
    val root = java.nio.file.Files.createTempDirectory("graft_incr_ver")
    try {
      val d = spark.read.parquet(s"$sf/documents.parquet")
      val standing = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
      val day1 = d.filter(pmod(col("doc_id"), lit(8)) === 0)
      val day2 = d.filter(pmod(col("doc_id"), lit(8)) === 4)
      val out = IncrementalDay.ingestDayVersioned(
        spark, standing, Seq("d1" -> day1, "d2" -> day2),
        probeWeights = Seq.fill(64)(0.0), probeMargin = -1.0, // probe admits all
        splitRule = c => lit("train"), root = root.toString,
        bloomBits = 1 << 16, bloomProbes = 4)
      // the run itself redelivers each day's tagged commit (in-method
      // require); the chain must still be exactly v1 + one per day
      assert(Snapshots.latestVersion(spark, root.toString) === 3)
      // day N = version N+1: v2 carries ONLY day-1 content, v3 both —
      // read back AFTER the v3 commit (the time-travel property)
      val ids2 = Snapshots.readAt(spark, root.toString, 2)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val ids3 = Snapshots.readAt(spark, root.toString, 3)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(ids2.nonEmpty && ids2.forall(_ % 8 == 0))
      assert(ids2.subsetOf(ids3))
      assert((ids3 -- ids2).nonEmpty && (ids3 -- ids2).forall(_ % 8 == 4))
      // the returned manifest labels exactly the two day versions
      assert(out.select(col("version")).distinct().collect()
        .map(_.getString(0)).toSet === Set("v2", "v3"))
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("a real day's append touches EXACTLY the cells its vectors are assigned to") {
    val root = java.nio.file.Files.createTempDirectory("graft_incr_cells")
    try {
      val d = spark.read.parquet(s"$sf/documents.parquet")
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val standing = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
      val incoming = d.filter(pmod(col("doc_id"), lit(4)) === 0)
      val idx = s"$root/index"
      val cents = graft.operators.Similarity.writeIvfIndex(
        e.filter(pmod(col("vec_id"), lit(4)) =!= 0), "vec_id", "embedding",
        idx, nCells = 16, refineIters = 2)
      val w = Seq.fill(64)(0.0) // frozen probe admitting everything: the
      // cell pin is about the APPEND, not the curation cut
      val report = IncrementalDay.ingestDay(
        spark, incoming, standing, w, probeMargin = -1.0,
        splitRule = c => lit("train"),
        embeddings = e, indexPath = idx, centroids = cents,
        deltaPath = s"$root/delta", dayTag = "day1",
        bloomBits = 1 << 16, bloomProbes = 4)
      val nDocs = report.agg(sum(col("n_docs"))).head().getLong(0)
      assert(nDocs > 0, "fixture day must admit documents")

      // cells holding day files on disk == in-memory assignment of the
      // day's vectors under the frozen centroids
      val onDisk = new java.io.File(idx).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .filter(_.listFiles().exists(_.getName.startsWith("ingest-day1-")))
        .map(_.getName.stripPrefix("cell=").toInt).toSet
      val deltaIds = spark.read.schema(
          "doc_id long, lang string, n_tokens long, quality double, " +
            "text string, split string")
        .parquet(s"$root/delta").select(col("doc_id").as("vec_id"))
      val expected = graft.operators.Similarity
        .withIvfCell(e.join(deltaIds, "vec_id"), "embedding", cents)
        .select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSet
      assert(onDisk === expected,
        s"append touched $onDisk but assignment says $expected")

      // crash recovery: a rerun of the SAME committed day (the driver
      // died after the index commit, the orchestrator retries) must
      // COMPLETE idempotently — same report, no duplicated index files —
      // not poison every retry with a hard failure
      val idxFiles = countParquet(new java.io.File(idx))
      val replay = IncrementalDay.ingestDay(
        spark, incoming, standing, w, probeMargin = -1.0,
        splitRule = c => lit("train"),
        embeddings = e, indexPath = idx, centroids = cents,
        deltaPath = s"$root/delta", dayTag = "day1",
        bloomBits = 1 << 16, bloomProbes = 4)
      assert(replay.agg(sum(col("n_docs"))).head().getLong(0) === nDocs)
      assert(countParquet(new java.io.File(idx)) === idxFiles,
        "a replayed day must not duplicate index vectors")

      // drift guard: replaying the SAME committed dayTag with DIFFERENT
      // data must refuse the day BEFORE touching the delta export — the
      // index would keep the old day's vectors while the delta flipped
      // to the new data
      val deltaFilesBefore = countParquet(new java.io.File(s"$root/delta"))
      val drifted = incoming.filter(pmod(col("doc_id"), lit(8)) === 0)
      val ex = intercept[graft.core.GraftAnalysisException] {
        IncrementalDay.ingestDay(
          spark, drifted, standing, w, probeMargin = -1.0,
          splitRule = c => lit("train"),
          embeddings = e, indexPath = idx, centroids = cents,
          deltaPath = s"$root/delta", dayTag = "day1",
          bloomBits = 1 << 16, bloomProbes = 4)
      }
      assert(ex.getMessage.contains("different"),
        s"drift refusal must name the mismatch: ${ex.getMessage}")
      assert(countParquet(new java.io.File(s"$root/delta")) === deltaFilesBefore,
        "a refused drifted replay must leave the delta export untouched")
    } finally CorpusExport.deleteRecursively(root.toFile)
  }
}
