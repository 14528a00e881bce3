package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Drives the streaming pipelines synchronously with the file source +
  * memory sink (two input files → two triggers, so the watermark advances
  * and event-time timeouts fire). Asserts stream/batch parity against the
  * equivalent batch operators. */
class StreamingSpec extends SparkTestBase {

  private val inDir = "target/stream_test/in"

  /** Split sf0.001 events into two time-ordered parquet files. */
  private def prepareInput(): Unit = {
    val fs = new java.io.File(inDir)
    org.apache.commons.io.FileUtils.deleteQuietly(fs)
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val cut = events.selectExpr("percentile(cast(ts as double), 0.5)").head().getDouble(0)
    // write back in the raw file layout: ts re-encoded as TIMESTAMP_NTZ
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.select(
          col("event_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$inDir/../tmp_$name")
    dump(events.filter(col("ts").cast("double") <= cut), "a")
    dump(events.filter(col("ts").cast("double") > cut), "b")
    fs.mkdirs()
    def move(name: String, target: String): Unit = {
      val src = new java.io.File(s"$inDir/../tmp_$name")
      val p = src.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(p.toPath, new java.io.File(s"$inDir/$target").toPath)
    }
    move("a", "part-a.parquet")
    move("b", "part-b.parquet")
  }

  test("streaming windowed counts match the batch events-window aggregation") {
    prepareInput()
    val stream = EventPipeline.readEventStream(spark, inDir)
    val q = EventPipeline.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = stream.sparkSession.table("win_out")
      .select(col("hour"), col("event_type"), col("n"), col("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val expected = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.queries.Exact.dec2(col("value"))).cast("double").as("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("streaming dedup removes in-watermark duplicates; stream-static join enriches") {
    prepareInput()
    // plant a full duplicate file: part-a again under a new name
    java.nio.file.Files.copy(
      new java.io.File(s"$inDir/part-a.parquet").toPath,
      new java.io.File(s"$inDir/part-a-dup.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val stream = EventPipeline.readEventStream(spark, inDir)
    val deduped = EventPipeline.dedupWithinWatermark(stream, Seq("event_id"))
    val customers = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = EventPipeline.enrichWithDim(deduped, customers,
      "user_id", "c_custkey")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val expected = events.join(customers, col("user_id") === col("c_custkey")).count()
    val got = stream.sparkSession.table("dedup_out").count()
    assert(got == expected, s"got $got expected $expected") // dups gone, join applied
    // and without dedup the duplicate file would inflate the count
    assert(got < expected * 2)
    new java.io.File(s"$inDir/part-a-dup.parquet").delete()
  }

  test("sessionizeSync: sentinel-flushed stream EQUALS the batch sessionizer") {
    val got = EventPipeline.sessionizeSync(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val batch = graft.queries.Relational.sessionize(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(got == batch,
      s"stream≠batch: missing ${batch.diff(got).take(3)}, extra ${got.diff(batch).take(3)}")
  }

  test("streamed day layout: partitions equal the batch writer's content, pruning binds") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_day_layout_spec")
    try {
      val q = EventPipeline.dayLayoutStream(
          EventPipeline.readEventStream(spark, dir, globFilter = Some("events.parquet")),
          tmp.resolve("days").toString)
        .option("checkpointLocation", tmp.resolve("ckpt").toString).start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.read.parquet(tmp.resolve("days").toString)
      val batch = graft.Tables.load(spark, dir, "events")
      assert(streamed.count() === batch.count())
      // per-day rows equal the batch date grouping
      val sDays = streamed.groupBy(col("event_date")).count()
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val bDays = batch.groupBy(to_date(col("ts")).as("d")).count()
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(sDays === bDays)
      // a one-day probe of the STREAMED layout is partition-pruned
      val d0 = batch.agg(min(to_date(col("ts")))).head().getDate(0).toLocalDate
      val probe = graft.plans.EventsLayout.readDayWindow(
        spark, tmp.resolve("days").toString, d0.plusDays(1), 1)
      val scan = probe.queryExecution.executedPlan
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(scan.nonEmpty && scan.head.metadata("PartitionFilters").contains("event_date"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  test("builtin session_window EQUALS the custom flatMapGroupsWithState sessionizer") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val builtin = rows(EventPipeline.sessionWindowSync(spark, "/root/testdata/sf0.001"))
    val custom = rows(EventPipeline.sessionizeSync(spark, "/root/testdata/sf0.001"))
    assert(builtin == custom,
      s"builtin≠custom: missing ${custom.diff(builtin).take(3)}, extra ${builtin.diff(custom).take(3)}")
    assert(builtin.nonEmpty)
  }

  test("funnelSync: sentinel-flushed stream EQUALS the batch funnel counts") {
    val got = EventPipeline.funnelSync(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.queries.Relational.funnel(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === batch)
    // and the window actually binds on the fixtures
    assert(got("2_click") < got("1_signup"))
  }

  test("funnelStages: a repeat signup inside the tombstone horizon cannot double-count") {
    import spark.implicits._
    val windowUs = 3600L * 1000000L // 1h funnel window
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_tomb")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectories(in)
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 12, 0, 0)
    def dump(target: String,
        rows: Seq[(Long, java.time.LocalDateTime, Long, String, Double, String)]): Unit = {
      val tmp = dir.resolve(s"tmp_$target")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val p = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(p.toPath, in.resolve(target))
    }
    // batch A: user 7 completes the funnel → one stage-3 row emits
    dump("part-a.parquet", Seq(
      (1L, t0, 7L, "signup", 0.0, "{}"),
      (2L, t0.plusSeconds(60), 7L, "click", 0.0, "{}"),
      (3L, t0.plusSeconds(120), 7L, "purchase", 5.0, "{}")))
    val name = s"funnel_tomb_${System.nanoTime()}"
    val q = EventPipeline.funnelStages(
        spark, EventPipeline.readEventStream(spark, in.toString,
          maxFilesPerTrigger = Some(1)), windowUs)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", dir.resolve("ckpt").toString).start()
    try {
      q.processAllAvailable()
      // batch B: the SAME user signs up again inside the tombstone horizon
      // (purchase + window) — without the tombstone this restarts the
      // funnel and emits a second stage-3 row
      dump("part-b.parquet", Seq(
        (4L, t0.plusSeconds(600), 7L, "signup", 0.0, "{}"),
        (5L, t0.plusSeconds(660), 7L, "click", 0.0, "{}"),
        (6L, t0.plusSeconds(720), 7L, "purchase", 5.0, "{}")))
      q.processAllAvailable()
      // sentinels: watermark past every deadline → tombstone reclaimed
      dump("part-c.parquet", Seq((-1L, t0.plusSeconds(3 * 3600), -1L, "sentinel", 0.0, "{}")))
      q.processAllAvailable()
      dump("part-d.parquet", Seq((-2L, t0.plusSeconds(3 * 3600 + 1), -1L, "sentinel", 0.0, "{}")))
      q.processAllAvailable()
      val rows = spark.table(name).collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(rows.toSeq === Seq((7L, 3)),
        s"user 7 must convert exactly once, got ${rows.mkString(",")}")
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("lineFilterSync: streamed boilerplate drop EQUALS the batch operator") {
    val dir = "/root/testdata/sf0.001"
    val got = EventPipeline.lineFilterSync(spark, dir)
      .collect().map(_.mkString("|")).toSet
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val page = graft.queries.LlmOps.gopherPage
    val boiler = graft.operators.Lines.boilerplate(
      docs.filter(col("doc_id") % 4 =!= 0), "doc_id", page,
      graft.queries.LlmOps.LineDedupMinDocs)
    val batch = graft.operators.Lines.dropAgainst(
        docs.filter(col("doc_id") % 4 === 0), "doc_id", page, boiler)
      .collect().map(_.mkString("|")).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("jdbcSinkSync: exactly-once streamed JDBC sink equals the source after a replay") {
    val got = EventPipeline.jdbcSinkSync(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected,
      s"sunk table diverges from source: missing ${expected.diff(got).take(3)}, " +
        s"extra ${got.diff(expected).take(3)} — a broken ledger skip doubles counts")
    assert(got.nonEmpty)
  }

  test("decontamSync: streamed ingest decontamination EQUALS the batch protocol") {
    val dir = "/root/testdata/sf0.001"
    val got = EventPipeline.decontamSync(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val m = graft.queries.LlmOps.DecontEvalMod
    val batch = graft.operators.Decontaminate.overlapNgrams(
        docs.filter(col("doc_id") % m =!= 0),
        docs.filter(col("doc_id") % m === 0),
        "doc_id", "text", n = graft.queries.LlmOps.DecontGramK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == batch,
      s"stream≠batch: missing ${batch.diff(got).take(3)}, extra ${got.diff(batch).take(3)}")
    // the verdict must actually split the corpus (fixture plants overlaps)
    assert(got.exists(_._3 == 1), "no contaminated doc flagged")
    assert(got.exists(_._3 == 0), "every doc flagged — the verdict is vacuous")
  }

  test("curationFilterSync: streamed quality tier EQUALS the batch filters") {
    val got = EventPipeline.curationFilterSync(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventPipeline.curationFilterStream(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == batch,
      s"stream≠batch: missing ${batch.diff(got).take(3)}, extra ${got.diff(batch).take(3)}")
    assert(got.nonEmpty)
  }

  test("probeScoreSync: stream-deployed frozen weights EQUAL batch scoring, margins bit-exact") {
    val dir = "/root/testdata/sf0.001"
    val got = EventPipeline.probeScoreSync(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // batch twin: the same frozen weights applied to a batch read
    val w = graft.queries.LlmOps.trainedProbeWeights(spark, dir)
    val batch = EventPipeline.probeScoreStream(
        spark.read.parquet(s"$dir/documents.parquet"), w,
        graft.queries.LlmOps.ProbeGateMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == batch,
      s"stream≠batch: missing ${batch.diff(got).take(3)}, extra ${got.diff(batch).take(3)}")
    assert(got.nonEmpty)
    // the gate admits a strict, non-empty subset (the margin binds)
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(got.size < total, "margin threshold must reject someone")
  }

  test("nearDupIngestSync: streamed admission EQUALS the batch operator") {
    val dir = "/root/testdata/sf0.001"
    val got = EventPipeline.nearDupIngestSync(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val batch = graft.operators.Dedup.nearDupAgainstCorpus(
        d.filter(pmod(col("doc_id"), lit(7)) === 0),
        d.filter(pmod(col("doc_id"), lit(7)) =!= 0),
        "doc_id", "text")
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == batch,
      s"stream≠batch: missing ${batch.diff(got).take(3)}, extra ${got.diff(batch).take(3)}")
    assert(got.nonEmpty)
  }

  test("bloomIngestSync: bloom-routed streamed admission EQUALS the batch operator") {
    val dir = "/root/testdata/sf0.001"
    val got = EventPipeline.bloomIngestSync(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val batch = graft.operators.Dedup.bloomDedupAgainstCorpus(
        d.filter(pmod(col("doc_id"), lit(5)) === 0),
        d.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        "text", numBits = 1 << 16, numProbes = 4)
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == batch,
      s"stream≠batch: missing ${batch.diff(got).take(3)}, extra ${got.diff(batch).take(3)}")
    assert(got.nonEmpty)
  }

  test("attributionJoinSync: stream-stream join EQUALS the batch time-range join") {
    val dir = "/root/testdata/sf0.001"
    val got = EventPipeline.attributionJoinSync(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    // batch twin: the identical time-range join over the batch loader
    val ev = graft.Tables.load(spark, dir, "events")
    val batch = EventPipeline.attributionJoin(ev)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == batch,
      s"stream≠batch: missing ${batch.diff(got).take(3)}, extra ${got.diff(batch).take(3)}")
    assert(got.nonEmpty, "no attributed purchases — fixture should have ≥1 pair")
    // window semantics: every gap is within [0, 30 min], boundary inclusive
    assert(got.forall { case (_, _, _, gapUs, _) =>
      gapUs >= 0 && gapUs <= 30L * 60 * 1000000 })
  }

  test("attributionJoinOuterSync: outer stream-stream join EQUALS the batch LEFT join") {
    val dir = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4))
    val got = EventPipeline.attributionJoinOuterSync(spark, dir)
      .collect().map(key).toSet
    val ev = graft.Tables.load(spark, dir, "events")
    val batch = EventPipeline.attributionJoinOuter(ev).collect().map(key).toSet
    assert(got == batch,
      s"stream≠batch: missing ${batch.diff(got).take(3)}, extra ${got.diff(batch).take(3)}")
    // the point of the outer variant: click-less purchases ARE present
    val unmatched = got.filter(_._2.isEmpty)
    assert(unmatched.nonEmpty,
      "fixture should contain ≥1 click-less purchase emitted with null click columns")
    // reconciliation invariant: one row per purchase-with-no-click, and every
    // purchase id from the inner join is still here
    val inner = EventPipeline.attributionJoin(ev)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1) == inner ++ unmatched.map(_._1))
  }

  test("annIngestSync: streamed index ingest ≡ batch appendToIvfIndex; replayed batches never duplicate") {
    val dir = "/root/testdata/sf0.001"
    val got = EventPipeline.annIngestSync(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // batch twin: writeIvfIndex(even) + appendToIvfIndex(odd) + same probe
    val idx = java.nio.file.Files.createTempDirectory("graft_ann_batch_twin")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val base = e.filter(pmod(col("vec_id"), lit(2)) === 0)
      val odd = e.filter(pmod(col("vec_id"), lit(2)) =!= 0)
      val cents = graft.operators.Similarity.writeIvfIndex(
        base, "vec_id", "embedding", idx.toString,
        nCells = 16, refineIters = graft.queries.LlmOps.IvfKmeansIters)
      graft.operators.Similarity.appendToIvfIndex(
        odd, "vec_id", "embedding", idx.toString, cents)
      val query = e.orderBy(col("vec_id").asc).limit(1)
        .select(col("embedding")).head().getSeq[Float](0)
      val batch = graft.operators.Similarity.ivfTopKFromIndex(
        spark, idx.toString, cents, "vec_id", "embedding", query, k = 20, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == batch, "streamed ingest must probe identically to the batch append")

      // idempotency: replaying an already-committed batch tag is a no-op,
      // and a fresh tag re-appending the same rows overwrites nothing
      val before = spark.read.parquet(idx.toString).count()
      graft.operators.Similarity.appendBatchToIvfIndex(
        odd, "vec_id", "embedding", idx.toString, cents, "replay1")
      val afterFirst = spark.read.parquet(idx.toString).count()
      assert(afterFirst == before + odd.count())
      val applied = graft.operators.Similarity.appendBatchToIvfIndex(
        odd, "vec_id", "embedding", idx.toString, cents, "replay1")
      assert(!applied, "a committed batch tag must be refused")
      assert(spark.read.parquet(idx.toString).count() == afterFirst,
        "replaying a committed batch must not change the index")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(idx.toFile)
    }
  }

  test("streaming sessionize emits sessions consistent with the batch operator") {
    prepareInput()
    val stream = EventPipeline.readEventStream(spark, inDir, maxFilesPerTrigger = Some(1))
    val q = EventPipeline.sessionize(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = stream.sparkSession.table("sess_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(got.nonEmpty, "no sessions emitted — watermark/timeout path never fired")

    val batch = graft.queries.Relational.sessionize(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    // append mode only emits sessions closed by an observed gap or timeout →
    // everything emitted must exist identically in the batch result
    val diff = got.diff(batch)
    assert(diff.isEmpty, s"streamed sessions not in batch result: ${diff.take(3)}")
  }
}
