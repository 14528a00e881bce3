package graft.streaming

import org.apache.spark.sql.functions._

/** Bench-attribution diagnostic (the SCALE.md round-13 instrument): a
  * per-micro-batch duration breakdown — Spark's StreamingQueryProgress
  * `durationMs` and state-operator metrics — for the stateful streaming
  * gate shape, under the same harness settings the gates use. Run it to
  * separate "the gate got slower" into planning / addBatch / state
  * commit / output flush before touching any gate code:
  *
  *   SPARK_GRAFT_PROF_PARTS=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.streaming.ProfileStreaming"
  */
object ProfileStreaming {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(32)
    val hs = spark.newSession()
    hs.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_PROF_PARTS", "1"))
    hs.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    import java.nio.file.{Files, Paths, StandardCopyOption}
    // RAM-backed scratch when the host has one (the gates' harnessTmpDir
    // posture), default temp dir otherwise
    val scratchRoot = {
      val shm = Paths.get("/dev/shm")
      if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm) else None
    }
    def runOnce(label: String): Unit = {
      val tmp = scratchRoot match {
        case Some(r) => Files.createTempDirectory(r, "graft_prof")
        case None => Files.createTempDirectory("graft_prof")
      }
      val inDir = tmp.resolve("in")
      Files.createDirectories(inDir)
      Files.copy(Paths.get(dir, "events.parquet"), inDir.resolve("part-a.parquet"))
      val maxTs = hs.read
        .schema(EventPipeline.rawSchema)
        .parquet(inDir.resolve("part-a.parquet").toString)
        .agg(max(col("ts"))).head().getAs[java.time.LocalDateTime](0)
      val name = s"prof_${System.nanoTime()}"
      val t0 = System.nanoTime()
      val q = EventPipeline.sessionWindow(
          EventPipeline.readEventStream(hs, inDir.toString))
        .writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", tmp.resolve("ckpt").toString).start()
      q.processAllAvailable()
      val t1 = System.nanoTime()
      var n = 0
      Seq(2L * 3600, 2L * 3600 + 1).foreach { offsetSec =>
        n += 1
        val staged = tmp.resolve(s"part-z$n.parquet.staged")
        SentinelFiles.writeEvents(staged, Seq(
          (-n.toLong, maxTs.plusSeconds(offsetSec), -1L, "sentinel", 0.0, "{}")))
        Files.move(staged, inDir.resolve(s"part-z$n.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
        q.processAllAvailable()
      }
      val t2 = System.nanoTime()
      q.stop()
      val t3 = System.nanoTime()
      val cnt = hs.table(name).filter(col("user_id") >= 0).count()
      val t4 = System.nanoTime()
      println(f"== $label rows=$cnt batch0=${(t1 - t0) / 1e9}%.2f " +
        f"sentinels=${(t2 - t1) / 1e9}%.2f stop=${(t3 - t2) / 1e9}%.2f " +
        f"read=${(t4 - t3) / 1e9}%.2f")
      q.recentProgress.foreach { p =>
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"    state: rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"updateMs=${so.allUpdatesTimeMs} commitMs=${so.commitTimeMs} " +
            s"mem=${so.memoryUsedBytes}")
        }
      }
      hs.catalog.dropTempView(name): Unit
      graft.plans.CorpusExport.deleteRecursively(tmp.toFile)
    }
    runOnce("warm1")
    runOnce("warm2")
    runOnce("timed")
    spark.stop()
  }
}
