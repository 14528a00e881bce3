package graft

import scala.collection.mutable

/** Dev tool (optimization rounds): run ONE named SparkEntry gate and print a
  * per-JOB cost table — duration, description/call-site, task count, input
  * bytes, shuffle read/write — so a multi-action gate (a lifecycle commit
  * chain, a streaming sync harness) can be attributed job by job instead of
  * guessed at from its total.
  *
  *   sbt "runMain graft.ProfileGate d_corpus_docindex"     # env as Bench
  *
  * Methodology matches Bench: one untimed warm-up pass (JIT, codegen,
  * footer cache), then one profiled pass. Listener delivery is async, so
  * the table is flushed after a short drain sleep.
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileGate <query>"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.Sessions.local(cpus)
    val sc = spark.sparkContext

    final case class JobRow(id: Int, var desc: String, var start: Long,
        var end: Long, var tasks: Int, var input: Long, var sr: Long,
        var sw: Long, var stages: Int)
    val jobs = mutable.LinkedHashMap[Int, JobRow]()
    val stageToJob = mutable.HashMap[Int, Int]()
    var profiling = false

    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (profiling) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          jobs.synchronized {
            jobs(j.jobId) = JobRow(j.jobId, desc, j.time, 0L, 0, 0L, 0L, 0L,
              j.stageIds.length)
            j.stageIds.foreach(sid => stageToJob(sid) = j.jobId)
          }
        }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(j.jobId).foreach(_.end = j.time) }
      override def onStageCompleted(
          sc0: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for {
            jid <- stageToJob.get(sc0.stageInfo.stageId)
            row <- jobs.get(jid)
            m = sc0.stageInfo.taskMetrics if m != null
          } {
            row.tasks += sc0.stageInfo.numTasks
            row.input += m.inputMetrics.bytesRead
            row.sr += m.shuffleReadMetrics.totalBytesRead
            row.sw += m.shuffleWriteMetrics.bytesWritten
          }
        }
    })

    val fn = SparkEntry.queries(name)
    // warm-up (untimed, unprofiled)
    try fn(spark, sfDir).count()
    finally spark.streams.active.foreach { q =>
      try q.stop() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    profiling = true
    val t0 = System.nanoTime()
    val qe = fn(spark, sfDir).queryExecution
    qe.executedPlan
    val t1 = System.nanoTime()
    qe.toRdd.count()
    val t2 = System.nanoTime()
    profiling = false
    Thread.sleep(500) // drain async listener events

    def mb(b: Long) = f"${b / 1e6}%9.1f"
    System.err.println(f"[profile] $name total=${(t2 - t0) / 1e9}%.3fs " +
      f"(plan=${(t1 - t0) / 1e9}%.3fs exec=${(t2 - t1) / 1e9}%.3fs) " +
      s"jobs=${jobs.size}")
    System.err.println("[profile]   ms  tasks stages   inputMB  shufRdMB  shufWrMB  description")
    var acct = 0L
    jobs.values.foreach { r =>
      val ms = if (r.end > 0) r.end - r.start else -1
      if (ms > 0) acct += ms
      System.err.println(f"[profile] ${ms}%5d ${r.tasks}%6d ${r.stages}%6d " +
        f"${mb(r.input)} ${mb(r.sr)} ${mb(r.sw)}  ${r.desc.take(110)}")
    }
    System.err.println(f"[profile] job-accounted=${acct / 1e3}%.3fs of " +
      f"${(t2 - t0) / 1e9}%.3fs (gap = driver-side/planning/fs)")
    spark.stop()
  }
}
