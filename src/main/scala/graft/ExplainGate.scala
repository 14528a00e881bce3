package graft

/** Dev tool (optimization rounds): print `.explain("formatted")` for one or
  * more named SparkEntry gates to stdout, delimited per gate — the source of
  * the committed `plans/r16/<query>_{before,after}.txt` artifacts.
  *
  *   sbt "runMain graft.ExplainGate q1_agg r_percentiles"   # env as Bench
  *
  * Note: orchestration gates (lifecycle commits, streaming syncs) do their
  * work in the BUILDER via intermediate actions; this prints the plan of the
  * RETURNED frame, which for those is the post-checkpoint read — the
  * interesting plans there are the internal ones, captured separately where
  * a claim depends on them.
  */
object ExplainGate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainGate <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.Sessions.local(cpus)
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      spark.streams.active.foreach { q =>
        try q.stop() catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
