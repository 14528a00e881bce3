package graft


/** Dev tool: time one named SparkEntry query — the single-query loop of
  * [[Bench]] (same warm-up + median-of-iters + toRdd methodology) for
  * iterating on a plan without paying for the full inventory.
  *
  *   sbt "runMain graft.BenchOne d_curation_pipeline"    # env as Bench
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [iters]"))
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.Sessions.local(cpus)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up
    spark.streams.active.foreach { q => try q.stop() catch { case _: Throwable => () } }
    val samples = Seq.fill(iters) {
      val t0 = System.nanoTime()
      val qe = fn(spark, sfDir).queryExecution
      qe.executedPlan
      val t1 = System.nanoTime()
      qe.toRdd.count()
      val t2 = System.nanoTime()
      ((t2 - t0) / 1e9, (t1 - t0) / 1e9)
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val med = samples.map(_._1).sorted.apply(iters / 2)
    println(s"[benchone] $name median=${fmt(med)}s " +
      s"samples=${samples.map(s => fmt(s._1)).mkString(",")} " +
      s"plan=${samples.map(s => fmt(s._2)).mkString(",")}")
    spark.stop()
  }
}
