package graft
object SoloBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val spark = graft.core.Sessions.local(32)
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      System.err.println(f"[solo] $name iter$i rows=$n t=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
