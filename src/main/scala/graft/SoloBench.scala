package graft
import org.apache.spark.sql.SparkSession
object SoloBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // explicit: the hot corpus joins (minhash/simhash verify) depend
      // on AQE's runtime skew split for their 100 TB posture (SkewSpec pin)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      System.err.println(f"[solo] $name iter$i rows=$n t=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
