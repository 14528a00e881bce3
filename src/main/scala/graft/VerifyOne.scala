package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump a subset of SparkEntry queries (comma-separated names) to
  * parquet + their oracle SQL, for a local DuckDB compare without running
  * the whole [[Verify]] inventory.
  *
  *   sbt "runMain graft.VerifyOne /root/testdata/sf0.001 /tmp/vout d_dedup_clusters"
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args.take(3)
    val wanted = names.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // explicit: the hot corpus joins (minhash/simhash verify) depend
      // on AQE's runtime skew split for their 100 TB posture (SkewSpec pin)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    wanted.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[verifyone] dumped $name")
    }
    // tools/check.py-compatible oracle map for just the dumped subset
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      Verify.oracleJson(
        SparkEntry.oracleSql.view.filterKeys(wanted.contains).toMap))
    spark.stop()
  }
}
