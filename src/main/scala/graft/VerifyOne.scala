package graft


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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.Sessions.local(cpus)
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
