package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusExportSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("export writes a split-partitioned corpus whose content equals the pipeline") {
    val out = java.nio.file.Files.createTempDirectory("graft_export_spec")
    try {
      val manifest = CorpusExport.writeCurated(spark, dir, out.toString)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // physical layout: split partition directories
      val dirs = new java.io.File(s"$out/corpus").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.exists(_.startsWith("split=")), s"no split partitions in $dirs")
      // read-back ids equal the curated survivors exactly
      val written = spark.read.parquet(s"$out/corpus")
      val wIds = written.select("doc_id").collect().map(_.getLong(0)).toSet
      val cIds = graft.queries.LlmOps.curationPipeline(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(wIds == cIds, s"written ids diverge: extra ${wIds.diff(cIds).take(3)}")
      // no document lands in two splits; text column rides along
      assert(written.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)
      assert(written.columns.contains("text"))
      // the sidecar manifest agrees with the returned (read-back) manifest
      // on BOTH doc counts and token totals
      val sidecar = spark.read.json(s"$out/_manifest")
        .collect().map(r => (r.getAs[String]("split"), r.getAs[String]("lang"))
          -> (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))).toMap
      assert(sidecar == manifest, s"sidecar $sidecar != read-back $manifest")
    } finally CorpusExport.deleteRecursively(out.toFile)
  }
}
