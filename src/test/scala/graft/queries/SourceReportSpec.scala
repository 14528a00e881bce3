package graft.queries

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class SourceReportSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("report covers every document; dup involvement matches an independent recount") {
    val rows = LlmOps.sourceReport(spark, dir).collect()
    val total = rows.map(_.getLong(1)).sum
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    assert(total == corpus.count(), s"report covers $total docs")
    // independent duplicate recount: docs whose canonical key is shared
    GraftFunctions.register(spark)
    val dupDocs = corpus
      .withColumn("ck", GraftFunctions.canonicalKey(col("text")))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ck"))))
      .filter(col("n") > 1).count()
    assert(rows.map(_.getLong(5)).sum == dupDocs,
      s"dup involvement ${rows.map(_.getLong(5)).sum} != recount $dupDocs")
    // quantized means stay inside [0, 1] and every source reports
    rows.foreach { r =>
      val m = r.getDouble(3)
      assert(m >= 0.0 && m <= 1.0, s"${r.getString(0)}: mean_quality_q $m")
      assert(r.getLong(4) <= r.getLong(1), "lang_ok exceeds docs")
    }
  }
}
