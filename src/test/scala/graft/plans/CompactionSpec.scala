package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Compaction.compactParquet]]: file-count shrink to the byte-derived
  * target, exact content preservation, range-clustering under sortCols,
  * and the staging-swap discipline. */
class CompactionSpec extends SparkTestBase {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def withTmp[A](f: java.nio.file.Path => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("compaction_spec")
    try f(tmp) finally CorpusExport.deleteRecursively(tmp.toFile)
  }

  test("shrinks splinter files to the byte-derived count; content survives exactly") {
    withTmp { tmp =>
      val in = tmp.resolve("in").toString
      val out = tmp.resolve("out").toString
      docs.repartition(32).write.parquet(in)
      val r = Compaction.compactParquet(spark, in, out, targetBytes = 1L << 20)
      assert(r.filesBefore === 32)
      val expected = math.max(1, math.ceil(r.bytesBefore / (1L << 20).toDouble).toInt)
      assert(r.filesAfter === expected, r.toString)
      assert(r.filesAfter < r.filesBefore)

      val a = docs.select("doc_id", "text").collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
      val b = spark.read.parquet(out).select("doc_id", "text").collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
      assert(a === b)
    }
  }

  test("sortCols range-clusters: per-file doc_id ranges are disjoint") {
    withTmp { tmp =>
      val in = tmp.resolve("in").toString
      val out = tmp.resolve("out").toString
      docs.repartition(32).write.parquet(in)
      Compaction.compactParquet(spark, in, out,
        targetBytes = 20L * 1024, sortCols = Seq("doc_id"))
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      assert(files.size > 1, "need several files to observe clustering")
      val ranges = files.map { f =>
        val mm = spark.read.parquet(f).agg(min("doc_id"), max("doc_id")).head()
        (mm.getLong(0), mm.getLong(1))
      }.sortBy(_._1)
      ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $ranges")
      }
    }
  }

  test("no staging leftovers; repeated compaction is idempotent on content") {
    withTmp { tmp =>
      val in = tmp.resolve("in").toString
      val out = tmp.resolve("out").toString
      docs.repartition(8).write.parquet(in)
      Compaction.compactParquet(spark, in, out, targetBytes = 1L << 20)
      assert(!new java.io.File(out + ".staging").exists())
      // compact the compacted output again → same rows
      val out2 = tmp.resolve("out2").toString
      Compaction.compactParquet(spark, out, out2, targetBytes = 1L << 20)
      assert(spark.read.parquet(out2).count() === docs.count())
    }
  }
}
