package graft.sources

import graft.SparkTestBase
import graft.plans.{CorpusExport, Snapshots}
import org.apache.spark.sql.functions._

/** Pins the catalog half of the SQL front door: catalog-qualified
  * SELECT, Spark's native VERSION AS OF / TIMESTAMP AS OF syntax,
  * INSERT INTO, SHOW TABLES, head tracking across commits, and the
  * deliberate DDL refusals. */
class SnapshotCatalogSpec extends SparkTestBase {

  private def doc(id: Long, split: String, text: String) =
    (id, split, text, text.length.toLong)

  private def df(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "split", "text", "n_tokens")
  }

  private def ids(sql: String): Set[Long] =
    spark.sql(sql).collect().map(_.getLong(0)).toSet

  test("catalog front door: SELECT / VERSION AS OF / TIMESTAMP AS OF / INSERT INTO / SHOW TABLES") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_cat")
    try {
      val root = warehouse.resolve("corpus").toString
      Snapshots.commitFull(spark, df(Seq(
        doc(1, "a", "one"), doc(2, "b", "two"))), root)
      Snapshots.commitDelta(spark, root,
        adds = df(Seq(doc(3, "a", "three"))),
        removedIds = df(Nil).select(col("split"), col("doc_id")))
      // a non-store directory must NOT list as a table
      java.nio.file.Files.createDirectories(warehouse.resolve("scratch")): Unit

      spark.conf.set("spark.sql.catalog.graftcat",
        classOf[SnapshotCatalog].getName)
      spark.conf.set("spark.sql.catalog.graftcat.root", warehouse.toString)

      assert(spark.sql("SHOW TABLES IN graftcat")
        .collect().map(_.getString(1)).toSet === Set("corpus"))

      assert(ids("SELECT doc_id FROM graftcat.corpus") === Set(1L, 2L, 3L))
      assert(ids("SELECT doc_id FROM graftcat.corpus VERSION AS OF 1") ===
        Set(1L, 2L))
      // TIMESTAMP AS OF: v1's commit stamp (strictly-increasing stamps
      // make the boundary exact; session tz is UTC)
      val t1 = Snapshots.history(spark, root)
        .filter(col("version") === 1).collect()(0).getLong(4)
      val iso = java.time.Instant.ofEpochMilli(t1).toString
      assert(ids(
        s"SELECT doc_id FROM graftcat.corpus TIMESTAMP AS OF '$iso'") ===
        Set(1L, 2L))

      // INSERT INTO commits a delta through the same write tier
      spark.sql("INSERT INTO graftcat.corpus VALUES (4, 'a', 'four', 4)")
      assert(Snapshots.latestVersion(spark, root) === 3)
      assert(ids("SELECT doc_id FROM graftcat.corpus") ===
        Set(1L, 2L, 3L, 4L))

      // head tracking: a Scala-API commit is visible to the NEXT query
      Snapshots.commitDelta(spark, root,
        adds = df(Seq(doc(5, "b", "five"))),
        removedIds = df(Nil).select(col("split"), col("doc_id")))
      assert(ids("SELECT doc_id FROM graftcat.corpus").contains(5L))

      // the deliberate DDL refusals
      val e1 = intercept[Exception] {
        spark.sql("DROP TABLE graftcat.corpus")
      }
      assert(e1.getMessage.contains("retention"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("CREATE TABLE graftcat.fresh (doc_id BIGINT) USING parquet")
      }
      assert(e2.getMessage.contains("commitFull"), e2.getMessage)
      // unknown tables surface as the standard not-found analysis error
      val e3 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM graftcat.nope").collect()
      }
      assert(e3.getMessage.contains("nope"), e3.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.graftcat")
      spark.conf.unset("spark.sql.catalog.graftcat.root")
      CorpusExport.deleteRecursively(warehouse.toFile)
    }
  }
}
