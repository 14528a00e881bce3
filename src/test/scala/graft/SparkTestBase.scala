package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite. */
trait SparkTestBase extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestBase.session

  /** The reference's golden 4-row fixture (FIXTURES.md §A; reference:
    * sample/commonSlick/src/main/scala/Models.scala:6-24, Sample01.scala:5-8). */
  lazy val friend: DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("nick", StringType, nullable = false),
      StructField("age", IntegerType, nullable = true),
      StructField("grade", IntegerType, nullable = false)))
    val rows = Seq(
      Row(1L, "魔理沙", "小莎莎", Integer.valueOf(2333), 3),
      Row(2L, "jilen", "jilen 酱", Integer.valueOf(30), 4),
      Row(3L, "品神", "kerr", Integer.valueOf(28), 5),
      Row(4L, "廖师虎", "shihu", null, 6))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 1), schema)
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
