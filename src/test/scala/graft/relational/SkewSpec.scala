package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("saltedJoin result equals the plain equi-join (skew spread, same rows)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))

    val plain = li.join(part, Seq("l_partkey"))
    val salted = Skew.saltedJoin(li, part, Seq("l_partkey"), saltFactor = 4)

    assert(salted.count() == plain.count())
    val a = plain.select("l_orderkey", "l_partkey", "p_brand")
      .collect().map(_.toSeq).sortBy(_.toString())
    val b = salted.select("l_orderkey", "l_partkey", "p_brand")
      .collect().map(_.toSeq).sortBy(_.toString())
    assert(a.sameElements(b))
  }
}
