package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated star schema (TESTDATA.md).
  *
  * Mirrors the reference's notion of a source-lifting `.out` on a table
  * (reference: sample/commonSlick/src/main/scala/Sample05.scala:24-27) — in
  * Spark the lift is simply `spark.read.parquet`, which yields a lazy
  * `DataFrame` whose scan benefits from column pruning + predicate pushdown.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
