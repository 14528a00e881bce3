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
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively; read it as a nanosecond long and truncate to microseconds —
    * the same truncation DuckDB applies on `CAST(ts AS TIMESTAMP)`, so
    * event-time results stay oracle-exact. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
}
