package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-partitioned events layout — the 100 TB table design for event-time
  * data. At scale the events table is written hive-partitioned by its UTC
  * event DATE, because the dominant access patterns — funnels over a
  * launch week, sessions for a day, incremental backfills, retention
  * probes — are all date-bounded: against this layout the date predicate
  * binds at PLANNING time (`PartitionFilters` on the scan), so the
  * unneeded days' files are never listed into tasks at all, instead of
  * being read and filtered row by row. The `r_events_partitioned` gate
  * runs the flagship sessionizer over a date-window probe of this layout
  * and must match DuckDB's date-filtered replay over the flat table;
  * EventsLayoutSpec pins the pruning itself (PartitionFilters bound,
  * strictly fewer files read than the directory holds).
  *
  * The partition value is `to_date(ts)` under the UTC session the engine
  * `require`s ([[graft.Tables.load]]), so "partition day" and "timestamp's
  * date" can never disagree across writers and readers.
  */
object EventsLayout {

  /** Hive-partition `events` by UTC event date. The pre-write shuffle is
    * keyed on (day, event_id-salt slice), so each day lands in AT MOST
    * `filesPerDay` files while distinct days still spread across tasks —
    * partitionBy alone would write one file per (input task × day), the
    * small-files failure mode [[Compaction]] exists to repair (run it PER
    * `event_date=` directory — its flat rewrite keeps a single directory's
    * files, which for a partitioned layout is exactly one partition). At
    * 100 TB `filesPerDay` is sized so one file ≈ 128 MB-1 GB of a day's
    * bytes. */
  def writePartitionedByDay(
      events: DataFrame, outDir: String, filesPerDay: Int = 1): Unit = {
    require(filesPerDay > 0, "filesPerDay must be positive")
    events
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("_slice", pmod(col("event_id"), lit(filesPerDay)))
      .repartition(col("event_date"), col("_slice"))
      .drop("_slice")
      .write.mode("overwrite").partitionBy("event_date").parquet(outDir)
  }

  /** A `days`-wide date-window scan over the partitioned layout,
    * `[from, from + days)`. The BETWEEN lands on the partition column, so
    * it becomes `PartitionFilters` — only the probed days' files are
    * listed and read. */
  def readDayWindow(
      spark: SparkSession, dir: String,
      from: java.time.LocalDate, days: Int): DataFrame = {
    require(days > 0, "days must be positive")
    spark.read.parquet(dir)
      .filter(col("event_date") >= lit(java.sql.Date.valueOf(from)) &&
        col("event_date") < lit(java.sql.Date.valueOf(from.plusDays(days))))
  }
}
