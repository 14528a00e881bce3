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

  // Memoized per (session, dir, table): the fixture dirs are immutable, and
  // every `spark.read.parquet` call re-lists the directory and re-infers
  // the schema from a footer — ~50-100ms of driver time per table per query
  // build that the cached (lazy, immutable) DataFrame plan skips entirely.
  // Keys hold session references for the process lifetime — fine for the
  // gate/bench mains this loader serves; callers with short-lived sessions
  // should read directly.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  // Weak keys: a child session holds no reference back to its parent (the
  // key), so entries are collected with the caller session — a long-lived
  // process creating many short-lived sessions doesn't accumulate children.
  // (The plan `cache` above can't do the same: a DataFrame references its
  // session, so a weak key would be pinned by its own value.)
  private val nanosSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  /** A session whose parquet scans read TIMESTAMP(NANOS) as long: the
    * caller's own session if it already opted in, otherwise a memoized
    * CHILD session (shared SparkContext, isolated session state) with the
    * legacy conf set. The parquet relation captures its session at read
    * time, so executing a plan built in the caller's session still
    * resolves the conf against the child — and the caller's session conf
    * is never mutated (the round-3/4 leak: a legacy read behavior silently
    * applied to every subsequent parquet read in the caller's session). */
  private[graft] def nanosReadSession(spark: SparkSession): SparkSession =
    if (spark.conf.get(NanosConf, "false") == "true") spark
    else nanosSessions.computeIfAbsent(spark, { s =>
      val c = s.newSession()
      c.conf.set(NanosConf, "true")
      c
    })

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), { _ =>
      if (name == "events")
        nanosReadSession(spark).read.parquet(s"$dir/events.parquet")
          .withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively; read it as a nanosecond long and truncate to microseconds —
    * the same truncation DuckDB applies on `CAST(ts AS TIMESTAMP)`, so
    * event-time results stay oracle-exact. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
}
