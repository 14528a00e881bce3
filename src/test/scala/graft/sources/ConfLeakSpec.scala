package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The nanos-parquet legacy conf must never leak into a caller's session:
  * `Tables.load("events")` and the streaming gate harnesses read
  * TIMESTAMP(NANOS) through an isolated child session, so a user's own
  * parquet reads keep stock Spark semantics before AND after touching the
  * events table. */
class ConfLeakSpec extends SparkTestBase {

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
  private val dir = "/root/testdata/sf0.001"

  test("batch events load executes correctly without mutating the caller session conf") {
    val s = spark.newSession()
    assert(s.conf.get(NanosConf, "false") == "false")
    val ev = Tables.load(s, dir, "events")
    // action through the events scan: nanos → micros conversion live
    val n = ev.filter(col("event_type").isNotNull).count()
    assert(n > 0)
    assert(ev.agg(max(col("ts"))).head().getTimestamp(0) != null)
    assert(s.conf.get(NanosConf, "false") == "false",
      "events load leaked the nanos legacy conf into the caller session")
  }

  test("events join a caller-session table across the session boundary") {
    val s = spark.newSession()
    // events come from the nanos child session; orders from the caller's —
    // the combined plan must execute with each relation's own captured conf
    val ev = Tables.load(s, dir, "events")
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val joined = ev.join(orders, ev("user_id") === orders("o_custkey"))
    assert(joined.count() > 0)
    assert(s.conf.get(NanosConf, "false") == "false")
  }

  test("streaming sync gates leave the caller session conf untouched") {
    val s = spark.newSession()
    graft.streaming.EventPipeline.windowedCountsSync(s, dir).count()
    assert(s.conf.get(NanosConf, "false") == "false",
      "streaming harness leaked the nanos legacy conf into the caller session")
  }
}
