package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The events loader and the streaming sync-gate harnesses must not
  * disturb a caller's session, and the NTZ→TIMESTAMP instant contract
  * must hold loudly:
  *
  *   - `Tables.load("events")` casts the file's TIMESTAMP_NTZ micros to a
  *     session-zoned TIMESTAMP — valid ONLY under a UTC session, so the
  *     loader `require`s UTC instead of silently shifting every instant;
  *   - under UTC the cast preserves the raw wall-clock value as the
  *     instant, bit-for-bit;
  *   - the streaming sync harnesses run in an isolated child session with
  *     their own shuffle-partition override, which must never leak back
  *     into the caller's conf. */
class ConfLeakSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("events load: NTZ micros surface as UTC instants, type TIMESTAMP") {
    val s = spark.newSession()
    val ev = Tables.load(s, dir, "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // instant contract: the loaded timestamp IS the raw NTZ wall-clock
    // read as UTC (no session-zone shift anywhere in the chain)
    val raw = s.read.parquet(s"$dir/events.parquet")
      .orderBy(col("event_id")).limit(1).select(col("ts"))
      .head().getAs[java.time.LocalDateTime](0)
    val got = ev.orderBy(col("event_id")).limit(1).select(col("ts"))
      .head().getTimestamp(0).toInstant
    assert(got == raw.toInstant(java.time.ZoneOffset.UTC),
      s"loaded instant $got drifted from raw NTZ wall-clock $raw")
  }

  test("events load refuses a non-UTC session instead of silently shifting instants") {
    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    val e = intercept[IllegalArgumentException] {
      Tables.load(s, dir, "events")
    }
    assert(e.getMessage.contains("UTC"))
  }

  test("events join a caller-session table; caller conf untouched") {
    val s = spark.newSession()
    val before = s.conf.get("spark.sql.shuffle.partitions")
    val ev = Tables.load(s, dir, "events")
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val joined = ev.join(orders, ev("user_id") === orders("o_custkey"))
    assert(joined.count() > 0)
    assert(s.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("streaming sync gates leave the caller session conf untouched") {
    val s = spark.newSession()
    val before = s.conf.get("spark.sql.shuffle.partitions")
    assert(before != "8", "precondition: harness override must differ from caller's value")
    graft.streaming.EventPipeline.windowedCountsSync(s, dir).count()
    assert(s.conf.get("spark.sql.shuffle.partitions") == before,
      "sync-gate harness leaked its shuffle-partition override into the caller session")
  }
}
