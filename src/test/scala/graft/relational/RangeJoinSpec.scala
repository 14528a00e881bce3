package graft.relational

import graft.SparkTestBase
import java.sql.Timestamp

class RangeJoinSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("withinTolerance: boundary-inclusive, cross-bucket matches, no misses") {
    import spark.implicits._
    val l = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),
      (2L, "u", ts("2024-01-01 12:00:00"))
    ).toDF("lid", "k", "lt")
    val r = Seq(
      ("u", ts("2024-01-01 09:30:00"), 10L), // exactly -30min of l1 (boundary)
      ("u", ts("2024-01-01 10:29:59"), 11L), // +29:59 of l1
      ("u", ts("2024-01-01 10:30:01"), 12L), // +30:01 → out
      ("u", ts("2024-01-01 11:40:00"), 13L), // -20min of l2, crosses bucket edge
      ("v", ts("2024-01-01 10:00:00"), 14L)  // other key → out
    ).toDF("k", "rt", "rid")

    val got = RangeJoin.withinTolerance(l, r, Seq("k"), "lt", "rt",
        toleranceSec = 1800, rightPayload = Seq("rid"))
      .select("lid", "range_rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 13L)))
  }

  test("range-join query matches an independent per-row computation") {
    val out = graft.queries.Relational.rangeJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000 + (r.getTimestamp(3).getNanos / 1000) % 1000))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val purchases = ev.filter(_._3 == "purchase")
    assert(out.size == purchases.length)
    purchases.foreach { case (id, user, _, us) =>
      val expected = clicksByUser.getOrElse(user, Array.empty)
        .count(c => math.abs(c._4 - us) <= 1800000000L)
      assert(out(id) == expected.toLong, s"purchase $id")
    }
  }
}
