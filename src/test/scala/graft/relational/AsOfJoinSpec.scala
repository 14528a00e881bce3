package graft.relational

import graft.SparkTestBase
import java.sql.Timestamp

class AsOfJoinSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("backward as-of: latest right at-or-before left; unmatched stay null") {
    import spark.implicits._
    val trades = Seq(
      (1L, "AAPL", ts("2024-01-01 10:00:05")),
      (2L, "AAPL", ts("2024-01-01 10:00:10")),
      (3L, "MSFT", ts("2024-01-01 09:59:00")), // before any quote → null
      (4L, "MSFT", ts("2024-01-01 10:00:03"))
    ).toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("AAPL", ts("2024-01-01 10:00:00"), 100.0),
      ("AAPL", ts("2024-01-01 10:00:05"), 101.0), // equal ts → inclusive match
      ("AAPL", ts("2024-01-01 10:00:07"), 102.0),
      ("MSFT", ts("2024-01-01 10:00:01"), 50.0)
    ).toDF("sym", "q_ts", "px")

    val got = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        rightPayload = Seq("px", "q_ts"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap

    assert(got(1L).contains(101.0)) // inclusive: quote at exactly 10:00:05
    assert(got(2L).contains(102.0)) // latest ≤ 10:00:10
    assert(got(3L).isEmpty)         // no quote yet → left-join null
    assert(got(4L).contains(50.0))
  }

  test("as-of query matches an independent per-row computation on real events") {
    val out = graft.queries.Relational.asofJoin(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // independent model: load events, for each purchase find max click ts <= ts
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    out.foreach { r =>
      val user = r.getLong(1); val t = r.getTimestamp(2)
      val expected = clicksByUser.getOrElse(user, Array.empty)
        .filter(c => !c._4.after(t)).sortBy(_._4.getTime).lastOption
      (expected, Option(r.get(3))) match {
        case (Some(c), Some(gotId)) => assert(c._1 == gotId.asInstanceOf[Long])
        case (None, None) => ()
        case (e, g) => fail(s"user=$user t=$t expected=$e got=$g")
      }
    }
  }
}
