package graft.relational

import graft.SparkTestBase
import graft.queries.Relational
import org.apache.spark.sql.functions._

/** The events-analytics trio (funnel, cohort retention, gap-fill):
  * hand-checked semantics on planted event streams, fixture-level
  * invariants, and the user_id-keyed shuffle shape. */
class EventsAnalyticsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("funnel: stages shrink monotonically and the window binds") {
    val rows = Relational.funnel(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set("1_signup", "2_click", "3_purchase"))
    assert(rows("1_signup") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
    // the 24h conversion window must actually drop users (without it the
    // dense fixtures convert everyone)
    assert(rows("2_click") < rows("1_signup"))
  }

  test("funnel: stage ordering is strict (a click BEFORE signup cannot convert)") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click precedes signup → no conversion
      (1L, "2024-01-02 10:00:00", 1L, "click"),
      (2L, "2024-01-02 11:00:00", 1L, "signup"),
      // user 2: signup → click (+1h) → purchase (+2h): full conversion
      (3L, "2024-01-02 10:00:00", 2L, "signup"),
      (4L, "2024-01-02 11:00:00", 2L, "click"),
      (5L, "2024-01-02 13:00:00", 2L, "purchase"),
      // user 3: signup → click 25h later → outside the window
      (6L, "2024-01-02 10:00:00", 3L, "signup"),
      (7L, "2024-01-03 11:00:00", 3L, "click")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    // replay the operator's logic on the planted frame
    def stage(typ: String) = ev.filter(col("event_type") === typ)
      .select(col("user_id"), col("ts"))
    val signup = stage("signup").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val clicked = stage("click").join(signup, "user_id")
      .filter(unix_micros(col("ts")) - unix_micros(col("t1")) > 0 &&
        unix_micros(col("ts")) - unix_micros(col("t1")) <= Relational.FunnelWindowUs)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(clicked === Set(2L))
  }

  test("cohort retention: offsets are non-negative and day-0 counts every user") {
    val rows = Relational.cohortRetention(spark, dir).collect()
    assert(rows.forall(_.getAs[Int]("day_offset") >= 0))
    val day0 = rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(_.getAs[Long]("n_active")).sum
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id")).distinct().count()
    assert(day0 === users, "every user is active on their own cohort day")
  }

  test("gap-fill: grid is dense per user, fill is the last seen value") {
    val out = Relational.gapFill(spark, dir)
    val rows = out.collect()
    // dense: each user's rows run from min to max date with no holes
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val days = rs.map(_.getAs[java.sql.Date]("d").toLocalDate.toEpochDay).sorted
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
        "per-user day grid must be gapless")
    }
    // v_fill is never null (grids start on an active day) and equals the
    // daily sum on active days
    assert(rows.forall(!_.isNullAt(3)))
    val active = rows.filter(_.getAs[Long]("n_events") > 0)
    val daily = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(graft.queries.Exact.sumMoney(col("value")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r.getDouble(2)).toMap
    active.foreach { r =>
      assert(r.getDouble(3) == daily((r.getLong(0), r.getAs[java.sql.Date]("d"))))
    }
    // and gap days exist on the fixtures (otherwise the fill is untested)
    assert(rows.exists(_.getAs[Long]("n_events") == 0L))
  }

  test("the trio is partitioning-invariant (bit-equal outputs at any parallelism)") {
    // determinism contract: shuffling differently can never change a value
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    val base = Seq(Relational.funnel _, Relational.cohortRetention _, Relational.gapFill _)
      .map(q => canon(q(spark, dir)))
    withSQLConf("spark.sql.shuffle.partitions" -> "13") {
      val alt = Seq(Relational.funnel _, Relational.cohortRetention _, Relational.gapFill _)
        .map(q => canon(q(spark, dir)))
      assert(base === alt)
    }
  }

  private def withSQLConf[A](kv: (String, String)*)(f: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("plans: every exchange in the trio is user_id-keyed or a tiny stage union") {
    Seq(Relational.funnel _, Relational.cohortRetention _, Relational.gapFill _)
      .foreach { q =>
        val plan = q(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), plan.take(1500))
      }
  }
}
