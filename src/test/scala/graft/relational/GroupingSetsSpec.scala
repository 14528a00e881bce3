package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** GROUPING SETS mode of [[DynamicStats]]: the general grouping request
  * (neither a rollup chain nor a cube power set) must
  *
  *   - produce exactly the requested strata, each agreeing with the plain
  *     groupBy of that stratum;
  *   - tag strata with the standard grouping_id bitmask;
  *   - plan as ONE Expand + ONE aggregate (no union of repeated scans);
  *   - reject grouping sets naming unknown dimensions.
  */
class GroupingSetsSpec extends SparkTestBase {

  import DynamicStats._

  private lazy val df = {
    import spark.implicits._
    Seq(
      ("eu", "de", 10L), ("eu", "de", 5L), ("eu", "fr", 7L),
      ("us", "ny", 1L), ("us", "ca", 2L), ("us", "ca", 4L))
      .toDF("region", "nation", "v")
  }

  private lazy val out = stats(
    df,
    Seq("region", "nation"),
    Seq(Measure("total", sum(col("v"))), Measure("n", count(lit(1))),
      Measure("gid", grouping_id().cast("long"))),
    Mode.GroupingSets(Seq(Seq("region", "nation"), Seq("nation"), Seq())))

  test("requested strata only, each equal to its plain groupBy") {
    val rows = out.collect()
    // gid bitmask: bit set ⇔ that dim is aggregated away (region is MSB)
    assert(rows.map(_.getAs[Long]("gid")).toSet === Set(0L, 2L, 3L))

    val fine = rows.filter(_.getAs[Long]("gid") == 0L)
      .map(r => (r.getString(0), r.getString(1)) -> (r.getAs[Long]("total"), r.getAs[Long]("n"))).toMap
    val expFine = df.groupBy("region", "nation").agg(sum("v").as("t"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getAs[Long]("t"), r.getAs[Long]("n"))).toMap
    assert(fine === expFine)

    // the (nation) stratum exists WITHOUT a (region) stratum — not a rollup
    val byNation = rows.filter(_.getAs[Long]("gid") == 2L)
      .map(r => r.getString(1) -> r.getAs[Long]("total")).toMap
    assert(byNation === Map("de" -> 15L, "fr" -> 7L, "ny" -> 1L, "ca" -> 6L))
    assert(rows.forall(r => !(r.getAs[Long]("gid") == 1L)),
      "per-region stratum must be absent (it was not requested)")

    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length === 1 && grand.head.getAs[Long]("total") === 29L)
  }

  test("plans as one Expand + aggregate, not a union of scans") {
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(!plan.toLowerCase.contains("union"), plan)
  }

  test("unknown dimension in a set is rejected") {
    val ex = intercept[IllegalArgumentException] {
      stats(df, Seq("region"), Seq(Measure("n", count(lit(1)))),
        Mode.GroupingSets(Seq(Seq("nation"))))
    }
    assert(ex.getMessage.contains("nation"))
  }
}
