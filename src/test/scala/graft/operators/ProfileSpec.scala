package graft.operators

import graft.SparkTestBase

/** The one-pass column profiler ([[Profile.profile]]): planted nulls
  * count, distincts are exact, min/max order on the NATIVE type (not
  * lexicographically), and the approx mode keeps the shape. */
class ProfileSpec extends SparkTestBase {

  import spark.implicits._

  private val df = Seq(
    (Some(9L), Some("b")), (Some(10L), Some("a")),
    (None, Some("a")), (Some(2L), None))
    .toDF("n", "s")

  test("nulls, distincts, native-type min/max") {
    val p = Profile.profile(df, Seq("n", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("n").getLong(1) == 4L) // n_rows
    assert(p("n").getLong(2) == 1L && p("s").getLong(2) == 1L) // n_nulls
    assert(p("n").getLong(3) == 3L && p("s").getLong(3) == 2L) // n_distinct
    // 9 < 10 numerically though "10" < "9" lexicographically
    assert(p("n").getString(4) == "2" && p("n").getString(5) == "10")
    assert(p("s").getString(4) == "a" && p("s").getString(5) == "b")
  }

  test("approx mode keeps the schema and lands near the exact counts") {
    val p = Profile.profile(df, Seq("n", "s"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(p("n") - 3L) <= 1 && math.abs(p("s") - 2L) <= 1)
  }

  test("non-identifier column names (spaces, quotes) profile instead of crashing") {
    val weird = Seq((Some(1L), Some("x")), (None, Some("y")))
      .toDF("user name", "it's")
    val p = Profile.profile(weird, Seq("user name", "it's"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p("user name") == 1L && p("it's") == 0L)
  }

  test("one aggregation pass: no join or repeated scan in the plan") {
    val plan = Profile.profile(df, Seq("n", "s")).queryExecution
      .optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
