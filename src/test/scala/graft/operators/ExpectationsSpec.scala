package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkTestBase {
  import Expectations._
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10), "A"),
    (2L, Some(60), "A"),   // range violation
    (3L, None, "B"),       // null value -> predicate null -> FAIL; notnull FAIL
    (3L, Some(5), "C"),    // duplicate id; enum violation
    (4L, Some(20), "A")).toDF("id", "v", "flag")

  test("check: per-constraint counts, null predicates fail, uniqueness counts every sharer") {
    val rep = check(df, Seq(
      Satisfies("v_small", col("v") <= 50),
      Satisfies("flag_enum", col("flag").isin("A", "B")),
      NotNull("v_notnull", "v"),
      Unique("id_unique", Seq("id"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rep("v_small") == ((5L, 2L, false)))   // 60 and the null both fail
    assert(rep("flag_enum") == ((5L, 1L, false)))
    assert(rep("v_notnull") == ((5L, 1L, false)))
    assert(rep("id_unique") == ((5L, 2L, false))) // both id=3 rows count
    // all-green table
    val ok = check(df.filter(col("id") === 1), Seq(
      Satisfies("v_small", col("v") <= 50), Unique("id_unique", Seq("id"))))
      .collect().map(r => r.getBoolean(3))
    assert(ok.forall(identity))
  }

  test("quarantine: failing rows carry the violated constraint names; accepted rows are clean") {
    val (good, bad) = quarantine(df, Seq(
      Satisfies("v_small", col("v") <= 50),
      Satisfies("flag_enum", col("flag").isin("A", "B")),
      NotNull("v_notnull", "v")))
    assert(good.count() == 2 && !good.columns.contains("failed")) // ids 1 and 4
    val reasons = bad.select(col("id"), col("v"), col("failed")).collect()
      .map(r => (r.getLong(0), Option(if (r.isNullAt(1)) null else r.getInt(1)),
        r.getSeq[String](2).toSet)).toSet
    assert(reasons == Set(
      (2L, Some(60), Set("v_small")),
      (3L, None, Set("v_small", "v_notnull")),
      (3L, Some(5), Set("flag_enum"))))
  }
}
