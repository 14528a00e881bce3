package graft.operators

import graft.SparkTestBase

class VersioningSpec extends SparkTestBase {

  import spark.implicits._

  test("diff classifies added/removed/modified/unchanged; ids never double-report") {
    val v1 = Seq(
      (1L, "same content"),
      (2L, "will change"),
      (3L, "will be removed")).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "same content"),
      (2L, "has changed"),
      (4L, "brand new")).toDF("doc_id", "text")
    val rows = Versioning.diff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // row count BEFORE the map conversion — toMap would silently swallow
    // a double-reported id
    assert(rows.length == 4, s"expected one row per id: ${rows.toSeq}")
    val got = rows.toMap
    assert(got == Map(1L -> "unchanged", 2L -> "modified",
      3L -> "removed", 4L -> "added"), got)
  }

  test("diff plan: narrow fingerprint rows through the join, no text in the shuffle") {
    val v = Seq((1L, "x " * 500)).toDF("doc_id", "text")
    val plan = Versioning.diff(v, v, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the join keys/payload are ids + fp structs; the text column must be
    // projected away BELOW the join
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0, plan)
    assert(!plan.substring(0, joinIdx).contains("text#"),
      s"text column rides above the join:\n$plan")
  }
}
