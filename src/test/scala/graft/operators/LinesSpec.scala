package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CCNet-style line dedup ([[Lines.dedupLines]]): planted boilerplate
  * drops at the distinct-doc threshold, unique content and structure
  * survive in order, and the verdict join is fingerprint-keyed with no
  * forced broadcast (AQE picks the strategy from the measured set size —
  * the boilerplate set is corpus-sized at web scale). */
class LinesSpec extends SparkTestBase {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minDocs: Int = 3) =
    Lines.dedupLines(rows.toDF("doc_id", "text"), "doc_id", col("text"), minDocs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("a line recurring in >= minDocs docs drops; unique lines survive in order") {
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"alpha one\n$boiler\nalpha two"),
      (2L, s"$boiler\nbeta only"),
      (3L, s"gamma\n$boiler"),
      (4L, "delta stands alone"))
    val out = Lines.dedupLines(docs.toDF("doc_id", "text"), "doc_id", col("text"), 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) === 1L) // one dropped line
    assert(out(1L).getLong(1) === 3L)
    // surviving text is the original minus the boilerplate line, in order
    assert(out(1L).getLong(3) === "alpha one\nalpha two".length.toLong)
    assert(out(4L).getLong(2) === 0L)
  }

  test("threshold boundary: minDocs-1 occurrences keep the line") {
    val docs = Seq((1L, "shared\na"), (2L, "shared\nb"), (3L, "solo\nc"))
    val out = run(docs, minDocs = 3)
    assert(out.values.forall(_._2 == 0L), out.toString) // 2 < 3 → kept
    val out2 = run(docs, minDocs = 2)
    assert(out2(1L)._2 === 1L && out2(2L)._2 === 1L && out2(3L)._2 === 0L)
  }

  test("recurrence counts DISTINCT docs, and empty lines are exempt") {
    // 'rep' appears 3 times but in only 2 docs → kept at minDocs=3
    val docs = Seq((1L, "rep\nrep\n\nx"), (2L, "rep\n\ny"), (3L, "\nz"))
    val out = run(docs, minDocs = 3)
    assert(out.values.forall(_._2 == 0L), out.toString)
  }

  test("gate: boilerplate binds on fixtures; verdict join is fingerprint-keyed, unforced") {
    val df = graft.queries.LlmOps.lineDedup(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.exists(_.getLong(2) > 0), "planted furniture must drop")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    // the analyzed plan must carry NO forced broadcast hint (AQE may still
    // CHOOSE broadcast at this SF — that is the point: choice, not force)
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.contains("Hint"), logical.take(2000))
    // ...and the join key is the 128-bit line fingerprint, not line text
    assert(df.queryExecution.optimizedPlan.toString.contains("line_fp"),
      df.queryExecution.optimizedPlan.toString.take(2000))
  }

  test("all-boilerplate doc keeps empty text with kept_len 0 (null-skip contract)") {
    val boiler = "cookie banner"
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler), // every line boilerplate
      (4L, s"$boiler\nreal content"))
    val out = Lines.dedupLines(docs.toDF("doc_id", "text"), "doc_id", col("text"), 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) === 1L && out(1L).getLong(3) === 0L,
      "fully-stripped doc must keep '' (len 0), not null")
    assert(out(4L).getLong(3) === "real content".length.toLong)
  }
}
