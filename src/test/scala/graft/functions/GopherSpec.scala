package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The fused Gopher-rule kernel ([[TextGopher.stats]]) and its gate
  * ([[graft.queries.LlmOps.qualityGopher]]): hand-computed counts on a
  * crafted page, the greedy-ellipsis and line-suffix conventions the
  * DuckDB oracle relies on, threshold binding on the fixtures, and the
  * whole-stage-codegen plan shape. */
class GopherSpec extends SparkTestBase {

  private def stats(s: String): Seq[Int] = {
    val r = TextGopher.stats(UTF8String.fromString(s))
    (0 until 9).map(i => r.getInt(i))
  }

  // struct order: n_words, sum_word_chars, n_alpha_words, n_stop_distinct,
  //               n_hash, n_ellipsis, n_lines, n_bullet_lines, n_ellipsis_lines

  test("hand-computed page: every count") {
    val page = "• item 3\n### x\nword the der mm...\nread more..."
    assert(stats(page) === Seq(11, 36, 8, 2, 3, 2, 4, 1, 2))
  }

  test("greedy non-overlapping ellipsis count matches the replace-delta rule") {
    // run of 5 dots = ONE '...' (replace('...','') removes one per run)
    assert(stats(".....")(5) === 1)
    assert(stats("......")(5) === 2)
    assert(stats("a... b.. c....... d")(5) === 3)
  }

  test("line conventions: bullet is a first-char test, ellipsis a suffix test") {
    // '-' bullet; trailing space defeats the '...' suffix (LIKE '%...')
    assert(stats("- dash line\nplain")(7) === 1)
    assert(stats("x... \ny...")(8) === 1)
    // a line that IS '...' counts; empty trailing line does not
    assert(stats("...\n")(8) === 1)
    assert(stats("...\n")(6) === 2)
  }

  test("word accounting: split semantics with empty tokens kept") {
    // "a  b" → 3 tokens (one empty), 2 separators
    assert(stats("a  b").take(3) === Seq(3, 2, 2))
    // sum_word_chars is code points minus separators ('•' is ONE char)
    assert(stats("• the").take(2) === Seq(2, 4))
  }

  test("required-word diversity counts DISTINCT lexicon hits") {
    val s = stats("the the the und la")
    assert(s(3) === 3) // the(en), und(de), la(fr) — repeats of 'the' count once
  }

  test("gate on fixtures: every rule family binds, keep agrees with a recompute") {
    val df = graft.queries.LlmOps.qualityGopher(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Int]("keep") == 1))
    assert(rows.exists(_.getAs[Int]("keep") == 0))
    // the injected furniture shows up: bullet-heavy and hash-heavy docs exist
    assert(rows.exists(r => r.getAs[Double]("bullet_frac") > 0.9))
    assert(rows.exists(r => r.getAs[Double]("symbol_ratio") > 0.1))
    assert(rows.exists(r => r.getAs[Double]("ellipsis_frac") > 0.3))
    // keep ⇔ the conjunction of the published rules over the emitted columns
    rows.foreach { r =>
      val expected =
        r.getAs[Long]("n_words") >= GraftFunctions.GopherMinWords &&
        r.getAs[Long]("n_words") <= GraftFunctions.GopherMaxWords &&
        r.getAs[Double]("mean_word_len") >= GraftFunctions.GopherMinMeanLen &&
        r.getAs[Double]("mean_word_len") <= GraftFunctions.GopherMaxMeanLen &&
        r.getAs[Double]("symbol_ratio") <= GraftFunctions.GopherMaxSymbolRatio &&
        r.getAs[Double]("bullet_frac") <= GraftFunctions.GopherMaxBulletFrac &&
        r.getAs[Double]("ellipsis_frac") <= GraftFunctions.GopherMaxEllipsisFrac &&
        r.getAs[Double]("alpha_frac") >= GraftFunctions.GopherMinAlphaFrac &&
        r.getAs[Long]("n_stop_distinct") >= GraftFunctions.GopherMinStopDistinct
      assert(r.getAs[Int]("keep") == (if (expected) 1 else 0), r.toString)
    }
  }

  test("plan: one codegen kernel call inside whole-stage codegen, no shuffle") {
    val df = graft.queries.LlmOps.qualityGopher(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the `*(1)` annotation marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project"), s"projection not in WSCG:\n$plan")
    assert(!plan.contains("Exchange"), plan)
  }
}
