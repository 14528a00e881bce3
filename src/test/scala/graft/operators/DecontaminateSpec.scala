package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {

  import spark.implicits._

  test("planted 5-gram overlap is counted; clean docs report zero") {
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      // contains eval's "alpha beta gamma delta epsilon" AND "beta gamma delta epsilon zeta"
      (1L, "x alpha beta gamma delta epsilon zeta y"),
      // one shared 5-gram only
      (2L, "alpha beta gamma delta epsilon q r s t"),
      (3L, "totally unrelated words here avoiding any overlap whatsoever")
    ).toDF("doc_id", "text")

    val rows = Decontaminate.overlapNgrams(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(rows(1L) == (2L, 1))
    assert(rows(2L) == (1L, 1))
    assert(rows(3L) == (0L, 0))
    assert(rows.size == 3)
  }

  test("documents shorter than n fall back to whole-text grams") {
    val eval = Seq((9L, "short text")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "short text"),      // identical short doc → overlap via degenerate gram
      (2L, "short text plus")  // 3 tokens < 5 → gram is the whole (different) text
    ).toDF("doc_id", "text")
    val rows = Decontaminate.overlapNgrams(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(rows(1L) == (1L, 1))
    assert(rows(2L) == (0L, 0))
  }

  test("fingerprint-join counts equal string-join counts on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(pmod(col("doc_id"), lit(19)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(19)) === 0)
    val got = Decontaminate.overlapNgrams(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    GraftFunctions.register(spark)
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(array_distinct(GraftFunctions.wordShingles(col("text"), 5))).as("g"))
    val expected = grams(train)
      .join(grams(eval).select(col("g")).distinct(), Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count_distinct(col("g")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.filter(_._2 > 0) == expected)
    assert(got.keySet.map(_ % 19).forall(_ != 0))
    assert(got.size == train.count())
  }

  test("eval side arrives broadcast") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Decontaminate.overlapNgrams(
      docs.filter(col("doc_id") % 19 =!= 0), docs.filter(col("doc_id") % 19 === 0),
      "doc_id", "text", n = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  // ---- fuzzyOverlap (MinHash-banded near-dup decontamination) ----

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"

  test("fuzzy: a paraphrased eval doc is flagged with its best match; clean docs are not") {
    val eval = Seq(
      (19L, base),
      (38L, "completely different benchmark prompt about other things entirely")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, base + " nu"), // near-dup of eval 19 (shares almost all 3-shingles)
      (2L, "unrelated training document with its own distinct vocabulary")
    ).toDF("doc_id", "text")

    val rows = Decontaminate.fuzzyOverlap(train, eval, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getInt(4) == 1)
    assert(rows(1L).getLong(2) == 19L) // best_eval_id
    assert(rows(1L).getDouble(3) > 0.5)
    assert(rows(2L).getInt(4) == 0)
    assert(rows(2L).getLong(1) == 0L && rows(2L).isNullAt(2))
  }

  test("fuzzy: best-match ties break to the smallest eval id") {
    // two IDENTICAL eval docs → same jaccard against the train doc
    val eval = Seq((7L, base), (3L, base)).toDF("doc_id", "text")
    val train = Seq((1L, base)).toDF("doc_id", "text")
    val r = Decontaminate.fuzzyOverlap(train, eval, "doc_id", "text",
        threshold = 0.5).collect().head
    assert(r.getLong(1) == 2L)   // both evals matched
    assert(r.getLong(2) == 3L)   // tie → min eval id
    assert(r.getDouble(3) == 1.0)
  }

  test("fuzzy: report is partitioning-invariant (deterministic best-match tie-break)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) = Decontaminate.fuzzyOverlap(
      d.filter(col("doc_id") % 19 =!= 0), d.filter(col("doc_id") % 19 === 0),
      "doc_id", "text").collect().map(_.mkString("|")).toSet
    assert(run(docs) === run(docs.repartition(11)))
  }

  test("fuzzy: every join against the corpus side is broadcast (no corpus shuffle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Decontaminate.fuzzyOverlap(
      docs.filter(col("doc_id") % 19 =!= 0), docs.filter(col("doc_id") % 19 === 0),
      "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    // eval index, eval shingles, and the per-doc report all ride broadcasts
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the final train-corpus join must NOT be a sort-merge join
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  private def spansOf(train: Seq[(Long, String)], eval: Seq[(Long, String)],
      n: Int = 3): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Decontaminate.contaminationSpans(
      train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
      "doc_id", "text", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("spans: a planted eval passage localizes to its exact token extent") {
    val eval = Seq(100L -> "the secret eval answer is forty two")
    val train = Seq(
      // tokens 0-2 clean, 3-9 = the planted 7-token passage, 10-11 clean
      1L -> "some clean prose the secret eval answer is forty two more clean",
      2L -> "completely unrelated training text with no leak at all")
    assert(spansOf(train, eval) == Set((1L, 3L, 9L, 7L)))
  }

  test("spans: overlapping and adjacent matched windows merge into one maximal extent") {
    val eval = Seq(
      100L -> "alpha beta gamma",
      101L -> "gamma delta epsilon") // chained: overlapping leak windows
    val train = Seq(1L -> "x alpha beta gamma delta epsilon y")
    // windows [1,3] and [3,5] overlap -> one extent tokens 1..5
    assert(spansOf(train, eval) == Set((1L, 1L, 5L, 5L)))
  }

  test("spans: disjoint leaks in one doc stay separate extents") {
    val eval = Seq(100L -> "alpha beta gamma", 101L -> "one two three")
    val train = Seq(1L -> "alpha beta gamma z z z z one two three")
    assert(spansOf(train, eval) ==
      Set((1L, 0L, 2L, 3L), (1L, 7L, 9L, 3L)))
  }

  test("spans: short documents match through the degenerate whole-text gram, end clamped") {
    val eval = Seq(100L -> "tiny leak") // 2 tokens < n=3: degenerate gram
    val train = Seq(1L -> "tiny leak", 2L -> "tiny difference")
    // whole-text grams equal; span must clamp to the real last token (1)
    assert(spansOf(train, eval) == Set((1L, 0L, 1L, 2L)))
  }

  test("spans scale-stress: 50k docs, 1% planted leaks — every leak localized, nothing else") {
    import spark.implicits._
    val evalPassage = "zq1 zq2 zq3 zq4 zq5" // 5 tokens, vocabulary disjoint from filler
    val eval = Seq(999999L -> evalPassage).toDF("doc_id", "text")
    val train = spark.range(0, 50000).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 14).map(j => concat(lit(s"w$j"), pmod(col("id") * (j + 3), lit(97)))): _*)
        .as("filler"))
      .select(col("doc_id"),
        // every 100th doc: the leak planted at token offset 4
        when(pmod(col("doc_id"), lit(100)) === 0,
          concat_ws(" ",
            substring_index(col("filler"), " ", 4),
            lit(evalPassage),
            substring_index(col("filler"), " ", -10)))
          .otherwise(col("filler")).as("text"))
    val got = Decontaminate.contaminationSpans(train, eval, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 500, s"expected 500 leaks, got ${got.length}")
    assert(got.forall { case (id, s, e, t) =>
      id % 100 == 0 && s == 4 && e == 8 && t == 5
    }, s"mislocalized: ${got.filterNot(g => g._2 == 4 && g._3 == 8).take(5).toSeq}")
  }

  test("strip: the leaked passage is excised, surrounding text survives verbatim") {
    import spark.implicits._
    val eval = Seq(100L -> "the secret eval answer is forty two").toDF("doc_id", "text")
    val train = Seq(
      1L -> "some clean prose the secret eval answer is forty two more clean",
      2L -> "nothing leaked here at all",
      3L -> "tiny").toDF("doc_id", "text") // shorter than n, no overlap
    val got = Decontaminate.stripContamination(train, eval, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: 12 tokens, 7 removed (tokens 3..9); clean = "some clean prose more clean"
    assert(got(1L) == ((12L, 7L, "some clean prose more clean".length.toLong)))
    assert(got(2L) == ((5L, 0L, "nothing leaked here at all".length.toLong)))
    assert(got(3L) == ((1L, 0L, 4L)))
    // a fully-contaminated doc strips to the empty string
    val all = Decontaminate.stripContamination(
      Seq(9L -> "the secret eval answer is forty two").toDF("doc_id", "text"),
      eval, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(all == ((7L, 7L, 0L)))
  }

  test("spans: clean corpus emits nothing; matched side never sort-merge-joins the corpus") {
    val eval = Seq(100L -> "alpha beta gamma")
    val clean = Seq(1L -> "totally different words here entirely")
    assert(spansOf(clean, eval).isEmpty)
    import spark.implicits._
    val plan = Decontaminate.contaminationSpans(
      clean.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
      "doc_id", "text", 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
