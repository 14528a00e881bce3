package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring ([[Dsir.importanceScores]]): planted
  * target/raw separation, the degenerate-document convention, fold-order
  * stability under repartitioning, verdict consistency, and the
  * broadcast-model plan shape. */
class DsirSpec extends SparkTestBase {

  import spark.implicits._

  private def planted = Seq(
    (1L, "alpha beta gamma alpha beta gamma alpha beta", true),
    (2L, "beta gamma alpha beta gamma alpha beta alpha", true),
    (3L, "alpha beta gamma beta alpha gamma", true),
    (4L, "zork quux blarg zork quux blarg zork quux", false),
    (5L, "quux blarg zork quux blarg zork blarg", false)
  ).toDF("doc_id", "text", "is_t")

  test("target-vocabulary docs score above 1, disjoint-vocabulary docs below") {
    val rows = Dsir.importanceScores(planted, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    Seq(1L, 2L, 3L).foreach(id => assert(rows(id) > 1.0, s"doc $id: ${rows(id)}"))
    Seq(4L, 5L).foreach(id => assert(rows(id) < 1.0, s"doc $id: ${rows(id)}"))
  }

  test("every doc reports; docs below 2 tokens contribute one whole-text feature") {
    val df = Seq((1L, "solo", true), (2L, "two words", false))
      .toDF("doc_id", "text", "is_t")
    val rows = Dsir.importanceScores(df, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 1L, 2L -> 1L)) // "two words" → one bigram
  }

  test("imp_ratio is bit-stable under repartitioning (position-ordered fold)") {
    val a = Dsir.importanceScores(planted, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = Dsir.importanceScores(planted.repartition(7), "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b)
  }

  test("selected is exactly the ratio >= 1 threshold") {
    Dsir.importanceScores(planted, "doc_id", "text", col("is_t"))
      .collect().foreach { r =>
        assert(r.getInt(3) == (if (r.getDouble(2) >= 1.0) 1 else 0))
      }
  }

  test("fixtures: the en target slice outscores every other language on average") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = Dsir.importanceScores(docs, "doc_id", "text", col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).agg(avg(col("imp_ratio")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = scored.filter(_._1 != "en").values
    assert(others.forall(_ < scored("en")), scored.toString)
  }

  test("systematic resample: draws are proportional, heavy docs draw repeatedly") {
    // weights 1,1,1,1,96 with k=10 → step=10 → the heavy doc owns ~9-10 draws
    val scored = Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L), (4L, 96L))
      .toDF("doc_id", "w")
    val out = Dsir.systematicResample(scored, "doc_id", "w", k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.values.sum === 10L)
    assert(out(4L) >= 9L)
    assert(out.values.forall(_ >= 0L))
  }

  test("systematic resample: bucketSpan never changes the result (two-pass ≡ flat)") {
    val scored = planted.select(col("doc_id"),
      (col("doc_id") % 7 + 1).cast("long").as("w"))
    def run(span: Long) =
      Dsir.systematicResample(scored, "doc_id", "w", k = 3, bucketSpan = span)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(run(1L) === run(1024L))
    assert(run(2L) === run(1024L))
  }

  test("resample: negative ids keep bucket order ≡ id order (floor bucketing)") {
    val scored = Seq((-9L, 3L), (-5L, 2L), (-1L, 5L), (0L, 4L), (5L, 1L), (7L, 6L))
      .toDF("doc_id", "w")
    def run(span: Long) =
      Dsir.systematicResample(scored, "doc_id", "w", k = 4, bucketSpan = span)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // span=1 is the trivially-exact flat cumsum; wider spans must agree
    assert(run(4L) === run(1L))
    assert(run(8L) === run(1L))
  }

  test("resample: a span that would overflow the offsets broadcast is refused; auto-span handles it") {
    // id range ~3e9 wide: span=1024 would yield ~2.9M offset rows (> the
    // 1M contract) — exactly the default that round-7 flagged as silently
    // unbounded at 10^10 docs
    val scored = Seq((0L, 5L), (1L, 3L), (3_000_000_000L, 7L)).toDF("doc_id", "w")
    val e = intercept[IllegalArgumentException] {
      Dsir.systematicResample(scored, "doc_id", "w", k = 3, bucketSpan = 1024L)
    }
    assert(e.getMessage.contains("broadcast-sized"))
    // auto-scale derives a safe span and still draws exactly k
    val out = Dsir.systematicResample(scored, "doc_id", "w", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.values.sum === 3L, out.toString)
  }

  test("plan: the model rides broadcasts; the corpus is never sort-merge joined") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dsir.importanceScores(docs, "doc_id", "text", col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
