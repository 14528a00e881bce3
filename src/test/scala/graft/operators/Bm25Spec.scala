package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkTestBase {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark shuffle"),         // heavy on one query term
    (2L, "spark join query vector"),           // one hit each, short
    (3L, "spark join query vector " * 10),     // same profile, 10x longer
    (4L, "the quick brown fox jumps"),         // zero hits
    (5L, "join join the the the the the the")  // rarer profile, diluted
  ).map { case (id, t) => (id, t.trim) }.toDF("doc_id", "text")

  test("hand-checked ranking: tf mass with both terms wins; zero-hit docs never rank") {
    val rows = Bm25.topK(corpus, "doc_id", "text", Seq("spark", "join"), k = 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // doc 3: tf=10 on both terms — saturation (k1=1.2) still outscores the
    // dl=40 length penalty vs doc 2's single hits at dl=4 (hand arithmetic:
    // per-term factor 2.2·10/13.25 ≈ 1.66 vs 2.2·1/1.595 ≈ 1.38)
    assert(rows(1) == 3L, s"rank1 was ${rows(1)}")
    assert(rows(2) == 2L, s"rank2 was ${rows(2)}")
    // zero-hit doc never appears
    assert(!rows.values.toSet.contains(4L))
  }

  test("saturation: tf 3 vs tf 1 on one term cannot beat two distinct terms here") {
    val rows = Bm25.topK(corpus, "doc_id", "text", Seq("spark", "join"), k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val rankOf = rows.map { case (rk, id) => id -> rk }.toMap
    assert(rankOf(1L) > rankOf(2L),
      s"doc1 (tf=3, one term) should rank below doc2 (both terms): $rows")
  }

  test("tf evidence columns are exact and zero-filled per term") {
    val r = Bm25.topK(corpus, "doc_id", "text", Seq("spark", "join"), k = 5)
      .filter(col("doc_id") === 1L).head()
    assert(r.getLong(3) == 3L) // tf_spark
    assert(r.getLong(4) == 0L) // tf_join
    assert(r.getLong(2) == 4L) // dl
  }

  test("plan: top-k is TakeOrderedAndProject, corpus stats ride broadcasts") {
    val plan = Bm25.topK(corpus, "doc_id", "text", Seq("spark", "join"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
