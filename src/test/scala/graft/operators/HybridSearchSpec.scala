package graft.operators

import graft.SparkTestBase
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** Hybrid retrieval (`d_hybrid_search`): the RRF fusion arithmetic on
  * planted rank lists (both-lists wins, single-list coalesce, tie-break)
  * and gate-level invariants on the fixtures. */
class HybridSearchSpec extends SparkTestBase {

  import spark.implicits._

  private def fuse(kw: Seq[(Long, Long)], vec: Seq[(Long, Long)], limit: Int = 10) =
    LlmOps.rrfFuse(
      kw.toDF("doc_id", "rank_kw"), vec.toDF("doc_id", "rank_vec"), limit)

  test("a doc on BOTH lists outranks the top single-list doc") {
    // doc 5 is rank 3 keyword + rank 3 vector; doc 1 is rank 1 keyword only
    val out = fuse(
      kw = Seq((1L, 1L), (2L, 2L), (5L, 3L)),
      vec = Seq((7L, 1L), (8L, 2L), (5L, 3L)))
      .collect()
    assert(out.head.getLong(0) === 5L)
    val rrf5 = out.head.getDouble(3)
    assert(rrf5 === 2.0 / (LlmOps.RrfK + 3).toDouble)
    // single-list docs carry exactly one term
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.isNullAt(2) && r1.getDouble(3) === 1.0 / (LlmOps.RrfK + 1).toDouble)
  }

  test("equal rrf ties break to the smaller doc_id") {
    val out = fuse(kw = Seq((9L, 1L)), vec = Seq((4L, 1L))).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(4L, 9L))
    assert(out(0).getDouble(3) === out(1).getDouble(3))
  }

  test("gate on fixtures: both retrievers contribute and the cut is correct") {
    val rows = LlmOps.hybridSearch(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 10)
    assert(rows.exists(!_.isNullAt(1)), "keyword list must contribute")
    assert(rows.exists(!_.isNullAt(2)), "vector list must contribute")
    // rrf is monotone non-increasing down the emitted order
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }
}
