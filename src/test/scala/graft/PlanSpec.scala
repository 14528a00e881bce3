package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: the properties that make these operators hold
  * at 1000× the data — pushdown reaching the scan, dimensions broadcast,
  * top-k never globally sorting, no accidental cartesian products — are
  * pinned here so a regression fails loudly rather than silently costing a
  * full-scan at scale. */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("projection pruning reaches the parquet scan (c1_projection)") {
    val p = plan("c1_projection")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string>"), p)
  }

  test("predicate pushdown to the scan (q1_agg shipdate filter)") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("dynamic filters are pushed, including LIKE (c8_dynamic_filter)") {
    val p = plan("c8_dynamic_filter")
    assert(p.contains("StringContains(c_name,1)"), p)
    assert(p.contains("GreaterThanOrEqual(c_acctbal,1000.0)"), p)
  }

  test("dimension joins broadcast (q5 multijoin, join_broadcast)") {
    assert(plan("r_q5_multijoin").contains("BroadcastHashJoin"))
    assert(plan("r_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("r_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("semi/anti joins stay joins (no subquery materialization)") {
    assert(plan("r_semi_join").contains("LeftSemi"))
    assert(plan("r_anti_join").contains("LeftAnti"))
  }

  test("no cartesian product anywhere in the inventory") {
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product:\n$p")
    }
  }

  test("no exchange hash-partitions on a raw document-content column, inventory-wide") {
    // the exactCanonicalHashed discipline, pinned globally: shuffles key
    // on 128-bit fingerprints (or ids, or bounded-domain values — tokens,
    // hosts, langs), never on full document text. A text-keyed exchange
    // ships the corpus itself as shuffle keys and is invisible at gate
    // scale while dominating at 100 TB.
    val forbidden = "hashpartitioning\\((text|body_text|str|s_a|s_b|ck|canonical_key)#".r
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      val hit = forbidden.findFirstIn(p)
      assert(hit.isEmpty, s"$name exchanges on raw document text ($hit):\n$p")
    }
  }

  test("edit-distance blocking joins are hash-shaped (no nested-loop anywhere)") {
    // every join in the PassJoin pipeline — candidate key join, short-tier
    // length join, verify joins — must be equi (hash/sort-merge), never a
    // BroadcastNestedLoopJoin: at corpus scale a nested loop is quadratic
    val p = plan("d_edit_distance")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("aggregations use partial (map-side) aggregation") {
    val p = plan("q1_agg")
    // two HashAggregate nodes: partial then final
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("exact-jaccard candidates are unique by construction: no pair-dedup shuffle") {
    val p = plan("d_ngram_jaccard")
    // first-colliding-band emission replaces dropDuplicates — the ONLY
    // aggregation keys in the plan are the banding bucket agg
    assert(p.contains("graft_sized_member_pairs"), p)
    assert("""Keys \[\d+\]: \[id_a""".r.findFirstIn(p).isEmpty,
      "found a pair-dedup aggregate:\n" + p)
    assert("""Keys \[3\]: \[block""".r.findFirstIn(p).isDefined, p)
  }

  test("tfidf top terms: corpus count folded into the plan as a broadcast") {
    val p = plan("d_tfidf_topterms")
    // the 1-row count aggregate joins in via broadcast — no separate action
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("round-5 text operators prune the documents scan to (doc_id, text)") {
    Seq("d_bm25_search", "d_lm_score", "d_chunk_windows").foreach { name =>
      val p = plan(name)
      assert(!p.contains("source:string") && !p.contains("n_chars:bigint"),
        s"$name reads unused document columns:\n$p")
    }
  }

  test("semantic dedup prunes the embeddings scan to (vec_id, embedding), no label") {
    val p = plan("d_semantic_dedup")
    assert(!p.contains("label:int"), s"label column not pruned:\n$p")
  }

  test("chunking is exchange-free end to end") {
    val p = plan("d_chunk_windows")
    assert(!p.contains("Exchange"), p)
  }

  test("raw-SQL correlated subqueries fully decorrelate (aggregate join + anti join)") {
    val p = plan("r_sql_correlated")
    // NOT EXISTS → anti join; the correlated scalar COUNT → a grouped
    // aggregate joined back LeftOuter
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("LeftOuter"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    // and nothing survives as a per-row subquery node of any kind
    assert(!p.contains("Subquery") && !p.contains("subquery"), p)
  }

  test("recursive CTE executes as Spark's native iterative union, and the tree closes") {
    val p = plan("r_recursive_cte")
    // Spark 4 lowers WITH RECURSIVE to a UnionLoop physical node — the
    // iterative fixpoint, not an unrolled or per-row re-execution
    assert(p.contains("UnionLoop"), p)
    val rows = SparkEntry.queries("r_recursive_cte")(spark, dir).collect()
    // every document is reached exactly once: depth counts sum to the
    // corpus size and each level is at most double the previous
    val total = rows.map(_.getLong(1)).sum
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(total === n, s"recursion reached $total of $n docs")
    val byDepth = rows.map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    byDepth.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(b <= 2 * a, byDepth.mkString(","))
      case _ => ()
    }
  }

  test("vocab coverage: top-200 via TakeOrderedAndProject, window only over the survivors") {
    val p = plan("d_vocab_coverage")
    // each partition keeps 200 rows; no task ever sorts the full vocab
    assert(p.contains("TakeOrderedAndProject"), p)
    // the one Window node must sit ABOVE the TakeOrdered (over <= 200
    // rows), never directly over the vocab aggregate
    val winIdx = p.indexOf("Window")
    val topIdx = p.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && topIdx >= 0 && winIdx < topIdx,
      s"Window must consume the TakeOrdered output (formatted plans list " +
        s"consumers first): win=$winIdx top=$topIdx\n$p")
  }
}
