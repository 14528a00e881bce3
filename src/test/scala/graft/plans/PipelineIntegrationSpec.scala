package graft.plans

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** End-to-end invariants across the full curation story — the properties
  * that must hold at the STAGE BOUNDARIES when the operators compose,
  * which no single-operator spec can see:
  *
  *   curation (quality/repetition/language/LM/dedup/decontamination)
  *     → split-partitioned export → context-window chunking
  */
class PipelineIntegrationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("exported corpus: dedup holds on disk, splits are stable, chunking covers every token") {
    GraftFunctions.register(spark)
    val out = java.nio.file.Files.createTempDirectory("graft_e2e")
    try {
      CorpusExport.writeCurated(spark, dir, out.toString).collect()
      val written = spark.read.parquet(s"$out/corpus").cache()
      val n = written.count()
      assert(n > 0)

      // 1. the exact-dedup stage's promise SURVIVES materialization: no two
      //    exported documents share a canonical content key
      val distinctKeys = written
        .select(GraftFunctions.canonicalKey(col("text")).as("ck"))
        .distinct().count()
      assert(distinctKeys == n, s"$n docs but only $distinctKeys distinct keys on disk")

      // 2. the split column written to disk equals a fresh recomputation of
      //    the content-stable assignment (no drift through the export path)
      val mismatched = written
        .join(graft.queries.LlmOps.splitAssignments(spark, dir)
          .select(col("doc_id"), col("split").as("expected")), "doc_id")
        .filter(col("split") =!= col("expected")).count()
      assert(mismatched == 0L, s"$mismatched docs changed split through export")

      // 3. chunking the exported corpus loses no token: at stride == max,
      //    per-doc chunk tokens sum exactly to the doc's token count
      val chunkCov = graft.operators.Chunking
        .slidingWindows(written, "doc_id", "text", maxTokens = 32, stride = 32)
        .groupBy(col("doc_id")).agg(sum(col("n_chunk_tokens")).as("covered"))
      // left join: a doc that produced ZERO chunks must count as uncovered,
      // not silently drop out of an inner join
      val uncovered = written
        .select(col("doc_id"), GraftFunctions.tokenCount(col("text")).cast("long").as("nt"))
        .join(chunkCov, Seq("doc_id"), "left")
        .filter(coalesce(col("covered"), lit(0L)) =!= col("nt")).count()
      assert(uncovered == 0L, s"$uncovered exported docs not fully covered by chunks")

      written.unpersist()
    } finally CorpusExport.deleteRecursively(out.toFile)
  }

  test("probe-scoring stage binds: pipeline = heuristic core ∩ margin-gated, and the cut is non-empty") {
    GraftFunctions.register(spark)
    val ops = graft.queries.LlmOps
    val core = ops.curationCore(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val piped = ops.curationPipeline(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // margins recomputed from the PUBLISHED weights gate + scorer — the
    // pipeline must agree with the composition of its published parts
    val w = ops.qualityProbe(spark, dir).orderBy("dim")
      .collect().map(_.getDouble(1)).toSeq
    val vecs = graft.operators.TfIdf.hashedVectors(
      spark, spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", dim = 64)
    val gated = graft.operators.Probe.score(vecs, "vector", w)
      .filter(col("margin") >= ops.ProbeGateMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(piped == (core intersect gated),
      "pipeline must equal heuristic-core ∩ probe-gated")
    val cut = core -- gated
    assert(cut.nonEmpty,
      "probe stage must bind on the fixture (some heuristic survivor scores below the margin)")
    assert(piped.nonEmpty)
  }
}
