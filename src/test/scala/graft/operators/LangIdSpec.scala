package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The hashed char-trigram language identifier ([[LangId.classify]]):
  * planted-signal correctness, determinism, tie-break stability, and —
  * on the driver fixtures — at least the marker heuristic's accuracy
  * (the fixture corpus carries only weak language signal, so the bar is
  * relative, not absolute). */
class LangIdSpec extends SparkTestBase {

  import spark.implicits._

  test("clearly-signaled planted corpora classify perfectly") {
    // two 'languages' with disjoint character inventories
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, s"aaa bbb aab abb aba bab n$i", "aa")
      else (i.toLong, s"zzz yyy zzy zyy yzz n$i", "zz")
    }.toDF("doc_id", "text", "lang")
    val out = LangId.classify(docs, "doc_id", "text", "lang", Seq("aa", "zz"))
      .collect()
    assert(out.length == 40)
    out.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)} true=${r.getString(1)} pred=${r.getString(2)}"))
  }

  test("deterministic under repartitioning (integer numerators, no fold order)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val langs = Seq("de", "en", "es", "fr", "zh")
    def run(df: org.apache.spark.sql.DataFrame) =
      LangId.classify(df, "doc_id", "text", "lang", langs, dim = 512)
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(run(docs) === run(docs.repartition(13)))
  }

  test("fixture accuracy is at least the marker heuristic's") {
    val dir = "/root/testdata/sf0.001"
    val ngram = graft.queries.LlmOps.langIdNgram(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val total = ngram.map(_._2).sum.toDouble
    val accN = ngram.collect { case ((t, p), n) if t == p => n }.sum / total
    val accM = graft.queries.LlmOps.langId(spark, dir)
      .agg(avg(col("agree"))).head().getDouble(0)
    assert(accN >= accM,
      s"n-gram model ($accN) must not lose to the marker heuristic ($accM)")
  }
}
