package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkTestBase {

  test("topTerms: exact tf·idf math on a known corpus; ubiquitous terms rank low") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "cherry cherry cherry common")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(5)))

    def idf(df: Int): Double = math.log(4.0 / (df + 1)) + 1
    // doc 1: apple tf=2 df=1 → 2*(ln(2)+1); banana tf=1 df=2; common tf=1 df=3
    val d1 = top.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.head._3 == "apple")
    assert(math.abs(d1.head._4 - 2 * idf(1)) < 1e-12)
    // 'common' (df=3, idf=ln(1)+1=1) never beats a distinctive term
    assert(top.filter(_._3 == "common").forall(_._2 == 2))
    // doc 3: cherry tf=3 dominates
    assert(top.filter(_._1 == 3L).minBy(_._2)._3 == "cherry")
  }

  test("topTerms builds lazily: the corpus count is in-plan, not a driver action") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val group = s"tfidf-lazy-${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "tfidf laziness probe")
    try {
      // building the DataFrame must launch ZERO jobs (the old idfTable ran
      // docs.count() here — a second full corpus pass at scale)
      val df = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      assert(spark.sparkContext.statusTracker.getJobIdsForGroup(group).isEmpty,
        "plan construction launched a Spark job — corpus count is not in-plan")
      assert(df.collect().nonEmpty)
    } finally spark.sparkContext.clearJobGroup()
  }

  test("hashedVectors: unit norm, deterministic, identical text → identical vector; composes with ANN") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, "spark fast engine"),
      (2L, "spark fast engine"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val vecs = TfIdf.hashedVectors(spark, docs, "doc_id", "text", dim = 32)
    // fused expression keeps the projection in whole-stage codegen: no
    // object-boundary operators in the physical plan
    val plan = vecs.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      s"hashedVectors left whole-stage codegen:\n$plan")
    val byId = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId(1L) == byId(2L))
    val norm = math.sqrt(byId(1L).map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    // ANN composition: doc 2 (identical) is doc 1's nearest non-self neighbor
    val top = Similarity.bruteForceTopK(vecs, "doc_id", "vector",
      byId(1L), k = 3).collect()
    assert(top.take(2).map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }
}
