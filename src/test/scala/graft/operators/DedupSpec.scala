package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("exactCanonical keeps deterministic survivor and counts copies") {
    import spark.implicits._
    val df = Seq(
      (10L, "b a a b"), (7L, "a b"), (3L, "c"), (4L, "a b b a")).toDF("doc_id", "text")
    val got = Dedup.exactCanonical(df, col("doc_id"), col("text"))
      .orderBy("dedup_key").collect()
    // "a b" canonical group: ids 10, 7, 4 → keep 4? no: min(10,7,4)=4, copies 3
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a b", 4L, 3L), ("c", 3L, 1L)))
  }

  test("minhashPairs: returned jaccards are exact; recall 1.0 vs brute force at j>=0.9") {
    GraftFunctions.register(spark)
    val got = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 48, bands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // brute-force exact shingle-jaccard over all pairs (500 docs → 125k pairs)
    val sh = docs.select(col("doc_id"),
      array_distinct(GraftFunctions.wordShingles(col("text"), 3)).as("sh"))
    val l = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    val exact = l.join(r, col("id_a") < col("id_b"))
      .withColumn("j", inter / union)
      .filter(col("j") >= 0.8)
      .select("id_a", "id_b", "j")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap

    // every reported pair must carry the exact jaccard value
    got.foreach { case (pair, j) =>
      assert(exact.contains(pair), s"false positive pair $pair")
      assert(math.abs(exact(pair) - j) < 1e-12)
    }
    // recall at high similarity must be total
    val strong = exact.filter(_._2 >= 0.9).keySet
    val found = got.keySet
    assert(strong.subsetOf(found),
      s"missed ${strong.diff(found).size} of ${strong.size} strong pairs")
    // and overall recall at 0.8 should be near-total with these parameters
    assert(found.size.toDouble / exact.size >= 0.95)
  }

  test("simhashPairs: verified hamming bound, identical docs found") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val planted = Seq(
      (9001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9002L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9003L, "totally unrelated content about something else entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 3).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      .contains((9001L, 9002L, 0)))
    assert(got.forall(_.getInt(2) <= 3))
  }

  test("embeddingNearDupPairs: reported cosines are exact and above threshold") {
    GraftFunctions.register(spark)
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant an exact duplicate of vec 0 with a new id
    import spark.implicits._
    val v0 = embs.orderBy(col("vec_id")).limit(1)
      .withColumn("vec_id", lit(99999L))
    val withDup = embs.unionByName(v0)
    val got = Dedup.embeddingNearDupPairs(withDup, "vec_id", "embedding",
      dim = 64, threshold = 0.99)
    val pairs = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, c) => a == 0L && b == 99999L && c > 0.999999 })
    assert(pairs.forall(_._3 >= 0.99))
  }
}
