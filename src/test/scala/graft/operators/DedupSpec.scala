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

  test("ngramJaccardPairs: banded candidates lose nothing — set-equal to brute force at t=0.95") {
    GraftFunctions.register(spark)
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val tk = docs.select(col("doc_id"), col("lang"),
      array_distinct(GraftFunctions.tokens(col("text"))).as("tk"))
    val l = tk.select(col("lang").as("lang_a"), col("doc_id").as("id_a"), col("tk").as("tk_a"))
    val r = tk.select(col("lang").as("lang_b"), col("doc_id").as("id_b"), col("tk").as("tk_b"))
    val inter = size(array_intersect(col("tk_a"), col("tk_b"))).cast("double")
    val union = (size(col("tk_a")) + size(col("tk_b"))).cast("double") - inter
    val exact = l.join(r, col("lang_a") === col("lang_b") && col("id_a") < col("id_b"))
      .withColumn("j", inter / union)
      .filter(col("j") >= 0.95)
      .select("id_a", "id_b", "j")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap

    assert(got.keySet == exact.keySet,
      s"banded exact tier diverged: missed ${exact.keySet.diff(got.keySet)}, extra ${got.keySet.diff(exact.keySet)}")
    got.foreach { case (p, j) => assert(math.abs(exact(p) - j) < 1e-12) }
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

  test("exactCanonicalHashed: fingerprint shuffle key, identical survivors/counts") {
    GraftFunctions.register(spark)
    val a = Dedup.exactCanonical(docs, col("doc_id"), col("text"))
      .select("keep_id", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.exactCanonicalHashed(docs, col("doc_id"), col("text"))
      .select("keep_id", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("ngramJaccardPairs refuses lossy banding for low thresholds") {
    // t=0.5 with default 16×3 banding would miss ~12% of true pairs —
    // the exact tier must fail loudly, not return quietly lossy output
    val ex = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", threshold = 0.5)
    }
    assert(ex.getMessage.contains("bands"))
    // widening the banding to 1-row bands makes t=0.5 admissible again
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
      threshold = 0.5, numHashes = 48, bands = 48).columns.contains("jaccard"))
  }

  test("bucket cap: recall loss is observable via the droppedBuckets accumulator") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 8 identical docs flood every band bucket past a cap of 4
    val flood = (1L to 8L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("graft-dropped-buckets")
    val got = Dedup.minhashPairs(flood, "doc_id", "text",
      shingleK = 3, numHashes = 48, bands = 16, threshold = 0.8,
      maxBucketSize = 4, droppedBuckets = Some(acc))
    assert(got.count() == 0) // every pair lost to the cap...
    assert(acc.value > 0)    // ...and the loss is visible, not silent
  }

  test("dedupAgainstCorpus: known content rejected, novel content admitted, key is the fingerprint") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "beta alpha gamma gamma"), // canonical-equal to doc 1 → rejected
      (11L, "entirely novel content here"),
      (12L, "delta epsilon zeta")       // exact copy of doc 2 → rejected
    ).toDF("doc_id", "text")
    val got = Dedup.dedupAgainstCorpus(incoming, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L))
    // the anti-join must key on the 16-byte fingerprint struct, not text
    val plan = Dedup.dedupAgainstCorpus(incoming, corpus, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("dedup_fp"), plan)
  }

  test("nearDupAgainstCorpus: paraphrases of corpus docs rejected, novel admitted") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (1L, base),
      (2L, "completely different corpus material about spark shuffles and joins")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base + " extra"),  // near-dup of doc 1: shares almost every shingle
      (11L, base),             // exact dup
      (12L, "unrelated novel writing with fresh vocabulary nothing shared here")
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupAgainstCorpus(incoming, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(12L), s"admitted $got")
    // the flag side is a semi-join on (band, bucket) and the admit side an
    // anti-join — no pair expansion anywhere
    val plan = Dedup.nearDupAgainstCorpus(incoming, corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"), plan)
  }

  test("first-collision emission: no pair-keyed dedup exchange in any LSH dedup plan") {
    GraftFunctions.register(spark)
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plans = Seq(
      "minhash" -> Dedup.minhashPairs(docs, "doc_id", "text"),
      "simhash" -> Dedup.simhashPairs(docs, "doc_id", "text"),
      "embed" -> Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", dim = 64),
      "ngram" -> Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", threshold = 0.95))
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      // a dropDuplicates-style pair dedup would show up as an exchange
      // hash-partitioned on BOTH pair columns; verify joins partition on
      // one id at a time only
      assert(!plan.matches("(?s).*hashpartitioning\\(id_a#\\d+L?, id_b#.*"),
        s"$name plan still carries a pair-keyed exchange:\n$plan")
    }
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
