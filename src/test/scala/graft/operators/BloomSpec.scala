package graft.operators

import graft.SparkTestBase
import graft.functions.{Aggregators, BloomOps, GraftFunctions}
import org.apache.spark.sql.functions._

/** The bloom-accelerated incremental-dedup tier: kernel determinism,
  * distributed build invariance, routing exactness, and the pre-filter
  * actually pruning the anti-join input. */
class BloomSpec extends SparkTestBase {

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("kernel: no false negatives; false-positive rate near theory") {
    val numBits = 1 << 14
    val k = 5
    val bloom = new Array[Byte](numBits >>> 3)
    val rnd = new scala.util.Random(7)
    val members = Array.fill(1000)(rnd.nextLong())
    members.foreach(BloomOps.set(bloom, _, k))
    assert(members.forall(BloomOps.mightContain(bloom, _, k)),
      "a bloom filter must never reject an inserted key")
    val memberSet = members.toSet
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(memberSet).take(20000).toArray
    val fpRate = probes.count(BloomOps.mightContain(bloom, _, k)).toDouble / probes.length
    // theory: (1 - e^(-kn/m))^k at n=1000, m=16384, k=5 ≈ 0.0094
    val theory = math.pow(1 - math.exp(-k.toDouble * members.length / numBits), k)
    assert(fpRate < theory * 2.5 + 0.002,
      s"false-positive rate $fpRate far above theory $theory")
  }

  test("distributed build is byte-identical on any partitioning and equals a local build") {
    GraftFunctions.register(spark)
    val fps = docs.select(
      GraftFunctions.fingerprint64(GraftFunctions.canonicalKey(col("text"))).as("f1"))
    val numBits = 1 << 16
    val a = Dedup.bloomOfCorpus(fps.repartition(1), "f1", numBits, 4)
    val b = Dedup.bloomOfCorpus(fps.repartition(13), "f1", numBits, 4)
    assert(java.util.Arrays.equals(a, b),
      "bloom build must be partitioning-invariant (OR is commutative)")
    val local = new Array[Byte](numBits >>> 3)
    fps.collect().foreach(r => BloomOps.set(local, r.getLong(0), 4))
    assert(java.util.Arrays.equals(a, local),
      "distributed build must equal a single-threaded build")
  }

  test("bloomDedupAgainstCorpus ≡ dedupAgainstCorpus, and the join sees only bloom hits") {
    GraftFunctions.register(spark)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)

    val plain = Dedup.dedupAgainstCorpus(incoming, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val routed = Dedup.bloomDedupAgainstCorpus(incoming, corpus, "text",
      numBits = 1 << 16, numProbes = 4)
    val got = routed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == plain, "bloom routing changed the admitted set")

    // the residual anti-join input is the bloom-hit sliver, not the batch:
    // duplicates (true hits) + ~0 false positives at these parameters
    val bloom = Dedup.bloomOfCorpus(
      corpus.select(GraftFunctions.fingerprint64(
        GraftFunctions.canonicalKey(col("text"))).as("f1")),
      "f1", 1 << 16, 4)
    val nIncoming = incoming.count()
    val nHits = incoming.select(GraftFunctions.fingerprint64(
        GraftFunctions.canonicalKey(col("text"))).as("f1"))
      .filter(GraftFunctions.bloomContains(col("f1"), bloom, 4)).count()
    val nDups = nIncoming - plain.size
    assert(nHits < nIncoming / 2,
      s"pre-filter prunes nothing: $nHits hits of $nIncoming")
    assert(nHits >= nDups, "hits must cover every true duplicate")
    assert(nHits <= nDups + math.max(4, nIncoming / 20),
      s"false-positive sliver too large: $nHits hits for $nDups dups")

    // exactly one join in the routing plan (the residual anti-join); the
    // definitely-new branch reaches the union join-free. Pinned on the
    // lazy plan (the shipped operator materializes through localCheckpoint,
    // which hides the executed tree).
    val incFp = incoming.withColumn("dedup_fp",
      GraftFunctions.fingerprint128(GraftFunctions.canonicalKey(col("text"))))
    val corpusFpFrame = corpus.withColumn("dedup_fp",
        GraftFunctions.fingerprint128(GraftFunctions.canonicalKey(col("text"))))
      .select(col("dedup_fp"))
    val plan = Dedup.bloomRouted(incFp, corpusFpFrame, bloom, 4)
      .queryExecution.executedPlan.toString
    val joins = "(?i)(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly the residual anti-join, found $joins:\n$plan")
  }

  test("null text is admitted, matching the plain anti-join contract") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val incoming = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "a fresh document"),
        org.apache.spark.sql.Row(2L, null),
        org.apache.spark.sql.Row(3L, "shared text"))),
      schema)
    val corpus = Seq((10L, "shared text"), (11L, "corpus only")).toDF("doc_id", "text")
    val plain = Dedup.dedupAgainstCorpus(incoming, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val routed = Dedup.bloomDedupAgainstCorpus(incoming, corpus, "text",
        numBits = 1 << 10, numProbes = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plain == Set(1L, 2L), "anti-join must admit the null-text row")
    assert(routed == plain, "bloom routing must not lose null-fingerprint rows")
  }

  test("undersized bloom stays exact (correctness never depends on m)") {
    GraftFunctions.register(spark)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val plain = Dedup.dedupAgainstCorpus(incoming, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 256 bits for ~400 corpus keys: nearly every probe is a false
    // positive, so almost everything routes through the residual join —
    // slower, never wrong
    val got = Dedup.bloomDedupAgainstCorpus(incoming, corpus, "text",
        numBits = 256, numProbes = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == plain, "undersized bloom must degrade to the exact join")
  }

  test("SQL surface: graft_bloom_contains is registered and codegen-evaluable") {
    GraftFunctions.register(spark)
    val bloom = new Array[Byte](32)
    BloomOps.set(bloom, 42L, 3)
    import spark.implicits._
    val probes = Seq(42L, 43L, 7L, -9L)
    val got = probes.toDF("fp")
      .select(col("fp"), GraftFunctions.bloomContains(col("fp"), bloom, 3).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // the plan-side expression must agree with the kernel bit-for-bit
    probes.foreach(p =>
      assert(got(p) == BloomOps.mightContain(bloom, p, 3), s"probe $p diverges"))
    assert(got(42L))
  }
}
