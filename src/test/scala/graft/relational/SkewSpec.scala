package graft.relational

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  /** The deployed skew posture for the engine's hot CORPUS-sized joins
    * (minhash/simhash verify joins, curation membership joins): the big
    * side cannot be salted — salting replicates the OTHER side per salt,
    * and the other side there is the corpus itself — so those joins rely
    * on AQE's runtime skew split. This pin PROVES the posture works on
    * the exact join shape: a candidate-pair list with one hot doc id
    * (one boilerplate doc colliding with thousands) joined to a per-doc
    * table, executed with the thresholds scaled down to spec size, must
    * come back with the hot partition physically split (skew=true /
    * skewed shuffle read in the FINAL adaptive plan) and unchanged rows. */
  test("AQE skew-join splits the hot partition on the minhash-verify join shape") {
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // scale the skew detector down to spec-sized data: a partition is
    // skewed when > factor × median AND > threshold; the split targets
    // the advisory size. Production keeps the defaults (256 MiB / 64 MiB).
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // corpus side never broadcasts
    s.conf.set("spark.sql.shuffle.partitions", "4")

    // one hot doc (id_a = 0) in 30k candidate pairs — the boilerplate-doc
    // profile — plus a uniform tail; per-doc payload ~100 bytes
    val hot = (0 until 30000).map(i => (0L, 100000L + i))
    val tail = (0 until 3000).map(i => (1L + i % 997, 200000L + i))
    val candidates = (hot ++ tail).toDF("id_a", "id_b").repartition(8)
    val base = (0L until 1000L).map(i => (i, "x" * 100)).toDF("id_a", "payload")

    val joined = candidates.join(base, "id_a")
    // execute THIS frame's own query (count() would plan a separate
    // Aggregate and leave `joined`'s adaptive plan unfinalized)
    val n = joined.collect().length
    assert(n === 30000 + tail.count(_._1 < 1000L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true") || plan.contains("skewed"),
      s"hot partition was not skew-split by AQE; final plan:\n$plan")
  }

  test("saltedJoin result equals the plain equi-join (skew spread, same rows)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))

    val plain = li.join(part, Seq("l_partkey"))
    val salted = Skew.saltedJoin(li, part, Seq("l_partkey"), saltFactor = 4)

    assert(salted.count() == plain.count())
    val a = plain.select("l_orderkey", "l_partkey", "p_brand")
      .collect().map(_.toSeq).sortBy(_.toString())
    val b = salted.select("l_orderkey", "l_partkey", "p_brand")
      .collect().map(_.toSeq).sortBy(_.toString())
    assert(a.sameElements(b))
  }
}
