package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("deterministicSample: partitioning-independent, reproducible, fraction honored") {
    GraftFunctions.register(spark)
    val a = Sampling.deterministicSample(docs, col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(13), col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample membership changed under repartitioning")
    assert(a.size > 200 && a.size < 300, s"fraction 0.5 of 500 gave ${a.size}")
    // nesting: a smaller fraction is a SUBSET of a larger one (same hash,
    // lower threshold) — ablation subsets never drift
    val half = Sampling.deterministicSample(docs, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(a))
  }

  test("stratifiedSample: per-stratum fractions, content-stable under subsetting") {
    GraftFunctions.register(spark)
    val fractions = Map("en" -> 0.8, "de" -> 0.2)
    val got = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      fractions, default = 0.0)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("en", "de"), s"default=0 strata leaked: $byLang")
    assert(math.abs(byLang("en").toDouble / totals("en") - 0.8) < 0.15)
    assert(math.abs(byLang("de").toDouble / totals("de") - 0.2) < 0.15)
    // content-stability: sampling a filtered corpus = filtering the sample
    val subsetSample = Sampling.stratifiedSample(
      docs.filter(col("doc_id") < 250), col("doc_id"), col("lang"),
      fractions, default = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sampleSubset = got.filter(col("doc_id") < 250)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(subsetSample == sampleSubset)
  }

  test("rebalanceToMixture: achieved mixture tracks targets, binding group kept whole") {
    GraftFunctions.register(spark)
    val weights = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1, "zh" -> 0.1)
    val kept = Sampling.rebalanceToMixture(docs, col("doc_id"), col("lang"), weights)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the binding group (min n_g/w_g) survives whole
    val binding = totals.keys.minBy(g => totals(g) / weights(g))
    assert(byLang(binding) == totals(binding), s"binding $binding was downsampled")
    // achieved fractions within hash-sampling noise of the targets
    val n = byLang.values.sum.toDouble
    weights.foreach { case (g, w) =>
      assert(math.abs(byLang(g) / n - w) < 0.07, s"$g: ${byLang(g) / n} vs $w")
    }
    // each group lands within binomial noise of its n_total·w_g expectation
    // (hash membership is Bernoulli per row, so counts fluctuate ~√np)
    val nTotal = totals(binding) / weights(binding)
    weights.foreach { case (g, w) =>
      val exp = nTotal * w
      assert(math.abs(byLang(g) - exp) <= 4 * math.sqrt(exp) + 1,
        s"$g: got ${byLang(g)}, expected ~$exp")
    }
  }

  test("rebalanceToMixture: unweighted groups drop; membership is content-stable") {
    GraftFunctions.register(spark)
    val weights = Map("en" -> 0.7, "de" -> 0.3)
    val kept = Sampling.rebalanceToMixture(docs, col("doc_id"), col("lang"), weights)
    assert(kept.select("lang").distinct().collect().map(_.getString(0)).toSet ==
      Set("en", "de"))
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.rebalanceToMixture(
      docs.repartition(13), col("doc_id"), col("lang"), weights)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "membership changed under repartitioning")
  }

  test("sampling stream is independent of the train-split stream") {
    GraftFunctions.register(spark)
    // same key hashed by the two streams: buckets must disagree for most
    // rows (a shared stream would correlate ablation samples with splits)
    val both = docs.select(
      pmod(GraftFunctions.fingerprint64(col("doc_id").cast("string")), lit(100L)).as("split_b"),
      pmod(GraftFunctions.fingerprint64Alt(col("doc_id").cast("string")), lit(100L)).as("sample_b"))
      .collect()
    val agree = both.count(r => r.getLong(0) == r.getLong(1))
    assert(agree < both.length / 10, s"$agree/${both.length} bucket collisions")
  }

  test("packByTokenBudget: contiguous greedy bins, budget respected at bin starts") {
    GraftFunctions.register(spark)
    val budget = 500
    val packed = Sampling.packByTokenBudget(
      docs.select(col("doc_id"), col("lang"),
        GraftFunctions.tokenCount(col("text")).cast("long").as("n")),
      order = col("doc_id"), nTokens = col("n"), part = col("lang"),
      budget = budget)
      .select("lang", "doc_id", "n", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.length == 500) // every doc assigned exactly one bin
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // bins are nondecreasing in pack order and start at 0
      val bins = sorted.map(_._4)
      assert(bins.head == 0L)
      assert(bins.zip(bins.tail).forall { case (a, b) => b >= a },
        "bins must be nondecreasing in pack order")
      // invariant of offset binning: each row STARTS inside its bin
      var cum = 0L
      sorted.foreach { case (_, _, n, bin) =>
        assert(cum / budget == bin, s"row starting at offset $cum landed in bin $bin")
        cum += n
      }
      // every bin's token total ≤ budget + one straddling row
      val maxRow = sorted.map(_._3).max
      sorted.groupBy(_._4).values.foreach { binRows =>
        assert(binRows.map(_._3).sum <= budget + maxRow)
      }
    }
  }

  test("capPerGroup: salted two-phase ≡ single window, caps bind, partitioning-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed groups: one giant (600 rows), one at the cap boundary, one under
    val rows = (0L until 600L).map(i => (i, "big", (i * 37) % 601)) ++
      (600L until 605L).map(i => (i, "edge", i)) ++
      (605L until 607L).map(i => (i, "small", i))
    val df = rows.toDF("id", "grp", "ord")
    val maxN = 5

    def ids(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      d.select("id", "grp").collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val twoPhase = ids(Sampling.capPerGroup(df, "grp", "id", col("ord"), maxN, salts = 7))
    val single = ids(df.withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("ord").asc, col("id").asc)))
      .filter(col("rk") <= maxN).drop("rk"))
    assert(twoPhase == single, "two-phase cap must equal the single-window form")

    val byGroup = twoPhase.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byGroup == Map("big" -> maxN, "edge" -> maxN, "small" -> 2),
      s"cap must bind only on over-cap groups: $byGroup")

    val repart = ids(Sampling.capPerGroup(
      df.repartition(13), "grp", "id", col("ord"), maxN, salts = 7))
    assert(repart == twoPhase, "cap must be partitioning-invariant")
  }

  test("capPerGroup works with string ids (hash salt, no silent salt collapse)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 200).map(i => (f"doc-$i%05d", "g", (i * 37) % 201))
      .toDF("id", "grp", "ord")
    val got = Sampling.capPerGroup(df, "grp", "id", col("ord"), maxN = 5, salts = 4)
      .select("id").collect().map(_.getString(0)).toSet
    val single = df.withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("ord").asc, col("id").asc)))
      .filter(col("rk") <= 5).select("id").collect().map(_.getString(0)).toSet
    assert(got == single, "string-id cap must equal the single-window form")
    assert(got.size == 5)
  }
}
