package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("fingerprint64: codegen result matches the JVM kernel exactly") {
    GraftFunctions.register(spark)
    val rows = docs.select(col("text"),
      GraftFunctions.fingerprint64(col("text")).as("fp")).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val expected = TextHash.fnv1a64(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) == expected)
    }
  }

  test("fingerprint64 stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = docs.select(GraftFunctions.fingerprint64(col("text")))
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the `*` / codegen-id annotation marks operators inside WholeStageCodegen
    assert(plan.contains("Project [codegen id"), plan)
  }

  test("nfc: composed/decomposed collapse, ASCII untouched, codegen matches Normalizer") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val cases = Seq(
      "plain ascii stays",                 // fast path
      "café",                         // composed é
      "café",                        // decomposed e + combining acute
      "ñ and 한",    // decomposed ñ and Hangul jamo
      "")
    val got = cases.toDF("s")
      .select(col("s"), GraftFunctions.nfc(col("s")).as("n")).collect()
    got.foreach { r =>
      val expected = java.text.Normalizer.normalize(r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == expected, s"input ${r.getString(0)}")
    }
    // the two café spellings share one normalized key (and fingerprint)
    val keys = cases.toDF("s")
      .select(GraftFunctions.fingerprint64(GraftFunctions.nfc(col("s"))).as("fp"))
      .collect().map(_.getLong(0))
    assert(keys(1) == keys(2))
    // null-safe
    assert(Seq[Option[String]](None).toDF("s")
      .select(GraftFunctions.nfc(col("s"))).head().isNullAt(0))
  }

  test("simhash64: identical token arrays agree; permuted tokens agree; disjoint differ") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "spark fast query engine"),
      (2L, "spark fast query engine"),
      (3L, "engine query fast spark"), // order-insensitive by construction
      (4L, "completely different words entirely")).toDF("id", "text")
    val sigs = df.select(col("id"),
        GraftFunctions.simhash64(GraftFunctions.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) == sigs(3L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 10)
  }

  test("cosine expression matches driver-side computation") {
    GraftFunctions.register(spark)
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = embs.orderBy(col("vec_id")).limit(1).select("embedding")
      .head().getSeq[Float](0)
    val got = embs.orderBy(col("vec_id")).limit(5)
      .select(col("vec_id"), col("embedding"),
        GraftFunctions.cosineSim(col("embedding"), typedLit(q)).as("c"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](1)
      var d = 0.0; var na = 0.0; var nb = 0.0
      v.indices.foreach { i =>
        d += v(i).toDouble * q(i).toDouble
        na += v(i).toDouble * v(i).toDouble
        nb += q(i).toDouble * q(i).toDouble
      }
      val expected = if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
      assert(math.abs(r.getDouble(2) - expected) < 1e-12)
    }
    // self-similarity is 1
    assert(math.abs(got.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("langId: deterministic markers, 'und' when nothing hits") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("the cat of the house and a dog", "en"),
      ("el perro es una casa en que los", "es"),
      ("der hund ist ein und das nicht", "de"),
      ("xyzzy qwerty asdf", "und")).toDF("text", "expected")
    val got = df.select(GraftFunctions.langId(col("text")).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("qualityScore bounded in [0,1] on the corpus") {
    GraftFunctions.register(spark)
    val qs = docs.select(GraftFunctions.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head()
    assert(qs.getDouble(0) >= 0.0 && qs.getDouble(1) <= 1.0)
  }

  test("markerStats fused kernel ≡ the interpreted HOF formulation it replaced") {
    GraftFunctions.register(spark)
    val ts = split(col("text"), " ")
    def hits(markers: Seq[String]) =
      size(filter(ts, t => t.isin(markers.map(m => lit(m)): _*)))
    val ms = GraftFunctions.markerStats(col("text"))
    val rows = docs.select(
      ms.getField("n_tokens"), size(ts),
      ms.getField("n_distinct"), size(array_distinct(ts)),
      ms.getField("stop_hits"), hits(GraftFunctions.langMarkers.flatMap(_._2)),
      ms.getField("lang_hits").getItem(0), hits(GraftFunctions.langMarkers.head._2))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "n_tokens")
      assert(r.getInt(2) == r.getInt(3), "n_distinct")
      assert(r.getInt(4) == r.getInt(5), "stop_hits")
      assert(r.getInt(6) == r.getInt(7), "lang_hits[en]")
    }
  }

  test("repetitionStats fused kernel ≡ interpreted HOF formulation on the corpus") {
    GraftFunctions.register(spark)
    val ts = split(col("text"), " ")
    val n = size(ts)
    val g3 = when(n >= 3,
      transform(sequence(lit(1), n - 2), i =>
        concat_ws(" ", element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2))))
      .otherwise(array().cast("array<string>"))
    val rs = GraftFunctions.repetitionStats(col("text"))
    val rows = docs.select(
      rs.getField("n_tokens"), n,
      rs.getField("n_distinct"), size(array_distinct(ts)),
      rs.getField("max_freq"),
      array_max(transform(array_distinct(ts), d => size(filter(ts, x => x === d)))),
      rs.getField("n_3gram"), size(g3),
      rs.getField("dup_3gram"), size(g3) - size(array_distinct(g3)))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "n_tokens")
      assert(r.getInt(2) == r.getInt(3), "n_distinct")
      assert(r.getInt(4) == r.getInt(5), "max_freq")
      assert(r.getInt(6) == r.getInt(7), "n_3gram")
      assert(r.getInt(8) == r.getInt(9), "dup_3gram")
    }
  }

  /** Independent naive recomputation (Scala collections, different
    * tokenize/count/run machinery than the kernel's single pass). */
  private def naiveRepetition(text: String): (Int, Int, Int, Int, Int, Int) = {
    val toks = text.split(" ", -1).toSeq
    val n = toks.length
    val maxFreq = toks.groupBy(identity).values.map(_.size).max
    val g3 = if (n >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
    val dup3 = g3.length - g3.distinct.length
    val maxRun = {
      var best = 0; var run = 0; var prev: String = null
      toks.foreach { t =>
        run = if (t == prev) run + 1 else 1
        if (run > best) best = run
        prev = t
      }
      best
    }
    (n, toks.distinct.length, maxFreq, g3.length, dup3, maxRun)
  }

  test("repetitionStats matches a naive recomputation on edge cases and corpus sample") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val edge = Seq(
      "",                        // split('',-1) → [""]: 1 token, run 1
      "a",
      "a a a a a",               // all identical: max_freq=5, run=5, dup3=2
      "a b",                     // below 3-gram threshold
      "a b c",                   // exactly one 3-gram
      "a b a b a b a b",         // period-2: no consecutive run, dup 3-grams
      " leading and trailing ",  // empty tokens at the edges
      "x  y",                    // double space → empty middle token
      "= = = foo = = =")
      .toDF("text")
    val sample = docs.select(col("text")).limit(50)
    val rows = edge.union(sample).select(col("text"),
      GraftFunctions.repetitionStats(col("text")).as("rs")).collect()
    rows.foreach { r =>
      val expected = naiveRepetition(r.getString(0))
      val rs = r.getStruct(1)
      val got = (rs.getInt(0), rs.getInt(1), rs.getInt(2), rs.getInt(3), rs.getInt(4), rs.getInt(5))
      assert(got == expected, s"text='${r.getString(0)}'")
    }
  }

  test("repetitionOk gate: thresholds discriminate and match per-signal expectations") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("clean sentence with distinct useful words here", true),
      ("spam spam spam spam spam spam spam spam", false),   // max_freq + runs
      ("a b c a b c a b c a b c a b c a b c a b c", false), // dup 3-grams
      ("= = = normal words after a run", false))            // run of 3
      .toDF("text", "expected")
    val got = df.select(
      GraftFunctions.repetitionOk(GraftFunctions.repetitionStats(col("text"))).as("keep"),
      col("expected")).collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    // on the corpus the gate keeps most docs but not all
    val kept = docs.select(
        GraftFunctions.repetitionOk(GraftFunctions.repetitionStats(col("text")))
          .cast("int").as("k"))
      .agg(sum("k"), count(lit(1))).head()
    assert(kept.getLong(0) > 0 && kept.getLong(0) < kept.getLong(1))
  }

  test("repetitionStats stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = docs.select(GraftFunctions.repetitionStats(col("text")))
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("Project [codegen id"), plan)
  }

  test("charNgrams and regex token count") {
    import spark.implicits._
    val df = Seq("abcde", "ab").toDF("text")
    val grams = df.select(GraftFunctions.charNgrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(grams(0) == Seq("abc", "bcd", "cde"))
    assert(grams(1) == Seq("ab"))
    val counts = Seq("hello, world!  two").toDF("text")
      .select(GraftFunctions.tokenCountRegex(col("text")).as("n"))
      .collect().map(_.getInt(0))
    assert(counts.head >= 4) // words + punctuation clusters
  }

  test("charNgramStats: fused counts EQUAL the Column-level HOF recomputation") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // edge cases: empty, shorter than n, exactly n, repeats, multibyte
    // (forces the wide-gram fallback path), long ASCII (packed fast path),
    // and a mixed string whose grams straddle both domains
    val texts = Seq("", "ab", "abc", "aaaaaaa", "héllo wörld héllo",
      "日本語のテキスト日本語", ("the quick brown fox " * 50).trim,
      "aéa" * 20)
    for (n <- Seq(1, 3, 7)) {
      val df = texts.toDF("text")
      val got = df.select(
          GraftFunctions.charNgramStats(col("text"), n).as("s"),
          length(col("text")).as("len"),
          size(array_distinct(GraftFunctions.charNgrams(col("text"), n))).as("naive"))
        .collect()
      got.foreach { r =>
        val s = r.getStruct(0)
        assert(s.getInt(0) == r.getInt(1), s"n_chars n=$n")
        val expGrams = if (r.getInt(1) <= n) 1 else r.getInt(1) - n + 1
        assert(s.getInt(1) == expGrams, s"n_grams n=$n")
        assert(s.getInt(2) == r.getInt(2), s"n_distinct n=$n naive=${r.getInt(2)}")
      }
    }
  }

  test("charNgramStats stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = docs.select(GraftFunctions.charNgramStats(col("text"), 3))
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("Project [codegen id"), plan)
  }

  test("wordShingles: k consecutive tokens, short text degrades to whole text") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq("a b c d", "a b").toDF("text")
      .select(GraftFunctions.wordShingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq("a b"))
  }

  test("langId: NULL text stays NULL (never counted as a real 'und' doc)") {
    GraftFunctions.register(spark)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val rows = Seq(org.apache.spark.sql.Row(null), org.apache.spark.sql.Row("xyzzy"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val got = df.select(GraftFunctions.langId(col("text")).as("l"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(None, Some("und")))
  }

  test("PQ codes above 127 (standard ksub=256) survive pack → packed decode") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // 2 subspaces of dim 2, ksub=256: codebook entry s*256+code
    val codebook = Array.tabulate(2 * 256)(i => Array(i.toFloat, (i + 1).toFloat))
    val codes = new GenericArrayData(Array(200, 255)) // both > 127
    val packed = VectorOps.packInt8(codes)
    assert(packed(0) == -56.toByte && packed(1) == -1.toByte) // wrapped bytes
    val decoded = VectorOps.pqDecodeBytes(packed, codebook, 256)
    assert(decoded.toFloatArray().toSeq ===
      codebook(200).toSeq ++ codebook(256 + 255).toSeq)
    // and out-of-range still fails loudly: code 255 against a ksub=16 book
    val smallBook = Array.tabulate(16)(i => Array(i.toFloat, i.toFloat))
    val bad = VectorOps.packInt8(new GenericArrayData(Array(255)))
    val ex = intercept[IllegalArgumentException](
      VectorOps.pqDecodeBytes(bad, smallBook, 16))
    assert(ex.getMessage.contains("out of range"))
  }

  test("packInt8 rejects values outside [-128, 255] instead of silently wrapping") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val ex = intercept[IllegalArgumentException](
      VectorOps.packInt8(new GenericArrayData(Array(256))))
    assert(ex.getMessage.contains("out of range"))
    val ex2 = intercept[IllegalArgumentException](
      VectorOps.packInt8(new GenericArrayData(Array(-129))))
    assert(ex2.getMessage.contains("out of range"))
    // signed q8 codes still round-trip sign-exactly
    val q8 = VectorOps.packInt8(new GenericArrayData(Array(-128, -1, 0, 127)))
    assert(q8.toSeq === Seq(-128, -1, 0, 127).map(_.toByte))
  }

  test("empty centroid matrix is a loud error, never a phantom cell 0") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vec = new GenericArrayData(Array(1.0f, 0.0f))
    val ex = intercept[IllegalArgumentException](
      VectorOps.argmaxCosineCell(vec, Array.empty[Array[Float]]))
    assert(ex.getMessage.contains("at least one centroid"))
  }

  test("BloomMightContain compares bloom bytes by content (canonicalization-safe)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val child = Literal(42L)
    val a = BloomMightContain(child, Array[Byte](1, 2, 3), 4)
    val b = BloomMightContain(child, Array[Byte](1, 2, 3), 4)
    val c = BloomMightContain(child, Array[Byte](9, 2, 3), 4)
    assert(a === b); assert(a.hashCode === b.hashCode)
    assert(a !== c)
  }

  test("member-pair kernels reject non-long key arrays at analysis time") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // keys built with hash() (INT) instead of xxhash64 (LONG): the kernel
    // reads getLong, so this must fail in analysis, not read garbage
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, "a"), (2L, "b")).toDF("id", "t")
        .select(array(struct(col("id"),
          array(hash(col("t")).cast("int")).as("ks"))).as("ms"))
        .select(explode(GraftFunctions.keyedMemberPairs(col("ms"), lit(0), lit(0))))
        .collect()
    }
    assert(ex.getMessage.contains("graft_keyed_member_pairs"))
  }
}
