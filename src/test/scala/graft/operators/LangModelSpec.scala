package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkTestBase {

  import spark.implicits._

  test("hand-computed bigram means on a 3-doc corpus") {
    // corpus: "a b a b", "a b", "c a" → V = 3 (a, b, c)
    // uni: a=3? a appears: doc1 a,a doc2 a doc3 a → 4; b: 3; c: 1
    // bigrams: "a b"×3, "b a"×1, "c a"×1
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c a")).toDF("doc_id", "text")
    val got = LangModel.scoreBigram(df, df, "doc_id", "text", minMeanP = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    val v = 3.0
    val cA = 4.0; val cB = 3.0; val cC = 1.0
    val pAB = (3.0 + 1) / (cA + v) // P(b|a) = 4/7
    val pBA = (1.0 + 1) / (cB + v) // P(a|b) = 2/6
    val d1 = (pAB + pBA + pAB) / 3.0
    val d2 = pAB / 1.0
    val d3 = (1.0 + 1) / (cC + v) / 1.0 // P(a|c) = 2/4
    assert(got(1L)._1 == 3L && got(1L)._2 == d1, s"doc1: ${got(1L)} vs $d1")
    assert(got(2L)._1 == 1L && got(2L)._2 == d2)
    assert(got(3L)._1 == 1L && got(3L)._2 == d3)
    // threshold 0.5: doc2 (4/7 ≈ 0.571) passes, doc3 sits EXACTLY on the
    // boundary (2/4 = 0.5, inclusive >=), doc1's mixed mean fails
    assert(got(2L)._3 && !got(1L)._3 && got(3L)._3)
  }

  test("single-token and empty docs are excluded; result is partitioning-stable") {
    val df = Seq((1L, "a"), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
    val ids = LangModel.scoreBigram(df, df, "doc_id", "text", 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
    // fold determinism: mean_p identical under a different partitioning
    val big = (0 until 200).map(i => (i.toLong, s"w${i % 7} x w${i % 5} y w${i % 3} z"))
      .toDF("doc_id", "text")
    val a = LangModel.scoreBigram(big, big, "doc_id", "text", 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LangModel.scoreBigram(big.repartition(13), big.repartition(7), "doc_id", "text", 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b, "mean_p changed under repartitioning")
  }

  test("gibberish scores below natural repetition under a self-trained model") {
    val natural = (0 until 50).map(i => (i.toLong, "the cat sat on the mat " * 3))
    val weird = Seq((999L, "zq xv qp mw lk jh gf ds"))
    val df = (natural ++ weird).toDF("doc_id", "text")
    val scores = LangModel.scoreBigram(df, df, "doc_id", "text", 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(999L) < scores(0L),
      s"gibberish ${scores(999L)} not below natural ${scores(0L)}")
  }
}
