package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SpansSpec extends SparkTestBase {

  import spark.implicits._

  private def spansOf(docs: Seq[(Long, String)], k: Int = 4) =
    Spans.repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("a shared window is reported as one extent in both documents") {
    // docs 1 and 2 share "c d e f" (a 4-token window); doc 3 is clean
    val got = spansOf(Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y c d e f z w"),
      (3L, "p q r s t u v m")))
    assert(got == Set((1L, 2L, 5L, 4L), (2L, 2L, 5L, 4L)))
  }

  test("overlapping and adjacent windows merge into one maximal extent") {
    // docs share 6 consecutive tokens → three overlapping 4-windows → one extent
    val got = spansOf(Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "c d e f g h q r s t")))
    assert(got == Set((1L, 2L, 7L, 6L), (2L, 0L, 5L, 6L)))
  }

  test("disjoint repeats produce separate extents") {
    // doc 1 shares "a b c d" with doc 2 and "w x y z" with doc 3, far apart
    val got = spansOf(Seq(
      (1L, "a b c d m1 m2 m3 m4 m5 w x y z"),
      (2L, "a b c d n1 n2 n3 n4 n5 n6 n7 n8 n9"),
      (3L, "k1 k2 k3 k4 k5 w x y z k6 k7 k8 k9")))
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1 == Set((1L, 0L, 3L, 4L), (1L, 9L, 12L, 4L)))
  }

  test("within-document repetition alone does not flag (minDocs honors distinct docs)") {
    val got = spansOf(Seq(
      (1L, "a b c d q1 q2 a b c d q3 q4"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8")))
    assert(got.isEmpty)
  }

  test("documents shorter than k are exempt") {
    val got = spansOf(Seq((1L, "a b c"), (2L, "a b c")))
    assert(got.isEmpty)
  }

  test("full-document duplicates cover the whole token range") {
    val text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val got = spansOf(Seq((1L, text), (2L, text)))
    assert(got == Set((1L, 0L, 9L, 10L), (2L, 0L, 9L, 10L)))
  }

  private def stripOf(docs: Seq[(Long, String)], k: Int = 4) =
    Spans.stripRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("strip cuts exactly the repeated extent and keeps the rest verbatim") {
    val got = stripOf(Seq(
      (1L, "a b c d e f g h"),   // shares "c d e f" with doc 2
      (2L, "x y c d e f z w"),
      (3L, "p q r s t u v m")))  // untouched
    // doc 1: remove tokens 2..5 → "a b g h" (len 7)
    assert(got(1L) == (8L, 4L, 7L), got)
    assert(got(2L) == (8L, 4L, 7L), got)
    assert(got(3L) == (8L, 0L, 15L), got)
  }

  test("strip of a full-document duplicate leaves the empty string") {
    val text = "t1 t2 t3 t4 t5 t6"
    val got = Spans.stripRepeatedSpans(
        Seq((1L, text), (2L, text)).toDF("doc_id", "text"), "doc_id", "text", 4)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((6L, 0L))) // all 6 removed, clean_len 0 for both
  }

  test("dedupRepeatedSpans keeps exactly the min-(doc,pos) witness of a planted repeat") {
    // "b1..b4" repeats across all three docs; doc 1 holds the minimum
    // (doc_id, pos) occurrence, so it alone keeps the boilerplate
    val got = Spans.dedupRepeatedSpans(Seq(
        (1L, "u1 u2 b1 b2 b3 b4 u3 u4"),
        (2L, "v1 v2 v3 b1 b2 b3 b4 v4"),
        (3L, "b1 b2 b3 b4 w1 w2 w3 w4")).toDF("doc_id", "text"),
        "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == (0L, "u1 u2 b1 b2 b3 b4 u3 u4"), got)
    assert(got(2L) == (4L, "v1 v2 v3 v4"), got)
    assert(got(3L) == (4L, "w1 w2 w3 w4"), got)
  }

  test("dedupRepeatedSpans: a witness inside an overlap survives; non-witness copies go") {
    // two docs share the SAME long run; the whole run survives once (doc 1)
    val text = "t1 t2 t3 t4 t5 t6"
    val got = Spans.dedupRepeatedSpans(
        Seq((1L, text), (2L, text)).toDF("doc_id", "text"), "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == (0L, text), got)
    assert(got(2L) == (6L, ""), got)
  }

  test("dedupRepeatedSpans reconstruction invariant on the fixture corpus: every repeated k-gram survives") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    def shinglesOf(text: String, k: Int): Seq[String] = {
      val toks = text.split(" ", -1)
      if (toks.length < k) Seq.empty
      else (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
    }
    val orig = df.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val repeated = orig.flatMap { case (id, t) => shinglesOf(t, 8).distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2).keySet
    assert(repeated.nonEmpty, "fixture must contain cross-doc repeats")
    val cleaned = Spans.dedupRepeatedSpans(df, "doc_id", "text", k = 8)
      .collect().map(r => r.getString(3))
    val survivors = cleaned.flatMap(shinglesOf(_, 8)).toSet
    repeated.foreach { g =>
      assert(survivors.contains(g), s"repeated 8-gram lost corpus-wide: '$g'")
    }
    // and the strip-all variant's failure mode is real: it deletes some
    // repeated grams from EVERY copy (what keep-one exists to prevent)
    val strippedAll = Spans.stripRepeatedSpans(df, "doc_id", "text", k = 8)
    assert(strippedAll.collect().map(_.getLong(2)).sum > 0)
  }

  test("strip ≡ manual recomputation from the extents on the fixture corpus") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val spans = Spans.repeatedSpans(df, "doc_id", "text", k = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))) }
    val expected = df.select(col("doc_id"), col("text")).collect().map { r =>
      val id = r.getLong(0)
      val toks = r.getString(1).split(" ", -1)
      val exts = spans.getOrElse(id, Array.empty)
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !exts.exists { case (s, e) => i >= s && i <= e } => t
      }
      id -> kept.mkString(" ")
    }.toMap
    val got = Spans.stripRepeatedSpans(df, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    expected.foreach { case (id, clean) =>
      assert(got(id) == clean.length.toLong, s"doc $id clean_len mismatch")
    }
  }
}
