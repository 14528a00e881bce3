package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Dedup.editDistancePairs]]: PassJoin blocking must have EXACT recall —
  * every spec compares against an in-memory brute force over all pairs. */
class EditDistanceSpec extends SparkTestBase {

  private def brute(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      var prev = 0
      for (j <- 1 to b.length) {
        prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val tmp = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = tmp
        }
      }
      d(a.length)
    }
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d.toLong)).toSet
  }

  private def run(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    val df = spark.createDataFrame(strs).toDF("doc_id", "title")
    Dedup.editDistancePairs(df, "doc_id", "title", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("planted single and double edits are all recovered (k=2), none beyond") {
    val base = "the quick brown fox jumps"
    val strs: Seq[(Long, String)] = Seq(
      0L -> base,
      1L -> base.replace("quick", "quvck"),          // 1 substitution
      2L -> base.drop(1),                            // 1 deletion
      3L -> ("x" + base),                            // 1 insertion
      4L -> base.replace("brown", "brawny"),         // 2 edits
      5L -> base.reverse,                            // far away
      6L -> "completely different text here")
    assert(run(strs, 2) == brute(strs, 2))
    assert(run(strs, 2).contains((0L, 1L, 1L)))
    assert(!run(strs, 2).exists { case (a, b, _) => a == 5L || b == 5L })
  }

  test("pseudo-random corpus: blocking recall is exact at k=1,2,3") {
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps")
    val strs: Seq[(Long, String)] = (0L until 60L).map { i =>
      val r = new scala.util.Random(i * 7 + 1)
      val s = (0 until 3).map(_ => vocab(r.nextInt(vocab.length))).mkString(" ")
      // plant noise on a third of them
      val mutated =
        if (i % 3 == 0 && s.nonEmpty) s.updated(r.nextInt(s.length), 'z') else s
      i -> mutated
    }
    for (k <- Seq(1, 2, 3))
      assert(run(strs, k) == brute(strs, k), s"k=$k")
  }

  test("short strings (len <= 2k) pair through the brute tier, exactly") {
    val strs: Seq[(Long, String)] = Seq(
      0L -> "", 1L -> "a", 2L -> "ab", 3L -> "ba", 4L -> "abcd",
      5L -> "abcde", 6L -> "xy", 7L -> "abcdefgh")
    for (k <- Seq(1, 2))
      assert(run(strs, k) == brute(strs, k), s"k=$k")
  }

  test("mixed lengths across the short/segment boundary keep exact recall") {
    val strs: Seq[(Long, String)] = Seq(
      0L -> "abc",       // len 3 = k+1 at k=2: segment tier
      1L -> "abcd",      // within 1
      2L -> "ab",        // len 2 = 2k boundary: short tier
      3L -> "abcdef",
      4L -> "b")
    assert(run(strs, 2) == brute(strs, 2))
  }

  test("distance-0 pairs are reported (callers slice the band)") {
    val strs: Seq[(Long, String)] = Seq(0L -> "same", 1L -> "same", 2L -> "sane")
    val got = run(strs, 1)
    assert(got == Set((0L, 1L, 0L), (0L, 2L, 1L), (1L, 2L, 1L)))
  }

  test("multi-match-aware probe windows keep exact recall on a dense random corpus") {
    // small alphabet + short lengths force MANY true near pairs across
    // every (length diff, segment, offset) combination — the adversarial
    // shape for the tightened PassJoin position windows
    val r = new scala.util.Random(421)
    val strs: Seq[(Long, String)] = (0L until 300L).map { i =>
      val len = r.nextInt(13)
      i -> (0 until len).map(_ => ('a' + r.nextInt(3)).toChar).mkString
    }
    for (k <- Seq(1, 2, 3)) {
      val got = run(strs, k)
      val want = brute(strs, k)
      assert((want -- got).isEmpty, s"k=$k lost pairs: ${(want -- got).take(5)}")
      assert((got -- want).isEmpty, s"k=$k phantom pairs: ${(got -- want).take(5)}")
    }
  }

  test("multi-match-aware windows stay exact at high k (4, 5) on longer strings") {
    // the window algebra [max(-i, Δ-(k-i)), min(i, Δ+(k-i))] must hold for
    // every (i, Δ) combination — higher k exercises corners the k<=3
    // sweeps cannot reach
    val r = new scala.util.Random(1234)
    val strs: Seq[(Long, String)] = (0L until 120L).map { i =>
      val len = 8 + r.nextInt(16)
      i -> (0 until len).map(_ => ('a' + r.nextInt(4)).toChar).mkString
    }
    for (k <- Seq(4, 5)) {
      val got = run(strs, k)
      val want = brute(strs, k)
      assert((want -- got).isEmpty, s"k=$k lost pairs: ${(want -- got).take(5)}")
      assert((got -- want).isEmpty, s"k=$k phantom pairs: ${(got -- want).take(5)}")
    }
  }

  test("member-expansion joins exchange on 128-bit fingerprints, never raw strings") {
    val strs: Seq[(Long, String)] = (0L until 40L).map(i => i -> s"title number ${i % 9}")
    val df = spark.createDataFrame(strs).toDF("doc_id", "title")
    val plan = graft.operators.Dedup.editDistancePairs(df, "doc_id", "title", 2)
      .queryExecution.executedPlan.toString
    // the candidate join legitimately partitions on (len, i, piece); the
    // EXPANSION tier must key on the fp struct — a raw-string exchange
    // would ship document text as shuffle keys
    assert(!plan.matches("(?s).*hashpartitioning\\((s_a|s_b|str)#.*"),
      s"expansion exchange still keyed on raw strings:\n$plan")
    assert(plan.contains("fp_a") && plan.contains("fp_b"),
      s"fingerprint join keys missing from plan:\n$plan")
  }
}
