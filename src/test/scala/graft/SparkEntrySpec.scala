package graft

/** The driver contract, pinned locally: every gate query has a DuckDB
  * oracle (the round-8 "zero rows-only gates" bar must never silently
  * regress), the two registries can't drift apart, and the flagship
  * entry smoke-passes on the smallest fixture — the exact checks the
  * driver harness runs, failing HERE first. */
class SparkEntrySpec extends SparkTestBase {

  test("queries and oracleSql cover the same gate set — no oracle-less gate can appear") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o, s"drift: queries-only ${(q -- o).take(5)}, oracle-only ${(o -- q).take(5)}")
    assert(q.size >= 157, s"gate inventory shrank to ${q.size}")
  }

  test("gate names are well-formed (prefix-classified, shell-safe)") {
    val pat = "^[a-z][a-z0-9_]*$".r
    SparkEntry.queries.keySet.foreach { n =>
      assert(pat.matches(n), s"gate name '$n' is not [a-z0-9_]")
      assert(n.startsWith("c") || n.startsWith("r_") ||
        n.startsWith("d_") || n.startsWith("s_") || n.startsWith("q"),
        s"gate name '$n' has no family prefix")
    }
  }

  test("flagship entry returns rows on sf0.001 (the driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
