package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Fused repetition-statistics kernel behind the Gopher/C4-style document
  * quality filter: every count a repetition heuristic needs, in ONE pass
  * over the raw string (tokenization included), as a single
  * whole-stage-codegen call. The Column-level alternative would walk the
  * token array five times through interpreted higher-order functions
  * (split, distinct, per-token frequency, 3-gram construction, 3-gram
  * distinct) — the measured 10–100× trap this repo's expression tier
  * exists to avoid.
  *
  * All counts are exact integers (hash SETS of the actual strings, not
  * hashed sketches), so the DuckDB oracle can replicate them with
  * list/struct operations verbatim. */
object TextQuality {

  private val space = UTF8String.fromString(" ")

  /** One-pass counts over the `split(' ', -1)` tokenization (same
    * convention as [[TextMarkers.stats]]):
    *
    *   - `n_tokens`, `n_distinct` — vocabulary diversity;
    *   - `max_freq` — highest single-token occurrence count (Gopher's
    *     "fraction of most common word" numerator);
    *   - `n_3gram`, `dup_3gram` — word-trigram total and duplicate count
    *     (`n_3gram - |distinct 3-grams|`, C4's repeated-phrase signal);
    *   - `max_run` — longest run of consecutive identical tokens
    *     (degenerate boilerplate like "= = = = =").
    */
  def stats(text: UTF8String): GenericInternalRow = {
    val toks = text.split(space, -1)
    val n = toks.length
    val freq = new java.util.HashMap[UTF8String, Integer]()
    var maxFreq = 0
    var maxRun = if (n > 0) 1 else 0
    var run = 1
    var i = 0
    while (i < n) {
      val t = toks(i)
      val c = freq.merge(t, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > maxFreq) maxFreq = c
      if (i > 0) {
        if (t.equals(toks(i - 1))) {
          run += 1
          if (run > maxRun) maxRun = run
        } else run = 1
      }
      i += 1
    }
    val n3 = if (n >= 3) n - 2 else 0
    var dup3 = 0
    if (n3 > 0) {
      val seen = new java.util.HashSet[UTF8String]()
      var j = 0
      while (j < n3) {
        val g = UTF8String.concatWs(space, toks(j), toks(j + 1), toks(j + 2))
        if (!seen.add(g)) dup3 += 1
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](
      n, freq.size, maxFreq, n3, dup3, maxRun))
  }
}
