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

  /** Open-addressing long set for the packed-gram fast path of
    * [[charStats]]. 0 is the empty sentinel — packed values always carry a
    * nonzero length tag in the top byte, so 0 never collides with data. */
  private final class LongSet(initialCapacity: Int) {
    private var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2)
    private var table = new Array[Long](cap)
    var size = 0
    private def mix(v: Long): Long = {
      var h = v * 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^ (h >>> 33)
    }
    def add(v: Long): Unit = {
      var i = (mix(v) & (cap - 1)).toInt
      while (table(i) != 0L) {
        if (table(i) == v) return
        i = (i + 1) & (cap - 1)
      }
      table(i) = v
      size += 1
      if (size * 2 > cap) grow()
    }
    private def grow(): Unit = {
      val old = table
      cap <<= 1
      table = new Array[Long](cap)
      var j = 0
      while (j < old.length) {
        val v = old(j)
        if (v != 0L) {
          var i = (mix(v) & (cap - 1)).toInt
          while (table(i) != 0L) i = (i + 1) & (cap - 1)
          table(i) = v
        }
        j += 1
      }
    }
  }

  /** One-pass character-n-gram profile: struct(n_chars, n_grams,
    * n_distinct) with EXACTLY the gram semantics of the Column-level
    * `charNgrams` (numChars ≤ n → the whole string is the single gram;
    * otherwise the numChars−n+1 sliding windows over CODE POINTS).
    *
    * Distinct counting is exact, never sketched: a window of ≤ 7 bytes
    * (every all-ASCII gram for n ≤ 7) packs INJECTIVELY into a long
    * (length tag in the top byte + bytes little-endian) and lands in an
    * open-addressing [[LongSet]] — zero per-gram allocation on ASCII
    * corpora; wider windows (multibyte text, large n) fall back to a
    * string set of the actual gram. The domains are disjoint (byte length
    * decides), so the sum of the two set sizes is the exact distinct
    * count. Replaces the interpreted transform/substr/array_distinct
    * chain that allocated one string per gram (~5k per web doc). */
  def charStats(text: UTF8String, n: Int): GenericInternalRow = {
    require(n > 0, s"charStats n must be positive, got $n")
    val nChars = text.numChars()
    if (nChars <= n)
      return new GenericInternalRow(Array[Any](nChars, 1, 1))
    // byte offset of each char boundary (one int array per ROW, not one
    // string per gram)
    val offs = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (c < nChars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      c += 1
    }
    offs(nChars) = text.numBytes()
    val nGrams = nChars - n + 1
    val packed = new LongSet(math.min(nGrams, 1 << 16))
    var wide: java.util.HashSet[UTF8String] = null
    var i = 0
    while (i < nGrams) {
      val start = offs(i)
      val end = offs(i + n)
      val len = end - start
      if (len <= 7) {
        var v = 0L
        var k = start
        while (k < end) {
          v = (v << 8) | (text.getByte(k) & 0xffL)
          k += 1
        }
        packed.add(v | (len.toLong << 56))
      } else {
        if (wide == null) wide = new java.util.HashSet[UTF8String]()
        wide.add(text.substring(i, i + n)): Unit
      }
      i += 1
    }
    val distinct = packed.size + (if (wide == null) 0 else wide.size)
    new GenericInternalRow(Array[Any](nChars, nGrams, distinct))
  }
}
