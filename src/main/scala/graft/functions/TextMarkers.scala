package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Marker lexicons + the fused text-marker kernel behind the language-ID /
  * quality / text-stats family.
  *
  * The Column-level formulation (one interpreted `filter(tokens, isin)`
  * higher-order function per language plus one for the union, plus
  * separate `split`/`array_distinct` passes) walks the token array up to
  * seven times per row with per-element Catalyst interpretation. This
  * kernel produces every count the family needs in ONE pass over the raw
  * string — tokenization included — as a single whole-stage-codegen call;
  * the arithmetic that combines the counts stays in (codegen'd, exact)
  * Column expressions, so the oracle SQL contracts are unchanged. */
object TextMarkers {

  /** Tiny on purpose — the real discriminator on web text; deterministic +
    * SQL-portable (the DuckDB oracles embed these words as literals). */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "a", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "en", "que"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有"))

  private val space = UTF8String.fromString(" ")
  private val langSets: Array[java.util.HashSet[UTF8String]] =
    markers.map { case (_, ms) =>
      val s = new java.util.HashSet[UTF8String]()
      ms.foreach(m => s.add(UTF8String.fromString(m)))
      s
    }.toArray
  private val unionSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    markers.foreach(_._2.foreach(m => s.add(UTF8String.fromString(m))))
    s
  }

  /** One-pass counts: (n_tokens, n_distinct, lang_hits[nLangs],
    * stop_hits). Tokenization is the same `split(' ', -1)` convention as
    * the Column formulation (trailing/empty tokens kept and counted;
    * marker membership is exact string equality). A token present in
    * several languages' lexicons counts once in stop_hits — identical to
    * the union-list `isin` it replaces. */
  def stats(text: UTF8String): GenericInternalRow = {
    val toks = text.split(space, -1)
    val distinct = new java.util.HashSet[UTF8String]()
    val langHits = new Array[Int](langSets.length)
    var stop = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      distinct.add(t)
      if (unionSet.contains(t)) {
        stop += 1
        var l = 0
        while (l < langSets.length) {
          if (langSets(l).contains(t)) langHits(l) += 1
          l += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length, distinct.size, new GenericArrayData(langHits), stop))
  }
}
