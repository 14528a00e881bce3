package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Fused one-pass kernel behind the Gopher document-quality rule set
  * (Rae et al. 2021, "Scaling Language Models: ... Gopher", Appendix A1.1):
  * every count the published rules need — words, word characters,
  * alphabetic words, required-word diversity, symbol occurrences
  * (`#` / `...`), lines, bullet lines, ellipsis-terminated lines — in ONE
  * walk over the raw UTF-8 bytes, as a single whole-stage-codegen call.
  *
  * Counting conventions are chosen so a DuckDB oracle replicates each
  * field with plain string/list operations:
  *
  *   - words = single-code-point separator split (space or newline, empty
  *     tokens kept) — `string_split(replace(page, chr(10), ' '), ' ')`;
  *   - word characters = code points not spent on separators —
  *     `length(page) - (n_words - 1)` (the d_text_stats identity);
  *   - `...` occurrences = greedy non-overlapping left-to-right — a run of
  *     r dots counts r/3, the `replace(page,'...','')` length delta;
  *   - a bullet line STARTS with '•' or '-'; an ellipsis line ENDS with
  *     the three bytes "...";
  *   - required-word diversity = number of DISTINCT [[TextMarkers.markers]]
  *     union-lexicon words present (Gopher's "stop word" rule, over the
  *     corpus's own function-word lexicon).
  */
object TextGopher {

  /** The required-word lexicon (Gopher rule 7's stop-word list, using the
    * corpus lexicon that [[TextMarkers]] already single-sources with the
    * SQL oracles). Order is the declaration order — the oracle embeds the
    * same list literally. */
  val requiredWords: Seq[String] = TextMarkers.markers.flatMap(_._2)

  private val wordIndex: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    requiredWords.zipWithIndex.foreach { case (w, i) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(i))
    }
    m
  }
  private val maxRequiredBytes: Int =
    requiredWords.map(_.getBytes("UTF-8").length).max

  /** One-pass counts: struct(n_words, sum_word_chars, n_alpha_words,
    * n_stop_distinct, n_hash, n_ellipsis, n_lines, n_bullet_lines,
    * n_ellipsis_lines). */
  def stats(text: UTF8String): GenericInternalRow = {
    val nBytes = text.numBytes()
    var b = 0
    var nChars = 0
    var nSeps = 0
    var nHash = 0
    var nEllipsis = 0
    var dotRun = 0
    var nLines = 1
    var nBullet = 0
    var nEllipsisLines = 0
    var nAlphaWords = 0
    var tokenAlpha = false
    var tokenStart = 0
    var lineFirst = true
    // last three bytes of the current line (l3 = most recent)
    var l1 = 0; var l2 = 0; var l3 = 0
    val probe = new Array[Byte](maxRequiredBytes)
    val hit = new Array[Boolean](requiredWords.length)

    def endToken(endB: Int): Unit = {
      if (tokenAlpha) nAlphaWords += 1
      val len = endB - tokenStart
      if (len > 0 && len <= maxRequiredBytes) {
        var k = 0
        while (k < len) { probe(k) = text.getByte(tokenStart + k); k += 1 }
        val idx = wordIndex.get(UTF8String.fromBytes(probe, 0, len))
        if (idx != null) hit(idx) = true
      }
      tokenAlpha = false
    }

    while (b < nBytes) {
      val fb = text.getByte(b)
      val w = UTF8String.numBytesForFirstByte(fb)
      nChars += 1
      val isSpace = w == 1 && fb == ' '
      val isNl = w == 1 && fb == '\n'
      if (dotRun > 0 && !(w == 1 && fb == '.')) { nEllipsis += dotRun / 3; dotRun = 0 }
      if (lineFirst) {
        // bullet: '•' is E2 80 A2; '-' is ASCII
        if ((w == 3 && (fb & 0xff) == 0xe2 && b + 2 < nBytes &&
              (text.getByte(b + 1) & 0xff) == 0x80 && (text.getByte(b + 2) & 0xff) == 0xa2) ||
            (w == 1 && fb == '-')) nBullet += 1
        lineFirst = false
      }
      if (isSpace || isNl) {
        nSeps += 1
        endToken(b)
        tokenStart = b + 1
        if (isNl) {
          if (l1 == '.' && l2 == '.' && l3 == '.') nEllipsisLines += 1
          nLines += 1
          lineFirst = true
          l1 = 0; l2 = 0; l3 = 0
        } else { l1 = l2; l2 = l3; l3 = fb }
      } else {
        if (w == 1) {
          if (fb == '#') nHash += 1
          if (fb == '.') dotRun += 1
          if ((fb >= 'a' && fb <= 'z') || (fb >= 'A' && fb <= 'Z')) tokenAlpha = true
        }
        // shift the line tail by each BYTE (the "..." suffix test is a
        // byte-suffix test, same as LIKE '%...')
        var k = 0
        while (k < w && b + k < nBytes) { l1 = l2; l2 = l3; l3 = text.getByte(b + k); k += 1 }
      }
      b += w
    }
    if (dotRun > 0) nEllipsis += dotRun / 3
    if (l1 == '.' && l2 == '.' && l3 == '.') nEllipsisLines += 1
    endToken(nBytes)

    var nStop = 0
    var i = 0
    while (i < hit.length) { if (hit(i)) nStop += 1; i += 1 }

    new GenericInternalRow(Array[Any](
      nSeps + 1, nChars - nSeps, nAlphaWords, nStop,
      nHash, nEllipsis, nLines, nBullet, nEllipsisLines))
  }
}
