package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the stage every web-crawl curation pipeline
  * runs BEFORE the quality/dedup tiers (CommonCrawl WET-style plain-text
  * extraction): strip script/style/comment blocks, drop markup, decode the
  * common entities, collapse whitespace. The reference has no extraction
  * tier; this extends SURVEY §2.3's curation family at its natural front.
  *
  * Built entirely from codegen'd `regexp_replace` chains (no UDF, stays
  * inside whole-stage codegen; one narrow projection, no shuffle — scales
  * as a pure map at any corpus size). Every pattern is restricted to the
  * Java ≡ RE2 agreeing regex subset (the [[Pii]] discipline: inline
  * `(?is)` flags, non-greedy `.*?`, character classes — all identical
  * semantics in Spark's Java regex and DuckDB's RE2), so the oracle runs
  * the SAME pattern strings and the gate pins the full output by
  * fingerprint.
  *
  * Order matters and is part of the contract:
  *   1. script/style blocks go first (their CONTENT must vanish — a `<`
  *      inside inline JS must not derail tag stripping);
  *   2. comments, then all remaining tags → a space (block boundaries
  *      become token boundaries, never word-joins);
  *   3. entities decode AFTER tag stripping (a decoded `&lt;` is text,
  *      not markup) with `&amp;` LAST (so `&amp;lt;` yields the literal
  *      text `&lt;`, per HTML semantics — double-decoding is a classic
  *      extraction bug);
  *   4. whitespace collapses to single spaces, trimmed.
  */
object TextExtract {

  /** The ordered (pattern → replacement) regex chain; single-sourced so
    * the SQL oracle replays the identical strings in the identical
    * order. */
  val RegexSteps: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    // a tag opener must be a letter, '/' or '!' (the HTML parsing rule:
    // a bare '< ' is TEXT) — otherwise a stray '<' would swallow
    // everything up to the next real tag's '>'
    "<[A-Za-z/!][^>]*>" -> " ")

  /** The ordered literal entity decodes (`&amp;` strictly last). */
  val EntitySteps: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Extracted plain text of an HTML column. */
  def stripHtml(html: Column): Column = {
    val noMarkup = RegexSteps.foldLeft(html) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    val decoded = EntitySteps.foldLeft(noMarkup) { case (c, (e, r)) =>
      // literal replace (not regex): entity strings carry no metachars,
      // but the replacement "$" semantics of regexp_replace must never
      // apply to text
      overlayReplace(c, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Literal string replace on a column (Spark's `replace` SQL function —
    * non-regex, exactly DuckDB's `replace`). */
  private def overlayReplace(c: Column, find: String, repl: String): Column =
    call_function("replace", c, lit(find), lit(repl))
}
