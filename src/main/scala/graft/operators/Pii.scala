package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the compliance pass a training corpus runs
  * before anything else sees the text: count and mask email addresses,
  * phone numbers, and IPv4 addresses.
  *
  * The patterns use only character classes, bounded repetition, and
  * alternation-free concatenation — the regex subset on which Java's
  * engine (Spark) and RE2 (DuckDB, the oracle) provably agree on both
  * match sets and leftmost-first semantics, so the redacted text is
  * byte-identical across engines (no lookaround, no backreferences, no
  * word-boundary metachars).
  *
  * Scale shape: a single narrow projection — `regexp_count` /
  * `regexp_replace` are codegen'd built-ins, no UDF, no shuffle; the scan
  * parallelizes embarrassingly and column-prunes to the text column.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\(\\d{3}\\) \\d{3}-\\d{4}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  val EmailTag = "<EMAIL>"
  val PhoneTag = "<PHONE>"
  val Ipv4Tag = "<IP>"

  /** All three masks, email first (its domain would otherwise be clipped by
    * the IP pass on numeric domains), phone before IP (disjoint, order kept
    * fixed for the oracle contract). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit(EmailTag)),
        lit(PhoneRe), lit(PhoneTag)),
      lit(Ipv4Re), lit(Ipv4Tag))

  /** Per-row PII report: non-overlapping match counts per category, plus
    * the redacted text pinned by length + 64-bit fingerprint (so a gate can
    * hash-verify the full redaction without shipping the text twice). The
    * triple-replace is aliased ONCE in its own projection — referenced-twice
    * non-cheap aliases are not inlined by CollapseProject, so the three
    * regex passes run once per row, not once per derived column. */
  def scan(df: DataFrame, id: Column, text: Column): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(id.as("doc_id"), text.as("t"))
      .select(col("doc_id"), col("t"), redact(col("t")).as("red"))
      .select(
        col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phone"),
        regexp_count(col("t"), lit(Ipv4Re)).cast("long").as("n_ipv4"),
        length(col("red")).cast("long").as("red_len"),
        GraftFunctions.fingerprint64(col("red")).as("red_fp"))
  }
}
