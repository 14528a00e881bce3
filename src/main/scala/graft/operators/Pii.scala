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

  /** Per-row PII report: match counts per category, plus the redacted text
    * pinned by length + 64-bit fingerprint (so a gate can hash-verify the
    * full redaction without shipping the text twice).
    *
    * Counts are taken at the SAME stage as each redaction pass (emails on
    * the raw text, phones after email masking, IPs after phone masking), so
    * `n_<cat>` equals the number of `<CAT>` tags in the redacted output by
    * construction — independent per-category counts on the raw text can
    * contradict the redaction when matches overlap (an IP-looking substring
    * inside an email is consumed by the email mask). Every intermediate is
    * aliased ONCE in its own projection — referenced-twice non-cheap
    * aliases are not inlined by CollapseProject, so each regex pass runs
    * once per row. */
  def scan(df: DataFrame, id: Column, text: Column): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(id.as("doc_id"), text.as("t"))
      .select(col("doc_id"), col("t"),
        regexp_replace(col("t"), lit(EmailRe), lit(EmailTag)).as("r1"))
      .select(col("doc_id"), col("t"), col("r1"),
        regexp_replace(col("r1"), lit(PhoneRe), lit(PhoneTag)).as("r2"))
      .select(col("doc_id"), col("t"), col("r1"), col("r2"),
        regexp_replace(col("r2"), lit(Ipv4Re), lit(Ipv4Tag)).as("red"))
      .select(
        col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(col("r1"), lit(PhoneRe)).cast("long").as("n_phone"),
        regexp_count(col("r2"), lit(Ipv4Re)).cast("long").as("n_ipv4"),
        length(col("red")).cast("long").as("red_len"),
        GraftFunctions.fingerprint64(col("red")).as("red_fp"))
  }
}
