package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-curation front door next to
  * [[TextExtract]]: collapse the cosmetic variants of the same resource
  * (scheme/host case, `www.` prefix, default ports, trailing slashes,
  * tracking parameters, fragments, parameter order) onto ONE canonical
  * form, so URL-level dedup and host-level stats group what is actually
  * the same page.
  *
  * The rules are the case/port/slash subset of RFC 3986 §6's syntax-based
  * normalizations plus the universal crawl conventions (strip `utm_*`
  * tracking params, drop fragments, strip `www.`). Deliberately NOT
  * implemented (they need per-character rewriting that neither engine's
  * regexp surface expresses, so the oracle-exact contract would break):
  * percent-encoding normalization (§6.2.2.1-2 — `/a%2Fb` and `/a%2fb`
  * stay distinct) and dot-segment removal (§6.2.2.3 — `/a/./b` stays
  * as-is); crawlers that emit those variants should normalize upstream.
  * The implemented rules:
  *
  *   - scheme and host lowercased; `www.` prefix dropped;
  *   - `:443` dropped under https, `:80` under http (default ports);
  *   - repeated `/` collapsed, trailing `/` dropped;
  *   - query parameters: `utm_*` removed, the rest SORTED and rejoined;
  *   - fragment dropped.
  *
  * Everything is built from codegen'd string built-ins (regexp on the
  * Java ≡ RE2 agreeing subset, the [[TextExtract]] discipline), one
  * projection, no kernel needed — and every step replicates in DuckDB
  * with the same pattern strings, so the gate is oracle-exact.
  */
object Urls {

  /** The canonical form of a URL column. Accepts anything shaped
    * `scheme://host[:port][/path][?query][#fragment]`. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = regexp_extract(rest, "^([^/?#]*)", 1)
    val host = regexp_replace(
      lower(regexp_extract(hostport, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val pathqf = regexp_replace(rest, "^[^/?#]*", "")
    val path = regexp_replace(
      regexp_replace(regexp_extract(pathqf, "^([^?#]*)", 1), "/{2,}", "/"),
      "/+$", "")
    val query0 = regexp_extract(pathqf, "\\?([^#]*)", 1)
    val params = filter(split(query0, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val query = concat_ws("&", array_sort(params))
    val portPart = when(
      port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"),
      lit("")).otherwise(concat(lit(":"), port))
    concat(scheme, lit("://"), host, portPart, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** The host of an already-canonical URL (no port, no `www.`, lowercase —
    * the host-level aggregation key). */
  def canonicalHost(canonical: Column): Column =
    regexp_extract(canonical, "^https?://([^/:?]*)", 1)
}
