package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Registration + Column-level API for the custom expressions, and the
  * composed text-analysis functions built from codegen'd built-ins. */
object GraftFunctions {

  /** Register the native expressions in the session's function registry
    * (idempotent). They are then usable from both the Column API below and
    * plain SQL. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_fingerprint64",
      es => Fingerprint64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_fingerprint64_alt",
      es => Fingerprint64Alt(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_intersect_count",
      es => SortedIntersectCount(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      es => MinHashSig(es(0),
        es(1).eval().asInstanceOf[Number].intValue,
        es(2).eval().asInstanceOf[Number].longValue), "built-in")
    reg.createOrReplaceTempFunction("graft_hashed_tf_vector",
      es => HashedTfVector(es(0),
        es(1).eval().asInstanceOf[Number].intValue), "built-in")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      es => WordShingles(es(0),
        es(1).eval().asInstanceOf[Number].intValue), "built-in")
    reg.createOrReplaceTempFunction("graft_ivf_cell",
      es => IvfCellAssign(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_marker_stats",
      es => MarkerStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_repetition_stats",
      es => RepetitionStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_keyed_member_pairs",
      es => KeyedMemberPairs(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_sig_member_pairs",
      es => SigMemberPairs(es(0), es(1), es(2),
        es(3).eval().asInstanceOf[Number].intValue), "built-in")
    reg.createOrReplaceTempFunction("graft_sized_member_pairs",
      es => SizedMemberPairs(es(0), es(1), es(2),
        es(3).eval().asInstanceOf[Number].doubleValue), "built-in")
  }

  def fingerprint64(c: Column): Column = call_function("graft_fingerprint64", c)
  def fingerprint64Alt(c: Column): Column = call_function("graft_fingerprint64_alt", c)
  /** 128-bit fingerprint as a (f1, f2) struct of two independent FNV-1a
    * streams — the hashed-dedup shuffle key at corpus scale. */
  def fingerprint128(c: Column): Column =
    struct(call_function("graft_fingerprint64", c).as("f1"),
      call_function("graft_fingerprint64_alt", c).as("f2"))
  def simhash64(tokens: Column): Column = call_function("graft_simhash64", tokens)
  def cosineSim(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def dotProduct(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_count", a, b)
  def minhashSig(shingles: Column, numHashes: Int, seed: Long): Column =
    call_function("graft_minhash_sig", shingles, lit(numHashes), lit(seed))
  def hashedTfVector(tokens: Column, dim: Int): Column =
    call_function("graft_hashed_tf_vector", tokens, lit(dim))
  /** Argmax-cosine IVF cell of a float-vector column against a constant
    * centroid matrix — one plan node regardless of cell count. */
  def ivfCell(vec: Column, centroids: Seq[Seq[Float]]): Column =
    call_function("graft_ivf_cell", vec, typedLit(centroids))
  def keyedMemberPairs(ms: Column, member: Column, band: Column): Column =
    call_function("graft_keyed_member_pairs", ms, member, band)
  def sigMemberPairs(ms: Column, member: Column, chunk: Column, maxHamming: Int): Column =
    call_function("graft_sig_member_pairs", ms, member, chunk, lit(maxHamming))
  def sizedMemberPairs(ms: Column, member: Column, band: Column, threshold: Double): Column =
    call_function("graft_sized_member_pairs", ms, member, band, lit(threshold))

  // ---- text analysis over codegen'd built-ins (oracle-portable) ----

  /** Whitespace tokenization. The fixtures are single-space separated; a
    * general corpus would normalize first (see [[normalize]]). */
  def tokens(text: Column): Column = split(text, " ")

  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count heuristic: words + punctuation clusters. */
  def tokenCountRegex(text: Column): Column =
    size(split(text, "(?=[^a-zA-Z0-9])|\\s+"))

  /** Sorted distinct token set — canonical key for exact content dedup
    * robust to word order/repetition. */
  def canonicalKey(text: Column): Column =
    array_join(array_sort(array_distinct(tokens(text))), " ")

  /** Word k-shingles (k consecutive tokens joined) — the MinHash unit.
    * Native codegen expression ([[WordShingles]]); requires [[register]]. */
  def wordShingles(text: Column, k: Int): Column =
    call_function("graft_word_shingles", text, lit(k))

  /** Character n-grams of the raw string. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) <= n, array(text))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  // marker lexicons for the language-ID heuristic (tiny on purpose — the
  // real discriminator on web text; deterministic + SQL-portable)
  val langMarkers: Seq[(String, Seq[String])] = TextMarkers.markers

  /** Fused one-pass marker statistics: struct(n_tokens, n_distinct,
    * lang_hits, stop_hits) as ONE codegen call over the raw string —
    * replaces the former per-language interpreted `filter(tokens, isin)`
    * passes. Requires [[register]]. */
  def markerStats(text: Column): Column = call_function("graft_marker_stats", text)

  /** Fused one-pass repetition statistics: struct(n_tokens, n_distinct,
    * max_freq, n_3gram, dup_3gram, max_run) as ONE codegen call — the
    * counting tier of the Gopher/C4-style quality filter. Requires
    * [[register]]. */
  def repetitionStats(text: Column): Column =
    call_function("graft_repetition_stats", text)

  /** N-gram/stopword language-ID heuristic: count marker-word hits per
    * language, argmax with fixed tie-break order, 'und' when nothing hits.
    * Counts come from the fused [[markerStats]] kernel; the argmax stays
    * declarative (identical to the oracle's CASE chain). */
  def langId(text: Column): Column = {
    val ms = markerStats(text)
    val hits = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> ms.getField("lang_hits").getItem(i)
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((lang, h), elseCol) =>
      when(h > 0 && h === best, lit(lang)).otherwise(elseCol)
    }
  }

  /** Composite quality score in [0,1]: vocabulary diversity + length
    * saturation + non-stopword density. Single-division components in fixed
    * order so the double result is engine-portable; the integer counts come
    * from the fused [[markerStats]] kernel (same values as the former
    * array passes, so the double arithmetic is unchanged). */
  def qualityScore(text: Column): Column = {
    val ms = markerStats(text)
    val n = ms.getField("n_tokens").cast("double")
    val uniq = ms.getField("n_distinct").cast("double") / n
    val lenScore = least(lit(1.0), n / lit(64.0))
    val stopHits = ms.getField("stop_hits").cast("double")
    lit(0.5) * uniq + lit(0.3) * lenScore + lit(0.2) * (lit(1.0) - stopHits / n)
  }
}
