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
    reg.createOrReplaceTempFunction("graft_nfc",
      es => NfcNormalize(es.head), "built-in")
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
    reg.createOrReplaceTempFunction("graft_ivf_cells_topn",
      es => IvfCellsTopN(es(0), es(1),
        es(2).eval().asInstanceOf[Number].intValue), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_assign",
      es => PqAssign(es(0), es(1),
        es(2).eval().asInstanceOf[Number].intValue), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_decode",
      es => PqDecode(es(0), es(1),
        es(2).eval().asInstanceOf[Number].intValue), "built-in")
    reg.createOrReplaceTempFunction("graft_pack_int8",
      es => PackInt8(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_unpack_q8",
      es => UnpackQ8(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_marker_stats",
      es => MarkerStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_repetition_stats",
      es => RepetitionStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_gopher_stats",
      es => GopherStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_char_ngram_stats",
      es => CharNgramStats(es(0),
        es(1).eval().asInstanceOf[Number].intValue), "built-in")
    reg.createOrReplaceTempFunction("graft_keyed_member_pairs",
      es => KeyedMemberPairs(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_sig_member_pairs",
      es => SigMemberPairs(es(0), es(1), es(2),
        es(3).eval().asInstanceOf[Number].intValue), "built-in")
    reg.createOrReplaceTempFunction("graft_sized_member_pairs",
      es => SizedMemberPairs(es(0), es(1), es(2),
        es(3).eval().asInstanceOf[Number].doubleValue), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      es => BloomMightContain(es(0),
        es(1).eval().asInstanceOf[Array[Byte]],
        es(2).eval().asInstanceOf[Number].intValue), "built-in")
  }

  def fingerprint64(c: Column): Column = call_function("graft_fingerprint64", c)
  def fingerprint64Alt(c: Column): Column = call_function("graft_fingerprint64_alt", c)
  /** 128-bit fingerprint as a (f1, f2) struct of two independent FNV-1a
    * streams — the hashed-dedup shuffle key at corpus scale. */
  def fingerprint128(c: Column): Column =
    struct(call_function("graft_fingerprint64", c).as("f1"),
      call_function("graft_fingerprint64_alt", c).as("f2"))
  def simhash64(tokens: Column): Column = call_function("graft_simhash64", tokens)
  /** Unicode NFC canonical composition (ASCII fast path) — normalize
    * before fingerprinting so composed/decomposed variants share keys. */
  def nfc(c: Column): Column = call_function("graft_nfc", c)
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
  /** Top-`nprobe` IVF cells (cosine DESC, cell ASC) of a float-vector
    * column against a constant centroid matrix — the in-plan probe-cell
    * assignment of the batched ANN tier. */
  def ivfCellsTopN(vec: Column, centroids: Seq[Seq[Float]], nprobe: Int): Column =
    call_function("graft_ivf_cells_topn", vec, typedLit(centroids), lit(nprobe))
  /** Per-subspace argmin-L2 PQ codes of a float-vector column against a
    * constant subspace-major codebook — one plan node regardless of
    * codebook size. */
  def pqAssign(vec: Column, codebook: Seq[Seq[Float]], ksub: Int): Column =
    call_function("graft_pq_assign", vec, typedLit(codebook), lit(ksub))
  /** PQ reconstruction (concatenated coded sub-centroids) from an
    * array<int> code column or its packed binary form. */
  def pqDecode(codes: Column, codebook: Seq[Seq[Float]], ksub: Int): Column =
    call_function("graft_pq_decode", codes, typedLit(codebook), lit(ksub))
  /** Bloom membership probe of a 64-bit fingerprint column against a
    * constant bitset — scan-local, no join ([[BloomMightContain]]). */
  def bloomContains(fp: Column, bloom: Array[Byte], k: Int): Column =
    call_function("graft_bloom_contains", fp, lit(bloom), lit(k))
  /** int8 code array → one-byte-per-component binary (quantized ANN index
    * storage). */
  def packInt8(codes: Column): Column = call_function("graft_pack_int8", codes)
  /** Packed-int8 binary + per-row scale → dequantized float32 vector. */
  def unpackQ8(codes: Column, scale: Column): Column =
    call_function("graft_unpack_q8", codes, scale)
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

  /** Fused one-pass char-n-gram profile: struct(n_chars, n_grams,
    * n_distinct) as ONE codegen call ([[CharNgramStats]]) — the counting
    * twin of [[charNgrams]] (`n_distinct` ≡
    * `size(array_distinct(charNgrams(text, n)))` exactly, string sets not
    * sketches) without the per-gram string allocation. Requires
    * [[register]]. */
  def charNgramStats(text: Column, n: Int): Column =
    call_function("graft_char_ngram_stats", text, lit(n))

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

  /** N-gram/stopword language-ID heuristic over an ALREADY-COMPUTED
    * [[markerStats]] struct column: argmax of per-language marker hits with
    * fixed tie-break order, 'und' when nothing hits. Taking the struct (not
    * the text) lets a caller alias the kernel ONCE in a narrow projection
    * and feed several derivations from it — CollapseProject keeps a
    * multiply-referenced non-cheap alias in its own Project, so the fused
    * kernel runs once per row instead of once per call site. */
  def langIdFrom(ms: Column): Column = {
    val hits = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> ms.getField("lang_hits").getItem(i)
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val decided = hits.foldRight(lit("und")) { case ((lang, h), elseCol) =>
      when(h > 0 && h === best, lit(lang)).otherwise(elseCol)
    }
    // NULL text must stay NULL (the qualityScore convention) — the when
    // chain's conditions all evaluate NULL-falsy there, which would
    // silently count the null document as a real 'und' one in every
    // language-distribution aggregate
    when(ms.isNull, lit(null).cast("string")).otherwise(decided)
  }

  /** [[langIdFrom]] over a raw text column (single-call-site convenience). */
  def langId(text: Column): Column = langIdFrom(markerStats(text))

  /** Composite quality score in [0,1] from a [[markerStats]] struct:
    * vocabulary diversity + length saturation + non-stopword density.
    * Single-division components in fixed order so the double result is
    * engine-portable. */
  def qualityScoreFrom(ms: Column): Column = {
    val n = ms.getField("n_tokens").cast("double")
    val uniq = ms.getField("n_distinct").cast("double") / n
    val lenScore = least(lit(1.0), n / lit(64.0))
    val stopHits = ms.getField("stop_hits").cast("double")
    lit(0.5) * uniq + lit(0.3) * lenScore + lit(0.2) * (lit(1.0) - stopHits / n)
  }

  /** [[qualityScoreFrom]] over a raw text column. */
  def qualityScore(text: Column): Column = qualityScoreFrom(markerStats(text))

  // Gopher/C4-style repetition gate defaults, tuned so every signal
  // participates on the fixture corpus (39/27/25 of 500 docs flagged by the
  // three conditions respectively at sf0.01). Shared with the oracle-SQL
  // builders so the thresholds can never drift between engines.
  val RepMaxFreqFrac: Double = 0.15
  val RepDup3gramFrac: Double = 0.02
  val RepMaxRun: Int = 2

  /** Repetition-filter verdict from an ALREADY-COMPUTED [[repetitionStats]]
    * struct: keep a document iff
    *   - its most frequent token owns ≤ `maxFreqFrac` of all tokens
    *     (Gopher's most-common-word test),
    *   - ≤ `dup3gramFrac` of its word 3-grams are repeats (C4's
    *     repeated-phrase test; vacuously true below 3 tokens),
    *   - no token repeats consecutively more than `maxRun` times
    *     (degenerate boilerplate like "= = = = =").
    * All comparisons are single divisions of exact integer counts, so the
    * verdict is bit-identical across engines. */
  def repetitionOk(rs: Column,
      maxFreqFrac: Double = RepMaxFreqFrac,
      dup3gramFrac: Double = RepDup3gramFrac,
      maxRun: Int = RepMaxRun): Column = {
    val n = rs.getField("n_tokens").cast("double")
    val n3 = rs.getField("n_3gram")
    (rs.getField("max_freq").cast("double") / n <= maxFreqFrac) &&
      (n3 === 0 ||
        rs.getField("dup_3gram").cast("double") / n3.cast("double") <= dup3gramFrac) &&
      rs.getField("max_run") <= maxRun
  }

  /** Fused one-pass Gopher-rule statistics: struct(n_words, sum_word_chars,
    * n_alpha_words, n_stop_distinct, n_hash, n_ellipsis, n_lines,
    * n_bullet_lines, n_ellipsis_lines) as ONE codegen call — the counting
    * tier of the published Gopher document filter (Rae et al. 2021,
    * Appendix A1.1). Requires [[register]]. */
  def gopherStats(text: Column): Column = call_function("graft_gopher_stats", text)

  // Gopher A1.1 rule thresholds (the paper's published values). The word
  // count lower bound is the only one adapted to the fixture corpus
  // (docs run 10–120 words, vs Gopher's 50–100k-word web pages): the
  // paper's 50 would also bind, but right at the fixture median — 30 keeps
  // every rule active without halving the corpus on length alone. Shared
  // with the oracle-SQL builders so thresholds can never drift.
  val GopherMinWords: Int = 30
  val GopherMaxWords: Int = 100000
  val GopherMinMeanLen: Double = 3.0
  val GopherMaxMeanLen: Double = 10.0
  val GopherMaxSymbolRatio: Double = 0.1
  val GopherMaxBulletFrac: Double = 0.9
  val GopherMaxEllipsisFrac: Double = 0.3
  val GopherMinAlphaFrac: Double = 0.8
  val GopherMinStopDistinct: Int = 2

  /** Gopher keep verdict from an ALREADY-COMPUTED [[gopherStats]] struct:
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    * bullet-line and ellipsis-line fractions, alphabetic-word fraction,
    * and required-word diversity — each a single division of exact integer
    * counts compared to a literal, so the verdict is bit-identical across
    * engines. */
  def gopherOk(gs: Column): Column = {
    val n = gs.getField("n_words").cast("double")
    val nl = gs.getField("n_lines").cast("double")
    val meanLen = gs.getField("sum_word_chars").cast("double") / n
    val symbolRatio =
      (gs.getField("n_hash") + gs.getField("n_ellipsis")).cast("double") / n
    gs.getField("n_words").between(GopherMinWords, GopherMaxWords) &&
      meanLen >= GopherMinMeanLen && meanLen <= GopherMaxMeanLen &&
      symbolRatio <= GopherMaxSymbolRatio &&
      gs.getField("n_bullet_lines").cast("double") / nl <= GopherMaxBulletFrac &&
      gs.getField("n_ellipsis_lines").cast("double") / nl <= GopherMaxEllipsisFrac &&
      gs.getField("n_alpha_words").cast("double") / n >= GopherMinAlphaFrac &&
      gs.getField("n_stop_distinct") >= GopherMinStopDistinct
  }
}
