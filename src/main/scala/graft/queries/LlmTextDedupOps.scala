package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{Clusters, Decontaminate, Dedup, Dsir, Multimodal, Pii, Pq, Similarity, Spans, Urls}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** LlmOps module: per-document text analysis (stats, language ID,
  * quality, Gopher rules), the dedup ladder (line/exact/n-gram/edit/
  * MinHash/SimHash + clusters), decontamination, DSIR importance
  * sampling, PII, HTML extraction and URL/host curation scans. */
trait LlmTextDedupOps { this: LlmOps.type =>

  private[queries] def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private[queries] def embeddings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // SQL fragments kept in lockstep with GraftFunctions definitions
  private[queries] val tsSql = "string_split(text, ' ')"
  private[queries] def hitsSql(markers: Seq[String]): String =
    s"len(list_filter($tsSql, t -> list_contains([${markers.map(m => s"'$m'").mkString(",")}], t)))"

  /** Per-document text statistics + quality score — every count reads from
    * the fused one-pass [[GraftFunctions.markerStats]] kernel (identical
    * integer values to the former array passes, so the oracle's double
    * arithmetic is unchanged). */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val ms = col("ms")
    val n = ms.getField("n_tokens").cast("double")
    docs(s, dir)
      .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"),
        GraftFunctions.markerStats(col("text")).as("ms"))
      .select(
        col("doc_id"),
        col("lang"),
        ms.getField("n_tokens").cast("long").as("n_tokens"),
        ms.getField("n_distinct").cast("long").as("n_distinct"),
        (ms.getField("n_distinct").cast("double") / n).as("uniq_ratio"),
        ((col("text_len") - (ms.getField("n_tokens") - 1)).cast("double") / n)
          .as("avg_token_len"),
        GraftFunctions.qualityScoreFrom(ms).as("quality"))
  }

  val textStatsSql: String = {
    s"""SELECT doc_id, lang,
       |  CAST(len($tsSql) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct($tsSql)) AS BIGINT) AS n_distinct,
       |  CAST(len(list_distinct($tsSql)) AS DOUBLE) / CAST(len($tsSql) AS DOUBLE) AS uniq_ratio,
       |  CAST(length(text) - (len($tsSql) - 1) AS DOUBLE) / CAST(len($tsSql) AS DOUBLE) AS avg_token_len,
       |  $qualityExprSql AS quality
       |FROM documents""".stripMargin
  }

  /** Language-ID heuristic vs the labeled lang column. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    docs(s, dir).select(
      col("doc_id"),
      col("lang"),
      GraftFunctions.langId(col("text")).as("lang_pred"))
      .withColumn("agree", (col("lang_pred") === col("lang")).cast("int"))
  }

  val langIdSql: String = {
    val hits = GraftFunctions.langMarkers
      .map { case (lang, ms) => lang -> s"h_$lang" }
    val hitDefs = GraftFunctions.langMarkers
      .map { case (lang, ms) => s"${hitsSql(ms)} AS h_$lang" }.mkString(",\n  ")
    val best = s"greatest(${hits.map(_._2).mkString(", ")})"
    val cases = hits.map { case (lang, h) =>
      s"WHEN $h > 0 AND $h = $best THEN '$lang'"
    }.mkString("\n    ")
    s"""SELECT doc_id, lang, lang_pred,
       |  CAST(lang_pred = lang AS INT) AS agree
       |FROM (
       |  SELECT doc_id, lang,
       |    CASE WHEN text IS NULL THEN NULL $cases
       |    ELSE 'und' END AS lang_pred
       |  FROM (SELECT doc_id, lang, text, $hitDefs FROM documents))""".stripMargin
  }

  /** Label set + bucket count of the n-gram language-ID gate. 4096
    * buckets keep trigram hash collisions rare (the fixture corpus has a
    * few thousand distinct trigrams) while the model stays a trivially
    * broadcast 4096×5 integer table. */
  private[queries] val LangIdLangs = Seq("de", "en", "es", "fr", "zh")
  private[queries] val LangIdDim = 4096

  /** Hashed char-trigram language identification
    * ([[graft.operators.LangId.classify]]) — the model-based upgrade of
    * the marker heuristic ([[langId]]): per-language trigram models
    * trained in-plan from the corpus labels, argmax classification. The
    * gate emits the CONFUSION MATRIX (true lang × predicted lang), so
    * misclassification structure is pinned, not just an accuracy rate.
    *
    * Fixture caveat, measured: the synthetic corpus draws every document
    * from ONE shared 31-word vocabulary regardless of label (zero
    * language-exclusive tokens at sf0.01), so label and text are
    * independent and the Bayes-optimal classifier is the majority class
    * (43.6% here) — which this model attains exactly, where the marker
    * heuristic scores 39.6% (below the prior). Real discrimination under
    * real signal is proven by LangIdSpec's planted-corpora case; the
    * relative bar (≥ markers) is pinned there too. */
  def langIdNgram(s: SparkSession, dir: String): DataFrame =
    graft.operators.LangId.classify(
      docs(s, dir), "doc_id", "text", "lang", LangIdLangs, LangIdDim)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))

  /** Mirrors [[langIdNgram]]: normalize + trigram window arithmetic (the
    * [[textNormalizeSql]] replicas), unsigned-FNV bucket mod, per-language
    * integer counts and totals, the collapsed-rational mean probability
    * (integer numerator / double denominator, one fixed op shape), argmax
    * with lexicographic tie-break via the same sorted when-chain. */
  lazy val langIdNgramSql: String = {
    val d = LangIdDim
    val ls = LangIdLangs.sorted
    val cnts = ls.map(l =>
      s"SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS c_$l").mkString(",\n    ")
    val tots = ls.map(l => s"SUM(c_$l) AS t_$l").mkString(", ")
    val sums = ls.map(l => s"SUM(COALESCE(c_$l, 0)) AS s_$l").mkString(",\n    ")
    val scores = ls.map(l =>
      s"CAST(n_g + s_$l AS DOUBLE) / (CAST(n_g AS DOUBLE) * CAST(t_$l + $d AS DOUBLE)) AS score_$l")
      .mkString(",\n    ")
    val mx = s"greatest(${ls.map(l => s"score_$l").mkString(", ")})"
    val pred = ls.map(l => s"WHEN score_$l = $mx THEN '$l'").mkString("\n    ")
    s"""WITH n AS (
       |  SELECT doc_id, lang,
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, lang,
       |    CAST(${fnvHugeSql("g")} % $d AS BIGINT) AS b
       |  FROM (
       |    SELECT doc_id, lang,
       |      unnest(CASE WHEN length(norm) <= 3 THEN [norm]
       |        ELSE list_transform(range(1, length(norm) - 1), i -> substr(norm, i, 3))
       |      END) AS g
       |    FROM n)),
       |model AS (
       |  SELECT b,
       |    $cnts
       |  FROM f GROUP BY b),
       |totals AS (SELECT $tots FROM model),
       |perdoc AS (
       |  SELECT doc_id, lang, COUNT(*) AS n_g,
       |    $sums
       |  FROM f LEFT JOIN model USING (b) GROUP BY doc_id, lang),
       |scored AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM perdoc CROSS JOIN totals),
       |pred AS (
       |  SELECT doc_id, lang,
       |    CASE $pred END AS pred_lang
       |  FROM scored)
       |SELECT lang, pred_lang, COUNT(*) AS n_docs
       |FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
  }

  /** Per-column data profile ([[graft.operators.Profile.profile]]) over
    * the documents table — the source-onboarding report: one aggregation
    * pass, exact distincts, native-type min/max stringified last. The
    * gate columns are bigint/varchar so the string casts agree between
    * engines byte-for-byte. */
  def profileDocs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(
      docs(s, dir), Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy(col("column"))

  val profileDocsSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_value,
         |  CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM documents""".stripMargin
    Seq("doc_id", "lang", "source", "n_chars").map(one)
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** Gopher/C4-style repetition quality gate over the fused
    * [[GraftFunctions.repetitionStats]] kernel: per-document exact counts
    * (max token frequency, duplicate word-3-grams, longest identical-token
    * run), the derived fractions, and the keep verdict
    * ([[GraftFunctions.repetitionOk]]). The kernel is aliased ONCE in a
    * narrow projection and every output column derives from the struct, so
    * the one-pass kernel runs exactly once per row. */
  def qualityRepetition(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val withRs = docs(s, dir).select(
      col("doc_id"),
      GraftFunctions.repetitionStats(col("text")).as("rs"))
    val rs = col("rs")
    val n = rs.getField("n_tokens").cast("double")
    val n3 = rs.getField("n_3gram")
    withRs.select(
      col("doc_id"),
      rs.getField("n_tokens").cast("long").as("n_tokens"),
      rs.getField("max_freq").cast("long").as("max_freq"),
      rs.getField("n_3gram").cast("long").as("n_3gram"),
      rs.getField("dup_3gram").cast("long").as("dup_3gram"),
      rs.getField("max_run").cast("long").as("max_run"),
      (rs.getField("max_freq").cast("double") / n).as("max_freq_frac"),
      when(n3 === 0, lit(0.0))
        .otherwise(rs.getField("dup_3gram").cast("double") / n3.cast("double"))
        .as("dup_3gram_frac"),
      GraftFunctions.repetitionOk(rs).cast("int").as("keep"))
  }

  // DuckDB list-op twins of the TextQuality counts (the kernel was designed
  // so every count replicates with list operations verbatim):
  //   max_freq — histogram max over the distinct tokens;
  //   3-grams  — materialized positionally, dup = total − distinct;
  //   max_run  — gaps between consecutive run-start positions (a start is
  //              i=1 or ts[i] ≠ ts[i-1]), closed with sentinel n+1.
  private[queries] val repStatsSql: String =
    s"""SELECT doc_id,
       |    len(ts) AS n,
       |    list_max(list_transform(list_distinct(ts), d -> len(list_filter(ts, x -> x = d)))) AS max_freq,
       |    len(g3) AS n3,
       |    len(g3) - len(list_distinct(g3)) AS dup3,
       |    list_max(list_transform(range(1, len(runs)), j -> runs[j+1] - runs[j])) AS max_run
       |  FROM (
       |    SELECT doc_id, ts,
       |      CASE WHEN len(ts) >= 3
       |        THEN list_transform(range(1, len(ts)-1), i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
       |        ELSE []::VARCHAR[] END AS g3,
       |      list_append(list_filter(range(1, len(ts)+1), i -> i = 1 OR ts[i] <> ts[i-1]), len(ts)+1) AS runs
       |    FROM (SELECT doc_id, $tsSql AS ts FROM documents))""".stripMargin

  /** The keep verdict on [[repStatsSql]] columns — same divisions, same
    * thresholds ([[GraftFunctions.RepMaxFreqFrac]] etc.) as
    * [[GraftFunctions.repetitionOk]]. */
  private[queries] val repKeepSql: String =
    s"""(CAST(max_freq AS DOUBLE) / CAST(n AS DOUBLE) <= ${GraftFunctions.RepMaxFreqFrac}
       |    AND (n3 = 0 OR CAST(dup3 AS DOUBLE) / CAST(n3 AS DOUBLE) <= ${GraftFunctions.RepDup3gramFrac})
       |    AND max_run <= ${GraftFunctions.RepMaxRun})""".stripMargin

  val qualityRepetitionSql: String =
    s"""WITH s AS (
       |  $repStatsSql)
       |SELECT doc_id,
       |  CAST(n AS BIGINT) AS n_tokens,
       |  CAST(max_freq AS BIGINT) AS max_freq,
       |  CAST(n3 AS BIGINT) AS n_3gram,
       |  CAST(dup3 AS BIGINT) AS dup_3gram,
       |  CAST(max_run AS BIGINT) AS max_run,
       |  CAST(max_freq AS DOUBLE) / CAST(n AS DOUBLE) AS max_freq_frac,
       |  CASE WHEN n3 = 0 THEN 0.0 ELSE CAST(dup3 AS DOUBLE) / CAST(n3 AS DOUBLE) END AS dup_3gram_frac,
       |  CAST($repKeepSql AS INT) AS keep
       |FROM s""".stripMargin

  /** The full Gopher rule set (Rae et al. 2021, Appendix A1.1) over
    * deterministically "webified" documents. The fixture text is clean
    * single-line word salad, so rules 3–6 (symbols, bullets, ellipses,
    * lines) would be vacuous on it; each doc is first wrapped with
    * doc_id-arithmetic page furniture — bullet blocks, `#` headings,
    * `read more...` tails — identically in [[qualityGopherSql]] (the
    * piiScan / htmlExtract convention), so every rule binds and every
    * count, fraction, and the keep verdict is oracle-exact. All counts
    * come from ONE [[GraftFunctions.gopherStats]] codegen call aliased
    * once; the fractions are single integer divisions (bit-identical
    * cross-engine). */
  /** The "webified" page of the Gopher gates (doc_id-arithmetic furniture,
    * single-sourced with [[gopherPageSql]]; `private[graft]` so the
    * streaming line-filter gate scores the identical pages). */
  private[graft] def gopherPage: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      when(pmod(id, lit(17)) === 0, repeat(lit("• filler item\n"), 19))
        .otherwise(lit("")),
      when(pmod(id, lit(7)) === 0,
        concat(lit("• item "), pmod(id, lit(10)).cast("string"), lit("\n")))
        .otherwise(lit("")),
      when(pmod(id, lit(11)) === 0,
        concat(repeat(lit("#"), 15), lit(" section\n"))).otherwise(lit("")),
      col("text"),
      when(pmod(id, lit(5)) === 0, lit("\nread more...")).otherwise(lit("")),
      when(pmod(id, lit(23)) === 0, lit("\nto be continued...")).otherwise(lit("")))
  }

  def qualityGopher(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val gs = col("gs")
    val n = gs.getField("n_words").cast("double")
    val nl = gs.getField("n_lines").cast("double")
    docs(s, dir)
      .select(col("doc_id"), GraftFunctions.gopherStats(gopherPage).as("gs"))
      .select(
        col("doc_id"),
        gs.getField("n_words").cast("long").as("n_words"),
        gs.getField("n_lines").cast("long").as("n_lines"),
        gs.getField("n_hash").cast("long").as("n_hash"),
        gs.getField("n_ellipsis").cast("long").as("n_ellipsis"),
        gs.getField("n_stop_distinct").cast("long").as("n_stop_distinct"),
        (gs.getField("sum_word_chars").cast("double") / n).as("mean_word_len"),
        ((gs.getField("n_hash") + gs.getField("n_ellipsis")).cast("double") / n)
          .as("symbol_ratio"),
        (gs.getField("n_bullet_lines").cast("double") / nl).as("bullet_frac"),
        (gs.getField("n_ellipsis_lines").cast("double") / nl).as("ellipsis_frac"),
        (gs.getField("n_alpha_words").cast("double") / n).as("alpha_frac"),
        GraftFunctions.gopherOk(gs).cast("int").as("keep"))
  }

  /** Mirrors [[qualityGopher]]: identical page furniture arithmetic, then
    * each kernel count as a plain string/list operation (split-on-single-
    * separator words, replace-delta symbol counts, LIKE prefix/suffix line
    * tests, the required-word lexicon as literals), the same divisions,
    * the same thresholds. */
  /** Mirrors [[gopherPage]] as a DuckDB expression over `documents`. */
  private[queries] val gopherPageSql: String =
    """CASE WHEN doc_id % 17 = 0 THEN repeat('• filler item' || chr(10), 19) ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0 THEN '• item ' || CAST(doc_id % 10 AS VARCHAR) || chr(10) ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0 THEN repeat('#', 15) || ' section' || chr(10) ELSE '' END ||
      |    text ||
      |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'read more...' ELSE '' END ||
      |    CASE WHEN doc_id % 23 = 0 THEN chr(10) || 'to be continued...' ELSE '' END""".stripMargin

  /** Shared CTE chain `gop_p → gop_w → gop_c` replicating every
    * [[graft.functions.TextGopher.stats]] count over [[gopherPageSql]] —
    * used by [[qualityGopherSql]] and the host report. */
  private[queries] lazy val gopherCountCtes: String = {
    val stops = graft.functions.TextGopher.requiredWords
      .map(w => s"'$w'").mkString(", ")
    s"""gop_p AS (
       |  SELECT doc_id,
       |    $gopherPageSql AS page
       |  FROM documents),
       |gop_w AS (
       |  SELECT doc_id, page,
       |    string_split(replace(page, chr(10), ' '), ' ') AS ws,
       |    string_split(page, chr(10)) AS lines
       |  FROM gop_p),
       |gop_c AS (
       |  SELECT doc_id,
       |    len(ws) AS n_words,
       |    length(page) - (len(ws) - 1) AS sum_chars,
       |    len(list_filter(ws, t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha,
       |    len(list_filter([$stops], m -> list_contains(ws, m))) AS n_stop,
       |    length(page) - length(replace(page, '#', '')) AS n_hash,
       |    (length(page) - length(replace(page, '...', ''))) // 3 AS n_ellipsis,
       |    len(lines) AS n_lines,
       |    len(list_filter(lines, l -> l LIKE '•%' OR l LIKE '-%')) AS n_bullet,
       |    len(list_filter(lines, l -> l LIKE '%...')) AS n_ell_lines
       |  FROM gop_w)""".stripMargin
  }

  /** The Gopher keep verdict over `gop_c` columns — same divisions, same
    * thresholds as [[GraftFunctions.gopherOk]]. */
  private[queries] lazy val gopherKeepSql: String = {
    import GraftFunctions._
    s"""(n_words BETWEEN $GopherMinWords AND $GopherMaxWords
       |    AND CAST(sum_chars AS DOUBLE) / CAST(n_words AS DOUBLE) >= $GopherMinMeanLen
       |    AND CAST(sum_chars AS DOUBLE) / CAST(n_words AS DOUBLE) <= $GopherMaxMeanLen
       |    AND CAST(n_hash + n_ellipsis AS DOUBLE) / CAST(n_words AS DOUBLE) <= $GopherMaxSymbolRatio
       |    AND CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) <= $GopherMaxBulletFrac
       |    AND CAST(n_ell_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) <= $GopherMaxEllipsisFrac
       |    AND CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) >= $GopherMinAlphaFrac
       |    AND n_stop >= $GopherMinStopDistinct)""".stripMargin
  }

  lazy val qualityGopherSql: String = {
    s"""WITH $gopherCountCtes
       |SELECT doc_id,
       |  CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_lines AS BIGINT) AS n_lines,
       |  CAST(n_hash AS BIGINT) AS n_hash,
       |  CAST(n_ellipsis AS BIGINT) AS n_ellipsis,
       |  CAST(n_stop AS BIGINT) AS n_stop_distinct,
       |  CAST(sum_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
       |  CAST(n_hash + n_ellipsis AS DOUBLE) / CAST(n_words AS DOUBLE) AS symbol_ratio,
       |  CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) AS bullet_frac,
       |  CAST(n_ell_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) AS ellipsis_frac,
       |  CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) AS alpha_frac,
       |  CAST($gopherKeepSql AS INT) AS keep
       |FROM gop_c""".stripMargin
  }

  /** Boilerplate threshold of the line-dedup gate: a line in ≥ 3 distinct
    * docs is template furniture. */
  val LineDedupMinDocs = 3

  /** CCNet-style line-level dedup ([[graft.operators.Lines.dedupLines]])
    * over the SAME webified pages as the Gopher gate: the planted bullet
    * filler and "read more..." tails recur across docs and are dropped as
    * boilerplate; each doc's unique text line survives. The surviving
    * text is pinned by length + FNV, so the gate proves the drop touched
    * exactly the recurring lines. */
  def lineDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Lines.dedupLines(
      docs(s, dir), "doc_id", gopherPage, minDocs = LineDedupMinDocs)

  /** Mirrors the line-dedup pipeline with a parameterized corpus split:
    * the boilerplate set comes from `boilerPred` docs, the report covers
    * `outPred` docs — `TRUE/TRUE` is the batch gate, the standing/incoming
    * split is the streaming gate's oracle. */
  private[queries] def lineDedupSqlOver(boilerPred: String, outPred: String): String =
    s"""WITH lp AS (
       |  SELECT doc_id, u.p AS pos, u.l AS line FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(ls) + 1), i -> {p: i - 1, l: ls[i]})) AS u
       |    FROM (SELECT doc_id, string_split($gopherPageSql, chr(10)) AS ls FROM documents))),
       |b AS (
       |  SELECT line FROM (
       |    SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lp WHERE $boilerPred GROUP BY line)
       |  WHERE nd >= $LineDedupMinDocs AND line <> ''),
       |k AS (
       |  SELECT lp.doc_id, lp.pos, lp.line, b.line IS NOT NULL AS isb
       |  FROM lp LEFT JOIN b ON b.line = lp.line WHERE $outPred),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_lines,
       |    CAST(SUM(CASE WHEN isb THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |    -- COALESCE: a doc whose every line is boilerplate keeps '' (as
       |    -- Spark's null-skipping collect_list does), not NULL
       |    COALESCE(array_to_string(list(line ORDER BY pos) FILTER (WHERE NOT isb), chr(10)), '') AS kept_text
       |  FROM k GROUP BY doc_id),
       |h AS (SELECT doc_id, n_lines, n_dropped, kept_text, ${fnvHugeSql("kept_text")} AS hu FROM agg)
       |SELECT doc_id, n_lines, n_dropped,
       |  CAST(length(kept_text) AS BIGINT) AS kept_len,
       |  ${hugeToSignedSql("hu")} AS kept_fp
       |FROM h""".stripMargin

  /** Mirrors [[lineDedup]] (whole-corpus boilerplate, whole-corpus
    * report). */
  lazy val lineDedupSql: String = lineDedupSqlOver("TRUE", "TRUE")

  /** The streaming line-filter gate's oracle: boilerplate from the
    * STANDING slice (doc_id % 4 ≠ 0), report over the INCOMING slice —
    * per-doc decisions against the static set ⇒ stream ≡ batch. */
  lazy val streamLineFilterSql: String =
    lineDedupSqlOver("doc_id % 4 <> 0", "lp.doc_id % 4 = 0")

  /** Exact canonical-key dedup: group by sorted distinct token set, keep the
    * smallest doc_id (deterministic survivor). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactCanonical(docs(s, dir), col("doc_id"), col("text"))

  val dedupExactSql: String =
    """SELECT array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS dedup_key,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact token-set Jaccard near-dup pairs, blocked by language. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", "lang", threshold = 0.95)

  val ngramJaccardSql: String =
    """WITH k AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
      |           FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / (CAST(len(a.toks) + len(b.toks) AS DOUBLE) - CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)) AS jaccard
      |FROM k a JOIN k b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / (CAST(len(a.toks) + len(b.toks) AS DOUBLE) - CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)) >= 0.95""".stripMargin

  /** Edit-distance near-dup pairs over a 16-char title slice, distance
    * band [1, 2] (distance 0 is the exact tier's job). The Spark side runs
    * PassJoin segment blocking + exact verify
    * ([[Dedup.editDistancePairs]]); the ORACLE brute-forces all pairs —
    * so a hash match proves the blocking lost NO pair, the strongest
    * recall check a candidate-generation scheme can get. */
  def editDistance(s: SparkSession, dir: String): DataFrame =
    Dedup.editDistancePairs(
      docs(s, dir).withColumn("title", substring(col("text"), 1, 16)),
      "doc_id", "title", maxDist = 2)
      .filter(col("dist") >= 1)

  /** Brute-force twin of [[editDistance]]: every pair, exact levenshtein
    * (identical unit-cost DP definition in both engines), same [1, 2]
    * distance band. */
  val editDistanceSql: String =
    """WITH t AS (SELECT doc_id, substr(text, 1, 16) AS title FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
      |FROM t a JOIN t b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.title, b.title) BETWEEN 1 AND 2""".stripMargin

  /** Edit-distance pair list → connected components → per-cluster keeper
    * (min doc_id): the [[dedupClusters]] composition over the PassJoin
    * tier, distance ≤ 2 INCLUDING exact ties — typo-variant titles
    * collapse to one canonical doc. Star-contraction resolution
    * ([[Clusters.resolve]]) vs the oracle's recursive min-label closure
    * over a brute-forced pair list. */
  def editClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.editDistancePairs(
      docs(s, dir).withColumn("title", substring(col("text"), 1, 16)),
      "doc_id", "title", maxDist = 2)
    val labels = graft.operators.Clusters.resolve(pairs, "id_a", "id_b")
    val sizes = labels.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "rep")
      .select(col("id").as("doc_id"), col("rep").as("cluster"),
        col("cluster_size"),
        (col("id") === col("rep")).cast("int").as("keep"))
  }

  /** Brute-force pairs + recursive min-label closure, the
    * [[dedupClustersSql]] shape over levenshtein ≤ 2. */
  val editClustersSql: String =
    """WITH RECURSIVE t AS (SELECT doc_id, substr(text, 1, 16) AS title FROM documents),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE levenshtein(a.title, b.title) <= 2),
      |edges AS (
      |  SELECT id_a AS u, id_b AS v FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |nodes AS (SELECT DISTINCT u AS id FROM edges),
      |reach(id, lab) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.id WHERE r.lab < e.v),
      |lab AS (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id),
      |sz AS (SELECT cluster, COUNT(*) AS cluster_size FROM lab GROUP BY cluster)
      |SELECT lab.id AS doc_id, lab.cluster AS cluster,
      |  CAST(sz.cluster_size AS BIGINT) AS cluster_size,
      |  CAST(lab.id = lab.cluster AS INT) AS keep
      |FROM lab JOIN sz USING (cluster)""".stripMargin

  /** MinHash+LSH near-dup pairs. Oracle-checked: [[dedupMinhashSql]]
    * replicates the full signature/banding pipeline in DuckDB — its
    * hard-coded 48/16/0.8/seed-42/cap-1000 literals must track the
    * parameters here. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
      shingleK = 3, numHashes = 48, bands = 16, threshold = 0.8)

  /** SimHash near-dup pairs. Oracle-checked: [[dedupSimhashSql]] replicates
    * the bit-voting/chunk-banding pipeline in DuckDB (maxHamming 3,
    * cap 1000 mirrored there). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
  }

  /** Near-dup CLUSTER resolution: the [[dedupMinhash]] pair list collapsed
    * to transitive connected components ([[Clusters.resolve]], alternating
    * star contraction), one row per clustered document with its component
    * representative (min doc_id), the component size, and the keep verdict
    * (representatives survive, other members drop). */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
      shingleK = 3, numHashes = 48, bands = 16, threshold = 0.8)
    val labels = Clusters.resolve(pairs, "id_a", "id_b")
    val sizes = labels.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "rep")
      .select(col("id").as("doc_id"), col("rep").as("cluster"),
        col("cluster_size"),
        (col("id") === col("rep")).cast("int").as("keep"))
  }

  /** [[dedupClusters]] under `spark.graft.checkpoint.mode=reliable` — the
    * PRICED deployment lane: same pairs, same star contraction, same
    * oracle, but every iteration round writes a DFS checkpoint (local FS
    * here) instead of truncating lineage in memory. The bench delta vs
    * `d_dedup_clusters` is the measured per-run cost of surviving
    * executor loss — the number a preemptible-node operator budgets per
    * round (see SCALE.md's runbook §1). Runs in an isolated child
    * session so the mode never leaks into sibling gates; the result is
    * detached from the checkpoint files via an explicit localCheckpoint
    * so the scratch dir can be swept before returning (leak-free under
    * bench loops). */
  def dedupClustersReliable(s: SparkSession, dir: String): DataFrame = {
    val hs = s.newSession()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_reliable_price")
    try {
      hs.conf.set(graft.core.Checkpoint.ModeKey, "reliable")
      hs.conf.set(graft.core.Checkpoint.DirKey, ckpt.toString)
      // detach from the reliable checkpoint FILES before they are swept;
      // deliberately localCheckpoint, not graftCheckpoint — this hand-off
      // must not itself write (and then lose) a reliable checkpoint
      dedupClusters(hs, dir).localCheckpoint(true)
    } finally graft.plans.CorpusExport.deleteRecursively(ckpt.toFile)
  }

  /** Transitive closure of [[dedupMinhashSql]]'s pair list via recursive
    * min-label propagation (`lab < v` prunes propagation that cannot lower
    * a node's minimum; the UNION dedup guarantees termination). Lazy:
    * [[dedupMinhashSql]] is declared later in this object. */
  /** The `WITH RECURSIVE … lab` prefix shared by [[dedupClustersSql]] and
    * [[dedupClustersKeepBestSql]]: pair list → symmetric edges → min-label
    * closure. */
  private[queries] lazy val clusterLabCtes: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT id_a, id_b FROM (
       |$dedupMinhashSql
       |  )),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT u AS id FROM edges),
       |reach(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.id WHERE r.lab < e.v),
       |lab AS (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id)""".stripMargin

  lazy val dedupClustersSql: String =
    s"""$clusterLabCtes,
       |sz AS (SELECT cluster, COUNT(*) AS cluster_size FROM lab GROUP BY cluster)
       |SELECT lab.id AS doc_id, lab.cluster AS cluster,
       |  CAST(sz.cluster_size AS BIGINT) AS cluster_size,
       |  CAST(lab.id = lab.cluster AS INT) AS keep
       |FROM lab JOIN sz USING (cluster)""".stripMargin

  /** Quality-aware cluster resolution
    * ([[graft.operators.Clusters.resolveKeepBest]]): the [[dedupClusters]]
    * components, but each cluster keeps its highest-quality member (ties:
    * min doc_id) instead of the min-id representative — the keep rule a
    * curation pipeline wants. Quality is the [[textStats]] kernel, so the
    * oracle reuses [[clusterLabCtes]] ∘ the quality expression and the
    * hash check is exact (quality doubles are bit-identical cross-engine,
    * the d_text_stats precedent). */
  def dedupClustersKeepBest(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val d = docs(s, dir)
    val pairs = Dedup.minhashPairs(d, "doc_id", "text",
      shingleK = 3, numHashes = 48, bands = 16, threshold = 0.8)
    val scores = d.select(col("doc_id"),
      GraftFunctions.qualityScore(col("text")).as("q"))
    Clusters.resolveKeepBest(pairs, "id_a", "id_b", scores, "doc_id", "q")
      .select(col("id").as("doc_id"), col("cluster"),
        col("score").as("quality"), col("keep"))
  }

  lazy val dedupClustersKeepBestSql: String =
    s"""$clusterLabCtes,
       |q AS (SELECT doc_id, $qualityExprSql AS quality FROM documents)
       |SELECT lab.id AS doc_id, lab.cluster AS cluster, q.quality AS quality,
       |  CAST(row_number() OVER (
       |    PARTITION BY lab.cluster ORDER BY q.quality DESC, lab.id ASC) = 1
       |    AS INT) AS keep
       |FROM lab JOIN q ON q.doc_id = lab.id""".stripMargin

  /** Decontamination protocol shared by [[decontaminate]] and
    * [[curationPipeline]] (and their oracle builders): the doc_id
    * %[[DecontEvalMod]]==0 slice plays the held-out eval suite; overlap
    * unit is the word-[[DecontGramK]]-gram. */
  val DecontEvalMod = 19
  val DecontGramK = 5

  private[queries] def decontOverlap(d: DataFrame): DataFrame =
    Decontaminate.overlapNgrams(
      d.filter(pmod(col("doc_id"), lit(DecontEvalMod)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(DecontEvalMod)) === 0),
      "doc_id", "text", n = DecontGramK)

  /** Benchmark decontamination: each training doc reports how many distinct
    * word-5-gram fingerprints it shares with the eval slice and the
    * contaminated verdict ([[Decontaminate.overlapNgrams]] — broadcast
    * eval-fingerprint set, no corpus-side shuffle before the per-doc agg). */
  def decontaminate(s: SparkSession, dir: String): DataFrame =
    decontOverlap(docs(s, dir))

  /** Word k-shingles of a single-space-tokenized text as DuckDB SQL,
    * mirroring [[GraftFunctions.wordShingles]] incl. the <k degenerate
    * case (whole text as one gram). */
  private[queries] def shingleSqlK(k: Int): String = {
    val ts = "string_split(text,' ')"
    val parts = (0 until k).map(j => s"$ts[i+$j]").mkString(", ' ', ")
    s"""CASE WHEN len($ts) < $k THEN [text]
       |     ELSE list_transform(range(1, len($ts) - ${k - 2}), i -> concat($parts))
       |END""".stripMargin
  }

  /** Mirrors [[decontaminate]]: same 5-gram unit, same FNV-1a fingerprints
    * (signed-BIGINT join keys), COUNT(DISTINCT) over the hit fingerprints. */
  val decontaminateSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, unnest(list_distinct(${shingleSqlK(DecontGramK)})) AS g FROM documents),
       |hh AS (SELECT doc_id, ${fnvHugeSql("g")} AS hu FROM g),
       |h AS (SELECT doc_id, ${hugeToSignedSql("hu")} AS h FROM hh),
       |e AS (SELECT DISTINCT h FROM h WHERE doc_id % $DecontEvalMod = 0),
       |t AS (SELECT doc_id, h FROM h WHERE doc_id % $DecontEvalMod <> 0),
       |j AS (
       |  SELECT t.doc_id,
       |    COUNT(DISTINCT CASE WHEN e.h IS NOT NULL THEN t.h END) AS n_overlap
       |  FROM t LEFT JOIN e USING (h) GROUP BY t.doc_id)
       |SELECT doc_id, n_overlap, CAST(n_overlap > 0 AS INT) AS contaminated
       |FROM j""".stripMargin

  /** Contamination span localization ([[Decontaminate.contaminationSpans]]):
    * the surgical tier of the same eval protocol — for every train doc the
    * maximal token extents overlapping the eval slice's word-5-grams, so
    * leaked passages can be excised instead of dropping whole documents.
    * Broadcast eval fingerprints, positioned window fingerprints on the
    * train side, per-doc interval union over the matched minority. */
  def decontaminateSpans(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Decontaminate.contaminationSpans(
      d.filter(pmod(col("doc_id"), lit(DecontEvalMod)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(DecontEvalMod)) === 0),
      "doc_id", "text", n = DecontGramK)
  }

  /** Closed-form twin of [[decontaminateSpans]]: positioned 5-gram
    * fingerprints (degenerate whole-text gram below 5 tokens, end clamped
    * to the doc's last token), eval set from the %[[DecontEvalMod]] slice,
    * gaps-and-islands interval union — the [[repeatedSpansSql]] machinery
    * pointed at the eval-overlap set. */
  lazy val decontaminateSpansSql: String = {
    val k = DecontGramK
    val parts = (1 to k).map(j => s"ts[i+${j - 1}]").mkString(", ' ', ")
    val pme = "max(e) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    s"""WITH d AS (
       |  SELECT doc_id, text, string_split(text,' ') AS ts FROM documents),
       |s AS (
       |  SELECT doc_id, len(ts) - 1 AS last_tok,
       |    unnest(CASE WHEN len(ts) < $k THEN [{p: 0, g: text}]
       |           ELSE list_transform(range(1, len(ts) - ${k - 2}),
       |             i -> {p: i - 1, g: concat($parts)}) END) AS u
       |  FROM d),
       |g AS (SELECT doc_id, last_tok, u.p AS p, u.g AS g FROM s),
       |hh AS (SELECT doc_id, last_tok, p, ${fnvHugeSql("g")} AS hu FROM g),
       |ps AS (SELECT doc_id, last_tok, p, ${hugeToSignedSql("hu")} AS h FROM hh),
       |e AS (SELECT DISTINCT h FROM ps WHERE doc_id % $DecontEvalMod = 0),
       |rep AS (
       |  SELECT ps.doc_id, ps.p, least(ps.p + ${k - 1}, ps.last_tok) AS e
       |  FROM ps JOIN e USING (h) WHERE ps.doc_id % $DecontEvalMod <> 0),
       |isl AS (
       |  SELECT doc_id, p, e,
       |    CASE WHEN $pme IS NULL OR p > $pme + 1 THEN 1 ELSE 0 END AS new_ext
       |  FROM rep),
       |ext AS (
       |  SELECT doc_id, p, e,
       |    SUM(new_ext) OVER (PARTITION BY doc_id ORDER BY p) AS ext
       |  FROM isl)
       |SELECT doc_id,
       |  CAST(MIN(p) AS BIGINT) AS span_start,
       |  CAST(MAX(e) AS BIGINT) AS span_end,
       |  CAST(MAX(e) - MIN(p) + 1 AS BIGINT) AS span_tokens
       |FROM ext GROUP BY doc_id, ext""".stripMargin
  }

  /** Surgical decontamination ([[Decontaminate.stripContamination]]): the
    * cut composed with the find — every train doc with its eval-overlap
    * extents excised, cleaned text pinned by length + fingerprint. */
  def decontaminateStrip(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Decontaminate.stripContamination(
      d.filter(pmod(col("doc_id"), lit(DecontEvalMod)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(DecontEvalMod)) === 0),
      "doc_id", "text", n = DecontGramK)
  }

  /** Mirrors [[decontaminateStrip]]: [[decontaminateSpansSql]]'s extents
    * fed through the [[stripSpansSql]] removal replay, over the train
    * slice only. */
  lazy val decontaminateStripSql: String =
    s"""WITH spans AS ($decontaminateSpansSql),
       |ag AS (
       |  SELECT doc_id,
       |    list_sort(list({s: span_start, e: span_end})) AS exts,
       |    SUM(span_tokens) AS n_removed
       |  FROM spans GROUP BY doc_id),
       |base AS (SELECT doc_id, $tsSql AS ts FROM documents
       |         WHERE doc_id % $DecontEvalMod <> 0),
       |cleaned AS (
       |  SELECT b.doc_id,
       |    CAST(len(b.ts) AS BIGINT) AS n_tokens,
       |    CAST(COALESCE(a.n_removed, 0) AS BIGINT) AS n_removed,
       |    array_to_string(
       |      list_transform(
       |        list_filter(range(1, len(b.ts) + 1),
       |          i -> len(list_filter(COALESCE(a.exts, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
       |                 x -> (i - 1) >= x.s AND (i - 1) <= x.e)) = 0),
       |        i -> b.ts[i]), ' ') AS clean0
       |  FROM base b LEFT JOIN ag a USING (doc_id)),
       |coalesced AS (
       |  SELECT doc_id, n_tokens, n_removed, COALESCE(clean0, '') AS clean
       |  FROM cleaned),
       |h AS (SELECT doc_id, n_tokens, n_removed, clean, ${fnvHugeSql("clean")} AS hc FROM coalesced)
       |SELECT doc_id, n_tokens, n_removed,
       |  CAST(length(clean) AS BIGINT) AS clean_len,
       |  ${hugeToSignedSql("hc")} AS clean_fp
       |FROM h""".stripMargin

  /** Jaccard threshold of the FUZZY decontamination gate — intentionally far
    * below dedup's 0.8: half-shared shingle mass with a benchmark item is
    * leakage. */
  val DecontFuzzyThreshold = 0.5

  /** Fuzzy benchmark decontamination ([[Decontaminate.fuzzyOverlap]]): the
    * same eval protocol as [[decontaminate]] (doc_id %[[DecontEvalMod]]
    * slice), but flagging train docs that NEAR-duplicate an eval doc —
    * MinHash-banded candidates (the [[dedupMinhash]] signature math),
    * exact-Jaccard verified at [[DecontFuzzyThreshold]], with the
    * best-matching eval doc as evidence. */
  def decontaminateFuzzy(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Decontaminate.fuzzyOverlap(
      d.filter(pmod(col("doc_id"), lit(DecontEvalMod)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(DecontEvalMod)) === 0),
      "doc_id", "text",
      shingleK = 3, numHashes = 48, bands = 16,
      threshold = DecontFuzzyThreshold)
  }

  /** Mirrors [[decontaminateFuzzy]]: the SHARED signature/banding CTEs
    * ([[minhashBandedCtes]] — same coefficients, same band slices as the
    * minhash dedup oracle) split into eval/train by the
    * %[[DecontEvalMod]] rule, distinct band collisions as candidates,
    * the exact-Jaccard verify, and the struct_pack MAX best-match rule. */
  lazy val decontaminateFuzzySql: String = {
    val jac = "CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE) / " +
      "(CAST(len(ta.sh) + len(tb.sh) AS DOUBLE) - CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE))"
    s"""WITH $minhashBandedCtes,
       |e AS (SELECT doc_id AS eval_id, band, bucket FROM banded WHERE doc_id % $DecontEvalMod = 0),
       |t AS (SELECT doc_id, band, bucket FROM banded WHERE doc_id % $DecontEvalMod <> 0),
       |cand AS (SELECT DISTINCT t.doc_id, e.eval_id FROM t JOIN e USING (band, bucket)),
       |toks AS (SELECT doc_id, list_distinct($shingleSql) AS sh FROM documents),
       |ver AS (
       |  SELECT c.doc_id, c.eval_id, $jac AS jaccard
       |  FROM cand c JOIN toks ta ON ta.doc_id = c.doc_id JOIN toks tb ON tb.doc_id = c.eval_id
       |  WHERE $jac >= $DecontFuzzyThreshold),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_matches,
       |    MAX(struct_pack(j := jaccard, ne := -eval_id)) AS best
       |  FROM ver GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(agg.n_matches, 0) AS n_matches,
       |  -(agg.best).ne AS best_eval_id,
       |  (agg.best).j AS best_jaccard,
       |  CAST(agg.doc_id IS NOT NULL AS INT) AS contaminated
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $DecontEvalMod <> 0) d
       |LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** Feature-hash dimension of the DSIR gate (power of two for the
    * unsigned-mod bucket identity). */
  val DsirDim = 64

  /** DSIR-style importance scoring ([[Dsir.importanceScores]]): hashed
    * word-bigram models fit on the `lang = 'en'` slice (target) and the
    * whole corpus (raw), every document scored by its mean target/raw
    * likelihood ratio, threshold-selected at ratio ≥ 1 — the data-selection
    * tier that upsamples target-looking documents. */
  def importanceSample(s: SparkSession, dir: String): DataFrame =
    Dsir.importanceScores(docs(s, dir), "doc_id", "text",
      isTarget = col("lang") === "en", dim = DsirDim)

  /** Mirrors [[importanceSample]]: same positioned hashed-bigram stream
    * (FNV % dim buckets), same add-one smoothed count models with totals
    * summed from the count tables, same three-division contribution tree,
    * same position-ordered sequential fold (`list_sum(list(p ORDER BY
    * pos))` ≡ the JVM left fold — the [[lmScoreSql]] posture). */
  lazy val importanceSampleSql: String = {
    val d = DsirDim
    s"""WITH g0 AS (SELECT doc_id, lang, ${shingleSqlK(2)} AS gs FROM documents),
       |gp AS (
       |  SELECT doc_id, lang, u.p AS pos, u.g AS g FROM (
       |    SELECT doc_id, lang,
       |      unnest(list_transform(range(1, len(gs) + 1), i -> {p: i - 1, g: gs[i]})) AS u
       |    FROM g0)),
       |fb AS (SELECT doc_id, lang, pos, CAST(${fnvHugeSql("g")} % $d AS INT) AS b FROM gp),
       |ct AS (SELECT b, COUNT(*) AS c_t FROM fb WHERE lang = 'en' GROUP BY b),
       |cr AS (SELECT b, COUNT(*) AS c_r FROM fb GROUP BY b),
       |tot AS (SELECT (SELECT SUM(c_t) FROM ct) AS t, (SELECT SUM(c_r) FROM cr) AS r),
       |contrib AS (
       |  SELECT doc_id, pos,
       |    ((CAST(COALESCE(c_t, 0) AS DOUBLE) + 1.0) / (CAST(t AS DOUBLE) + $d.0))
       |      / ((CAST(COALESCE(c_r, 0) AS DOUBLE) + 1.0) / (CAST(r AS DOUBLE) + $d.0)) AS p
       |  FROM fb LEFT JOIN ct USING (b) LEFT JOIN cr USING (b) CROSS JOIN tot),
       |sc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |    list_sum(list(p ORDER BY pos)) / CAST(COUNT(*) AS DOUBLE) AS imp_ratio
       |  FROM contrib GROUP BY doc_id)
       |SELECT doc_id, n_feats, imp_ratio,
       |  CAST(imp_ratio >= 1.0 AS INT) AS selected
       |FROM sc""".stripMargin
  }

  /** Resample target of the DSIR systematic-sampling gate. */
  val DsirResampleK = 100

  /** The resampling half of DSIR ([[Dsir.systematicResample]]): the
    * [[importanceSample]] scores become integer weights (⌊ratio·10⁶⌋) and
    * documents are drawn proportional-to-weight by SYSTEMATIC sampling —
    * one draw per `total/k` marks along the cumulative weight line, zero
    * RNG. The two-pass integer prefix sum is bit-equal to the oracle's
    * flat window cumsum because the arithmetic is all 64-bit integer. */
  def importanceResample(s: SparkSession, dir: String): DataFrame = {
    val scored = importanceSample(s, dir)
      .select(col("doc_id"),
        floor(col("imp_ratio") * lit(1000000.0)).as("w"))
    Dsir.systematicResample(scored, "doc_id", "w", k = DsirResampleK)
  }

  /** Mirrors [[importanceResample]]: the full [[importanceSampleSql]] as a
    * subquery, the same ⌊ratio·10⁶⌋ weights, a flat window cumsum in
    * doc-id order, and the same integer floor-division draw count. */
  lazy val importanceResampleSql: String =
    s"""WITH sc AS (SELECT doc_id, imp_ratio FROM (
       |$importanceSampleSql
       |)),
       |wt AS (SELECT doc_id, CAST(floor(imp_ratio * 1000000.0) AS BIGINT) AS w FROM sc),
       |cw AS (
       |  SELECT doc_id, w,
       |    SUM(w) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM wt),
       |st AS (SELECT GREATEST(1, (SELECT SUM(w) FROM wt) // $DsirResampleK) AS step)
       |SELECT doc_id, w,
       |  CAST(cum // step - (cum - w) // step AS BIGINT) AS n_select,
       |  CAST((cum // step - (cum - w) // step) > 0 AS INT) AS selected
       |FROM cw CROSS JOIN st""".stripMargin

  /** PII scan + redaction over deterministically PII-salted text (the
    * fixtures are PII-free word salad, so emails / phone numbers / IPv4
    * addresses are woven in as pure doc_id arithmetic — identically in
    * [[piiScanSql]] — making every count and the full redacted text
    * oracle-checkable). Counts per category plus the redacted text pinned
    * by length + FNV fingerprint ([[Pii.scan]]). */
  def piiScan(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val id = col("doc_id")
    val salted = concat(
      col("text"),
      when(pmod(id, lit(3)) === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(pmod(id, lit(4)) === 0,
        concat(lit(" call (555) 010-"),
          lpad(pmod(id, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(pmod(id, lit(5)) === 0,
        concat(lit(" from 10."), pmod(id, lit(256)).cast("string"),
          lit(".0."), pmod(id, lit(100)).cast("string")))
        .otherwise(lit("")))
    Pii.scan(docs(s, dir).select(id, salted.as("pii_text")),
      col("doc_id"), col("pii_text"))
  }

  /** Mirrors [[piiScan]]: same salt arithmetic, same regexes (the shared
    * [[Pii]] constants — a Java/RE2-agreeing subset), same replace order,
    * FNV fingerprint of the redacted text. */
  val piiScanSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
       |    CASE WHEN doc_id % 4 = 0 THEN ' call (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS t
       |  FROM documents),
       |s1 AS (
       |  SELECT doc_id, t,
       |    regexp_replace(t, '${Pii.EmailRe}', '${Pii.EmailTag}', 'g') AS r1
       |  FROM t),
       |s2 AS (
       |  SELECT doc_id, t, r1,
       |    regexp_replace(r1, '${Pii.PhoneRe}', '${Pii.PhoneTag}', 'g') AS r2
       |  FROM s1),
       |s3 AS (
       |  SELECT doc_id, t, r1, r2,
       |    regexp_replace(r2, '${Pii.Ipv4Re}', '${Pii.Ipv4Tag}', 'g') AS red
       |  FROM s2),
       |h AS (SELECT doc_id, t, r1, r2, red, ${fnvHugeSql("red")} AS hr FROM s3)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '${Pii.EmailRe}')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(r1, '${Pii.PhoneRe}')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(r2, '${Pii.Ipv4Re}')) AS BIGINT) AS n_ipv4,
       |  CAST(length(red) AS BIGINT) AS red_len,
       |  ${hugeToSignedSql("hr")} AS red_fp
       |FROM h""".stripMargin

  /** HTML → text extraction ([[graft.operators.TextExtract.stripHtml]]):
    * the curation tier's front door. The fixture text is plain, so each
    * doc is deterministically wrapped in a realistic page first — title,
    * style block, comment carrying the doc id, heading, paragraph with an
    * attribute, an inline script whose body contains a bare `<`, and an
    * entity-bearing tail — identically in [[htmlExtractSql]]; extraction
    * must recover exactly (title, heading, body, decoded tail), pinned by
    * length + token count + FNV fingerprint of the full extracted text. */
  def htmlExtract(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val title = col("text").substr(1, 30)
    val html = concat(
      lit("<html><head><title>"), title,
      lit("</title><style>p{margin:0}</style></head><body><!-- doc "),
      col("doc_id").cast("string"), lit(" --><h1>"), title,
      lit("</h1>\n<p class=\"x\">"), col("text"),
      lit("</p><script type=\"text/javascript\">var a = 1 < 2;</script> &amp; &lt;tail&gt;</body></html>"))
    docs(s, dir)
      .select(col("doc_id"),
        graft.operators.TextExtract.stripHtml(html).as("t"))
      .select(
        col("doc_id"),
        length(col("t")).cast("long").as("ext_len"),
        GraftFunctions.tokenCount(col("t")).cast("long").as("n_tokens"),
        GraftFunctions.fingerprint64(col("t")).as("ext_fp"))
  }

  /** Mirrors [[htmlExtract]]: the same wrap concatenation, then the SAME
    * regex chain strings in the SAME order ([[graft.operators.TextExtract]]
    * single-sources them; Java ≡ RE2 on this subset), literal entity
    * decodes with `&amp;` last, whitespace collapse, FNV pin. */
  lazy val htmlExtractSql: String = {
    val stripped = graft.operators.TextExtract.RegexSteps.foldLeft("html") {
      case (acc, (p, r)) =>
        s"regexp_replace($acc, '${p.replace("'", "''")}', '$r', 'g')"
    }
    val decoded = graft.operators.TextExtract.EntitySteps.foldLeft(stripped) {
      case (acc, (e, r)) =>
        s"replace($acc, '${e.replace("'", "''")}', '${r.replace("'", "''")}')"
    }
    s"""WITH hm AS (
       |  SELECT doc_id,
       |    '<html><head><title>' || substr(text, 1, 30) ||
       |    '</title><style>p{margin:0}</style></head><body><!-- doc ' ||
       |    CAST(doc_id AS VARCHAR) || ' --><h1>' || substr(text, 1, 30) ||
       |    '</h1>' || chr(10) || '<p class="x">' || text ||
       |    '</p><script type="text/javascript">var a = 1 < 2;</script> &amp; &lt;tail&gt;</body></html>' AS html
       |  FROM documents),
       |ex AS (
       |  SELECT doc_id,
       |    trim(regexp_replace($decoded, '\\s+', ' ', 'g')) AS t
       |  FROM hm),
       |h AS (SELECT doc_id, t, ${fnvHugeSql("t")} AS ht FROM ex)
       |SELECT doc_id,
       |  CAST(length(t) AS BIGINT) AS ext_len,
       |  CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
       |  ${hugeToSignedSql("ht")} AS ext_fp
       |FROM h""".stripMargin
  }

  /** URL canonicalization + URL-level dedup ([[Urls.canonicalize]]): each
    * doc gets a deterministically messy URL built from doc_id arithmetic —
    * mixed-case scheme/host, `WWW.` prefix, default and non-default ports,
    * trailing slashes, `utm_*` tracking params ahead of real ones,
    * fragments — identically in [[urlCanonicalizeSql]]; canonicalization
    * collapses the cosmetic variants and the gate reports one row per
    * canonical URL with its keeper (min doc_id), copy count, and host.
    * The variants are DESIGNED to collide: ids differing only in the
    * trailing-slash/port/utm/fragment mods canonicalize identically. */
  /** The deterministically messy URL of the URL gates (single-sourced with
    * [[messyUrlSql]]). */
  private[queries] def messyUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      when(pmod(id, lit(2)) === 0, lit("HTTPS")).otherwise(lit("http")),
      lit("://WWW."), col("source"), lit(".Example.COM"),
      when(pmod(id, lit(6)) === 0, lit(":443"))
        .when(pmod(id, lit(6)) === 3, lit(":8080")).otherwise(lit("")),
      lit("/p/"), pmod(id, lit(5)).cast("string"),
      when(pmod(id, lit(3)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&a="), pmod(id, lit(4)).cast("string"),
      when(pmod(id, lit(2)) === 0, lit("&utm_campaign=x")).otherwise(lit("")),
      when(pmod(id, lit(2)) === 1,
        concat(lit("#sec"), pmod(id, lit(4)).cast("string"))).otherwise(lit("")))
  }

  def urlCanonicalize(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), Urls.canonicalize(messyUrl).as("canonical"))
      .groupBy(col("canonical"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .withColumn("host", Urls.canonicalHost(col("canonical")))

  /** Mirrors [[urlCanonicalize]]: identical messy-URL arithmetic, then the
    * SAME pattern strings in the SAME order as [[Urls.canonicalize]]
    * (Java ≡ RE2 on this subset; DuckDB regexp_replace carries the 'g'
    * flag to match Spark's always-global semantics), the same utm-filter +
    * sort on the params, the same default-port and trailing-slash rules. */
  /** Shared CTE chain `url_u → … → url_c(doc_id, canonical)` replicating
    * [[messyUrl]] + [[Urls.canonicalize]] — used by [[urlCanonicalizeSql]]
    * and the host report. */
  private[queries] val urlCanonCtes: String =
    s"""url_u AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END ||
       |    '://WWW.' || source || '.Example.COM' ||
       |    CASE WHEN doc_id % 6 = 0 THEN ':443'
       |         WHEN doc_id % 6 = 3 THEN ':8080' ELSE '' END ||
       |    '/p/' || CAST(doc_id % 5 AS VARCHAR) ||
       |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
       |    '?utm_source=feed&a=' || CAST(doc_id % 4 AS VARCHAR) ||
       |    CASE WHEN doc_id % 2 = 0 THEN '&utm_campaign=x' ELSE '' END ||
       |    CASE WHEN doc_id % 2 = 1 THEN '#sec' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END AS url
       |  FROM documents),
       |url_p1 AS (
       |  SELECT doc_id,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '', 'g') AS rest
       |  FROM url_u),
       |url_p2 AS (
       |  SELECT doc_id, scheme,
       |    regexp_extract(rest, '^([^/?#]*)', 1) AS hostport,
       |    regexp_replace(rest, '^[^/?#]*', '', 'g') AS pathqf
       |  FROM url_p1),
       |url_p3 AS (
       |  SELECT doc_id, scheme,
       |    regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)), '^www\\.', '', 'g') AS host,
       |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
       |    regexp_replace(regexp_replace(regexp_extract(pathqf, '^([^?#]*)', 1), '/{2,}', '/', 'g'), '/+$$', '', 'g') AS path,
       |    array_to_string(list_sort(list_filter(string_split(regexp_extract(pathqf, '\\?([^#]*)', 1), '&'),
       |      p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS q
       |  FROM url_p2),
       |url_c AS (
       |  SELECT doc_id,
       |    scheme || '://' || host ||
       |    CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
       |              OR (scheme = 'http' AND port = '80') THEN ''
       |         ELSE ':' || port END ||
       |    path ||
       |    CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical
       |  FROM url_p3)""".stripMargin

  val urlCanonicalizeSql: String =
    s"""WITH $urlCanonCtes
       |SELECT canonical, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
       |  regexp_extract(canonical, '^https?://([^/:?]*)', 1) AS host
       |FROM url_c GROUP BY canonical""".stripMargin

  /** Host-level curation report — the composition the two front-door tiers
    * exist for: every doc's canonical URL/host ([[Urls.canonicalize]] of
    * [[messyUrl]]) joined with its Gopher keep verdict
    * ([[GraftFunctions.gopherOk]] over [[gopherPage]]), aggregated per
    * host — docs, distinct canonical URLs, kept docs, keep rate. The
    * crawl-curation decision table: a host whose keep rate collapses gets
    * delisted. Both per-doc signals are scan projections; the only
    * shuffle is the host-keyed aggregate (map-side partial; distinct-URL
    * count partial-aggregates the same way). */
  def hostReport(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    docs(s, dir)
      .select(
        col("doc_id"),
        Urls.canonicalize(messyUrl).as("canonical"),
        GraftFunctions.gopherOk(GraftFunctions.gopherStats(gopherPage))
          .cast("long").as("keep"))
      .withColumn("host", Urls.canonicalHost(col("canonical")))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("canonical")).as("n_urls"),
        sum(col("keep")).as("n_keep"))
      .withColumn("keep_rate",
        col("n_keep").cast("double") / col("n_docs").cast("double"))
  }

  /** Mirrors [[hostReport]]: the shared [[urlCanonCtes]] and
    * [[gopherCountCtes]] joined on doc_id, the same keep condition, one
    * host-keyed aggregate, one exact division. */
  lazy val hostReportSql: String =
    s"""WITH $urlCanonCtes,
       |$gopherCountCtes,
       |hk AS (
       |  SELECT u.doc_id,
       |    regexp_extract(u.canonical, '^https?://([^/:?]*)', 1) AS host,
       |    u.canonical,
       |    CAST($gopherKeepSql AS BIGINT) AS keep
       |  FROM url_c u JOIN gop_c USING (doc_id))
       |SELECT host, COUNT(*) AS n_docs,
       |  COUNT(DISTINCT canonical) AS n_urls,
       |  CAST(SUM(keep) AS BIGINT) AS n_keep,
       |  CAST(SUM(keep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS keep_rate
       |FROM hk GROUP BY host""".stripMargin
}
