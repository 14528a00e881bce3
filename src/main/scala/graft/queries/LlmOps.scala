package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators on the driver fixtures (north-star ops,
  * SURVEY §2.3): text analysis, dedup (exact → MinHash/SimHash/Jaccard →
  * embedding), similarity search, multimodal plumbing. Text/dedup queries
  * that use only engine-portable primitives carry DuckDB oracles; the
  * hash/LSH/float families are deterministic but engine-specific, so the
  * driver records their rows-only check and scalatest verifies their
  * semantics against exact references. */
object LlmOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // SQL fragments kept in lockstep with GraftFunctions definitions
  private val tsSql = "string_split(text, ' ')"
  private def hitsSql(markers: Seq[String]): String =
    s"len(list_filter($tsSql, t -> list_contains([${markers.map(m => s"'$m'").mkString(",")}], t)))"

  /** Per-document text statistics + quality score. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val ts = GraftFunctions.tokens(col("text"))
    val n = size(ts).cast("double")
    docs(s, dir).select(
      col("doc_id"),
      col("lang"),
      size(ts).cast("long").as("n_tokens"),
      size(array_distinct(ts)).cast("long").as("n_distinct"),
      (size(array_distinct(ts)).cast("double") / n).as("uniq_ratio"),
      ((length(col("text")) - (size(ts) - 1)).cast("double") / n).as("avg_token_len"),
      GraftFunctions.qualityScore(col("text")).as("quality"))
  }

  val textStatsSql: String = {
    val allMarkers = GraftFunctions.langMarkers.flatMap(_._2)
    s"""SELECT doc_id, lang,
       |  CAST(len($tsSql) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct($tsSql)) AS BIGINT) AS n_distinct,
       |  CAST(len(list_distinct($tsSql)) AS DOUBLE) / CAST(len($tsSql) AS DOUBLE) AS uniq_ratio,
       |  CAST(length(text) - (len($tsSql) - 1) AS DOUBLE) / CAST(len($tsSql) AS DOUBLE) AS avg_token_len,
       |  0.5 * (CAST(len(list_distinct($tsSql)) AS DOUBLE) / CAST(len($tsSql) AS DOUBLE))
       |    + 0.3 * least(1.0, CAST(len($tsSql) AS DOUBLE) / 64.0)
       |    + 0.2 * (1.0 - CAST(${hitsSql(allMarkers)} AS DOUBLE) / CAST(len($tsSql) AS DOUBLE)) AS quality
       |FROM documents""".stripMargin
  }

  /** Language-ID heuristic vs the labeled lang column. */
  def langId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      col("lang"),
      GraftFunctions.langId(col("text")).as("lang_pred"))
      .withColumn("agree", (col("lang_pred") === col("lang")).cast("int"))

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
       |    CASE $cases
       |    ELSE 'und' END AS lang_pred
       |  FROM (SELECT doc_id, lang, $hitDefs FROM documents))""".stripMargin
  }

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

  /** MinHash+LSH near-dup pairs (hash-specific → rows-only check; semantics
    * verified against the exact Jaccard twin in DedupSpec). */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
      shingleK = 3, numHashes = 48, bands = 16, threshold = 0.8)

  /** SimHash near-dup pairs (rows-only). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
  }

  /** Document fingerprints via the native Fingerprint64 expression
    * (rows-only; cross-checked interpreted-vs-codegen in FunctionsSpec). */
  def fingerprints(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    docs(s, dir).select(
      col("doc_id"),
      GraftFunctions.fingerprint64(col("text")).as("fp"),
      GraftFunctions.fingerprint64(GraftFunctions.canonicalKey(col("text")))
        .as("canonical_fp"))
  }

  /** Embedding near-duplicate candidates via hyperplane LSH + cosine
    * re-rank. The synthetic embeddings are near-orthogonal (max pairwise
    * cosine ≈ 0.51), so rather than a high threshold that matches nothing,
    * the query reports the 50 most similar LSH-candidate pairs; the
    * thresholded dedup operator itself is exercised (with a planted
    * duplicate) in DedupSpec. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Dedup.embeddingNearDupPairs(embeddings(s, dir), "vec_id", "embedding",
        dim = 64, threshold = -1.0, planesPerTable = 8, tables = 4)
      .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc)
      .limit(50)
  }

  private def queryVector(s: SparkSession, dir: String): Seq[Float] =
    embeddings(s, dir).orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding")).head().getSeq[Float](0)

  /** Brute-force cosine top-k (exact ANN baseline). */
  def simTopKBrute(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Similarity.bruteForceTopK(embeddings(s, dir), "vec_id", "embedding",
      queryVector(s, dir), k = 20)
  }

  /** IVF-probed approximate top-k (the scale path). */
  def simTopKIvf(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Similarity.ivfTopK(embeddings(s, dir), "vec_id", "embedding",
      queryVector(s, dir), k = 20, nCells = 16, nprobe = 4)
  }

  /** Top-5 TF-IDF terms per document (ln() differs across engines by ulps →
    * rows-only; exact math pinned in TfIdfSpec). */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame =
    graft.operators.TfIdf.topTerms(docs(s, dir), "doc_id", "text", k = 5)

  /** Text → hashed feature vectors → ANN composition: 20 nearest documents
    * to doc 0 by cosine over feature-hashed tf vectors. */
  def docVectorSearch(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val vecs = graft.operators.TfIdf.hashedVectors(s, docs(s, dir), "doc_id", "text").toDF()
    val query = vecs.orderBy(col("doc_id").asc).limit(1)
      .select(col("vector")).head().getSeq[Float](0)
    Similarity.bruteForceTopK(vecs, "doc_id", "vector", query, k = 20)
  }

  /** Multimodal payload → batch decode → per-source features. */
  def multimodal(s: SparkSession, dir: String): DataFrame =
    Multimodal.featurePipeline(s, docs(s, dir))
}
