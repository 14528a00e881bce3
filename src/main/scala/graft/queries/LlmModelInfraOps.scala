package graft.queries

import graft.core.Checkpoint.Ops
import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{Clusters, Decontaminate, Dedup, Dsir, Multimodal, Pii, Pq, Similarity, Spans, Urls}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** LlmOps module: model-adjacent infrastructure and the float/hash-
  * exact oracle SQL kernels — k-means CTEs, LM scoring, the linear
  * quality probe, ANN index append/delete and the orchestrated
  * incremental day, PCA, BPE train/tokenize, semantic dedup, LSH and
  * graph (PageRank/BFS) twins. */
trait LlmModelInfraOps { this: LlmOps.type =>

  // ---- float/hash-exact DuckDB oracles for the cosine & fingerprint ----
  // families. The gate hash-compares doubles at full precision, so these
  // SQL twins replicate the JVM kernels' exact operation order:
  // `list_sum(list_transform(...))` is a sequential left-to-right double
  // fold — bitwise equal to VectorOps' while-loops (validated element-wise
  // on the fixtures; DuckDB's own list_cosine_similarity differs in ulps
  // and is NOT used).

  /** Sequential double dot-product fold over the min length, mirroring
    * [[graft.functions.VectorOps.dot]]. */
  private[queries] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, least(len($a), len($b))+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private[queries] def normSql(a: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)))"

  /** d / sqrt(na·nb) with 0.0 on zero norms — [[graft.functions.VectorOps.cosine]]. */
  private[queries] def cosSql(a: String, b: String): String =
    s"""(CASE WHEN ${normSql(a)} = 0 OR ${normSql(b)} = 0 THEN 0.0
       | ELSE ${dotSql(a, b)} / sqrt(${normSql(a)} * ${normSql(b)}) END)""".stripMargin

  /** FNV-1a 64 over the (ASCII) bytes of `t` as an unsigned HUGEINT in
    * [0, 2^64) — [[graft.functions.TextHash.fnv1a64]] with mod-2^64
    * wraparound made explicit. */
  private[queries] def fnvHugeSql(t: String): String =
    fnvHugeFromSql(t, "14695981039346656037")

  /** The second, domain-separated FNV stream —
    * [[graft.functions.TextHash.fnv1a64Alt]] (basis embedded from the JVM
    * constant). */
  private[queries] def fnvAltHugeSql(t: String): String =
    fnvHugeFromSql(t,
      java.lang.Long.toUnsignedString(graft.functions.TextHash.Fnv1a64AltBasis))

  private[queries] def fnvHugeFromSql(t: String, basis: String): String =
    s"""list_reduce(
       |      list_prepend(CAST($basis AS HUGEINT),
       |        list_transform(range(1, length($t)+1), i -> CAST(unicode(substr($t, i, 1)) AS HUGEINT))),
       |      (a, b) -> (xor(a, b) * 1099511628211) % CAST(18446744073709551616 AS HUGEINT))""".stripMargin

  /** Reinterpret the unsigned fold result as the JVM's signed Long. */
  private[queries] def hugeToSignedSql(h: String): String =
    s"CAST(CASE WHEN $h >= CAST(9223372036854775808 AS HUGEINT) THEN $h - CAST(18446744073709551616 AS HUGEINT) ELSE $h END AS BIGINT)"

  val fingerprintsSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS ck
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, ${fnvHugeSql("text")} AS hf, ${fnvHugeSql("ck")} AS hc
       |  FROM base)
       |SELECT doc_id, ${hugeToSignedSql("hf")} AS fp, ${hugeToSignedSql("hc")} AS canonical_fp
       |FROM h""".stripMargin

  val simTopKBruteSql: String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cosine
       |FROM embeddings e CROSS JOIN q
       |ORDER BY cosine DESC, e.vec_id ASC LIMIT 20""".stripMargin

  /** Mirrors [[graft.operators.Similarity.kmeansCentroids]] +
    * `ivfTopKWith`: seeds = first 16 vectors by id; [[IvfKmeansIters]]
    * UNROLLED Lloyd rounds, each an assignment (first-index argmax of
    * cosine ≡ row_number with cell ASC tie-break) + a per-dimension
    * quantized-integer-sum mean update — floor(x·10⁹) BIGINT sums / count
    * / 10⁹, cast to float32, exactly the kernel's [[Similarity
    * .CentroidQuanta]] arithmetic (empty cells keep their centroid, like
    * the kernel's `getOrElse(c, old)`); then the 4-nearest-cell probe.
    * Integer sums are order-independent, so the replay is BIT-EXACT on any
    * partitioning and any engine — the former AVG()-cast-float32
    * formulation's documented ~10⁻⁵/run summation-order flake class is
    * gone (same fix that made the probe's GD training reproducible). */
  /** Shared CTE fragment: cent0 seeds (first-16 by id) → [[IvfKmeansIters]]
    * unrolled Lloyd rounds → `cent$IvfKmeansIters` (the refined centroid
    * table) and `assign(vec_id, cell)` (final first-index-argmax
    * assignment). Used by the IVF probe oracle, the semantic-dedup oracle,
    * the cluster-report oracle and the batched-ANN oracle, so all gates
    * exercise the SAME replicated k-means. */
  private[queries] def kmeansAssignCtes: String = kmeansAssignCtesOver("embeddings")

  /** [[kmeansAssignCtes]] with the TRAINING corpus parameterized (seed +
    * every Lloyd round read `train`; the final `assign` always covers the
    * whole embeddings table) — the incremental-index oracle trains on the
    * base slice and assigns base + appended alike, mirroring
    * `appendToIvfIndex`'s frozen-centroid contract. */
  private[queries] def kmeansAssignCtesOver(train: String): String = {
    val dim = 64
    val q = graft.operators.Similarity.CentroidQuanta
    val avgs = (1 to dim)
      .map(i => s"CAST(CAST(SUM(CAST(floor(CAST(e.embedding[$i] AS DOUBLE) * $q) AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / $q AS FLOAT)")
      .mkString("[", ", ", "]")
    def round(t: Int): String =
      s"""rc$t AS (
         |  SELECT e.vec_id, c.cell, ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM $train e CROSS JOIN cent$t c),
         |a$t AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rn
         |    FROM rc$t) WHERE rn = 1),
         |up$t AS (
         |  SELECT a.cell, $avgs AS cv
         |  FROM a$t a JOIN $train e USING (vec_id) GROUP BY a.cell),
         |cent${t + 1} AS (
         |  SELECT c.cell, COALESCE(u.cv, c.cv) AS cv
         |  FROM cent$t c LEFT JOIN up$t u ON u.cell = c.cell)""".stripMargin
    val rounds = (0 until IvfKmeansIters).map(round).mkString(",\n")
    val f = IvfKmeansIters
    s"""cent0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, embedding AS cv
       |  FROM (SELECT vec_id, embedding FROM $train ORDER BY vec_id LIMIT 16)),
       |$rounds,
       |rcF AS (
       |  SELECT e.vec_id, c.cell, ${cosSql("e.embedding", "c.cv")} AS cs
       |  FROM embeddings e CROSS JOIN cent$f c),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rn
       |    FROM rcF) WHERE rn = 1)""".stripMargin
  }

  lazy val simTopKIvfSql: String = {
    val f = IvfKmeansIters
    s"""WITH $kmeansAssignCtes,
       |q AS (SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
       |probed AS (
       |  SELECT c.cell FROM cent$f c CROSS JOIN q
       |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cell ASC LIMIT 4)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cosine
       |FROM embeddings e JOIN assign USING (vec_id) CROSS JOIN q
       |WHERE assign.cell IN (SELECT cell FROM probed)
       |ORDER BY cosine DESC, e.vec_id ASC LIMIT 20""".stripMargin
  }

  /** LM-gate threshold: the fixture corpus self-scores mean_p in
    * [0.0299, 0.0383] (5th pct ≈ 0.0322), so 0.032 gates the genuinely
    * least-predictable tail without emptying the corpus at any SF. */
  private[queries] val LmMinMeanP = 0.032

  /** CCNet-flavored LM predictability scoring
    * ([[graft.operators.LangModel.scoreBigram]], self-scored: the corpus
    * is its own reference model). mean_p is emitted EXACTLY — rational
    * count arithmetic + position-ordered folds, no transcendentals. */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.LangModel.scoreBigram(d, d, "doc_id", "text", LmMinMeanP)
  }

  /** Bigram-LM CTE fragment (`lmdoc(doc_id, n_bigrams, mean_p)`) shared by
    * the standalone [[lmScoreSql]] gate and the curation pipeline's LM
    * stage — one replica of the model in the oracle corpus, like
    * [[scoredRepCtes]] for the quality kernels. */
  private[queries] lazy val lmCtes: String =
    s"""lm_ts AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |lm_uni AS (SELECT t AS token, COUNT(*) AS c_uni FROM (SELECT unnest(toks) AS t FROM lm_ts) GROUP BY t),
       |lm_vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lm_uni),
       |lm_bipos AS (
       |  SELECT doc_id, u.p AS pos, u.prev AS prev, u.bg AS bg FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |      i -> {p: i - 1, prev: toks[i], bg: toks[i] || ' ' || toks[i+1]})) AS u
       |    FROM lm_ts)),
       |lm_bi AS (SELECT bg, COUNT(*) AS c_bi FROM lm_bipos GROUP BY bg),
       |lm_contrib AS (
       |  -- LEFT joins + COALESCE mirror LangModel.scoreBigram for ANY
       |  -- reference corpus: an unseen bigram/unigram smooths to
       |  -- (0+1)/(0+V) instead of silently dropping the position (inner
       |  -- joins only coincide under self-scoring, where every scored
       |  -- bigram exists in the reference)
       |  SELECT doc_id, pos,
       |    (CAST(COALESCE(c_bi, 0) AS DOUBLE) + 1.0)
       |      / (CAST(COALESCE(c_uni, 0) AS DOUBLE) + CAST(v AS DOUBLE)) AS p
       |  FROM lm_bipos LEFT JOIN lm_bi USING (bg)
       |  LEFT JOIN lm_uni ON lm_uni.token = lm_bipos.prev CROSS JOIN lm_vocab),
       |lmdoc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    list_sum(list(p ORDER BY pos)) / CAST(COUNT(*) AS DOUBLE) AS mean_p
       |  FROM lm_contrib GROUP BY doc_id)""".stripMargin

  /** Mirrors [[lmScore]]: same add-one-smoothed counts, same 0-based
    * positions, same position-ordered sequential fold (list_sum over an
    * ORDER BY pos list ≡ the JVM left fold — the [[cosSql]] precedent). */
  lazy val lmScoreSql: String =
    s"""WITH $lmCtes
       |SELECT doc_id, n_bigrams, mean_p, mean_p >= $LmMinMeanP AS lm_ok
       |FROM lmdoc""".stripMargin

  /** Clustering-quality report
    * ([[graft.operators.Similarity.clusterReport]]) over the SAME refined
    * centroids as the IVF and semantic-dedup gates. */
  def clusterReport(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = embeddings(s, dir)
    Similarity.clusterReport(e, "vec_id", "embedding",
      Similarity.kmeansCentroids(e, "vec_id", "embedding",
        nCells = 16, iters = IvfKmeansIters))
  }

  /** Mirrors [[clusterReport]] on the shared k-means CTEs: same
    * assignment, same cosine fold, same floor-quantized integer sum (the
    * mean is order-independent by construction, so no ordered-fold CTE is
    * needed). */
  lazy val clusterReportSql: String = {
    val f = IvfKmeansIters
    s"""WITH $kmeansAssignCtes,
       |m AS (
       |  SELECT a.cell, ${cosSql("e.embedding", "c.cv")} AS cs
       |  FROM assign a JOIN embeddings e USING (vec_id)
       |  JOIN cent$f c ON c.cell = a.cell)
       |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
       |  MIN(cs) AS min_cos, MAX(cs) AS max_cos,
       |  CAST(SUM(CAST(floor(cs * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_cos_q6,
       |  CAST(SUM(CAST(floor(cs * 1000000.0) AS BIGINT)) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS mean_cos_q
       |FROM m GROUP BY cell""".stripMargin
  }

  // probe-gate hyperparameters — shared by the query and its oracle twin
  private[queries] val ProbeIters = 3
  private[queries] val ProbeLr = 0.5
  private[queries] val ProbeDim = 64

  /** Fraction of the corpus the probe TRAINS on (ALT-hash deterministic
    * sample — independent of the split stream); scoring covers everything.
    * Training a 64-dim linear probe needs thousands of examples, not the
    * corpus: at 100 TB this is the difference between 3 sampled-scan
    * aggregations and 3 full-corpus passes per GD round. */
  private[queries] val ProbeTrainFrac = 0.25

  /** Margin threshold for the curation pipeline's probe-scoring stage.
    * The probe is trained to predict the weak label (quality ≥ 0.5 → 1.0),
    * so 0.6 asks for "confidently good": measured against the fixture
    * corpora it cuts a small real slice of the heuristic survivors
    * (3/118 at sf0.001, 2/138 at sf0.01, 16/1090 at sf0.1) — the docs the
    * classifier disagrees with the hand rules about, which is the point
    * of the GPT-3/LLaMA probe-filtering recipe. */
  private[graft] val ProbeGateMargin = 0.6

  /** Hashed-tf features + weak labels → trained probe weights: the
    * shared trainer behind the weights gate ([[qualityProbe]]), the
    * curation pipeline's inline scoring stage, and the streaming
    * deployment. */
  private[queries] def trainedProbe(s: SparkSession, dir: String): Seq[Double] = {
    GraftFunctions.register(s)
    // the deployed recipe's shape: TRAIN on a content-stable sample
    // (hash-membership filter pushed into the scan — at 100 TB you never
    // full-batch-GD over the whole corpus), SCORE everything. Vector and
    // weak label come from ONE projection off the sampled scan — a doc_id
    // self-join here would shuffle rows that already sit side by side.
    val training = graft.operators.Sampling
      .deterministicSample(docs(s, dir), col("doc_id"), ProbeTrainFrac)
      .select(
        GraftFunctions.hashedTfVector(split(col("text"), " "), ProbeDim).as("vector"),
        GraftFunctions.markerStats(col("text")).as("ms"))
      .select(col("vector"),
        when(GraftFunctions.qualityScoreFrom(col("ms")) >= 0.5, 1.0)
          .otherwise(0.0).as("y"))
    graft.operators.Probe.trainLinear(
      training, "vector", "y", ProbeDim, ProbeIters, ProbeLr)
  }

  /** Linear quality probe trained in-plan
    * ([[graft.operators.Probe.trainLinear]]): hashed-tf features, weak
    * labels from the quality kernel, 3 unrolled full-batch GD rounds with
    * integer-quantized gradient aggregation — the weights are
    * bit-reproducible on any partitioning, so the oracle can replay
    * training exactly. */
  def qualityProbe(s: SparkSession, dir: String): DataFrame =
    graft.operators.Probe.weightsDF(s, trainedProbe(s, dir))

  /** The trained weight vector alone — the batch-side artifact the
    * streaming deployment ([[graft.streaming.EventPipeline.probeScoreStream]])
    * freezes into its plan. */
  private[graft] def trainedProbeWeights(s: SparkSession, dir: String): Seq[Double] =
    trainedProbe(s, dir)

  /** The probe-training CTE chain — [[hashedVectorCtes]], weak labels,
    * and the GD rounds UNROLLED (the k-means oracle pattern): per round,
    * one quantized-integer gradient aggregate and one weight-update row;
    * every double operation tree (fixed-order 64-term prediction sum,
    * err·x·1e9 floor, g/n/1e9 update) matches the JVM driver arithmetic
    * operation for operation. Ends in `w$ProbeIters(w0..w63)` — bound by
    * the weights gate and by [[curationPipelineSql]]'s scoring stage. */
  private[queries] lazy val probeTrainCtes: String = {
    val dims = 0 until ProbeDim
    // prediction under the iteration-t weight row (w0 ≡ all-zero literals)
    def predSql(t: Int): String =
      if (t == 0) dims.map(j => s"CAST(d.vec[${j + 1}] AS DOUBLE) * 0.0").mkString(" + ")
      else dims.map(j => s"CAST(d.vec[${j + 1}] AS DOUBLE) * w$t.w$j").mkString(" + ")
    def dataCte(t: Int): String = {
      val from = if (t == 0) "normed d JOIN lab USING (doc_id) JOIN ptrain USING (doc_id)"
      else s"normed d JOIN lab USING (doc_id) JOIN ptrain USING (doc_id) CROSS JOIN w$t"
      s"""d$t AS (
         |  SELECT d.vec AS vec, (${predSql(t)}) - lab.y AS err
         |  FROM $from)""".stripMargin
    }
    def gradCte(t: Int): String = {
      val q = graft.operators.Probe.QuantScale
      val gs = dims.map(j =>
        s"SUM(CAST(floor(err * CAST(vec[${j + 1}] AS DOUBLE) * $q) AS BIGINT)) AS g$j")
        .mkString(",\n    ")
      s"""g${t + 1} AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, $gs FROM d$t)""".stripMargin
    }
    def weightCte(t: Int): String = {
      val prev = if (t == 0) (_: Int) => "0.0" else (j: Int) => s"w$t.w$j"
      val from = if (t == 0) s"g${t + 1}" else s"g${t + 1} CROSS JOIN w$t"
      val q = graft.operators.Probe.QuantScale
      val ws = dims.map(j =>
        s"${prev(j)} - $ProbeLr * (CAST(g${t + 1}.g$j AS DOUBLE) / CAST(g${t + 1}.n AS DOUBLE) / $q) AS w$j")
        .mkString(",\n    ")
      s"""w${t + 1} AS (
         |  SELECT $ws FROM $from)""".stripMargin
    }
    val rounds = (0 until ProbeIters)
      .map(t => s"${dataCte(t)},\n${gradCte(t)},\n${weightCte(t)}").mkString(",\n")
    // training-sample membership: the ALT-stream FNV bucket, the exact
    // [[sampleStratifiedSql]] replica at the probe's fraction
    val signed = hugeToSignedSql("hu")
    val trainCte =
      s"""ptrain AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, (($signed % 1000000) + 1000000) % 1000000 AS bucket
         |    FROM (SELECT doc_id, ${fnvAltHugeSql("CAST(doc_id AS VARCHAR)")} AS hu
         |          FROM documents))
         |  WHERE bucket < ${graft.operators.Sampling.threshold(ProbeTrainFrac)})""".stripMargin
    s"""$hashedVectorCtes,
       |lab AS (
       |  SELECT doc_id, CASE WHEN $qualityExprSql >= 0.5 THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |$trainCte,
       |$rounds""".stripMargin
  }

  /** Per-doc margin under the trained weights — `pok(doc_id)`, the docs the
    * probe rates ≥ [[ProbeGateMargin]]. The margin is the same fixed-order
    * 64-term sum as the training prediction ([[graft.operators.Probe.score]]
    * left-folds identically), so the double compares exactly. */
  private[queries] lazy val probeGateCtes: String = {
    val margin = (0 until ProbeDim)
      .map(j => s"CAST(d.vec[${j + 1}] AS DOUBLE) * w$ProbeIters.w$j").mkString(" + ")
    s"""pmarg AS (
       |  SELECT d.doc_id, ($margin) AS margin
       |  FROM normed d CROSS JOIN w$ProbeIters),
       |pok AS (SELECT doc_id FROM pmarg WHERE margin >= $ProbeGateMargin)""".stripMargin
  }

  /** Mirrors [[qualityProbe]]: the [[probeTrainCtes]] replay, weights
    * unpivoted to the (dim, weight) gate shape. */
  lazy val qualityProbeSql: String = {
    val wList = (0 until ProbeDim).map(j => s"w$ProbeIters.w$j").mkString("[", ", ", "]")
    s"""WITH $probeTrainCtes
       |SELECT CAST(u.j AS INT) AS dim, $wList[u.j + 1] AS weight
       |FROM w$ProbeIters, (SELECT unnest(range(0, $ProbeDim)) AS j) u""".stripMargin
  }

  /** Mirrors [[graft.streaming.EventPipeline.probeScoreStream]] (stream ≡
    * batch for a stateless scorer): the [[probeTrainCtes]] replay + the
    * margin projection, emitting the admitted docs WITH their exact-double
    * margins. */
  lazy val streamProbeSql: String =
    s"""WITH $probeTrainCtes,
       |$probeGateCtes
       |SELECT d.doc_id, d.lang, p.margin
       |FROM documents d JOIN pmarg p USING (doc_id)
       |WHERE p.margin >= $ProbeGateMargin""".stripMargin

  /** Incremental IVF index maintenance
    * ([[graft.operators.Similarity.appendToIvfIndex]]): build the index
    * from the even-id half (centroids trained there and FROZEN — the
    * index's contract), append the odd-id half as a partition-local
    * append (no rebuild, no standing-cell rewrite), then probe the union
    * from disk. The probe result is hash-exact against the oracle's
    * frozen-centroid replica. */
  def annAppend(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_append")
    try {
      val e = embeddings(s, dir)
      val base = e.filter(pmod(col("vec_id"), lit(2)) === 0)
      val incr = e.filter(pmod(col("vec_id"), lit(2)) =!= 0)
      val cents = Similarity.writeIvfIndex(base, "vec_id", "embedding",
        out.toString, nCells = 16, refineIters = IvfKmeansIters)
      Similarity.appendToIvfIndex(incr, "vec_id", "embedding", out.toString, cents)
      Similarity.ivfTopKFromIndex(s, out.toString, cents, "vec_id", "embedding",
        queryVector(s, dir), k = 20, nprobe = 4).graftCheckpoint()
    } finally graft.plans.CorpusExport.deleteRecursively(out.toFile)
  }

  /** Mirrors [[annAppend]]: k-means trained on the even-id slice only
    * (the frozen-centroid contract), assignment over EVERYTHING — base
    * and appended rows probe identically. */
  lazy val annAppendSql: String = {
    val f = IvfKmeansIters
    s"""WITH ${kmeansAssignCtesOver("(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0)")},
       |q AS (SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
       |probed AS (
       |  SELECT c.cell FROM cent$f c CROSS JOIN q
       |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cell ASC LIMIT 4)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cosine
       |FROM embeddings e JOIN assign USING (vec_id) CROSS JOIN q
       |WHERE assign.cell IN (SELECT cell FROM probed)
       |ORDER BY cosine DESC, e.vec_id ASC LIMIT 20""".stripMargin
  }

  /** The orchestrated incremental-day gate
    * ([[graft.plans.IncrementalDay.ingestDay]]): doc_id ≡ 0 (mod 4) plays
    * the new day, the rest the standing corpus. Day-0 artifacts are built
    * first (IVF index + frozen centroids over the standing embeddings,
    * probe weights trained on the day-0 corpus), then the day flows
    * end-to-end: bloom dedup → frozen-artifact curation → split-
    * partitioned delta export → idempotent index append (replay refused
    * in-run). The output is the delta manifest read back from the written
    * files with the day's index-row/cell facts from the batch-tagged
    * index files — all of it replayed by the oracle from `documents` +
    * `embeddings` alone. */
  def incrementalDay(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val root = java.nio.file.Files.createTempDirectory("graft_incr_day")
    try {
      val d = docs(s, dir)
      val e = embeddings(s, dir)
      val standing = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
      val incoming = d.filter(pmod(col("doc_id"), lit(4)) === 0)
      val idx = s"$root/index"
      val cents = Similarity.writeIvfIndex(
        e.filter(pmod(col("vec_id"), lit(4)) =!= 0), "vec_id", "embedding",
        idx, nCells = 16, refineIters = IvfKmeansIters)
      graft.plans.IncrementalDay.ingestDay(
        s, incoming, standing,
        trainedProbeWeights(s, dir), ProbeGateMargin, splitColumnFor,
        e, idx, cents, s"$root/delta", "day1",
        bloomBits = 1 << 16, bloomProbes = 4)
    } finally graft.plans.CorpusExport.deleteRecursively(root.toFile)
  }

  /** Mirrors [[incrementalDay]] stage by stage: the mod-4 anti-join admit
    * predicate, the quality-tier and frozen-probe CTEs (probe trained on
    * the day-0 corpus — the whole `documents` table, the s_stream_probe
    * convention), the shared split rule, and the day's index facts via
    * the frozen-centroid k-means replica over the STANDING embeddings
    * (the annAppend convention at a mod-4 split). */
  lazy val incrementalDaySql: String =
    s"""WITH fp AS (
       |  SELECT doc_id, ${fnvHugeSql("ck")} AS f1, ${fnvAltHugeSql("ck")} AS f2
       |  FROM (SELECT doc_id,
       |          array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS ck
       |        FROM documents)),
       |admitted AS (
       |  SELECT i.doc_id FROM fp i
       |  WHERE i.doc_id % 4 = 0 AND NOT EXISTS (
       |    SELECT 1 FROM fp c
       |    WHERE c.doc_id % 4 <> 0 AND c.f1 = i.f1 AND c.f2 = i.f2)),
       |$scoredRepCtes,
       |$probeTrainCtes,
       |$probeGateCtes,
       |curated AS (
       |  SELECT s.doc_id, s.lang, s.n_tokens FROM scored s
       |  JOIN rep USING (doc_id) JOIN admitted USING (doc_id)
       |  JOIN pok USING (doc_id)
       |  WHERE s.quality >= 0.5 AND s.lang_ok AND rep.rep_ok),
       |$splitAssignCtes,
       |${kmeansAssignCtesOver("(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 0)")},
       |idx AS (
       |  SELECT COUNT(*) AS day_index_rows,
       |         COUNT(DISTINCT a.cell) AS day_index_cells
       |  FROM curated c JOIN assign a ON a.vec_id = c.doc_id)
       |SELECT sp.split, c.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens,
       |  idx.day_index_rows, idx.day_index_cells
       |FROM curated c JOIN sp ON sp.doc_id = c.doc_id CROSS JOIN idx
       |GROUP BY sp.split, c.lang, idx.day_index_rows, idx.day_index_cells""".stripMargin

  /** The snapshot-store-backed day lifecycle
    * ([[graft.plans.IncrementalDay.ingestDayVersioned]]): the mod-4 "new
    * day" of [[incrementalDay]] splits into TWO days (doc_id ≡ 0 and ≡ 4
    * mod 8), each curated under the same frozen artifacts and committed
    * as a TAGGED version of a [[graft.plans.Snapshots]] store (day N =
    * version N+1 over the empty day-0 store). Every day's commit is
    * REDELIVERED in-gate and must come back as its committed version
    * (the store's durable tag ledger replacing [[graft.plans
    * .IncrementalDay.ingestDay]]'s marker files); the output is each
    * version's (split, lang) manifest read back AFTER all commits — v2
    * still aggregating to day-1-only content is the time-travel proof
    * the in-place delta export cannot give. The lifecycle additionally
    * maintains a STANDING [[graft.plans.DocIndex]] (`indexRoot`): the
    * gate REQUIRES the index to end at the corpus head and then runs a
    * doc_id-only takedown THROUGH it ([[graft.plans.DocIndex
    * .removeByIds]]) — required sidecar-only (no split data dir
    * written) with the exact post-takedown count, the proof that
    * index-speed GDPR removal rides the day lifecycle for free. The
    * takedown commits AFTER the manifests materialize, so the oracle
    * is unchanged. */
  def incrementalDayVersioned(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val root = java.nio.file.Files.createTempDirectory("graft_incr_day_ver")
    val idx = java.nio.file.Files.createTempDirectory("graft_incr_day_idx")
    try {
      val d = docs(s, dir)
      val standing = d.filter(pmod(col("doc_id"), lit(4)) =!= 0)
      val day1 = d.filter(pmod(col("doc_id"), lit(8)) === 0)
      val day2 = d.filter(pmod(col("doc_id"), lit(8)) === 4)
      val manifests = graft.plans.IncrementalDay.ingestDayVersioned(
        s, standing, Seq("day-1" -> day1, "day-2" -> day2),
        trainedProbeWeights(s, dir), ProbeGateMargin, splitColumnFor,
        root.toString, bloomBits = 1 << 16, bloomProbes = 4,
        indexRoot = Some(idx.toString))
      // the standing index ended the lifecycle at the corpus head …
      val head = graft.plans.Snapshots.latestVersion(s, root.toString)
      require(graft.plans.DocIndex.indexedVersion(s, idx.toString) == head,
        "the day lifecycle must leave the index at the corpus head")
      // … so a doc_id-only takedown is index-speed AND sidecar-only
      val before = graft.plans.Snapshots.readAt(s, root.toString, head)
      val victims = before.filter(pmod(col("doc_id"), lit(16)) === 0)
        .select(col("doc_id"))
      val nVictims = victims.count()
      val nBefore = before.count()
      val v = graft.plans.DocIndex.removeByIds(
        s, root.toString, idx.toString, victims)
      require(v == head + 1, s"takedown must commit one version, got v$v")
      val takedownData = Option(root.toFile.listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith(s"v$v-") &&
          !f.getName.endsWith("-dv"))
      require(takedownData.isEmpty,
        s"an indexed takedown must be sidecar-only: ${takedownData.map(_.getName)}")
      require(graft.plans.Snapshots.readAt(s, root.toString, v).count() ==
        nBefore - nVictims,
        "the takedown must remove exactly the resolved victims")
      manifests
    } finally {
      graft.plans.CorpusExport.deleteRecursively(root.toFile)
      graft.plans.CorpusExport.deleteRecursively(idx.toFile)
    }
  }

  /** Mirrors [[incrementalDayVersioned]]: the [[incrementalDaySql]]
    * curated CTEs (dedup is vs the STANDING corpus for both days, so the
    * two-day union equals the one-shot admit set), manifested twice —
    * v2 = day 1 only (doc_id ≡ 0 mod 8), v3 = both days (the cumulative
    * read of the latest version). */
  lazy val incrementalDayVersionedSql: String =
    s"""WITH fp AS (
       |  SELECT doc_id, ${fnvHugeSql("ck")} AS f1, ${fnvAltHugeSql("ck")} AS f2
       |  FROM (SELECT doc_id,
       |          array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS ck
       |        FROM documents)),
       |admitted AS (
       |  SELECT i.doc_id FROM fp i
       |  WHERE i.doc_id % 4 = 0 AND NOT EXISTS (
       |    SELECT 1 FROM fp c
       |    WHERE c.doc_id % 4 <> 0 AND c.f1 = i.f1 AND c.f2 = i.f2)),
       |$scoredRepCtes,
       |$probeTrainCtes,
       |$probeGateCtes,
       |curated AS (
       |  SELECT s.doc_id, s.lang, s.n_tokens FROM scored s
       |  JOIN rep USING (doc_id) JOIN admitted USING (doc_id)
       |  JOIN pok USING (doc_id)
       |  WHERE s.quality >= 0.5 AND s.lang_ok AND rep.rep_ok),
       |$splitAssignCtes
       |SELECT 'v2' AS version, sp.split, c.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens
       |FROM curated c JOIN sp ON sp.doc_id = c.doc_id
       |WHERE c.doc_id % 8 = 0
       |GROUP BY sp.split, c.lang
       |UNION ALL
       |SELECT 'v3' AS version, sp.split, c.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens
       |FROM curated c JOIN sp ON sp.doc_id = c.doc_id
       |GROUP BY sp.split, c.lang""".stripMargin

  /** ANN index DELETE lifecycle
    * ([[graft.operators.Similarity.tombstoneIvfIndex]] +
    * [[graft.operators.Similarity.compactIvfIndex]]): build the on-disk
    * index over the whole corpus, tombstone a planted subset (vec_id ≡ 3
    * mod 7 — the redaction batch a PII sweep produces), probe MASKED
    * (tombstones pending, anti-joined in-probe), compact (only the
    * affected cell partitions rewrite), probe again from the rewritten
    * files, and `require` the two probes identical — both delete phases
    * are load-bearing in the one gate. Hash-exact vs the oracle's
    * frozen-centroid replica with the deleted ids excluded: centroids
    * keep their full-corpus training (deletion must not re-shuffle
    * standing cells), only row membership changes. */
  def annDelete(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_delete")
    try {
      val e = embeddings(s, dir)
      val cents = Similarity.writeIvfIndex(e, "vec_id", "embedding",
        out.toString, nCells = 16, refineIters = IvfKmeansIters)
      Similarity.tombstoneIvfIndex(s, out.toString, "vec_id",
        e.filter(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id")))
      def probe() = Similarity.ivfTopKFromIndex(s, out.toString, cents,
        "vec_id", "embedding", queryVector(s, dir), k = 20, nprobe = 4)
      val masked = probe().collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val (deleted, cells) = Similarity.compactIvfIndex(s, out.toString, "vec_id")
      require(deleted > 0 && cells.nonEmpty,
        "planted delete subset must hit the index")
      val compacted = probe().graftCheckpoint()
      val after = compacted.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      require(masked == after,
        "tombstone-masked probe and post-compaction probe must be identical")
      compacted
    } finally graft.plans.CorpusExport.deleteRecursively(out.toFile)
  }

  /** Mirrors [[annDelete]]: the [[kmeansAssignCtes]] full-corpus replica
    * (frozen centroids — deletes don't retrain), deleted ids excluded
    * from the ranked rows only. */
  lazy val annDeleteSql: String = {
    val f = IvfKmeansIters
    s"""WITH $kmeansAssignCtes,
       |q AS (SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
       |probed AS (
       |  SELECT c.cell FROM cent$f c CROSS JOIN q
       |  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cell ASC LIMIT 4)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cosine
       |FROM embeddings e JOIN assign USING (vec_id) CROSS JOIN q
       |WHERE assign.cell IN (SELECT cell FROM probed)
       |  AND e.vec_id % 7 <> 3
       |ORDER BY cosine DESC, e.vec_id ASC LIMIT 20""".stripMargin
  }

  /** PCA-reduced ANN ([[embedPca]] composed with top-k): nearest 20
    * vectors to vec 0 by squared euclidean distance IN THE REDUCED SPACE —
    * the search an index built over projections serves. Because the
    * projections are exact doubles ([[embedPcaSql]]'s replay), the
    * distances — fixed-order two-term sums — are too, so the whole
    * composition is hash-exact, not a recall bound. The query projection
    * is a 1-row driver fetch (the accepted single-query-ANN shape; the
    * batch shape is [[annBatch]]'s). */
  def simTopKPca(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val (m, comps) = graft.operators.Pca.components(
      e, "embedding", PcaDim, PcaNComp, PcaIters)
    val proj = graft.operators.Pca.project(e, "vec_id", "embedding", m, comps)
    val q = proj.orderBy(col("vec_id").asc).limit(1).head()
    val (q1, q2) = (q.getDouble(1), q.getDouble(2))
    proj.select(col("vec_id"),
        (((col("p1") - lit(q1)) * (col("p1") - lit(q1))) +
          ((col("p2") - lit(q2)) * (col("p2") - lit(q2)))).as("dist2"))
      .orderBy(col("dist2").asc, col("vec_id").asc)
      .limit(20)
  }

  /** The PRODUCTION shape of [[simTopKPca]]: train → persist the (mean,
    * components) artifact ([[graft.operators.Pca.saveComponents]]) →
    * LOAD it back → project + search from the loaded copy — the
    * train-once / serve-many split a deployed reduced-space index runs
    * (the gate's training exists only to produce the artifact; the
    * search touches nothing but the loaded doubles). Parquet round-trips
    * doubles bit-exactly, so this gate shares [[simTopKPcaSql]]'s
    * training-replay oracle verbatim — a byte of artifact drift would
    * hash-mismatch.
    *
    * BENCH SHAPE: the recorded gate time covers training + artifact
    * round-trip + serve, because the gate must CREATE the fixture it
    * loads (7 fixed PCA jobs dominate, ~2s of the gate's wall time);
    * the serve path alone — load + project + top-k — is what a deployed
    * process pays per query, and it is the tail of this gate after the
    * `loadComponents` call. Read the bench number as artifact-lifecycle
    * cost, not query latency. */
  def simTopKPcaLoad(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_pca_artifact")
    try {
      val e = embeddings(s, dir)
      val (m0, c0) = graft.operators.Pca.components(
        e, "embedding", PcaDim, PcaNComp, PcaIters)
      graft.operators.Pca.saveComponents(s, out.toString, m0, c0)
      val (m, comps) = graft.operators.Pca.loadComponents(s, out.toString)
      val proj = graft.operators.Pca.project(e, "vec_id", "embedding", m, comps)
      val q = proj.orderBy(col("vec_id").asc).limit(1).head()
      val (q1, q2) = (q.getDouble(1), q.getDouble(2))
      proj.select(col("vec_id"),
          (((col("p1") - lit(q1)) * (col("p1") - lit(q1))) +
            ((col("p2") - lit(q2)) * (col("p2") - lit(q2)))).as("dist2"))
        .orderBy(col("dist2").asc, col("vec_id").asc)
        .limit(20)
        .graftCheckpoint()
    } finally graft.plans.CorpusExport.deleteRecursively(out.toFile)
  }

  /** Per-JVM artifact cache backing the SERVE-ONLY gates: key → saved
    * artifact directory, built at most once per process
    * (`computeIfAbsent`). The lifecycle gates above deliberately pay
    * train+save+load+serve every invocation; these caches exist so the
    * serve lane can time what a deployed process pays per query. The
    * artifact dirs live for the JVM (bench/verify processes are
    * short-lived); artifacts are deterministic, so cache hits serve
    * byte-identical doubles. A JVM shutdown hook sweeps the cached dirs
    * so repeated bench/verify processes don't strand artifact trees in
    * the system temp dir. */
  private[queries] val artifactCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      artifactCache.values().forEach { d =>
        try graft.plans.CorpusExport.deleteRecursively(new java.io.File(d))
        catch { case _: Exception => () } // exit path: best-effort only
      }
    }, "graft-artifact-cache-sweeper"))
  }

  /** SERVE lane of [[simTopKPcaLoad]] (the round-8 bench split): the
    * PCA artifact is built once per JVM — a bench warm-up or a verify
    * first call pays it — and every subsequent invocation times ONLY
    * load + project + top-k, the deployed serving cost. Shares
    * [[simTopKPcaSql]]'s training-replay oracle verbatim: the cached
    * artifact is the same deterministic parquet the lifecycle gate
    * writes, and parquet round-trips doubles bit-exactly. */
  def simTopKPcaServe(s: SparkSession, dir: String): DataFrame = {
    val art = artifactCache.computeIfAbsent("pca:" + dir, _ => {
      val out = java.nio.file.Files.createTempDirectory("graft_pca_serve")
      try {
        val (m0, c0) = graft.operators.Pca.components(
          embeddings(s, dir), "embedding", PcaDim, PcaNComp, PcaIters)
        graft.operators.Pca.saveComponents(s, out.toString, m0, c0)
      } catch { case e: Throwable =>
        // a failed build must not leak a half-written artifact dir — the
        // exception propagates uncached, so a retry rebuilds from scratch
        graft.plans.CorpusExport.deleteRecursively(out.toFile); throw e
      }
      out.toString
    })
    val (m, comps) = graft.operators.Pca.loadComponents(s, art)
    val proj = graft.operators.Pca.project(
      embeddings(s, dir), "vec_id", "embedding", m, comps)
    val q = proj.orderBy(col("vec_id").asc).limit(1).head()
    val (q1, q2) = (q.getDouble(1), q.getDouble(2))
    proj.select(col("vec_id"),
        (((col("p1") - lit(q1)) * (col("p1") - lit(q1))) +
          ((col("p2") - lit(q2)) * (col("p2") - lit(q2)))).as("dist2"))
      .orderBy(col("dist2").asc, col("vec_id").asc)
      .limit(20)
      .graftCheckpoint()
  }

  /** Mirrors [[simTopKPca]]: the full PCA replay as a subquery, the
    * vec-0 projection re-derived in SQL (bit-equal to the collected
    * literals), the same fixed-order distance. */
  lazy val simTopKPcaSql: String =
    s"""WITH pca AS (
       |$embedPcaSql
       |),
       |q AS (SELECT p1 AS q1, p2 AS q2 FROM pca ORDER BY vec_id LIMIT 1)
       |SELECT vec_id,
       |  ((pca.p1 - q.q1) * (pca.p1 - q.q1)) + ((pca.p2 - q.q2) * (pca.p2 - q.q2)) AS dist2
       |FROM pca CROSS JOIN q
       |ORDER BY dist2 ASC, vec_id ASC LIMIT 20""".stripMargin

  // BPE-gate hyperparameters — shared by the query and its oracle twin
  private[queries] val BpeRounds = 8

  /** BPE merge training ([[graft.operators.Bpe.trainMerges]]): 8 rounds of
    * most-frequent-adjacent-pair merging over the word-frequency vocab.
    * Output is the trained merge table — all integers and ASCII strings,
    * hash-exact by construction. */
  def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    val (table, vocab) = graft.operators.Bpe.trainMerges(
      s, docs(s, dir), "text", BpeRounds)
    graft.operators.Bpe.freeVocab(vocab)
    table
  }

  /** Mirrors [[bpeTrain]] with the merge rounds UNROLLED: per round, the
    * pair argmax (count DESC, lhs ASC, rhs ASC — bytewise on ASCII, same
    * order both engines) and the greedy non-overlapping merge replayed via
    * gaps-and-islands windows (taken = odd rank within a consecutive-match
    * island ≡ the operator's left-to-right fold; a position following a
    * taken one is absorbed). The oracle presumes each round finds a pair —
    * true for any natural-language corpus at 8 rounds (the operator stops
    * early on exhaustion; a degenerate corpus would need fewer rounds). */
  lazy val bpeTrainSql: String = {
    val out = (0 until BpeRounds)
      .map(t => s"SELECT ${t + 1} AS round, l AS lhs, r AS rhs, cnt AS pair_count FROM top$t")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeCtes
       |SELECT CAST(round AS INT) AS round, lhs, rhs, pair_count FROM ($out)""".stripMargin
  }

  /** BPE tokenization with the trained vocab
    * ([[graft.operators.Bpe.tokenize]]): every (doc, word position) maps
    * to its merged symbol sequence via the broadcast vocab — the trained
    * artifact applied to the corpus, one scan, no per-round re-fold.
    * Output is one row per (doc, word_pos, sym_pos, token) — all
    * integers/strings, hash-exact. */
  def bpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val (_, vocab) = graft.operators.Bpe.trainMerges(
      s, docs(s, dir), "text", BpeRounds)
    val out = graft.operators.Bpe.tokenize(docs(s, dir), "doc_id", "text", vocab)
      .graftCheckpoint()
    graft.operators.Bpe.freeVocab(vocab)
    out
  }

  /** The serve path of [[bpeTokenize]]: train, PERSIST the vocabulary
    * artifact ([[graft.operators.Bpe.saveVocab]]), then tokenize with the
    * LOADED artifact — the production shape, where tokenization jobs read
    * an O(vocab) parquet instead of replaying the merge rounds. Shares
    * [[bpeTokenizeSql]]: strings/longs round-trip parquet bit-exactly, so
    * load + tokenize ≡ train + tokenize. */
  def bpeTokenizeLoad(s: SparkSession, dir: String): DataFrame = {
    val (_, vocab) = graft.operators.Bpe.trainMerges(
      s, docs(s, dir), "text", BpeRounds)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_vocab")
    try {
      graft.operators.Bpe.saveVocab(vocab, tmp.toString)
      graft.operators.Bpe.freeVocab(vocab)
      val loaded = graft.operators.Bpe.loadVocab(s, tmp.toString)
      graft.operators.Bpe.tokenize(docs(s, dir), "doc_id", "text", loaded)
        .graftCheckpoint()
    } finally graft.plans.CorpusExport.deleteRecursively(tmp.toFile)
  }

  /** SERVE lane of [[bpeTokenizeLoad]] (the round-8 bench split): the
    * merge-table artifact is trained and saved once per JVM via
    * [[artifactCache]]; each invocation times ONLY vocab load +
    * tokenize — the deployed tokenizer-serving cost. Shares
    * [[bpeTokenizeSql]]'s oracle verbatim (deterministic artifact). */
  def bpeTokenizeServe(s: SparkSession, dir: String): DataFrame = {
    val art = artifactCache.computeIfAbsent("bpe:" + dir, _ => {
      val (_, vocab) = graft.operators.Bpe.trainMerges(
        s, docs(s, dir), "text", BpeRounds)
      val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_serve")
      try {
        graft.operators.Bpe.saveVocab(vocab, tmp.toString)
        graft.operators.Bpe.freeVocab(vocab)
      } catch { case e: Throwable =>
        graft.plans.CorpusExport.deleteRecursively(tmp.toFile); throw e
      }
      tmp.toString
    })
    val loaded = graft.operators.Bpe.loadVocab(s, art)
    graft.operators.Bpe.tokenize(docs(s, dir), "doc_id", "text", loaded)
      .graftCheckpoint()
  }

  /** Mirrors [[bpeTokenize]]: the shared [[bpeCtes]] replay to the final
    * vocab, then word positions (pre-filter positions, empties dropped
    * after — ≡ posexplode-then-filter) joined to the merged symbol
    * sequences. */
  lazy val bpeTokenizeSql: String =
    s"""WITH $bpeCtes,
       |base AS (
       |  SELECT doc_id, u.p AS word_pos, u.w AS word FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(ws) + 1), i -> {p: i - 1, w: ws[i]})) AS u
       |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
       |  WHERE len(u.w) > 0),
       |tok AS (
       |  SELECT b.doc_id, b.word_pos,
       |    unnest(list_transform(range(1, len(v.syms) + 1), i -> {p: i - 1, s: v.syms[i]})) AS u2
       |  FROM base b JOIN v$BpeRounds v USING (word))
       |SELECT doc_id, CAST(word_pos AS INT) AS word_pos,
       |  CAST(u2.p AS INT) AS sym_pos, u2.s AS token
       |FROM tok""".stripMargin

  /** The BPE training CTE chain — word-frequency vocab `w`, char-split
    * `v0`, and [[BpeRounds]] unrolled merge rounds ending in
    * `v$BpeRounds(word, f, syms)` + per-round `top$t(l, r, cnt)` — shared
    * by the merge-table gate and the tokenization gate. */
  private[queries] lazy val bpeCtes: String = {
    def round(t: Int): String =
      s"""pr$t AS (
         |  SELECT f, syms, unnest(range(1, len(syms))) AS i FROM v$t),
         |pc$t AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(SUM(f) AS BIGINT) AS cnt
         |  FROM pr$t GROUP BY 1, 2),
         |top$t AS MATERIALIZED (SELECT l, r, cnt FROM pc$t ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |ps$t AS (
         |  SELECT v.word, unnest(range(1, len(v.syms))) AS i, v.syms AS syms
         |  FROM v$t v),
         |mt$t AS (
         |  SELECT p.word, p.i FROM ps$t p CROSS JOIN top$t
         |  WHERE p.syms[p.i] = top$t.l AND p.syms[p.i + 1] = top$t.r),
         |isl$t AS (
         |  SELECT word, i, i - row_number() OVER (PARTITION BY word ORDER BY i) AS g
         |  FROM mt$t),
         |tk$t AS (
         |  SELECT word, i FROM (
         |    SELECT word, i, row_number() OVER (PARTITION BY word, g ORDER BY i) AS rn
         |    FROM isl$t)
         |  WHERE rn % 2 = 1),
         |ap$t AS (
         |  SELECT word, f, syms, unnest(range(1, len(syms) + 1)) AS i FROM v$t),
         |v${t + 1} AS MATERIALIZED (
         |  SELECT word, f, list(s ORDER BY i) AS syms FROM (
         |    SELECT a.word, a.f, a.i,
         |      CASE WHEN t1.i IS NOT NULL THEN top$t.l || top$t.r ELSE a.syms[a.i] END AS s
         |    FROM ap$t a CROSS JOIN top$t
         |    LEFT JOIN tk$t t1 ON t1.word = a.word AND t1.i = a.i
         |    LEFT JOIN tk$t t2 ON t2.word = a.word AND t2.i = a.i - 1
         |    WHERE t2.i IS NULL)
         |  GROUP BY word, f)""".stripMargin
    val rounds = (0 until BpeRounds).map(round).mkString(",\n")
    s"""w AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) > 0 GROUP BY word),
       |v0 AS MATERIALIZED (SELECT word, f, string_split(word, '') AS syms FROM w),
       |$rounds""".stripMargin
  }

  // PCA-gate hyperparameters — shared by the query and its oracle twin
  private[queries] val PcaDim = 64
  private[queries] val PcaIters = 3
  private[queries] val PcaNComp = 2

  /** Deterministic power-iteration PCA over the embeddings
    * ([[graft.operators.Pca.components]]): quantized-integer matrix
    * applications make the components bit-reproducible on any
    * partitioning, so the oracle replays the whole training — mean,
    * every power round, deflation — and the gate emits every vector's
    * EXACT projection onto the top two components. */
  def embedPca(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val (m, comps) = graft.operators.Pca.components(
      e, "embedding", PcaDim, PcaNComp, PcaIters)
    graft.operators.Pca.project(e, "vec_id", "embedding", m, comps)
  }

  /** Mirrors [[embedPca]] with mean, power rounds, and deflation all
    * UNROLLED in CTEs (the probe-GD replay pattern): identical quantized
    * floor-sums, identical fixed-order folds, IEEE sqrt/divide — the
    * projections compare as exact doubles. */
  lazy val embedPcaSql: String = {
    val q = graft.operators.Pca.Quanta // renders 1.0E9, a DOUBLE literal
    val dims = 0 until PcaDim
    // centered coordinates: z[j+1] = CAST(embedding[j+1] AS DOUBLE) - m_j
    val xcList = dims.map(j =>
      s"CAST(e.embedding[${j + 1}] AS DOUBLE) - m.m$j").mkString("[", ", ", "]")
    // fixed-order left fold of z against a (prefix, j)-named weight row
    def dotSql(vOf: Int => String): String =
      dims.map(j => s"z[${j + 1}] * ${vOf(j)}").mkString(" + ")
    val seed = 1.0 / math.sqrt(PcaDim.toDouble) // 0.125 — exact literal
    // one power round for component `p` over its deflated base `base`
    def round(p: Int, t: Int, base: String): String = {
      val dot = if (t == 0) dotSql(_ => seed.toString)
      else dotSql(j => s"c${p}v$t.v$j")
      val from = if (t == 0) base else s"$base CROSS JOIN c${p}v$t"
      val us = dims.map(j =>
        s"SUM(CAST(floor(dt * z[${j + 1}] * $q) AS BIGINT)) AS u$j").mkString(",\n    ")
      val sq = dims.map(j => s"(CAST(u$j AS DOUBLE) * CAST(u$j AS DOUBLE))")
        .mkString(" + ")
      val vs = dims.map(j => s"CAST(u$j AS DOUBLE) / no AS v$j").mkString(",\n    ")
      s"""c${p}d$t AS (SELECT z, ($dot) AS dt FROM $from),
         |c${p}u$t AS (SELECT $us FROM c${p}d$t),
         |c${p}n$t AS (SELECT *, sqrt($sq) AS no FROM c${p}u$t),
         |c${p}v${t + 1} AS (SELECT $vs FROM c${p}n$t)""".stripMargin
    }
    def rounds(p: Int, base: String): String =
      (0 until PcaIters).map(t => round(p, t, base)).mkString(",\n")
    // deflation base for component 2: z ← z − (z·c1)·c1, the scalar d
    // aliased once (the operator's projection-pair shape)
    val deflList = dims.map(j => s"z[${j + 1}] - d * v$j").mkString("[", ", ", "]")
    val meanSums = dims.map(j =>
      s"SUM(CAST(floor(CAST(embedding[${j + 1}] AS DOUBLE) * $q) AS BIGINT)) AS s$j")
      .mkString(",\n    ")
    val means = dims.map(j =>
      s"CAST(s$j AS DOUBLE) / CAST(n AS DOUBLE) / $q AS m$j").mkString(",\n    ")
    def projSql(p: Int): String =
      dims.map(j => s"xc.z[${j + 1}] * c${p}v$PcaIters.v$j").mkString(" + ")
    s"""WITH ms AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, $meanSums FROM embeddings),
       |m AS (SELECT $means FROM ms),
       |xc AS (SELECT e.vec_id, $xcList AS z FROM embeddings e CROSS JOIN m),
       |${rounds(1, "xc")},
       |c2p AS (
       |  SELECT z, (${dotSql(j => s"c1v$PcaIters.v$j")}) AS d,
       |    ${dims.map(j => s"c1v$PcaIters.v$j AS v$j").mkString(", ")}
       |  FROM xc CROSS JOIN c1v$PcaIters),
       |c2b AS (SELECT $deflList AS z FROM c2p),
       |${rounds(2, "c2b")}
       |SELECT xc.vec_id, (${projSql(1)}) AS p1, (${projSql(2)}) AS p2
       |FROM xc CROSS JOIN c1v$PcaIters CROSS JOIN c2v$PcaIters""".stripMargin
  }

  /** The quality-score formula as a SQL expression over `documents` rows
    * (the [[GraftFunctions.qualityScore]] twin used inline by
    * [[textStatsSql]]/[[scoredRepCtes]]). */
  private[queries] lazy val qualityExprSql: String = {
    val allMarkers = GraftFunctions.langMarkers.flatMap(_._2)
    s"""0.5 * (CAST(len(list_distinct($tsSql)) AS DOUBLE) / CAST(len($tsSql) AS DOUBLE))
       |    + 0.3 * least(1.0, CAST(len($tsSql) AS DOUBLE) / 64.0)
       |    + 0.2 * (1.0 - CAST(${hitsSql(allMarkers)} AS DOUBLE) / CAST(len($tsSql) AS DOUBLE))"""
      .stripMargin.replace("\n", " ")
  }

  /** Cosine threshold for the semantic-dedup gate — chosen against the
    * fixture embedding distribution (near-orthogonal synthetic vectors:
    * cross-pair cosines top out ≈ 0.51), so the drop set is non-trivial at
    * every SF. */
  private[queries] val SemDedupTau = 0.38

  /** SemDeDup semantic dedup gate
    * ([[graft.operators.Similarity.semanticDedupDrops]]): k-means cells
    * from the SAME refined centroids as the IVF gate, within-cell
    * witnesses at cosine ≥ τ, minimum-id keep rule. Output is the drop
    * list with its evidence (witness id + exact cosine). */
  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = embeddings(s, dir)
    Similarity.semanticDedupDrops(e, "vec_id", "embedding",
      Similarity.kmeansCentroids(e, "vec_id", "embedding",
        nCells = 16, iters = IvfKmeansIters),
      tau = SemDedupTau)
  }

  /** Mirrors [[semanticDedup]] on the shared k-means CTEs: same
    * assignment, same within-cell pair generation, same sequential-fold
    * cosine, same min-witness window. */
  lazy val semanticDedupSql: String =
    s"""WITH $kmeansAssignCtes,
       |pairs0 AS (
       |  SELECT a.vec_id, a.cell, b.vec_id AS kept_by,
       |    ${cosSql("ea.embedding", "eb.embedding")} AS cosine
       |  FROM assign a JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |pairs AS (SELECT * FROM pairs0 WHERE cosine >= $SemDedupTau)
       |SELECT vec_id, CAST(cell AS INT) AS cell, kept_by, cosine
       |FROM (
       |  SELECT vec_id, cell, kept_by, cosine,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY kept_by ASC) AS rn
       |  FROM pairs)
       |WHERE rn = 1""".stripMargin

  /** Shared CTE body mirroring [[graft.operators.Dedup.embeddingNearDupPairs]]
    * with the SAME hyperplanes embedded as double literals (generated by the
    * identical [[graft.operators.Similarity.planes]] call, exact
    * shortest-repr round-trip): yields `scored(id_a, id_b, cosine)` — every
    * LSH-candidate pair (a < b) with its exact cosine. */
  private[queries] def lshScoredCte(planesPerTable: Int, tables: Int): String = {
    val all = Similarity.planes(planesPerTable * tables, 64, 42L)
    val values = all.zipWithIndex.map { case (pv, i) =>
      val t = i / planesPerTable; val p = i % planesPerTable
      s"($t, $p, [${pv.map(_.toDouble.toString).mkString(",")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""planes(tbl, p, pv) AS (VALUES
       |    $values),
       |dots AS (
       |  SELECT e.vec_id, pl.tbl, pl.p,
       |    list_sum(list_transform(range(1, least(len(e.embedding), len(pl.pv))+1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * pl.pv[i])) AS d
       |  FROM embeddings e CROSS JOIN planes pl),
       |buck AS (
       |  SELECT vec_id, tbl,
       |    SUM(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS bucket
       |  FROM dots GROUP BY vec_id, tbl),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM buck a JOIN buck b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT p.id_a, p.id_b, ${cosSql("va.embedding", "vb.embedding")} AS cosine
       |  FROM pairs p
       |  JOIN embeddings va ON va.vec_id = p.id_a
       |  JOIN embeddings vb ON vb.vec_id = p.id_b)""".stripMargin
  }

  val embedNearDupSql: String =
    s"""WITH ${lshScoredCte(8, 4)}
       |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= -1.0
       |ORDER BY cosine DESC, id_a ASC, id_b ASC LIMIT 50""".stripMargin

  /** Mirrors [[knnJoin]]: the same candidate CTE, symmetrized, ranked per
    * row by (cosine DESC, neighbor ASC). The `cosine >= -1.0` predicate
    * mirrors the operator exactly ([[Similarity.lshKnnJoin]] calls
    * `embeddingNearDupPairs` with threshold = -1.0): a NaN cosine or a
    * rounding one ulp below -1 is dropped by BOTH engines, never just one. */
  val knnJoinSql: String =
    s"""WITH ${lshScoredCte(8, 4)},
       |sym AS (
       |  SELECT id_a AS vec_id, id_b AS neighbor_id, cosine FROM scored WHERE cosine >= -1.0
       |  UNION ALL
       |  SELECT id_b AS vec_id, id_a AS neighbor_id, cosine FROM scored WHERE cosine >= -1.0),
       |ranked AS (
       |  SELECT vec_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM sym)
       |SELECT vec_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= 5""".stripMargin

  /** Batch kNN join over the embeddings table: each vector's 5 nearest
    * LSH-candidate neighbors ([[Similarity.lshKnnJoin]]). */
  def knnJoin(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Similarity.lshKnnJoin(embeddings(s, dir), "vec_id", "embedding",
      dim = 64, k = 5, planesPerTable = 8, tables = 4)
  }

  // word-3-shingles of a single-space-tokenized text, as DuckDB SQL
  // (mirrors GraftFunctions.wordShingles semantics incl. the <k degenerate case)
  private[queries] val shingleSql: String =
    """CASE WHEN len(string_split(text,' ')) < 3 THEN [text]
      |     ELSE list_transform(range(1, len(string_split(text,' ')) - 1),
      |            i -> concat(string_split(text,' ')[i], ' ', string_split(text,' ')[i+1], ' ', string_split(text,' ')[i+2]))
      |END""".stripMargin

  /** Mirrors [[graft.operators.Dedup.simhashPairs]] end to end: FNV-1a bit
    * voting per token, pigeonhole banding on the 16-bit chunks, bucket cap,
    * hamming ≤ 3 — every step is integer arithmetic, so the replica is
    * bit-exact. */
  val dedupSimhashSql: String = {
    val votes = (0 until 64).map { b =>
      s"SUM(CASE WHEN (h // CAST(${BigInt(1) << b} AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS c$b"
    }.mkString(",\n    ")
    val assemble = (0 until 64).map { b =>
      s"(CASE WHEN c$b > 0 THEN CAST(${BigInt(1) << b} AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)"
    }.mkString(" + ")
    val chunkSelects = (0 until 4).map { c =>
      s"  SELECT doc_id, sig, $c AS chunk, CAST((hu // CAST(${BigInt(1) << (16 * c)} AS HUGEINT)) % 65536 AS INT) AS key FROM sigs"
    }.mkString("\n  UNION ALL\n")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |th AS (SELECT doc_id, ${fnvHugeSql("t")} AS h FROM tok),
       |votes AS (SELECT doc_id, $votes FROM th GROUP BY doc_id),
       |asm AS (SELECT doc_id, $assemble AS hu FROM votes),
       |sigs AS (SELECT doc_id, ${hugeToSignedSql("hu")} AS sig, hu FROM asm),
       |chunked AS (
       |$chunkSelects
       |),
       |bsz AS (SELECT chunk, key, COUNT(*) AS n FROM chunked GROUP BY chunk, key),
       |coll AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.chunk, a.key,
       |    bit_count(xor(a.sig, b.sig)) AS hamming
       |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id),
       |firstc AS (
       |  SELECT id_a, id_b, chunk, key, hamming,
       |    row_number() OVER (PARTITION BY id_a, id_b ORDER BY chunk) AS rn
       |  FROM coll)
       |SELECT f.id_a, f.id_b, CAST(f.hamming AS INT) AS hamming
       |FROM firstc f JOIN bsz ON bsz.chunk = f.chunk AND bsz.key = f.key
       |WHERE f.rn = 1 AND bsz.n <= 1000 AND f.hamming <= 3""".stripMargin
  }

  /** Mirrors [[graft.operators.Dedup.minhashPairs]] end to end: the
    * universal-hash coefficients come from the SAME
    * [[graft.functions.TextHash.minhashCoeffs]] call and are embedded as
    * literals; banding groups on the raw signature slices (as the operator
    * does), so candidates — and therefore the exact-jaccard output — are
    * engine-identical. */
  /** Shared MinHash signature/banding CTEs (`sh` → `hm` → `sig` →
    * `banded(doc_id, band, bucket)`) — the DuckDB replica of the fused
    * `MinHashSig` + band-slice pipeline, used by the pair gate AND the
    * incremental near-dup gate so both bind the same signature math. */
  private[queries] lazy val minhashBandedCtes: String = {
    val (a, b) = graft.functions.TextHash.minhashCoeffs(48, 42L)
    val mins = (0 until 48).map { i =>
      s"MIN((${a(i)} * hm + ${b(i)}) % 2147483647) AS s$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until 16).map { bd =>
      s"  SELECT doc_id, $bd AS band, [s${bd * 3}, s${bd * 3 + 1}, s${bd * 3 + 2}] AS bucket FROM sig"
    }.mkString("\n  UNION ALL\n")
    s"""sh AS (
       |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS s FROM documents),
       |hm AS (
       |  SELECT doc_id, CAST((${fnvHugeSql("s")} % CAST(9223372036854775808 AS HUGEINT)) % 2147483647 AS BIGINT) AS hm
       |  FROM sh),
       |sig AS (SELECT doc_id, $mins FROM hm GROUP BY doc_id),
       |banded AS (
       |$bandSelects
       |)""".stripMargin
  }

  lazy val dedupMinhashSql: String = {
    val jac = "CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE) / " +
      "(CAST(len(ta.sh) + len(tb.sh) AS DOUBLE) - CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE))"
    s"""WITH $minhashBandedCtes,
       |bsz AS (SELECT band, bucket, COUNT(*) AS n FROM banded GROUP BY band, bucket),
       |coll AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.band, a.bucket
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |firstb AS (
       |  SELECT id_a, id_b, band, bucket,
       |    row_number() OVER (PARTITION BY id_a, id_b ORDER BY band) AS rn
       |  FROM coll),
       |cand AS (
       |  SELECT f.id_a, f.id_b
       |  FROM firstb f JOIN bsz ON bsz.band = f.band AND bsz.bucket = f.bucket
       |  WHERE f.rn = 1 AND bsz.n <= 1000),
       |toks AS (SELECT doc_id, list_distinct($shingleSql) AS sh FROM documents)
       |SELECT c.id_a, c.id_b, $jac AS jaccard
       |FROM cand c JOIN toks ta ON ta.doc_id = c.id_a JOIN toks tb ON tb.doc_id = c.id_b
       |WHERE $jac >= 0.8""".stripMargin
  }

  /** Shared hashed-tf-vector CTEs (`normed(doc_id, vec)` — the
    * [[graft.operators.TfIdf.hashedVectors]] replica: FNV bucket, unsigned
    * mod 64 ≡ the kernel's signed-mod-then-fix for a power-of-two dim;
    * dense 64-bucket counts in bucket order; L2 normalization rounded to
    * float32). Used by the doc-vector-search gate (which adds the cosine
    * fold) and the linear-probe trainer's oracle. */
  private[queries] lazy val hashedVectorCtes: String =
    s"""tb AS (
       |  SELECT doc_id, CAST(${fnvHugeSql("t")} % 64 AS INT) AS bucket
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
       |cnt AS (SELECT doc_id, bucket, CAST(COUNT(*) AS DOUBLE) AS c FROM tb GROUP BY doc_id, bucket),
       |dense AS (
       |  SELECT d.doc_id, b.b AS bucket, COALESCE(cnt.c, 0.0) AS c
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
       |  LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.bucket = b.b),
       |raw AS (SELECT doc_id, list(c ORDER BY bucket) AS rv FROM dense GROUP BY doc_id),
       |normed AS (
       |  SELECT doc_id,
       |    CASE WHEN s > 0 THEN list_transform(rv, x -> CAST(x / s AS FLOAT))
       |         ELSE list_transform(rv, x -> CAST(x AS FLOAT)) END AS vec
       |  FROM (SELECT doc_id, rv, sqrt(list_sum(list_transform(rv, y -> y*y))) AS s FROM raw))""".stripMargin

  lazy val docVectorSearchSql: String =
    s"""WITH $hashedVectorCtes,
       |q AS (SELECT vec AS qv FROM normed ORDER BY doc_id LIMIT 1)
       |SELECT n.doc_id, ${cosSql("n.vec", "q.qv")} AS cosine
       |FROM normed n CROSS JOIN q
       |ORDER BY cosine DESC, n.doc_id ASC LIMIT 20""".stripMargin

  /** Link-graph authority ([[graft.operators.Graph.pageRank]]) over the
    * events click-graph: per-user consecutive transitions on the `props.k`
    * item form the edges, five exact integer power-iteration rounds rank
    * the items — the CommonCrawl-style domain-authority signal, gated
    * hash-exact because every round is integer floor-division arithmetic
    * (the probe/k-means reproducibility discipline). */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val edges = graft.operators.Graph.transitionEdges(
      ev, "user_id", "ts", "event_id",
      get_json_object(col("props"), "$.k").cast("long"))
    graft.operators.Graph.pageRank(edges, "src", "dst", "w", iters = 5)
      .select(col("node").as("item"), col("rank_q"), col("rank_frac"))
  }

  /** Multi-source BFS over the item-transition graph: minimum hop
    * distance (≤ 4) from the seed set {nodes ≡ 0 mod 17} — the
    * reachability/traversal query Spark has no recursive-CTE surface for,
    * expressed as a fixed-depth frontier loop
    * ([[graft.operators.Graph.bfsDistances]]) and oracled against DuckDB's
    * actual WITH RECURSIVE. */
  def graphBfs(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    // null-free edge list BEFORE seed derivation: the node universe must
    // match the oracle's (whose edges CTE drops null-dst rows), or a node
    // whose only edge points at null would seed Spark-side but not there
    val edges = graft.operators.Graph.transitionEdges(
      ev, "user_id", "ts", "event_id",
      get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val seeds = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
      .filter(pmod(col("node"), lit(17)) === 0)
    graft.operators.Graph.bfsDistances(edges, "src", "dst", seeds, "node", maxDepth = 4)
      .select(col("node").as("item"), col("dist"))
  }

  /** Recursive-CTE twin of [[graphBfs]]: same edge derivation as the
    * PageRank oracle, then DuckDB's native WITH RECURSIVE with MIN(dist)
    * — frontier-BFS first-discovery equals the recursive minimum. */
  val graphBfsSql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      |  FROM events),
      |tr AS (
      |  SELECT item,
      |         lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
      |  FROM ev),
      |edges AS (SELECT src, item AS dst FROM tr
      |          WHERE src IS NOT NULL AND item IS NOT NULL GROUP BY 1, 2),
      |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |seeds AS (SELECT node FROM nodes WHERE ((node % 17) + 17) % 17 = 0),
      |r AS (
      |  SELECT node, 0 AS dist FROM seeds
      |  UNION
      |  SELECT e.dst AS node, r.dist + 1 AS dist
      |  FROM r JOIN edges e ON e.src = r.node
      |  WHERE r.dist < 4)
      |SELECT node AS item, CAST(MIN(dist) AS BIGINT) AS dist
      |FROM r GROUP BY node""".stripMargin

  /** Oracle: the five integer rounds unrolled as CTEs — share, contrib,
    * dangling split, and the damping blend all in BIGINT floor-division
    * (`//`, ≡ Spark's `div` for the non-negative values here), so every
    * round is bit-identical to the operator on any engine. */
  lazy val graphPagerankSql: String = {
    val S = graft.operators.Graph.RankScale
    val iters = 5
    val rounds = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst AS node, SUM((r.r * e.w) // o.ow) AS contrib
         |  FROM edges e JOIN $p r ON e.src = r.node JOIN outw o ON e.src = o.src
         |  GROUP BY 1),
         |d$i AS (
         |  SELECT COALESCE(
         |      (SELECT SUM(r) FROM $p WHERE node NOT IN (SELECT src FROM outw)), 0)
         |    // (SELECT n FROM nn) AS deach),
         |r$i AS (
         |  SELECT n.node,
         |    ($S - (85 * $S) // 100) // nn.n
         |      + (85 * (COALESCE(c.contrib, 0) + d.deach)) // 100 AS r
         |  FROM nodes n CROSS JOIN nn CROSS JOIN d$i d
         |  LEFT JOIN c$i c ON n.node = c.node)"""
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
       |  FROM events),
       |tr AS (
       |  SELECT item,
       |         lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
       |  FROM ev),
       |edges AS (SELECT src, item AS dst, COUNT(*) AS w FROM tr
       |          WHERE src IS NOT NULL GROUP BY 1, 2),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT node, $S // n AS r FROM nodes, nn),
       |$rounds
       |SELECT node AS item, CAST(r AS BIGINT) AS rank_q,
       |       CAST(r AS DOUBLE) / $S.0 AS rank_frac
       |FROM r$iters""".stripMargin
  }
}
