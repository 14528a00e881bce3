package graft.operators

import graft.core.Checkpoint.Ops
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Deduplication operators for large-scale corpus pipelines (north-star ops,
  * SURVEY §2.3). All are pure `DataFrame => DataFrame` transformations:
  * no driver-side collects, shuffle keyed on content hashes/buckets, so the
  * same code runs at 100 TB — candidate generation is O(n·bands) via
  * LSH banding instead of O(n²) pair enumeration.
  */
object Dedup {

  /** Apply the degenerate-bucket cap. With an accumulator the filter runs
    * through a tiny UDF — acceptable here because it sees one row per
    * BUCKET (post-aggregation), not per document — making the number of
    * dropped buckets observable; the recall loss from the cap is otherwise
    * silent. Without an accumulator the filter stays pure codegen.
    *
    * Accumulator caveat (standard Spark semantics for transformations):
    * the count is exact for a single action over the returned plan, but
    * re-executions — a second action without caching, stage retries,
    * speculative tasks — add again. Treat it as "were buckets dropped, and
    * roughly how many", not an exactly-once metric. */
  private def capBuckets(
      buckets: DataFrame, idsCol: String, maxBucketSize: Int,
      dropped: Option[LongAccumulator]): DataFrame = dropped match {
    case None => buckets.filter(size(col(idsCol)) <= maxBucketSize)
    case Some(acc) =>
      val keep = udf { n: Int =>
        if (n > maxBucketSize) { acc.add(1L); false } else true
      }
      buckets.filter(keep(size(col(idsCol))))
  }

  /** Exact dedup on a key expression: keeps the smallest id per group
    * (deterministic, unlike dropDuplicates' arbitrary row). One hash
    * aggregation — map-side partial agg then one shuffle on the key. */
  def exactByKey(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact content dedup robust to token order/repetition: canonical key =
    * sorted distinct token set. The full canonical STRING rides the
    * exchange as the group key — exact, and the right oracle anchor, but at
    * corpus scale the key is payload-sized; prefer [[exactCanonicalHashed]]
    * there. */
  def exactCanonical(df: DataFrame, id: Column, text: Column): DataFrame =
    exactByKey(df, id, GraftFunctions.canonicalKey(text))

  /** [[exactCanonical]] with a 128-bit fingerprint of the canonical key as
    * the shuffle key — the 100 TB shape: the exchange carries (16 bytes +
    * id) per row instead of the document-sized canonical string. The key is
    * TWO independent FNV-1a streams: one 64-bit hash expects ~n²/2⁶⁵
    * aggregate birthday collisions (thousands of silently merged groups at
    * trillion-doc scale); 128 bits keeps the expectation below 10⁻¹⁸. */
  def exactCanonicalHashed(df: DataFrame, id: Column, text: Column): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    exactByKey(df, id,
      GraftFunctions.fingerprint128(GraftFunctions.canonicalKey(text)))
      .withColumnRenamed("dedup_key", "dedup_fp")
  }

  /** Incremental ingest dedup: rows of `incoming` whose 128-bit canonical
    * fingerprint does NOT already appear in `corpus` — the streaming-ingest
    * shape, where each new batch is admitted against the standing corpus
    * without re-deduplicating the corpus itself. A left-anti join carrying
    * 16-byte fingerprint keys on both sides; the corpus side can (and at
    * 100 TB should) be a pre-computed fingerprint store rather than raw
    * text. Batch-internal duplicates are the caller's concern
    * ([[exactCanonicalHashed]] over the batch). */
  def dedupAgainstCorpus(
      incoming: DataFrame, corpus: DataFrame, textCol: String): DataFrame = {
    GraftFunctions.register(incoming.sparkSession)
    def withFp(df: DataFrame): DataFrame = df.withColumn("dedup_fp",
      GraftFunctions.fingerprint128(GraftFunctions.canonicalKey(col(textCol))))
    withFp(incoming)
      .join(withFp(corpus).select(col("dedup_fp")), Seq("dedup_fp"), "left_anti")
      .drop("dedup_fp")
  }

  /** Bloom bitset over a corpus fingerprint frame (the `dedup_fp.f1`
    * 64-bit stream) — ONE aggregation job (per-partition bitsets, byte-OR
    * merge), one `numBits/8`-byte row to the driver (the bounded-collect
    * discipline of the centroid fetches). An ingest service builds this
    * once per corpus snapshot and reuses it across every batch. */
  def bloomOfCorpus(
      corpusFp64: DataFrame, fpCol: String,
      numBits: Int, numProbes: Int): Array[Byte] =
    corpusFp64
      .agg(graft.functions.Aggregators.bloomBuildCol(col(fpCol), numBits, numProbes)
        .as("bloom"))
      .head().getAs[Array[Byte]](0)

  /** [[dedupAgainstCorpus]] with a Bloom pre-filter — the 100 TB shape of
    * incremental ingest. The plain anti-join shuffles EVERY incoming
    * fingerprint against the standing corpus' store; but ingest batches
    * are mostly new content, so almost all of that join input is wasted
    * motion. Here a bloom bitset of the corpus fingerprints (built by
    * [[bloomOfCorpus]], O(m) bytes, reusable across batches) is probed
    * INSIDE the incoming scan ([[graft.functions.BloomMightContain]],
    * codegen, k probes/row, no join): rows whose fingerprint misses the
    * bloom are definitely new (no false negatives) and bypass the join
    * entirely; only the (1−e^(−kn/m))^k false-positive sliver plus true
    * duplicates reach the exact anti-join. Final semantics are EXACTLY
    * [[dedupAgainstCorpus]] — the bloom only routes rows, the residual
    * join decides — so the gate oracle is the plain anti-join.
    *
    * Sizing: m bits serve n corpus keys at ~1.44·log2(1/fp) bits/key
    * (10 bits/key ≈ 1% fp); the bitset rides the plan as ONE reference
    * object per executor, not per task. Beyond driver-memory-sized
    * corpora, shard the bloom by fingerprint prefix and union the routed
    * slices — correctness never depends on m, so undersizing only grows
    * the residual join. */
  def bloomDedupAgainstCorpus(
      incoming: DataFrame, corpus: DataFrame, textCol: String,
      numBits: Int = 1 << 23, numProbes: Int = 5): DataFrame = {
    GraftFunctions.register(incoming.sparkSession)
    // persisted: the bloom build and the residual anti-join both read the
    // corpus fingerprints, and canonicalKey is the operator's dominant
    // per-row cost — without this the corpus scans+fingerprints twice.
    // (At scale callers hold a precomputed store and call
    // [[bloomDedupAgainstFingerprints]] directly.)
    val corpusFp = corpus
      .withColumn("dedup_fp",
        GraftFunctions.fingerprint128(GraftFunctions.canonicalKey(col(textCol))))
      .select(col("dedup_fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bloom = bloomOfCorpus(
        corpusFp.select(col("dedup_fp.f1").as("f1")), "f1", numBits, numProbes)
      bloomDedupAgainstFingerprints(incoming, corpusFp, textCol, bloom, numProbes)
    } finally corpusFp.unpersist(blocking = false)
  }

  /** The routed admit step of [[bloomDedupAgainstCorpus]] against a
    * PREBUILT corpus bloom + fingerprint store — the per-batch shape of a
    * standing ingest service (and its streaming gate): the snapshot
    * artifacts (bitset + `dedup_fp` frame) are built once and reused
    * across every batch; each call costs one fingerprint projection over
    * the batch, a scan-local bloom probe, and the residual anti-join over
    * the bloom-hit sliver only. */
  def bloomDedupAgainstFingerprints(
      incoming: DataFrame, corpusFp: DataFrame, textCol: String,
      bloom: Array[Byte], numProbes: Int): DataFrame = {
    GraftFunctions.register(incoming.sparkSession)
    // persisted: the two routing branches are independent subplans (no
    // cross-branch CSE), and canonicalKey is the dominant per-row cost —
    // unpersisted, every batch would scan + fingerprint twice. The result
    // is materialized eagerly below so the batch-sized cache never
    // outlives the call (the repeatedSpans discipline).
    val incFp = incoming.withColumn("dedup_fp",
        GraftFunctions.fingerprint128(GraftFunctions.canonicalKey(col(textCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try bloomRouted(incFp, corpusFp, bloom, numProbes).graftCheckpoint()
    finally incFp.unpersist(blocking = false)
  }

  /** The lazy routing plan of [[bloomDedupAgainstFingerprints]] —
    * package-visible so BloomSpec can pin its shape (exactly ONE join,
    * on the residual branch). */
  private[graft] def bloomRouted(
      incFp: DataFrame, corpusFp: DataFrame,
      bloom: Array[Byte], numProbes: Int): DataFrame = {
    // NULL canonical keys fingerprint to NULL: the plain anti-join ADMITS
    // them (a NULL key matches no corpus row), so the router must too —
    // an un-coalesced NULL probe would fall through BOTH branches.
    val hit = coalesce(
      GraftFunctions.bloomContains(col("dedup_fp.f1"), bloom, numProbes),
      lit(false))
    val definitelyNew = incFp.filter(!hit)
    val residual = incFp.filter(hit)
      .join(corpusFp.select(col("dedup_fp")), Seq("dedup_fp"), "left_anti")
    definitelyNew.unionByName(residual).drop("dedup_fp")
  }

  /** NEAR-dup incremental ingest — the MinHash analog of
    * [[dedupAgainstCorpus]]: admit only incoming documents that share NO
    * LSH band bucket with the standing corpus (an S-curve recall gate at
    * the banding parameters; exact near-dups and close paraphrases
    * collide with probability ≈ 1 − (1 − s^r)^b).
    *
    * 100 TB shape: both sides reduce to (band, band-slice) keys — the
    * corpus side is exactly the banded signature INDEX an ingest service
    * keeps materialized, so a batch of incoming docs costs one fused
    * signature projection plus one semi-join against the index, never a
    * corpus scan. No pair expansion, no bucket-size cap needed — a giant
    * bucket just means the flag short-circuits for its members. */
  /** The `(doc_id, band, bucket)` banded-signature projection of a corpus
    * — the materializable INDEX form an ingest service persists once and
    * reuses per batch (see [[nearDupAgainstIndex]]). One fused signature
    * projection + one explode; no shuffle. */
  def bandedIndex(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 48, bands: Int = 16,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    GraftFunctions.register(df.sparkSession)
    val rowsPerBand = numHashes / bands
    df.select(col(idCol).as("doc_id"),
        GraftFunctions.minhashSig(
          array_distinct(GraftFunctions.wordShingles(col(textCol), shingleK)),
          numHashes, seed).as("sig"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Admit the incoming documents that share no band bucket with an
    * ALREADY-BANDED corpus index ([[bandedIndex]] output, or its persisted
    * form read back). The batch of incoming docs costs one fused signature
    * projection plus one semi-join against the index — never a corpus
    * scan, which is what makes the per-micro-batch streaming use sound. */
  def nearDupAgainstIndex(
      incoming: DataFrame, corpusIndex: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 48, bands: Int = 16,
      seed: Long = 42L): DataFrame = {
    val flagged = bandedIndex(incoming, idCol, textCol,
        shingleK, numHashes, bands, seed)
      .join(corpusIndex.select(col("band"), col("bucket")),
        Seq("band", "bucket"), "left_semi")
      .select(col("doc_id")).distinct()
    incoming.join(flagged,
      incoming(idCol) === flagged("doc_id"), "left_anti")
  }

  def nearDupAgainstCorpus(
      incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 48, bands: Int = 16,
      seed: Long = 42L): DataFrame = {
    // both sessions: under foreachBatch the micro-batch frame and the
    // static corpus are bound to DIFFERENT sessions, and Dataset ops
    // analyze eagerly against their own session's function registry
    GraftFunctions.register(incoming.sparkSession)
    GraftFunctions.register(corpus.sparkSession)
    nearDupAgainstIndex(incoming,
      bandedIndex(corpus, idCol, textCol, shingleK, numHashes, bands, seed),
      idCol, textCol, shingleK, numHashes, bands, seed)
  }

  /** MinHash + LSH banding near-duplicate pairs.
    *
    * shingle → per-shingle 64-bit hash → `numHashes` universal-hash
    * permutations, min over shingles = signature → split into `bands`,
    * group on each band's RAW signature slice for candidate pairs →
    * verify exact Jaccard ≥ `threshold` on distinct shingle sets.
    * (Grouping on the slice itself rather than a hash of it removes the
    * bucket-collision layer: candidates are exactly the pairs agreeing on
    * some band, which also makes the whole query reproducible in the
    * DuckDB oracle.)
    *
    * Scale shape: signatures are one fused native-expression projection
    * (WordShingles + MinHashSig over FNV-1a); the only shuffles are the
    * band-slice exchange (rows × bands, carrying id + the bands-long
    * band-hash array, never payloads) and the verify join. Pair emission
    * is member-wise and first-colliding-band (see [[PairOps]]): each
    * qualifying pair exists exactly once, with no pair-keyed dedup
    * shuffle and no O(m²) single-row allocation.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 48,
      bands: Int = 16,
      threshold: Double = 0.8,
      seed: Long = 42L,
      maxBucketSize: Int = 1000,
      droppedBuckets: Option[LongAccumulator] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    GraftFunctions.register(df.sparkSession)
    val rowsPerBand = numHashes / bands

    val shingles = array_distinct(
      GraftFunctions.wordShingles(col(textCol), shingleK)).as("shingles")
    val base = df.select(col(idCol).as("doc_id"), shingles)

    // whole signature in one fused native expression (one JVM pass per row;
    // 48 interpreted higher-order transforms here cost minutes per million
    // rows, the fused expression milliseconds)
    val signed = base.withColumn("sig",
      GraftFunctions.minhashSig(col("shingles"), numHashes, seed))

    // Band-hash array for first-colliding-band emission: bh[b] is a 64-bit
    // hash of band b's signature slice, letting the expansion kernel check
    // "did these two docs already collide in an earlier band?" without
    // carrying every raw slice. A false equality (different slices, equal
    // hash — P ≈ bands·2⁻⁶⁴ per pair) can only suppress a pair, never
    // invent one; the bucket KEY stays the raw slice, so the candidate set
    // is exactly the oracle's.
    val withBh = signed.withColumn("bh",
      array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*))

    // Banding carries (doc_id, bh-PREFIX) + the band slice — never the
    // shingle arrays: at scale, replicating document payloads ×bands
    // through the exchange dominates cost. Band b's kernel only ever reads
    // bh[0..b) (the earlier-band check), so each exploded row ships just
    // that prefix — half the band-hash bytes of the full array, and zero
    // for band 0. Shingles (base) are joined back at verify time.
    val banded = withBh.select(
      explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(
          b.as("band"),
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).as("bucket"),
          struct(col("doc_id"), slice(col("bh"), lit(1), b).as("bh")).as("m"))))
        .as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("bb.m").as("m"))

    // Candidate generation as ONE aggregation (group bucket members, expand
    // pairs in place) instead of a self-join: the banded subtree would
    // otherwise be computed and shuffled twice (Spark can't reuse the
    // exchange across differently-aliased sides). Degenerate buckets larger
    // than `maxBucketSize` (near-identical boilerplate flooding one bucket)
    // are dropped — callers see the cap as an explicit parameter and can
    // pass `droppedBuckets` to observe how many buckets the cap removed.
    // Expansion is member-wise (one row per bucket member, kernel emits only
    // that member's pairs) so no single row holds a bucket's O(m²) pair set,
    // and first-colliding-band (kernel emits a pair only in the first band
    // where the two docs agree) so the union over bands is duplicate-free —
    // no ×bands candidate duplication, no pair-keyed dedup shuffle. Both
    // Generates and the kernel fuse into one whole-stage-codegen span.
    val buckets = capBuckets(
      banded
        .groupBy(col("band"), col("bucket"))
        .agg(collect_list(col("m")).as("ms"))
        .filter(size(col("ms")) >= 2),
      "ms", maxBucketSize, droppedBuckets)
    val candidates = buckets
      .select(col("band"), col("ms"),
        explode(sequence(lit(0), size(col("ms")) - 2)).as("i"))
      .select(explode(
        GraftFunctions.keyedMemberPairs(col("ms"), col("i"), col("band"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))

    // Skew posture of the verify join: a boilerplate doc colliding with
    // thousands makes id_a/id_b power-law hot, but the RIGHT side here is
    // the corpus itself — salting is wrong (it replicates the right side
    // per salt value). The deployed answer is AQE's runtime skew split
    // (skewJoin.enabled, pinned on the engine's session builders), proven
    // to fire on exactly this join shape by SkewSpec's hot-id pin.
    val withSh = candidates
      .join(base.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(base.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    withSh
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 64-bit signature; pigeonhole banding on
    * four 16-bit chunks (Hamming distance ≤ 3 ⇒ at least one chunk equal)
    * generates candidates; verify with bit_count(xor) ≤ maxHamming. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      droppedBuckets: Option[LongAccumulator] = None): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val sig = df.select(
      col(idCol).as("doc_id"),
      GraftFunctions.simhash64(GraftFunctions.tokens(col(textCol))).as("sig"))

    val chunkCols = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }
    val chunked = sig.select(
        struct(col("doc_id"), col("sig")).as("m"),
        explode(array(chunkCols: _*)).as("ck"))
      .select(col("ck.chunk").as("chunk"), col("ck.key").as("key"), col("m"))

    // one aggregation per (chunk, key) bucket, pairs expanded member-wise in
    // place — same single-shuffle shape as minhashPairs. Hamming is filtered
    // INSIDE the kernel (far pairs never exist anywhere), and emission is
    // first-colliding-chunk — the chunk keys are recomputed from the two
    // signatures in the kernel (exact, zero extra payload), so the union
    // over chunks is duplicate-free with no dedup shuffle.
    val buckets = capBuckets(
      chunked
        .groupBy(col("chunk"), col("key"))
        .agg(collect_list(col("m")).as("ms"))
        .filter(size(col("ms")) >= 2),
      "ms", maxBucketSize, droppedBuckets)
    buckets
      .select(col("chunk"), col("ms"),
        explode(sequence(lit(0), size(col("ms")) - 2)).as("i"))
      .select(explode(
        GraftFunctions.sigMemberPairs(col("ms"), col("i"), col("chunk"), maxHamming)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
  }

  /** Exact n-gram (token-set) Jaccard pairs with attribute blocking: every
    * pair in the output carries its exact token-set jaccard ≥ `threshold`.
    *
    * Candidate generation is MinHash-banded (same O(n·bands) shape as
    * [[minhashPairs]], keyed by (block, band, bucket)) rather than a
    * quadratic block cross: a true pair at jaccard j is missed only if all
    * `bands` bands disagree — probability (1−j^r)^b ≈ 1.4e-14 at j=0.95
    * with the default b=16, r=3 — so the exact tier keeps its oracle
    * contract while scaling like the approximate one. Within a bucket the
    * size-compatibility law (j ≥ t ⇒ min|A|,|B| ≥ t·max|A|,|B|) prunes
    * pairs before they reach the verify join; no bucket is ever dropped
    * (exactness first — a degenerate all-duplicates bucket has genuinely
    * quadratic OUTPUT, which no candidate scheme can avoid).
    *
    * Candidate volume tracks the corpus's TOKEN-jaccard structure: on a
    * low-diversity corpus where typical cross-doc pairs sit at jaccard
    * 0.3–0.6, banding fires on a large fraction of block pairs (measured
    * in DedupScaleSpec) — exactness survives, cost doesn't. Such corpora
    * should dedup on shingles ([[minhashPairs]]) instead, whose k-gram
    * space stays sparse. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double,
      numHashes: Int = 48,
      bands: Int = 16,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    // The exact contract is only as good as the banding's recall: a true
    // pair at jaccard exactly `threshold` survives with prob 1-(1-t^r)^b.
    // Refuse parameterizations that would silently lose real pairs — the
    // caller must widen the banding (more bands / fewer rows per band) for
    // lower thresholds rather than get quietly lossy "exact" output.
    // 1e-8: tight enough that even billions of boundary-jaccard pairs at
    // corpus scale expect zero misses (defaults at t=0.95 give 3.7e-14)
    val missProb = math.pow(1.0 - math.pow(threshold, rowsPerBand), bands)
    require(missProb <= 1e-8,
      f"banding ($bands bands × $rowsPerBand rows) misses a true pair at j=$threshold " +
        f"with probability $missProb%.2e > 1e-8 — raise `bands` (e.g. bands=numHashes " +
        "for 1-row bands) or use minhashPairs for approximate thresholds this low")
    GraftFunctions.register(df.sparkSession)
    // sorted distinct token sets → the intersection is an O(n+m) merge
    // (custom SortedIntersectCount expression) instead of a per-pair hash set
    val toks = df.select(
      col(idCol).as("doc_id"),
      col(blockCol).as("block"),
      array_sort(array_distinct(GraftFunctions.tokens(col(textCol)))).as("toks"))
      .withColumn("sz", size(col("toks")))

    // banding carries (doc_id, sz, bandHash-PREFIX) structs through the
    // exchange: band b's kernel reads only bh[0..b) for the
    // first-colliding-band check (emit each pair exactly once, no ×bands
    // duplication, no dropDuplicates shuffle), so each exploded row ships
    // just that prefix
    val signed = toks.withColumn("sig",
      GraftFunctions.minhashSig(col("toks"), numHashes, seed))
    val withBands = signed.withColumn("bh",
      array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*))
    val banded = withBands.select(
      col("block"),
      explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(
          b.as("band"),
          element_at(col("bh"), b + 1).as("bucket"),
          struct(col("doc_id"), col("sz"), slice(col("bh"), lit(1), b).as("bh")).as("ds"))))
        .as("bb"))
      .select(col("block"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"), col("bb.ds").as("ds"))

    // one aggregation + member-wise codegen'd pair expansion (single
    // shuffle); the size law (j ≥ t ⇒ min ≥ t·max) prunes inside the
    // kernel, before the pair exists anywhere else. Member-wise emission
    // bounds every row's output to O(m) — a degenerate all-duplicates
    // bucket streams its genuinely-quadratic pair set across m rows
    // instead of materializing it in one ArrayData (which OOMs and, past
    // ~65k members, overflows the Int element domain).
    val buckets = banded
      .groupBy(col("block"), col("band"), col("bucket"))
      .agg(collect_list(col("ds")).as("ms"))
      .filter(size(col("ms")) >= 2)
    val candidates = buckets
      .select(col("band"), col("ms"),
        explode(sequence(lit(0), size(col("ms")) - 2)).as("i"))
      .select(explode(GraftFunctions.sizedMemberPairs(
        col("ms"), col("i"), col("band"), threshold)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))

    val withToks = candidates
      .join(toks.select(col("doc_id").as("id_a"), col("toks").as("t_a")), "id_a")
      .join(toks.select(col("doc_id").as("id_b"), col("toks").as("t_b")), "id_b")
    val inter = GraftFunctions.sortedIntersectCount(col("t_a"), col("t_b")).cast("double")
    val union = (size(col("t_a")) + size(col("t_b"))).cast("double") - inter
    withToks
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-duplicate pairs: random-hyperplane LSH buckets generate
    * candidates, exact cosine verifies. Deterministic planes from `seed`. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      planesPerTable: Int = 12,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // (id, earlier-table bucket PREFIX) through the bucket exchange — the
    // prefix IS the first-colliding-table state, so the kernel emits each
    // pair in exactly one table (exact: the keys compared are the bucket
    // keys themselves) and no dedup shuffle is needed; vectors joined back
    // for verify only.
    val vecs = df.select(col(idCol), col(vecCol))
    val banded = Similarity
      .withLshBucketArray(vecs, vecCol, dim, planesPerTable, tables, seed)
      .select(
        explode(transform(
          sequence(lit(0), lit(tables - 1)),
          t => struct(
            t.as("table"),
            element_at(col("tbs"), t + 1).as("bucket"),
            struct(col(idCol), slice(col("tbs"), lit(1), t).as("tbs")).as("m"))))
          .as("tb"))
      .select(col("tb.table").as("table"), col("tb.bucket").as("bucket"),
        col("tb.m").as("m"))
    val buckets = banded
      .groupBy(col("table"), col("bucket"))
      .agg(collect_list(col("m")).as("ms"))
      .filter(size(col("ms")) >= 2)
    buckets
      .select(col("table"), col("ms"),
        explode(sequence(lit(0), size(col("ms")) - 2)).as("i"))
      .select(explode(
        GraftFunctions.keyedMemberPairs(col("ms"), col("i"), col("table"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("v_b")), "id_b")
      .withColumn("cosine", GraftFunctions.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Edit-distance near-duplicate pairs with EXACT recall: PassJoin-style
    * segment blocking (Li, Deng, Feng: "PassJoin: a partition-based method
    * for similarity joins", PVLDB 2011) + exact Levenshtein verification.
    *
    * Soundness: split every string into k+1 contiguous segments; ≤ k edit
    * operations leave at least one segment untouched (pigeonhole), so any
    * true pair (a, b) with dist ≤ k shares an exact (segment-index,
    * segment-text) key where b contains a's segment within ±k of its
    * position. Candidates are generated from that key and verified with
    * the exact `levenshtein` builtin — the blocking only bounds WORK,
    * never recall (for strings of length ≥ k+1; both orientations of a
    * pair are probed, and a short tier brute-pairs the ≤ 2k-length
    * stragglers so the guarantee is total).
    *
    * 100 TB posture: DISTINCT-FIRST — the probe fan-out, candidate join
    * and every levenshtein run once per distinct VALUE (duplicate-heavy
    * title domains pay the expensive tier on their value domain), with
    * member expansion by two string-keyed joins afterwards. No all-pairs
    * anywhere — the only shuffles are the (length, segIdx, piece)-keyed
    * candidate join (pieces are ~len/(k+1) chars), a pair-distinct, and
    * the expansion joins. Probe fan-out is a constant
    * (2k+1)·(k+1)·(2k+1) entries per distinct string (~75 at k=2).
    * Distance-0 cliques emit quadratic TRUE pairs by definition — for web
    * corpora run [[exactByKey]] first and feed this tier the survivors.
    *
    * Output: (id_a, id_b, dist) with id_a < id_b, dist ≤ `maxDist`
    * (including 0; callers slice the band they want). */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8, s"maxDist $maxDist out of the sane band [1,8]")
    GraftFunctions.register(df.sparkSession) // fingerprint128 expansion keys
    val k = maxDist
    val m = k + 1
    val members = df.select(col(idCol).cast("long").as("doc_id"), col(strCol).as("str"))
      .filter(col("str").isNotNull)
    // DISTINCT-FIRST: candidate generation, the probe fan-out and every
    // levenshtein evaluation run once per distinct VALUE, not per row — a
    // duplicate-heavy corpus (the normal case for titles) pays the
    // expensive tier on its value domain, and member pairs are expanded
    // back afterwards by fingerprint-keyed joins. The distinct itself
    // also keys on the 128-bit fingerprint (16-byte shuffle keys, the
    // exactCanonicalHashed rule); min(str) recovers the group's single
    // value — every member of an fp group carries the same string.
    val titled = members
      .withColumn("fp", GraftFunctions.fingerprint128(col("str")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("str")).as("str"))
      .select(col("doc_id"), col("str"))
      .withColumn("len", length(col("str")).cast("int"))

    // deterministic even partition of a length-L string into m segments:
    // first m-rem of width base, the rest base+1 (same formula both sides)
    def segGeom(L: Column, i: Column): (Column, Column) = {
      val base = floor(L / m).cast("int")
      val rem = (L - base * m).cast("int")
      val sl = base + when(i >= lit(m) - rem, 1).otherwise(0)
      val st = i * base + greatest(lit(0), i - (lit(m) - rem))
      (st, sl)
    }

    // index side: the m segments of each string (nonempty iff len >= m)
    val idx = titled
      .filter(col("len") >= m)
      .select(col("doc_id"), col("len"), col("str"),
        explode(transform(sequence(lit(0), lit(k)), { i =>
          val (st, sl) = segGeom(col("len"), i)
          struct(i.cast("int").as("i"), col("str").substr(st + 1, sl).as("piece"))
        })).as("g"))
      .select(col("doc_id").as("id_idx"), col("len").as("key_len"),
        col("g.i").as("key_i"), col("g.piece").as("key_piece"))

    // probe side: for every target length within ±k and every segment,
    // the substrings at the MULTI-MATCH-AWARE positions (PassJoin,
    // Li/Deng/Feng 2011, Lemma 3): in any ≤k-edit alignment some segment
    // i aligns exactly with ≤i edits strictly before it and ≤k−i after,
    // so with Δ = |probe| − |target| the aligned start offset dp = p − st
    // satisfies |dp| ≤ i AND |dp − Δ| ≤ k−i. That window is
    // min(2i, 2(k−i))+1-sized instead of the naive 2k+1 — at k=2 the
    // probe fan-out drops ~3× (5 vs 15 positions per target length) with
    // recall untouched (the gate's brute-force oracle and the spec's
    // exhaustive brute comparisons prove it exact). Nulls mark
    // out-of-bounds/out-of-window combinations.
    val probe = titled
      .select(col("doc_id"), col("len"), col("str"),
        explode(array_distinct(filter(
          flatten(flatten(
            transform(sequence(lit(-k), lit(k)), { dl =>
              val Lp = (col("len") + dl).cast("int")
              transform(sequence(lit(0), lit(k)), { i =>
                val (st, sl) = segGeom(Lp, i)
                transform(sequence(lit(-k), lit(k)), { dp =>
                  val p = (st + dp).cast("int")
                  // Δ = probe len − target len = −dl
                  val lo = greatest(-i, -dl - (lit(k) - i))
                  val hi = least(i, -dl + (lit(k) - i))
                  struct(
                    Lp.as("L"), i.cast("int").as("i"),
                    when(Lp >= m && sl >= 1 && p >= 0 && p + sl <= col("len") &&
                      dp >= lo && dp <= hi,
                      col("str").substr(p + 1, sl)).as("piece"))
                })
              })
            }))),
          e => e.getField("piece").isNotNull))).as("g"))
      .select(col("doc_id").as("id_probe"), col("g.L").as("key_len"),
        col("g.i").as("key_i"), col("g.piece").as("key_piece"))

    val candidates = idx
      .join(probe, Seq("key_len", "key_i", "key_piece"))
      .filter(col("id_idx") =!= col("id_probe"))
      .select(
        least(col("id_idx"), col("id_probe")).as("id_a"),
        greatest(col("id_idx"), col("id_probe")).as("id_b"))
      .distinct()

    // short tier: strings of length <= 2k can pair with strings their
    // pigeonhole segments cannot reach; brute-pair them (value domain is
    // alphabet^(2k)-bounded; see docstring for the exact-dedup-first rule)
    // equi-join shape (hash join, never a nested-loop): the left side
    // fans out to its ±k target lengths and joins on length equality
    val shorts = titled.filter(col("len") <= 2 * k)
    val shortPairs = shorts
      .select(col("doc_id").as("id_a"), col("len").as("la"),
        explode(sequence(greatest(col("len") - k, lit(0)), col("len") + k)).as("lb"))
      .join(shorts.select(col("doc_id").as("id_b"), col("len").as("lb")), Seq("lb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))

    // verified pairs between distinct VALUES (dist >= 1 by construction —
    // equal strings collapsed to one representative above).
    // MEASURED NEGATIVE, twice (r16 64k-coalesce-floor, r17 pinned-width
    // repartition of the bare pair ids before these joins): forcing the
    // AQE-collapsed single-task verify to session width LOSES ~+0.5–0.9 s
    // on d_edit_clusters interleaved-pinned (6.29/7.31 vs 5.78/6.36 s)
    // and is neutral on d_edit_distance — the extra exchange plus wider
    // join scheduling costs more than the single-task levenshtein here.
    // Leave AQE's sizing alone; at 100 TB the pair set carries real bytes
    // and fans out on its own.
    val valuePairs = candidates.unionByName(shortPairs).distinct()
      .join(titled.select(col("doc_id").as("id_a"), col("str").as("s_a")), "id_a")
      .join(titled.select(col("doc_id").as("id_b"), col("str").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= k)
      .select(col("s_a"), col("s_b"), col("dist"))

    // expand back to members: every member of value A pairs with every
    // member of value B at A/B's distance; plus the within-value
    // distance-0 cliques (quadratic TRUE output by contract — see the
    // exact-dedup-first rule in the docstring). The expansion joins key
    // on the 128-bit [[GraftFunctions.fingerprint128]] of the string, not
    // the string itself — the exchanges carry 16-byte keys instead of
    // full document text (the exactCanonicalHashed rule); the exact
    // levenshtein verification above already ran on the real strings.
    val fpMembers = members.select(col("doc_id"),
      GraftFunctions.fingerprint128(col("str")).as("fp"))
    val fpPairs = valuePairs.select(
      GraftFunctions.fingerprint128(col("s_a")).as("fp_a"),
      GraftFunctions.fingerprint128(col("s_b")).as("fp_b"),
      col("dist"))
    val cross = fpPairs
      .join(fpMembers.select(col("doc_id").as("id_x"), col("fp").as("fp_a")), "fp_a")
      .join(fpMembers.select(col("doc_id").as("id_y"), col("fp").as("fp_b")), "fp_b")
      .select(
        least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"),
        col("dist"))
    val zero = fpMembers.select(col("doc_id").as("id_a"), col("fp"))
      .join(fpMembers.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("dist"))
    cross.unionByName(zero)
  }
}
