package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus pipelines (north-star ops,
  * SURVEY §2.3). All are pure `DataFrame => DataFrame` transformations:
  * no driver-side collects, shuffle keyed on content hashes/buckets, so the
  * same code runs at 100 TB — candidate generation is O(n·bands) via
  * LSH banding instead of O(n²) pair enumeration.
  */
object Dedup {

  /** Exact dedup on a key expression: keeps the smallest id per group
    * (deterministic, unlike dropDuplicates' arbitrary row). One hash
    * aggregation — map-side partial agg then one shuffle on the key. */
  def exactByKey(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact content dedup robust to token order/repetition: canonical key =
    * sorted distinct token set. */
  def exactCanonical(df: DataFrame, id: Column, text: Column): DataFrame =
    exactByKey(df, id, GraftFunctions.canonicalKey(text))

  /** MinHash + LSH banding near-duplicate pairs.
    *
    * shingle → per-shingle 64-bit hash → `numHashes` universal-hash
    * permutations, min over shingles = signature → split into `bands`,
    * hash each band to a bucket → self-join on (band, bucket) for candidate
    * pairs → verify exact Jaccard ≥ `threshold` on distinct shingle sets.
    *
    * Scale shape: signatures are computed in one projection (codegen'd
    * higher-order functions over xxhash64); the only shuffles are the
    * band-bucket exchange (rows × bands) and the verify join; no pair is
    * ever materialized unless it collides in some band.
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
      maxBucketSize: Int = 1000): DataFrame = {
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

    // Banding carries ONLY (doc_id, band, bucket) — never the shingle
    // arrays: at scale, replicating document payloads ×bands through the
    // exchange dominates cost. Shingles (base) are joined back at verify time.
    val banded = signed.select(
      col("doc_id"),
      explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(
          b.as("band"),
          xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // Candidate generation as ONE aggregation (group bucket members, expand
    // pairs in place) instead of a self-join: the banded subtree would
    // otherwise be computed and shuffled twice (Spark can't reuse the
    // exchange across differently-aliased sides). Degenerate buckets larger
    // than `maxBucketSize` (near-identical boilerplate flooding one bucket)
    // are dropped — callers see the cap as an explicit parameter.
    val buckets = banded
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
    val candidates = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(
          slice(col("ids"), i + 2, greatest(size(col("ids")) - (i + 1), lit(0))),
          y => struct(least(x, y).as("id_a"), greatest(x, y).as("id_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")

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
      maxBucketSize: Int = 1000): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val sig = df.select(
      col(idCol).as("doc_id"),
      GraftFunctions.simhash64(GraftFunctions.tokens(col(textCol))).as("sig"))

    val chunkCols = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }
    val chunked = sig.select(col("doc_id"), col("sig"),
        explode(array(chunkCols: _*)).as("ck"))
      .select(col("doc_id"), col("sig"),
        col("ck.chunk").as("chunk"), col("ck.key").as("key"))

    // one aggregation per (chunk, key) bucket, pairs expanded in place —
    // same single-shuffle shape as minhashPairs, carrying (id, sig) structs
    val buckets = chunked
      .groupBy(col("chunk"), col("key"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucketSize)
    buckets
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(
          slice(col("ms"), i + 2, greatest(size(col("ms")) - (i + 1), lit(0))),
          y => struct(
            least(x("doc_id"), y("doc_id")).as("id_a"),
            greatest(x("doc_id"), y("doc_id")).as("id_b"),
            bit_count(x("sig").bitwiseXOR(y("sig"))).as("hamming"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (token-set) Jaccard pairs with attribute blocking — the
    * quadratic-verify variant, bounded by the blocking key (here: language).
    * Above small corpora prefer [[minhashPairs]]; this one is oracle-exact. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // sorted distinct token sets → the intersection is an O(n+m) merge
    // (custom SortedIntersectCount expression) instead of a per-pair hash set
    val toks = df.select(
      col(idCol).as("doc_id"),
      col(blockCol).as("block"),
      array_sort(array_distinct(GraftFunctions.tokens(col(textCol)))).as("toks"))
      .withColumn("sz", size(col("toks")))

    // Size-key candidate join: jaccard ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|),
    // so pairing each set (as the larger side) with the candidate smaller
    // sizes [⌈t·sz⌉, sz] turns the quadratic block-cross into an equi-join
    // on (block, size). Epsilon keeps boundary sizes; the exact jaccard
    // filter below decides. ids-only through the exchange.
    val smaller = toks.select(col("block"), col("sz").as("key"),
      col("doc_id").as("id_l"), col("sz").as("sz_l"))
    val larger = toks.select(col("block"), col("doc_id").as("id_r"), col("sz").as("sz_r"),
        explode(sequence(
          ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int"),
          col("sz"))).as("key"))
    val candidates = smaller.join(larger,
        smaller("block") === larger("block") && smaller("key") === larger("key") &&
          (smaller("sz_l") < larger("sz_r") ||
            (smaller("sz_l") === larger("sz_r") && smaller("id_l") < larger("id_r"))))
      .select(
        least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"))

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
    // ids-only through the bucket exchange; vectors joined back for verify
    val vecs = df.select(col(idCol), col(vecCol))
    val bucketed = Similarity
      .withLshBuckets(vecs, vecCol, dim, planesPerTable, tables, seed)
      .select(col("table"), col("bucket"), col(idCol))
    val buckets = bucketed
      .groupBy(col("table"), col("bucket"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) >= 2)
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(
          slice(col("ids"), i + 2, greatest(size(col("ids")) - (i + 1), lit(0))),
          y => struct(least(x, y).as("id_a"), greatest(x, y).as("id_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("v_b")), "id_b")
      .withColumn("cosine", GraftFunctions.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
