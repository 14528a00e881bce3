package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star ops, SURVEY §2.3): media as opaque
  * `binary` columns + typed metadata structs, with decode/feature-extract as
  * partition-local batch transforms.
  *
  * The Spark-side plumbing is real — schema, batching via `mapPartitions`
  * (the JVM analog of Python's `mapInPandas` batches), partition-friendly
  * shapes, no driver collects. The codecs are REAL for the formats the
  * bare JVM can decode — 24-bit BMP, 8-bit RGB/RGBA PNG (JDK zlib) and
  * PCM-16 WAV parse down to actual pixels and samples ([[MediaCodecs]]) —
  * and a clearly-marked deterministic STUB ([[stubDecode]]) stands in only
  * for formats needing third-party codec libraries (JPEG/MP3/H.264). */
object Multimodal {

  /** Typed per-media metadata carried alongside the payload. */
  final case class MediaMeta(mime: String, width: Int, height: Int, nBytes: Long)

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class FeatureRow(
      doc_id: Long, mime: String, feature: Array[Float], n_bytes: Long)

  /** Attach a binary payload + metadata struct to each document. Payload is
    * the UTF-8 encoding of the text (stand-in bytes); metadata fields are
    * derived deterministically so tests are reproducible. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Attach REAL media payloads: even doc_ids carry a spec-conforming
    * 24-bit BMP, odd ones a PCM-16 WAV, both deterministic in doc_id. The
    * generation is executor-side (an ingest stand-in); everything
    * downstream — parse, features, resize — is a genuine decode. */
  def withMediaPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    val gen = udf { (id: Long) =>
      if (id % 2 == 0)
        MediaCodecs.synthBmp(16 + (id % 16).toInt, 16 + (id % 12).toInt, id)
      else
        MediaCodecs.synthWav(2000 + (id % 1000).toInt, 16000, id)
    }
    docs.select(
      col("doc_id"),
      gen(col("doc_id")).as("payload"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("image/bmp"))
        .otherwise(lit("audio/wav")).as("mime"))
  }

  /** Attach a REAL compressed payload to every doc: a deterministic
    * doc_id-seeded PNG (deflated scanlines, CRC-framed chunks) whose
    * pixel CONTENT matches the BMP gradient for the same id — the
    * compressed-image twin of [[withMediaPayload]]. The seed-rotated
    * scanline filter means a corpus exercises all five PNG unfilter
    * paths. */
  def withPngPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    // floorMod: the geometry formula must agree with the gate's pmod
    // columns for NEGATIVE ids too (Scala % truncates toward zero)
    val gen = udf { (id: Long) =>
      MediaCodecs.synthPng(
        16 + java.lang.Math.floorMod(id, 16L).toInt,
        16 + java.lang.Math.floorMod(id, 12L).toInt, id)
    }
    docs.select(
      col("doc_id"),
      gen(col("doc_id")).as("payload"),
      lit("image/png").as("mime"))
  }

  /** Attach a REAL baseline-JPEG payload to every doc: a deterministic
    * doc_id-seeded block-flat grayscale fixture in the codec's
    * exactly-representable subspace ([[JpegCodec.synthJpeg]]) — the full
    * Huffman/DCT encode-decode path must reproduce every pixel
    * bit-for-bit, so the gate's theory pins stay exact even though the
    * codec is a genuine lossy baseline implementation. */
  def withJpegPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    val gen = udf { (id: Long) =>
      JpegCodec.synthJpeg(
        16 + 8 * java.lang.Math.floorMod(id, 3L).toInt,
        16 + 8 * java.lang.Math.floorMod(id, 2L).toInt, id)
    }
    docs.select(
      col("doc_id"),
      gen(col("doc_id")).as("payload"),
      lit("image/jpeg").as("mime"))
  }

  /** Attach a REAL compressed-audio payload to every doc: a deterministic
    * doc_id-seeded FLAC of the SAME sine as [[MediaCodecs.synthWav]]
    * (fixed-predictor + Rice encode). FLAC is lossless, so the decoded
    * samples — and therefore the features — must equal the WAV path's
    * bit-for-bit for the same seed. */
  def withFlacPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    val gen = udf { (id: Long) =>
      FlacCodec.synthFlac(
        2000 + java.lang.Math.floorMod(id, 1000L).toInt, 16000, id)
    }
    docs.select(
      col("doc_id"),
      gen(col("doc_id")).as("payload"),
      lit("audio/flac").as("mime"))
  }

  /** STUB decoder — stands in for compressed-format decode (MP3/H.264),
    * whose codec libraries this container cannot ship. Deterministic:
    * 16-bin byte histogram, L1-normalized. Same shape as the real paths
    * (binary => fixed-width float vector). */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) % 16) += 1f
      i += 1
    }
    val total = math.max(1, payload.length).toFloat
    var b = 0
    while (b < 16) { bins(b) /= total; b += 1 }
    bins
  }

  /** Normalize any payload layout into typed [[MediaRow]]s: top-level
    * `mime` (withMediaPayload), `meta.mime` (withPayload), or — for plain
    * (doc_id, payload) frames from external callers or operator
    * composition — a default of application/octet-stream, which routes to
    * the stub decode path. */
  private def asMediaRows(spark: SparkSession, media: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    val src =
      if (media.columns.contains("mime"))
        media.select(col("doc_id"), col("payload"), col("mime"))
      else if (media.columns.contains("meta"))
        media.select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      else
        media.select(col("doc_id"), col("payload"),
          lit("application/octet-stream").as("mime"))
    src.as[MediaRow]
  }

  /** Per-payload decode dispatch: real pixel/sample features for
    * BMP/PNG/WAV, stub histogram for opaque formats. */
  def decodeOne(payload: Array[Byte], mime: String): Array[Float] = mime match {
    case "image/bmp" => MediaCodecs.bmpFeatures(payload)
    case "image/png" => MediaCodecs.pngFeatures(payload)
    case "image/jpeg" => JpegCodec.jpegFeatures(payload)
    case "audio/wav" => MediaCodecs.wavFeatures(payload)
    case "audio/flac" => FlacCodec.flacFeatures(payload)
    case _ => stubDecode(payload)
  }

  /** Partition-local batch decode: binary payload → fixed-width feature
    * vector. `mapPartitions` keeps the (real-world: expensive, native-lib)
    * decoder initialization per-partition, not per-row — the same shape a
    * Pandas-UDF batch decode has in PySpark. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    asMediaRows(spark, media)
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.map(r => FeatureRow(
          r.doc_id, r.mime, decodeOne(r.payload, r.mime), r.payload.length.toLong))
      }
  }

  final case class ResizedRow(
      doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Image resize: REAL nearest-neighbor resample for BMP payloads
    * (decode → sample pixels at scaled coordinates → re-encode a valid
    * BMP); a byte-stride STUB for opaque payloads. Partition-local
    * batching either way. */
  def resize(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    asMediaRows(spark, media)
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.mime == "image/bmp") {
            ResizedRow(r.doc_id, targetW, targetH,
              MediaCodecs.resizeBmp(r.payload, targetW, targetH))
          } else {
            val stride = math.max(1, r.payload.length / math.max(1, targetW * targetH))
            val out = r.payload.indices.collect {
              case i if i % stride == 0 => r.payload(i)
            }.toArray
            ResizedRow(r.doc_id, targetW, targetH, out)
          }
        }
      }
  }

  final case class FrameRow(doc_id: Long, frame_no: Int, frame: Array[Byte])

  /** STUB frame sampling — stands in for video decode: splits the payload
    * into fixed-size "frames" and keeps every `everyNth`. One input row →
    * many frame rows (the generator shape video pipelines need); the
    * explode happens executor-side in the iterator, never on the driver. */
  def frameSample(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, everyNth: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    asMediaRows(spark, media)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          r.payload.grouped(frameBytes).zipWithIndex.collect {
            case (chunk, i) if i % everyNth == 0 => FrameRow(r.doc_id, i, chunk)
          }
        }
      }
  }

  /** Closed-form first feature of the synthetic media for doc `id`,
    * derived from the synthBmp/synthWav DEFINITIONS — no bytes, no codec:
    * even ids: mean R channel / 255 of the (16+id%16)×(16+id%12) gradient
    * image (R at (x,y) = (7x + s) mod 256 with s = id mod 256, independent
    * of y); odd ids: RMS of the half-amplitude sine at 220 + id mod 220 Hz,
    * truncation-quantized to 16-bit over 2000 + id mod 1000 samples.
    * Every float/double operation replicates the feature kernels' order, so
    * the full synth → encode → parse → feature path must agree
    * BIT-FOR-BIT — the theory pin that replaces an external oracle for
    * this engine-specific query. */
  def theoryFeature0(id: Long): Float =
    if (id % 2 == 0) {
      val w = 16 + (id % 16).toInt
      val h = 16 + (id % 12).toInt
      val s = (id & 0xff).toInt
      var srRow = 0L
      var x = 0
      while (x < w) { srRow += (x * 7 + s) % 256; x += 1 }
      val sr = srRow * h
      sr.toFloat / (w * h) / 255f
    } else {
      val n = 2000 + (id % 1000).toInt
      val freq = 220.0 + (id % 220).toDouble
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        val v = (0.5 * 32767.0 * math.sin(2.0 * math.Pi * freq * i / 16000.0)).toInt
        val sn = v.toDouble / 32768.0
        sumSq += sn * sn
        i += 1
      }
      math.sqrt(sumSq / n).toFloat
    }

  /** Closed-form payload size for doc `id` (file-format header arithmetic,
    * no bytes): BMP = 54-byte header + padded rows; WAV = 44-byte header +
    * 2 bytes per sample. */
  def theoryByteCount(id: Long): Long =
    if (id % 2 == 0) {
      val w = 16 + (id % 16).toInt
      val h = 16 + (id % 12).toInt
      54L + ((w * 3 + 3) / 4 * 4).toLong * h
    } else 44L + 2L * (2000 + (id % 1000).toInt)

  /** Oracle-able gate aggregation: the same synth → encode → decode →
    * aggregate pipeline as [[featurePipeline]], but every output column is
    * an integer whose EXPECTED value has a closed form — so an external
    * engine that cannot decode media can still verify the query end to end:
    *
    *   - `total_bytes` is file-format header arithmetic in doc_id
    *     ([[theoryByteCount]]), independently recomputable in SQL;
    *   - `n_feat0_exact` / `n_bytes_exact` count docs whose DECODED
    *     feature[0] / byte count equal the closed-form theory values
    *     BIT-FOR-BIT — the oracle pins both to n_docs (all must match), so
    *     any divergence anywhere in the synth/encode/parse/feature path
    *     shows up as a count mismatch.
    */
  /** Shared synth → decode → join → group prefix of [[featureGate]] and
    * [[featurePipeline]] (kept single-sourced so a join-key or synth change
    * cannot drift between the two aggregations). */
  private def groupedFeatures(
      spark: SparkSession, docs: DataFrame): org.apache.spark.sql.RelationalGroupedDataset = {
    val media = withMediaPayload(spark, docs)
    val feats = decodeFeatures(spark, media).toDF()
    feats.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"), col("mime"))
  }

  private def theoryF = udf((id: Long) => theoryFeature0(id))
  private def theoryB = udf((id: Long) => theoryByteCount(id))

  def featureGate(spark: SparkSession, docs: DataFrame): DataFrame =
    groupedFeatures(spark, docs)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(when(element_at(col("feature"), 1) === theoryF(col("doc_id")), 1L)
          .otherwise(0L)).as("n_feat0_exact"),
        sum(when(col("n_bytes") === theoryB(col("doc_id")), 1L)
          .otherwise(0L)).as("n_bytes_exact"))

  /** End-to-end pipeline: real media payloads → batch decode (actual BMP
    * pixels / WAV samples) → per-(source, modality) feature aggregation
    * (joins features back to the docs dimension columns). The two
    * `*_theory_exact` columns make the query self-checking at any scale
    * factor: every doc's decoded feature[0] and byte count must equal the
    * closed-form theory values BIT-FOR-BIT or the group reports false. */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame =
    groupedFeatures(spark, docs)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(element_at(col("feature"), 1)).as("avg_feat0"),
        bool_and(element_at(col("feature"), 1) === theoryF(col("doc_id")))
          .as("feat0_theory_exact"),
        bool_and(col("n_bytes") === theoryB(col("doc_id")))
          .as("bytes_theory_exact"))

  /** Closed-form first feature of the synthetic PNG for doc `id`: the PNG
    * pixel content is the SAME gradient as the even-id BMP (mean R channel
    * independent of y), over (16+id%16)×(16+id%12) — one float expression
    * replicating [[MediaCodecs.rgbFeatureVector]]'s fold order, for ALL
    * ids (the PNG tier is not parity-split). */
  def theoryPngFeature0(id: Long): Float = {
    val w = 16 + java.lang.Math.floorMod(id, 16L).toInt
    val h = 16 + java.lang.Math.floorMod(id, 12L).toInt
    val s = (id & 0xff).toInt
    var srRow = 0L
    var x = 0
    while (x < w) { srRow += (x * 7 + s) % 256; x += 1 }
    (srRow * h).toFloat / (w * h) / 255f
  }

  private def theoryPngF = udf((id: Long) => theoryPngFeature0(id))

  /** Closed-form first feature of the synthetic JPEG for doc `id`: the
    * block-flat grayscale fixture decodes bit-exactly (DC-only blocks, see
    * [[JpegCodec.synthJpeg]]), so feature[0] = mean R / 255 is the exact
    * Long block sum replicated in [[MediaCodecs.rgbFeatureVector]]'s fold
    * order — v(bx,by) = (7·bx + 5·by + id mod 256) mod 256 over the
    * (16+8·(id mod 3)) x (16+8·(id mod 2)) geometry. */
  def theoryJpegFeature0(id: Long): Float = {
    val w = 16 + 8 * java.lang.Math.floorMod(id, 3L).toInt
    val h = 16 + 8 * java.lang.Math.floorMod(id, 2L).toInt
    val s = (id & 0xff).toInt
    var sum = 0L
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        sum += 64L * ((bx * 7 + by * 5 + s) % 256)
        bx += 1
      }
      by += 1
    }
    sum.toFloat / (w * h) / 255f
  }

  private def theoryJpegF = udf((id: Long) => theoryJpegFeature0(id))

  /** Closed-form first feature (RMS) of the synthetic FLAC for doc `id`:
    * the truncation-quantized sine replayed sample-by-sample in the exact
    * fold order of [[FlacCodec.flacFeatures]] — valid because FLAC decode
    * is LOSSLESS, so the decoded samples ARE the synth samples. */
  def theoryFlacFeature0(id: Long): Float = {
    val n = 2000 + java.lang.Math.floorMod(id, 1000L).toInt
    val freq = 220.0 + java.lang.Math.floorMod(id, 220L).toDouble
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val v = (0.5 * 32767.0 * math.sin(2.0 * math.Pi * freq * i / 16000.0)).toInt
      val s = v.toDouble / 32768.0
      sumSq += s * s
      i += 1
    }
    math.sqrt(sumSq / n).toFloat
  }

  private def theoryFlacF = udf((id: Long) => theoryFlacFeature0(id))

  /** FLAC gate aggregation — the compressed-audio sibling of the JPEG/PNG
    * gates: synth (fixed-predictor + Rice encode, CRC-8/CRC-16/MD5-framed)
    * → real frame-walk entropy decode → per-source integer aggregation.
    * An entropy-coded byte count has no closed form, so the pinned facts
    * are sample-side: total decoded samples (recovered exactly from the
    * duration feature: round(f3·16000) — n ≤ 3000 fits a float mantissa)
    * and two all-docs-match counters — decoded RMS vs theory (bit-exact
    * float, valid because FLAC is lossless) and the sample-rate feature. */
  def flacGate(spark: SparkSession, docs: DataFrame): DataFrame = {
    val media = withFlacPayload(spark, docs)
    val feats = decodeFeatures(spark, media).toDF()
    feats.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(round(element_at(col("feature"), 4) * 16000f).cast("long"))
          .as("total_samples"),
        sum(when(element_at(col("feature"), 1) === theoryFlacF(col("doc_id")), 1L)
          .otherwise(0L)).as("n_feat0_exact"),
        sum(when(element_at(col("feature"), 3) === lit(16f), 1L)
          .otherwise(0L)).as("n_rate_exact"))
  }

  /** Cross-CODEC parity gate: the SAME block-flat grayscale pixel content
    * encoded three ways — uncompressed BMP, deflate-compressed PNG
    * (seed-rotated scanline filters) and Huffman/DCT baseline JPEG — then
    * decoded by each format's full independent path. All three must yield
    * BIT-IDENTICAL 16-float feature vectors (BMP is raw, PNG is lossless,
    * and the block-flat content sits in JPEG's DC-only exact subspace), so
    * `n_all_equal` counts docs whose three per-format feature hashes
    * collapse to one, and `n_feat0_exact` pins the shared value to the
    * closed-form theory. A one-bit divergence anywhere in any of the three
    * codec stacks fails its doc. */
  def mediaParityGate(spark: SparkSession, docs: DataFrame): DataFrame = {
    val gen = udf { (id: Long) =>
      val w = 16 + 8 * java.lang.Math.floorMod(id, 3L).toInt
      val h = 16 + 8 * java.lang.Math.floorMod(id, 2L).toInt
      val rgb = JpegCodec.blockFlatPixels(w, h, id)
      Seq(
        ("image/bmp", MediaCodecs.encodeBmp(w, h, rgb)),
        ("image/png", MediaCodecs.encodePng(w, h, rgb,
          filterType = java.lang.Math.floorMod(id, 5L).toInt)),
        ("image/jpeg", JpegCodec.encodeJpeg(w, h, rgb, grayscale = true)))
    }
    val media = docs
      .select(col("doc_id"), explode(gen(col("doc_id"))).as("fm"))
      .select(col("doc_id"), col("fm._2").as("payload"), col("fm._1").as("mime"))
    val feats = decodeFeatures(spark, media).toDF()
    val perDoc = feats
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_formats"),
        countDistinct(xxhash64(col("feature"))).as("n_distinct_feats"),
        min(element_at(col("feature"), 1)).as("feat0"))
    perDoc.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_formats") === 3 && col("n_distinct_feats") === 1, 1L)
          .otherwise(0L)).as("n_all_equal"),
        sum(when(col("feat0") === theoryJpegF(col("doc_id")), 1L)
          .otherwise(0L)).as("n_feat0_exact"))
  }

  /** JPEG gate aggregation — the compressed-image gate's DCT sibling:
    * synth (full Huffman/DCT baseline encode) → real marker-walk +
    * entropy-decode + dequant + IDCT → per-source integer aggregation.
    * Like the PNG gate, an entropy-coded byte count has no closed form, so
    * the pinned facts are pixel-side: total decoded pixels (header
    * geometry is closed-form in doc_id) and two all-docs-match counters —
    * decoded feature[0] vs theory (bit-exact float, possible because the
    * fixtures live in the DC-only subspace where a REAL lossy codec is
    * exact) and decoded (width, height) vs the id formula. */
  def jpegGate(spark: SparkSession, docs: DataFrame): DataFrame = {
    val media = withJpegPayload(spark, docs)
    val feats = decodeFeatures(spark, media).toDF()
    feats.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((element_at(col("feature"), 4) * element_at(col("feature"), 5))
          .cast("long")).as("n_px"),
        sum(when(element_at(col("feature"), 1) === theoryJpegF(col("doc_id")), 1L)
          .otherwise(0L)).as("n_feat0_exact"),
        sum(when(
          element_at(col("feature"), 4) ===
            (pmod(col("doc_id"), lit(3)) * 8 + 16).cast("float") &&
          element_at(col("feature"), 5) ===
            (pmod(col("doc_id"), lit(2)) * 8 + 16).cast("float"), 1L)
          .otherwise(0L)).as("n_dims_exact"))
  }

  /** PNG gate aggregation: synth (deflate-compressed, CRC-framed, filter-
    * rotated) → full chunk-walk + inflate + unfilter decode → per-source
    * integer aggregation. No closed form exists for a DEFLATED byte count,
    * so unlike [[featureGate]] the pinned facts are pixel-side: total
    * decoded pixels (header geometry is closed-form in doc_id) and two
    * all-docs-match counters — decoded feature[0] vs theory (bit-exact
    * float) and decoded (width, height) vs the id formula. An external
    * engine verifies every column from `documents.doc_id` alone. */
  def pngGate(spark: SparkSession, docs: DataFrame): DataFrame = {
    val media = withPngPayload(spark, docs)
    val feats = decodeFeatures(spark, media).toDF()
    feats.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((element_at(col("feature"), 4) * element_at(col("feature"), 5))
          .cast("long")).as("n_px"),
        sum(when(element_at(col("feature"), 1) === theoryPngF(col("doc_id")), 1L)
          .otherwise(0L)).as("n_feat0_exact"),
        sum(when(
          element_at(col("feature"), 4) ===
            (pmod(col("doc_id"), lit(16)) + 16).cast("float") &&
          element_at(col("feature"), 5) ===
            (pmod(col("doc_id"), lit(12)) + 16).cast("float"), 1L)
          .otherwise(0L)).as("n_dims_exact"))
  }
}
