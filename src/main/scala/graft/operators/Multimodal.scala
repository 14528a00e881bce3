package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star ops, SURVEY §2.3): media as opaque
  * `binary` columns + typed metadata structs, with decode/feature-extract as
  * partition-local batch transforms.
  *
  * The Spark-side plumbing here is real — schema, batching via
  * `mapPartitions` (the JVM analog of Python's `mapInPandas` batches),
  * partition-friendly shapes, no driver collects. The actual media codec is
  * a clearly-marked deterministic STUB ([[stubDecode]]) because this
  * container ships no image/audio libraries; swapping in a real decoder is a
  * one-function change.
  */
object Multimodal {

  /** Typed per-media metadata carried alongside the payload. */
  final case class MediaMeta(mime: String, width: Int, height: Int, nBytes: Long)

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class FeatureRow(doc_id: Long, feature: Array[Float], n_bytes: Long)

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

  /** STUB decoder — stands in for image/audio decode + feature extraction.
    * Deterministic: 16-bin byte histogram, L1-normalized. Real plumbing,
    * fake codec: replace this body with e.g. a JPEG decode + CNN featurizer;
    * the operator shape (binary => fixed-width float vector) is unchanged. */
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

  /** Partition-local batch decode: binary payload → fixed-width feature
    * vector. `mapPartitions` keeps the (real-world: expensive, native-lib)
    * decoder initialization per-partition, not per-row — the same shape a
    * Pandas-UDF batch decode has in PySpark. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.map(r => FeatureRow(r.doc_id, stubDecode(r.payload), r.payload.length.toLong))
      }
  }

  final case class ResizedRow(
      doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB resize — stands in for an image resampling kernel. Deterministic:
    * keeps every stride-th byte, recomputes the metadata dims. The operator
    * shape (payload × target dims → payload' + dims') and the
    * partition-local batching are the real part. */
  def resize(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val stride = math.max(1, r.payload.length / math.max(1, targetW * targetH))
          val out = r.payload.indices.collect {
            case i if i % stride == 0 => r.payload(i)
          }.toArray
          ResizedRow(r.doc_id, targetW, targetH, out)
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
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          r.payload.grouped(frameBytes).zipWithIndex.collect {
            case (chunk, i) if i % everyNth == 0 => FrameRow(r.doc_id, i, chunk)
          }
        }
      }
  }

  /** End-to-end pipeline: payload → batch decode → per-source feature
    * aggregation (joins features back to the docs dimension columns). */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    val media = withPayload(docs)
    val feats = decodeFeatures(spark, media).toDF()
    feats.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(element_at(col("feature"), 1)).as("avg_bin0"))
  }
}
