package graft.streaming

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Driver-side parquet plumbing for the streaming sync-gate harnesses.
  *
  * The sentinel-flushed gates each need two one/two-row parquet files
  * dropped into the file-source directory, plus the staged file's
  * max(event time) to aim the sentinels past the watermark. Round 10
  * built each sentinel with a Spark job (`Seq(..).toDF.coalesce(1)
  * .write.parquet`) and the max with a second full-scan job — five
  * harness gates × three jobs of pure fixed cost, the single largest
  * line in the bench after the operators themselves (VERDICT r10 §2).
  * Both are droplet-sized driver work: this writes the rows straight
  * through parquet-java's example writer (micros-NTZ timestamps, the
  * exact physical type `EventPipeline.rawSchema` reads back), and reads
  * max(ts) from the parquet FOOTER statistics — zero Spark jobs, zero
  * listing races. The production path is untouched: these files exist
  * only to advance watermarks inside the gate harness.
  */
private[streaming] object SentinelFiles {

  /** One sentinel event row: (event_id, ts, user_id, event_type, value,
    * props) — the raw events schema. */
  type EventRow = (Long, LocalDateTime, Long, String, Double, String)

  /** Parquet twin of [[EventPipeline.rawSchema]]: TIMESTAMP_NTZ is INT64
    * timestamp(MICROS, isAdjustedToUTC = false). */
  private val schema: MessageType = Types.buildMessage()
    .required(PrimitiveTypeName.INT64).named("event_id")
    .required(PrimitiveTypeName.INT64)
    .as(LogicalTypeAnnotation.timestampType(
      /* isAdjustedToUTC = */ false, LogicalTypeAnnotation.TimeUnit.MICROS))
    .named("ts")
    .required(PrimitiveTypeName.INT64).named("user_id")
    .required(PrimitiveTypeName.BINARY)
    .as(LogicalTypeAnnotation.stringType()).named("event_type")
    .required(PrimitiveTypeName.DOUBLE).named("value")
    .required(PrimitiveTypeName.BINARY)
    .as(LogicalTypeAnnotation.stringType()).named("props")
    .named("spark_schema")

  private def micros(ts: LocalDateTime): Long =
    ts.toEpochSecond(ZoneOffset.UTC) * 1000000L + ts.getNano / 1000

  /** Write `rows` as a single parquet file at `target` (driver-side, no
    * Spark job). The caller moves the finished file into the polled
    * source directory atomically, exactly like the staged-copy dance the
    * Spark-written sentinels used. */
  def writeEvents(target: java.nio.file.Path, rows: Seq[EventRow]): Unit = {
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(target.toString), conf))
      .withConf(conf)
      .withType(schema)
      .build()
    try rows.foreach { case (id, ts, uid, eventType, value, props) =>
      val g = new SimpleGroup(schema)
      g.add("event_id", id)
      g.add("ts", micros(ts))
      g.add("user_id", uid)
      g.add("event_type", eventType)
      g.add("value", value)
      g.add("props", props)
      writer.write(g)
    } finally writer.close()
  }

  /** max(ts) of a single events parquet file from its FOOTER statistics
    * (every row group's ts max), `None` when any row group lacks stats OR
    * the ts column is not annotated micros-NTZ — a millis-encoded INT64
    * read as micros would aim the sentinels ~1000× too early and the
    * watermark would silently never flush; callers fall back to the
    * Spark aggregate then. */
  def maxTsFromFooter(file: java.nio.file.Path): Option[LocalDateTime] = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toString), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      val tsIsMicrosNtz = fileSchema.getFields.asScala.exists { f =>
        f.getName == "ts" && f.isPrimitive &&
          (f.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS && !t.isAdjustedToUTC
            case _ => false
          })
      }
      if (!tsIsMicrosNtz) return None
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val maxes = blocks.map { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == "ts").flatMap { c =>
          val st: org.apache.parquet.column.statistics.Statistics[_] = c.getStatistics
          if (st == null || st.isEmpty || !st.hasNonNullValue) None
          else st.genericGetMax match {
            case l: java.lang.Long => Some(l.longValue())
            case _ => None
          }
        }
      }
      if (maxes.isEmpty || maxes.exists(_.isEmpty)) None
      else {
        val us = maxes.flatten.max
        Some(LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC))
      }
    } finally reader.close()
  }
}
