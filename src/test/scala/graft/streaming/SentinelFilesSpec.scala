package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The driver-side parquet contract behind the watermark sentinels: the
  * file [[SentinelFiles.writeEvents]] writes must read back EXACTLY under
  * `EventPipeline.rawSchema` (TIMESTAMP_NTZ = INT64 micros, isAdjustedToUTC
  * = false — get the annotation wrong and the file source either dies or,
  * worse, shifts the sentinel's event time by the session zone and the
  * watermark silently misses its flush target), and the footer-stats
  * max(ts) must equal the Spark aggregate it replaces. */
class SentinelFilesSpec extends SparkTestBase {

  private val rows: Seq[SentinelFiles.EventRow] = Seq(
    (-1L, java.time.LocalDateTime.of(2024, 3, 1, 12, 30, 15, 123456000),
      -1L, "sentinel", 0.0, "{}"),
    (7L, java.time.LocalDateTime.of(2024, 3, 2, 0, 0, 0, 1000),
      42L, "click", 3.5, """{"k":1}"""))

  test("writeEvents round-trips byte-exactly under the stream's rawSchema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sentinel_spec")
    val f = dir.resolve("part-z1.parquet")
    try {
      SentinelFiles.writeEvents(f, rows)
      val back = spark.read.schema(EventPipeline.rawSchema).parquet(f.toString)
        .orderBy(col("event_id"))
        .collect()
        .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
          r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
        .toSeq
      assert(back === rows.sortBy(_._1))
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(x => x.delete(): Unit))
      dir.toFile.delete(): Unit
    }
  }

  test("footer-stats max(ts) equals the Spark aggregate it replaces") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sentinel_spec")
    val f = dir.resolve("part-a.parquet")
    try {
      SentinelFiles.writeEvents(f, rows)
      val viaFooter = SentinelFiles.maxTsFromFooter(f)
      val viaSpark = spark.read.schema(EventPipeline.rawSchema)
        .parquet(f.toString)
        .agg(max(col("ts"))).head().getAs[java.time.LocalDateTime](0)
      assert(viaFooter === Some(viaSpark))
      assert(viaSpark === rows.map(_._2).max(Ordering.by((t: java.time.LocalDateTime) =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000)))
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(x => x.delete(): Unit))
      dir.toFile.delete(): Unit
    }
  }

  test("a millis-annotated ts column is rejected (None), never misread as micros") {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    val milliSchema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.MILLIS))
      .named("ts")
      .named("spark_schema")
    val dir = java.nio.file.Files.createTempDirectory("graft_sentinel_millis")
    val f = dir.resolve("part-m.parquet")
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      GroupWriteSupport.setSchema(milliSchema, conf)
      val w = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toString), conf))
        .withConf(conf).withType(milliSchema).build()
      try {
        val g = new SimpleGroup(milliSchema)
        g.add("ts", 1709294415123L) // millis — ÷1000 off if read as micros
        w.write(g)
      } finally w.close()
      // a millis max misread as micros would aim a watermark sentinel
      // ~1000× too early; the guard must force the Spark-aggregate
      // fallback instead
      assert(SentinelFiles.maxTsFromFooter(f) === None)
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(x => x.delete(): Unit))
      dir.toFile.delete(): Unit
    }
  }

  test("footer max also holds for the driver-generated events fixture (the staged file)") {
    val staged = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    val viaFooter = SentinelFiles.maxTsFromFooter(staged)
    val viaSpark = spark.read.schema(EventPipeline.rawSchema)
      .parquet(staged.toString)
      .agg(max(col("ts"))).head().getAs[java.time.LocalDateTime](0)
    // footer stats may legitimately be absent (None → harness falls back
    // to the aggregate); when present they MUST agree with the scan
    viaFooter.foreach(got => assert(got === viaSpark))
  }
}
