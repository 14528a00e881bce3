package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The day-partitioned events layout ([[EventsLayout]]): a date-window
  * probe must bind its predicate as PartitionFilters (planning-time day
  * skipping) and read STRICTLY fewer files than the directory holds —
  * the property that makes every date-bounded event query cheap at
  * 100 TB — while returning exactly the rows a flat date filter would. */
class EventsLayoutSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("date-window probe: PartitionFilters bound, fewer files read, same rows") {
    val dir = s"target/events_days_${System.nanoTime()}"
    val ev = graft.Tables.load(spark, sf, "events")
    EventsLayout.writePartitionedByDay(ev, dir)
    try {
      val d0 = ev.agg(min(to_date(col("ts")))).head().getDate(0).toLocalDate
      val probe = EventsLayout.readDayWindow(spark, dir, d0.plusDays(1), days = 2)

      // planning-time pruning: the date window sits in PartitionFilters on
      // the scan (NOT in PushedFilters/data filters)
      val scans = probe.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, probe.queryExecution.executedPlan.toString)
      val meta = scans.head.metadata
      assert(meta("PartitionFilters").contains("event_date"),
        s"date window must be a partition filter: $meta")

      // strictly fewer files read than written (the fixture spans > 2 days)
      probe.collect()
      val filesRead = scans.map(_.metrics("numFiles").value).sum
      def countParquet(f: java.io.File): Long =
        Option(f.listFiles()).getOrElse(Array.empty).map {
          case d if d.isDirectory => countParquet(d)
          case p if p.getName.endsWith(".parquet") => 1L
          case _ => 0L
        }.sum
      val filesTotal = countParquet(new java.io.File(dir))
      assert(filesRead > 0 && filesRead < filesTotal,
        s"pruning must skip days: read $filesRead of $filesTotal files")

      // answer equivalence: the layout is an execution strategy, not a
      // semantics change
      val expected = ev.filter(
        to_date(col("ts")) >= lit(java.sql.Date.valueOf(d0.plusDays(1))) &&
        to_date(col("ts")) < lit(java.sql.Date.valueOf(d0.plusDays(3)))).count()
      assert(expected > 0, "probe window must be non-empty on the fixture")
      assert(probe.count() === expected)
    } finally CorpusExport.deleteRecursively(new java.io.File(dir))
  }

  test("a day's files are bounded by filesPerDay, not by input task count") {
    val dir = s"target/events_days_bounded_${System.nanoTime()}"
    val ev = graft.Tables.load(spark, sf, "events").repartition(16)
    EventsLayout.writePartitionedByDay(ev, dir, filesPerDay = 1)
    try {
      val dayDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      assert(dayDirs.length > 2, "fixture must span several days")
      dayDirs.foreach { d =>
        val n = d.listFiles().count(_.getName.endsWith(".parquet"))
        assert(n == 1, s"${d.getName} has $n files (16 input tasks must not fan out)")
      }
    } finally CorpusExport.deleteRecursively(new java.io.File(dir))
  }
}
