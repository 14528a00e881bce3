package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-files compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming ingest, incremental appends and
  * per-partition exports all accrete kilobyte-scale parquet files, and a
  * scan's task count (and the namenode's metadata load) grows with FILE
  * count, not byte count. Compaction rewrites a directory into
  * target-sized files in one shuffle, optionally range-clustered on sort
  * columns so post-compaction scans keep min/max row-group skipping.
  *
  * Content is preserved exactly (a row-level rewrite, no schema or value
  * changes) — the gate pins the round-trip by fingerprint. The rewrite
  * lands in a staging directory first; the swap renames the OLD directory
  * aside before renaming staging into place (and restores it if that
  * second rename fails), so a reader never observes partially WRITTEN
  * files and the no-directory window is two metadata renames, not a
  * recursive delete. True atomic swap needs a transactional table layer
  * (manifest indirection, the CorpusExport manifest discipline) — on a
  * plain directory, rename-aside is the strongest contract available,
  * and local-filesystem rename is what this targets (HDFS rename is
  * likewise atomic per entry; cross-filesystem moves are out of scope).
  */
object Compaction {

  final case class Report(
      filesBefore: Int, bytesBefore: Long, filesAfter: Int, bytesAfter: Long)

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  /** Rewrite the parquet files under `inDir` into ≈`targetBytes` files at
    * `outDir`. With `sortCols`, rows are range-partitioned and sorted so
    * each output file covers a disjoint key range (skipping-friendly);
    * without, a round-robin repartition balances bytes. The output file
    * count is sized from the INPUT bytes (compressed), so the default
    * target yields ~128 MB files — the usual HDFS/S3 sweet spot. */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val target = new java.io.File(outDir)
    val bak = new java.io.File(outDir + ".bak")
    // the stranded-.bak refusal runs BEFORE the rewrite: a previous run's
    // failed rollback holding the only copy must stop the compaction
    // before it pays for (at the stated scale, hours of) shuffle
    if (bak.exists() && !target.exists())
      throw new java.io.IOException(
        s"refusing to compact: a previous failed swap left the only copy at $bak; recover it first")
    val in = new java.io.File(inDir)
    val before = parquetFiles(in)
    // flat directories only: a hive-partitioned layout (key=value
    // subdirs) has its parquet one level down AND must keep its layout —
    // compact those PER PARTITION DIRECTORY (the affected-partition
    // discipline of CorpusExport.applyDelta), not through this flat path
    require(before.nonEmpty,
      s"no parquet files directly under $inDir — for a partitioned " +
        "layout, compact each partition directory individually")
    val bytesBefore = before.map(_.length()).sum
    val n = math.max(1, math.ceil(bytesBefore.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.nonEmpty) {
        val keys = sortCols.map(col)
        df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
      } else df.repartition(n)
    val staging = outDir + ".staging"
    shaped.write.mode("overwrite").parquet(staging)
    // swap: old → .bak, staging → target, delete .bak — the old data
    // stays intact (and is restored) if the forward rename fails, and the
    // target-absent window shrinks to two rename calls
    CorpusExport.deleteRecursively(bak)
    if (target.exists() && !target.renameTo(bak))
      throw new java.io.IOException(s"compaction swap failed: $outDir -> $bak")
    if (!new java.io.File(staging).renameTo(target)) {
      val restored = !bak.exists() || bak.renameTo(target)
      throw new java.io.IOException(
        s"compaction swap failed: $staging -> $outDir" +
          (if (restored) " (old data restored)"
           else s"; ROLLBACK ALSO FAILED — old data preserved at $bak"))
    }
    CorpusExport.deleteRecursively(bak)
    val after = parquetFiles(target)
    Report(before.size, bytesBefore, after.size, after.map(_.length()).sum)
  }
}
