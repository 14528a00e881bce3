package graft.core

import graft.SparkTestBase
import graft.operators.Clusters
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** The session-configurable checkpoint strategy every iterative path runs
  * through. The reliable tests drive a REAL `DataFrame.checkpoint` against
  * a local directory standing in for DFS — the deployment path a cluster
  * on preemptible nodes depends on. */
class CheckpointSpec extends SparkTestBase {

  private def ckptFilesUnder(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p =>
        java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.startsWith("part-")).toList
    } finally s.close()
  }

  test("local mode (default) truncates lineage in-memory") {
    val s = spark.newSession()
    import s.implicits._
    val out = Checkpoint((1 to 100).toDF("n").filter($"n" % 2 === 0))
    assert(out.queryExecution.analyzed.isInstanceOf[LogicalRDD])
    assert(out.count() === 50)
    val rdd = out.queryExecution.analyzed.asInstanceOf[LogicalRDD].rdd
    assert(rdd.getCheckpointFile.isEmpty, "local mode must not write files")
    Checkpoint.free(out)
  }

  test("reliable mode writes replicated-style checkpoint files; free deletes them") {
    val s = spark.newSession()
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec")
    try {
      s.conf.set(Checkpoint.ModeKey, "reliable")
      s.conf.set(Checkpoint.DirKey, dir.toString)
      val out = Checkpoint((1 to 100).toDF("n").withColumn("sq", $"n" * $"n"))
      assert(out.count() === 100)
      val rdd = out.queryExecution.analyzed.asInstanceOf[LogicalRDD].rdd
      assert(rdd.getCheckpointFile.nonEmpty, "reliable mode must checkpoint to the dir")
      assert(rdd.getCheckpointFile.get.contains(dir.getFileName.toString))
      assert(ckptFilesUnder(dir).nonEmpty, "checkpoint part files must exist on disk")
      // result survives independent of any upstream state
      assert(out.agg(sum($"sq")).head().getLong(0) === (1 to 100).map(n => n.toLong * n).sum)
      Checkpoint.free(out)
      assert(ckptFilesUnder(dir).isEmpty, "free() must delete a superseded reliable checkpoint")
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(f => deleteRec(f)))
      dir.toFile.delete(): Unit
    }
  }

  test("reliable mode is ALWAYS eager — a lazy request still writes files immediately") {
    // Spark checkpoints only the TOPMOST marked RDD per job: honoring
    // eager=false in reliable mode would let an iterative loop mark every
    // round and WRITE none of them (no files, no lineage cut). The
    // contract is therefore: reliable ⇒ files exist when apply() returns.
    val s = spark.newSession()
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_lazy")
    try {
      s.conf.set(Checkpoint.ModeKey, "reliable")
      s.conf.set(Checkpoint.DirKey, dir.toString)
      val out = Checkpoint((1 to 50).toDF("n").filter($"n" > 10), eager = false)
      val rdd = out.queryExecution.analyzed.asInstanceOf[LogicalRDD].rdd
      assert(rdd.getCheckpointFile.nonEmpty,
        "reliable-mode checkpoint must be written before apply() returns")
      assert(ckptFilesUnder(dir).nonEmpty)
      assert(out.count() === 40)
      Checkpoint.free(out)
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(f => deleteRec(f)))
      dir.toFile.delete(): Unit
    }
  }

  test("reliable mode leaves a caller-persisted frame's cache intact") {
    // the transient persist/unpersist pair exists to avoid computing the
    // plan twice; a frame the CALLER already persisted must keep its
    // cache (same caller-owned-cache guard as Channels.multiSink)
    val s = spark.newSession()
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_cached")
    try {
      s.conf.set(Checkpoint.ModeKey, "reliable")
      s.conf.set(Checkpoint.DirKey, dir.toString)
      val cached = (1 to 100).toDF("n").filter($"n" % 2 === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val out = Checkpoint(cached)
        assert(out.count() === 50)
        assert(cached.storageLevel !==
          org.apache.spark.storage.StorageLevel.NONE,
          "Checkpoint() must not destroy a caller-owned cache")
        val rdd = out.queryExecution.analyzed.asInstanceOf[LogicalRDD].rdd
        assert(rdd.getCheckpointFile.nonEmpty,
          "the cached frame must still be reliably checkpointed")
        Checkpoint.free(out)
      } finally { cached.unpersist(blocking = false); () }
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(f => deleteRec(f)))
      dir.toFile.delete(): Unit
    }
  }

  test("repeated reliable checkpoints reuse one context dir (no per-call UUID-dir leak)") {
    val s = spark.newSession()
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_reuse")
    try {
      s.conf.set(Checkpoint.ModeKey, "reliable")
      s.conf.set(Checkpoint.DirKey, dir.toString)
      val frames = (1 to 3).map(i => Checkpoint((1 to 10).toDF("n").withColumn("i", lit(i))))
      // setCheckpointDir mkdirs a UUID subdir per CALL — three checkpoints
      // must share one, not strand two empties free() can never reach
      val uuidDirs = Option(dir.toFile.listFiles()).toSeq.flatten.filter(_.isDirectory)
      assert(uuidDirs.length === 1,
        s"expected one shared UUID dir, found ${uuidDirs.length}")
      frames.foreach(Checkpoint.free)
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(f => deleteRec(f)))
      dir.toFile.delete(): Unit
    }
  }

  test("a stale (deleted) context checkpoint dir is refused, not silently recreated") {
    val s = spark.newSession()
    import s.implicits._
    s.conf.set(Checkpoint.ModeKey, "reliable")
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_stale")
    s.sparkContext.setCheckpointDir(dir.toString)
    // sweep it — the isolated-gate shape: the session that set the
    // context-level dir deleted its temp tree on the way out. A later
    // DirKey-less reliable user must get the loud error, not silently
    // recreated checkpoints at a path that was someone's swept temp dir.
    Option(dir.toFile.listFiles()).foreach(_.foreach(f => deleteRec(f)))
    dir.toFile.delete(): Unit
    val ex = intercept[GraftAnalysisException](Checkpoint((1 to 3).toDF("n")))
    assert(ex.getMessage.contains("no longer exists"))
  }

  test("reliable mode without a directory fails loudly") {
    // fresh session; the context-level checkpoint dir may already be set by
    // the test above (SparkContext state is shared), so only assert when not
    val s = spark.newSession()
    s.conf.set(Checkpoint.ModeKey, "reliable")
    if (s.sparkContext.getCheckpointDir.isEmpty) {
      import s.implicits._
      val ex = intercept[GraftAnalysisException](Checkpoint((1 to 3).toDF("n")))
      assert(ex.getMessage.contains(Checkpoint.DirKey))
    }
  }

  test("unknown mode fails loudly") {
    val s = spark.newSession()
    s.conf.set(Checkpoint.ModeKey, "ssd")
    import s.implicits._
    val ex = intercept[GraftAnalysisException](Checkpoint((1 to 3).toDF("n")))
    assert(ex.getMessage.contains("ssd"))
  }

  test("iterative operators honor the strategy end-to-end: resolve under reliable ≡ local") {
    val s = spark.newSession()
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_resolve")
    try {
      // chain 0-1-2-3, pair (10,11), isolated self-pair (20,20)
      val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
        .toDF("a", "b")
      val expected = Clusters.resolve(pairs, "a", "b")
        .as[(Long, Long)].collect().toSet
      s.conf.set(Checkpoint.ModeKey, "reliable")
      s.conf.set(Checkpoint.DirKey, dir.toString)
      val pairsR = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
        .toDF("a", "b")
      val got = Clusters.resolve(pairsR, "a", "b").as[(Long, Long)].collect().toSet
      assert(got === expected)
      assert(got === Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L),
        (10L, 10L), (11L, 10L), (20L, 20L)))
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(f => deleteRec(f)))
      dir.toFile.delete(): Unit
    }
  }

  test("every iterative family honors reliable mode: pageRank, BFS, BPE ≡ local results") {
    import org.apache.spark.sql.functions._
    val sLocal = spark.newSession()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_iter")
    val sRel = spark.newSession()
    sRel.conf.set(Checkpoint.ModeKey, "reliable")
    sRel.conf.set(Checkpoint.DirKey, dir.toString)
    try {
      def edges(s: org.apache.spark.sql.SparkSession) = {
        import s.implicits._
        Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L), (4L, 1L, 5L))
          .toDF("src", "dst", "w")
      }
      def docs(s: org.apache.spark.sql.SparkSession) = {
        import s.implicits._
        Seq((1L, "low lower lowest"), (2L, "new newer newest"), (3L, "low new"))
          .toDF("doc_id", "text")
      }
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

      val prL = rows(graft.operators.Graph.pageRank(edges(sLocal), "src", "dst", "w"))
      val prR = rows(graft.operators.Graph.pageRank(edges(sRel), "src", "dst", "w"))
      assert(prR === prL)

      val bfsL = rows(graft.operators.Graph.bfsDistances(
        edges(sLocal), "src", "dst", edges(sLocal).select(col("src")).limit(1), "src", 3))
      val bfsR = rows(graft.operators.Graph.bfsDistances(
        edges(sRel), "src", "dst", edges(sRel).select(col("src")).limit(1), "src", 3))
      assert(bfsR === bfsL)

      val (mL, vL) = graft.operators.Bpe.trainMerges(sLocal, docs(sLocal), "text", 3)
      val (mR, vR) = graft.operators.Bpe.trainMerges(sRel, docs(sRel), "text", 3)
      assert(rows(mR) === rows(mL))
      assert(rows(vR) === rows(vL))
      assert(rows(mL).nonEmpty && rows(vL).nonEmpty)
    } finally {
      Option(dir.toFile.listFiles()).foreach(_.foreach(f => deleteRec(f)))
      dir.toFile.delete(): Unit
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }
}
