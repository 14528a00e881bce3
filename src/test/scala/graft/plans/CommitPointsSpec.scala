package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the HTTP conditional-put commit point against a real (in-JVM)
  * HTTP server speaking S3 `If-None-Match: *` semantics — the claim
  * race matrix, the loud 5xx refusal — and soaks the WHOLE commit
  * protocol with 8 genuinely concurrent committers under BOTH
  * strategies (POSIX O_EXCL and conditional put): dense chain, bounded
  * rebase ceiling, refusals only on genuine doc_id overlap, final
  * content equal to the serial replay. */
class CommitPointsSpec extends SparkTestBase {

  private def freshRoot(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_cpoint")

  private def doc(id: Long, split: String, text: String) =
    (id, split, text, text.length.toLong)

  private def df(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "split", "text", "n_tokens")
  }

  /** In-JVM object store speaking the conditional-put subset: PUT with
    * `If-None-Match: *` → 200 when the key was absent (putIfAbsent is
    * the atomicity), 412 when present; DELETE → 204/404. `failures`
    * injects 500s. */
  private final class CondPutServer {
    private val objects =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        val key = ex.getRequestURI.getPath
        if (failures.getAndUpdate(n => math.max(0, n - 1)) > 0) {
          ex.sendResponseHeaders(500, -1)
        } else ex.getRequestMethod match {
          case "PUT" =>
            val conditional =
              "*" == ex.getRequestHeaders.getFirst("If-None-Match")
            val body = ex.getRequestBody.readAllBytes()
            if (!conditional) { objects.put(key, body); ex.sendResponseHeaders(200, -1) }
            else if (objects.putIfAbsent(key, body) == null)
              ex.sendResponseHeaders(200, -1)
            else ex.sendResponseHeaders(412, -1)
          case "DELETE" =>
            if (objects.remove(key) != null) ex.sendResponseHeaders(204, -1)
            else ex.sendResponseHeaders(404, -1)
          case _ => ex.sendResponseHeaders(405, -1)
        }
      } finally ex.close()
    })
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def held: Set[String] = {
      import scala.jdk.CollectionConverters._
      objects.keySet().asScala.toSet
    }
  }

  private def withStrategy[A](st: Snapshots.CommitPointStrategy)(body: => A): A = {
    Snapshots.setCommitPointStrategy(st)
    try body finally Snapshots.setCommitPointStrategy(Snapshots.DefaultCommitPoint)
  }

  test("conditional put grants the claim to exactly one of 8 racing threads") {
    val srv = new CondPutServer
    try {
      val st = new CommitPoints.HttpConditionalPutCommitPoint(srv.endpoint)
      val claim = new org.apache.hadoop.fs.Path("/tmp/x/_versions/.v2.claim")
      val fs = claim.getFileSystem(spark.sparkContext.hadoopConfiguration)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val start = new java.util.concurrent.CountDownLatch(1)
      val rs = (0 until 8).map { _ =>
        Future { start.await(); st.tryClaim(fs, claim) }
      }
      start.countDown()
      val wins = rs.map(r => Await.result(r, 60.seconds))
      assert(wins.count(identity) === 1, s"exactly one winner: $wins")
      // release is idempotent; the key then claims again
      st.release(fs, claim); st.release(fs, claim)
      assert(st.tryClaim(fs, claim))
    } finally srv.stop()
  }

  test("a 5xx from the store REFUSES the commit instead of reading as 'claim held'") {
    val srv = new CondPutServer
    try {
      val st = new CommitPoints.HttpConditionalPutCommitPoint(srv.endpoint)
      val claim = new org.apache.hadoop.fs.Path("/tmp/x/_versions/.v9.claim")
      val fs = claim.getFileSystem(spark.sparkContext.hadoopConfiguration)
      srv.failures.set(1)
      val e = intercept[graft.core.GraftAnalysisException] {
        st.tryClaim(fs, claim)
      }
      assert(e.getMessage.contains("HTTP 500"), e.getMessage)
      // after the blip the claim works normally
      assert(st.tryClaim(fs, claim))
    } finally srv.stop()
  }

  /** GCS-shaped double: honors `x-goog-if-generation-match: 0` as the
    * create-only precondition and — like real GCS — silently IGNORES
    * `If-None-Match` on PUT, treating such a request as an
    * unconditional overwrite. The hazard the `preconditionHeaders`
    * parameter exists for. */
  private final class GcsShapedServer {
    private val objects =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        val key = ex.getRequestURI.getPath
        ex.getRequestMethod match {
          case "PUT" =>
            val conditional = "0" == ex.getRequestHeaders
              .getFirst("x-goog-if-generation-match")
            val body = ex.getRequestBody.readAllBytes()
            if (!conditional) {
              // GCS: If-None-Match on PUT is not a precondition —
              // every writer "wins"
              objects.put(key, body); ex.sendResponseHeaders(200, -1)
            } else if (objects.putIfAbsent(key, body) == null)
              ex.sendResponseHeaders(200, -1)
            else ex.sendResponseHeaders(412, -1)
          case "DELETE" =>
            if (objects.remove(key) != null) ex.sendResponseHeaders(204, -1)
            else ex.sendResponseHeaders(404, -1)
          case _ => ex.sendResponseHeaders(405, -1)
        }
      } finally ex.close()
    })
    server.start()
    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("GCS deployments pass x-goog-if-generation-match: 0 — and the S3 default provably double-grants there") {
    val srv = new GcsShapedServer
    try {
      val fs = new org.apache.hadoop.fs.Path("/")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the documented GCS recipe: single winner among 8 racers
      val gcs = new CommitPoints.HttpConditionalPutCommitPoint(srv.endpoint,
        preconditionHeaders = Seq("x-goog-if-generation-match" -> "0"))
      val claim = new org.apache.hadoop.fs.Path("/tmp/g/_versions/.v2.claim")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val start = new java.util.concurrent.CountDownLatch(1)
      val rs = (0 until 8).map { _ =>
        Future { start.await(); gcs.tryClaim(fs, claim) }
      }
      start.countDown()
      val wins = rs.map(r => Await.result(r, 60.seconds))
      assert(wins.count(identity) === 1, s"exactly one winner: $wins")
      // the S3/Azure DEFAULT against a GCS-shaped store: BOTH claimers
      // get 200 — the silent two-winner failure the constructor
      // parameter documents; never ship the default against GCS
      val s3Default = new CommitPoints.HttpConditionalPutCommitPoint(srv.endpoint)
      val other = new org.apache.hadoop.fs.Path("/tmp/g/_versions/.v3.claim")
      assert(s3Default.tryClaim(fs, other) && s3Default.tryClaim(fs, other),
        "GCS ignores If-None-Match on PUT: the default header must " +
          "double-grant here (that is the documented hazard)")
    } finally srv.stop()
  }

  test("an empty preconditionHeaders refuses at construction (an unconditional PUT cannot arbitrate)") {
    val e = intercept[IllegalArgumentException] {
      new CommitPoints.HttpConditionalPutCommitPoint("http://127.0.0.1:1",
        preconditionHeaders = Nil)
    }
    assert(e.getMessage.contains("precondition"), e.getMessage)
  }

  test("the full commit protocol runs over the conditional-put strategy (dense two-writer race)") {
    val srv = new CondPutServer
    val root = freshRoot()
    try {
      val st = new CommitPoints.HttpConditionalPutCommitPoint(srv.endpoint)
      withStrategy(st) {
        Snapshots.commitFull(spark, df(Seq(doc(1, "a", "one"))), root.toString)
        val none = df(Nil).select(col("split"), col("doc_id"))
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val start = new java.util.concurrent.CountDownLatch(1)
        val fs = (0 until 2).map { i =>
          Future {
            start.await()
            Snapshots.commitDelta(spark, root.toString,
              adds = df(Seq(doc(10L + i, "a", s"racer$i"))), removedIds = none)
          }
        }
        start.countDown()
        assert(fs.map(f => Await.result(f, 180.seconds)).toSet === Set(2, 3))
        // every claim was released — nothing left wedging the store
        assert(srv.held.isEmpty, s"leaked claims: ${srv.held}")
      }
    } finally {
      srv.stop()
      CorpusExport.deleteRecursively(root.toFile)
    }
  }

  /** The soak body shared by both strategies: writers 0–5 disjoint,
    * writers 6 and 7 BOTH updating doc 999 (identical payload, so the
    * final content is deterministic whichever of them lands — or both,
    * when they happen to serialize instead of interleave). */
  private def soak(label: String): Unit = {
    val root = freshRoot()
    try {
      spark.conf.set("spark.graft.snapshot.maxRebaseAttempts", "16")
      try {
        Snapshots.commitFull(spark, df(Seq(
          doc(999, "hot", "v0"), doc(1, "cold", "seed"))), root.toString)
        val none = df(Nil).select(col("split"), col("doc_id"))
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val start = new java.util.concurrent.CountDownLatch(1)
        val runs = (0 until 8).map { i =>
          Future {
            start.await()
            val delta =
              if (i < 6) df(Seq(doc(100L + i, s"s$i", s"w$i")))
              else df(Seq(doc(999, "hot", "updated"))) // identical payload
            try Right(Snapshots.commitDelta(spark, root.toString,
              adds = delta, removedIds = none))
            catch { case e: graft.core.GraftAnalysisException => Left((i, e)) }
          }
        }
        start.countDown()
        val done = runs.map(r => Await.result(r, 600.seconds))
        val refused = done.collect { case Left(x) => x }
        val landed = done.collect { case Right(v) => v }
        // every refusal is a GENUINE overlap on doc 999 between the two
        // hot writers — a disjoint writer refused means the rebase
        // ceiling or the overlap check is wrong
        refused.foreach { case (i, e) =>
          assert(i >= 6, s"[$label] disjoint writer $i refused: ${e.getMessage}")
          assert(e.getMessage.contains("999"), s"[$label] ${e.getMessage}")
        }
        assert(refused.size <= 1, s"[$label] at most one hot writer can lose")
        // DENSE chain: one version per landed commit, no gaps, no extras
        assert(landed.toSet === (2 to (1 + landed.size)).toSet,
          s"[$label] dense chain expected: $landed")
        assert(Snapshots.latestVersion(spark, root.toString) === 1 + landed.size)
        // content equals the serial replay (identical hot payload makes
        // it deterministic under every interleaving)
        val expected = Set(
          (1L, "cold", "seed"), (999L, "hot", "updated")) ++
          (0 until 6).map(i => (100L + i, s"s$i", s"w$i"))
        val got = Snapshots.readAt(spark, root.toString,
            Snapshots.latestVersion(spark, root.toString))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .toSet
        assert(got === expected, s"[$label] soak content diverged")
      } finally spark.conf.unset("spark.graft.snapshot.maxRebaseAttempts")
    } finally CorpusExport.deleteRecursively(root.toFile)
  }

  test("8-writer soak: POSIX O_EXCL strategy") {
    soak("posix")
  }

  test("8-writer soak: HTTP conditional-put strategy") {
    val srv = new CondPutServer
    try {
      withStrategy(new CommitPoints.HttpConditionalPutCommitPoint(srv.endpoint)) {
        soak("condput")
      }
      assert(srv.held.isEmpty, s"leaked claims: ${srv.held}")
    } finally srv.stop()
  }
}
