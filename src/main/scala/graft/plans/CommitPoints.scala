package graft.plans

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Deployment-ready [[Snapshots.CommitPointStrategy]] implementations
  * beyond the POSIX/HDFS default.
  *
  * The claim protocol needs exactly ONE storage primitive: an atomic
  * "create this marker unless it exists". Object stores expose it as a
  * CONDITIONAL PUT — S3 `If-None-Match: *` (supported since 2024-08),
  * GCS `x-goog-if-generation-match: 0`, Azure Blob `If-None-Match: *` —
  * all the same HTTP shape: PUT with a precondition header, where the
  * store answers 200 on the winning write and 412 (Azure also 409) when
  * the object already exists. [[HttpConditionalPutCommitPoint]] speaks
  * that shape directly over the JDK's own [[HttpClient]] — no vendor
  * SDK — so one class covers every conditional-put store; the
  * deployment injects endpoint mapping and request AUTHENTICATION
  * (SigV4 signing, OAuth bearer, SAS token) through the `sign` hook,
  * which sees every request before it is sent.
  *
  * Install process-wide with
  * `Snapshots.setCommitPointStrategy(new HttpConditionalPutCommitPoint(…))`.
  */
object CommitPoints {

  /** Claim acquisition by HTTP conditional put.
    *
    * @param endpoint base URL the claim key is appended to, e.g.
    *   `https://bucket.s3.us-east-1.amazonaws.com` — claim object URL =
    *   `endpoint/keyFor(claimPath)`.
    * @param keyFor maps the store's claim [[org.apache.hadoop.fs.Path]]
    *   to the object key; the default strips the scheme/authority and
    *   uses the path (matching an s3a://bucket/... store rooted at the
    *   same bucket). Keys must be STABLE: two drivers claiming the same
    *   version must compute the same key.
    * @param sign request decorator applied before send — the
    *   deployment's auth (SigV4/OAuth/SAS) and NOTHING ELSE; the
    *   create-if-absent precondition is `preconditionHeaders`' job.
    * @param preconditionHeaders the header(s) that make the PUT
    *   conditional on the object NOT existing. Default
    *   `If-None-Match: *` covers S3 and Azure Blob. **GCS does NOT
    *   honor If-None-Match on PUT** — both racing claimers would get
    *   200 and mutual exclusion silently fails — so a GCS deployment
    *   MUST pass `Seq("x-goog-if-generation-match" -> "0")` (its
    *   create-only precondition) instead.
    * @param createdCodes / heldCodes status classification; anything
    *   else REFUSES loudly (a transient 5xx or auth failure must never
    *   read as "claim held" — the committer would silently rebase on a
    *   healthy head and mask the outage).
    *
    * Contract honored: `tryClaim` answers true for exactly one caller
    * per key while the claim exists (the store's conditional put is the
    * arbiter); answering false spuriously is safe (the commit refuses
    * or rebases, never corrupts); `release` is idempotent (404 = gone
    * already).
    */
  final class HttpConditionalPutCommitPoint(
      endpoint: String,
      keyFor: org.apache.hadoop.fs.Path => String =
        p => p.toUri.getPath.stripPrefix("/"),
      sign: HttpRequest.Builder => HttpRequest.Builder = identity,
      client: HttpClient = HttpClient.newHttpClient(),
      createdCodes: Set[Int] = Set(200, 201),
      heldCodes: Set[Int] = Set(409, 412),
      preconditionHeaders: Seq[(String, String)] =
        Seq("If-None-Match" -> "*"))
      extends Snapshots.CommitPointStrategy {

    require(preconditionHeaders.nonEmpty,
      "an UNconditional PUT cannot arbitrate a claim — every racing " +
        "writer would win; pass the store's create-only precondition " +
        "header (S3/Azure If-None-Match: *, GCS x-goog-if-generation-match: 0)")

    private def url(claim: org.apache.hadoop.fs.Path): URI =
      URI.create(s"${endpoint.stripSuffix("/")}/${keyFor(claim)}")

    override def tryClaim(fs: org.apache.hadoop.fs.FileSystem,
        claim: org.apache.hadoop.fs.Path): Boolean = {
      val req = sign(preconditionHeaders.foldLeft(
          HttpRequest.newBuilder(url(claim))) { case (b, (h, v)) =>
            b.header(h, v)
          }.PUT(HttpRequest.BodyPublishers.noBody()))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
      val code = resp.statusCode()
      if (createdCodes.contains(code)) true
      else if (heldCodes.contains(code)) false
      else throw graft.core.GraftAnalysisException(Seq(
        s"conditional-put claim at ${url(claim)} answered HTTP $code — " +
          "neither created nor precondition-failed; refusing the commit " +
          "rather than guessing (a 5xx/auth failure read as 'held' " +
          "would silently mask the outage as contention)"))
    }

    override def release(fs: org.apache.hadoop.fs.FileSystem,
        claim: org.apache.hadoop.fs.Path): Unit = {
      val req = sign(HttpRequest.newBuilder(url(claim)).DELETE()).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
      val code = resp.statusCode()
      // 404 = already gone (idempotent release); anything else non-2xx is
      // an operational failure the committer must hear about, because a
      // leaked claim wedges the version number for every later writer
      if (code != 200 && code != 202 && code != 204 && code != 404)
        throw graft.core.GraftAnalysisException(Seq(
          s"conditional-put claim RELEASE at ${url(claim)} answered " +
            s"HTTP $code — the claim may still be held; delete the " +
            "object manually or the store stays wedged at this version"))
    }
  }
}
