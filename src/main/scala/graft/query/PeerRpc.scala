package graft.query

/** The ONE peer-RPC client for every fleet scatter path (BM25 partials,
  * facets, neighbors, vectors, similar-docs). Timeout discipline and retry
  * policy live here and nowhere else: the 5 s connect / 30 s request bounds
  * exist because a SIGSTOPped or GC-wedged shard must FAIL a scatter, not
  * park a coordinator worker thread forever until the serving pool is
  * pinned — and a policy fix must not have to be replayed across per-class
  * copies (the round-4 fleet-wedging bug was exactly a missing copy of
  * these timeouts).
  */
object PeerRpc {

  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5))
    .build()

  /** POST `body` as JSON; completes with the response body on 200, fails
    * the future on any other status (a restarting shard's 503 is transport-
    * class: retryable by [[joinRetry]] or the caller's policy).
    */
  def postAsync(url: String, body: String)
      : java.util.concurrent.CompletableFuture[String] =
    client.sendAsync(
      java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
      .thenApply(r =>
        if (r.statusCode() == 200) r.body()
        else sys.error(s"peer $url -> ${r.statusCode()}: ${r.body().take(200)}"))

  /** The JDK HttpRequest.timeout only bounds time-to-RESPONSE-HEADERS: once
    * a shard has written its status line, a stall mid-BODY (SIGSTOP, long GC
    * pause) fires no HttpTimeoutException and an unbounded join would park
    * the coordinator worker forever — the exact wedge the 30 s bound exists
    * to prevent. Slightly above the request timeout so the JDK timer still
    * classifies the slow-connect/slow-status cases first.
    */
  private val JoinTimeoutSec = 35L

  /** Join with ONE bounded retry on a fresh connection: transient resets and
    * restarting shards recover; a persistently-dead shard still fails the
    * request loudly. BOTH joins are deadline-bounded (see [[JoinTimeoutSec]]).
    */
  def joinRetry(url: String, body: String,
      fut: java.util.concurrent.CompletableFuture[String],
      timeoutSec: Long = JoinTimeoutSec): String =
    // orTimeout on a DERIVED future (copy()), not the caller's: orTimeout
    // completes its receiver exceptionally on expiry as a side effect, and a
    // caller sharing `fut` with another consumer would observe an injected
    // TimeoutException it never asked for
    try fut.copy().orTimeout(timeoutSec, java.util.concurrent.TimeUnit.SECONDS).join()
    catch { case _: Exception =>
      postAsync(url, body)
        .orTimeout(timeoutSec, java.util.concurrent.TimeUnit.SECONDS).join() }
}
