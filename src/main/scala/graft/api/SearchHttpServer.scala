package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import org.json4s._
import org.json4s.jackson.JsonMethods.{compact, parse, render}
import graft.query.{QuerySpec, SearchNode, SearchResult}

/** The reference's FastAPI serving surface (backend/api/search_api.py),
  * re-expressed over the resident serving node — JDK built-in HttpServer +
  * Spark's bundled json4s, zero new dependencies:
  *
  *   - POST /api/search  — SearchRequest payload (query, language,
  *     exact_match, exclude_words, categories, start/end_year,
  *     search_types.{Pravachan,Granth}.{enabled,page_size,page_number}) →
  *     the two-content-type SearchResponse (pravachan_results +
  *     granth_results, each {results, total_hits, page_size, page_number},
  *     plus top-level suggestions) — search_api.py:180-231,365-377. Each
  *     enabled type runs the same QuerySpec with `category` pinned to the
  *     type (U1 dual search).
  *   - GET /api/metadata — per-content-type facet values with the 30-minute
  *     in-memory TTL cache (search_api.py:80-105,112-162).
  *   - POST /api/cache/invalidate — clears the cache (search_api.py:164-178).
  *
  * Scope note (SURVEY §7.0): the vector/rerank branch of /api/search is the
  * model-dependent remainder — `enable_reranking` is accepted and ignored,
  * every query takes the lexical path (`is_lexical_query` is always true
  * without an embedding model).
  */
final class SearchHttpServer(
    mem: SearchNode,
    metadataFields: Set[String] = Set("Author", "Anuyog", "year"),
    ttlSeconds: Long = 1800,
    nowMs: () => Long = () => System.currentTimeMillis(),
    metadataSupplier: Option[() => Map[String, Map[String, Seq[String]]]] = None,
    port: Int = 0,
    /** delivery swap point for /api/feedback (reference: reCAPTCHA + Brevo
      * email, both external services); default: bounded in-memory buffer
      * (drop-oldest) exposed for tests/CLI flushing */
    feedbackSink: String => Unit = SearchHttpServer.bufferFeedback,
    /** per-query metrics delivery (reference: log_handle.metrics → a
      * metrics.log the exporter parses); default: bounded in-memory buffer
      * — a deployment points this at a rolling file appender */
    metricsSink: String => Unit = SearchHttpServer.bufferMetrics,
    /** granth book store for /api/granth/verse + /api/granth/prose; absent →
      * those endpoints 404 like an empty granth_index */
    granthStore: Option[GranthStore] = None,
    /** ANN engine for /api/similar-documents (a resident [[SimilarDocs]]
      * node or the fleet scatter [[FleetSimilar]]); absent → 503
      * (deployment has no embedding column loaded) */
    similarDocs: Option[SimilarEngine] = None,
    /** fleet-internal scatter surface: set on shard NODES so a
      * [[graft.query.ProcFleet]] coordinator can pull bounded partials /
      * facet metadata / neighbor candidates over sockets
      * (/api/internal/...). Absent on public-only deployments → 404.
      * A SUPPLIER so a hot-reloading node ([[graft.query.ReloadingNode]])
      * can swap the resident index under a running server.
      */
    internalNode: Option[() => graft.query.InMemoryIndex] = None,
    /** this node's own resident ANN graphs, exposed on the internal scatter
      * surface (/api/internal/vec + /api/internal/similar) so a
      * [[FleetSimilar]] coordinator can resolve vectors and pull bounded
      * per-shard neighbor heaps; set on fleet shard nodes */
    internalSimilar: Option[SimilarDocs] = None,
    /** true on fleet SHARD nodes (chunk-subset, no coordinator role): the
      * public endpoints 503 instead of answering from a silent corpus
      * slice — clients must go through the coordinator; only the
      * internal scatter surface (/api/internal/...) serves.
      */
    internalOnly: Boolean = false,
    /** the offline evaluation surface ([[EvalApi]], reference eval/api.py);
      * absent → the /eval endpoints 404 like a deployment without the router
      */
    evalApi: Option[EvalApi] = None) {

  private implicit val formats: Formats = DefaultFormats

  // disable Nagle on response sockets BEFORE the first server is created
  // (ServerConfig reads the property once, at class init): with it off, the
  // fleet's small per-query RPCs hit the classic Nagle+delayed-ACK ~40 ms
  // stall — measured 86 q/s vs 3.3k through the same path with it on
  locally { SearchHttpServer.ensureNoDelay() }

  // loopback by default (the server has no auth); a multi-host fleet —
  // coordinator and shard JVMs on different machines — opts into a routable
  // interface via GRAFT_BIND_ADDR (the port is already a parameter)
  private val server = HttpServer.create(
    new InetSocketAddress(sys.env.getOrElse("GRAFT_BIND_ADDR", "127.0.0.1"), port), 0)
  @volatile private var cache: Option[(JValue, Long)] = None
  // AtomicLong, not a @volatile var: the reload poller and HTTP
  // invalidations are concurrent writers — a lost increment would let an
  // in-flight metadata computation pass the version guard and cache
  // PRE-invalidation data for a full TTL
  private val cacheVersion = new java.util.concurrent.atomic.AtomicLong(0L)
  private val cacheLock = new Object
  // serializes metadata cache FILLS (single-flight); never held by
  // invalidateMetadataCache, which must stay non-blocking for the reloader
  private val computeLock = new Object

  private def supplier(): Map[String, Map[String, Seq[String]]] =
    metadataSupplier.map(_())
      .getOrElse(mem.facetMetadata(metadataFields))

  def boundPort: Int = server.getAddress.getPort

  /** The ACTUALLY bound interface, URL-safe — read from the live socket, not
    * re-derived from the env (a second copy of the GRAFT_BIND_ADDR rule is
    * how a caller's logged URL silently desyncs from the real bind). IPv6
    * literals are bracketed so `http://$host:$port` stays a valid URL.
    */
  def boundHostForUrl: String = {
    val a = server.getAddress.getAddress
    // a wildcard bind (0.0.0.0 / ::) is not a connectable address — log and
    // self-test via the loopback of the same family instead
    if (a.isAnyLocalAddress) {
      if (a.isInstanceOf[java.net.Inet6Address]) "[::1]" else "127.0.0.1"
    } else {
      val h = a.getHostAddress
      if (h.contains(":")) s"[$h]" else h
    }
  }

  private def langCode(l: String): String = Langs.code(l)

  private def respond(ex: HttpExchange, code: Int, json: JValue): Unit = {
    val bytes = compact(render(json)).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseBody(code, bytes)
  }

  private def hitsJson(r: SearchResult): JValue =
    JArray(r.hits.toList.map { h =>
      JObject(
        "document_id" -> JLong(h.docId),
        "score" -> JDouble(h.score),
        "url" -> JString(h.url),
        "language" -> JString(h.lang),
        "highlighted" -> JString(h.highlighted))
    })

  private def handleSearch(body: String, clientIp: String = "test"): JValue = {
    val t0 = nowMs()
    // ONE index snapshot for the whole request: the Pravachan and Granth
    // sections are two search calls, and a hot-reload swap landing between
    // them would return a single response mixing two index versions (e.g.
    // a just-deleted doc in one section, post-delete totals in the other)
    val node = mem.pinned
    var totalHitsAll = 0L
    var degradedAny = false
    val j = parse(body)
    val query = (j \ "query").extractOrElse[String]("")
    val lang = langCode((j \ "language").extractOrElse[String]("hi"))
    val exact = (j \ "exact_match").extractOrElse[Boolean](false)
    val exclude = (j \ "exclude_words").extractOrElse[Seq[String]](Nil)
    val categories: Map[String, Seq[String]] = (j \ "categories") match {
      case JObject(fs) => fs.collect {
        case (k, JArray(vs)) => k -> vs.collect { case JString(s) => s }
      }.toMap
      case _ => Map.empty
    }
    val startYear = (j \ "start_year").extractOpt[Int]
    val endYear = (j \ "end_year").extractOpt[Int]
    val dateRange =
      if (startYear.isDefined || endYear.isDefined) Some((startYear, endYear)) else None

    def typeCfg(name: String): (Boolean, Int, Int) = {
      val t = j \ "search_types" \ name
      ( (t \ "enabled").extractOrElse[Boolean](true),
        (t \ "page_size").extractOrElse[Int](20),
        (t \ "page_number").extractOrElse[Int](1))
    }
    def validateCfg(name: String): Unit = {
      val (enabled, pageSize, pageNumber) = typeCfg(name)
      // a DISABLED section's page config is never used — the reference
      // skips the section before touching it, so validating it would 400 a
      // request the reference serves
      if (!enabled) return
      if (pageSize <= 0 || pageNumber <= 0)
        throw new IllegalArgumentException(
          s"$name page_size and page_number must be positive")
      // OpenSearch's max_result_window analog — also closes the Int-overflow
      // hole where from + pageSize wraps negative and a negative-capacity
      // top-k heap silently returns an empty page with 200 OK
      if (pageNumber.toLong * pageSize > SearchHttpServer.MaxResultWindow)
        throw new IllegalArgumentException(
          s"$name page beyond max_result_window " +
            s"(page_number * page_size must be <= ${SearchHttpServer.MaxResultWindow})")
    }
    // BOTH sections validate before the FIRST search runs: a malformed
    // Granth page config must 400 without first paying a full Pravachan
    // search (on a fleet coordinator that is a scatter to every shard)
    validateCfg("Pravachan"); validateCfg("Granth")
    def searchType(name: String): (JValue, Seq[String]) = {
      val (enabled, pageSize, pageNumber) = typeCfg(name)
      if (!enabled)
        return (JObject("results" -> JArray(Nil), "total_hits" -> JInt(0),
          "page_size" -> JInt(pageSize), "page_number" -> JInt(pageNumber)), Nil)
      // reference quirks: the per-type category pin applies ONLY when the
      // client didn't send its own category KEY (index_searcher.py:396-398,
      // 422-424 — presence check, so {"category": []} suppresses the pin),
      // and empty value lists are dropped from the filter entirely
      // (_build_category_filters, index_searcher.py:51-53: `if not values:
      // continue` — an empty list means NO restriction, not match-nothing)
      val metaF =
        (if (categories.contains("category")) categories
         else categories + ("category" -> Seq(name)))
          .filter(_._2.nonEmpty)
      val q = QuerySpec(lang, query,
        phrase = exact,
        excludeWords = exclude,
        metaFilters = metaF,
        dateRange = dateRange,
        pageSize = pageSize,
        from = (pageNumber - 1) * pageSize)
      val r = node.search(q)
      totalHitsAll += r.totalHits
      if (r.coverageDegraded) degradedAny = true
      (JObject(
        "results" -> hitsJson(r),
        "total_hits" -> JLong(r.totalHits),
        "page_size" -> JInt(pageSize),
        "page_number" -> JInt(pageNumber)), r.suggestions)
    }
    val (prav, sugP) = searchType("Pravachan")
    val (gran, sugG) = searchType("Granth")
    // routing decision (search_api.py:256-258): advanced options force the
    // lexical path; a non-lexical query would take the reference's
    // vector+rerank branch — the model-dependent remainder — and here falls
    // back to lexical scoring, with the decision surfaced for clients
    val hasAdvanced = exact || exclude.nonEmpty
    val isLexical = graft.ops.HybridRank.isLexicalQuery(query) || hasAdvanced
    // per-query metrics line, reference CSV shape (search_api.py:447-451):
    // search_type is the ROUTE (lexical/vector), totals sum both content
    // types, page config reported from the Pravachan section like the
    // reference
    val (_, mPageSize, mPageNumber) = typeCfg("Pravachan")
    // categories in the reference's str(list) shape, key-sorted so the
    // logged field is deterministic (a Map's toString is not)
    val catStr = "[" +
      categories.toSeq.sortBy(_._1).flatMap(_._2).map(v => s"'$v'").mkString(", ") +
      "]"
    // a metrics-delivery failure (disk full on a file sink) must never fail
    // the search that already completed — the reference's logging layer
    // swallows exporter errors the same way
    try metricsSink(graft.ops.Metrics.lineStr(
      nowMs(), clientIp, query,
      if (isLexical) "lexical" else "vector",
      exact, catStr, lang, enableReranking = false,
      mPageSize, mPageNumber,
      latencyMs = (nowMs() - t0).toDouble, totalResults = totalHitsAll))
    catch {
      case e: Exception => System.err.println(s"[serve] WARN metrics sink failed: ${e.getMessage}")
    }
    val base = JObject(
      "pravachan_results" -> prav,
      "granth_results" -> gran,
      "is_lexical" -> JBool(isLexical),
      "suggestions" -> JArray((sugP ++ sugG).distinct.toList.map(JString(_))))
    // only present when a fleet coordinator served around a dead shard —
    // a degraded page is explicit, never shape-identical to a full one
    if (degradedAny) JObject(base.obj :+ ("coverage_degraded" -> (JBool(true): JValue)))
    else base
  }

  private def metadataJson(): JValue = {
    val now = nowMs()
    cache match {
      case Some((data, ts)) if now - ts < ttlSeconds * 1000 => data
      case _ =>
        // single-flight: K concurrent misses at TTL expiry (or right after
        // an invalidation) must not each pay the full facet computation —
        // on a fleet coordinator that is K whole-fleet scatters with K−1
        // results discarded by last-writer-wins. The winner computes under
        // computeLock; the rest re-check the fresh cache inside it. Lock
        // order is computeLock → cacheLock only (invalidate takes cacheLock
        // alone), so no inversion is possible.
        computeLock.synchronized {
          val now2 = nowMs()
          cache match {
            case Some((data, ts)) if now2 - ts < ttlSeconds * 1000 => data
            case _ =>
              // version guard: an invalidation that lands while a
              // computation is in flight must win — without it the
              // in-flight thread would re-populate the cache with
              // PRE-invalidation data for a full TTL
              val versionAtStart = cacheVersion.get()
              val data: JValue = JObject(supplier().toList.sortBy(_._1).map { case (ct, inner) =>
                ct -> (JObject(inner.toList.sortBy(_._1).map { case (k, vs) =>
                  k -> (JArray(vs.toList.map(JString(_))): JValue)
                }): JValue)
              })
              // check + write under ONE lock shared with invalidate: a bare
              // check-then-act would let an invalidation land between the
              // version test and the assignment, re-caching
              // pre-invalidation facets for a full TTL
              cacheLock.synchronized {
                if (cacheVersion.get() == versionAtStart) cache = Some((data, now2))
              }
              data
          }
        }
    }
  }

  /** Drop the metadata cache (hot-reload swap hook and the
    * /api/cache/invalidate endpoint share this): the version bump makes an
    * in-flight computation lose the re-populate race.
    */
  def invalidateMetadataCache(): Unit = cacheLock.synchronized {
    cacheVersion.incrementAndGet()
    cache = None
  }

  // JDK HttpServer context matching is longest-PREFIX: without this guard
  // /api/searchXYZ would run the search handler and /api/cache/invalidateX
  // would clear the cache instead of 404ing
  private def exactPath(ex: HttpExchange, path: String): Boolean =
    if (ex.getRequestURI.getPath == path) true
    else { respond(ex, 404, JObject("detail" -> JString("Not Found"))); false }

  // shard nodes refuse public traffic outright: a client that hits a
  // chunk-subset node directly would otherwise get 200s silently missing
  // every other shard's corpus slice
  private def publicAllowed(ex: HttpExchange): Boolean =
    if (!internalOnly) true
    else {
      respond(ex, 503, JObject("detail" -> JString(
        "this node serves a chunk subset of a fleet — query the coordinator " +
          "(only /api/internal/* is served here)")))
      false
    }

  publicEndpoint("/api/search") { ex =>
    if (exactPath(ex, "/api/search")) {
      if (ex.getRequestMethod != "POST") respond(ex, 405, JObject("detail" -> JString("POST only")))
      else {
        val body = new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val clientIp = Option(ex.getRemoteAddress)
          .map(_.getAddress.getHostAddress).getOrElse("unknown")
        respond(ex, 200, handleSearch(body, clientIp))
      }
    }
  }

  publicEndpoint("/api/metadata") { ex =>
    if (exactPath(ex, "/api/metadata")) {
      if (ex.getRequestMethod != "GET")
        respond(ex, 405, JObject("detail" -> JString("GET only")))
      else respond(ex, 200, metadataJson())
    }
  }

  publicEndpoint("/api/cache/invalidate") { ex =>
    if (exactPath(ex, "/api/cache/invalidate")) {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, JObject("detail" -> JString("POST only")))
      else {
        invalidateMetadataCache()
        respond(ex, 200, JObject("message" -> JString("Metadata cache invalidated successfully")))
      }
    }
  }

  /** POST /api/feedback — the reference's feedback endpoint
    * (feedback_api.py:115-154): required-field validation (name, subject,
    * feedback; 400 otherwise), trimmed payload, then delivery. The
    * reference's two external calls — reCAPTCHA verification and the Brevo
    * email — are service-dependent swap points (`feedbackSink`); the default
    * sink buffers timestamped JSON rows in a bounded drop-oldest queue for a
    * CLI/ops flusher to drain.
    */
  publicEndpoint("/api/feedback") { ex =>
    if (exactPath(ex, "/api/feedback")) {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, JObject("detail" -> JString("POST only")))
      else {
        val j = parse(new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        def field(k: String): String = (j \ k).extractOrElse[String]("").trim
        val (name, subject, feedback) = (field("name"), field("subject"), field("feedback"))
        if (name.isEmpty || subject.isEmpty || feedback.isEmpty)
          respond(ex, 400, JObject("detail" -> JString("Required fields are missing")))
        else {
          val row = JObject(
            "name" -> JString(name),
            "email" -> JString(field("email")),
            "phoneNumber" -> JString(field("phoneNumber")),
            "subject" -> JString(subject),
            "feedback" -> JString(feedback),
            "submitted_ms" -> JLong(nowMs()))
          feedbackSink(compact(render(row)))
          respond(ex, 200, JObject("message" -> JString("Feedback submitted successfully")))
        }
      }
    }
  }

  // ---- path-parameter + query-parameter endpoints (search_api.py:460-646) ----

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq).getOrElse(Nil)
      .flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(dec(k) -> dec(v))
        case Array(k) if k.nonEmpty => Some(dec(k) -> "")
        case _ => None
      }).toMap

  /** Path suffix after `prefix/` for {id}-style routes; None (404 already
    * sent) when the suffix is missing — same guard discipline as
    * [[exactPath]] against JDK prefix matching.
    *
    * NOT URLDecoder: `URI.getPath` is already %XX-decoded, and URLDecoder's
    * form-encoding semantics would additionally corrupt a literal '+' in a
    * path segment (e.g. a future non-numeric doc id) to a space. Query
    * parameters keep URLDecoder ([[dec]]) — '+' means space THERE.
    */
  private def pathParam(ex: HttpExchange, prefix: String): Option[String] = {
    val p = ex.getRequestURI.getPath
    if (p.startsWith(prefix + "/") && p.length > prefix.length + 1)
      Some(p.substring(prefix.length + 1))
    else { respond(ex, 404, JObject("detail" -> JString("Not Found"))); None }
  }

  private def jstrOrNull(v: Option[String]): JValue =
    v.map(JString(_): JValue).getOrElse(JNull)

  /** One result row in the reference's `_extract_results` shape
    * (index_searcher.py:301-357) from a full docstore payload.
    */
  private def payloadJson(d: graft.query.DocPayload, score: Double): JValue = JObject(
    "document_id" -> JLong(d.docId),
    "original_filename" -> JString(d.url),
    "filename" -> JString(d.url.substring(d.url.lastIndexOf('/') + 1)),
    "page_number" -> (d.meta.get("page_number").flatMap(_.toIntOption)
      .map(JInt(_): JValue).getOrElse(JNull)),
    // paragraph-chunked corpora carry paragraph_id in meta; flat corpora
    // fall back to the chunk id itself (one doc = one paragraph unit)
    "paragraph_id" -> JLong(
      d.meta.get("paragraph_id").flatMap(_.toLongOption).getOrElse(d.docId)),
    "content_snippet" -> JString(d.text),
    "score" -> JDouble(score),
    "metadata" -> JObject(d.meta.toList.sortBy(_._1)
      .map { case (k, v) => k -> (JString(v): JValue) }),
    "file_url" -> JString(d.meta.getOrElse("file_url", "")),
    "date" -> jstrOrNull(d.meta.get("date")),
    "series_start_date" -> jstrOrNull(d.meta.get("series_start_date")),
    "series_end_date" -> jstrOrNull(d.meta.get("series_end_date")))

  // best-effort error reply: when the handler failed AFTER headers went out
  // (client disconnected mid-write → IOException from os.write), a second
  // sendResponseHeaders throws — the original failure is the story, not
  // this reply, so it must not escape the handler
  private def tryRespond(ex: HttpExchange, code: Int, json: JValue): Unit =
    try respond(ex, code, json)
    catch { case _: java.io.IOException | _: IllegalStateException => () }

  private def endpoint(ctx: String)(body: HttpExchange => Unit): Unit =
    server.createContext(ctx, new HttpHandler {
      def handle(ex: HttpExchange): Unit = try body(ex)
      catch {
        // malformed payloads are the client's fault (FastAPI's 422 analog) —
        // same classification as /api/search
        case e @ (_: IllegalArgumentException | _: MappingException |
                  _: com.fasterxml.jackson.core.JacksonException) =>
          tryRespond(ex, 400, JObject("detail" -> JString(s"Validation error: ${e.getMessage}")))
        case e: Exception =>
          tryRespond(ex, 500, JObject("detail" -> JString(s"Internal server error: ${e.getMessage}")))
      } finally ex.close()
    })

  /** [[endpoint]] with the chunk-subset shard guard enforced BY THE ROUTING
    * LAYER: every public route registers through here, so an endpoint added
    * later cannot forget the guard and serve a shard's partial corpus with
    * 200s (the silent-miss failure mode the guard exists to prevent). Only
    * the /api/internal/... routes register via bare [[endpoint]]/createContext.
    */
  private def publicEndpoint(ctx: String)(body: HttpExchange => Unit): Unit =
    endpoint(ctx) { ex => if (publicAllowed(ex)) body(ex) }

  /** GET /api/context/{chunk_id} — previous/current/next paragraph
    * (search_api.py:487-501; two-step get + neighbor term query becomes the
    * node's resident facet lookup, [[graft.query.SearchNode.context]]).
    * Unknown id → 404 (the reference's `if not current → 404` intent).
    */
  private def requireGet(ex: HttpExchange): Boolean =
    if (ex.getRequestMethod == "GET") true
    else { respond(ex, 405, JObject("detail" -> JString("GET only"))); false }

  publicEndpoint("/api/context") { ex =>
    if (requireGet(ex)) pathParam(ex, "/api/context").foreach { idStr =>
      queryParams(ex) // language accepted for parity; the chunk knows its lang
      idStr.toLongOption.flatMap(mem.context) match {
        case None =>
          respond(ex, 404, JObject("detail" -> JString("Context not found for the given ID.")))
        case Some((cur, prev, next)) =>
          def side(p: Option[graft.query.DocPayload]): JValue =
            p.map(payloadJson(_, 0.0)).getOrElse(JNull)
          respond(ex, 200, JObject(
            "previous" -> side(prev),
            "current" -> payloadJson(cur, 0.0),
            "next" -> side(next)))
      }
    }
  }

  /** GET /api/similar-documents/{doc_id} — ANN by the doc's own vector with
    * self-exclusion (search_api.py:460-485). No-vector/unknown doc → 200
    * with zero results, like the reference's ([], 0).
    */
  publicEndpoint("/api/similar-documents") { ex =>
    if (requireGet(ex)) pathParam(ex, "/api/similar-documents").foreach { idStr =>
      similarDocs match {
        case None =>
          respond(ex, 503, JObject("detail" ->
            JString("similar-documents not configured (no embedding column loaded)")))
        case Some(sd) =>
          idStr.toLongOption match {
            case None =>
              // malformed id is a client error (the reference's int path
              // param rejects it with a validation error, which this server
              // maps to 400 everywhere else) — only a PARSEABLE
              // unknown/no-vector doc takes the 200-empty path below
              respond(ex, 400, JObject("detail" ->
                JString("Validation error: invalid document id")))
            case Some(docId) =>
              val pairs = sd.similar(docId, size = 10)
              val payloads = mem.docPayloads(pairs.map(_._1))
              val results = pairs.flatMap { case (id, sim) =>
                payloads.get(id).map(payloadJson(_, sim))
              }
              respond(ex, 200, JObject(
                "total_results" -> JInt(results.size),
                "results" -> JArray(results.toList)))
          }
      }
    }
  }

  /** GET /api/granth/verse?original_filename=&verse_seq_num= — full nested
    * verse + granth metadata (search_api.py:503-567).
    */
  publicEndpoint("/api/granth/verse") { ex =>
    if (requireGet(ex) && exactPath(ex, "/api/granth/verse")) {
      val qp = queryParams(ex)
      (qp.get("original_filename"), qp.get("verse_seq_num").flatMap(_.toIntOption)) match {
        case (Some(fn), Some(seq)) =>
          granthStore.map(_.verseJson(fn, seq)).getOrElse(
            Left(s"Granth document not found: $fn")) match {
            case Left(detail) => respond(ex, 404, JObject("detail" -> JString(detail)))
            case Right(json) => respond(ex, 200, json)
          }
        case _ => respond(ex, 400, JObject("detail" ->
          JString("Validation error: original_filename and integer verse_seq_num are required")))
      }
    }
  }

  /** GET /api/granth/prose?original_filename=&prose_seq_num= — prose section
    * or subsection-with-parent-context (search_api.py:568-646).
    */
  publicEndpoint("/api/granth/prose") { ex =>
    if (requireGet(ex) && exactPath(ex, "/api/granth/prose")) {
      val qp = queryParams(ex)
      (qp.get("original_filename"), qp.get("prose_seq_num").flatMap(_.toIntOption)) match {
        case (Some(fn), Some(seq)) =>
          granthStore.map(_.proseJson(fn, seq)).getOrElse(
            Left(s"Granth document not found: $fn")) match {
            case Left(detail) => respond(ex, 404, JObject("detail" -> JString(detail)))
            case Right(json) => respond(ex, 200, json)
          }
        case _ => respond(ex, 400, JObject("detail" ->
          JString("Validation error: original_filename and integer prose_seq_num are required")))
      }
    }
  }

  // ---- fleet-internal scatter RPC (shard nodes only) ----
  // The process-fleet analog of the in-process scatter: a coordinator POSTs
  // the wire-encoded query and gets this shard's bounded partial heaps back
  // (scores as raw IEEE bits — bit-exact merge, graft.query.Wire).
  private def internalPost(path: String)(f: String => String): Unit =
    endpoint(path) { ex =>
      if (exactPath(ex, path)) {
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, JObject("detail" -> JString("POST only")))
        else {
          val body = new String(ex.getRequestBody.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          val bytes = f(body).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseBody(200, bytes)
        }
      }
    }

  internalNode.foreach { nodeRef =>
    def internal(path: String)(f: (graft.query.InMemoryIndex, String) => String): Unit =
      internalPost(path)(body => f(nodeRef(), body))
    internal("/api/internal/partials") { (node, body) =>
      graft.query.Wire.encodePartials(
        node.searchPartial(graft.query.Wire.decodeQuery(body)))
    }
    internal("/api/internal/facets") { (node, body) =>
      val j = parse(body)
      val fields = (j \ "fields") match {
        case JArray(vs) => vs.collect { case JString(s) => s }.toSet
        case _ => Set.empty[String]
      }
      val ck = (j \ "contentKey").extractOrElse[String]("category")
      graft.query.Wire.encodeFacetMeta(node.facetMetadata(fields, ck))
    }
    internal("/api/internal/neighbors") { (node, body) =>
      val (lang, docId, meta) = graft.query.Wire.decodeNeighborReq(body)
      val (p, n) = node.neighborIds(lang, docId, meta)
      graft.query.Wire.encodeNeighbors(p, n)
    }
    internal("/api/internal/chunks") { (node, _) =>
      // coverage handshake: the coordinator asserts local ∪ peers is a
      // disjoint cover of 0..numChunks-1 before serving
      graft.query.Wire.encodeChunks(node.servedChunks)
    }
  }

  // similar-documents scatter surface: by-id vector resolution (the source
  // doc lives on exactly one shard) + bounded per-shard neighbor heaps —
  // bit-exact float/double transport so the coordinator's merge equals a
  // single full node's (graft.query.Wire)
  internalSimilar.foreach { sd =>
    internalPost("/api/internal/vec") { body =>
      graft.query.Wire.encodeVec(sd.vectorOf(graft.query.Wire.decodeVecReq(body)))
    }
    internalPost("/api/internal/similar") { body =>
      val (vec, size, exclude) = graft.query.Wire.decodeSimilarReq(body)
      graft.query.Wire.encodeSimilarHits(sd.searchVec(vec, size, exclude))
    }
  }

  // ---- /eval/* — the offline evaluation surface (eval/api.py router) ----
  // Same shard-node discipline as the public endpoints: a chunk-subset node
  // 503s these (evaluation belongs on a full node or the coordinator).
  evalApi.foreach { ev =>
    def requirePost(ex: HttpExchange): Boolean =
      if (ex.getRequestMethod == "POST") true
      else { respond(ex, 405, JObject("detail" -> JString("POST only"))); false }
    def readBody(ex: HttpExchange): JValue =
      parse(new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
    def answer(ex: HttpExchange, r: Either[(Int, String), JValue]): Unit = r match {
      case Left((code, detail)) => respond(ex, code, JObject("detail" -> JString(detail)))
      case Right(json) => respond(ex, 200, json)
    }
    publicEndpoint("/eval/paths") { ex =>
      if (requireGet(ex) && exactPath(ex, "/eval/paths"))
        respond(ex, 200, ev.paths)
    }
    publicEndpoint("/eval/scan-config") { ex =>
      if (requireGet(ex) && exactPath(ex, "/eval/scan-config")) {
        queryParams(ex).get("relative_path") match {
          case Some(rp) => answer(ex, ev.scanConfig(rp))
          case None => respond(ex, 400,
            JObject("detail" -> JString("Validation error: relative_path is required")))
        }
      }
    }
    publicEndpoint("/eval/extract") { ex =>
      if (requirePost(ex) && exactPath(ex, "/eval/extract"))
        respond(ex, 200, ev.extract(readBody(ex)))
    }
    publicEndpoint("/eval/batch") { ex =>
      if (requirePost(ex) && exactPath(ex, "/eval/batch"))
        respond(ex, 200, ev.startBatch(readBody(ex)))
    }
    // JDK HttpServer picks the LONGEST matching context, so these nest
    // safely under /eval/batch
    publicEndpoint("/eval/batch/status") { ex =>
      if (requireGet(ex))
        pathParam(ex, "/eval/batch/status").foreach(id => answer(ex, ev.batchStatus(id)))
    }
    publicEndpoint("/eval/batch/cancel") { ex =>
      if (requirePost(ex))
        pathParam(ex, "/eval/batch/cancel").foreach(id => answer(ex, ev.cancelBatch(id)))
    }
    publicEndpoint("/eval/batch/download") { ex =>
      if (requireGet(ex))
        pathParam(ex, "/eval/batch/download").foreach { id =>
          ev.downloadBatch(id) match {
            case Left((code, detail)) =>
              respond(ex, code, JObject("detail" -> JString(detail)))
            case Right((filename, bytes)) => // FileResponse (api.py:458-462)
              ex.getResponseHeaders.set("Content-Type", "application/zip")
              ex.getResponseHeaders.set("Content-Disposition",
                s"""attachment; filename="$filename"""")
              ex.sendResponseBody(200, bytes)
          }
        }
    }
    publicEndpoint("/eval/scripture") { ex =>
      if (requirePost(ex) && exactPath(ex, "/eval/scripture")) {
        (readBody(ex) \ "relative_path") match {
          case JString(rp) => answer(ex, ev.scripture(rp))
          case _ => respond(ex, 400,
            JObject("detail" -> JString("Validation error: relative_path is required")))
        }
      }
    }
    publicEndpoint("/eval/cost") { ex =>
      if (requirePost(ex) && exactPath(ex, "/eval/cost"))
        respond(ex, 200, ev.cost(readBody(ex)))
    }
    publicEndpoint("/eval/bookmarks/extract") { ex =>
      if (requirePost(ex) && exactPath(ex, "/eval/bookmarks/extract"))
        answer(ex, ev.extractBookmarks(readBody(ex)))
    }
  }

  private implicit class RichExchange(ex: HttpExchange) {
    def sendResponseBody(code: Int, bytes: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    }
  }

  // concurrent request handling (the default HttpServer executor is the
  // calling thread); searches only read immutable resident structures
  // procs/2: a fleet SHARD node must sustain the coordinator's full client
  // concurrency (qps bench drives cpus/2 threads) — procs/4 serialized
  // scatter RPCs behind too few workers
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.max(Runtime.getRuntime.availableProcessors() / 2, 4))
  server.setExecutor(pool)

  def start(): Unit = server.start()

  /** Quiesce: after this returns no handler is still executing. stop(0)
    * severs connections but returns with in-flight exchanges still running
    * on pool threads — without the awaitTermination below, a caller's next
    * steps (close the metrics sink, spark.stop()) race the tail of a live
    * handler, which then writes into a closed sink or throws from a stopped
    * SparkContext. Bounded wait: a handler wedged past it is a bug to
    * surface, not to hang shutdown on.
    */
  def stop(): Unit = {
    server.stop(0)
    pool.shutdown() // non-daemon worker threads would otherwise pin the JVM
    if (!pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS))
      System.err.println("[serve] WARN handlers still running 30 s after stop()")
  }
}

object SearchHttpServer {

  /** Idempotent and UNCONDITIONAL (no check-then-act): a CAS gate here let a
    * concurrent second constructor proceed to HttpServer.create before the
    * CAS winner ran setProperty — ServerConfig class-initializes on that
    * create and reads the property ONCE, so Nagle would stay enabled for
    * every server in the JVM (the ~40 ms stall per internal RPC the fleet
    * measured as 86 q/s vs 3.3k).
    */
  private[api] def ensureNoDelay(): Unit =
    System.setProperty("sun.net.httpserver.nodelay", "true")

  /** Deepest servable page (OpenSearch index.max_result_window default). */
  val MaxResultWindow: Long = 10000L

  /** Default feedback sink: a bounded in-memory queue, oldest rows dropped
    * when full (delivery never starts failing on a long-lived node).
    */
  val defaultFeedbackBuffer = new java.util.concurrent.LinkedBlockingQueue[String](10000)
  def bufferFeedback(row: String): Unit = {
    while (!defaultFeedbackBuffer.offer(row)) defaultFeedbackBuffer.poll()
  }

  /** Default metrics sink: same bounded drop-oldest queue shape as feedback
    * (the reference writes metrics.log; scripts parse it offline —
    * [[graft.ops.Metrics.parse]]/[[graft.ops.Metrics.summary]] here).
    */
  val defaultMetricsBuffer = new java.util.concurrent.LinkedBlockingQueue[String](100000)
  def bufferMetrics(row: String): Unit = {
    while (!defaultMetricsBuffer.offer(row)) defaultMetricsBuffer.poll()
  }
}
