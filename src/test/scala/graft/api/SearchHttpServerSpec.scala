package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods.parse
import graft.corpus.{SparkTestSession, Webtext}
import graft.query.{Bm25Query, IndexHandle, InMemoryIndex, QuerySpec}

/** HTTP serving surface vs the reference API (search_api.py): dual
  * content-type search parity with the resident node, pagination, exact
  * phrase, year filter, metadata TTL cache + invalidation.
  */
class SearchHttpServerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private implicit val formats: Formats = DefaultFormats

  private lazy val (mem, idx) = {
    val dir = "/tmp/gidx-api"
    graft.index.TableIO.deleteRecursive(dir)
    graft.index.IndexBuild.build(spark, Webtext.synthesize(spark, 800).toDF(), dir, numChunks = 2)
    val h = IndexHandle.load(dir)
    (InMemoryIndex.load(spark, h), h)
  }

  private def withServer[T](ttl: Long = 1800, now: () => Long = () => System.currentTimeMillis(),
      supplier: Option[() => Map[String, Map[String, Seq[String]]]] = None)(
      f: (SearchHttpServer, Int) => T): T = {
    val s = new SearchHttpServer(mem, ttlSeconds = ttl, nowMs = now, metadataSupplier = supplier)
    s.start()
    try f(s, s.boundPort) finally s.stop()
  }

  private val client = java.net.http.HttpClient.newHttpClient()
  private def post(port: Int, path: String, body: String): (Int, String) = {
    val r = client.send(java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:$port$path"))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def get(port: Int, path: String): (Int, String) = {
    val r = client.send(java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def ids(j: JValue, typ: String): Seq[(Long, Double)] =
    (j \ typ \ "results").extract[Seq[JObject]].map { o =>
      ((o \ "document_id").extract[Long], (o \ "score").extract[Double])
    }

  test("POST /api/search: dual-type results == direct resident-node searches") {
    val phrase = Webtext.GoldenPhrase("hi").mkString(" ")
    withServer() { (_, port) =>
      val (code, body) = post(port, "/api/search",
        s"""{"query": "$phrase", "language": "hindi"}""")
      assert(code == 200)
      val j = parse(body)
      Seq("Pravachan" -> "pravachan_results", "Granth" -> "granth_results").foreach {
        case (ct, field) =>
          val direct = mem.search(QuerySpec("hi", phrase,
            metaFilters = Map("category" -> Seq(ct))))
          assert(ids(j, field) == direct.hits.map(h => (h.docId, h.score)), ct)
          assert((j \ field \ "total_hits").extract[Long] == direct.totalHits, ct)
      }
    }
  }

  test("exact_match, exclude_words, categories, years and pagination map onto the QuerySpec") {
    val phrase = Webtext.GoldenPhrase("hi").mkString(" ")
    withServer() { (_, port) =>
      val (code, body) = post(port, "/api/search",
        s"""{"query": "$phrase", "language": "hindi", "exact_match": true,
           | "categories": {"Author": ["author1", "author2"]},
           | "start_year": 2019, "end_year": 2021,
           | "search_types": {"Pravachan": {"enabled": true, "page_size": 3, "page_number": 2},
           |                  "Granth": {"enabled": false}}}""".stripMargin)
      assert(code == 200)
      val j = parse(body)
      val direct = mem.search(QuerySpec("hi", phrase, phrase = true,
        metaFilters = Map("Author" -> Seq("author1", "author2"),
          "category" -> Seq("Pravachan")),
        dateRange = Some((Some(2019), Some(2021))),
        pageSize = 3, from = 3))
      assert(ids(j, "pravachan_results") == direct.hits.map(h => (h.docId, h.score)))
      assert((j \ "granth_results" \ "results").extract[Seq[JValue]].isEmpty)
      assert((j \ "pravachan_results" \ "page_number").extract[Int] == 2)
    }
  }

  test("client-supplied category filter wins over the per-type pin (reference quirk)") {
    val phrase = Webtext.GoldenPhrase("hi").mkString(" ")
    withServer() { (_, port) =>
      val (code, body) = post(port, "/api/search",
        s"""{"query": "$phrase", "language": "hindi",
           | "categories": {"category": ["Granth"]}}""".stripMargin)
      assert(code == 200)
      val j = parse(body)
      // both types ran with the CLIENT's category filter → identical sets
      assert(ids(j, "pravachan_results") == ids(j, "granth_results"))
      val direct = mem.search(QuerySpec("hi", phrase,
        metaFilters = Map("category" -> Seq("Granth"))))
      assert(ids(j, "pravachan_results") == direct.hits.map(h => (h.docId, h.score)))
    }
  }

  test("empty category list means NO restriction (reference skips empty filter lists)") {
    val phrase = Webtext.GoldenPhrase("hi").mkString(" ")
    withServer() { (_, port) =>
      val (code, body) = post(port, "/api/search",
        s"""{"query": "$phrase", "language": "hindi",
           | "categories": {"category": []}}""".stripMargin)
      assert(code == 200)
      val j = parse(body)
      // pin suppressed (key present) AND empty list dropped -> unrestricted,
      // identical for both types
      val direct = mem.search(QuerySpec("hi", phrase))
      assert(ids(j, "pravachan_results") == direct.hits.map(h => (h.docId, h.score)))
      assert(ids(j, "granth_results") == ids(j, "pravachan_results"))
    }
  }

  test("misspelled query returns suggestions in the response") {
    val real = Webtext.word("hi", 10)
    val missp = real.dropRight(1) + (if (real.last == 'क') 'ख' else 'क')
    withServer() { (_, port) =>
      val (code, body) = post(port, "/api/search",
        s"""{"query": "$missp", "language": "hindi"}""")
      assert(code == 200)
      val sugg = (parse(body) \ "suggestions").extract[Seq[String]]
      assert(sugg == mem.suggest("hi", missp))
      assert(sugg.nonEmpty)
    }
  }

  test("GET /api/metadata: co-occurrence-filtered per content type; TTL cache + invalidate") {
    var computes = 0
    var fakeNow = 1000000L
    val supplier = () => { computes += 1; mem.facetMetadata(Set("Author", "Anuyog", "year")) }
    withServer(ttl = 1800, now = () => fakeNow, supplier = Some(supplier)) { (_, port) =>
      val (c1, b1) = get(port, "/api/metadata")
      assert(c1 == 200 && computes == 1)
      val j = parse(b1)
      val authorsHi = (j \ "Pravachan" \ "Author_hi").extract[Seq[String]]
      assert(authorsHi.nonEmpty && authorsHi == authorsHi.sorted)
      assert((j \ "Granth").extract[Map[String, Seq[String]]].nonEmpty)
      // inside TTL: served from cache
      fakeNow += 1799 * 1000
      val (_, b2) = get(port, "/api/metadata")
      assert(computes == 1 && b2 == b1)
      // past TTL: recomputed
      fakeNow += 2 * 1000
      get(port, "/api/metadata")
      assert(computes == 2)
      // explicit invalidation forces recompute regardless of TTL
      val (ci, _) = post(port, "/api/cache/invalidate", "")
      assert(ci == 200)
      get(port, "/api/metadata")
      assert(computes == 3)
    }
  }

  test("POST /api/feedback: required-field validation + sink delivery (feedback_api.py:115-154)") {
    val sunk = scala.collection.mutable.ArrayBuffer[String]()
    val s = new SearchHttpServer(mem, feedbackSink = sunk += _)
    s.start()
    try {
      val port = s.boundPort
      val (ok, body) = post(port, "/api/feedback",
        """{"name": "  A User ", "subject": "search bug", "feedback": "phrase misses", "email": "a@b.c"}""")
      assert(ok == 200)
      assert((parse(body) \ "message").extract[String] == "Feedback submitted successfully")
      assert(sunk.size == 1)
      val row = parse(sunk.head)
      assert((row \ "name").extract[String] == "A User") // trimmed
      assert((row \ "subject").extract[String] == "search bug")
      // missing required field → 400, nothing delivered
      val (bad, _) = post(port, "/api/feedback", """{"name": "X", "feedback": ""}""")
      assert(bad == 400)
      assert(sunk.size == 1)
    } finally s.stop()
  }

  test("every /api/search logs one reference-shape metrics line to the sink") {
    // sink runs on the server's pool thread; the queue gives the test
    // thread a happens-before edge (an ArrayBuffer would be a data race)
    val sunk = new java.util.concurrent.LinkedBlockingQueue[String]()
    val s = new SearchHttpServer(mem, metricsSink = sunk.put(_))
    s.start()
    try {
      val port = s.boundPort
      val (ok, _) = post(port, "/api/search",
        """{"query": "metrics, probe \"q\"", "language": "hindi", "exact_match": true}""")
      assert(ok == 200)
      val line = sunk.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(line != null)
      val parts = line.split(",")
      // 12 positional fields (metrics_exporter parse contract) — commas in
      // the query were escaped to ';'
      assert(parts.length == 12, line)
      assert(parts(2) == "metrics; probe 'q'")
      assert(parts(3) == "lexical") // exact_match forces the lexical route
      assert(parts(4) == "true" && parts(6) == "hi")
      assert(parts(8) == "20" && parts(9) == "1")
      assert(parts(10).toDouble >= 0.0 && parts(11).toLong >= 0L)
    } finally s.stop()
  }

  test("near-miss paths 404 (prefix contexts), deep pages 400, malformed feedback 400") {
    withServer() { (_, port) =>
      // JDK HttpServer matches contexts by longest prefix — near-miss paths
      // must 404, not run the handler (or clear the cache!)
      assert(post(port, "/api/searchXYZ", "{}")._1 == 404)
      assert(get(port, "/api/metadata_v2")._1 == 404)
      assert(post(port, "/api/cache/invalidatestale", "")._1 == 404)
      // max_result_window: a page whose from+size overflows Int must 400,
      // never silently return an empty 200 page
      val (deep, _) = post(port, "/api/search",
        """{"query": "x", "search_types": {"Pravachan":
          | {"page_size": 20, "page_number": 107374183}}}""".stripMargin)
      assert(deep == 400)
      // malformed feedback JSON is the client's fault
      assert(post(port, "/api/feedback", "{not json")._1 == 400)
    }
  }

  test("validation: non-positive page_number/page_size → 400; invalid JSON → 400; GET invalidate → 405") {
    withServer() { (_, port) =>
      val (c1, b1) = post(port, "/api/search",
        """{"query": "x", "search_types": {"Pravachan": {"page_number": 0}}}""")
      assert(c1 == 400, b1)
      val (c2, _) = post(port, "/api/search",
        """{"query": "x", "search_types": {"Granth": {"page_size": -1}}}""")
      assert(c2 == 400)
      val (c3, _) = post(port, "/api/search", "{not json")
      assert(c3 == 400 || c3 == 500) // malformed body is rejected, never 200
      assert(c3 != 200)
      val (c4, _) = get(port, "/api/cache/invalidate")
      assert(c4 == 405) // a stray GET must not clear the cache
    }
  }

  test("default feedback buffer drops oldest when full (delivery never starts failing)") {
    val q = SearchHttpServer.defaultFeedbackBuffer
    q.clear()
    (1 to 10000).foreach(i => SearchHttpServer.bufferFeedback(s"row$i"))
    assert(q.size == 10000)
    SearchHttpServer.bufferFeedback("newest")
    assert(q.size == 10000)
    assert(!q.contains("row1")) // oldest dropped
    assert(q.contains("newest"))
    q.clear()
  }

  test("metadata co-occurrence is exact: a value never leaks into a content type it doesn't co-occur with") {
    // Webtext meta: category = Granth iff i % 3 == 0; Author = author(i % 7).
    // Every (category, author) pair co-occurs within 800 docs, so instead
    // plant the check on year: both types span the same warc_ts range here —
    // verify against a direct recomputation from the corpus
    import org.apache.spark.sql.functions._
    val docs = Webtext.synthesize(spark, 800).toDF()
    val expected = docs
      .select(col("lang"), element_at(col("meta"), "category").as("ct"),
        element_at(col("meta"), "Author").as("a"))
      .distinct().collect()
      .groupBy(r => r.getString(1))
      .map { case (ct, rows) =>
        ct -> rows.groupBy(_.getString(0)).map { case (lang, rs) =>
          s"Author_$lang" -> rs.map(_.getString(2)).distinct.sorted.toSeq
        }
      }
    val got = mem.facetMetadata(Set("Author"))
    expected.foreach { case (ct, inner) =>
      inner.foreach { case (k, vs) =>
        assert(got(ct)(k) == vs, s"$ct/$k")
      }
    }
  }

  // ---- /api/context (reference test_search_api.py:509-560, 871-965) ----

  test("GET /api/context/{id}: flat corpus — same-source neighbors, boundaries, 404") {
    withServer() { (_, port) =>
      // topic0 docs are 0, 20, 40, … (synthesize url topic = i % 20)
      val (code, body) = get(port, "/api/context/40?language=hi")
      assert(code == 200)
      val j = parse(body)
      assert((j \ "current" \ "document_id").extract[Long] == 40L)
      assert((j \ "previous" \ "document_id").extract[Long] == 20L)
      assert((j \ "next" \ "document_id").extract[Long] == 60L)
      // reference _extract_results fields present on each entry
      Seq("original_filename", "filename", "content_snippet", "metadata", "score")
        .foreach(f => assert((j \ "current" \ f) != JNothing, f))
      // document start boundary: no previous
      val j0 = parse(get(port, "/api/context/0")._2)
      assert((j0 \ "previous") == JNull)
      assert((j0 \ "next" \ "document_id").extract[Long] == 20L)
      // unknown chunk → 404; missing id segment → 404
      assert(get(port, "/api/context/99999")._1 == 404)
      assert(get(port, "/api/context")._1 == 404)
      assert(get(port, "/api/context/")._1 == 404)
    }
  }

  test("context: paragraph-chunked corpus uses (document_id, paragraph_id±1); fleet == single node") {
    import org.apache.spark.sql.functions._
    val dir = "/tmp/gidx-api-para"
    graft.index.TableIO.deleteRecursive(dir)
    // interleave two documents: docId i → document book(i%2), paragraph i/2
    // (so the neighbor is docId±2, NOT docId±1 — proves the facet path)
    val corpus = Webtext.synthesize(spark, 40).toDF()
      // chunks of one document share its language (reference: a PDF is one
      // language) — facet lists are lang-scoped, so pin the corpus to hi
      .withColumn("lang", lit("hi"))
      .withColumn("meta", map_concat(col("meta"),
        map(lit("document_id"), concat(lit("book"), col("docId") % 2),
          lit("paragraph_id"), (col("docId") / 2).cast("long").cast("string"))))
    graft.index.IndexBuild.build(spark, corpus, dir, numChunks = 2)
    val h = IndexHandle.load(dir)
    val single = InMemoryIndex.load(spark, h)
    val Some((cur, prev, next)) = single.context(6L)
    assert(cur.docId == 6L && cur.meta("document_id") == "book0")
    assert(prev.map(_.docId) == Some(4L), "previous = book0 paragraph 2")
    assert(next.map(_.docId) == Some(8L), "next = book0 paragraph 4")
    // first paragraph of a document: no previous even though docId-2 exists
    val Some((_, p0, n0)) = single.context(1L) // book1 paragraph 0
    assert(p0.isEmpty && n0.map(_.docId) == Some(3L))
    // doc-sharded fleet returns the identical context
    val shared = InMemoryIndex.loadGlobalDf(spark, h)
    val fleet = new graft.query.ShardedServe.Fleet(
      graft.query.ShardedServe.chunkAssignment(2, 2).map(cs =>
        InMemoryIndex.load(spark, h, chunks = Some(cs), sharedGlobalDf = Some(shared))))
    Seq(0L, 1L, 6L, 7L, 38L, 39L).foreach { id =>
      val s = single.context(id).map { case (c, p, n) =>
        (c.docId, p.map(_.docId), n.map(_.docId)) }
      val f = fleet.context(id).map { case (c, p, n) =>
        (c.docId, p.map(_.docId), n.map(_.docId)) }
      assert(s == f, s"fleet context parity for chunk $id")
    }
  }

  // ---- /api/granth/verse + /api/granth/prose (search_api.py:503-646) ----

  private lazy val granths = GranthStore.synthetic(4)

  private def withGranthServer[T](f: Int => T): T = {
    val s = new SearchHttpServer(mem, granthStore = Some(granths))
    s.start()
    try f(s.boundPort) finally s.stop()
  }

  test("GET /api/granth/verse: nested verse + granth metadata; 404s; param validation") {
    withGranthServer { port =>
      val (code, body) = get(port,
        "/api/granth/verse?original_filename=granth2.md&verse_seq_num=1")
      assert(code == 200)
      val j = parse(body)
      assert((j \ "granth_id").extract[Long] == 2L)
      assert((j \ "granth_name").extract[String] == "granth2")
      assert((j \ "metadata" \ "Author").extract[String] == "author2")
      assert((j \ "verse" \ "seq_num").extract[Int] == 1)
      assert((j \ "verse" \ "verse").extract[String] == "verse text 2-1")
      assert((j \ "verse" \ "type").extract[String] == "Gatha")
      assert((j \ "verse" \ "teeka").extract[Seq[String]] ==
        Seq("teeka 2-1-1", "teeka 2-1-2"))
      // analyzed-match tolerance: extension variation still resolves
      assert(get(port,
        "/api/granth/verse?original_filename=granth2&verse_seq_num=1")._1 == 200)
      val (c404, b404) = get(port,
        "/api/granth/verse?original_filename=granth2.md&verse_seq_num=99")
      assert(c404 == 404 && b404.contains("seq_num 99"))
      assert(get(port,
        "/api/granth/verse?original_filename=nope.md&verse_seq_num=1")._1 == 404)
      assert(get(port, "/api/granth/verse?original_filename=granth2.md")._1 == 400)
      assert(get(port, "/api/granth/verseX?original_filename=granth2.md&verse_seq_num=1")._1 == 404)
    }
  }

  test("GET /api/granth/prose: main section, and subsection with parent context") {
    withGranthServer { port =>
      val e = granths.lookup("granth2.md").get
      val sec = e.prose.head
      val sub = sec.subsections.head
      val (code, body) = get(port,
        s"/api/granth/prose?original_filename=granth2.md&prose_seq_num=${sec.seqNum}")
      assert(code == 200)
      val j = parse(body)
      assert((j \ "prose" \ "heading").extract[String] == sec.heading)
      assert((j \ "prose" \ "subsections").extract[Seq[JValue]].nonEmpty)
      // subsection seq → {**subsection, parent_seq_num, parent_heading}
      val (cs, bs) = get(port,
        s"/api/granth/prose?original_filename=granth2.md&prose_seq_num=${sub.seqNum}")
      assert(cs == 200)
      val js = parse(bs)
      assert((js \ "prose" \ "heading").extract[String] == sub.heading)
      assert((js \ "prose" \ "parent_seq_num").extract[Int] == sec.seqNum)
      assert((js \ "prose" \ "parent_heading").extract[String] == sec.heading)
      assert(get(port,
        "/api/granth/prose?original_filename=granth2.md&prose_seq_num=999")._1 == 404)
    }
  }

  // ---- /api/similar-documents (search_api.py:460-485) ----

  test("GET /api/similar-documents/{id}: ANN neighbors, self excluded, scores descending") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sd = new SimilarDocs(spark, emb)
    val s = new SearchHttpServer(mem, similarDocs = Some(sd))
    s.start()
    try {
      val port = s.boundPort
      val (code, body) = get(port, "/api/similar-documents/5?language=hi")
      assert(code == 200)
      val j = parse(body)
      val results = (j \ "results").extract[Seq[JObject]]
      assert((j \ "total_results").extract[Int] == results.size)
      assert(results.nonEmpty && results.size <= 10)
      val idsScores = results.map(o =>
        ((o \ "document_id").extract[Long], (o \ "score").extract[Double]))
      assert(!idsScores.exists(_._1 == 5L), "source doc must be excluded")
      assert(idsScores == idsScores.sortBy(-_._2), "best-first order")
      // endpoint == the oracled IVF path directly
      assert(idsScores.map(_._1) == sd.similar(5L, 10).map(_._1))
      // unknown doc / no vector → 200 with zero results (reference ([], 0))
      val j0 = parse(get(port, "/api/similar-documents/100000")._2)
      assert((j0 \ "total_results").extract[Int] == 0)
    } finally s.stop()
  }

  test("similar-documents without an embedding column → 503") {
    withServer() { (_, port) =>
      assert(get(port, "/api/similar-documents/5")._1 == 503)
    }
  }

  test("GET endpoints enforce method (405); disabled type's page config is never validated") {
    withServer() { (_, port) =>
      assert(post(port, "/api/metadata", "{}")._1 == 405)
      assert(post(port, "/api/context/40", "{}")._1 == 405)
      assert(post(port, "/api/similar-documents/5", "{}")._1 == 405)
      assert(post(port, "/api/granth/verse?original_filename=x&verse_seq_num=1", "{}")._1 == 405)
      // reference skips a disabled section before reading its page config
      val (code, body) = post(port, "/api/search",
        """{"query": "x", "language": "hindi",
          | "search_types": {"Granth": {"enabled": false, "page_size": 0}}}""".stripMargin)
      assert(code == 200, body)
      val j = parse(body)
      assert((j \ "granth_results" \ "total_hits").extract[Long] == 0L)
    }
  }

  test("rolling file sink: appends, rotates once over maxBytes, parses through Metrics") {
    val dir = "/tmp/graft-sink-spec"
    graft.index.TableIO.deleteRecursive(dir)
    val line = graft.ops.Metrics.lineStr(1700000000000L, "10.0.0.1", "कुछ, शब्द",
      "lexical", exactMatch = false, "['Pravachan']", "hi",
      enableReranking = false, 20, 1, 12.5, 7)
    val lineBytes = line.getBytes("UTF-8").length + 1
    // threshold between 6 and 7 lines → exactly one rotation in 10 appends
    // (rolled keeps 7, live keeps 3 — drop-oldest is the .1 overwrite)
    val sink = new RollingFileSink(s"$dir/metrics.log", maxBytes = lineBytes * 6 + 1)
    (1 to 10).foreach(_ => sink(line))
    sink.close()
    val live = new java.io.File(s"$dir/metrics.log")
    val rolled = new java.io.File(s"$dir/metrics.log.1")
    assert(live.exists() && rolled.exists(), "expected one rotation")
    assert(live.length() < rolled.length())
    // both generations parse through the ORACLED csv parser with full fidelity
    val lines = spark.read.text(s"$dir/metrics.log*").withColumnRenamed("value", "line")
    val parsed = graft.ops.Metrics.parse(lines)
    assert(parsed.count() == 10)
    import org.apache.spark.sql.functions._
    val row = parsed.select("client_ip", "search_type", "language").distinct().collect()
    assert(row.length == 1 && row(0).getString(0) == "10.0.0.1")
    val sum = graft.ops.Metrics.summary(parsed).collect()
    assert(sum.nonEmpty)
    // close() is TERMINAL: a straggler handler's late apply() must not
    // resurrect the writer against the just-closed (possibly archived) file
    val lenAfterClose = live.length()
    sink(line)
    assert(live.length() == lenAfterClose, "post-close apply must drop the line")
  }

  test("peer RPC join is deadline-bounded even when the future never completes") {
    // the JDK request timeout only bounds time-to-response-HEADERS; a shard
    // stalling mid-body completes nothing — pre-fix, join() parked the
    // coordinator worker forever. With the bound, the stalled future times
    // out, the one retry hits a connection-refused port fast, and the
    // scatter FAILS loudly instead of wedging.
    val never = new java.util.concurrent.CompletableFuture[String]()
    val t0 = System.nanoTime()
    intercept[java.util.concurrent.CompletionException] {
      // port 9 (discard) is unbound here: the retry fails fast on connect
      graft.query.PeerRpc.joinRetry("http://127.0.0.1:9/x", "{}", never,
        timeoutSec = 1L)
    }
    val waited = (System.nanoTime() - t0) / 1e9
    assert(waited < 15.0, f"bounded join should fail in ~1 s + retry, took $waited%.1f s")
  }

  test("peer RPC join is deadline-bounded on a REAL mid-body stall (headers sent, body never)") {
    // the precise JDK blind spot: once the status line + headers arrive the
    // request timer is cancelled, so only our orTimeout stands between a
    // body-stalled shard and a permanently parked coordinator worker. A raw
    // socket server sends a 200 with a large Content-Length, flushes a few
    // body bytes, then holds the connection open forever.
    val srv = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val stall = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try {
        val s = srv.accept()
        val in = s.getInputStream
        // drain the request head (until the blank line) so the client is
        // committed before we answer
        var last4 = 0
        var c = in.read()
        while (c != -1 && last4 != 0x0d0a0d0a) {
          last4 = (last4 << 8) | c
          if (last4 != 0x0d0a0d0a) c = in.read()
        }
        val out = s.getOutputStream
        out.write("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\nContent-Length: 1000000\r\n\r\n{\"partial\":".getBytes("US-ASCII"))
        out.flush()
        stall.await() // hold the socket open, never finish the body
        s.close()
      } catch { case _: Throwable => } finally { try srv.close() catch { case _: Throwable => } }
    }, "stall-shard")
    t.setDaemon(true); t.start()
    val url = s"http://127.0.0.1:${srv.getLocalPort}/api/internal/partials"
    val t0 = System.nanoTime()
    try {
      intercept[java.util.concurrent.CompletionException] {
        graft.query.PeerRpc.joinRetry(url, "{}",
          graft.query.PeerRpc.postAsync(url, "{}"), timeoutSec = 2L)
      }
      val waited = (System.nanoTime() - t0) / 1e9
      // first join times out at 2 s; the retry reconnects to the now-closed
      // (single-backlog, already-accepted) listener or times out again —
      // either way the scatter fails in bounded time instead of pinning
      assert(waited < 30.0, f"mid-body stall must fail in bounded time, took $waited%.1f s")
    } finally { stall.countDown() }
  }
}
