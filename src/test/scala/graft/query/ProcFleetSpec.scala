package graft.query

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{SparkTestSession, Webtext}

/** Multi-process fleet over real sockets == single full node, byte-for-byte:
  * the ProcFleet coordinator (head shard in-process) scatters to a shard
  * node behind an actual HTTP server and merges its JSON-serialized partial
  * heaps — the full wire path a multi-JVM deployment pays, minus only the
  * process boundary (Bench runs the separate-JVM variant as
  * serve_qps_fleet_proc).
  */
class ProcFleetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val fixture: (InMemoryIndex, ProcFleet, graft.api.SearchHttpServer,
      graft.api.FleetSimilar) = {
    val dir = "/tmp/gidx-procfleet"
    graft.index.TableIO.deleteRecursive(dir)
    graft.index.IndexBuild.build(spark, Webtext.synthesize(spark, 600).toDF(), dir,
      numChunks = 2)
    val h = IndexHandle.load(dir)
    val single = InMemoryIndex.load(spark, h)
    val shared = InMemoryIndex.loadGlobalDf(spark, h)
    val peerNode = InMemoryIndex.load(spark, h, chunks = Some(Set(1)),
      sharedGlobalDf = Some(shared))
    val peerSimilar = new graft.api.SimilarDocs(spark, emb,
      numChunks = 2, chunks = Some(Set(1)))
    val peerServer = new graft.api.SearchHttpServer(peerNode,
      internalNode = Some(() => peerNode), internalSimilar = Some(peerSimilar),
      internalOnly = true)
    peerServer.start()
    val local = InMemoryIndex.load(spark, h, chunks = Some(Set(0)),
      sharedGlobalDf = Some(shared))
    val proc = new ProcFleet(() => local,
      Seq(s"http://127.0.0.1:${peerServer.boundPort}"), numChunks = 2)
    val localSimilar = new graft.api.SimilarDocs(spark, emb,
      numChunks = 2, chunks = Some(Set(0)))
    val fleetSimilar = new graft.api.FleetSimilar(localSimilar,
      Seq(s"http://127.0.0.1:${peerServer.boundPort}"))
    (single, proc, peerServer, fleetSimilar)
  }

  test("wire codec round-trips a fully-loaded QuerySpec and bit-exact partials") {
    val q = QuerySpec("hi", "कुछ शब्द \"quoted\"", mode = "any", phrase = true,
      excludeWords = Seq("नहीं", "x"),
      metaFilters = Map("category" -> Seq("Granth"), "Author" -> Seq("a1", "a2")),
      yearRange = Some((2019, 2021)),
      dateRange = Some((Some(2019), None)),
      pageSize = 7, from = 14, trackTotalHits = 50L)
    assert(Wire.decodeQuery(Wire.encodeQuery(q)) == q)
    // open-start date range and defaults
    val q2 = QuerySpec("gu", "a", dateRange = Some((None, Some(2020))))
    assert(Wire.decodeQuery(Wire.encodeQuery(q2)) == q2)
    // scores whose decimal rendering would not round-trip must still be
    // BIT-exact over the wire (raw IEEE bits)
    val parts = Array(
      SegmentResult(Array(ScoredDoc(3L, 0.1 + 0.2), ScoredDoc(9L, 1.0 / 3.0)),
        hitCount = 17L, capped = true),
      SegmentResult(Array.empty[ScoredDoc], 0L, capped = false))
    val back = Wire.decodePartials(Wire.encodePartials(parts))
    assert(back.length == 2 && back(0).hitCount == 17L && back(0).capped)
    assert(java.lang.Double.doubleToRawLongBits(back(0).top(0).score) ==
      java.lang.Double.doubleToRawLongBits(0.1 + 0.2))
    assert(back(0).top.map(_.docId).toSeq == Seq(3L, 9L))
    assert(back(1).top.isEmpty && !back(1).capped)
  }

  test("wire decode FAILS on a non-protocol 200 payload instead of dropping a shard silently") {
    intercept[RuntimeException](Wire.decodePartials("""{"ok": true}"""))
    intercept[RuntimeException](Wire.decodeFacetMeta("""[1, 2]"""))
  }

  test("wire-format skew FAILS the query even on a degraded-allowed fleet (decode is not retried/degraded)") {
    fixture
    val h = IndexHandle.load("/tmp/gidx-procfleet")
    val local = InMemoryIndex.load(spark, h, chunks = Some(Set(0)))
    // a fake "peer" that passes the coverage handshake (claims chunk 1) but
    // answers partials with 200 + a wrong-shape body — the wrong-build /
    // wrong-service-on-the-port deployment bug
    val skewed = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    skewed.createContext("/api/internal/chunks", { ex =>
      val b = Wire.encodeChunks(Some(Set(1))).getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    })
    val partialsHits = new java.util.concurrent.atomic.AtomicInteger(0)
    skewed.createContext("/api/internal/partials", { ex =>
      partialsHits.incrementAndGet()
      val b = """{"ok": true}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    })
    skewed.start()
    try {
      val lenient = new ProcFleet(() => local,
        Seq(s"http://127.0.0.1:${skewed.getAddress.getPort}"), numChunks = 2,
        allowDegraded = true)
      // degraded-allowed MUST NOT mask wire skew as an availability event:
      // the query fails loudly instead of serving a page missing chunk 1
      val out = intercept[Exception](
        lenient.search(QuerySpec("hi", Webtext.word("hi", 1), mode = "any")))
      assert(out.getMessage.contains("partials payload"))
      // and the deterministic failure was NOT re-manufactured by a retry
      assert(partialsHits.get() == 1,
        s"decode failure must not retry the POST (got ${partialsHits.get()} hits)")
    } finally skewed.stop(0)
  }

  test("coverage handshake: under-covered or overlapping fleets fail at verify, complete ones pass") {
    val (_, proc, peerServer, _) = fixture
    proc.verifyCoverage(2) // local {0} + peer {1} — complete and disjoint
    // a third chunk the fleet doesn't serve → refuse
    intercept[IllegalArgumentException](proc.verifyCoverage(3))
    // overlapping shards (peer serves chunk 1; a second "peer" = the same
    // node again) → refuse
    val overlapNode = InMemoryIndex.load(spark, IndexHandle.load("/tmp/gidx-procfleet"),
      chunks = Some(Set(0, 1)))
    val overlapping = new ProcFleet(() => overlapNode,
      Seq(s"http://127.0.0.1:${peerServer.boundPort}"), numChunks = 2)
    intercept[IllegalArgumentException](overlapping.verifyCoverage(2))
    // coverage holds BY CONSTRUCTION, not by caller discipline: the first
    // search itself runs the handshake and refuses to serve
    intercept[IllegalArgumentException](
      overlapping.search(QuerySpec("hi", Webtext.word("hi", 1))))
  }

  test("25-shape sweep over sockets: ProcFleet == single full node (pages, scores, totals, suggestions)") {
    val (single, proc, _, _) = fixture
    val rnd = new scala.util.Random(20260817L)
    (1 to 25).foreach { _ =>
      val nTerms = 1 + rnd.nextInt(4)
      val terms = Seq.fill(nTerms)(Webtext.word("hi", rnd.nextInt(5000)))
      val mode = if (rnd.nextBoolean()) "all" else "any"
      val phrase = mode == "all" && rnd.nextInt(5) == 0
      val cap = Seq(10L, 50L, 1000L)(rnd.nextInt(3))
      val from = if (rnd.nextInt(3) == 0) 10 else 0
      val ex = if (rnd.nextInt(4) == 0) Seq(Webtext.word("hi", rnd.nextInt(100))) else Nil
      val mf: Map[String, Seq[String]] =
        if (rnd.nextInt(4) == 0) Map("category" -> Seq("Pravachan")) else Map.empty
      val yr = if (rnd.nextInt(5) == 0) Some((2020, 2020)) else None
      val dr = if (rnd.nextInt(4) == 0)
        Some((Some(2019 + rnd.nextInt(2)): Option[Int], Some(2020 + rnd.nextInt(2)): Option[Int]))
      else None
      val q = QuerySpec("hi", terms.mkString(" "), mode = mode, phrase = phrase,
        excludeWords = ex, metaFilters = mf, yearRange = yr, dateRange = dr,
        trackTotalHits = cap, from = from, pageSize = 20)
      val a = single.search(q)
      val b = proc.search(q)
      assert(b.hits.map(h => (h.docId, h.score)) == a.hits.map(h => (h.docId, h.score)),
        s"socket fleet diverged on $q")
      assert(b.totalHits == a.totalHits && b.totalRelation == a.totalRelation,
        s"totals on $q")
      assert(b.suggestions == a.suggestions, s"suggestions on $q")
    }
  }

  test("facet metadata and context parity over sockets") {
    val (single, proc, _, _) = fixture
    assert(proc.facetMetadata(Set("Author", "Anuyog", "year"), "category") ==
      single.facetMetadata(Set("Author", "Anuyog", "year"), "category"))
    Seq(0L, 40L, 599L, 41L).foreach { id =>
      val a = single.context(id).map { case (c, p, n) =>
        (c.docId, p.map(_.docId), n.map(_.docId)) }
      val b = proc.context(id).map { case (c, p, n) =>
        (c.docId, p.map(_.docId), n.map(_.docId)) }
      assert(a == b, s"context parity for $id")
    }
  }

  test("similar-documents over sockets: fleet scatter == single full node, remote-owned vectors resolve") {
    val (_, _, _, fleetSim) = fixture
    // the SINGLE-node reference: all chunk graphs resident in one process —
    // per-chunk graphs are identical objects on both topologies, so the
    // fleet merge must be EXACTLY equal, scores included (bit-exact wire)
    val singleSim = new graft.api.SimilarDocs(spark, emb, numChunks = 2)
    // vec_id 4 lives on the coordinator's chunk (4 % 2 = 0); vec_id 5 on the
    // PEER (5 % 2 = 1) — the second exercises the /api/internal/vec hop
    Seq(4L, 5L, 0L, 17L).foreach { id =>
      val a = singleSim.similar(id, 10)
      val b = fleetSim.similar(id, 10)
      assert(b == a, s"fleet similar diverged for doc $id")
      assert(a.nonEmpty && !a.exists(_._1 == id), s"self-exclusion for $id")
      assert(a.map(_._2) == a.map(_._2).sorted.reverse, s"best-first for $id")
    }
    // unknown doc -> Nil on both (the reference's ([], 0))
    assert(fleetSim.similar(99999L) == singleSim.similar(99999L))
    assert(fleetSim.similar(99999L).isEmpty)
  }

  test("similar-documents: a chunk NO fleet node serves fails loudly, not as 'no vector'") {
    // local serves chunk 0 only and there are no peers: docId 5 owns chunk 1
    // (5 mod 2), so a silent Nil would be indistinguishable from a
    // legitimately vectorless doc — the mis-assembled fleet must error
    val localSim = new graft.api.SimilarDocs(spark, emb, numChunks = 2,
      chunks = Some(Set(0)))
    val broken = new graft.api.FleetSimilar(localSim, Seq.empty)
    val e = intercept[RuntimeException](broken.similar(5L))
    assert(e.getMessage.contains("no fleet node serves chunk 1"))
    // chunk-0 lookups still answer from the local graphs (owner is local)
    assert(broken.similar(4L).nonEmpty)
  }

  test("partial-failure policy: dead shard fails strict fleets, degrades flagged on opt-in") {
    fixture // make sure the shared index exists
    val h = IndexHandle.load("/tmp/gidx-procfleet")
    val shared = InMemoryIndex.loadGlobalDf(spark, h)
    val peerNode = InMemoryIndex.load(spark, h, chunks = Some(Set(1)),
      sharedGlobalDf = Some(shared))
    val peerServer = new graft.api.SearchHttpServer(peerNode,
      internalNode = Some(() => peerNode), internalOnly = true)
    peerServer.start()
    val local = InMemoryIndex.load(spark, h, chunks = Some(Set(0)),
      sharedGlobalDf = Some(shared))
    val url = s"http://127.0.0.1:${peerServer.boundPort}"
    val strict = new ProcFleet(() => local, Seq(url), numChunks = 2)
    val lenient = new ProcFleet(() => local, Seq(url), numChunks = 2,
      allowDegraded = true)
    val q = QuerySpec("hi", Webtext.word("hi", 1), mode = "any")
    // healthy fleet: identical pages, degraded flag NOT set
    assert(!lenient.search(q).coverageDegraded)
    assert(!strict.search(q).coverageDegraded)
    peerServer.stop() // the shard JVM dies
    // default policy: the query FAILS (after one bounded retry) — a page
    // silently missing a corpus slice must never look like success
    intercept[Exception](strict.search(q))
    // opt-in policy: the surviving shards' page, EXPLICITLY flagged
    val degraded = lenient.search(q)
    assert(degraded.coverageDegraded, "degraded page must carry the flag")
    val localOnly = local.materialize(q, local.searchPartial(q))
    assert(degraded.hits == localOnly.hits, "degraded page == surviving shards' merge")
    // and the HTTP layer surfaces it
    val coord = new graft.api.SearchHttpServer(lenient)
    coord.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://127.0.0.1:${coord.boundPort}/api/search"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          s"""{"query": "${Webtext.word("hi", 1)}", "language": "hindi"}"""))
        .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.body().contains("\"coverage_degraded\":true"))
    } finally coord.stop()
  }

  test("suggest parity over sockets: misspelled term resolves identically") {
    val (single, proc, _, _) = fixture
    val w = Webtext.word("hi", 3)
    val misspelled = w.dropRight(1) + "ख़" // unlikely suffix → zero hits
    val q = QuerySpec("hi", misspelled)
    assert(proc.search(q).suggestions == single.search(q).suggestions)
  }
}
