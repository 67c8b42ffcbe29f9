package graft.tools

import org.apache.spark.sql.SparkSession

/** Serving-node entry point: load an index (building a synthetic one first if
  * absent), start the HTTP API ([[graft.api.SearchHttpServer]]) and block —
  * the analog of the reference's `uvicorn backend.api.search_api:app`.
  *
  * Usage: ServeCli <indexDir> [port]
  * GRAFT_SERVE_ONESHOT=1 issues one self-request per endpoint and exits
  * (smoke-drive for scripts).
  */
object ServeCli {
  def main(args: Array[String]): Unit = {
    // serving wire shapes (JSON numbers, formatted strings) must not depend
    // on the host locale — same pin as Bench and the other mains
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val idxDir = args.headOption.getOrElse("/tmp/gidx")
    val port = if (args.length > 1) args(1).toInt else 0
    // GRAFT_SERVE_CPUS: a shard node's Spark threads (load + point-reads) —
    // a fleet launcher divides the host's cores across its shard JVMs
    val serveCpus = sys.env.getOrElse("GRAFT_SERVE_CPUS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$serveCpus]")
      .config("spark.sql.shuffle.partitions", serveCpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // the resident load IS a driver collect of this node's index slice;
      // a >1M-doc shard exceeds the default 1g result cap
      .config("spark.driver.maxResultSize", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!graft.index.TableIO.exists(s"$idxDir/stats.json")) {
      // fleet members must NEVER build: a coordinator + N shard processes
      // launched together against one empty dir would all run the build
      // concurrently into the same path (interleaved parquet + stats =
      // corrupt index). Build once standalone, then start the fleet.
      require(sys.env.get("GRAFT_SERVE_CHUNKS").isEmpty &&
        sys.env.get("GRAFT_FLEET_PEERS").isEmpty,
        s"no index at $idxDir — fleet nodes do not build; build it once " +
          "with a standalone ServeCli (or IndexBuild) first")
      val n = sys.env.getOrElse("GRAFT_BUILD_DOCS", "10000").toLong
      println(s"[serve] no index at $idxDir — building synthetic ($n docs)")
      graft.index.IndexBuild.build(spark, graft.corpus.Webtext.synthesize(spark, n).toDF(), idxDir)
    }
    // read once: the fleet coverage check and similar-docs sharding must see
    // the SAME chunk count
    val numChunks = graft.index.IndexBuild.readProps(idxDir).numChunks
    // GRAFT_SERVE_SHARDS=N boots an in-process doc-sharded fleet (one node
    // per chunk subset, scatter-gather behind the same API) instead of one
    // full resident node
    val shards = sys.env.getOrElse("GRAFT_SERVE_SHARDS", "1").toInt
    // GRAFT_SERVE_CHUNKS="1,3" boots this process as ONE doc shard of a
    // multi-process fleet: it loads only those chunks and exposes the
    // internal scatter RPC for a ProcFleet coordinator
    val chunkSubset: Option[Set[Int]] =
      sys.env.get("GRAFT_SERVE_CHUNKS").map(_.split(",").map(_.trim.toInt).toSet)
    // GRAFT_FLEET_PEERS="http://127.0.0.1:7001,…" makes this process the
    // fleet COORDINATOR: its own (chunk-subset) node is the head shard,
    // peers answer over sockets
    val fleetPeers: Seq[String] =
      sys.env.get("GRAFT_FLEET_PEERS").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
    require(fleetPeers.isEmpty || chunkSubset.isDefined,
      "GRAFT_FLEET_PEERS needs GRAFT_SERVE_CHUNKS: the coordinator serves its " +
        "own doc shard — a full-node coordinator would double-count peer docs")
    // hot-reload: poll the index's mutation fingerprint and atomically swap
    // the resident node when it moves (the reference's reindex-while-serving
    // daemon model). 0 disables. The thread-fleet path (GRAFT_SERVE_SHARDS)
    // stays static — the multi-process fleet is the real topology and each
    // of its shard JVMs reloads independently here.
    val reloadMs = sys.env.getOrElse("GRAFT_SERVE_RELOAD_MS", "2000").toLong
    var internalNode: Option[() => graft.query.InMemoryIndex] = None
    var reloader: Option[graft.query.ReloadingNode] = None
    // shard nodes (chunk subset, not the coordinator) must not answer public
    // traffic from their corpus slice — only /api/internal/* serves there
    val internalOnly = chunkSubset.isDefined && fleetPeers.isEmpty
    def reloadingNode(chunks: Option[Set[Int]]): graft.query.ReloadingNode = {
      // the loader re-reads IndexHandle (stats.json) each swap: corpus
      // N/avgdl move with mutations and BM25 parity depends on them
      val rn = new graft.query.ReloadingNode(idxDir,
        () => graft.query.InMemoryIndex.load(spark,
          graft.query.IndexHandle.load(idxDir), chunks = chunks),
        pollMs = if (reloadMs > 0) reloadMs else Long.MaxValue)
      reloader = Some(rn)
      internalNode = Some(() => rn.current)
      rn
    }
    val mem: graft.query.SearchNode =
      if (chunkSubset.isDefined || fleetPeers.nonEmpty) {
        val rn = reloadingNode(chunkSubset)
        if (fleetPeers.isEmpty) rn
        else {
          // GRAFT_FLEET_ALLOW_DEGRADED=1: serve around a dead shard (one
          // retry first) with an explicit coverage_degraded response flag
          // instead of failing the query
          val pf = new graft.query.ProcFleet(() => rn.current, fleetPeers,
            numChunks,
            allowDegraded = sys.env.get("GRAFT_FLEET_ALLOW_DEGRADED").contains("1"))
          // fail at BOOT if the shards overlap or leave chunks unserved —
          // a mis-assigned fleet would otherwise 200 with missing slices
          // (ProcFleet ALSO runs this lazily before its first search)
          pf.verifyCoverage()
          println(s"[serve] fleet coverage verified: local=${chunkSubset.get.toSeq.sorted
            .mkString(",")} + ${fleetPeers.size} peer(s)")
          pf
        }
      }
      else if (shards <= 1) reloadingNode(None)
      else {
        println(s"[serve] doc-sharded fleet: $shards nodes over $numChunks chunks")
        // only this static in-process topology needs a handle here — the
        // reloading paths build theirs inside the loader on every swap
        // (which also performs the pending-mutation refusal at boot)
        val idx = graft.query.IndexHandle.load(idxDir)
        // load the corpus-wide term dictionary ONCE and share it across the
        // in-process nodes (it's the largest map in the system; N copies in
        // one JVM would defeat the per-node memory bound)
        val shared = graft.query.InMemoryIndex.loadGlobalDf(spark, idx)
        new graft.query.ShardedServe.Fleet(
          graft.query.ShardedServe.chunkAssignment(numChunks, shards)
            .filter(_.nonEmpty)
            .map(cs => graft.query.InMemoryIndex.load(spark, idx, chunks = Some(cs),
              sharedGlobalDf = Some(shared))))
      }
    // granth books: resident store through the real markdown parser (same
    // corpus as the oracled granth_flatten queries)
    val granths = graft.api.GranthStore.synthetic(
      sys.env.getOrElse("GRAFT_SERVE_GRANTHS", "8").toInt)
    // similar-documents: embeddings table keyed by doc id (model swap point
    // — a deployment points this at bge-m3 vectors of the docstore text).
    // Resident per-CHUNK HNSW graphs, scoped to this node's chunk subset —
    // shard nodes never collect the corpus; a fleet coordinator scatters
    // over /api/internal/similar and merges (identical to a full node)
    val similarLocal = sys.env.get("GRAFT_SERVE_EMB").map(p =>
      new graft.api.SimilarDocs(spark, spark.read.parquet(p),
        numChunks = numChunks,
        chunks = chunkSubset))
    val similar: Option[graft.api.SimilarEngine] =
      if (fleetPeers.nonEmpty)
        similarLocal.map(sd => new graft.api.FleetSimilar(sd, fleetPeers))
      else similarLocal
    // GRAFT_SERVE_LOG_DIR: per-query metrics + feedback to rolling files
    // (the reference's metrics.log/feedback flow) — parse offline with
    // MetricsCli [--summary]; default stays the bounded in-memory buffers
    val logDir = sys.env.get("GRAFT_SERVE_LOG_DIR")
    val metricsSink = logDir.map(d => new graft.api.RollingFileSink(s"$d/metrics.log"))
    val feedbackSink = logDir.map(d => new graft.api.RollingFileSink(s"$d/feedback.log"))
    // GRAFT_EVAL_BASE mounts the offline evaluation surface (/eval/*,
    // reference eval/api.py) rooted at that directory (scan-configs,
    // markdown scriptures); unset → the router isn't mounted, /eval 404s
    val evalApi = sys.env.get("GRAFT_EVAL_BASE").map(base =>
      new graft.api.EvalApi(spark, basePdfPath = base,
        baseTextPath = s"$base/text", baseOcrPath = s"$base/ocr"))
    val server = new graft.api.SearchHttpServer(mem, port = port,
      evalApi = evalApi,
      granthStore = Some(granths), similarDocs = similar,
      internalNode = internalNode,
      internalSimilar = similarLocal,
      internalOnly = internalOnly,
      metricsSink = metricsSink.getOrElse(graft.api.SearchHttpServer.bufferMetrics),
      feedbackSink = feedbackSink.getOrElse(graft.api.SearchHttpServer.bufferFeedback))
    // a swap changes facet values → the 30-min metadata TTL cache must drop
    // in the same step, and the poller only starts once the server exists
    reloader.foreach { rn =>
      rn.onSwap = () => server.invalidateMetadataCache()
      if (reloadMs > 0) {
        rn.start()
        println(s"[serve] hot-reload poll every $reloadMs ms")
      }
    }
    server.start()
    // the logged URL and the one-shot self-test must target the ACTUAL bound
    // interface: under GRAFT_BIND_ADDR the server does not listen on
    // loopback at all, so a hard-coded 127.0.0.1 here logs an unreachable
    // URL and crashes the smoke run with ConnectException. Read from the
    // live socket (IPv6-bracketed), never a second copy of the env rule.
    // (PeerShard scrubs GRAFT_BIND_ADDR from shard JVMs, so its
    // loopback-anchored readiness regex keeps matching.)
    val host = server.boundHostForUrl
    println(s"[serve] listening on http://$host:${server.boundPort}/api/search")
    if (sys.env.get("GRAFT_SERVE_ONESHOT").contains("1")) {
      val client = java.net.http.HttpClient.newHttpClient()
      val phrase = graft.corpus.Webtext.GoldenPhrase("hi").mkString(" ")
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://$host:${server.boundPort}/api/search"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          s"""{"query": "$phrase", "language": "hindi"}"""))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      println(s"[serve] self-test /api/search -> ${resp.statusCode()}: " +
        resp.body().take(400))
      def get(path: String): java.net.http.HttpResponse[String] =
        client.send(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://$host:${server.boundPort}$path"))
          .GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      val meta = get("/api/metadata")
      println(s"[serve] self-test /api/metadata -> ${meta.statusCode()}: " +
        meta.body().take(400))
      // chunk 40 sits mid-topic (topic0: 0,20,40,…) → prev+next populated
      val ctx = get("/api/context/40?language=hi")
      println(s"[serve] self-test /api/context/40 -> ${ctx.statusCode()}: " +
        ctx.body().take(300))
      val verse = get("/api/granth/verse?original_filename=granth0.md&verse_seq_num=1")
      println(s"[serve] self-test /api/granth/verse -> ${verse.statusCode()}: " +
        verse.body().take(300))
      val prose = get("/api/granth/prose?original_filename=granth0.md&prose_seq_num=4")
      println(s"[serve] self-test /api/granth/prose -> ${prose.statusCode()}: " +
        prose.body().take(300))
      similar.foreach { _ =>
        val sim = get("/api/similar-documents/5")
        println(s"[serve] self-test /api/similar-documents/5 -> ${sim.statusCode()}: " +
          sim.body().take(300))
      }
      evalApi.foreach { _ =>
        val ep = get("/eval/paths")
        println(s"[serve] self-test /eval/paths -> ${ep.statusCode()}: ${ep.body().take(200)}")
        val ext = client.send(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://$host:${server.boundPort}/eval/extract"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            """{"page_text": "पहली पंक्ति है।\nदूसरी पंक्ति पूरी होती है।", "language": "hin", "mode": "advanced"}"""))
          .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
        println(s"[serve] self-test /eval/extract -> ${ext.statusCode()}: ${ext.body().take(300)}")
      }
      logDir.foreach { d =>
        metricsSink.foreach(_.close()); feedbackSink.foreach(_.close())
        val n = scala.io.Source.fromFile(s"$d/metrics.log").getLines().size
        println(s"[serve] self-test metrics log: $n line(s) at $d/metrics.log " +
          "(parse with graft.tools.MetricsCli --summary)")
      }
      server.stop()
      spark.stop()
    } else {
      Thread.currentThread().join() // serve until killed
    }
  }
}
