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
    val idxDir = args.headOption.getOrElse("/tmp/gidx")
    val port = if (args.length > 1) args(1).toInt else 0
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!graft.index.TableIO.exists(s"$idxDir/stats.json")) {
      val n = sys.env.getOrElse("GRAFT_BUILD_DOCS", "10000").toLong
      println(s"[serve] no index at $idxDir — building synthetic ($n docs)")
      graft.index.IndexBuild.build(spark, graft.corpus.Webtext.synthesize(spark, n).toDF(), idxDir)
    }
    val idx = graft.query.IndexHandle.load(idxDir)
    // GRAFT_SERVE_SHARDS=N boots an in-process doc-sharded fleet (one node
    // per chunk subset, scatter-gather behind the same API) instead of one
    // full resident node
    val shards = sys.env.getOrElse("GRAFT_SERVE_SHARDS", "1").toInt
    val mem: graft.query.SearchNode =
      if (shards <= 1) graft.query.InMemoryIndex.load(spark, idx)
      else {
        val numChunks = graft.index.IndexBuild.readProps(idxDir).numChunks
        println(s"[serve] doc-sharded fleet: $shards nodes over $numChunks chunks")
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
    val server = new graft.api.SearchHttpServer(mem, port = port)
    server.start()
    println(s"[serve] listening on http://127.0.0.1:${server.boundPort}/api/search")
    if (sys.env.get("GRAFT_SERVE_ONESHOT").contains("1")) {
      val client = java.net.http.HttpClient.newHttpClient()
      val phrase = graft.corpus.Webtext.GoldenPhrase("hi").mkString(" ")
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://127.0.0.1:${server.boundPort}/api/search"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          s"""{"query": "$phrase", "language": "hindi"}"""))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      println(s"[serve] self-test /api/search -> ${resp.statusCode()}: " +
        resp.body().take(400))
      val meta = client.send(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://127.0.0.1:${server.boundPort}/api/metadata"))
        .GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      println(s"[serve] self-test /api/metadata -> ${meta.statusCode()}: " +
        meta.body().take(400))
      server.stop()
      spark.stop()
    } else {
      Thread.currentThread().join() // serve until killed
    }
  }
}
