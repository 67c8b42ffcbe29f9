package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Webtext
import graft.index.IndexBuild
import graft.query.{IndexHandle, InMemoryIndex, ProcFleet, QuerySpec}

/** N-shard FLEET scaling curve at a fixed large corpus (round-5 task #4):
  * BuildLadder proved resident load is linear in corpus size (the stated
  * answer being the doc-sharded fleet), so this measures the fleet itself —
  * 1 / 2 / 4 shard processes over the SAME index:
  *
  *   - per-node LOAD cost: the head shard's resident load, expected ∝ 1/N
  *     (each node holds numChunks/N chunks; this is the number that keeps a
  *     node's boot time and RSS flat as the corpus grows N×);
  *   - serve qps through the REAL multi-process path (peer shards in their
  *     own JVMs, ProcFleet scatter over sockets) vs N;
  *   - the coverage handshake at every topology (a mis-assigned ladder run
  *     fails loudly instead of publishing an under-covered qps).
  *
  * N=1 is the single full resident node (the honest reference: no scatter,
  * docstore resident). Emits one JSON line (BENCH_r*_fleet artifact).
  *
  * Env: GRAFT_FLEETLADDER_DOCS (default 2000000), GRAFT_FLEETLADDER_SHARDS
  * ("1,2,4"), GRAFT_FLEETLADDER_DIR (/tmp/graft-fleetladder),
  * GRAFT_FLEETLADDER_DOCS_PER_CHUNK (200000), SPARK_GRAFT_CPUS (32).
  */
object FleetLadder {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val docs = sys.env.getOrElse("GRAFT_FLEETLADDER_DOCS", "2000000").toLong
    val shardCounts = sys.env.getOrElse("GRAFT_FLEETLADDER_SHARDS", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val docsPerChunk =
      sys.env.getOrElse("GRAFT_FLEETLADDER_DOCS_PER_CHUNK", "200000").toLong
    val workDir = sys.env.getOrElse("GRAFT_FLEETLADDER_DIR", "/tmp/graft-fleetladder")
    val numChunks = math.max(shardCounts.max, (docs / docsPerChunk).toInt)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.maxResultSize", "0") // resident loads ARE collects
      .config("spark.local.dir", s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- corpus + index, built ONCE and reused across ladder runs ----
    val corpusDir = s"$workDir/corpus_$docs"
    if (!new java.io.File(corpusDir, "_SUCCESS").exists()) {
      CpuProbe.rmDir(corpusDir)
      Webtext.synthesize(spark, docs, partitions = 256).toDF()
        .drop("html").write.parquet(corpusDir)
    }
    val idxDir = s"$workDir/idx_${docs}_c$numChunks"
    // trust only a FINALIZED index whose manifest covers every chunk — a
    // killed prior run must rebuild, not fabricate ladder numbers
    val complete = graft.index.TableIO.exists(s"$idxDir/stats.json") &&
      graft.index.IndexBuild.readProps(idxDir).numChunks == numChunks
    if (!complete) {
      CpuProbe.rmDir(idxDir)
      val t0 = System.nanoTime()
      IndexBuild.build(spark, spark.read.parquet(corpusDir), idxDir, numChunks = numChunks)
      System.err.println(f"[fleet-ladder] built $docs docs / $numChunks chunks in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val idx = IndexHandle.load(idxDir)

    // ---- mixed-shape qps load, same shapes as graft.Bench ----
    val hiPhrase = Webtext.GoldenPhrase("hi").mkString(" ")
    val qpsMix: IndexedSeq[QuerySpec] = IndexedSeq(
      QuerySpec("hi", hiPhrase),
      QuerySpec("hi", hiPhrase, mode = "any"),
      QuerySpec("hi", hiPhrase, phrase = true),
      QuerySpec("hi", Webtext.word("hi", 0), mode = "any"),
      QuerySpec("hi", hiPhrase, metaFilters = Map("category" -> Seq("Pravachan"))))
    val qpsThreads = math.max(2, cpus / 2)
    val qpsQueries = 2000
    def qpsRun(node: graft.query.SearchNode): Double = {
      val next = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(qpsThreads)
      val t0 = System.nanoTime()
      val futs = (1 to qpsThreads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = next.getAndIncrement()
            while (i < qpsQueries) {
              node.search(qpsMix(i % qpsMix.length))
              i = next.getAndIncrement()
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      qpsQueries / ((System.nanoTime() - t0) / 1e9)
    }

    // ---- peer shard JVM management (the Bench recipe) ----
    def spawnPeer(chunks: Set[Int], peerCpus: Int): (Process, String, Double) = {
      val jvm = System.getProperty("java.home") + "/bin/java"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(jvm) ++ addOpens ++ Seq(
        "-Dfile.encoding=UTF-8", "-Dspark.ui.enabled=false", "-Xmx10g",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.ServeCli", idxDir, "0")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("GRAFT_SERVE_CHUNKS", chunks.toSeq.sorted.mkString(","))
      // fair share of the host per shard JVM (a real fleet gives each node
      // its own machine; here N nodes split one)
      pb.environment().put("GRAFT_SERVE_CPUS", peerCpus.toString)
      pb.environment().put("GRAFT_SERVE_RELOAD_MS", "0") // static ladder topology
      pb.environment().remove("GRAFT_FLEET_PEERS")
      pb.environment().remove("GRAFT_SERVE_ONESHOT")
      pb.redirectErrorStream(true)
      val tSpawn = System.nanoTime()
      val proc = pb.start()
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val urlRe = "listening on (http://127\\.0\\.0\\.1:\\d+)".r
      var url: String = null
      val deadline = System.nanoTime() + 600L * 1000000000L
      while (url == null) {
        if (System.nanoTime() > deadline) sys.error("peer not ready within 600 s")
        if (reader.ready()) {
          val line = reader.readLine()
          if (line == null) sys.error("peer JVM died during startup")
          urlRe.findFirstMatchIn(line).foreach(m => url = m.group(1))
        } else if (!proc.isAlive) sys.error("peer JVM died during startup")
        else Thread.sleep(100)
      }
      val readySec = (System.nanoTime() - tSpawn) / 1e9
      val drain = new Thread(() => {
        try { while (reader.readLine() != null) () } catch { case _: Exception => () }
      })
      drain.setDaemon(true)
      drain.start()
      (proc, url, readySec)
    }

    // ---- the ladder ----
    val steps = shardCounts.map { n =>
      val probe = CpuProbe.efficiency(cpus)
      if (n == 1) {
        val t0 = System.nanoTime()
        var mem: InMemoryIndex = InMemoryIndex.load(spark, idx)
        val loadSec = (System.nanoTime() - t0) / 1e9
        qpsRun(mem) // warmup
        val att = (1 to 3).map(_ => qpsRun(mem))
        mem = null
        System.gc()
        System.err.println(f"[fleet-ladder] N=1 load=$loadSec%.1f s qps=${att.max}%.1f probe=$probe%.2f")
        (n, numChunks, loadSec, Seq.empty[Double], att, probe)
      } else {
        val assign = graft.query.ShardedServe.chunkAssignment(numChunks, n)
        // head load measured ALONE (the per-node ∝1/N number) — spawning
        // peers first put N-1 concurrent Spark boots under the measurement
        // and inverted the curve in the first 2M run
        val shared = InMemoryIndex.loadGlobalDf(spark, idx)
        val t0 = System.nanoTime()
        var head: InMemoryIndex = InMemoryIndex.load(spark, idx,
          chunks = Some(assign.head), sharedGlobalDf = Some(shared))
        val headLoadSec = (System.nanoTime() - t0) / 1e9
        val peers = assign.tail.map(spawnPeer(_, math.max(2, cpus / n)))
        try {
          val headPinned = head
          val fleet = new ProcFleet(() => headPinned, peers.map(_._2), numChunks)
          fleet.verifyCoverage() // fails loudly on a mis-assigned ladder
          qpsRun(fleet) // warmup (JITs the wire codec too)
          val att = (1 to 4).map(_ => qpsRun(fleet))
          head = null
          System.err.println(f"[fleet-ladder] N=$n head_load=$headLoadSec%.1f s " +
            f"peer_ready=${peers.map(_._3).map(x => f"$x%.1f").mkString("/")} s " +
            f"qps=${att.max}%.1f probe=$probe%.2f")
          (n, numChunks, headLoadSec, peers.map(_._3), att, probe)
        } finally {
          peers.foreach { case (p, _, _) => p.destroy(); p.waitFor() }
          System.gc()
        }
      }
    }

    val stepJson = steps.map { case (n, chunks, loadSec, peerReady, att, probe) =>
      val headChunks = graft.query.ShardedServe.chunkAssignment(chunks, n).head.size
      f"""{"shards":$n,"chunks":$chunks,"head_chunks":$headChunks,""" +
        f""""head_load_sec":$loadSec%.2f,"peer_ready_sec":[${peerReady.map(x => f"$x%.1f").mkString(",")}],""" +
        f""""qps":${att.max}%.1f,"qps_attempts":[${att.map(x => f"$x%.1f").mkString(",")}],""" +
        f""""probe":$probe%.3f}"""
    }.mkString("[", ",", "]")
    val loadByShards = steps.map(s => s._1 -> s._3).toMap
    val loadRatio =
      if (loadByShards.contains(1) && loadByShards.contains(shardCounts.max))
        loadByShards(1) / loadByShards(shardCounts.max)
      else 0.0
    println(f"""{"metric":"fleet_ladder","docs":$docs,"chunks":$numChunks,"cpus":$cpus,""" +
      f""""qps_threads":$qpsThreads,"load_ratio_1_to_max":$loadRatio%.2f,"steps":$stepJson}""")
    spark.stop()
    CpuProbe.rmDir(s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}")
  }
}
