package graft.tools

/** Spawns a [[ServeCli]] shard JVM (a chunk-subset node serving only the
  * internal scatter endpoints) and waits for readiness — the ONE copy of the
  * fleet-peer recipe shared by `graft.Bench` and [[FleetLadder]]. Keeping it
  * in one place means a JDK add-opens change or a readiness-log format change
  * cannot silently break whichever tool wasn't updated.
  */
object PeerShard {

  // env vars that would silently change a peer's behavior if inherited from
  // the launcher's shell (e.g. a GRAFT_SERVE_EMB left over from a
  // similar-docs experiment would make every peer build HNSW graphs at boot,
  // inflating the recorded ready time — the same env-leak class as the
  // GRAFT_LADDER_*/GRAFT_BUILDLADDER_* collision)
  private val scrub = Seq(
    "GRAFT_FLEET_PEERS", "GRAFT_SERVE_ONESHOT", "GRAFT_SERVE_SHARDS",
    "GRAFT_SERVE_EMB", "GRAFT_SERVE_LOG_DIR", "GRAFT_SERVE_GRANTHS",
    "GRAFT_FLEET_ALLOW_DEGRADED", "GRAFT_SERVE_CPUS",
    // a leaked eval base would mount /eval/* on every shard; a leaked bind
    // address would put shards on a routable interface — and break the
    // loopback-anchored readiness regex below
    "GRAFT_EVAL_BASE", "GRAFT_BIND_ADDR")

  /** Boot a shard JVM over `idxDir` serving `chunks`; block until its HTTP
    * endpoint logs readiness. Returns (process, url, readySeconds). On ANY
    * failure after process start (death, wedge past the deadline) the
    * process is destroyed before the error propagates — a launcher spawning
    * N peers must additionally destroy the ALREADY-returned ones in its own
    * error path.
    *
    * @param cpus Spark threads for the shard's session (GRAFT_SERVE_CPUS);
    *   None keeps ServeCli's default. A fleet on one host divides the cores.
    */
  def spawn(idxDir: String, chunks: Set[Int], xmx: String, deadlineSec: Long,
      cpus: Option[Int] = None): (Process, String, Double) = {
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
      "-Dfile.encoding=UTF-8", "-Dspark.ui.enabled=false", s"-Xmx$xmx",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ServeCli", idxDir, "0")
    val pb = new ProcessBuilder(cmd: _*)
    scrub.foreach(pb.environment().remove) // scrub FIRST, then set explicitly
    pb.environment().put("GRAFT_SERVE_CHUNKS", chunks.toSeq.sorted.mkString(","))
    cpus.foreach(c => pb.environment().put("GRAFT_SERVE_CPUS", c.toString))
    // static measurement topology: a reload poll ticking during a qps run is
    // noise, and nothing mutates the index mid-measurement
    pb.environment().put("GRAFT_SERVE_RELOAD_MS", "0")
    pb.redirectErrorStream(true)
    val tSpawn = System.nanoTime()
    val proc = pb.start()
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val urlRe = "listening on (http://127\\.0\\.0\\.1:\\d+)".r
      var url: String = null
      // deadline-guarded poll, not a bare readLine(): a peer that wedges
      // during Spark init while staying alive and silent would otherwise
      // hang the launcher forever
      val deadline = System.nanoTime() + deadlineSec * 1000000000L
      // char-at-a-time under ready(), never readLine(): ready() only
      // promises SOME bytes, so a shard wedging after a partial line (GC
      // death spiral mid-write) would park readLine() on the missing
      // newline forever, past the deadline this loop exists to enforce
      val lineBuf = new java.lang.StringBuilder(256)
      while (url == null) {
        if (System.nanoTime() > deadline)
          sys.error(s"peer shard JVM not ready within $deadlineSec s")
        if (reader.ready()) {
          val ch = reader.read()
          if (ch < 0) sys.error("peer shard JVM died during startup")
          else if (ch == '\n') {
            urlRe.findFirstMatchIn(lineBuf.toString).foreach(m => url = m.group(1))
            lineBuf.setLength(0)
          } else lineBuf.append(ch.toChar)
        } else if (!proc.isAlive) sys.error("peer shard JVM died during startup")
        else Thread.sleep(100)
      }
      val readySec = (System.nanoTime() - tSpawn) / 1e9
      val drain = new Thread(() => {
        try { while (reader.readLine() != null) () } catch { case _: Exception => () }
      })
      drain.setDaemon(true)
      drain.start()
      (proc, url, readySec)
    } catch {
      case e: Throwable =>
        proc.destroy()
        proc.waitFor()
        throw e
    }
  }
}
