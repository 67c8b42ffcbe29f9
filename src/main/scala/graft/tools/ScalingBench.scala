package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Webtext
import graft.index.IndexBuild
import graft.query.{Bm25Query, IndexHandle, QuerySpec}

/** Scaling evidence for the north rule: the same index-build job at two
  * parallelism levels (local[N] vs local[4N]) on the SAME input, reporting
  * throughput at both and the scaling efficiency
  *   eff = (T_N · N) / (T_4N · 4N)            (≥ 0.8 required)
  * — the sandbox substitute for an N- vs 4N-executor cluster (BASELINE.md).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    // the one-line JSON protocol must parse regardless of host locale —
    // f"%.3f" under a comma-decimal locale would emit invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val docs = sys.env.getOrElse("GRAFT_BENCH_DOCS", "100000").toLong
    val lo = sys.env.getOrElse("GRAFT_SCALE_N", "8").toInt
    val hi = lo * 4
    val chunks = sys.env.getOrElse("GRAFT_CHUNKS", "2").toInt

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-scaling-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.local.dir", s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}-$cpus")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // one shared recursive-delete implementation for all bench/ladder tools
    def rm(p: String): Unit = CpuProbe.rmDir(p)

    // JIT warmup on a small corpus so the first timed run isn't penalized
    locally {
      val s = session(lo)
      rm("/dev/shm/graft_scale_warm")
      IndexBuild.build(s, Webtext.synthesize(s, 5000).toDF(), "/dev/shm/graft_scale_warm",
        numChunks = 1)
      s.stop()
    }

    // This sandbox is a VM whose host steals CPU in waves (observed minutes
    // of heavy steal): a single wall-clock sample can be off by 4×. Each
    // level runs `attempts` times; we keep the fastest attempt (capability
    // under least external interference) and report the steal fraction
    // measured during it.
    // shared 8-field implementation — this copy previously summed ALL
    // /proc/stat fields (guest double-count), understating steal%
    def cpuStat(): (Long, Long) = CpuProbe.cpuStat()
    val attempts = sys.env.getOrElse("GRAFT_ATTEMPTS", "3").toInt

    def runOnce(cpus: Int, a: Int): (Double, Double, Double, Double, Double) = {
      val probe = CpuProbe.efficiency(cpus) // machine capacity RIGHT NOW
      val s = session(cpus)
      val dir = s"/dev/shm/graft_scale_$cpus"
      rm(dir)
      // pre-materialized corpus (UNTIMED): the engine's input is a table
      val corpusDir = s"/dev/shm/graft_scale_corpus_$docs"
      // reuse only a COMPLETE corpus (_SUCCESS marker): a killed prior run
      // leaves a partial parquet dir whose silent reuse would fabricate the
      // scaling numbers this tool exists to publish
      if (!new java.io.File(corpusDir, "_SUCCESS").isFile) {
        rm(corpusDir)
        Webtext.synthesize(s, docs, partitions = 128).toDF()
          .drop("html").write.parquet(corpusDir)
      }
      val corpus = s.read.parquet(corpusDir)
      val (tot0, st0) = cpuStat()
      val t0 = System.nanoTime()
      IndexBuild.build(s, corpus, dir, numChunks = chunks)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val (tot1, st1) = cpuStat()
      val stealPct = if (tot1 == tot0) 0.0 else 100.0 * (st1 - st0) / (tot1 - tot0)
      // warm query latency at this parallelism
      val idx = IndexHandle.load(dir)
      val q = QuerySpec("hi", Webtext.GoldenPhrase("hi").mkString(" "))
      Bm25Query.search(s, idx, q)
      val lat = (1 to 5).map { _ =>
        val q0 = System.nanoTime()
        Bm25Query.search(s, idx, q)
        (System.nanoTime() - q0) / 1e9
      }.sorted.apply(2)
      s.stop()
      // min(pre, post), the same guard Bench/FleetLadder apply: a host cap
      // that ARRIVES during the tens-of-seconds build (the documented
      // round-4 failure mode) is invisible to a pre-only probe, and the
      // published probe feeds efficiency_hw_normalized — a clean pre next
      // to a capped attempt would hw-normalize by the wrong delivered
      // capacity. Probed after the query loop so the whole attempt window
      // is bracketed.
      val probePost = CpuProbe.efficiency(cpus)
      val probeMin = math.min(probe, probePost)
      System.err.println(f"[scaling] cores=$cpus attempt=$a wall=$tBuild%.1f s " +
        f"steal=$stealPct%.1f%% cpu_probe=$probeMin%.2f (pre $probe%.2f / post $probePost%.2f)")
      (tBuild, docs / tBuild, lat, stealPct, probeMin)
    }

    // INTERLEAVED attempts (lo, hi, lo, hi, ...): this host's capacity drifts
    // on a minutes scale, so running all-lo then all-hi lets the two levels
    // sample different machines — the ratio then measures the host, not the
    // engine. Interleaving puts each lo attempt next to a hi attempt in time.
    val attLo = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double, Double)]
    val attHi = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double, Double)]
    for (a <- 1 to attempts) {
      attLo += runOnce(lo, a)
      attHi += runOnce(hi, a)
    }
    val bestLo = attLo.minBy(_._1)
    val bestHi = attHi.minBy(_._1)
    val (tLo, thrLo, latLo, stLo, prLo) = bestLo
    val (tHi, thrHi, latHi, stHi, prHi) = bestHi
    // best-of-N efficiency can pair measurements from windows ~an hour apart
    // (lo's best in a late turbo window vs hi's best in an earlier one), so
    // ALSO publish the per-PAIR efficiencies — each interleaved (lo, hi)
    // adjacent pair samples the same minutes of host capacity, which is what
    // "the same cluster at two sizes" actually means — and their median.
    val effPairs = attLo.zip(attHi).map { case (l, h) => (l._1 * lo) / (h._1 * hi) }
    val effPairedMedian = effPairs.sorted.apply((effPairs.size - 1) / 2)
    val eff = (tLo * lo) / (tHi * hi)
    // efficiency against the cores the machine actually DELIVERED at each
    // level (probe-measured): on a real cluster probe≈1.0 at both levels and
    // this equals raw efficiency
    val effHw = (tLo * lo * prLo) / (tHi * hi * prHi)
    Seq(s"/dev/shm/graft_scale_$lo", s"/dev/shm/graft_scale_$hi",
      s"/dev/shm/graft_scale_corpus_$docs",
      "/dev/shm/graft_scale_warm",
      // the two spark.local.dir roots are pid-stamped — nothing else ever
      // cleans them, and dead shuffle state in tmpfs is RAM
      s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}-$lo",
      s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}-$hi").foreach(rm) // tmpfs hygiene
    def attJson(xs: Seq[(Double, Double, Double, Double, Double)]): String =
      xs.map(x => f"""{"wall_sec":${x._1}%.1f,"steal_pct":${x._4}%.1f,"probe":${x._5}%.3f}""")
        .mkString("[", ",", "]")
    println(f"""{"metric":"scaling","docs":$docs,"chunks":$chunks,""" +
      f""""n_cores":$lo,"t_n_sec":$tLo%.2f,"docs_per_sec_n":$thrLo%.1f,"query_p50_n_sec":$latLo%.3f,"steal_pct_n":$stLo%.1f,"cpu_probe_n":$prLo%.3f,""" +
      f""""n4_cores":$hi,"t_4n_sec":$tHi%.2f,"docs_per_sec_4n":$thrHi%.1f,"query_p50_4n_sec":$latHi%.3f,"steal_pct_4n":$stHi%.1f,"cpu_probe_4n":$prHi%.3f,""" +
      f""""attempts_n":${attJson(attLo.toSeq)},"attempts_4n":${attJson(attHi.toSeq)},""" +
      f""""efficiency_pairs":[${effPairs.map(x => f"$x%.3f").mkString(",")}],""" +
      f""""efficiency_paired_median":$effPairedMedian%.3f,""" +
      f""""efficiency":$eff%.3f,"efficiency_hw_normalized":$effHw%.3f}""")
  }
}
