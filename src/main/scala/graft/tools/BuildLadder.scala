package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Webtext
import graft.index.IndexBuild
import graft.query.{IndexHandle, InMemoryIndex, QuerySpec}

/** Index-build GROWTH curve: the same build job at 1× and 10× rows on the
  * same cores — the data-scaling complement to [[ScalingBench]]'s
  * core-scaling curve. Expectation at a linear-scaling design: wall grows
  * ~linearly with rows (wall_ratio ≈ docs_ratio), resident query p50 stays
  * flat (top-k work is bounded by postings of the query terms, not corpus
  * size — df grows 10×, but the WAND/BMW kernel's pruning keeps the scored
  * set ~k·segments).
  *
  * Chunk count scales with the corpus (docs / GRAFT_BUILDLADDER_DOCS_PER_CHUNK,
  * default 200k) — exactly how a cluster deployment holds merge-group size
  * constant as data grows; the per-chunk work is then size-invariant and
  * the ladder measures the engine, not a degenerating group size.
  *
  * Corpus is PRE-MATERIALIZED parquet (untimed) — the engine's input is a
  * table, not a generator. Emits one JSON line (BENCH_r*_ladder artifact).
  */
object BuildLadder {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // GRAFT_BUILDLADDER_*: deliberately NOT the GRAFT_LADDER_* namespace —
    // ScaleLadder parses GRAFT_LADDER_BUILD_DOCS as a single long, so
    // sharing the name would make one tool's config crash the other
    val sizes = sys.env.getOrElse("GRAFT_BUILDLADDER_DOCS", "200000,2000000")
      .split(",").map(_.trim.toLong).toSeq
    val docsPerChunk = sys.env.getOrElse("GRAFT_BUILDLADDER_DOCS_PER_CHUNK", "200000").toLong
    val attempts = sys.env.getOrElse("GRAFT_ATTEMPTS", "2").toInt
    val workDir = sys.env.getOrElse("GRAFT_BUILDLADDER_DIR", "/tmp/graft-ladder")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // the resident serve-load step IS a driver collect of the index (the
      // driver plays the serving node here); at 2M docs that exceeds the
      // default 1g result cap
      .config("spark.driver.maxResultSize", "0")
      .config("spark.local.dir", s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rm(p: String): Unit = CpuProbe.rmDir(p)
    def cpuStat(): (Long, Long) = CpuProbe.cpuStat()

    // JIT warm-up (documented in BASELINE.md: a fresh JVM's first build runs
    // 5-7× slow on codegen/JIT, unrelated to data size); 50k docs — the 5k
    // warm left the first 200k attempt 2.7× over its best
    rm(s"$workDir/warm")
    IndexBuild.build(spark,
      Webtext.synthesize(spark, sys.env.getOrElse("GRAFT_BUILDLADDER_WARM_DOCS", "50000").toLong).toDF(),
      s"$workDir/warm", numChunks = 1)

    val hiPhrase = Webtext.GoldenPhrase("hi").mkString(" ")
    val steps = sizes.map { n =>
      val chunks = math.max(1, (n / docsPerChunk).toInt)
      val corpusDir = s"$workDir/corpus_$n"
      // completeness check, not bare exists(): a killed prior run leaves a
      // partial dir whose silent reuse would fabricate the ladder numbers
      if (!new java.io.File(corpusDir, "_SUCCESS").exists()) {
        rm(corpusDir)
        Webtext.synthesize(spark, n, partitions = 256).toDF()
          .drop("html").write.parquet(corpusDir)
      }
      val corpus = spark.read.parquet(corpusDir)

      val runs = (1 to attempts).map { a =>
        val probe = CpuProbe.efficiency(cpus)
        val dir = s"$workDir/idx_$n"
        rm(dir)
        val (tot0, st0) = cpuStat()
        val t0 = System.nanoTime()
        IndexBuild.build(spark, corpus, dir, numChunks = chunks)
        val wall = (System.nanoTime() - t0) / 1e9
        val (tot1, st1) = cpuStat()
        val steal = if (tot1 == tot0) 0.0 else 100.0 * (st1 - st0) / (tot1 - tot0)
        System.err.println(f"[ladder] n=$n attempt $a: $wall%.1f s (steal $steal%.1f%%, probe $probe%.2f)")
        (wall, steal, probe)
      }
      val best = runs.minBy(_._1)

      // resident serve p50 at this size (payload-free load: the query path;
      // docs resident too so the measurement includes page materialization)
      val idx = IndexHandle.load(s"$workDir/idx_$n")
      val tLoad0 = System.nanoTime()
      val mem = InMemoryIndex.load(spark, idx)
      val loadSec = (System.nanoTime() - tLoad0) / 1e9
      def p50(q: QuerySpec): Double = {
        (1 to 5).foreach(_ => mem.search(q))
        val ts = (1 to 50).map { _ =>
          val t = System.nanoTime(); mem.search(q); (System.nanoTime() - t) / 1e6
        }
        ts.sorted.apply(ts.length / 2)
      }
      val r = Map(
        "and" -> p50(QuerySpec("hi", hiPhrase)),
        "any" -> p50(QuerySpec("hi", hiPhrase, mode = "any")),
        "phrase" -> p50(QuerySpec("hi", hiPhrase, phrase = true)),
        "head" -> p50(QuerySpec("hi", Webtext.word("hi", 0), mode = "any")))
      rm(s"$workDir/idx_$n")
      (n, chunks, best, runs, loadSec, r)
    }

    val stepJson = steps.map { case (n, chunks, best, runs, loadSec, r) =>
      val attemptsJson = runs.map(x =>
        f"""{"wall":${x._1}%.1f,"steal_pct":${x._2}%.1f,"probe":${x._3}%.3f}""").mkString("[", ",", "]")
      f"""{"docs":$n,"chunks":$chunks,"build_sec":${best._1}%.1f,"docs_per_sec":${n / best._1}%.1f,""" +
        f""""steal_pct":${best._2}%.1f,"probe":${best._3}%.3f,"attempts":$attemptsJson,""" +
        f""""load_sec":$loadSec%.1f,"serve_p50_ms":{"and":${r("and")}%.2f,"any":${r("any")}%.2f,""" +
        f""""phrase":${r("phrase")}%.2f,"head":${r("head")}%.2f}}"""
    }.mkString("[", ",", "]")
    val wallRatio = steps.last._3._1 / steps.head._3._1
    val docsRatio = steps.last._1.toDouble / steps.head._1
    println(f"""{"metric":"build_ladder","cpus":$cpus,"docs_ratio":$docsRatio%.1f,""" +
      f""""wall_ratio":$wallRatio%.2f,"steps":$stepJson}""")
    spark.stop()
    rm(s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}") // tmpfs hygiene
  }
}
