package graft.tools

import org.apache.spark.sql.SparkSession
import graft.query.{Bm25Query, IndexHandle, QuerySpec}

/** Minimal A/B timer for the Spark-job query path: builds (or reuses) a
  * small synthetic index, then prints warm per-attempt walls and medians for
  * `query_and` / `query_any` / `query_datefiltered` as ONE JSON line. The
  * file is deliberately self-contained against APIs that exist unchanged
  * since round 3, so the identical source can be dropped into an old-commit
  * worktree and the two binaries alternated inside the same host window —
  * the recipe for attributing a bench-metric drift to code vs host.
  *
  * Env: GRAFT_QAB_DOCS (default 100000), GRAFT_QAB_DIR
  * (/dev/shm/graft_qab_<docs>), GRAFT_QAB_ATTEMPTS (7), SPARK_GRAFT_CPUS (32).
  */
object QueryAb {
  def main(args: Array[String]): Unit = {
    // the one-line JSON protocol must parse regardless of host locale —
    // f"%.3f" under a comma-decimal locale would emit invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val docs = sys.env.getOrElse("GRAFT_QAB_DOCS", "100000").toLong
    val attempts = sys.env.getOrElse("GRAFT_QAB_ATTEMPTS", "7").toInt
    val dir = sys.env.getOrElse("GRAFT_QAB_DIR", s"/dev/shm/graft_qab_$docs")
    // pid-stamped under the shared graft-spark- prefix: a clean exit removes
    // it below, and graft.Bench's startup sweep reclaims dead-pid leftovers —
    // a killed run must not strand shuffle state in RAM-backed tmpfs
    val localDir = s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}-qab"
    val spark = SparkSession.builder()
      .appName("graft-query-ab")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // each binary builds its own index (formats may differ across commits):
    // reuse requires the completion marker AND a tag matching THIS binary —
    // the default tag is the classpath location, which differs per worktree,
    // so alternated binaries never silently share an index. Keep both
    // indexes warm across alternations by pointing GRAFT_QAB_DIR (or
    // GRAFT_QAB_TAG) at per-worktree values.
    val tag = sys.env.getOrElse("GRAFT_QAB_TAG",
      // getCodeSource is null under some launchers (uber-jar-in-jar, custom
      // app loaders) — fall back to a tag that still differs per build
      Option(QueryAb.getClass.getProtectionDomain.getCodeSource)
        .flatMap(cs => Option(cs.getLocation)).map(_.toString)
        .getOrElse("no-codesource:" + Integer.toHexString(
          System.getProperty("java.class.path", "").hashCode)))
    val done = new java.io.File(dir, "stats.json")
    val tagFile = new java.io.File(dir, "qab_tag")
    val tagOk = tagFile.isFile && new String(
      java.nio.file.Files.readAllBytes(tagFile.toPath),
      java.nio.charset.StandardCharsets.UTF_8) == tag
    if (!done.exists() || !tagOk) {
      CpuProbe.rmDir(dir)
      import spark.implicits._
      graft.index.IndexBuild.build(spark,
        graft.corpus.Webtext.synthesize(spark, docs).toDF().drop("html"),
        dir, numChunks = 2)
      java.nio.file.Files.write(tagFile.toPath,
        tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val idx = IndexHandle.load(dir)
    val phrase = graft.corpus.Webtext.GoldenPhrase("hi").mkString(" ")
    val specs = Seq(
      "query_and" -> QuerySpec("hi", phrase),
      "query_any" -> QuerySpec("hi", phrase, mode = "any"),
      "query_datefiltered" -> QuerySpec("hi", phrase,
        dateRange = Some((Some(2019), Some(2020)))))
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    val out = specs.map { case (name, q) =>
      Bm25Query.search(spark, idx, q) // warmup
      val walls = (1 to attempts).map { _ =>
        val t0 = System.nanoTime()
        Bm25Query.search(spark, idx, q)
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[qab] $name attempts=${walls.map(w => f"$w%.3f").mkString(",")}")
      f""""$name":{"median_sec":${median(walls)}%.3f,"min_sec":${walls.min}%.3f}"""
    }
    val probe = CpuProbe.efficiency(cpus)
    println(s"""{"metric":"query_ab","docs":$docs,${out.mkString(",")},"probe":${f"$probe%.3f"}}""")
    spark.stop()
    CpuProbe.rmDir(localDir) // tmpfs hygiene
  }
}
