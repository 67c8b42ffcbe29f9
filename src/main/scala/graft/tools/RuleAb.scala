package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.plans.IndexAccessRule

/** A/B timer for the Catalyst index-substitution rule: the SAME declarative
  * match query over the docstore, once as the naive scan (rule uninstalled —
  * re-analyzes every document) and once rewritten (posting-list semi join;
  * the match predicate leaves the plan, so column pruning stops reading the
  * `text` bytes at the scan). Prints ONE JSON line with per-arm medians,
  * the speedup, and whether `text` was actually pruned from the docstore
  * scan — the at-scale claim (text is the overwhelming share of corpus
  * bytes) made checkable on the small fixture.
  *
  * Env: GRAFT_RULEAB_DOCS (default 200000), GRAFT_RULEAB_DIR
  * (/dev/shm/graft_ruleab_<docs>), GRAFT_RULEAB_ATTEMPTS (7),
  * SPARK_GRAFT_CPUS (32).
  */
object RuleAb {
  def main(args: Array[String]): Unit = {
    // the one-line JSON protocol must parse regardless of host locale
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val docs = sys.env.getOrElse("GRAFT_RULEAB_DOCS", "200000").toLong
    val attempts = sys.env.getOrElse("GRAFT_RULEAB_ATTEMPTS", "7").toInt
    val dir = sys.env.getOrElse("GRAFT_RULEAB_DIR", s"/dev/shm/graft_ruleab_$docs")
    // pid-stamped under the shared graft-spark- prefix: a clean exit removes
    // it below, and graft.Bench's startup sweep reclaims dead-pid leftovers —
    // a killed run must not strand shuffle state in RAM-backed tmpfs
    val localDir = s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}-ruleab"
    val spark = SparkSession.builder()
      .appName("graft-rule-ab")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // reuse gated on the build's completion marker, never bare dir existence
    // (a killed run leaves partial parquet that fabricates numbers)
    if (!new java.io.File(dir, "stats.json").exists()) {
      CpuProbe.rmDir(dir)
      import spark.implicits._
      graft.index.IndexBuild.build(spark,
        graft.corpus.Webtext.synthesize(spark, docs).toDF().drop("html"),
        dir, numChunks = 2)
    }

    def store = spark.read.parquet(s"$dir/docstore")
    // enhead0 is planted in ~12% of en docs (en = 10% of the corpus):
    // selective enough that the posting side stays small, common enough
    // that the naive arm does real work
    def query = store.where(array_contains(
      GraftFunctions.analyze_terms(col("text"), col("lang")), "enhead0"))

    def textPruned: Boolean = {
      val qe = query.select("docId").queryExecution
      if (sys.env.contains("GRAFT_RULEAB_EXPLAIN")) {
        System.err.println("=== optimized ===\n" + qe.optimizedPlan)
        System.err.println("=== physical ===\n" + qe.executedPlan)
      }
      // string-parse, not plan.collect: AdaptiveSparkPlanExec exposes no
      // children, so collect() sees zero scans under AQE
      val lines = qe.executedPlan.toString.linesIterator
        .filter(l => l.contains("FileScan") && l.contains("docstore")).toSeq
      lines.nonEmpty && lines.forall { l =>
        val rs = l.indexOf("ReadSchema:")
        rs >= 0 && !l.substring(rs).contains("text:")
      }
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    def time(label: String): (Seq[Double], Long) = {
      val warm = query.count() // warmup + the arm's row count for validation
      val walls = (1 to attempts).map { _ =>
        val t0 = System.nanoTime()
        query.count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[ruleab] $label attempts=${walls.map(w => f"$w%.3f").mkString(",")}")
      (walls, warm)
    }

    IndexAccessRule.uninstall(spark)
    val (naive, nNaive) = time("naive_scan")
    IndexAccessRule.install(spark)
    val pruned = textPruned
    val (rewr, nRewr) = time("rewritten")
    require(nNaive == nRewr, s"arms disagree: naive=$nNaive rewritten=$nRewr")
    val probe = CpuProbe.efficiency(cpus)
    println(
      s"""{"metric":"rule_ab","docs":$docs,"rows":$nNaive,""" +
        f""""naive":{"median_sec":${median(naive)}%.3f,"min_sec":${naive.min}%.3f},""" +
        f""""rewritten":{"median_sec":${median(rewr)}%.3f,"min_sec":${rewr.min}%.3f},""" +
        f""""speedup_median":${median(naive) / median(rewr)}%.2f,""" +
        s""""text_pruned":$pruned,"probe":${f"$probe%.3f"}}""")
    spark.stop()
    CpuProbe.rmDir(localDir) // tmpfs hygiene
  }
}
