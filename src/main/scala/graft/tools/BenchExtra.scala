package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Round-6 optimization harness — SEPARATE from the frozen graft.Bench.
  *
  * Subcommands (args(0)):
  *   explain <query> [out]   — .explain("formatted") of a declared query to
  *                             stdout or a file (the plans/r06 artifacts)
  *   noop <query> [n]        — time the query with the noop sink (guide §1.4:
  *                             computes every column, no sink cost), n attempts
  *   count <query> [n]       — time fn(...).count() exactly like Bench's
  *                             pipeline section (comparability)
  *   search-profile          — break a Bm25Query.search call into its
  *                             sequential jobs over a bench-scale index
  *   build-profile [docs]    — one IndexBuild over a synthesized corpus with
  *                             GRAFT_BUILD_VERBOSE-style phase timing
  *   load-profile            — InMemoryIndex.load wall over the same index
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = s"/dev/shm/graft-sparkx-${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, args)
    finally { spark.stop(); CpuProbe.rmDir(localDir) }
  }

  private def timeN[T](n: Int)(f: => T): Seq[Double] =
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

  private def fmt(name: String, walls: Seq[Double]): String =
    f"$name%-28s ${walls.sorted.apply(walls.size / 2)}%.3f s  (attempts: " +
      walls.map(w => f"$w%.3f").mkString(", ") + ")"

  private def run(spark: SparkSession, sfDir: String, args: Array[String]): Unit =
    args.headOption.getOrElse("help") match {
      case "explain" =>
        val q = args(1)
        val df = SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        if (args.length > 2) {
          val p = java.nio.file.Paths.get(args(2))
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
          println(s"wrote ${args(2)}")
        } else println(txt)

      case "noop" =>
        val q = args(1)
        val n = if (args.length > 2) args(2).toInt else 3
        spark.sparkContext.setJobDescription(s"noop:$q")
        val walls = timeN(n) {
          SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        println(fmt(s"noop:$q", walls))

      case "count" =>
        val q = args(1)
        val n = if (args.length > 2) args(2).toInt else 3
        spark.sparkContext.setJobDescription(s"count:$q")
        val walls = timeN(n) { SparkEntry.queries(q)(spark, sfDir).count() }
        println(fmt(s"count:$q", walls))

      case "search-profile" => searchProfile(spark)

      case "local-profile" => localProfile(spark)

      case "build-profile" =>
        val docs = if (args.length > 1) args(1).toLong else 200000L
        buildProfile(spark, docs)

      case "load-profile" => loadProfile(spark)

      case other => println(s"unknown subcommand: $other")
    }

  /** Bench-identical index (200k docs, 2 chunks like the serving rebuild),
    * then each sequential piece of a driver-path search timed separately.
    */
  private def searchProfile(spark: SparkSession): Unit = {
    import graft.corpus.Webtext
    import graft.index.IndexBuild
    import graft.query.{Bm25Query, IndexHandle, QuerySpec}
    import org.apache.spark.sql.functions.col
    val nCores = spark.sparkContext.defaultParallelism
    val base = s"/dev/shm/graft-bx-${ProcessHandle.current().pid()}"
    val corpusDir = s"$base-corpus"
    val idxDir = s"$base-idx"
    CpuProbe.rmDir(corpusDir); CpuProbe.rmDir(idxDir)
    try {
      Webtext.synthesize(spark, 200000L, partitions = nCores * 4).toDF()
        .drop("html").write.parquet(corpusDir)
      val corpus = spark.read.parquet(corpusDir)
      IndexBuild.build(spark, corpus, idxDir, numChunks = 2)
      val idx = IndexHandle.load(idxDir)
      val hiPhrase = Webtext.GoldenPhrase("hi").mkString(" ")
      val q = QuerySpec("hi", hiPhrase)
      // warmup
      (1 to 3).foreach(_ => Bm25Query.search(spark, idx, q))
      println(fmt("search(and) e2e", timeN(5)(Bm25Query.search(spark, idx, q))))
      // pieces
      val ctx = graft.query.QueryCore.context(q, idx.numDocs(q.lang), idx.avgdl(q.lang)).get
      val allTerms = (ctx.terms.map(_._1) ++ ctx.excludeTerms).distinct
      println(fmt("globalDfMap (cached)", timeN(5)(
        Bm25Query.globalDfMap(spark, idx, q.lang, allTerms.toSeq))))
      import spark.implicits._
      def postingsJob(): Unit = {
        spark.read.parquet(idx.segmentsPath)
          .where(col("lang") === q.lang && col("term").isin(allTerms.toSeq: _*))
          .select(col("chunk"), col("term"), col("df"), col("blob"),
            org.apache.spark.sql.functions.lit(null).cast("binary").as("posBlob"))
          .as[graft.query.QueryCore.PostRow].collect()
      }
      (1 to 2).foreach(_ => postingsJob())
      println(fmt("postings collect", timeN(5)(postingsJob())))
      val ids = Seq(3L, 57L, 110L)
      def payloadJob(): Unit = {
        spark.read.parquet(s"${idx.dir}/docstore")
          .where(col("docId").isin(ids: _*))
          .select("docId", "url", "lang", "text").collect()
      }
      (1 to 2).foreach(_ => payloadJob())
      println(fmt("payload point-read", timeN(5)(payloadJob())))
      println(fmt("search(filtered) e2e", timeN(5)(Bm25Query.search(spark, idx,
        QuerySpec("hi", hiPhrase, metaFilters = Map("category" -> Seq("Pravachan")),
          yearRange = Some((2020, 2021)))))))
      println(fmt("search(datefiltered) e2e", timeN(5)(Bm25Query.search(spark, idx,
        QuerySpec("hi", hiPhrase, dateRange = Some((Some(2019), Some(2020))))))))
    } finally {
      CpuProbe.rmDir(corpusDir); CpuProbe.rmDir(idxDir)
    }
  }

  /** Micro-times each LocalParquet read shape over a bench-scale index. */
  private def localProfile(spark: SparkSession): Unit = {
    import graft.corpus.Webtext
    import graft.index.{IndexBuild, LocalParquet}
    import graft.query.{Bm25Query, IndexHandle, QuerySpec}
    val nCores = spark.sparkContext.defaultParallelism
    val base = s"/dev/shm/graft-bx-${ProcessHandle.current().pid()}"
    val corpusDir = s"$base-corpus"
    val idxDir = s"$base-idx"
    CpuProbe.rmDir(corpusDir); CpuProbe.rmDir(idxDir)
    try {
      Webtext.synthesize(spark, 200000L, partitions = nCores * 4).toDF()
        .drop("html").write.parquet(corpusDir)
      IndexBuild.build(spark, spark.read.parquet(corpusDir), idxDir, numChunks = 2)
      val idx = IndexHandle.load(idxDir)
      def count(dir: String): Int = LocalParquet.dataFiles(dir).size
      println(s"files: segments=${count(idx.segmentsPath)} " +
        s"facets=${count(idx.facetsPath)} docstore=${count(s"$idxDir/docstore")} " +
        s"termdict=${count(s"$idxDir/termdict")}")
      val terms = Webtext.GoldenPhrase("hi").toSeq
      def t(name: String, n: Int)(f: => Any): Unit = {
        (1 to 2).foreach(_ => f)
        println(fmt(name, timeN(n)(f)))
      }
      t("local postings read", 5)(
        LocalParquet.readSegmentRows(idx.segmentsPath, "hi", terms, withPositions = false))
      t("local termdict read", 5)(
        LocalParquet.readTermDict(s"$idxDir/termdict", "hi", terms))
      t("local payload read (20)", 5)(
        LocalParquet.readDocPayloads(s"$idxDir/docstore", (1L to 20L).toSeq))
      t("local facet read (meta)", 5)(
        LocalParquet.readFacetRows(idx.facetsPath, "hi",
          Seq(("category", Some(Seq("Pravachan")), None))))
      t("search(and) e2e", 5)(
        Bm25Query.search(spark, idx, QuerySpec("hi", Webtext.GoldenPhrase("hi").mkString(" "))))
    } finally {
      CpuProbe.rmDir(corpusDir); CpuProbe.rmDir(idxDir)
    }
  }

  private def buildProfile(spark: SparkSession, docs: Long): Unit = {
    import graft.corpus.Webtext
    import graft.index.IndexBuild
    val nCores = spark.sparkContext.defaultParallelism
    val base = s"/dev/shm/graft-bx-${ProcessHandle.current().pid()}"
    val corpusDir = s"$base-corpus"
    val idxDir = s"$base-idx"
    CpuProbe.rmDir(corpusDir); CpuProbe.rmDir(idxDir)
    try {
      Webtext.synthesize(spark, docs, partitions = nCores * 4).toDF()
        .drop("html").write.parquet(corpusDir)
      val corpus = spark.read.parquet(corpusDir)
      // JIT warm
      IndexBuild.build(spark, Webtext.synthesize(spark, 5000).toDF(),
        s"$base-warm", numChunks = 1)
      (1 to 2).foreach { i =>
        CpuProbe.rmDir(idxDir)
        val t0 = System.nanoTime()
        IndexBuild.build(spark, corpus, idxDir, numChunks = 1)
        println(f"[build-profile] attempt $i total: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"(probe=${CpuProbe.efficiency(nCores)}%.2f)")
      }
    } finally {
      CpuProbe.rmDir(corpusDir); CpuProbe.rmDir(idxDir); CpuProbe.rmDir(s"$base-warm")
    }
  }

  private def loadProfile(spark: SparkSession): Unit = {
    import graft.corpus.Webtext
    import graft.index.IndexBuild
    import graft.query.{IndexHandle, InMemoryIndex}
    val nCores = spark.sparkContext.defaultParallelism
    val base = s"/dev/shm/graft-bx-${ProcessHandle.current().pid()}"
    val corpusDir = s"$base-corpus"
    val idxDir = s"$base-idx"
    CpuProbe.rmDir(corpusDir); CpuProbe.rmDir(idxDir)
    try {
      Webtext.synthesize(spark, 200000L, partitions = nCores * 4).toDF()
        .drop("html").write.parquet(corpusDir)
      IndexBuild.build(spark, spark.read.parquet(corpusDir), idxDir, numChunks = 2)
      val idx = IndexHandle.load(idxDir)
      var mem: InMemoryIndex = null
      val walls = (1 to 3).map { _ =>
        mem = null; System.gc()
        val t0 = System.nanoTime()
        mem = InMemoryIndex.load(spark, idx)
        (System.nanoTime() - t0) / 1e9
      }
      println(fmt("InMemoryIndex.load", walls))
      println(s"loadedBytes=${mem.loadedBytes}")
      // resident kernel p50s, bench-identical shapes
      import graft.query.QuerySpec
      val hiPhrase = Webtext.GoldenPhrase("hi").mkString(" ")
      def p50(name: String, q: QuerySpec): Unit = {
        (1 to 5).foreach(_ => mem.search(q))
        val ws = (1 to 50).map { _ =>
          val t0 = System.nanoTime(); mem.search(q); (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-28s p50=${ws.sorted.apply(25)}%.4f s")
      }
      p50("serve_and", QuerySpec("hi", hiPhrase))
      p50("serve_any", QuerySpec("hi", hiPhrase, mode = "any"))
      p50("serve_headterm", QuerySpec("hi", Webtext.word("hi", 0), mode = "any"))
    } finally {
      CpuProbe.rmDir(corpusDir); CpuProbe.rmDir(idxDir)
    }
  }
}
