package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Webtext
import graft.ops.{Dedup, Similarity}

/** Scale-ladder evidence for the pipeline operators: run each dedup/ANN path
  * at n and 10n rows of deterministic synthetic input and report the
  * wall-time growth ratio. The claim under test is the shape of the curve,
  * not the absolute number — the n² baselines (all-pairs jaccard / cosine)
  * must grow ~quadratically (ratio ≈ 100× for 10× rows) while the bucketed
  * production paths (shingle inverted-index join with df pruning, MinHash+LSH
  * banding, axis-sign LSH buckets) stay ~linear (ratio ≈ 10×). Emits one
  * JSON line; results are recorded in BASELINE.md.
  *
  * Deterministic input, no external data: docs derive from Webtext word
  * streams with planted near/exact dups (Dedup.withPlantedDups); embeddings
  * from splitmix64 with planted near-dup vectors every 17 ids.
  */
object ScaleLadder {

  def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 32).select(col("id").as("doc_id"))
      .as[Long].map { i =>
        val h0 = Webtext.mix(0xD0C5L, i)
        val nTok = 40 + Math.floorMod(h0, 60L).toInt
        val sb = new StringBuilder
        var x = h0
        for (_ <- 0 until nTok) {
          x = Webtext.mix64(x)
          if (sb.nonEmpty) sb += ' '
          sb ++= Webtext.word("en", Webtext.zipfRank(Webtext.toUnit(x)))
        }
        (i, sb.toString)
      }.toDF("doc_id", "text")
  }

  def synthEmbeddings(spark: SparkSession, n: Long, dim: Int = 16): DataFrame = {
    import spark.implicits._
    // base vectors only — twins come EXCLUSIVELY from synthTwinRows (a
    // twin branch here would double-emit ids >= 10M when n crosses 10M,
    // inflating pair counts and skewing the ladder ratio)
    require(n <= 10000000L,
      s"synthEmbeddings: n=$n would collide base ids with the twin id space (>= 10M)")
    spark.range(0, n, 1, 32).select(col("id")).as[Long].map { i =>
      val v = Array.tabulate(dim) { d =>
        val u = Webtext.toUnit(Webtext.mix(0xE5B3L, i, d.toLong)) * 2.0 - 1.0
        u.toFloat
      }
      (i, Math.floorMod(i, 4L).toInt, v)
    }.toDF("vec_id", "label", "embedding")
  }

  private def withTwins(spark: SparkSession, n: Long, dim: Int): DataFrame = {
    val base = synthEmbeddings(spark, n, dim)
    base.union(synthTwinRows(spark, n, dim).select(base.columns.map(col): _*))
  }

  private def synthTwinRows(spark: SparkSession, n: Long, dim: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 32).as[Long].filter(_ % 17 == 0).map { b =>
      val i = b + 10000000L
      val v = Array.tabulate(dim) { d =>
        val u = Webtext.toUnit(Webtext.mix(0xE5B3L, b, d.toLong)) * 2.0 - 1.0
        (u + 0.05 * Webtext.toUnit(Webtext.mix(0xA11CL, i, d.toLong))).toFloat
      }
      (i, Math.floorMod(i, 4L).toInt, v)
    }.toDF("vec_id", "label", "embedding")
  }

  /** n² all-pairs jaccard over the SAME 3-gram shingle sets the production
    * paths use — the honest quadratic baseline they replace (small scales
    * only).
    */
  def exactJaccardAllPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = Dedup.shingles(docs, 3)
      .groupBy("doc_id").agg(collect_set(col("shingle")).as("sh"))
    sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  def main(args: Array[String]): Unit = {
    // the one-line JSON protocol must parse regardless of host locale —
    // f"%.3f" under a comma-decimal locale would emit invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("GRAFT_LADDER_DOCS", "400").toLong
    val nVecs = sys.env.getOrElse("GRAFT_LADDER_VECS", "1000").toLong
    val buildDocs = sys.env.getOrElse("GRAFT_LADDER_BUILD_DOCS", "20000").toLong
    val localDir = s"/dev/shm/graft-ladder-${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = f
      val w = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ladder]   $rows rows in $w%.2f s")
      w
    }
    def ladder(name: String)(f: Long => Long): Unit = {
      System.err.println(s"[ladder] $name @1x")
      val w1 = timeIt(f(1L))
      System.err.println(s"[ladder] $name @10x")
      val w10 = timeIt(f(10L))
      out(name) = (w1, w10)
    }

    // materialize inputs OUTSIDE the timed window (input is a table)
    def docsAt(mult: Long): DataFrame = {
      // withPlantedDups plants near/exact copies at +1,000,000 / +2,000,000 —
      // base ids must stay below that space or unrelated texts silently share
      // a doc_id and corrupt the pair counts (same guard as synthEmbeddings)
      require(nDocs * mult <= 1000000L,
        s"docsAt: ${nDocs * mult} docs would collide base ids with the planted-dup id space (>= 1M)")
      val p = s"$localDir/docs_$mult"
      if (!new java.io.File(p).exists())
        Dedup.withPlantedDups(synthDocs(spark, nDocs * mult)).write.parquet(p)
      spark.read.parquet(p)
    }
    def vecsAt(mult: Long): DataFrame = {
      val p = s"$localDir/vecs_$mult"
      if (!new java.io.File(p).exists())
        withTwins(spark, nVecs * mult, 16).write.parquet(p)
      spark.read.parquet(p)
    }
    def webAt(mult: Long): DataFrame = {
      val p = s"$localDir/web_$mult"
      if (!new java.io.File(p).exists())
        Webtext.synthesize(spark, buildDocs * mult).toDF().drop("html").write.parquet(p)
      spark.read.parquet(p)
    }
    Seq(1L, 10L).foreach { m => docsAt(m); vecsAt(m); webAt(m) }

    val probe = CpuProbe.efficiency(cpus.toInt)

    ladder("dedup_exact_allpairs_n2")(m => exactJaccardAllPairs(docsAt(m), 0.7).count())
    ladder("dedup_jaccard_indexjoin")(m =>
      Dedup.ngramJaccardPairs(docsAt(m), n = 3, threshold = 0.7).count())
    ladder("dedup_minhash_lsh")(m =>
      Dedup.minhashNearDupPairs(docsAt(m), n = 3, numHashes = 64, bands = 32,
        threshold = 0.7).count())
    ladder("ann_neardup_exact_n2")(m =>
      Similarity.embeddingNearDupPairsExact(vecsAt(m), 0.9).count())
    ladder("ann_neardup_bucketed")(m =>
      Similarity.embeddingNearDupPairsAxis(vecsAt(m), 0.9, bits = 10).count())
    ladder("ann_topk_bruteforce")(m => {
      val v = vecsAt(m)
      Similarity.cosineTopK(v, v.where(col("vec_id") < 5), k = 10).count()
    })
    ladder("ann_topk_lsh")(m => {
      val v = vecsAt(m)
      Similarity.lshTopKAxis(v, v.where(col("vec_id") < 5), k = 10,
        bits = 10, probeHamming = 1).count()
    })
    ladder("index_build")(m => {
      val dir = s"$localDir/idx_$m"
      graft.index.TableIO.deleteRecursive(dir)
      graft.index.IndexBuild.build(spark, webAt(m), dir, numChunks = 1)
      buildDocs * m
    })

    val rows = out.map { case (k, (w1, w10)) =>
      f""""$k":{"wall_1x":$w1%.2f,"wall_10x":$w10%.2f,"ratio":${w10 / math.max(w1, 1e-9)}%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"ladder":$rows,"n_docs":$nDocs,"n_vecs":$nVecs,"build_docs":$buildDocs,"cpu_probe":$probe}""")
    graft.index.TableIO.deleteRecursive(localDir)
    spark.stop()
  }
}
