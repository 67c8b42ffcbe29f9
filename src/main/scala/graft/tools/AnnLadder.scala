package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The router's evidence ladder: time per-partition HNSW (every query walks
  * every partition graph) against IVF-routed HNSW (nProbe cells only) at
  * GROWING partition/cell counts on the same corpus and queries. The
  * all-partitions cost should grow with P (more graphs built, more walks
  * merged) while the routed cost should stay ~flat once P ≫ nProbe — the
  * cluster-width-independence claim `Hnsw.hnswRoutedTopK` makes. One JSON
  * line: per-P medians for both variants.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * GRAFT_ANN_PARTS (default "4,16,64"), GRAFT_ANN_ATTEMPTS (3),
  * GRAFT_ANN_K (10), GRAFT_ANN_QUERIES (16); GRAFT_ANN_VECS > 0 switches
  * the corpus to [[ScaleLadder.synthEmbeddings]] (deterministic splitmix
  * vectors — the sf tables cap at 2k vectors, too small to see graph-build
  * cost dominate).
  */
object AnnLadder {
  def main(args: Array[String]): Unit = {
    // the one-line JSON protocol must parse regardless of host locale —
    // f"%.3f" under a comma-decimal locale would emit invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("GRAFT_ANN_PARTS", "4,16,64").split(",").map(_.trim.toInt)
    val attempts = sys.env.getOrElse("GRAFT_ANN_ATTEMPTS", "3").toInt
    val k = sys.env.getOrElse("GRAFT_ANN_K", "10").toInt
    val nQueries = sys.env.getOrElse("GRAFT_ANN_QUERIES", "16").toInt
    val spark = SparkSession.builder()
      .appName("graft-ann-ladder")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft_annladder")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nSynth = sys.env.getOrElse("GRAFT_ANN_VECS", "0").toLong
    val emb = (if (nSynth > 0) ScaleLadder.synthEmbeddings(spark, nSynth, dim = 32)
      else spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .select("vec_id", "embedding").cache()
    val nVec = emb.count() // also materializes the cache (untimed)
    val queries = emb.where(col("vec_id") < nQueries)

    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val rows = parts.map { p =>
      // one untimed warm run per variant per P (plan compilation)
      graft.ops.Hnsw.hnswTopK(emb, queries, k, partitions = p).count()
      val all = (1 to attempts).map { _ =>
        time(graft.ops.Hnsw.hnswTopK(emb, queries, k, partitions = p).count())
      }
      graft.ops.Hnsw.hnswRoutedTopK(emb, queries, k, nlist = p, nProbe = 4).count()
      val routed = (1 to attempts).map { _ =>
        time(graft.ops.Hnsw.hnswRoutedTopK(emb, queries, k, nlist = p, nProbe = 4).count())
      }
      System.err.println(f"[annladder] P=$p all=${all.map(w => f"$w%.2f").mkString(",")} " +
        f"routed=${routed.map(w => f"$w%.2f").mkString(",")}")
      f""""$p":{"all_partitions_sec":${median(all)}%.3f,"routed_sec":${median(routed)}%.3f}"""
    }
    val probe = CpuProbe.efficiency(cpus)
    println(s"""{"metric":"ann_ladder","vectors":$nVec,"k":$k,"queries":$nQueries,""" +
      s""""n_probe":4,"ladder":{${rows.mkString(",")}},"probe":${f"$probe%.3f"}}""")
    spark.stop()
  }
}
