package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Webtext
import graft.index.IndexBuild
import graft.query.{Bm25Query, IndexHandle, QuerySpec}

/** End-to-end driveable surface: build an index over the synthetic webtext
  * corpus (or reuse an existing one), run a query, print hits.
  *
  * usage: runMain graft.tools.SearchCli <indexDir> <lang> <query...>
  *        (set GRAFT_BUILD_DOCS=n to (re)build the index with n synthetic docs)
  */
object SearchCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: SearchCli <indexDir> <lang> <query...> " +
        "[env GRAFT_BUILD_DOCS=n to build, GRAFT_MODE=all|any, GRAFT_PHRASE=1]")
      sys.exit(2)
    }
    val dir = args(0)
    val lang = args(1)
    val query = args.drop(2).mkString(" ")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-search")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sys.env.get("GRAFT_BUILD_DOCS").foreach { nStr =>
      println(s"building index over $nStr synthetic docs → $dir ...")
      val t0 = System.nanoTime()
      IndexBuild.build(spark, Webtext.synthesize(spark, nStr.toLong).toDF(), dir, numChunks = 4)
      println(f"built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val idx = IndexHandle.load(dir)
    val q = QuerySpec(lang = lang, query = query,
      mode = sys.env.getOrElse("GRAFT_MODE", "all"),
      phrase = sys.env.get("GRAFT_PHRASE").contains("1"))
    val t0 = System.nanoTime()
    val res = Bm25Query.search(spark, idx, q)
    val ms = (System.nanoTime() - t0) / 1e6
    println(f"total=${res.totalHits} (${res.totalRelation}) in $ms%.0f ms")
    res.hits.foreach { h =>
      val snippet = h.highlighted.replace("\n", " ").take(160)
      println(f"  ${h.score}%8.4f doc=${h.docId}%-8d ${h.url}%-48s $snippet")
    }
    if (res.suggestions.nonEmpty) println(s"suggestions: ${res.suggestions.mkString(", ")}")
    spark.stop()
  }
}
