package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan inspection: prints the formatted physical plans of the hot read paths
  * so pushdown/pruning regressions are visible (PushedFilters + ReadSchema).
  */
object ExplainCli {
  def main(args: Array[String]): Unit = {
    val idxDir = args.headOption.getOrElse("/tmp/gidx")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("=== postings read for a query (expect PushedFilters on lang/term, pruned ReadSchema without posBlob) ===")
    spark.read.parquet(s"$idxDir/segments")
      .where(col("lang") === "hi" && col("term").isin("a", "b"))
      .select("chunk", "term", "df", "blob")
      .explain("formatted")

    println("=== docstore payload fetch (expect PushedFilters on docId, no text-wide scan columns beyond selection) ===")
    spark.read.parquet(s"$idxDir/docstore")
      .where(col("docId").isin(1L, 2L, 3L))
      .select("docId", "url", "lang", "text")
      .explain("formatted")

    println("=== suggest dictionary scan (expect ReadSchema only term/df) ===")
    spark.read.parquet(s"$idxDir/segments")
      .where(col("lang") === "hi")
      .groupBy("term").agg(sum("df").as("df"))
      .where(length(col("term")) >= 3)
      .explain("formatted")
    spark.stop()
  }
}
