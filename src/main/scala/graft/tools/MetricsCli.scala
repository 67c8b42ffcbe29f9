package graft.tools

import org.apache.spark.sql.SparkSession

/** Offline metrics-log analyzer — the engine's analog of the reference's
  * exporter scripts that tail/aggregate `metrics.log`
  * (backend/api/search_api.py:447-451 writes the CSV lines;
  * scripts parse them). Reads the rolling files a ServeCli node writes
  * (GRAFT_SERVE_LOG_DIR) through the ORACLED parser
  * ([[graft.ops.Metrics.parse]], gated by the metrics_summary query).
  *
  * Usage: MetricsCli <metrics.log | dir | glob> [--summary]
  *   default: parsed rows (ts, client_ip, query, search_type, …)
  *   --summary: per-(search_type, language) counts/latency aggregates
  */
object MetricsCli {
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_.startsWith("--"))
    require(paths.nonEmpty, "usage: MetricsCli <metrics.log|dir|glob> [--summary]")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a dir means "the live file + its rolled predecessor"
    val inputs = paths.flatMap { p =>
      val f = new java.io.File(p)
      if (f.isDirectory) Seq(s"$p/metrics.log*") else Seq(p)
    }
    val lines = spark.read.text(inputs: _*).withColumnRenamed("value", "line")
    val parsed = graft.ops.Metrics.parse(lines)
    val outDf =
      if (flags.contains("--summary")) graft.ops.Metrics.summary(parsed) else parsed
    outDf.show(100, truncate = false)
    spark.stop()
  }
}
