package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's per-query metrics plane as engine operators: the API's
  * metrics CSV line (search_api.py:444-451), the exporter's tolerant parse
  * (scripts/metrics_exporter.py:180-253 `parse_metrics_log` — skip lines
  * with <12 fields or a bad timestamp, positional fields), and the
  * `--summary` rollup (`print_summary`, :282-328) re-shaped as a grouped
  * aggregation so it scales to a fleet's merged logs instead of one
  * driver-side print.
  */
object Metrics {

  /** Reference escaping (search_api.py:444-445): commas→';', double→single
    * quotes, newline→space, CR dropped — applied to free-text fields so the
    * line stays positionally splittable on ','.
    */
  // translate, not four chained regexp_replace passes: same 1:1 char
  // mapping ('\r' unmapped → deleted), one codegen'd scan, no regex engine
  def escape(c: Column): Column =
    translate(c, ",\"\n\r", ";' ")

  def escapeStr(s: String): String =
    s.replace(",", ";").replace("\"", "'").replace("\n", " ").replace("\r", "")

  /** One metrics CSV line as a Column — timestamp first, exporter order:
    * ts,client_ip,query,search_type,exact_match,categories,language,
    * enable_reranking,page_size,page_number,latency_ms,total_results.
    */
  def line(ts: Column, clientIp: Column, query: Column, searchType: Column,
      exactMatch: Column, categories: Column, language: Column,
      enableReranking: Column, pageSize: Column, pageNumber: Column,
      latencyMs: Column, totalResults: Column): Column =
    // every field coalesced: concat_ws SKIPS nulls, so one null field
    // (e.g. a null query text) would silently shift every later field left
    // — parse()'s ≥12-field guard then drops the event with no warning
    concat_ws(",",
      coalesce(date_format(ts, "yyyy-MM-dd HH:mm:ss"), lit("")),
      coalesce(clientIp, lit("")),
      coalesce(escape(query), lit("")), coalesce(searchType, lit("")),
      coalesce(exactMatch.cast("string"), lit("")),
      coalesce(escape(categories), lit("")),
      coalesce(language, lit("")),
      coalesce(enableReranking.cast("string"), lit("")),
      coalesce(pageSize.cast("string"), lit("")),
      coalesce(pageNumber.cast("string"), lit("")),
      coalesce(latencyMs.cast("string"), lit("")),
      coalesce(totalResults.cast("string"), lit("")))

  // shared, thread-safe (unlike SimpleDateFormat) — zero per-request
  // allocation on the serving hot path
  private val tsFormatter =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Plain-Scala formatter with the identical shape — the serving node's
    * per-request hot path (no Spark involvement per query). `zone` defaults
    * to the server's local zone like the reference's `datetime.now()`
    * logging; pass the Spark session zone for parse-side date-bucket
    * consistency in a non-local-TZ deployment.
    */
  def lineStr(tsMillis: Long, clientIp: String, query: String,
      searchType: String, exactMatch: Boolean, categories: String,
      language: String, enableReranking: Boolean, pageSize: Int,
      pageNumber: Int, latencyMs: Double, totalResults: Long,
      zone: java.time.ZoneId = java.time.ZoneId.systemDefault()): String = {
    val ts = tsFormatter.format(
      java.time.Instant.ofEpochMilli(tsMillis).atZone(zone))
    // null string params render as "" — the SAME convention the Column
    // formatter's coalesce applies, so the two documented-identical
    // shapes cannot diverge on a null field (escapeStr would NPE on null)
    def nz(s: String): String = if (s == null) "" else s
    s"$ts,${nz(clientIp)}," +
      s"${escapeStr(nz(query))},${nz(searchType)},$exactMatch,${escapeStr(nz(categories))}," +
      s"${nz(language)},$enableReranking,$pageSize,$pageNumber,$latencyMs,$totalResults"
  }

  /** `parse_metrics_log` semantics over a DataFrame of raw lines: split on
    * ',', require ≥12 fields, a parseable timestamp and numeric tail fields
    * (the exporter skips such lines with a warning); fields are positional.
    */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    // try_* variants: a malformed field must SKIP the line (exporter
    // semantics), not abort the job under ANSI mode
    lines
      .withColumn("p", split(col(lineCol), ","))
      .where(size(col("p")) >= 12)
      .withColumn("ts",
        try_to_timestamp(element_at(col("p"), 1), lit("yyyy-MM-dd HH:mm:ss")))
      .select(
        col("ts"),
        element_at(col("p"), 2).as("client_ip"),
        element_at(col("p"), 3).as("query"),
        element_at(col("p"), 4).as("search_type"),
        (lower(element_at(col("p"), 5)) === "true").as("exact_match"),
        element_at(col("p"), 6).as("categories"),
        element_at(col("p"), 7).as("language"),
        (lower(element_at(col("p"), 8)) === "true").as("enable_reranking"),
        // one indexing base (1-based element_at) for the WHOLE projection
        expr("try_cast(element_at(p, 9) AS int)").as("page_size"),
        expr("try_cast(element_at(p, 10) AS int)").as("page_number"),
        expr("try_cast(element_at(p, 11) AS double)").as("latency_ms"),
        expr("try_cast(element_at(p, 12) AS int)").as("total_results"))
      .where(col("ts").isNotNull && col("page_size").isNotNull &&
        col("page_number").isNotNull && col("latency_ms").isNotNull &&
        col("total_results").isNotNull)
      .withColumn("date", to_date(col("ts")).cast("string"))
      .withColumn("has_results", col("total_results") > 0)
  }

  /** The `--summary` statistics, grouped per (date, search_type, language):
    * query counts, zero-result counts, distinct client IPs, average latency
    * and average result count. One shuffle, map-side partial aggregation.
    */
  def summary(parsed: DataFrame): DataFrame =
    parsed.groupBy("date", "search_type", "language")
      .agg(
        count(lit(1)).cast("long").as("n_queries"),
        sum(when(col("total_results") === 0, 1).otherwise(0)).cast("long")
          .as("n_zero"),
        countDistinct("client_ip").as("unique_ips"),
        round(avg("latency_ms"), 6).as("avg_latency_ms"),
        round(avg(col("total_results").cast("double")), 6).as("avg_results"))
}
