package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-corpus hygiene operators a training-data pipeline runs before
  * indexing/training: URL canonicalization, Gopher-style repetition
  * filters, and PII scrubbing. Everything is built-in column expressions
  * (codegen'd, predicate-pushdown-friendly) with regexes kept inside the
  * RE2 ∩ java.util.regex common subset so an external SQL engine can
  * recompute every step (the correctness oracles in SparkEntry do).
  */
object Hygiene {

  // ---- URL canonicalization ----------------------------------------------

  /** Canonical form of a web URL for dedup/partition keys:
    * lowercase scheme + host, default port stripped, fragment dropped,
    * tracking params (utm_*, fbclid, gclid) removed, separator debris
    * (`?&`, `&&`, trailing `?`/`&`) cleaned. Everything else — path case,
    * param order, non-tracking params — is preserved: canonicalization must
    * never merge genuinely distinct resources.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[^:/?#]+://([^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val noTrack = regexp_replace(rest, "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    // "$1" keeps the leading separator; collapse the debris it leaves.
    // Order matters: two adjacent tracking params leave "?&&x" — runs of
    // '&' must collapse before the '?&' join is repaired.
    val clean = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "&&+", "&"), "\\?&", "?"), "[?&]$", "")
    concat(scheme, lit("://"), host, clean)
  }

  /** Hostname of a URL (lowercased, port stripped). */
  def hostOf(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)), ":\\d+$", "")

  /** Registrable-domain approximation: last two DNS labels. A production
    * deployment substitutes the public-suffix list (a data file, not an
    * algorithm change); two labels is the deterministic, oracle-friendly
    * stand-in and correct for generic TLDs.
    */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  // ---- Gopher-style repetition metrics ------------------------------------

  /** Per-doc repetition metrics (the Gopher/C4 rule family): duplicate-line
    * fraction and most-frequent-word fraction, with the standard flag
    * thresholds (dup lines > 30% or top word > 20% of all words). The word
    * side is a distributed explode→count — two shuffles keyed on doc_id,
    * partial-aggregated map-side; nothing is per-doc quadratic.
    * @return (doc_id, n_words, n_lines, dup_line_frac, top_word_frac, flagged)
    */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val lineStats = docs.select(
      col("doc_id"),
      size(lines).as("n_lines"),
      size(array_distinct(lines)).as("n_distinct_lines"))
    val words = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .where(col("w") =!= "")
    val wordStats = words.groupBy("doc_id", "w").count()
      .groupBy("doc_id")
      .agg(sum("count").as("n_words"), max("count").as("top_word_count"))
    lineStats.join(wordStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        col("n_lines"),
        round(lit(1.0) - col("n_distinct_lines") / col("n_lines"), 6).as("dup_line_frac"),
        round(coalesce(col("top_word_count") / col("n_words"), lit(0.0)), 6)
          .as("top_word_frac"))
      .withColumn("flagged",
        col("dup_line_frac") > 0.3 || col("top_word_frac") > 0.2)
  }

  // ---- PII scrubbing ------------------------------------------------------

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails / phone numbers / IPv4 literals with typed placeholders
    * and count each redaction class. Order matters: emails first (an email's
    * host could otherwise partially match the IP pattern after rewriting).
    */
  def piiColumns(text: Column): Seq[(String, Column)] = {
    val noEmail = regexp_replace(text, EmailRe, "[EMAIL]")
    val noPhone = regexp_replace(noEmail, PhoneRe, "[PHONE]")
    val scrubbed = regexp_replace(noPhone, IpRe, "[IP]")
    Seq(
      "scrubbed" -> scrubbed,
      "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))),
      "n_phones" -> size(regexp_extract_all(noEmail, lit(PhoneRe), lit(0))),
      "n_ips" -> size(regexp_extract_all(noPhone, lit(IpRe), lit(0))))
  }
}
