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
    // lowercase the HOST only: userinfo is case-sensitive per RFC 3986, so
    // lowering the whole authority would merge Alice@ with alice@ — the
    // exact distinct-resource merge the contract above forbids. '@' cannot
    // appear in the host, so the greedy ".*@" split is exact.
    val auth = regexp_extract(noFrag, "^[^:/?#]+://([^/?#]*)", 1)
    val hostPort = concat(regexp_extract(auth, "^(.*@)", 1),
      lower(regexp_replace(auth, "^.*@", "")))
    val rest = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    // tracking params live in the QUERY only — '&' is a legal PATH character
    // ("/a&utm_source=x" with no '?' is a real resource, not a tracker), so
    // split at the first '?' and clean only the query side
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "(\\?.*)$", 1)
    // param names match case-insensitively (UTM_SOURCE= is the same tracker
    // as utm_source=); host/scheme are lowercased above for the same reason
    val noTrack = regexp_replace(query, "([?&])(?i:utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    // "$1" keeps the leading separator; collapse the debris it leaves.
    // Order matters: two adjacent tracking params leave "?&&x" — runs of
    // '&' must collapse before the '?&' join is repaired.
    val cleanQ = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "&&+", "&"), "\\?&", "?"), "[?&]$", "")
    // scheme-less input: every extract above returns "" and all such urls
    // would collapse to the literal "://" — one canonical key merging
    // genuinely distinct resources; pass them through unchanged instead.
    // The guard must be the SAME anchored scheme match the extraction uses:
    // a bare contains("://") passes "url=https://a.com"-style strings whose
    // anchored extracts are all empty, collapsing them to "://" anyway
    when(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", 0) =!= "",
      concat(scheme, lit("://"), host, path, cleanQ))
      .otherwise(url)
  }

  /** Hostname of a URL (lowercased, userinfo and port stripped). Userinfo
    * must go: the authority "alice@example.com" names the same HOST as
    * "bob@example.com", and leaving it in would split one physical host into
    * many in domainStats' countDistinct (and any per-host rate grouping).
    * '@' cannot appear in the host itself, so the greedy strip is exact —
    * same reasoning as canonicalUrl's authority split above.
    */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_replace(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1), "^.*@", "")),
      ":\\d+$", "")

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
  def gopherRepetition(docsIn: DataFrame): DataFrame = {
    // NULL text has no repetition metrics: size(split(NULL)) is -1 under
    // legacy semantics, which would emit n_lines=-1 / flagged=false rows
    // that domainStats then averages into per-domain quality. Dropped,
    // consistent with ngramRepetition's NULL guard.
    val docs = docsIn.where(col("text").isNotNull)
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

  /** Gopher-style n-gram repetition metrics: per doc, over word n-grams of
    * size `n`,
    *   - `top_ngram_frac`  — occurrences of the single most frequent n-gram
    *     as a fraction of all n-gram occurrences,
    *   - `dup_ngram_frac`  — fraction of n-gram occurrences whose n-gram
    *     occurs more than once.
    * (The published Gopher rules measure character coverage; the
    * occurrence-fraction analog here is deterministic, order-free, and
    * SQL-recomputable — the thresholds transfer.) Shape at scale: one
    * explode of n-grams (sliding window via `transform(sequence(...))`,
    * no UDF) → two doc-keyed aggregations, both map-side partial.
    * Docs shorter than n words emit zero n-grams → NO output row (matching
    * the SQL oracle's aggregation; left-join + coalesce to 0 on the caller
    * side to treat them as repetition-free).
    * @return (doc_id, n_ngrams, top_ngram_frac, dup_ngram_frac)
    */
  def ngramRepetition(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "ngramRepetition needs n >= 2 (n=1 is top_word_frac)")
    val words = filter(split(lower(col("text")), "\\s+"), w => w =!= "")
    // sequence(a, b) DESCENDS when a > b — guard short docs to an empty
    // array (explode then emits no rows, matching the SQL oracle)
    val starts = when(size(words) >= n, sequence(lit(0), size(words) - n))
      .otherwise(array().cast("array<int>"))
    val grams = docs.select(
      col("doc_id"),
      explode(transform(starts,
        i => array_join(slice(words, i + 1, lit(n)), " "))).as("gram"))
    grams.groupBy("doc_id", "gram").count()
      .groupBy("doc_id")
      .agg(
        sum("count").as("n_ngrams"),
        max("count").as("top_count"),
        sum(when(col("count") > 1, col("count")).otherwise(lit(0L))).as("dup_count"))
      .select(
        col("doc_id"),
        col("n_ngrams"),
        round(col("top_count") / col("n_ngrams"), 6).as("top_ngram_frac"),
        round(col("dup_count") / col("n_ngrams"), 6).as("dup_ngram_frac"))
  }

  // ---- C4-style line filtering --------------------------------------------

  /** \s-aware two-sided strip — NOT `trim()`, which removes only ASCII
    * spaces: C4's reference implementation applies Python `str.strip()`
    * (removes \r and \t too) before its line tests, so a CRLF corpus's
    * trailing `\r` must not defeat the terminal-punctuation match or split
    * the line-dedup hash by line-ending convention. The DuckDB oracles use
    * the same `regexp_replace(..., '^\s+|\s+$', ...)` in lockstep.
    */
  private def stripWs(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")

  /** The C4 line-level cleaning battery (public C4 rules): keep a line only
    * if it ends in terminal punctuation, has ≥ `minWords` words, and does
    * not contain boilerplate markers ("lorem ipsum", "javascript", a curly
    * brace, "cookie policy" / "terms of use" — case-insensitive). One
    * explode → per-line predicate (codegen'd) → per-doc reassembly; the
    * same single-exchange shape as [[lineDedup]].
    * @return (doc_id, n_lines, n_kept, clean_text)
    */
  def c4LineFilter(docs: DataFrame, minWords: Int = 3): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("line_no", "line")))
    // stripWs, not trim(): a Windows-origin doc's lines all end in \r, which
    // trim() keeps — pre-fix the terminal-punctuation test then failed for
    // EVERY line and the whole doc came back n_kept=0 / clean_text="",
    // diverging from C4 (which str.strip()s before the end-mark test)
    val t = stripWs(col("line"))
    val lw = lower(col("line"))
    // \z, not $: on the stripped line they agree, but \z states the intent
    // (end of input, no line-terminator magic)
    val kept =
      t.rlike("[.!?\"']\\z") &&
      size(filter(split(t, "\\s+"), w => w =!= "")) >= minWords &&
      !lw.contains("lorem ipsum") && !lw.contains("javascript") &&
      !lw.contains("{") && !lw.contains("cookie policy") &&
      !lw.contains("terms of use")
    // clean_text joins the STRIPPED lines — C4's cleaned output is built
    // from str.strip()ed lines, and a kept CRLF line must not smuggle its
    // \r into the reassembled text
    lines.withColumn("kept", kept).withColumn("line_s", t)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        sum(col("kept").cast("int")).cast("int").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("line_no"), col("line_s"))))),
            x => x.getField("line_s")),
          "\n").as("clean_text"))
  }

  // ---- cross-document line dedup (CCNet-style boilerplate removal) --------

  /** Drop lines whose normalized form (lower + \s-strip — so the same
    * boilerplate line from LF and CRLF documents hashes identically) appears
    * in at least `minDocs` distinct documents — the standard web-corpus
    * boilerplate filter (nav bars, cookie banners, footers repeat across a
    * site; real prose doesn't). Blank lines are never dedup candidates.
    *
    * Scale shape: explode → one groupBy on a 64-bit line hash (map-side
    * partial agg; the common-line table is corpus-boilerplate-sized, far
    * smaller than the corpus) → equi-join back on the hash → per-doc
    * reassembly grouped by doc_id. No driver-side state; the only risk at
    * 100 TB is head lines ("home", "") which the blank filter and the
    * bounded distinct-doc count keep benign. Joining on xxhash64(norm)
    * instead of the string keeps the shuffle payload fixed-width; a collision
    * needs ~2^32 distinct lines per partition-pair to matter.
    *
    * @return (doc_id, n_lines, n_dropped, clean_text)
    */
  def lineDedup(docs: DataFrame, minDocs: Int): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("line_no", "line")))
      .withColumn("norm_hash", xxhash64(lower(stripWs(col("line")))))
      .withColumn("blank", stripWs(col("line")) === "")
    val common = lines.where(!col("blank"))
      .groupBy("norm_hash")
      .agg(countDistinct("doc_id").as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("norm_hash"), lit(true).as("is_common"))
    lines.join(common, Seq("norm_hash"), "left")
      .withColumn("dropped", !col("blank") && coalesce(col("is_common"), lit(false)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        sum(col("dropped").cast("int")).cast("int").as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(!col("dropped"),
              struct(col("line_no"), col("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"))
  }

  // ---- domain-level aggregation -------------------------------------------

  /** Per-registrable-domain corpus statistics — the aggregation behind
    * domain-level quality filtering (a domain whose pages are mostly
    * repetition-flagged gets blacklisted wholesale). One groupBy on the
    * derived domain key; the repetition metrics come from
    * [[gopherRepetition]] joined on doc_id.
    *
    * Input needs (doc_id, url, text);
    * output (domain, n_docs, n_hosts, total_words, flagged_frac).
    */
  def domainStats(docs: DataFrame): DataFrame = {
    val withDomain = docs
      .withColumn("host", hostOf(col("url")))
      .withColumn("domain", registrableDomain(col("host")))
    val rep = gopherRepetition(docs.select(col("doc_id"), col("text")))
    withDomain.join(rep, Seq("doc_id"))
      .groupBy("domain")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        countDistinct("host").as("n_hosts"),
        sum("n_words").as("total_words"),
        round(avg(col("flagged").cast("double")), 6).as("flagged_frac"))
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
