package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One Common-Crawl-style web page — the engine's only external input shape
  * (BASELINE.json input_hint): (url, warc_ts, html, text, lang) + a metadata
  * map used by filter queries (reference attaches per-doc config values the
  * same way, tests/backend/common.py:123-154).
  */
case class WebDoc(
    docId: Long,
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    meta: Map[String, String])

/** Deterministic synthetic webtext corpus + the html→text extraction that must
  * be byte-identical per url (the parity gate of BASELINE.json input_hint; the
  * reference's analog is OCR text extraction, backend/crawler/pdf_processor.py).
  *
  * Every field derives from the row id via pure functions of (seed, id) — no
  * wall clock, no RNG state, no partition-order dependence — so the corpus is
  * identical at any parallelism (FIXTURES.md §1).
  */
object Webtext {

  // ---------- deterministic hashing ----------
  /** splitmix64 — public-domain mixing function (Steele et al.), the standard
    * way to derive independent deterministic streams from (seed, counter).
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def mix(seed: Long, a: Long, b: Long = 0, c: Long = 0): Long =
    mix64(mix64(mix64(mix64(seed) ^ a) ^ b) ^ c)
  /** uniform double in [0,1) from a hash */
  def toUnit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  // ---------- vocabulary ----------
  val VocabSize = 50000
  val ZipfS = 1.07

  private val hiCons = "कखगघचछजझटठडढतथदधनपफबभमयरलवशषसह".toCharArray
  private val hiMatras = Array("", "ा", "ि", "ी", "ु", "ू", "े", "ै", "ो", "ौ")
  private val guCons = "કખગઘચછજઝટઠડઢતથદધનપફબભમયરલવશષસહ".toCharArray
  private val guMatras = Array("", "ા", "િ", "ી", "ુ", "ૂ", "ે", "ૈ", "ો", "ૌ")

  private def latinWord(v: Int): String = {
    val h = mix(0xE11AL, v.toLong)
    val len = 3 + Math.floorMod(h, 7).toInt
    val sb = new StringBuilder
    var x = h
    for (_ <- 0 until len) { x = mix64(x); sb += ('a' + Math.floorMod(x, 26)).toChar }
    sb.toString
  }

  // the full vocabulary memoized per language: word(lang, v) is pure and the
  // corpus generators derive 30–300 body tokens per document — recomputing
  // the mix64 chain + StringBuilder per token made every ladder/bench corpus
  // generation pay ~165 hash+alloc word derivations per doc. A few MB per
  // language, built once per JVM (object state, so once per executor).
  private lazy val hiWords: Array[String] =
    Array.tabulate(VocabSize)(syllableWord(_, hiCons, hiMatras, 0x48AAL))
  private lazy val guWords: Array[String] =
    Array.tabulate(VocabSize)(syllableWord(_, guCons, guMatras, 0x47BBL))
  private lazy val enWords: Array[String] = Array.tabulate(VocabSize)(latinWord)

  /** word for vocab rank v (0 = most frequent) in a language; deterministic. */
  def word(lang: String, v: Int): String = lang match {
    case "hi" => hiWords(v)
    case "gu" => guWords(v)
    case _    => enWords(v)
  }

  private def syllableWord(v: Int, cons: Array[Char], matras: Array[String], salt: Long): String = {
    val h = mix(salt, v.toLong)
    val nSyll = 2 + Math.floorMod(h, 3).toInt
    val sb = new StringBuilder
    var x = h
    for (_ <- 0 until nSyll) {
      x = mix64(x)
      sb += cons(Math.floorMod(x, cons.length).toInt)
      x = mix64(x)
      sb ++= matras(Math.floorMod(x, matras.length).toInt)
    }
    sb.toString
  }

  /** Zipf(s) rank sampling via inverse-CDF over a precomputed cumulative table. */
  private lazy val zipfCum: Array[Double] = {
    val w = Array.tabulate(VocabSize)(r => 1.0 / math.pow(r + 1.0, ZipfS))
    val total = w.sum
    val cum = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cum(i) = acc; i += 1 }
    cum
  }
  def zipfRank(u: Double): Int = {
    val i = java.util.Arrays.binarySearch(zipfCum, u)
    val r = if (i >= 0) i else -i - 1
    math.min(r, VocabSize - 1)
  }

  // ---------- planted fixtures (FIXTURES.md §1-2) ----------
  /** Golden phrases per language — the reference's own golden-query style
    * (tests/backend/test_search.py:119 "बेंगलुरु केम्पे गौड़ा").
    */
  val GoldenPhrase: Map[String, Array[String]] = Map(
    "hi" -> Array("बेंगलुरु", "केम्पे", "गौड़ा"),
    "gu" -> Array("બેંગલુરુ", "કેમ્પે", "ગૌડા"),
    "en" -> Array("kempegowda", "built", "bangalore"))

  /** Nasal-variant pair: docs write the conjunct form; queries use anusvara. */
  val NasalVariantDoc = "शान्ति"

  /** Designated head terms (beyond natural Zipf heads) to force posting skew. */
  // memoized for the three real langs: genDoc consults this per document
  private lazy val headTermsCache: Map[String, Array[String]] =
    Seq("hi", "gu", "en").map(l => l -> computeHeadTerms(l)).toMap

  private def computeHeadTerms(lang: String): Array[String] =
    Array.tabulate(4)(k => word(lang, k) /* top Zipf ranks are natural heads */) ++
      Array(s"${lang}head0", s"${lang}head1")

  def headTerms(lang: String): Array[String] =
    headTermsCache.getOrElse(lang, computeHeadTerms(lang))

  val Epoch: Long = java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli

  def langOf(i: Long): String = Math.floorMod(i, 10L) match {
    case x if x <= 4 => "hi"
    case x if x <= 8 => "gu"
    case _           => "en"
  }

  /** Generate one document from its id. Pure. */
  def genDoc(seed: Long, i: Long): WebDoc = {
    val lang = langOf(i)
    val h0 = mix(seed, i)
    val nTokens = 30 + Math.floorMod(h0, 271L).toInt // 30..300
    val words = new scala.collection.mutable.ArrayBuffer[String](nTokens + 8)
    var x = h0
    var t = 0
    while (t < nTokens) {
      x = mix64(x)
      words += word(lang, zipfRank(toUnit(x)))
      t += 1
    }
    // designated head terms in ~12% of docs each
    for ((ht, k) <- headTerms(lang).zipWithIndex) {
      if (toUnit(mix(seed, i, 1000L + k)) < 0.12) {
        val at = Math.floorMod(mix(seed, i, 2000L + k), words.length.toLong).toInt
        words.insert(at, ht)
      }
    }
    // golden phrase planted consecutively (positive) or reversed (negative)
    val phrase = GoldenPhrase(lang)
    val m = Math.floorMod(i, 101L)
    if (m == 5L) words.insertAll(math.min(7, words.length), phrase)
    else if (m == 6L) words.insertAll(math.min(7, words.length), phrase.reverse)
    // nasal conjunct variant in ~10% of hi docs. The insert must not land
    // INSIDE the just-planted phrase span — it would split the consecutive
    // phrase and break the m==5 positive fixture for that (seed, i)
    if (lang == "hi" && toUnit(mix(seed, i, 3000L)) < 0.10) {
      var at = Math.floorMod(mix(seed, i, 3001L), words.length.toLong).toInt
      if (m == 5L || m == 6L) {
        val pStart = math.min(7, words.length - phrase.length)
        if (at > pStart && at < pStart + phrase.length) at = pStart + phrase.length
      }
      words.insert(at, NasalVariantDoc)
    }

    // sentences (danda for hi/gu) and paragraphs
    val sentEnd = if (lang == "en") "." else " ।"
    var paraLen = 0
    val paras = new scala.collection.mutable.ArrayBuffer[String]
    val cur = new StringBuilder
    for ((w, idx) <- words.zipWithIndex) {
      if (cur.nonEmpty) cur += ' '
      cur ++= w
      val endSent = (idx + 1) % 12 == 0
      if (endSent) cur ++= sentEnd
      paraLen += 1
      if (paraLen >= 60) { paras += cur.toString; cur.clear(); paraLen = 0 }
    }
    if (cur.nonEmpty) paras += cur.toString
    val text = paras.mkString("\n\n")

    // zpad: the synthetic corpus must be BYTE-IDENTICAL under any default
    // locale (ext_parity and the oracles hash these urls)
    val url = s"https://example.org/$lang/topic${Math.floorMod(i, 20L)}/${graft.Fmt.zpad(i, 8)}"
    val ts = new java.sql.Timestamp(Epoch + i * 137000L)
    // Q5 date fixtures: ~1/3 of docs carry a bookmark `date` (2019..2021);
    // half carry a series range; odd non-date docs have neither (the
    // never-matches branch of the reference's date OR-filter)
    val bookmark: Map[String, String] =
      if (Math.floorMod(i, 3L) == 0L)
        Map("date" -> java.time.LocalDate.of(2019, 1, 1)
          .plusDays(Math.floorMod(i, 1000L)).toString)
      else Map.empty[String, String]
    val series: Map[String, String] =
      if (Math.floorMod(i, 2L) == 0L) {
        val st = java.time.LocalDate.of(2018, 6, 1).plusDays(Math.floorMod(i, 700L))
        Map("series_start_date" -> st.toString,
          "series_end_date" -> st.plusDays(400).toString)
      } else Map.empty[String, String]
    val dateMeta: Map[String, String] = bookmark ++ series
    val meta = Map(
      "category" -> (if (Math.floorMod(i, 3L) == 0L) "Granth" else "Pravachan"),
      "Author" -> s"author${Math.floorMod(i, 7L)}",
      "Anuyog" -> s"anuyog${Math.floorMod(i, 4L)}",
      // the url's topic directory as a faceted source key — gives the serve
      // deployment same-source prev/next for /api/context (flat-corpus mode)
      "source" -> s"topic${Math.floorMod(i, 20L)}") ++ dateMeta
    WebDoc(i, url, ts, htmlFor(i, text), text, lang, meta)
  }

  /** Canonical html wrapper; [[extractText]] is its exact inverse —
    * PROVIDED the text does not itself contain the literal markers
    * `</p><p>` / `</p></body></html>` (the synthetic vocabulary never
    * emits `<` so genDoc text can't; corpus text that did would fail the
    * byte-identical extraction parity gate LOUDLY, not silently, since
    * extractText would return the rewritten form).
    */
  def htmlFor(i: Long, text: String): Array[Byte] =
    (s"<html><head><title>doc-$i</title></head><body><p>" +
      text.replace("\n\n", "</p><p>") +
      "</p></body></html>").getBytes("UTF-8")

  /** Byte-identical text extraction (the parity gate). */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, "UTF-8")
    val start = s.indexOf("<body><p>")
    val end = s.lastIndexOf("</p></body></html>")
    if (start < 0 || end < 0 || end < start) ""
    else s.substring(start + "<body><p>".length, end).replace("</p><p>", "\n\n")
  }

  /** Synthetic corpus as a typed Dataset. Deterministic at any parallelism. */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 32): Dataset[WebDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).as[Long].map(i => genDoc(seed, i))
  }

  /** Derive a webtext table from the driver-generated `documents.parquet`
    * (TESTDATA.md) with the exact arithmetic that the DuckDB oracle SQL uses —
    * url/warc_ts/html are pure functions of (doc_id, lang, source, text), so
    * the oracle can rebuild the same table from the same parquet.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id"),
      // format_string, not lpad(…, 8): lpad TRUNCATES ids past 8 digits, so
      // doc_id 123456789 and 12345678 would collide on one url (and merge
      // under a derived docId) at ≥1e8 docs — %08d widens like genDoc's
      concat(lit("https://example.org/"), col("lang"), lit("/"), col("source"),
        lit("/"), format_string("%08d", col("doc_id"))).as("url"),
      // ~1.6 days apart: 500 docs span >2 years, so year-range filters are
      // selective even at the smallest scale factor
      expr("timestamp'2020-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id * 139733)")
        .as("warc_ts"),
      concat(lit("<html><head><title>doc-"), col("doc_id"),
        lit("</title></head><body><p>"),
        regexp_replace(col("text"), lit("\n\n"), lit("</p><p>")),
        lit("</p></body></html>")).cast("binary").as("html"),
      col("text"),
      col("lang"),
      col("source"),
      // metadata map incl. deterministic Q5 date fixtures (doc_id % 3 == 0 →
      // bookmark date over 2019-2020; doc_id % 2 == 0 → 300-day series range
      // starting mid-2019) — the DuckDB oracles reproduce the same arithmetic
      map_concat(
        map(lit("source"), col("source")),
        when(pmod(col("doc_id"), lit(3)) === 0,
          map(lit("date"), date_format(
            date_add(to_date(lit("2019-01-01")), pmod(col("doc_id"), lit(730)).cast("int")),
            "yyyy-MM-dd")))
          .otherwise(map().cast("map<string,string>")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          map(
            lit("series_start_date"), date_format(
              date_add(to_date(lit("2019-06-01")), pmod(col("doc_id"), lit(400)).cast("int")),
              "yyyy-MM-dd"),
            lit("series_end_date"), date_format(
              date_add(to_date(lit("2019-06-01")), pmod(col("doc_id"), lit(400)).cast("int") + 300),
              "yyyy-MM-dd")))
          .otherwise(map().cast("map<string,string>"))).as("meta"))
  }
}
