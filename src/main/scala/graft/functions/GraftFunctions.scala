package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf
import graft.analysis.Analyzer
import graft.corpus.Webtext

/** RFC 4122 version-5 (name-based, SHA-1) UUID — the reference derives its
  * document_id as uuid5(NAMESPACE_URL, relative_path)
  * (backend/crawler/discovery.py:158-160); our analog hashes the page url.
  * Pure JVM implementation, no external deps.
  */
object Uuid5 {
  /** 6ba7b811-9dad-11d1-80b4-00c04fd430c8 (RFC 4122 Appendix C, URL namespace) */
  val NamespaceUrl: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x11, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  def uuid5(name: String): String = uuid5(NamespaceUrl, name)

  // per-thread digest: uuid5 runs once per ROW on the codegen'd Uuid5Expr
  // build path, and MessageDigest.getInstance's provider lookup + allocation
  // would dominate the actual SHA-1 there; digest() resets the instance, so
  // thread-local reuse is safe
  private val sha1 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-1")
  }

  def uuid5(namespace: Array[Byte], name: String): String = {
    val md = sha1.get()
    md.reset()
    md.update(namespace)
    md.update(name.getBytes("UTF-8"))
    val h = md.digest() // 20 bytes; take first 16
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val sb = new StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb += '-'
      sb.append(f"${h(i) & 0xff}%02x")
      i += 1
    }
    sb.toString
  }
}

/** Column-level entry points for the engine's custom scalar functions.
  * UDF-backed (deterministic, marked as such so Catalyst can still push
  * around them where legal); hot paths inside the index build use the plain
  * Scala functions directly in typed Dataset maps instead.
  */
object GraftFunctions {

  /** analyze(text, lang) → array of terms (reference analyzer chain §1.3).
    * udfs are deterministic by default — important: Catalyst may re-execute or
    * reorder them, which is safe here because the analyzer is pure.
    *
    * The lambda is held separately so [[graft.plans.IndexAccessRule]] can
    * recognize "this ScalaUDF IS our analyzer" by reference identity in a
    * logical plan (every ScalaUDF built from [[analyze_terms]] — Column API
    * or SQL registration — carries this exact object as its function).
    */
  private[graft] val analyzeTermsFn: (String, String) => Seq[String] =
    (text, lang) => Analyzer.terms(text, lang).toSeq

  val analyze_terms = udf(analyzeTermsFn)

  /** Per-document term frequencies computed IN the analyzer pass —
    * array<struct<term,tf>>. Exploding this instead of the raw term stream
    * moves the tf aggregation map-side: (doc, term) pairs are already unique,
    * so `tokenize_tf` needs NO shuffle at all and `term_stats` shuffles one
    * row per (doc, term) instead of one per token (guide §2.3 "aggregate
    * before you shuffle"). tf is Long to match the `count(*)` column type it
    * replaces.
    */
  final case class TermTf(term: String, tf: Long)

  val analyze_tf = udf { (text: String, lang: String) =>
    val m = new java.util.LinkedHashMap[String, Long]()
    Analyzer.foreachToken(text, lang)((term, _, _, _) =>
      m.merge(term, 1L, (a, b) => a + b))
    val out = new Array[TermTf](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = TermTf(e.getKey, e.getValue)
      i += 1
    }
    out.toSeq
  }

  /** Element type of [[analyze_tokens]] — a named case class, NOT a tuple:
    * tuple encoding would surface the struct fields as `_1`/`_2` and break
    * the documented `tok.term` / `tok.pos` access after an explode. */
  final case class AnalyzedToken(term: String, pos: Int)

  /** analyze with positions: array<struct<term,pos>> */
  val analyze_tokens = udf((text: String, lang: String) =>
    Analyzer.analyze(text, lang).map(t => AnalyzedToken(t.term, t.pos)).toSeq)

  /** uuid5 of a string (URL namespace); null in → null out (a NULL url row
    * must not abort the whole query — SQL scalar-function semantics). */
  val uuid5_url = udf((name: String) =>
    if (name == null) null else Uuid5.uuid5(name))

  /** byte-identical text extraction from the html payload; null-safe. */
  val extract_text = udf((html: Array[Byte]) =>
    if (html == null) null else Webtext.extractText(html))

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("analyze_terms", analyze_terms)
    spark.udf.register("analyze_tokens", analyze_tokens)
    spark.udf.register("uuid5_url", uuid5_url)
    spark.udf.register("extract_text", extract_text)
  }
}
