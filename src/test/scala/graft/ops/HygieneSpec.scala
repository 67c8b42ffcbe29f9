package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.SparkTestSession

/** Unit coverage for the web-hygiene operators beyond what the arithmetic
  * oracles in SparkEntry pin: canonicalization edge shapes (adjacent
  * tracking params, preserved real params, both default ports), PII
  * counting, and the Gopher repetition thresholds on hand-built docs.
  */
class HygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Hygiene.canonicalUrl(col("url"))).as[String].collect().toSeq

  test("canonicalUrl: tracking params stripped, real params preserved") {
    assert(canon(
      "HTTPS://Example.ORG:443/a/B?UTM_SOURCE=x&utm_campaign=y&id=3",
      "https://example.org/a?id=3&utm_medium=em#frag",
      "http://Host.COM:80/p?fbclid=abc123",
      "https://example.org/a?gclid=1&q=spark&utm_term=z",
      "https://example.org/path#section",
      "https://example.org/plain?a=1&b=2"
    ) == Seq(
      "https://example.org/a/B?id=3",
      "https://example.org/a?id=3",
      "http://host.com/p",
      "https://example.org/a?q=spark",
      "https://example.org/path",
      "https://example.org/plain?a=1&b=2"
    ))
  }

  test("canonicalUrl: non-default port and non-http scheme keep their port") {
    assert(canon("https://example.org:8443/x", "ftp://Example.org:21/x") ==
      Seq("https://example.org:8443/x", "ftp://example.org:21/x"))
  }

  test("canonicalUrl: scheme-less urls pass through unchanged (never merge distinct resources)") {
    assert(canon("www.example.com/a", "other.org/b", "https://ok.com/x#f") ==
      Seq("www.example.com/a", "other.org/b", "https://ok.com/x"))
  }

  test("canonicalUrl: unanchored '://' passes through; '&' in a query-less path is not a tracker") {
    assert(canon(
      // contain "://" but do NOT start with a scheme — must pass through,
      // not collapse to the shared key "://"
      " https://leading-space.com/a",
      "url=https://wrapped.com/b",
      "//cdn.example.com/p?ref=https://c",
      // '&' is a legal PATH char: with no '?', nothing is a tracking param
      "http://h/a&utm_source=x",
      // ...but the same tracker AFTER '?' still strips
      "http://h/a?utm_source=x"
    ) == Seq(
      " https://leading-space.com/a",
      "url=https://wrapped.com/b",
      "//cdn.example.com/p?ref=https://c",
      "http://h/a&utm_source=x",
      "http://h/a"
    ))
  }

  test("hostOf / registrableDomain") {
    val r = Seq("https://A.B.Example.co:8080/p?q=1")
      .toDF("url")
      .select(Hygiene.hostOf(col("url")).as("h"))
      .select(col("h"), Hygiene.registrableDomain(col("h")))
      .as[(String, String)].collect().head
    assert(r == ("a.b.example.co", "example.co"))
  }

  test("gopherRepetition: dup-line and top-word fractions + flag thresholds") {
    val docs = Seq(
      (1L, "same line\nsame line\nsame line\nother"),       // 3 dup lines of 4
      (2L, "spam spam spam spam one two"),                   // top word 4/6
      (3L, "a perfectly normal line\nwith different words")  // clean
    ).toDF("doc_id", "text")
    val m = Hygiene.gopherRepetition(docs).orderBy("doc_id")
      .select("doc_id", "dup_line_frac", "top_word_frac", "flagged")
      .as[(Long, Double, Double, Boolean)].collect()
    assert(m(0) == ((1L, 0.5, 0.428571, true)))   // 1 - 2/4 ; 'same' 3 of 7 words
    assert(m(1) == ((2L, 0.0, 0.666667, true)))
    assert(m(2) == ((3L, 0.0, 0.142857, false)))
  }

  test("pii scrubbing: typed placeholders and per-class counts") {
    val row = Seq("Mail a@b.co and c.d+x@e.org, call 555-123-4567, ping 192.168.0.1.")
      .toDF("text")
    val out = Hygiene.piiColumns(col("text")).foldLeft(row) {
      case (d, (n, c)) => d.withColumn(n, c)
    }.select("scrubbed", "n_emails", "n_phones", "n_ips")
      .as[(String, Int, Int, Int)].collect().head
    assert(out._1 == "Mail [EMAIL] and [EMAIL], call [PHONE], ping [IP].")
    assert((out._2, out._3, out._4) == ((2, 1, 1)))
  }

  test("lineDedup: drops lines shared by >=minDocs docs, keeps blanks and rare lines") {
    val docs = Seq(
      (1L, "Cookie banner\nreal content one\n\nCookie banner"),
      (2L, "cookie banner \nreal content two"),   // case/space-normalized match
      (3L, "Cookie banner\nreal content three\nrare shared"),
      (4L, "rare shared\nonly here"),
      (5L, "Cookie banner")                        // all lines boilerplate
    ).toDF("doc_id", "text")
    val out = Hygiene.lineDedup(docs, minDocs = 3).orderBy("doc_id")
      .select("doc_id", "n_lines", "n_dropped", "clean_text")
      .as[(Long, Int, Int, String)].collect()
    assert(out(0) == ((1L, 4, 2, "real content one\n")))   // blank line survives
    assert(out(1) == ((2L, 2, 1, "real content two")))
    assert(out(2) == ((3L, 3, 1, "real content three\nrare shared"))) // 2 docs < minDocs
    assert(out(3) == ((4L, 2, 0, "rare shared\nonly here")))
    assert(out(4) == ((5L, 1, 1, "")))
  }

  test("ngramRepetition: top and duplicate trigram occurrence fractions") {
    val docs = Seq(
      (1L, "a b c a b c a b d"),   // 7 trigrams; abc, bca, cab each ×2 → 6 dup occurrences
      (2L, "all words different here now"), // 3 trigrams, all unique
      (3L, "too short")            // < 3 words → no rows
    ).toDF("doc_id", "text")
    val out = Hygiene.ngramRepetition(docs, n = 3).orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length == 2, "doc 3 emits no n-grams")
    assert(out(0) == ((1L, 7L, 0.285714, 0.857143))) // top 2/7; dup 6/7
    assert(out(1) == ((2L, 3L, 0.333333, 0.0)))
  }

  test("c4LineFilter: punctuation, min-words and boilerplate markers") {
    val docs = Seq(
      (1L, "This line is a keeper sentence.\nno terminal punctuation here\n" +
        "Call javascript:void(0) now.\nOpen { brace } line.\nToo few.\n" +
        // \r survives the \n split; C4 str.strip()s BEFORE the end-mark
        // test, so this line KEEPS (and its \r never reaches clean_text) —
        // pre-fix, trim() left the \r and the line was wrongly dropped
        "A CRLF-terminated sentence keeps.\r\n" +
        "Another good line stays here!")
    ).toDF("doc_id", "text")
    val out = Hygiene.c4LineFilter(docs).orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out(0) == ((1L, 7, 3,
      "This line is a keeper sentence.\nA CRLF-terminated sentence keeps.\n" +
        "Another good line stays here!")))
  }

  test("c4LineFilter: a fully CRLF document is not silently emptied") {
    // the whole-corpus failure mode: every line of a Windows-origin doc ends
    // in \r, so a space-only trim left the terminal-punctuation test failing
    // for ALL lines — n_kept=0, clean_text="" for perfectly good prose
    val docs = Seq(
      (1L, "Good sentence number one lives.\r\nGood sentence number two lives.\r\n")
    ).toDF("doc_id", "text")
    val out = Hygiene.c4LineFilter(docs)
      .select("doc_id", "n_kept", "clean_text")
      .as[(Long, Int, String)].collect()
    assert(out(0) == ((1L, 2,
      "Good sentence number one lives.\nGood sentence number two lives.")))
  }

  test("lineDedup: CRLF and LF copies of a boilerplate line hash as ONE normalized form") {
    // pre-fix, lower(trim(line)) kept the trailing \r: the same cookie
    // banner from CRLF docs and LF docs counted as two different lines and
    // neither side reached minDocs
    val docs = Seq(
      (1L, "Accept cookies\r\nreal one"),
      (2L, "Accept cookies\nreal two"),
      (3L, "accept cookies \r\nreal three")
    ).toDF("doc_id", "text")
    val out = Hygiene.lineDedup(docs, minDocs = 3).orderBy("doc_id")
      .select("doc_id", "n_dropped").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 1), (2L, 1), (3L, 1)),
      "all three line-ending variants must dedup together")
  }

  test("domainStats: subdomain hosts collapse to registrable domain") {
    val docs = Seq(
      (1L, "https://a.shop.com/x", "one two three\nfour five six"),
      (2L, "https://b.shop.com/y", "spam spam spam spam spam one"),
      (3L, "https://a.shop.com/z", "alpha beta gamma delta epsilon zeta"),
      (4L, "https://news.org/p", "red green blue yellow purple orange")
    ).toDF("doc_id", "url", "text")
    val out = Hygiene.domainStats(docs).orderBy("domain")
      .select("domain", "n_docs", "n_hosts", "flagged_frac")
      .as[(String, Long, Long, Double)].collect()
    assert(out(0) == (("news.org", 1L, 1L, 0.0)))
    assert(out(1) == (("shop.com", 3L, 2L, 0.333333))) // doc 2 top-word-flagged
  }

  test("pii scrubbing: email hosts never double-count as IPs") {
    val row = Seq("x@10.0.0.1.example.com then 10.0.0.1").toDF("text")
    val out = Hygiene.piiColumns(col("text")).foldLeft(row) {
      case (d, (n, c)) => d.withColumn(n, c)
    }.select("scrubbed", "n_emails", "n_ips").as[(String, Int, Int)].collect().head
    assert(out._1 == "[EMAIL] then [IP]")
    assert((out._2, out._3) == ((1, 1)))
  }
}
