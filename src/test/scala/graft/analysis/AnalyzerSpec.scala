package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  private def terms(text: String, lang: String): Seq[String] =
    Analyzer.terms(text, lang).toSeq

  test("hindi nasal char filter: शान्ति and शांति collide (config rows :9-54)") {
    assert(terms("शान्ति", "hi") == Seq("शांति"))
    assert(terms("शांति", "hi") == Seq("शांति"))
  }

  test("every hindi mapping row rewrites to anusvara form") {
    Analyzer.HindiNasalMappings.foreach { case (src, dst) =>
      val (filtered, _) = Analyzer.charFilter(s"अ${src}अ", Map(src -> dst))
      assert(filtered == s"अ${dst}अ", s"$src => $dst")
    }
  }

  test("gujarati nasal char filter incl. reference quirks") {
    assert(terms("શાન્તિ", "gu") == Seq("શાંતિ"))
    // quirk rows applied verbatim (Devanagari source row inside gujarati table,
    // Devanagari anusvara target) — opensearch-config.yaml:66,76
    val gmap = Analyzer.GujaratiNasalMappings.toMap
    assert(Analyzer.charFilter("न्छ", gmap)._1 == "ंछ")
    assert(Analyzer.charFilter("મ્ફ", gmap)._1 == "ंફ")
  }

  test("hindi stopwords removed, positions keep gaps (Lucene StopFilter)") {
    val toks = Analyzer.analyze("राम और श्याम", "hi")
    assert(toks.map(_.term).toSeq == Seq("राम", "श्याम"))
    assert(toks.map(_.pos).toSeq == Seq(0, 2)) // "और" consumed position 1
  }

  test("gujarati stopwords removed (reference mixed stoplist gu half)") {
    assert(terms("રામ અને શ્યામ", "gu") == Seq("રામ", "શ્યામ"))
  }

  test("mixed (granth) analyzer stops both languages") {
    assert(terms("राम और રામ અને", "mixed") == Seq("राम", "રામ"))
  }

  test("standard chain for other langs: icu tokenize + nfkc_cf, no stopwords") {
    assert(terms("The FAST key order 42", "en") ==
      Seq("the", "fast", "key", "order", "42"))
    // 'the' must NOT be removed — reference has no english analyzer
    assert(terms("the", "en") == Seq("the"))
  }

  test("nfkc_cf folds case, width and ligatures") {
    assert(terms("Ｆｕｌｌｗｉｄｔｈ", "en") == Seq("fullwidth"))
    assert(terms("ﬁre", "en") == Seq("fire"))
    assert(terms("GRÜSSE", "en") == Seq("grüsse"))
  }

  test("punctuation incl. devanagari danda produces no tokens") {
    assert(terms("। ॥ ... !!!", "hi").isEmpty)
    assert(terms("", "hi").isEmpty)
    assert(terms(null, "hi").isEmpty)
  }

  test("offsets point into the ORIGINAL text across char-filter rewrites") {
    val text = "शान्ति शुभ"
    val toks = Analyzer.analyze(text, "hi")
    assert(toks.length == 2)
    assert(text.substring(toks(0).startOffset, toks(0).endOffset) == "शान्ति")
    assert(text.substring(toks(1).startOffset, toks(1).endOffset) == "शुभ")
  }

  test("offsets identity when no char filter applies") {
    val text = "alpha beta"
    val toks = Analyzer.analyze(text, "en")
    assert(toks.map(t => text.substring(t.startOffset, t.endOffset)).toSeq ==
      Seq("alpha", "beta"))
  }

  test("positions are dense over kept+stopped word tokens only") {
    val toks = Analyzer.analyze("alpha, beta; gamma", "en")
    assert(toks.map(_.pos).toSeq == Seq(0, 1, 2))
  }

  test("deterministic: same input → same output, repeated + multithreaded") {
    val text = "शान्ति और अशांति की बात न्याय म्मम"
    val expected = Analyzer.analyze(text, "hi").toSeq
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => (1 to 50).foreach { _ =>
        if (Analyzer.analyze(text, "hi").toSeq != expected) failures.incrementAndGet()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.get() == 0)
  }
}
