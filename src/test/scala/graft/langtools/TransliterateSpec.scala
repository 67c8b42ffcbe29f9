package graft.langtools

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the rule-based variant generator and the 3-phase flow
  * (reference transliterate.py:113-167, 207-323).
  */
class TransliterateSpec extends AnyFunSuite {

  test("hi variants: standard spellings first, ambiguity expanded") {
    val vs = Transliterate.variants("rama", "hi", 10)
    assert(vs.head == "रम", s"cheapest spelling first: $vs")
    assert(vs.contains("राम"), s"long-a alternative present: $vs")
    // sh ambiguity (श/ष)
    val sh = Transliterate.variants("shanti", "hi", 10)
    assert(sh.exists(_.startsWith("श")) && sh.exists(_.startsWith("ष")), s"$sh")
    // word-initial vowel uses the independent form
    assert(Transliterate.variants("aman", "hi", 5).head.startsWith("अ"))
  }

  test("gu variants mirror hi structure") {
    val vs = Transliterate.variants("rama", "gu", 10)
    assert(vs.head == "રમ" && vs.contains("રામ"), s"$vs")
  }

  test("latin ambiguity goldens (inlined into the oracle SQL)") {
    assert(Transliterate.variants("duup", "latin", 10) == Seq("duup", "dup"))
    assert(Transliterate.variants("spakr", "latin", 10) == Seq("spakr", "spaakr"))
    assert(Transliterate.variants("meerge", "latin", 10) == Seq("meerge", "mirge"))
  }

  test("deterministic and bounded") {
    val a = Transliterate.variants("dhashti", "hi", 10)
    val b = Transliterate.variants("dhashti", "hi", 10)
    assert(a == b && a.length <= 10 && a.distinct == a)
  }

  test("variants bounded on adversarial-length words (beam, not cross-product)") {
    // 30 alternation units would be 4^30 combinations exhaustively — the
    // memoized k-best expansion must return the top-k without materializing
    // them
    val w = "ta" * 30
    val t0 = System.nanoTime()
    val vs = Transliterate.variants(w, "hi", 10)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(vs.nonEmpty && vs.size <= 10 && vs.distinct == vs)
    assert(ms < 5000.0, s"variants took $ms ms")
  }

  // batched dfOf (one lookup per PHASE): a corpus map restricted to the asked
  // terms — the same shape the Spark consumer serves from one termdict scan
  private def batched(corpus: Map[String, Long]): Seq[String] => Map[String, Long] =
    vs => corpus.filter { case (k, _) => vs.contains(k) }

  test("3-phase flow: phase selection and ordering") {
    // phase 1: top-5 variant found
    assert(Transliterate.findBestMatches("duup", "latin",
      batched(Map("dup" -> 7L)), _ => Nil) == Seq(("dup", 7L)))
    // phase 3: nothing in variants → suggester terms queried, sorted by freq
    val res = Transliterate.findBestMatches("spakr", "latin",
      batched(Map("spark" -> 9L, "spare" -> 3L)), v => Seq("spark", "spare"))
    assert(res == Seq(("spark", 9L), ("spare", 3L)))
    // nothing anywhere → empty
    assert(Transliterate.findBestMatches("zzz", "latin", _ => Map.empty, _ => Nil).isEmpty)
  }

  test("adversarially long word: variants returns without stack overflow") {
    // recursion-per-unit would be ~25k frames here; the bottom-up expansion
    // plus the identity cap must return promptly instead
    val blob = "ka" * 25000
    assert(Transliterate.variants(blob, "hi", 10) == Seq(blob))
    // just under the cap still expands (and stays bounded by the beam)
    val under = "ta" * (Transliterate.MaxVariantWordLen / 2)
    val vs = Transliterate.variants(under, "hi", 10)
    assert(vs.nonEmpty && vs.size <= 10)
  }
}
