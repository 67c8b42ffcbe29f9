package graft.analysis

import com.ibm.icu.text.{BreakIterator, Normalizer2}
import com.ibm.icu.util.ULocale

/** One analyzed token: normalized term + position + character offsets into the
  * ORIGINAL (pre-char-filter) text, so highlighting can wrap the source string
  * (reference: OpenSearch `highlight` with whole-field fragments,
  * backend/search/index_searcher.py:194-204).
  *
  * `pos` counts word tokens BEFORE stopword removal, so removing a stopword
  * leaves a position gap — matching Lucene's StopFilter position-increment
  * semantics that `match_phrase` relies on.
  */
case class Token(term: String, pos: Int, startOffset: Int, endOffset: Int)

/** The analysis chain of the reference, re-implemented natively.
  *
  * Reference contract (configs/opensearch-config.yaml:88-114):
  *   char_filter (hindi_nasal_normalizer / gujarati_nasal_normalizer,
  *   opensearch-config.yaml:7-86) → icu_tokenizer → lowercase →
  *   icu_normalizer nfkc_cf → language stop set (hindi_stop = `_hindi_`,
  *   gujarati_stop = `_gujarati_`, :105-111; the granth mixed analyzer uses an
  *   explicit stoplist, :245-285).
  *
  * Implementation notes:
  *  - NFKC_CF includes Unicode case-folding, which subsumes the `lowercase`
  *    filter; we apply nfkc_cf once (icu4j Normalizer2.getNFKCCasefoldInstance).
  *  - The ICU tokenizer is icu4j's word BreakIterator (root locale); segments
  *    whose rule status is WORD_NONE (pure punctuation/space) are dropped,
  *    like Lucene's ICUTokenizer.
  *  - The Gujarati mapping table reproduces the reference VERBATIM, including
  *    its quirks: a Devanagari row `न्छ => ंछ` inside the Gujarati table and a
  *    Devanagari anusvara in `મ્ફ => ंફ` (opensearch-config.yaml:66,76) — we
  *    match the reference's behavior, not what it plausibly intended.
  *  - Lucene has no `_gujarati_` stop set; the reference names one anyway. We
  *    use the Gujarati half of the reference's own explicit mixed stoplist
  *    (opensearch-config.yaml:268-285) as the documented `_gujarati_` set.
  *
  * Everything is compiled-in constant data: deterministic, versioned,
  * serializable into Spark tasks (object = per-JVM singleton).
  */
object Analyzer extends Serializable {

  /** hindi_nasal_normalizer — opensearch-config.yaml:9-54, verbatim. */
  val HindiNasalMappings: Array[(String, String)] = Array(
    // N-based conjuncts (न)
    "न्त" -> "ंत", "न्थ" -> "ंथ", "न्द" -> "ंद", "न्ध" -> "ंध", "न्न" -> "ंन",
    "न्स" -> "ंस", "न्श" -> "ंश", "न्ह" -> "ंह", "न्य" -> "ंय", "न्व" -> "ंव",
    "न्ल" -> "ंल", "न्र" -> "ंर", "न्च" -> "ंच", "न्छ" -> "ंछ", "न्ज" -> "ंज",
    "न्झ" -> "ंझ", "न्क" -> "ंक", "न्ख" -> "ंख", "न्ग" -> "ंग", "न्घ" -> "ंघ",
    // NN-based conjuncts (ण)
    "ण्ट" -> "ंट", "ण्ठ" -> "ंठ", "ण्ड" -> "ंड", "ण्ढ" -> "ंढ", "ण्ण" -> "ंण",
    // M-based conjuncts (म)
    "म्प" -> "ंप", "म्फ" -> "ंफ", "म्ब" -> "ंब", "म्भ" -> "ंभ", "म्म" -> "ंम",
    // Velar nasal (ङ्)
    "ङ्क" -> "ंक", "ङ्ख" -> "ंख", "ङ्ग" -> "ंग", "ङ्घ" -> "ंघ",
    // Palatal nasal (ञ्)
    "ञ्च" -> "ंच", "ञ्छ" -> "ंछ", "ञ्ज" -> "ंज", "ञ्झ" -> "ंझ")

  /** gujarati_nasal_normalizer — opensearch-config.yaml:56-86, verbatim
    * including the reference's quirks (see scaladoc above).
    */
  val GujaratiNasalMappings: Array[(String, String)] = Array(
    "ન્ત" -> "ંત", "ન્થ" -> "ંથ", "ન્દ" -> "ંદ", "ન્ધ" -> "ંધ", "ન્ન" -> "ંન",
    "ન્સ" -> "ંસ", "ન્શ" -> "ંશ", "ન્ચ" -> "ંચ",
    "न्छ" -> "ंछ", // Devanagari row in the Gujarati table (reference quirk)
    "ન્જ" -> "ંજ", "ન્ઝ" -> "ંઝ", "ન્ક" -> "ંક", "ન્ખ" -> "ંખ", "ન્ગ" -> "ંગ",
    "ન્ઘ" -> "ંઘ",
    "મ્પ" -> "ંપ",
    "મ્ફ" -> "ंફ", // Devanagari anusvara target (reference quirk)
    "મ્બ" -> "ંબ", "મ્ભ" -> "ંભ", "મ્મ" -> "ંમ",
    "ણ્ટ" -> "ંટ", "ણ્ઠ" -> "ંઠ", "ણ્ડ" -> "ંડ", "ણ્ઢ" -> "ંઢ", "ણ્ણ" -> "ંણ")

  /** `_hindi_` stop set — derived from Lucene analysis-common's Hindi
    * stopwords file (public Apache Lucene resource), which the reference pulls
    * in via `stopwords: "_hindi_"` (opensearch-config.yaml:105-107).
    */
  private val HindiStopRaw: Array[String] =
    ("के का एक में की है यह और से हैं को पर इस होता कि जो कर मे गया करने किया लिये " +
      "अपने ने बनी नहीं तो ही या एवं दिया हो इसका था द्वारा हुआ तक साथ करना वाले बाद " +
      "लिए आप कुछ सकते किसी ये इसके सबसे इसमें थे दो होने वह वे करते बहुत कहा वर्ग कई " +
      "करें होती अपनी उनके थी यदि हुई जा ना इसे कहते जब होते कोई हुए व न अभी जैसे सभी " +
      "करता उनकी तरह उस आदि कुल एस रहा इसकी सकता रहे उनका इसी रखें अपना पे उसके").split(" ")

  /** `_gujarati_` stop set — Gujarati half of the reference's explicit mixed
    * stoplist (opensearch-config.yaml:268-285); Lucene has no Gujarati preset.
    */
  private val GujaratiStopRaw: Array[String] = Array(
    "અને", "કે", "છે", "નો", "ની", "ના", "ને", "માં", "થી", "પર", "માટે",
    "સુધી", "સાથે", "વિના", "પોતાના", "પોતાની", "પોતાનો")

  /** mixed_indic_stop — opensearch-config.yaml:248-285 (granth analyzer). */
  private val MixedStopRaw: Array[String] = Array(
    "और", "या", "है", "हैं", "का", "की", "के", "को", "में", "से", "पर",
    "के लिए", "तक", "साथ", "बिना", "अपने", "अपना", "अपनी") ++ GujaratiStopRaw

  private val nfkcCf: Normalizer2 = Normalizer2.getNFKCCasefoldInstance

  /** Normalize a stop entry the same way tokens are normalized. */
  private def normSet(raw: Array[String]): Set[String] =
    raw.map(nfkcCf.normalize).toSet

  val HindiStop: Set[String] = normSet(HindiStopRaw)
  val GujaratiStop: Set[String] = normSet(GujaratiStopRaw)
  val MixedStop: Set[String] = normSet(MixedStopRaw)

  // mapping tables keyed by 3-char source sequences (consonant+virama+consonant)
  private val hindiMap: Map[String, String] = HindiNasalMappings.toMap
  private val gujaratiMap: Map[String, String] = GujaratiNasalMappings.toMap
  private val mixedMap: Map[String, String] = (HindiNasalMappings ++ GujaratiNasalMappings).toMap

  /** Apply a mapping char filter; returns (filtered text, offset map) where
    * offsets(i) = index in the ORIGINAL text of filtered char i. Greedy
    * left-to-right scan of EXACTLY-3-UTF-16-char source keys (the
    * consonant+virama+consonant shape every built-in table uses — a key of
    * any other length is never matched), mirroring Lucene MappingCharFilter
    * over this table family.
    */
  // first chars of any mapping source, per table — cheap guard that avoids a
  // substring allocation per scanned character on the hot path. Precomputed
  // per known table and matched by REFERENCE (a map-keyed cache would hash
  // the whole unordered map on every charFilter call — per-document cost on
  // the build's hottest loop)
  private lazy val hindiStarts: Set[Char] = hindiMap.keySet.map(_.charAt(0))
  private lazy val gujaratiStarts: Set[Char] = gujaratiMap.keySet.map(_.charAt(0))
  private lazy val mixedStarts: Set[Char] = mixedMap.keySet.map(_.charAt(0))
  private def firstChars(table: Map[String, String]): Set[Char] =
    if (table eq hindiMap) hindiStarts
    else if (table eq gujaratiMap) gujaratiStarts
    else if (table eq mixedMap) mixedStarts
    else table.keySet.map(_.charAt(0))

  def charFilter(text: String, table: Map[String, String]): (String, Array[Int]) = {
    if (table.isEmpty) return (text, null)
    val starts = firstChars(table)
    // fast path: no mapping can apply → no rewrite, identity offsets
    var any = false
    var j = 0
    while (!any && j < text.length) { if (starts.contains(text.charAt(j))) any = true; j += 1 }
    if (!any) return (text, null)
    val sb = new java.lang.StringBuilder(text.length)
    // grows if needed: the built-in tables only shrink (target ≤ source),
    // but charFilter is public with an arbitrary table — an overflow that
    // silently stopped recording offsets would desync text from offsets and
    // point every later highlight at the wrong original characters
    var offs = new Array[Int](text.length + 8)
    var n = 0
    def put(c: Char, orig: Int): Unit = {
      if (n >= offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
      sb.append(c)
      offs(n) = orig
      n += 1
    }
    var i = 0
    while (i < text.length) {
      if (i + 3 <= text.length && starts.contains(text.charAt(i))) {
        val repl = table.getOrElse(text.substring(i, i + 3), null)
        if (repl != null) {
          var k = 0
          while (k < repl.length) { put(repl.charAt(k), i); k += 1 }
          i += 3
        } else { put(text.charAt(i), i); i += 1 }
      } else { put(text.charAt(i), i); i += 1 }
    }
    (sb.toString, java.util.Arrays.copyOf(offs, n))
  }

  // BreakIterator is mutable/stateful → one per thread.
  private val wordBreaker = new ThreadLocal[BreakIterator] {
    override def initialValue(): BreakIterator =
      BreakIterator.getWordInstance(ULocale.ROOT)
  }

  private def tableFor(lang: String): Map[String, String] = lang match {
    case "hi"    => hindiMap
    case "gu"    => gujaratiMap
    case "mixed" => mixedMap
    case _       => Map.empty
  }

  private def stopFor(lang: String): Set[String] = lang match {
    case "hi"    => HindiStop
    case "gu"    => GujaratiStop
    case "mixed" => MixedStop
    case _       => Set.empty
  }

  /** The one analysis loop — every consumer goes through this callback so
    * the chain has a single semantic source (rank-parity contract). The
    * index-build hot path uses it directly to skip the per-token `Token`
    * allocations of [[analyze]].
    */
  def foreachToken(text: String, lang: String)(
      f: (String, Int, Int, Int) => Unit): Unit = {
    if (text == null || text.isEmpty) return
    val (filtered, offs) = charFilter(text, tableFor(lang))
    val stop = stopFor(lang)
    val bi = wordBreaker.get()
    bi.setText(filtered)
    var pos = 0
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      if (bi.getRuleStatus != BreakIterator.WORD_NONE) {
        val raw = filtered.substring(start, end)
        // isNormalized is allocation-free; most tokens (already lowercase,
        // already NFC) skip the normalize pass entirely
        val term = if (nfkcCf.isNormalized(raw)) raw else nfkcCf.normalize(raw)
        if (term.nonEmpty) {
          if (!stop.contains(term)) {
            val oStart = if (offs == null) start else offs(start)
            val oEnd =
              if (offs == null) end
              else if (end < offs.length) offs(end)
              else text.length
            f(term, pos, oStart, oEnd)
          }
          pos += 1 // stopwords consume a position (Lucene gap semantics)
        }
      }
      start = end
      end = bi.next()
    }
  }

  /** Full analysis chain. Deterministic, pure. */
  def analyze(text: String, lang: String): Array[Token] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[Token](text.length / 6 + 4)
    foreachToken(text, lang)((term, pos, oStart, oEnd) =>
      out += Token(term, pos, oStart, oEnd))
    out.toArray
  }

  /** Terms only (no offsets) — the common index-build path. Straight to
    * foreachToken: routing through analyze() would pay a Token allocation
    * per token plus a second array copy on the hottest per-document loop.
    *
    * BM25 field length dl = `terms(text, lang).length` — tokens AFTER stop
    * removal, matching Lucene (whose norm counts the tokens the index
    * actually stores); the oracle scorer uses the same definition and rank
    * parity gates on it.
    */
  def terms(text: String, lang: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[String](text.length / 6 + 4)
    foreachToken(text, lang)((term, _, _, _) => out += term)
    out.toArray
  }
}
