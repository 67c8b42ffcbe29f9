package graft.langtools

/** Transliteration variant generation + the 3-phase best-match flow —
  * reference `backend/langtools/transliterate.py`.
  *
  * The reference generates candidate Devanagari/Gujarati spellings of a
  * romanized word by calling an external transliteration API
  * (transliterate.py:33-99) — a model-dependent service. Here variant
  * generation is a deterministic rule engine: the romanized word is parsed
  * into consonant/vowel units (longest match first) and each unit expands to
  * its ranked alternative renderings; candidates are enumerated in cost order
  * (sum of alternative ranks — "most standard spelling first"), exactly top-k.
  *
  * The 3-phase lookup flow (transliterate.py:207-323) is faithful:
  *   Phase 1 — query the index for the top-5 variants; return hits if any.
  *   Phase 2 — expand to top-10, query only the 5 NEW variants.
  *   Phase 3 — run the spelling suggester over every top-10 variant, collect
  *             suggested terms, query those.
  * Results are (variant, frequency) with frequency > 0, sorted by frequency
  * descending (ties: variant asc, for determinism).
  */
object Transliterate {

  /** One romanization unit: the latin key and its ranked renderings. */
  private type Rules = Seq[(String, Seq[String])]

  // --- Devanagari (hi) -----------------------------------------------------
  // consonants (longest keys first at parse time)
  private val hiCons: Rules = Seq(
    "chh" -> Seq("छ"), "kh" -> Seq("ख"), "gh" -> Seq("घ"), "ch" -> Seq("च"),
    "jh" -> Seq("झ"), "th" -> Seq("थ", "ठ"), "dh" -> Seq("ध", "ढ"),
    "ph" -> Seq("फ"), "bh" -> Seq("भ"), "sh" -> Seq("श", "ष"),
    "k" -> Seq("क"), "g" -> Seq("ग"), "j" -> Seq("ज"), "t" -> Seq("त", "ट"),
    "d" -> Seq("द", "ड"), "n" -> Seq("न", "ण"), "p" -> Seq("प"),
    "b" -> Seq("ब"), "m" -> Seq("म"), "y" -> Seq("य"), "r" -> Seq("र"),
    "l" -> Seq("ल"), "v" -> Seq("व"), "w" -> Seq("व"), "s" -> Seq("स"),
    "h" -> Seq("ह"))
  // vowel matras after a consonant ("" = inherent a)
  private val hiMatras: Rules = Seq(
    "aa" -> Seq("ा"), "ai" -> Seq("ै"), "au" -> Seq("ौ"), "ee" -> Seq("ी"),
    "oo" -> Seq("ू"), "a" -> Seq("", "ा"), "i" -> Seq("ि", "ी"),
    "u" -> Seq("ु", "ू"), "e" -> Seq("े"), "o" -> Seq("ो"))
  // independent vowels at word start
  private val hiVowels: Rules = Seq(
    "aa" -> Seq("आ"), "ai" -> Seq("ऐ"), "au" -> Seq("औ"), "ee" -> Seq("ई"),
    "oo" -> Seq("ऊ"), "a" -> Seq("अ"), "i" -> Seq("इ"), "u" -> Seq("उ"),
    "e" -> Seq("ए"), "o" -> Seq("ओ"))

  // --- Gujarati (gu) -------------------------------------------------------
  private val guCons: Rules = Seq(
    "chh" -> Seq("છ"), "kh" -> Seq("ખ"), "gh" -> Seq("ઘ"), "ch" -> Seq("ચ"),
    "jh" -> Seq("ઝ"), "th" -> Seq("થ", "ઠ"), "dh" -> Seq("ધ", "ઢ"),
    "ph" -> Seq("ફ"), "bh" -> Seq("ભ"), "sh" -> Seq("શ", "ષ"),
    "k" -> Seq("ક"), "g" -> Seq("ગ"), "j" -> Seq("જ"), "t" -> Seq("ત", "ટ"),
    "d" -> Seq("દ", "ડ"), "n" -> Seq("ન", "ણ"), "p" -> Seq("પ"),
    "b" -> Seq("બ"), "m" -> Seq("મ"), "y" -> Seq("ય"), "r" -> Seq("ર"),
    "l" -> Seq("લ"), "v" -> Seq("વ"), "w" -> Seq("વ"), "s" -> Seq("સ"),
    "h" -> Seq("હ"))
  private val guMatras: Rules = Seq(
    "aa" -> Seq("ા"), "ai" -> Seq("ૈ"), "au" -> Seq("ૌ"), "ee" -> Seq("ી"),
    "oo" -> Seq("ૂ"), "a" -> Seq("", "ા"), "i" -> Seq("િ", "ી"),
    "u" -> Seq("ુ", "ૂ"), "e" -> Seq("ે"), "o" -> Seq("ો"))
  private val guVowels: Rules = Seq(
    "aa" -> Seq("આ"), "ai" -> Seq("ઐ"), "au" -> Seq("ઔ"), "ee" -> Seq("ઈ"),
    "oo" -> Seq("ઊ"), "a" -> Seq("અ"), "i" -> Seq("ઇ"), "u" -> Seq("ઉ"),
    "e" -> Seq("એ"), "o" -> Seq("ઓ"))

  // --- "latin" ambiguity mode: vowel-length alternatives over ASCII --------
  // (used where the corpus itself is romanized — lets an external SQL oracle
  // replicate the downstream phase flow with inlined variant literals)
  private val latinVowels: Rules = Seq(
    "aa" -> Seq("aa", "a"), "ee" -> Seq("ee", "i"), "oo" -> Seq("oo", "u"),
    "ii" -> Seq("ii", "i"), "uu" -> Seq("uu", "u"),
    "a" -> Seq("a", "aa"), "i" -> Seq("i", "ee"), "u" -> Seq("u", "oo"),
    "e" -> Seq("e"), "o" -> Seq("o"))

  private def isVowel(c: Char): Boolean = "aeiou".indexOf(c) >= 0

  /** Parse into units and expand: returns candidates ranked by total
    * alternative cost (then lexicographic), truncated to topk, deduped.
    */
  def variants(word: String, lang: String, topk: Int): Seq[String] = {
    val w = word.toLowerCase(java.util.Locale.ROOT)
    if (w.isEmpty) return Nil
    val (cons, matras, vowels) = lang match {
      case "hi" => (hiCons, hiMatras, hiVowels)
      case "gu" => (guCons, guMatras, guVowels)
      case _    => (Seq.empty: Rules, latinVowels, latinVowels)
    }
    // a query "word" beyond any plausible romanization is adversarial
    // input (a pasted blob reaching the per-query-word variant path):
    // candidate strings grow O(len) each and every position holds `beam`
    // of them, so even the bounded enumeration is O(len² · beam) bytes.
    // Pass it through unexpanded — no real transliteration target exists.
    if (w.length > MaxVariantWordLen) return Seq(w)
    // enumerate (candidate, cost) per suffix position with longest-match,
    // BOUNDED: each position keeps only its `beam` best tails by (cost,
    // string). Costs are per-unit additive and suffix-independent, so
    // k-best composition is exact when beam >= topk — an unbounded
    // enumeration would materialize the full alternative cross-product
    // (4^units) before sorting, an OOM on adversarial query input.
    // Computed BOTTOM-UP (pos = len → 0), not by recursion: recursive
    // descent is one stack frame per unit, and a long word would
    // StackOverflow the query thread instead of returning top-k.
    val beam = math.max(topk, 16)
    val memo = new Array[Seq[(String, Int)]](w.length + 1)
    memo(w.length) = Seq(("", 0))
    def step(pos: Int, atStart: Boolean): Seq[(String, Int)] = {
      val table: Rules =
        if (isVowel(w.charAt(pos))) { if (atStart) vowels else matras }
        else cons
      val hit = table.find { case (k, _) => w.startsWith(k, pos) }
      val all = hit match {
        case Some((k, alts)) =>
          val rest = memo(pos + k.length)
          for {
            (alt, ai) <- alts.zipWithIndex
            (tail, c) <- rest
          } yield (alt + tail, ai + c)
        case None =>
          // unknown char: pass through verbatim (lang != latin keeps it —
          // matches how a human would leave unmapped characters)
          memo(pos + 1).map { case (t, c) => (w.charAt(pos) + t, c) }
      }
      // dedup by string keeping the cheapest cost (the final ordering and
      // distinct only ever use a string's minimum cost)
      all.groupBy(_._1).view
        .map { case (s, es) => (s, es.iterator.map(_._2).min) }.toSeq
        .sortBy { case (v, c) => (c, v) }.take(beam)
    }
    var pos = w.length - 1
    while (pos >= 1) { memo(pos) = step(pos, atStart = false); pos -= 1 }
    step(0, atStart = true)
      .sortBy { case (v, c) => (c, v) }
      .map(_._1)
      .distinct
      .take(topk)
  }

  /** Longest input [[variants]] will expand (identity pass-through above it).
    * Real romanized words are tens of chars; the cap only exists to bound
    * the O(len² · beam) candidate bytes on pasted-blob input.
    */
  val MaxVariantWordLen = 256

  /** The 3-phase flow (transliterate.py:207-323), engine-agnostic: `dfOf`
    * returns a term's corpus frequency (hit count of match operator:and ==
    * doc frequency); `suggestFn` is the spelling suggester (min_score 0.5,
    * 3 suggestions — reference call at :288-294).
    */
  def findBestMatches(word: String, lang: String,
      dfOf: Seq[String] => Map[String, Long],
      suggestFn: String => Seq[String]): Seq[(String, Long)] = {
    // dfOf is BATCHED (one lookup per phase, not per variant) so the Spark
    // consumer can serve each phase from one pruned termdict scan — the
    // per-term signature forced SparkEntry to fork this whole flow, leaving
    // two copies of the phase semantics to drift apart
    def query(vs0: Seq[String]): Seq[(String, Long)] = {
      val vs = vs0.distinct
      if (vs.isEmpty) Nil
      else {
        val m = dfOf(vs)
        vs.flatMap(v => m.get(v).filter(_ > 0L).map(v -> _))
          .sortBy { case (v, f) => (-f, v) }
      }
    }
    val top10 = variants(word, lang, 10)
    val p1 = query(top10.take(5))
    if (p1.nonEmpty) return p1
    val p2 = query(top10.drop(5))
    if (p2.nonEmpty) return p2
    val suggested = top10.flatMap(suggestFn).flatMap(_.split("\\s+"))
      .filter(_.nonEmpty).distinct
    query(suggested)
  }
}
