package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.SparkTestSession
import graft.ops.AdvancedParagraphs._

/** Golden tests for the advanced 3-phase paragraph pipeline (T3-T5 + F6 + A4),
  * mirroring the reference FSM semantics (paragraph_generator/advanced.py).
  */
class AdvancedParagraphsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // page geometry: prose body spans x 10..100; centered lines 40..70;
  // indented lines start at 30
  private def L(doc: Long, page: Int, n: Int, text: String,
      xs: Int = 10, xe: Int = 100) = OcrLine(doc, page, n, text, xs, xe)

  test("A4 margins: 2-extreme average, median fallback under 4 lines") {
    val lines = Seq(
      L(1, 1, 0, "a", 10, 100), L(1, 1, 1, "b", 12, 98),
      L(1, 1, 2, "c", 40, 70), L(1, 1, 3, "d", 11, 99),
      L(2, 1, 0, "a", 10, 100), L(2, 1, 1, "b", 20, 90), L(2, 1, 2, "c", 30, 80))
    val m = pageMargins(lines.toDS().toDF()).collect()
      .map(r => (r.getLong(0), (r.getDouble(4), r.getDouble(5)))).toMap
    assert(m(1L) == ((10.5, 99.5))) // (10+11)/2, (100+99)/2
    assert(m(2L) == ((20.0, 90.0))) // 3 lines → upper median (index 1)
  }

  test("F6 tags: centered vs indented exclusive; short centered = header") {
    val lines = Seq(
      L(1, 1, 0, "सामान्य गद्य की पंक्ति है और चलती है", 10, 100),
      L(1, 1, 1, "भी गद्य", 12, 99),
      L(1, 1, 2, "और गद्य", 11, 98),
      L(1, 1, 3, "यह भी सामान्य", 10, 97),
      L(1, 1, 4, "छंद पंक्ति", 40, 70),     // centered
      L(1, 1, 5, "प्रश्न: क्या?", 30, 100),   // indented + QA
      L(1, 1, 6, "★★★", 45, 65),             // short centered → header
      L(1, 1, 7, "", 10, 100))               // empty
    val t = classify(spark, lines.toDS(), Hindi).collect().sortBy(_.lineNum)
    assert(t(4).isCentered && !t(4).isIndented)
    assert(t(5).isIndented && !t(5).isCentered && t(5).isQa)
    assert(t(6).isHeaderRegex)
    assert(t(7).isEmpty && !t(7).isCentered && !t(7).isHeaderRegex)
    assert(t(0).hasSentenceTerminator === false)
  }

  test("T3 FSM: prose finalizes on terminator+short line; verse block on centered") {
    val lines = Seq(
      L(1, 1, 0, "गद्य शुरू होता है"),
      L(1, 1, 1, "और समाप्त होता है।", 10, 60), // terminator + not right-justified
      L(1, 1, 2, "नया गद्य बिना अंत"),
      L(1, 1, 3, "छंद की पहली पंक्ति यहाँ", 40, 70),
      L(1, 1, 4, "छंद की दूसरी पंक्ति यहाँ", 42, 68),
      L(1, 1, 5, "वापस गद्य आया है।", 10, 50))
    val typed = phase1(spark, classify(spark, lines.toDS(), Hindi))
      .collect().sortBy(_.startLine)
    assert(typed.map(_.ptype).toSeq == Seq("PROSE", "PROSE", "VERSE", "PROSE"))
    assert(typed(0).text == "गद्य शुरू होता है और समाप्त होता है।")
    assert(typed(2).text == "छंद की पहली पंक्ति यहाँ\nछंद की दूसरी पंक्ति यहाँ") // \n-joined
  }

  test("T3 FSM: QA block collects until indented prose; header regex skipped") {
    val cfg = Hindi.copy(headerRegexes = Seq("^पृष्ठ \\d+$"))
    val lines = Seq(
      L(1, 1, 0, "पृष्ठ 12"),                  // header → dropped
      L(1, 1, 1, "प्रश्न: आत्मा क्या है"),
      L(1, 1, 2, "जो जानता है"),
      L(1, 1, 3, "उत्तर: ज्ञान स्वरूप"),
      L(1, 1, 4, "नयी बात शुरू", 30, 100),      // indented → exits QA to prose
      L(1, 1, 5, "और खत्म।", 10, 50))
    val typed = phase1(spark, classify(spark, lines.toDS(), cfg))
      .collect().sortBy(_.startLine)
    assert(typed.map(_.ptype).toSeq == Seq("QA", "QA", "PROSE"))
    assert(typed(0).text == "प्रश्न: आत्मा क्या है\nजो जानता है")
    assert(typed(1).text == "उत्तर: ज्ञान स्वरूप")
    assert(typed(2).text == "नयी बात शुरू और खत्म।")
  }

  test("T3 FSM: absolute terminator ends paragraph as last line") {
    val lines = Seq(
      L(1, 1, 0, "गद्य आरम्भ", 10, 100),
      L(1, 1, 1, "छंद की पंक्ति एक", 40, 70),
      L(1, 1, 2, "समाप्ति ।।42।।", 10, 100),
      L(1, 1, 3, "अगला गद्य चलता।", 10, 50))
    val typed = phase1(spark, classify(spark, lines.toDS(), Hindi))
      .collect().sortBy(_.startLine)
    // centered opens VERSE; non-centered abs-terminator exits verse, reprocess
    // in prose appends + finalizes alone
    assert(typed.map(_.ptype).toSeq == Seq("PROSE", "VERSE", "PROSE", "PROSE"))
    assert(typed(1).text == "छंद की पंक्ति एक")
    assert(typed(2).text == "समाप्ति ।।42।।")
  }

  test("T4: consecutive verse blocks merge across pages with newline") {
    val typed = Seq(
      TypedPara(1, 1, 0, 1, "VERSE", "छंद अ"),
      TypedPara(1, 2, 0, 0, "VERSE", "छंद ब"),
      TypedPara(1, 2, 1, 1, "PROSE", "गद्य।")).toDS()
    val out = combine(spark, typed, Hindi).collect().sortBy(_.paraId)
    assert(out.length == 2)
    assert(out(0).text == "छंद अ\nछंद ब" && out(0).page == 1)
    assert(out(1).text == "गद्य।")
  }

  test("T5: QA-start pulls following prose until punctuation; prose-start breaks on QA") {
    val typed = Seq(
      TypedPara(1, 1, 0, 0, "QA", "प्रश्न: क्या"),        // no punct suffix
      TypedPara(1, 1, 1, 1, "PROSE", "अधूरा गद्य"),      // pulled (no punct)
      TypedPara(1, 1, 2, 2, "PROSE", "पूरा हुआ।"),       // pulled, ends with ।
      TypedPara(1, 1, 3, 3, "PROSE", "स्वतंत्र गद्य"),    // new buffer
      TypedPara(1, 1, 4, 4, "QA", "प्रश्न: दूसरा?")).toDS() // breaks prose-start
    val out = combine(spark, typed, Hindi).collect().sortBy(_.paraId)
    assert(out.map(_.text).toSeq == Seq(
      "प्रश्न: क्या अधूरा गद्य पूरा हुआ।",
      "स्वतंत्र गद्य",
      "प्रश्न: दूसरा?"))
  }

  test("fused single-shuffle generate == combine(phase1(classify))") {
    val lines = (0L until 25L).flatMap { d =>
      (0 until 10).map { i =>
        val (xs, xe) =
          if ((d + i) % 6 == 1) (40, 70)
          else if ((d + i) % 4 == 2) (30, 100)
          else (10, if ((d + i) % 3 == 0) 55 else 100)
        OcrLine(d, 1 + i / 5, i % 5,
          s"विभिन्न पाठ पंक्ति $d $i" + (if ((d + i) % 3 == 0) "।" else ""), xs, xe)
      }
    }
    val fused = generate(spark, lines.toDS(), Hindi)
      .collect().sortBy(p => (p.docId, p.paraId))
    val staged = combine(spark, phase1(spark, classify(spark, lines.toDS(), Hindi)), Hindi)
      .collect().sortBy(p => (p.docId, p.paraId))
    assert(fused.nonEmpty && fused.toSeq == staged.toSeq)
  }

  test("end-to-end deterministic under parallelism") {
    val lines = (0L until 40L).flatMap { d =>
      (0 until 12).map { i =>
        val (xs, xe) =
          if ((d + i) % 7 == 3) (40, 70)
          else if ((d + i) % 5 == 2) (30, 100)
          else (10, if ((d + i) % 3 == 0) 60 else 100)
        val txt =
          if ((d + i) % 11 == 5) s"प्रश्न: प्रश्न $d $i"
          else s"पाठ $d $i" + (if ((d + i) % 3 == 0) "।" else "")
        OcrLine(d, 1 + i / 6, i % 6, txt, xs, xe)
      }
    }
    val a = generate(spark, lines.toDS().repartition(1), Hindi)
      .collect().sortBy(p => (p.docId, p.paraId))
    val b = generate(spark, lines.toDS().repartition(16), Hindi)
      .collect().sortBy(p => (p.docId, p.paraId))
    assert(a.length == b.length && a.nonEmpty)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }
}

class TextNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def norm(s: String, typos: Seq[(String, String)] = Nil): String =
    Seq(s).toDF("t").select(TextNormalize.normalize(col("t"), typos)).head.getString(0)

  test("F1: unicode spaces, purn-viram OCR fixes, punctuation spacing") {
    assert(norm("क\u00A0ख\u200Bग\u2009घ") == "क खग घ") // NBSP→sp, ZWSP gone, thin→sp
    assert(norm("वाक्य समाप्त |") == "वाक्य समाप्त।")
    assert(norm("॥ दोहा ॥") == "। दोहा।") // ॥→। then space-before-closing removed
    assert(norm("( खुला ) [ बंद ]") == "(खुला) [बंद]")
    assert(norm("रुकिए ...") == "रुकिए...")
    assert(norm("  बहुत   सारे    स्थान  ") == "बहुत सारे स्थान")
  }

  test("F2: ordered literal typo substitutions") {
    assert(norm("गलत शब्द", Seq("गलत" -> "सही")) == "सही शब्द")
  }

  test("F3: dialogue prefix typos fixed; lines joined except before prefixes") {
    val out = Seq("प्रश: क्या\nजारी\nउत्तर: हाँ").toDF("t")
      .select(TextNormalize.normalizeDialogueHindi(col("t"))).head.getString(0)
    assert(out == "प्रश्न: क्या जारी\nउत्तर: हाँ")
  }

  test("F3 Gujarati: મુમુક્ષુ typo regex; joins preserve dialogue prefixes") {
    val out = Seq("મુમુwક્ષુx: પ્રશ્ન છે\nચાલુ\nસમાધાન: હા").toDF("t")
      .select(TextNormalize.normalizeDialogueGujarati(col("t"))).head.getString(0)
    assert(out == "મુમુક્ષુ: પ્રશ્ન છે ચાલુ\nસમાધાન: હા")
  }
}
