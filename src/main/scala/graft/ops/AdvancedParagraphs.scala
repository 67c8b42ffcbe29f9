package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ADVANCED paragraph pipeline — its hardest stateful logic
  * (SURVEY §2.3 T3-T5, §2.2 F6, §2.5 A4), re-expressed Spark-first:
  *
  *  - **A4 page-margin statistics** (advanced_pdf_processor.py:148-167):
  *    declarative groupBy/agg — avg margins, prose margins = avg of the two
  *    extreme x values (median fallback below 4 lines).
  *  - **F6 line classification** (paragraph_generator/advanced.py:64-139):
  *    a `withColumn` battery of boolean tag expressions (margin arithmetic,
  *    prefix tests, regexes) — pure Catalyst, whole-stage-codegen'd.
  *  - **T3 line→paragraph state machine** (advanced.py:144-312): 3-state FSM
  *    (STANDARD_PROSE / VERSE_BLOCK / QA_BLOCK) with reprocess-on-transition,
  *    run per (doc, page) via `groupByKey.flatMapGroups` — the classification
  *    is precomputed declaratively; only the order-dependent fold is typed.
  *  - **T4 combine-by-type** (advanced.py:424-466): merge consecutive
  *    VERSE_BLOCKs / QA_BLOCKs with `\n`.
  *  - **T5 combine-prose-until-punct** (advanced.py:468-531): QA-start pulls
  *    following prose until a punctuation suffix; prose-start breaks on QA;
  *    verse always breaks.
  *
  * T4+T5 run over the whole document (the reference concatenates per-page
  * phase-1 output before phases 2-3, advanced.py:342-353), so they share one
  * `groupByKey(docId)` fold. Each group is one document's lines — bounded,
  * memory-safe at any corpus scale; parallelism is across documents.
  */
object AdvancedParagraphs {

  /** Raw OCR line (reference JSON schema, advanced_pdf_processor.py:178-187). */
  case class OcrLine(docId: Long, page: Int, lineNum: Int, text: String,
      xStart: Int, xEnd: Int)

  /** F5 OCR confidence filter (advanced_pdf_processor.py:111-112):
    * `dropna(subset=['text'])` + `conf > 10`, applied to the raw OCR table
    * BEFORE classification — low-confidence junk never enters the paragraph
    * pipeline. Pure Column predicate, so at scale it runs inside the scan
    * stage (pushed ahead of the one docId exchange).
    */
  def confidenceFilter(df: org.apache.spark.sql.DataFrame,
      confCol: String = "conf", textCol: String = "text"): org.apache.spark.sql.DataFrame =
    df.where(org.apache.spark.sql.functions.col(textCol).isNotNull &&
      org.apache.spark.sql.functions.col(confCol) > 10)

  /** F6 output: line + precomputed classification tags. */
  case class TaggedLine(docId: Long, page: Int, lineNum: Int, text: String,
      isEmpty: Boolean, isCentered: Boolean, isIndented: Boolean,
      isNotRightJustified: Boolean, isHeaderRegex: Boolean, isQa: Boolean,
      isHeading: Boolean, hasSentenceTerminator: Boolean,
      isAbsoluteTerminator: Boolean)

  /** Phase-1 output: a typed paragraph (ptype ∈ PROSE | VERSE | QA). */
  case class TypedPara(docId: Long, page: Int, startLine: Int, endLine: Int,
      ptype: String, text: String)

  case class FinalPara(docId: Long, page: Int, paraId: Int, text: String)

  /** Per-language knobs (language_meta.py:85-137; classifier defaults
    * advanced.py:69-79). `headingMarkers` is empty in the reference
    * (HEADING_MARKERS = (), advanced.py:48).
    */
  case class Config(
      indentThreshold: Int = 15,
      centerThreshold: Int = 20,
      headerRegexes: Seq[String] = Nil,
      questionPrefixes: Seq[String] = Seq("प्रश्न:", "प्रश्न :"),
      answerPrefixes: Seq[String] = Seq("उत्तर:", "उत्तर :"),
      headingMarkers: Seq[String] = Nil,
      sentenceTerminators: Seq[String] = Seq("।", "?", "!", "।।", ")", "]", "}"),
      punctuationSuffixes: Seq[String] = Seq("।", "?", "!", ":", ")", "]", "}"))

  val Hindi: Config = Config()
  val Gujarati: Config = Config(
    questionPrefixes = Seq("શ્રોતા:", "પૂજ્ય ગુરુદેવશ્રી:", "મુમુક્ષુ:", "શંકા:", "પ્રશ્ન:"),
    answerPrefixes = Seq("સમાધાન:", "ઉત્તર:"),
    sentenceTerminators = Seq("।", ".", "?", "!", "।।", ")", "]", "}"),
    punctuationSuffixes = Seq("।", ".", "?", "!", ":", ")", "]", "}"))

  // ------------------------------------------------------------------
  // A4: page margin statistics (declarative)
  // ------------------------------------------------------------------
  /** Per-(doc,page) margin stats. Prose margins: avg of the 2 smallest left /
    * 2 largest right x values; upper median when fewer than 4 lines
    * (advanced_pdf_processor.py:148-167). Input columns:
    * (docId, page, xStart, xEnd).
    */
  def pageMargins(lines: DataFrame): DataFrame = {
    // 0-indexed sorted[n/2] → 1-indexed element floor(n/2)+1
    def upperMedian(sorted: Column, n: Column): Column =
      element_at(sorted, (floor(n / 2) + 1).cast("int")).cast("double")
    lines
      .groupBy("docId", "page")
      .agg(
        avg("xStart").as("avgLeft"), avg("xEnd").as("avgRight"),
        sort_array(collect_list(col("xStart"))).as("ls"),
        sort_array(collect_list(col("xEnd"))).as("rs"),
        count(lit(1)).as("n"))
      .select(col("docId"), col("page"), col("avgLeft"), col("avgRight"),
        when(col("n") < 4, upperMedian(col("ls"), col("n")))
          .otherwise((element_at(col("ls"), 1) + element_at(col("ls"), 2)) / 2.0)
          .as("proseLeft"),
        when(col("n") < 4, upperMedian(col("rs"), col("n")))
          .otherwise((element_at(col("rs"), -1) + element_at(col("rs"), -2)) / 2.0)
          .as("proseRight"))
  }

  // ------------------------------------------------------------------
  // F6: line classification (declarative tag battery)
  // ------------------------------------------------------------------
  /** Tag every line against its page's prose margins (advanced.py:81-139).
    * Tag semantics ported exactly: IS_CENTERED and IS_INDENTED are mutually
    * exclusive (elif); an empty line carries ONLY IS_EMPTY; short centered
    * lines (≤10 chars) count as header regex hits.
    */
  def classify(spark: SparkSession, lines: Dataset[OcrLine], cfg: Config): Dataset[TaggedLine] = {
    import spark.implicits._
    def anyOf(cs: Seq[Column]): Column = cs.reduceOption(_ || _).getOrElse(lit(false))
    val margins = pageMargins(lines.toDF())
    val j = lines.toDF().join(margins, Seq("docId", "page"))
    val stripped = trim(col("text"))
    val isEmpty = length(stripped) === 0
    val indentedRaw = (col("xStart") - col("proseLeft")) > cfg.indentThreshold
    val rightIndent = col("proseRight") - col("xEnd")
    val isCentered = indentedRaw && rightIndent > cfg.centerThreshold
    val notEmpty = !isEmpty
    j.select(col("docId"), col("page"), col("lineNum"), col("text"),
        isEmpty.as("isEmpty"),
        (notEmpty && isCentered).as("isCentered"),
        (notEmpty && indentedRaw && !isCentered).as("isIndented"),
        (notEmpty && rightIndent > cfg.indentThreshold).as("isNotRightJustified"),
        (notEmpty && ((isCentered && length(stripped) <= 10) ||
          anyOf(cfg.headerRegexes.map(r => stripped.rlike(r))))).as("isHeaderRegex"),
        (notEmpty && anyOf((cfg.questionPrefixes ++ cfg.answerPrefixes)
          .map(p => stripped.startsWith(p)))).as("isQa"),
        (notEmpty && anyOf(cfg.headingMarkers.map(p => stripped.startsWith(p))))
          .as("isHeading"),
        (notEmpty && anyOf(cfg.sentenceTerminators.map(t => stripped.endsWith(t))))
          .as("hasSentenceTerminator"),
        (notEmpty && stripped.rlike("।।\\d+।।$")).as("isAbsoluteTerminator"))
      .as[TaggedLine]
  }

  // NOTE on the empty-line tag semantics above vs the reference: the
  // reference tags margins (IS_CENTERED etc.) before the empty check but its
  // FSM drops IS_EMPTY lines before reading any other tag
  // (advanced.py:183-184), so suppressing the other tags here is
  // behavior-identical and keeps the battery branch-free.

  // ------------------------------------------------------------------
  // T3: the 3-state FSM, per (doc, page)
  // ------------------------------------------------------------------
  private final val Prose = "PROSE"
  private final val Verse = "VERSE"
  private final val Qa = "QA"

  /** Exact port of ParagraphGenerator (advanced.py:144-312): a fresh FSM per
    * page (the reference constructs one per page, advanced.py:400); verse and
    * QA paragraphs join lines with '\n', prose with ' '.
    */
  private def runFsm(lines: Array[TaggedLine]): Seq[TypedPara] = {
    val out = scala.collection.mutable.ArrayBuffer[TypedPara]()
    var state = Prose
    var buf = scala.collection.mutable.ArrayBuffer[TaggedLine]()
    var startLine = -1

    def finalize(): Unit = {
      if (buf.nonEmpty) {
        val sep = if (state == Verse || state == Qa) "\n" else " "
        val text = buf.iterator.map(_.text.trim).mkString(sep).trim
        if (text.nonEmpty)
          out += TypedPara(buf.head.docId, buf.head.page, startLine,
            buf.last.lineNum, state, text)
        buf.clear()
        startLine = -1
      }
    }
    def reset(l: TaggedLine): Unit = { buf.clear(); startLine = l.lineNum }

    def handleProse(l: TaggedLine): Boolean = {
      if (l.isHeading) {
        finalize(); reset(l); buf += l; finalize(); false
      } else if (l.isAbsoluteTerminator) {
        if (buf.isEmpty) reset(l)
        buf += l; finalize(); false
      } else if (l.isQa) {
        finalize(); reset(l); state = Qa; true
      } else if (l.isCentered) {
        finalize(); reset(l); state = Verse; true
      } else if (l.isIndented) {
        finalize(); reset(l); buf += l; false
      } else {
        if (buf.isEmpty) startLine = l.lineNum
        buf += l
        if (l.hasSentenceTerminator && l.isNotRightJustified) finalize()
        false
      }
    }
    def handleVerse(l: TaggedLine): Boolean = {
      if (l.isCentered) { buf += l; false }
      else { finalize(); reset(l); state = Prose; true }
    }
    def handleQa(l: TaggedLine): Boolean = {
      if (l.isHeading) { finalize(); reset(l); state = Prose; true }
      else if (l.isAbsoluteTerminator) {
        if (buf.isEmpty) reset(l)
        buf += l; finalize(); state = Prose; false
      } else if (l.isQa) { finalize(); reset(l); buf += l; false }
      else if (l.isCentered) { finalize(); reset(l); state = Verse; true }
      else if (l.isIndented) { finalize(); reset(l); state = Prose; true }
      else {
        if (buf.isEmpty) startLine = l.lineNum
        buf += l; false
      }
    }

    lines.foreach { l =>
      if (!l.isEmpty) {
        if (l.isHeaderRegex) { finalize(); buf.clear(); startLine = -1; state = Prose }
        else {
          var reprocess = true
          while (reprocess)
            reprocess = state match {
              case Prose => handleProse(l)
              case Verse => handleVerse(l)
              case Qa => handleQa(l)
            }
        }
      }
    }
    finalize()
    out.toSeq
  }

  /** Phase 1: classified lines → typed paragraphs, per (doc, page). */
  def phase1(spark: SparkSession, tagged: Dataset[TaggedLine]): Dataset[TypedPara] = {
    import spark.implicits._
    tagged
      .groupByKey(l => (l.docId, l.page))
      .flatMapGroups { (_, it: Iterator[TaggedLine]) =>
        runFsm(it.toArray.sortBy(_.lineNum))
      }
  }

  // ------------------------------------------------------------------
  // T4 + T5: per-document combine folds (advanced.py:424-531)
  // ------------------------------------------------------------------
  private def phase2CombineByType(paras: Seq[TypedPara]): Seq[TypedPara] = {
    val out = scala.collection.mutable.ArrayBuffer[TypedPara]()
    var i = 0
    while (i < paras.length) {
      val p = paras(i)
      if (p.ptype == Verse || p.ptype == Qa) {
        var j = i + 1
        val texts = scala.collection.mutable.ArrayBuffer(p.text)
        while (j < paras.length && paras(j).ptype == p.ptype) {
          texts += paras(j).text; j += 1
        }
        out += p.copy(text = texts.mkString("\n"), endLine = paras(j - 1).endLine)
        i = j
      } else { out += p; i += 1 }
    }
    out.toSeq
  }

  private def phase3CombineProse(paras: Seq[TypedPara],
      punctSuffixes: Seq[String]): Seq[(Int, String)] = {
    def endsPunct(s: String): Boolean = {
      val t = s.trim; punctSuffixes.exists(t.endsWith)
    }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    var i = 0
    while (i < paras.length) {
      val p = paras(i)
      if (p.ptype == Verse) { out += ((p.page, p.text)); i += 1 }
      else {
        val buffer = scala.collection.mutable.ArrayBuffer(p.text)
        val startingType = p.ptype
        i += 1
        var done = false
        while (!done && i < paras.length) {
          val n = paras(i)
          if (n.ptype == Verse) done = true
          else if (startingType == Prose && n.ptype == Qa) done = true
          else if (endsPunct(buffer.last)) done = true
          else {
            buffer += n.text; i += 1
            if (endsPunct(n.text)) done = true
          }
        }
        out += ((p.page, buffer.mkString(" ")))
      }
    }
    out.toSeq
  }

  /** ONE copy of the per-doc tail (phase3 ∘ phase2 → numbered FinalParas) —
    * shared by the staged [[combine]] and the fused [[generate]] so a
    * numbering/attribution change can never silently diverge between them
    * (the "fused == staged" spec guards the pair).
    */
  private def finishDoc(docId: Long, typed: Seq[TypedPara], cfg: Config): Seq[FinalPara] =
    phase3CombineProse(phase2CombineByType(typed), cfg.punctuationSuffixes)
      .zipWithIndex
      .map { case ((page, text), idx) => FinalPara(docId, page, idx, text) }

  /** Phases 2+3 over the whole document in (page, startLine) order. */
  def combine(spark: SparkSession, typed: Dataset[TypedPara], cfg: Config): Dataset[FinalPara] = {
    import spark.implicits._
    typed
      .groupByKey(_.docId)
      .flatMapGroups { (docId: Long, it: Iterator[TypedPara]) =>
        val sorted = it.toArray.sortBy(p => (p.page, p.startLine))
        finishDoc(docId, sorted.toSeq, cfg)
      }
  }

  /** End-to-end: raw OCR lines → final (page, paragraph) rows.
    *
    * Single shuffle: one exchange on docId serves both the per-page FSM
    * (pages are split inside the doc group) and the cross-page combine
    * phases — vs the two exchanges of `combine(phase1(...))`. Documents are
    * bounded (thousands of lines), so the per-group sort is safe at any
    * corpus scale; parallelism is across documents.
    */
  def generate(spark: SparkSession, lines: Dataset[OcrLine], cfg: Config): Dataset[FinalPara] = {
    import spark.implicits._
    classify(spark, lines, cfg)
      .groupByKey(_.docId)
      .flatMapGroups { (docId: Long, it: Iterator[TaggedLine]) =>
        val sorted = it.toArray.sortBy(l => (l.page, l.lineNum))
        val typed = scala.collection.mutable.ArrayBuffer[TypedPara]()
        var i = 0
        while (i < sorted.length) {
          var j = i
          while (j < sorted.length && sorted(j).page == sorted(i).page) j += 1
          typed ++= runFsm(java.util.Arrays.copyOfRange(sorted, i, j))
          i = j
        }
        finishDoc(docId, typed.toSeq, cfg)
      }
  }
}
