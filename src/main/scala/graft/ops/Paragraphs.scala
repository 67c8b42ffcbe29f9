package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's stateful sequence operators (SURVEY §2.3): ordered,
  * per-document folds that stitch OCR lines into paragraphs.
  *
  *  - T1 (paragraph_generator/base.py:53-110): buffer lines until one ends
  *    with a sentence terminator; a dialogue prefix forces a flush BEFORE the
  *    line.
  *  - T2 (base.py:112-142): stitch Question(+Answer) sequences into one chunk.
  *
  * Two implementations, deliberately:
  *  1. [[combineLines]] — typed `groupByKey(doc).flatMapGroups` fold: the
  *     direct Spark mapping of the reference's imperative loop (handles the
  *     full rule set incl. flush-before-dialogue).
  *  2. [[combineLinesSql]] — a pure window/aggregate plan for the terminator
  *     rule alone: run ids via a running sum of terminator flags — fully
  *     Catalyst-optimizable and ORACLE-expressible in ANSI SQL.
  */
object Paragraphs {

  val Terminators: Set[Char] = Set('.', '!', '?', '।', '॥')
  // the reference's QA phase distinguishes block-STARTING prefixes
  // (stop_prefixes) from answer prefixes (language_meta.py:93-99, 132-137);
  // hindi's stop set includes the ANSWER markers too — a reference quirk
  // mirrored verbatim (an उत्तर: para can START a QA block there)
  val StopPrefixes: Seq[String] = Seq(
    "प्रश्न:", "प्रश्न :", "उत्तर:", "उत्तर :", // hi (answers included — quirk)
    "શ્રોતા:", "પૂજ્ય ગુરુદેવશ્રી:", "મુમુક્ષુ:", "શંકા:", "પ્રશ્ન:", // gu
    "Q:") // latin-script analog
  val AnswerPrefixes: Seq[String] = Seq(
    "उत्तर:", "उत्तर :", "સમાધાન:", "ઉત્તર:", "A:")
  // dialogue = stop + answer, the reference's derived union
  // (language_meta.py:53-55) — the T1 flush-before-dialogue trigger
  val DialoguePrefixes: Seq[String] = (StopPrefixes ++ AnswerPrefixes).distinct

  case class Line(docId: Long, lineNum: Int, text: String)
  case class Para(docId: Long, paraNum: Int, text: String)

  private def endsWithTerminator(s: String): Boolean = {
    val t = s.trim
    t.nonEmpty && Terminators.contains(t.last)
  }
  private def startsDialogue(s: String): Boolean = {
    val t = s.trim
    DialoguePrefixes.exists(t.startsWith)
  }

  /** T1: the full reference fold (terminator + flush-before-dialogue). */
  def combineLines(spark: SparkSession, lines: Dataset[Line]): Dataset[Para] = {
    import spark.implicits._
    lines
      .groupByKey(_.docId)
      .flatMapGroups { (docId: Long, it: Iterator[Line]) =>
        val sorted = it.toArray.sortBy(_.lineNum)
        val out = scala.collection.mutable.ArrayBuffer[Para]()
        val buf = new StringBuilder
        var n = 0
        def flush(): Unit = {
          if (buf.nonEmpty) {
            out += Para(docId, n, buf.toString)
            n += 1
            buf.clear()
          }
        }
        sorted.foreach { l =>
          val t = l.text.trim
          // blank lines are SKIPPED like the reference's `if not para_text:
          // continue` (base.py:84-86) — appending them injected a doubled
          // separator space into the joined paragraph
          if (t.nonEmpty) {
            if (startsDialogue(t)) flush() // dialogue starts a new para
            if (buf.nonEmpty) buf += ' '
            buf ++= t
            if (endsWithTerminator(t)) flush()
          }
        }
        flush()
        out
      }
  }

  /** T2: stitch Q&A sequences — the reference's exact loop (base.py:112-142):
    * a STOP-prefixed para opens a block; consecutive ANSWER-prefixed paras
    * are pulled in, and after each answer a following STOP-prefixed para
    * (the next question) joins the same block, chaining alternating Q/A runs
    * into ONE paragraph. Two adjacent questions do NOT merge (the second is
    * not answer-prefixed), and an answer↔question pair without an opening
    * question stays split — semantics pinned by ParagraphsSpec.
    */
  def combineQa(spark: SparkSession, paras: Dataset[Para]): Dataset[Para] = {
    import spark.implicits._
    paras
      .groupByKey(_.docId)
      .flatMapGroups { (docId: Long, it: Iterator[Para]) =>
        val sorted = it.toArray.sortBy(_.paraNum)
        def startsWithAny(s: String, ps: Seq[String]): Boolean = {
          val t = s.trim; ps.exists(t.startsWith)
        }
        val out = scala.collection.mutable.ArrayBuffer[Para]()
        var i = 0
        var n = 0
        while (i < sorted.length) {
          val p = sorted(i).text.trim
          if (startsWithAny(p, StopPrefixes)) {
            val sb = new StringBuilder(p)
            i += 1
            while (i < sorted.length &&
                startsWithAny(sorted(i).text, AnswerPrefixes)) {
              sb.append('\n').append(sorted(i).text.trim)
              i += 1
              // the reference appends a DIRECTLY-following question inside
              // the answer loop — a dangling chained question still joins
              if (i < sorted.length && startsWithAny(sorted(i).text, StopPrefixes)) {
                sb.append('\n').append(sorted(i).text.trim)
                i += 1
              }
            }
            out += Para(docId, n, sb.toString)
          } else {
            out += Para(docId, n, p)
            i += 1
          }
          n += 1
        }
        out
      }
  }

  /** T1 terminator rule as a declarative window plan (oracle-expressible):
    * para id = count of terminator lines STRICTLY BEFORE this line; then
    * ordered string_agg within (docId, paraId).
    * Input df: (doc_id, line_num, line); output (doc_id, para_id, text).
    */
  def combineLinesSql(lines: DataFrame): DataFrame = {
    // whitespace-strip each line and DROP blank ones up front — the same
    // strip/skip the fold (and the reference, base.py:84-86) applies.
    // regexp, not trim(): Spark's trim strips ASCII spaces only, so a
    // tab-padded terminator line would flag differently than the fold's
    // String.trim and silently desync the two variants
    val stripped = lines
      .withColumn("line", regexp_replace(col("line"), "^\\s+|\\s+$", ""))
      .where(col("line") =!= "")
    val w = Window.partitionBy("doc_id").orderBy("line_num")
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = stripped.withColumn("term_flag",
      when(col("line").rlike("[.!?।॥]$"), 1).otherwise(0))
    val withPara = flagged.withColumn("para_id",
      coalesce(sum("term_flag").over(w), lit(0)).cast("long"))
    withPara
      .groupBy(col("doc_id"), col("para_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("line_num"), col("line")))),
        s => s.getField("line")), " ").as("text"))
      .orderBy("doc_id", "para_id")
  }
}
