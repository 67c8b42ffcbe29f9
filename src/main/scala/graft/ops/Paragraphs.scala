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
  val DialoguePrefixes: Seq[String] = Seq("प्रश्न:", "उत्तर:", "Q:", "A:", "શંકા:", "સમાધાન:")

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
          if (startsDialogue(l.text)) flush() // dialogue starts a new para
          if (buf.nonEmpty) buf += ' '
          buf ++= l.text.trim
          if (endsWithTerminator(l.text)) flush()
        }
        flush()
        out
      }
  }

  /** T2: stitch consecutive Q/A paragraphs (question pulls following answer). */
  def combineQa(spark: SparkSession, paras: Dataset[Para]): Dataset[Para] = {
    import spark.implicits._
    paras
      .groupByKey(_.docId)
      .flatMapGroups { (docId: Long, it: Iterator[Para]) =>
        val sorted = it.toArray.sortBy(_.paraNum)
        val out = scala.collection.mutable.ArrayBuffer[Para]()
        var i = 0
        var n = 0
        while (i < sorted.length) {
          val p = sorted(i)
          if (startsDialogue(p.text) && i + 1 < sorted.length &&
              startsDialogue(sorted(i + 1).text)) {
            out += Para(docId, n, p.text + "\n" + sorted(i + 1).text)
            i += 2
          } else {
            out += Para(docId, n, p.text)
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
    val w = Window.partitionBy("doc_id").orderBy("line_num")
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = lines.withColumn("term_flag",
      when(trim(col("line")).rlike("[.!?।॥]$"), 1).otherwise(0))
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
