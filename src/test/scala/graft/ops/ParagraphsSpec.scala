package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.SparkTestSession
import graft.ops.Paragraphs.{Line, Para}

class ParagraphsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("T1 fold: buffer until terminator; dialogue prefix flushes before") {
    val lines = Seq(
      Line(1, 0, "पहली पंक्ति बिना अंत"),
      Line(1, 1, "दूसरी पंक्ति का अंत है।"),
      Line(1, 2, "प्रश्न: यह क्या है"),
      Line(1, 3, "जारी उत्तर।"),
      Line(1, 4, "आखिरी बिना टर्मिनेटर"),
      Line(2, 0, "single doc two. sentences here."))
    val out = Paragraphs.combineLines(spark, lines.toDS()).collect()
      .groupBy(_.docId).view.mapValues(_.sortBy(_.paraNum).map(_.text).toSeq).toMap
    assert(out(1L) == Seq(
      "पहली पंक्ति बिना अंत दूसरी पंक्ति का अंत है।",
      "प्रश्न: यह क्या है जारी उत्तर।",
      "आखिरी बिना टर्मिनेटर"))
    assert(out(2L) == Seq("single doc two. sentences here."))
  }

  test("T2: consecutive dialogue paragraphs stitched with newline") {
    val paras = Seq(
      Para(1, 0, "intro para."),
      Para(1, 1, "प्रश्न: सवाल?"),
      Para(1, 2, "उत्तर: जवाब।"),
      Para(1, 3, "outro."))
    val out = Paragraphs.combineQa(spark, paras.toDS()).collect().sortBy(_.paraNum)
    assert(out.map(_.text).toSeq == Seq(
      "intro para.", "प्रश्न: सवाल?\nउत्तर: जवाब।", "outro."))
  }

  test("declarative window variant agrees with the fold on terminator-only input") {
    val lines = (0L until 50L).flatMap { d =>
      (0 until 9).map { i =>
        val t = if ((d + i) % 3 == 2) s"line $d $i end." else s"line $d $i mid"
        Line(d, i, t)
      }
    }
    val foldOut = Paragraphs.combineLines(spark, lines.toDS())
      .collect().map(p => (p.docId, p.paraNum.toLong, p.text)).sorted.toSeq
    val sqlOut = Paragraphs.combineLinesSql(
      lines.toDF("doc_id", "line_num", "line"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(foldOut == sqlOut)
  }
}
