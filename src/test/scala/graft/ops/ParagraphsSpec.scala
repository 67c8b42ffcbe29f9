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

  test("T2 reference semantics: Q/A roles distinguished, alternating runs chain") {
    // base.py:112-142 — a STOP-prefixed para opens a block; answers are
    // pulled in; a question directly after an answer chains into the SAME
    // block. Two adjacent questions do NOT merge (the second is not
    // answer-prefixed).
    val qq = Seq(Para(1, 0, "प्रश्न: पहला?"), Para(1, 1, "प्रश्न: दूसरा?"))
    assert(Paragraphs.combineQa(spark, qq.toDS()).collect().sortBy(_.paraNum)
      .map(_.text).toSeq == Seq("प्रश्न: पहला?", "प्रश्न: दूसरा?"))
    val chain = Seq(
      Para(2, 0, "प्रश्न: q1?"), Para(2, 1, "उत्तर: a1।"),
      Para(2, 2, "प्रश्न: q2?"), Para(2, 3, "उत्तर: a2।"),
      Para(2, 4, "outro."))
    assert(Paragraphs.combineQa(spark, chain.toDS()).collect().sortBy(_.paraNum)
      .map(_.text).toSeq == Seq(
      "प्रश्न: q1?\nउत्तर: a1।\nप्रश्न: q2?\nउत्तर: a2।", "outro."))
    // the hindi quirk mirrored from language_meta.py:93-99: उत्तर: is in the
    // STOP set too, so an answer can open a block — and pulls a following
    // answer, but NOT a following question on its own
    val aq = Seq(Para(3, 0, "उत्तर: अकेला जवाब।"), Para(3, 1, "प्रश्न: अगला?"))
    assert(Paragraphs.combineQa(spark, aq.toDS()).collect().sortBy(_.paraNum)
      .map(_.text).toSeq == Seq("उत्तर: अकेला जवाब।", "प्रश्न: अगला?"))
  }

  test("T1 fold: blank lines are skipped, not joined as doubled spaces") {
    // reference base.py:84-86 (`if not para_text: continue`)
    val lines = Seq(Line(1, 0, "Hello"), Line(1, 1, "   "), Line(1, 2, "world."))
    val out = Paragraphs.combineLines(spark, lines.toDS()).collect()
    assert(out.map(_.text).toSeq == Seq("Hello world."))
  }

  test("declarative window variant agrees with the fold on whitespace-padded input") {
    // tab-padded terminators and blank lines — the classes where Spark's
    // space-only trim() used to silently desync the two variants
    val lines = Seq(
      Line(1, 0, "End here.\t"), Line(1, 1, "next"), Line(1, 2, "  "),
      Line(1, 3, " fin. "))
    val foldOut = Paragraphs.combineLines(spark, lines.toDS())
      .collect().map(p => (p.docId, p.paraNum.toLong, p.text)).sorted.toSeq
    val sqlOut = Paragraphs.combineLinesSql(
      lines.map(l => (l.docId, l.lineNum, l.text)).toDF("doc_id", "line_num", "line"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(foldOut == sqlOut)
    assert(foldOut.map(_._3) == Seq("End here.", "next fin."))
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
