package graft.crawler

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.SparkTestSession

/** Goldens for the S7 markdown parser — semantics pinned by the reference's
  * own tests (tests/backend/test_markdown_parser.py:38-433).
  */
class MarkdownGranthSpec extends AnyFunSuite {

  val sample =
    """# Pratham Adhikar
      |
      |## Gatha 1
      |
      |गाथा पाठ पहली पंक्ति
      |दूसरी पंक्ति
      |
      |### Translation
      |
      |the translation text
      |
      |### Meaning
      |
      |the meaning text
      |
      |### Teeka
      |
      |teeka one
      |
      |teeka two
      |
      |### Bhavarth
      |
      |bhavarth one
      |
      |### Page Number - 12
      |
      |# Dooja Adhikar
      |
      |## Shlok 5-7
      |
      |shlok range text
      |
      |### Translation
      |
      |range translation
      |
      |## Introduction Prose
      |
      |intro para one
      |
      |intro para two
      |
      |### SubTopic A
      |
      |sub a para
      |
      |### Page Number - 44
      |
      |remaining main para
      |
      |### SubTopic B
      |
      |sub b para
      |""".stripMargin

  test("verses: type/range/sections/page/adhikar per reference semantics") {
    val (verses, proses) = MarkdownGranth.parse(sample)
    assert(verses.length == 2)
    val g1 = verses(0)
    assert(g1.seqNum == 1 && g1.vtype == "Gatha" && g1.typeStartNum == 1 && g1.typeEndNum == 1)
    assert(g1.verse == "गाथा पाठ पहली पंक्ति\nदूसरी पंक्ति") // soft break preserved
    assert(g1.translation == "the translation text" && g1.meaning == "the meaning text")
    assert(g1.teeka == Seq("teeka one", "teeka two")) // list semantics
    assert(g1.bhavarth == Seq("bhavarth one"))
    assert(g1.pageNum.contains(12))
    assert(g1.adhikar.contains("Pratham Adhikar"))
    val s57 = verses(1)
    assert(s57.vtype == "Shlok" && s57.typeStartNum == 5 && s57.typeEndNum == 7)
    assert(s57.adhikar.contains("Dooja Adhikar") && s57.seqNum == 2)

    assert(proses.length == 1)
    val p = proses(0)
    assert(p.seqNum == 3 && p.heading == "Introduction Prose")
    // paragraphs after a Page Number h3 return to MAIN content
    assert(p.content == Seq("intro para one", "intro para two", "remaining main para"))
    assert(p.pageNum.contains(44))
    assert(p.subsections.map(s => (s.seqNum, s.heading)) ==
      Seq((4, "SubTopic A"), (5, "SubTopic B")))
  }

  test("invalid H3 section inside a verse raises (reference ValueError)") {
    val bad =
      """## Gatha 1
        |
        |text
        |
        |### NotASection
        |
        |oops
        |""".stripMargin
    val e = intercept[IllegalArgumentException](MarkdownGranth.parse(bad))
    assert(e.getMessage.contains("Invalid section heading"))
  }

  test("case-insensitive verse headers; lone number headings are prose") {
    val (v1, _) = MarkdownGranth.parse("## gatha 9\n\nx\n")
    assert(v1.head.vtype == "Gatha" && v1.head.typeStartNum == 9)
    val (v2, p2) = MarkdownGranth.parse("## Chapter 9\n\nx\n")
    assert(v2.isEmpty && p2.length == 1) // not a verse type → prose
  }

  test("NBSP-family cleaning and space collapse") {
    assert(MarkdownGranth.cleanText("a b​c  d e") == "a bc d e")
  }

  test("python-markdown heading parity: no space after hashes, trailing hashes stripped") {
    // python-markdown's HashHeaderProcessor requires no space after the
    // hashes — "##Gatha 5" opens a verse in the reference pipeline
    val (v1, _) = MarkdownGranth.parse("##Gatha 5\n\nverse text\n")
    assert(v1.head.vtype == "Gatha" && v1.head.typeStartNum == 5)
    // ...and strips trailing hashes: "### Teeka ###" is the VALID section
    // "Teeka", not an invalid "Teeka ###"
    val md = "## Gatha 1\n\nverse\n\n### Teeka ###\n\ncommentary\n"
    val (v2, _) = MarkdownGranth.parse(md)
    assert(v2.head.teeka == Seq("commentary"))
  }

  test("empty prose sections are skipped but still consume a seq_num") {
    val md = "## Empty Prose\n\n## Gatha 1\n\ntext\n"
    val (vs, ps) = MarkdownGranth.parse(md)
    assert(ps.isEmpty)
    assert(vs.head.seqNum == 2) // reference: seq advances past the empty prose
  }

  test("fromMarkdown == synthesize (flattened rows identical)") {
    val spark = SparkTestSession.spark
    val a = graft.ops.Granth.flattenVerses(graft.ops.Granth.synthesize(spark, 20))
      .orderBy("granthId", "seq_num").collect().map(_.toString)
    val b = graft.ops.Granth.flattenVerses(graft.ops.Granth.fromMarkdown(spark, 20))
      .orderBy("granthId", "seq_num").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
