package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.SparkTestSession

class HybridGranthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hybrid fusion: full-outer, max-normalized, 0.6/0.4 weighted") {
    val lex = Seq((1L, 4.0), (2L, 2.0), (3L, 1.0)).toDF("doc_id", "score")
    val vec = Seq((2L, 0.9), (4L, 0.45)).toDF("doc_id", "score")
    val out = HybridRank.fuse(lex, vec, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.6)                 // lexical only: 0.6 * 4/4
    assert(math.abs(out(2L) - (0.6 * 0.5 + 0.4 * 1.0)) < 1e-9)
    assert(out(4L) == 0.2)                 // vector only: 0.4 * 0.45/0.9
    // ordering: doc2 (0.7) > doc1 (0.6) > doc4 (0.2) > doc3 (0.15)
    val order = HybridRank.fuse(lex, vec, k = 10).collect().map(_.getLong(0)).toSeq
    assert(order == Seq(2L, 1L, 4L, 3L))
  }

  test("routing predicate mirrors reference is_lexical_query semantics") {
    assert(HybridRank.isLexicalQuery("शांति"))
    assert(HybridRank.isLexicalQuery("one two three"))
    assert(!HybridRank.isLexicalQuery("one two three four"))
    assert(!HybridRank.isLexicalQuery("what is peace?"))
    assert(!HybridRank.isLexicalQuery("वाक्य में विराम।"))
    // full string.punctuation parity (reference checks all 32 ASCII marks,
    // not just sentence punctuation)
    assert(!HybridRank.isLexicalQuery("c++ tutorial"))
    assert(!HybridRank.isLexicalQuery("a_b"))
    assert(!HybridRank.isLexicalQuery("(test)"))
    assert(!HybridRank.isLexicalQuery("#hash"))
    // reference: ''.split() is empty -> 0 < 4 -> lexical (callers
    // short-circuit empty upstream)
    assert(HybridRank.isLexicalQuery(""))
    assert(HybridRank.isLexicalQuery(null))
  }

  test("granth nested flatten emits one row per verse with nested fields") {
    val g = Granth.synthesize(spark, 10)
    val flat = Granth.flattenVerses(g).collect()
    val expected = (0 until 10).map(i => 3 + i % 4).sum
    assert(flat.length == expected)
    val r = Granth.flattenVerses(g)
      .where($"granthId" === 1 && $"seq_num" === 2).collect()(0)
    assert(r.getAs[String]("vtype") == "Shlok")
    assert(r.getAs[String]("teeka_joined") == "teeka 1-2-1 | teeka 1-2-2")
    assert(r.getAs[Int]("page_num") == 4)
  }

  test("granth date-range facet collects sorted unique ranges per author") {
    val g = Granth.synthesize(spark, 30)
    val f = Granth.dateRangeFacet(g).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // author0 gets granths g≡0 (mod 3): years 2000+g%5 for g=0,3,6,... = all 5 years
    assert(f("author0").length == 5)
    assert(f("author0").head == "2000-01-01..2000-12-31")
    assert(f("author0") == f("author0").sorted)
  }
}
