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

  test("fuse is deterministic under duplicate doc_ids: max score wins") {
    val lex = Seq((7L, 0.2), (7L, 0.9), (1L, 0.9)).toDF("doc_id", "score")
    val vec = Seq((7L, 0.5), (7L, 0.1)).toDF("doc_id", "score")
    val out = HybridRank.fuse(lex, vec, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 7: lexical max 0.9 (norm 1.0), vector max 0.5 (norm 1.0)
    assert(out(7L) == 1.0)
    assert(out(1L) == 0.6)
  }

  test("fuse normalizes by the REAL max (reference result_ranker guard), even non-positive") {
    // all-negative vector side (query anti-correlated with every candidate):
    // the old greatest(max, 1e-12) floor divided by the epsilon and exploded
    // scores ~1e12x; the reference divides by the actual max (0 only when
    // max == 0 exactly)
    val lex = Seq((1L, 2.0)).toDF("doc_id", "score")
    val vec = Seq((1L, -0.2), (2L, -0.4)).toDF("doc_id", "score")
    val out = HybridRank.fuse(lex, vec, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc1: 0.6 * 2/2 + 0.4 * (-0.2/-0.2) = 1.0; doc2: 0.4 * (-0.4/-0.2) = 0.8
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.8)
    // max == 0 exactly → that side contributes 0 for every doc
    val vec0 = Seq((1L, 0.0), (2L, 0.0)).toDF("doc_id", "score")
    val out0 = HybridRank.fuse(lex, vec0, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out0(1L) == 0.6 && out0(2L) == 0.0)
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

  test("prose search end-to-end: flattened prose docs indexed, top hit carries the reference metadata") {
    // mirrors tests/backend/test_search.py:925-1103 test_search_prose_content —
    // a query for a subsection paragraph must surface that paragraph's search
    // doc with its prose_content_type / prose_seq_num / prose_heading, and a
    // main-prose query its own; metadata rides the index's meta map and the
    // chunk_id is the doc url (the reference checks the same fields on the
    // OpenSearch _source)
    import org.apache.spark.sql.functions._
    val prose = Granth.flattenProse(Granth.proseFromMarkdown(spark, 6))
    val input = prose.select(
      col("chunk_id").as("url"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("warc_ts"),
      col("content").as("text"),
      lit("hi").as("lang"),
      map(
        lit("prose_content_type"), col("prose_content_type"),
        lit("prose_seq_num"), col("prose_seq_num").cast("string"),
        lit("prose_heading"), col("prose_heading")).as("meta"))
    val dir = "/tmp/gidx-prose-search"
    val d = new java.io.File(dir)
    if (d.exists()) scala.reflect.io.Directory(d).deleteRecursively()
    graft.index.IndexBuild.build(spark, input, dir, numChunks = 1,
      saltTargetPostings = 64)
    val idx = graft.query.IndexHandle.load(dir)
    val mem = graft.query.InMemoryIndex.load(spark, idx)
    val metaOf: Long => Map[String, String] = id =>
      spark.read.parquet(s"$dir/docstore").where(col("docId") === id)
        .select("meta").as[Map[String, String]].head()
    // subsection paragraph of granth 5 ("sub text 5-1"): verse seqs 1..4,
    // prose section seq 5, its subsection seq 6 (seq continuity per
    // granth_index.py:126-147)
    val sub = mem.search(graft.query.QuerySpec("hi", "sub text 5 1"))
    assert(sub.hits.nonEmpty)
    assert(sub.hits.head.url == "5_p5_sub6_content_0")
    val subMeta = metaOf(sub.hits.head.docId)
    assert(subMeta("prose_content_type") == "subsection")
    assert(subMeta("prose_seq_num") == "6")
    assert(subMeta("prose_heading") == "Upodghat 5")
    // main prose paragraph of granth 4 ("prose text 4-2" → content_1; g=4
    // has 3+4%4=3 verses, so its prose section is seq 4)
    val main = mem.search(graft.query.QuerySpec("hi", "prose text 4 2"))
    assert(main.hits.nonEmpty)
    assert(main.hits.head.url == "4_p4_content_1")
    val mainMeta = metaOf(main.hits.head.docId)
    assert(mainMeta("prose_content_type") == "main")
    assert(mainMeta("prose_heading") == "Prastavana 4")
    // the content-type is also filterable (terms filter on the meta facet):
    // restricting to main prose drops every subsection hit
    val filtered = mem.search(graft.query.QuerySpec("hi", "text 5",
      metaFilters = Map("prose_content_type" -> Seq("main"))))
    assert(filtered.hits.nonEmpty)
    filtered.hits.foreach(h => assert(metaOf(h.docId)("prose_content_type") == "main"))
  }
}
