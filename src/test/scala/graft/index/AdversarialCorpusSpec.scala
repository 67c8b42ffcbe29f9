package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.{SparkTestSession, Webtext}
import graft.query.{Bm25Query, IndexHandle, InMemoryIndex, NaiveBm25, QuerySpec}

/** Robustness gate over pathological inputs a real web crawl delivers:
  * empty / whitespace-only / newline-soup docs, megatoken spam, deeply mixed
  * scripts, emoji/ZWJ runs, combining-mark stress, repeated-token floods,
  * docs with empty meta. The build must not crash, stats must stay
  * consistent, and the query paths (Spark, resident, naive oracle) must
  * agree on the survivors.
  */
class AdversarialCorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rm(p: String): Unit = {
    val d = new java.io.File(p)
    if (d.exists()) scala.reflect.io.Directory(d).deleteRecursively()
  }

  private val ts = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")

  // a plain tuple-based frame: (docId, url, warc_ts, text, lang, meta)
  private def corpusDf(rows: Seq[(Long, String, String, String)]) =
    rows.map { case (id, text, lang, metaKey) =>
      (id, s"https://adv.example/$id", ts, text, lang,
        if (metaKey.isEmpty) Map.empty[String, String] else Map("category" -> metaKey))
    }.toDF("docId", "url", "warc_ts", "text", "lang", "meta")

  private val mega = "x" * 50000 // one 50k-char token
  private val emoji = "👩‍👩‍👧‍👦 🇮🇳 🧑🏽‍💻 ‍‍"
  private val combining = "कें" * 200 // base + matras/anusvara runs
  private val rows = Seq(
    (0L, "", "hi", ""),                                    // empty text
    (1L, "   \t  ", "hi", ""),                             // whitespace only
    (2L, "\n\n\n\n", "hi", ""),                            // newline soup
    (3L, mega, "hi", "Spam"),                              // 50k-char single token
    (4L, ("spam " * 5000).trim, "hi", "Spam"),             // one token repeated 5000x
    (5L, "सामान्य हिंदी वाक्य यहाँ है", "hi", "Pravachan"), // normal hi
    (6L, "mixed স্ক্রিপ্ট 漢字 العربية עברית ascii", "hi", ""), // 5 scripts in one doc
    (7L, emoji, "hi", ""),                                 // emoji/ZWJ only
    (8L, combining, "hi", ""),                             // combining-mark stress
    (9L, "સામાન્ય ગુજરાતી વાક્ય અહીં છે", "gu", "Granth"), // normal gu
    (10L, "सामान्य हिंदी वाक्य दूसरा", "hi", "Pravachan"), // second normal hi
    (11L, "\u0000\u0001\u0002 control chars here.", "hi", ""), // control chars
    (12L, "न्त न्द ण्ट म्प ङ्क ञ्च", "hi", ""))             // every nasal-mapping class

  private val dir = "/tmp/gidx-adversarial"
  lazy val idx: IndexHandle = {
    rm(dir)
    IndexBuild.build(spark, corpusDf(rows), dir, numChunks = 2, saltTargetPostings = 64)
    IndexHandle.load(dir)
  }

  test("build survives pathological docs; stats count every doc, tokens only real ones") {
    val stats = idx.stats
    // every doc lands in its language's N (docstore complete), including
    // empty ones — N drives BM25 idf and must match the corpus
    assert(stats("hi")._1 == 12L, s"hi N: ${stats("hi")}")
    assert(stats("gu")._1 == 1L)
    // token totals: empty/whitespace docs contribute 0; the megatoken doc 1
    assert(stats("hi")._2 >= 5000L) // repeated-token flood dominates
    // docstore row for an empty doc is point-readable
    val empty = spark.read.parquet(s"$dir/docstore").where(col("docId") === 0L)
    assert(empty.count() == 1)
  }

  test("query paths agree on the adversarial index (Spark == resident == naive)") {
    val mem = InMemoryIndex.load(spark, idx)
    val docstore = spark.read.parquet(s"$dir/docstore")
    val queries = Seq(
      QuerySpec("hi", "सामान्य वाक्य"),                    // multi-doc AND
      QuerySpec("hi", "सामान्य वाक्य", mode = "any"),
      QuerySpec("hi", "सामान्य हिंदी वाक्य", phrase = true),
      QuerySpec("hi", "spam"),                             // flood doc
      QuerySpec("hi", mega.take(100)),                     // prefix of megatoken ≠ megatoken
      QuerySpec("hi", mega),                               // the megatoken itself
      QuerySpec("hi", "漢字 ascii"),                        // mixed-script doc
      QuerySpec("gu", "સામાન્ય"),
      QuerySpec("hi", "सामान्य", metaFilters = Map("category" -> Seq("Pravachan"))))
    queries.foreach { q =>
      val a = Bm25Query.search(spark, idx, q)
      val b = mem.search(q)
      val (oracle, oracleTotal) = NaiveBm25.search(spark, docstore, q)
      assert(a.hits.map(_.docId) == oracle.map(_.docId), s"spark vs naive on $q")
      assert(b.hits.map(h => (h.docId, h.score)) ==
        a.hits.map(h => (h.docId, h.score)), s"resident vs spark on $q")
      assert(a.totalHits == math.min(oracleTotal, q.trackTotalHits), s"totals on $q")
    }
    // the megatoken is NOT findable by its prefix but IS by exact match
    assert(mem.search(QuerySpec("hi", mega.take(100))).hits.isEmpty)
    assert(mem.search(QuerySpec("hi", mega)).hits.map(_.docId) == Seq(3L))
  }

  test("nasal-mapping doc matches its anusvara forms; empty-analysis queries return cleanly") {
    val mem = InMemoryIndex.load(spark, idx)
    // doc 12 wrote conjunct forms; the char filter maps them to anusvara —
    // querying the conjunct form goes through the same mapping and must hit
    assert(mem.search(QuerySpec("hi", "न्त")).hits.map(_.docId) == Seq(12L))
    // queries that analyze to nothing (emoji-only, empty, stopword-only)
    // return empty results with zero totals, never throw
    Seq("", "   ", "👩‍👩‍👧‍👦", "और की").foreach { s =>
      val r = mem.search(QuerySpec("hi", s))
      assert(r.hits.isEmpty && r.totalHits == 0L, s"query '$s'")
    }
  }

  test("backup/restore round-trip: restored index serves identical results; incomplete backup refused") {
    val mem = InMemoryIndex.load(spark, idx)
    val broot = "/tmp/gidx-backups"
    rm(broot); rm("/tmp/gidx-restored")
    val bdir = IndexBackup.backup(dir, broot, "b1")
    assert(IndexBackup.list(broot) == Seq("b1"))
    // mutate the ORIGINAL after the backup (delete the flood doc)
    IndexBuild.deleteByQuery(spark, dir, col("docId") === 4L)
    assert(Bm25Query.search(spark, IndexHandle.load(dir),
      QuerySpec("hi", "spam")).hits.isEmpty)
    // restore → pre-mutation results, resident-served
    IndexBackup.restore(bdir, "/tmp/gidx-restored")
    val restored = InMemoryIndex.load(spark, IndexHandle.load("/tmp/gidx-restored"))
    val q = QuerySpec("hi", "सामान्य वाक्य", mode = "any")
    assert(restored.search(q).hits.map(h => (h.docId, h.score)) ==
      mem.search(q).hits.map(h => (h.docId, h.score)))
    assert(restored.search(QuerySpec("hi", "spam")).hits.map(_.docId) == Seq(4L))
    // an incomplete backup (no marker) is refused
    TableIO.deleteRecursive(s"$bdir/BACKUP_DONE")
    val e = intercept[IllegalArgumentException] {
      IndexBackup.restore(bdir, "/tmp/gidx-restored2")
    }
    assert(e.getMessage.contains("incomplete"))
  }
}
