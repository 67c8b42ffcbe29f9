package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{SparkTestSession, Webtext}

/** Build determinism + resumability gates (north rule: "resumable from
  * checkpoint with per-partition lineage + metrics"; SURVEY §5.2 #3, #5).
  */
class IndexBuildSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rm(p: String): Unit = {
    val d = new java.io.File(p)
    if (d.exists()) scala.reflect.io.Directory(d).deleteRecursively()
  }

  /** Decode every (lang,term) posting list of an index into a canonical map
    * for content comparison (file layout may differ; content must not).
    */
  private def postingsFingerprint(dir: String, compacted: Boolean): Map[(String, String), (Long, Long, Seq[(Long, Int, Int)])] = {
    val path = if (compacted) s"$dir/segments_compact" else s"$dir/segments"
    import spark.implicits._
    spark.read.parquet(path)
      .select("lang", "term", "df", "cf", "blob", "posBlob")
      .as[(String, String, Long, Long, Array[Byte], Array[Byte])]
      .collect()
      .groupBy(r => (r._1, r._2))
      .map { case (key, rows) =>
        val (blob, posBlob, df, cf) = PostingListMerger.merge(rows.map(r => (r._5, r._6)).toSeq)
        val it = new PostingListReader(blob, posBlob).iterator()
        it.start()
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
        while (!it.exhausted) { buf += ((it.docId, it.tf, it.dl)); it.next() }
        key -> (df.toLong, cf, buf.toSeq)
      }
  }

  test("determinism: different chunking + salting yields identical postings") {
    val corpus = Webtext.synthesize(spark, 1200, partitions = 5).toDF()
    rm("/tmp/gidx-a"); rm("/tmp/gidx-b")
    IndexBuild.build(spark, corpus, "/tmp/gidx-a", numChunks = 1, saltTargetPostings = 1 << 30)
    IndexBuild.build(spark, corpus, "/tmp/gidx-b", numChunks = 3, saltTargetPostings = 32)
    val a = postingsFingerprint("/tmp/gidx-a", compacted = false)
    val b = postingsFingerprint("/tmp/gidx-b", compacted = false)
    assert(a.keySet == b.keySet, "term dictionaries differ")
    a.foreach { case (k, v) => assert(b(k) == v, s"postings differ for $k") }
    // salting must actually have produced >1 run for head terms in build b
    // (sanity that the test exercised the merge path)
    val hiHead = ("hi", "hihead0")
    assert(a.contains(hiHead))
  }

  test("resume: killed build resumes from manifest without recomputation, same index") {
    val corpus = Webtext.synthesize(spark, 1000, partitions = 4).toDF()
    rm("/tmp/gidx-clean"); rm("/tmp/gidx-resume")
    IndexBuild.build(spark, corpus, "/tmp/gidx-clean", numChunks = 4)
    // killed after chunk 1 completes
    intercept[RuntimeException] {
      IndexBuild.build(spark, corpus, "/tmp/gidx-resume", numChunks = 4, failAfterChunk = 1)
    }
    val doneAfterKill = Manifest.doneChunks("/tmp/gidx-resume")
    assert(doneAfterKill == Set(0, 1), s"manifest after kill: $doneAfterKill")
    // record mtimes of completed chunk outputs
    val seg0 = new java.io.File("/tmp/gidx-resume/segments/chunk=0")
    val mtimeBefore = seg0.listFiles().map(f => f.getName -> f.lastModified()).toMap
    Thread.sleep(1100)
    IndexBuild.build(spark, corpus, "/tmp/gidx-resume", numChunks = 4)
    // chunks 0-1 not recomputed
    val mtimeAfter = seg0.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(mtimeAfter == mtimeBefore, "chunk 0 was recomputed on resume")
    assert(Manifest.doneChunks("/tmp/gidx-resume") == Set(0, 1, 2, 3))
    // resumed index content == clean build content
    val clean = postingsFingerprint("/tmp/gidx-clean", compacted = false)
    val resumed = postingsFingerprint("/tmp/gidx-resume", compacted = false)
    assert(clean == resumed)
    // manifest carries per-partition metrics (lineage)
    val rows = Manifest.rows("/tmp/gidx-resume")
    assert(rows.forall(r => r.docs > 0 && r.tokens > 0 && r.terms > 0 && r.wallMs >= 0))
  }

  test("compact folds per-chunk segments into one, content-identical") {
    val corpus = Webtext.synthesize(spark, 800, partitions = 4).toDF()
    rm("/tmp/gidx-c")
    IndexBuild.build(spark, corpus, "/tmp/gidx-c", numChunks = 3, saltTargetPostings = 32)
    val before = postingsFingerprint("/tmp/gidx-c", compacted = false)
    IndexBuild.compact(spark, "/tmp/gidx-c")
    val after = postingsFingerprint("/tmp/gidx-c", compacted = true)
    assert(before == after)
    // compacted segments have exactly one row per (lang, term)
    import spark.implicits._
    val dup = spark.read.parquet("/tmp/gidx-c/segments_compact")
      .groupBy("lang", "term").count().filter("count > 1").count()
    assert(dup == 0)
  }
}
