package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.{SparkTestSession, Webtext}
import graft.index.{IndexBuild, PostingListMerger, PostingListReader}

class SnapshotTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rm(p: String): Unit = {
    val d = new java.io.File(p)
    if (d.exists()) scala.reflect.io.Directory(d).deleteRecursively()
  }

  private def fingerprint(dir: String): Map[(String, String), Seq[(Long, Int, Int)]] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/segments")
      .select("lang", "term", "blob", "posBlob")
      .as[(String, String, Array[Byte], Array[Byte])]
      .collect()
      .groupBy(r => (r._1, r._2))
      .map { case (key, rows) =>
        val (blob, posBlob, _, _) = PostingListMerger.merge(rows.map(r => (r._3, r._4)).toSeq)
        val it = new PostingListReader(blob, posBlob).iterator()
        it.start()
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
        while (!it.exhausted) { buf += ((it.docId, it.tf, it.dl)); it.next() }
        key -> buf.toSeq
      }
  }

  test("snapshot table: atomic append, time travel, incremental diff") {
    val tbl = "/tmp/gsnap-tbl"
    rm(tbl)
    import spark.implicits._
    val s1 = SnapshotTable.append(spark, tbl,
      Webtext.synthesize(spark, 600, partitions = 4).toDF())
    val s2 = SnapshotTable.append(spark, tbl,
      Webtext.synthesize(spark, 900, partitions = 4).toDF().where(col("docId") >= 600))
    assert(SnapshotTable.currentId(tbl).contains(s2) && s2 == s1 + 1)
    assert(SnapshotTable.read(spark, tbl).count() == 900)
    // time travel: the old snapshot still reads exactly its own file list
    assert(SnapshotTable.read(spark, tbl, asOf = Some(s1)).count() == 600)
    // incremental diff: only the appended rows
    val fresh = SnapshotTable.appendedSince(spark, tbl, s1).get
    assert(fresh.count() == 300)
    assert(fresh.agg(min("docId")).as[Long].head() == 600)
    assert(SnapshotTable.appendedSince(spark, tbl, s2).isEmpty)
    // data files of a later commit are invisible at the older snapshot even
    // though they share the directory tree (manifest-scoped scan, not a
    // recursive directory listing): snap-2's file set strictly extends
    // snap-1's, and every file of one commit lives in one staging dir
    val f1 = SnapshotTable.snapshot(tbl, s1).files
    val f2 = SnapshotTable.snapshot(tbl, s2).files
    assert(f2.toSet.size > f1.size && f1.toSet.subsetOf(f2.toSet))
    assert(f1.map(_.takeWhile(_ != '/')).distinct.sizeIs == 1)
  }

  test("orphan staging dir from a crashed writer: invisible to reads, reclaimed by removeOrphans") {
    val tbl = "/tmp/gsnap-orphan"
    rm(tbl)
    import spark.implicits._
    SnapshotTable.append(spark, tbl, Seq((1L, "a")).toDF("docId", "text"))
    // simulate a crash AFTER the data write, BEFORE the manifest write: an
    // unreferenced staging dir exists; commits ignore it, reads never see it
    Seq((99L, "stale")).toDF("docId", "text").write.parquet(s"$tbl/data/u-deadbeef0000")
    val s2 = SnapshotTable.append(spark, tbl, Seq((2L, "b")).toDF("docId", "text"))
    assert(s2 == 2L)
    import org.apache.spark.sql.functions.col
    val ids = SnapshotTable.read(spark, tbl).select(col("docId")).as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L), "stale orphan rows must not leak into the table")
    // inside the grace window the orphan is protected (could be in-flight)
    assert(SnapshotTable.removeOrphans(tbl).isEmpty)
    // past the grace window it is reclaimed; referenced dirs survive
    val gone = SnapshotTable.removeOrphans(tbl, graceMs = 0L)
    assert(gone == Seq("u-deadbeef0000"))
    assert(SnapshotTable.read(spark, tbl).count() == 2)
  }

  test("corrupt head manifest: append surfaces the corruption, staged data survives") {
    val tbl = "/tmp/gsnap-corrupt"
    rm(tbl)
    import spark.implicits._
    SnapshotTable.append(spark, tbl, Seq((1L, "a")).toDF("docId", "text"))
    // bit-rot the head manifest: present but unparseable. This must NOT be
    // treated as the expireSnapshots rebase race — pre-fix, append burned
    // all 20 rebases on it, DELETED its freshly staged parquet, and raised
    // a bogus "commit conflict" instead of the corruption
    val head = new java.io.File(s"$tbl/snapshots/snap-000000000001.json")
    java.nio.file.Files.write(head.toPath, "{\"id\":1,\"par".getBytes("UTF-8"))
    // drop the local-FS checksum sidecar: this case exercises CONTENT
    // corruption (valid read, garbage JSON); a checksum-failing read is a
    // different failure that propagates as its own IOException either way
    new java.io.File(s"$tbl/snapshots/.snap-000000000001.json.crc").delete()
    val before = new java.io.File(s"$tbl/data").listFiles().map(_.getName).toSet
    val e = intercept[RuntimeException] {
      SnapshotTable.append(spark, tbl, Seq((2L, "b")).toDF("docId", "text"))
    }
    assert(e.getMessage.contains("unparseable"),
      s"must report the corruption, not a rebase conflict: ${e.getMessage}")
    val after = new java.io.File(s"$tbl/data").listFiles().map(_.getName).toSet
    assert((after -- before).sizeIs == 1,
      "the staged data dir must survive the failure for retry-after-repair")
  }

  test("concurrent appends: optimistic commits all land, ids dense, no rows lost") {
    val tbl = "/tmp/gsnap-race"
    rm(tbl)
    import spark.implicits._
    val writers = 4
    val perWriter = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val futs = (0 until writers).map { w =>
      pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
        def call(): Seq[Long] = (0 until perWriter).map { i =>
          val base = (w * perWriter + i) * 10L
          SnapshotTable.append(spark, tbl,
            Seq((base, s"w$w-$i")).toDF("docId", "text"))
        }
      })
    }
    val ids = futs.flatMap(_.get())
    pool.shutdown()
    // every commit got a distinct snapshot id and they are dense 1..N
    assert(ids.sorted == (1L to (writers * perWriter)).toSeq)
    assert(SnapshotTable.currentId(tbl).contains(writers * perWriter.toLong))
    // no append lost: the current snapshot reads every writer's rows
    val docIds = SnapshotTable.read(spark, tbl).select("docId").as[Long].collect().sorted
    assert(docIds.toSeq == (0 until writers * perWriter).map(_ * 10L))
    // lineage: each snapshot's file set strictly extends its parent's
    (2L to (writers * perWriter)).foreach { id =>
      val child = SnapshotTable.snapshot(tbl, id)
      val parent = SnapshotTable.snapshot(tbl, id - 1)
      assert(child.parent == id - 1)
      assert(parent.files.toSet.subsetOf(child.files.toSet))
      assert(child.files.size > parent.files.size)
    }
  }

  test("expireSnapshots: retention keeps current reads, expired time travel fails fast") {
    val tbl = "/tmp/gsnap-expire"
    rm(tbl)
    import spark.implicits._
    (1 to 4).foreach(i =>
      SnapshotTable.append(spark, tbl, Seq((i.toLong, s"d$i")).toDF("docId", "text")))
    val expired = SnapshotTable.expireSnapshots(tbl, keepLast = 2)
    assert(expired == Seq(1L, 2L))
    // current + retained history still read correctly
    assert(SnapshotTable.read(spark, tbl).count() == 4)
    assert(SnapshotTable.read(spark, tbl, asOf = Some(3L)).count() == 3)
    assert(SnapshotTable.appendedSince(spark, tbl, 3L).get.count() == 1)
    // expired time travel fails fast instead of answering from a stale scan
    val e = intercept[RuntimeException] {
      SnapshotTable.read(spark, tbl, asOf = Some(1L))
    }
    assert(e.getMessage.contains("no snapshot"))
    // appends continue from the retained chain
    val s5 = SnapshotTable.append(spark, tbl, Seq((5L, "d5")).toDF("docId", "text"))
    assert(s5 == 5L && SnapshotTable.read(spark, tbl).count() == 5)
  }

  test("snapshot-incremental consume == fresh build over the full table") {
    val tbl = "/tmp/gsnap-tbl2"
    val idx = "/tmp/gsnap-idx"
    val freshIdx = "/tmp/gsnap-fresh"
    Seq(tbl, idx, freshIdx).foreach(rm)
    import spark.implicits._
    val all = Webtext.synthesize(spark, 800, partitions = 4).toDF()
    SnapshotTable.append(spark, tbl, all.where(col("docId") < 500))
    // first consume: full build of snapshot 1
    val (f0, t0, n0) = SnapshotIngest.consume(spark, tbl, idx, numChunks = 2)
    assert(f0 == -1L && t0 == 1L && n0 == 500L)
    // nothing new: no-op
    assert(SnapshotIngest.consume(spark, tbl, idx)._3 == 0L)
    // append snapshot 2 and consume ONLY the 300 new docs
    SnapshotTable.append(spark, tbl, all.where(col("docId") >= 500))
    val (f1, t1, n1) = SnapshotIngest.consume(spark, tbl, idx)
    assert(f1 == 1L && t1 == 2L && n1 == 300L)
    assert(SnapshotIngest.consumedSnapshot(idx).contains(2L))
    // the incrementally-consumed index is postings-identical to a fresh
    // build over the merged table
    IndexBuild.build(spark, all, freshIdx, numChunks = 2)
    assert(fingerprint(idx) == fingerprint(freshIdx))
  }

  test("consume refuses an index that was fed from a DIFFERENT table") {
    val tblA = "/tmp/gsnap-srcA"
    val tblB = "/tmp/gsnap-srcB"
    val idx = "/tmp/gsnap-idx-mix"
    Seq(tblA, tblB, idx).foreach(rm)
    import spark.implicits._
    SnapshotTable.append(spark, tblA, Webtext.synthesize(spark, 60, partitions = 2).toDF())
    SnapshotTable.append(spark, tblB, Webtext.synthesize(spark, 60, partitions = 2).toDF())
    SnapshotIngest.consume(spark, tblA, idx, numChunks = 1)
    // same outDir, different source table: the marker's table field must
    // refuse — snapshot ids across unrelated tables would silently no-op
    // (prev >= cur) or diff the wrong snapshots
    val e = intercept[IllegalArgumentException] {
      SnapshotIngest.consume(spark, tblB, idx, numChunks = 1)
    }
    assert(e.getMessage.contains(tblA) && e.getMessage.contains(tblB))
    // and the original source keeps working
    assert(SnapshotIngest.consume(spark, tblA, idx)._3 == 0L)
  }

  test("empty append commits a readable empty snapshot; appendedSince(0) = everything since genesis") {
    val tbl = "/tmp/gsnap-genesis"
    rm(tbl)
    import spark.implicits._
    val base = Webtext.synthesize(spark, 50, partitions = 2).toDF()
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], base.schema)
    // Spark's FileFormatWriter emits one schema-bearing empty part file even
    // for a 0-partition plan, so this is a REAL commit — an empty snapshot
    // that reads back as 0 rows (the 0L no-op return in append() stays as
    // belt-and-braces for storage layers that skip empty files)
    val s1 = SnapshotTable.append(spark, tbl, empty)
    assert(s1 == 1L && SnapshotTable.read(spark, tbl).count() == 0L)
    // afterId 0 is the legal GENESIS reference: diff against "nothing"
    assert(SnapshotTable.appendedSince(spark, tbl, 0L).get.count() == 0L)
    val s2 = SnapshotTable.append(spark, tbl, base)
    assert(s2 == 2L)
    assert(SnapshotTable.appendedSince(spark, tbl, 0L).get.count() == 50L)
  }
}
