package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.SparkTestSession

class IncrementalEventsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming windowed agg over events == batch plan (AvailableNow drain)") {
    // the streaming file source wants a DIRECTORY of files
    val dir = "/tmp/graft-stream-events"
    val d = new java.io.File(dir)
    if (!d.exists()) {
      d.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
    }
    val streamed = IncrementalEvents.windowedCounts(spark, dir, "inc_events_test")
      .collect().map(r => (r.getStruct(0).toString, r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val batch = IncrementalEvents.windowedCountsBatch(spark, dir)
      .collect().map(r => (r.getStruct(0).toString, r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("missing events dir fails with guidance, and an explicit schema bootstraps it") {
    // same contract as IncrementalIndex.run: before the producer's first
    // file there is nothing to infer — pre-fix this threw Spark's opaque
    // AnalysisException instead of the pass-schema-explicitly message
    val none = "/tmp/graft-stream-events-none"
    val d = new java.io.File(none)
    if (d.exists()) scala.reflect.io.Directory(d).deleteRecursively()
    val e = intercept[IllegalArgumentException] {
      IncrementalEvents.windowedCounts(spark, none, "inc_events_none")
    }
    assert(e.getMessage.contains("pass schema= explicitly"))
    // with an explicit schema the stream starts on an EMPTY (just-created)
    // dir and drains to an empty result instead of failing
    d.mkdirs()
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    val out = IncrementalEvents.windowedCounts(spark, none, "inc_events_boot", schema)
    assert(out.collect().isEmpty)
  }
}
