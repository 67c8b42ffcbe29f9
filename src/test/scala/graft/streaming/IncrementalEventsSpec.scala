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
}
