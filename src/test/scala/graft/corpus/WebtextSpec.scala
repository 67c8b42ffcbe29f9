package graft.corpus

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.functions.Uuid5

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class WebtextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("uuid5 matches RFC 4122 v5 golden vectors (python uuid.uuid5)") {
    assert(Uuid5.uuid5("https://example.org/en/src0/00000000") ==
      "2107e788-4713-5194-a197-8fa7e0ebfa12")
    assert(Uuid5.uuid5("a") == "e1407479-3136-56c0-9908-bb02fb0339e2")
    assert(Uuid5.uuid5("") == "1b4db7eb-4057-5ddf-91e0-36dec72071f5")
  }

  test("generator is pure: same (seed,id) → identical doc") {
    val a = Webtext.genDoc(42L, 12345L)
    val b = Webtext.genDoc(42L, 12345L)
    assert(a.url == b.url && a.text == b.text && a.meta == b.meta)
    assert(java.util.Arrays.equals(a.html, b.html))
  }

  test("extraction parity: extractText(html) == text byte-identically (synthetic)") {
    (0L until 500L).foreach { i =>
      val d = Webtext.genDoc(42L, i)
      val extracted = Webtext.extractText(d.html)
      assert(extracted == d.text, s"doc $i")
      assert(java.util.Arrays.equals(extracted.getBytes("UTF-8"), d.text.getBytes("UTF-8")))
    }
  }

  test("corpus is identical at different parallelism (no partition-order dependence)") {
    import spark.implicits._
    val a = Webtext.synthesize(spark, 200, partitions = 1).collect().sortBy(_.docId)
    val b = Webtext.synthesize(spark, 200, partitions = 7).collect().sortBy(_.docId)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.url == y.url && x.text == y.text && x.lang == y.lang)
    }
  }

  test("golden phrases planted: consecutive in doc%101==5, reversed in ==6") {
    val hiPos = (0L until 2000L).find(i => i % 101 == 5 && Webtext.langOf(i) == "hi").get
    val d = Webtext.genDoc(42L, hiPos)
    assert(d.text.contains(Webtext.GoldenPhrase("hi").mkString(" ")))
    val hiNeg = (0L until 2000L).find(i => i % 101 == 6 && Webtext.langOf(i) == "hi").get
    val dn = Webtext.genDoc(42L, hiNeg)
    assert(!dn.text.contains(Webtext.GoldenPhrase("hi").mkString(" ")))
    assert(dn.text.contains(Webtext.GoldenPhrase("hi").reverse.mkString(" ")))
  }

  test("head terms are frequent enough to need salting (df > 8% of lang docs)") {
    val docs = (0L until 3000L).map(i => Webtext.genDoc(42L, i))
    val hi = docs.filter(_.lang == "hi")
    val head = "hihead0"
    val df = hi.count(_.text.contains(head))
    assert(df > hi.size * 8 / 100, s"head term df=$df of ${hi.size}")
  }

  test("fromDocuments derives the input_hint shape deterministically") {
    val df = Webtext.fromDocuments(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("doc_id", "url", "warc_ts", "html", "text", "lang", "source", "meta"))
    val row = df.orderBy("doc_id").limit(1).collect()(0)
    assert(row.getAs[String]("url") == "https://example.org/es/src0/00000000")
    assert(row.getAs[java.sql.Timestamp]("warc_ts").toInstant ==
      java.time.Instant.parse("2020-01-01T00:00:00Z"))
    // extraction parity on the derived corpus
    val rows = df.limit(100).collect()
    rows.foreach { r =>
      assert(Webtext.extractText(r.getAs[Array[Byte]]("html")) == r.getAs[String]("text"))
    }
  }
}
