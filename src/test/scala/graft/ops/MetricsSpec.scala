package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.SparkTestSession

class MetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("line format round-trips through parse, with the reference escaping") {
    // a query containing every escaped character class (search_api.py:444-445)
    val line = Metrics.lineStr(
      tsMillis = 1735689600000L, // 2025-01-01 00:00:00 UTC
      clientIp = "10.1.2.3",
      query = "hello, \"world\"\nnext\rline",
      searchType = "lexical", exactMatch = true,
      categories = "['A', 'B']", language = "hi",
      enableReranking = false, pageSize = 20, pageNumber = 2,
      latencyMs = 12.5, totalResults = 7, zone = java.time.ZoneOffset.UTC)
    assert(line ==
      "2025-01-01 00:00:00,10.1.2.3,hello; 'world' nextline,lexical,true," +
        "['A'; 'B'],hi,false,20,2,12.5,7")
    val parsed = Metrics.parse(Seq(line).toDF("line")).collect()(0)
    assert(parsed.getAs[String]("client_ip") == "10.1.2.3")
    assert(parsed.getAs[String]("query") == "hello; 'world' nextline")
    assert(parsed.getAs[Boolean]("exact_match"))
    assert(parsed.getAs[String]("categories") == "['A'; 'B']")
    assert(!parsed.getAs[Boolean]("enable_reranking"))
    assert(parsed.getAs[Int]("page_size") == 20 && parsed.getAs[Int]("page_number") == 2)
    assert(parsed.getAs[Double]("latency_ms") == 12.5)
    assert(parsed.getAs[Int]("total_results") == 7)
    assert(parsed.getAs[String]("date") == "2025-01-01")
    assert(parsed.getAs[Boolean]("has_results"))
  }

  test("parse skips malformed lines like the exporter (short, bad ts, bad numbers)") {
    val good = Metrics.lineStr(1735689600000L, "1.2.3.4", "q", "lexical",
      exactMatch = false, "[]", "hi", enableReranking = false, 20, 1, 3.0, 0, java.time.ZoneOffset.UTC)
    val lines = Seq(
      good,
      "too,short,line",                                             // <12 fields
      "not-a-ts,ip,q,lexical,false,[],hi,false,20,1,3.0,5",         // bad timestamp
      "2025-01-01 00:00:00,ip,q,lexical,false,[],hi,false,NaNpage,1,3.0,5", // bad int
      "").toDF("line")
    val parsed = Metrics.parse(lines.where(col("line") =!= "")).collect()
    assert(parsed.length == 1)
    assert(parsed(0).getAs[Int]("total_results") == 0)
    assert(!parsed(0).getAs[Boolean]("has_results"))
  }

  test("summary groups the exporter's --summary statistics") {
    val mk = (id: Long) => Metrics.lineStr(
      1735689600000L + (id % 2) * 86400000L, s"10.0.0.${id % 3}", s"q$id",
      if (id % 2 == 0) "lexical" else "vector", exactMatch = false, "[]",
      "hi", enableReranking = false, 20, 1, (id % 10).toDouble, (id % 4).toInt,
      java.time.ZoneOffset.UTC)
    val parsed = Metrics.parse((0L until 24L).map(mk).toDF("line"))
    val rows = Metrics.summary(parsed)
      .orderBy("date", "search_type").collect()
    // ids 0..23: even ids → lexical on 2025-01-01, odd → vector on 01-02
    assert(rows.length == 2)
    val lex = rows(0)
    assert(lex.getAs[String]("date") == "2025-01-01")
    assert(lex.getAs[String]("search_type") == "lexical")
    assert(lex.getAs[Long]("n_queries") == 12L)
    assert(lex.getAs[Long]("n_zero") == 6L)       // id%4==0 among evens
    assert(lex.getAs[Long]("unique_ips") == 3L)   // even ids mod 3 cycle {0,2,1}
    assert(lex.getAs[Double]("avg_latency_ms") ==
      (0L until 24L).filter(_ % 2 == 0).map(_ % 10).sum / 12.0)
  }
}
