package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.SparkTestSession

class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("analyze_tokens exposes NAMED struct fields term/pos (not tuple _1/_2)") {
    val df = Seq(("the quick brown fox", "en")).toDF("text", "lang")
      .select(explode(GraftFunctions.analyze_tokens(col("text"), col("lang"))).as("tok"))
      .select(col("tok.term"), col("tok.pos")) // the documented access path
    val rows = df.as[(String, Int)].collect().toSeq
    // stop sets are hi/gu (reference parity) — English tokens all survive
    assert(rows == Seq(("the", 0), ("quick", 1), ("brown", 2), ("fox", 3)))
  }

  test("analyze_terms agrees with analyze_tokens' term column") {
    val df = Seq(("जो सुख चाहता है", "hi")).toDF("text", "lang")
    val terms = df.select(GraftFunctions.analyze_terms(col("text"), col("lang")))
      .as[Seq[String]].head()
    val tokTerms = df
      .select(GraftFunctions.analyze_tokens(col("text"), col("lang")).as("t"))
      .select(expr("transform(t, x -> x.term)")).as[Seq[String]].head()
    assert(terms == tokTerms && terms.nonEmpty)
  }
}
