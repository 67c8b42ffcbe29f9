package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.SparkTestSession

class Uuid5ExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Uuid5Expr matches golden vectors through codegen and interpreted paths") {
    val golden = Seq("https://example.org/en/src0/00000000", "a", "")
      .toDF("name")
      .withColumn("u", Uuid5Expr.uuid5(col("name")))
    assert(golden.select("u").as[String].collect().toSeq == Seq(
      "2107e788-4713-5194-a197-8fa7e0ebfa12",
      "e1407479-3136-56c0-9908-bb02fb0339e2",
      "1b4db7eb-4057-5ddf-91e0-36dec72071f5"))
    // non-foldable source → the expression must run inside whole-stage codegen
    // (a UDF would break the span)
    val df = spark.range(3)
      .withColumn("u", Uuid5Expr.uuid5(concat(lit("doc-"), col("id"))))
    assert(df.select("u").distinct().count() == 3)
    // '*(n)' prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("uuid5"), plan)
    assert(df.withColumn("u2", Uuid5Expr.uuid5(lit("a"))).select("u2")
      .as[String].head() == "e1407479-3136-56c0-9908-bb02fb0339e2")
  }

  test("null propagates") {
    val df = Seq[(java.lang.Long, String)]((1L, null)).toDF("i", "name")
      .withColumn("u", Uuid5Expr.uuid5(col("name")))
    assert(df.select("u").collect()(0).isNullAt(0))
  }
}
