package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NeighborContext must equal the naive single-partition window plan
  * (`lag/lead over Window.orderBy`) on every topology: more partitions than
  * rows (empty partitions), one partition, single-row input, null text, and
  * non-contiguous ids.
  */
class NeighborContextSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("neighbor-context-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy("doc_id")
    df.select(col("doc_id"),
        lag("doc_id", 1).over(w).as("prev_id"),
        lead("doc_id", 1).over(w).as("next_id"),
        substring(lag("text", 1).over(w), 1, 20).as("prev_snippet"))
      .orderBy("doc_id")
  }

  private def check(df: org.apache.spark.sql.DataFrame, parts: Int): Unit = {
    val got = NeighborContext.neighbors(spark, df, "doc_id", "text",
      numPartitions = parts).orderBy("doc_id").collect().toSeq
    val want = naive(df).collect().toSeq
    assert(got == want, s"parts=$parts")
  }

  test("matches the naive global window across partition counts incl. empties") {
    import spark.implicits._
    // non-contiguous ids, unsorted input, text longer and shorter than 20
    val df = Seq(
      (7L, "alpha"), (2L, "b" * 50), (31L, "gamma"), (12L, "delta"),
      (5L, "x"), (19L, "y" * 21), (3L, "short"))
      .toDF("doc_id", "text")
      .repartition(3)
    for (parts <- Seq(1, 2, 3, 7, 64)) check(df, parts)
  }

  test("single row, null text, empty input") {
    import spark.implicits._
    check(Seq((42L, "only")).toDF("doc_id", "text"), 8)
    val withNull = Seq((1L, "a"), (2L, null: String), (3L, "c"))
      .toDF("doc_id", "text")
    check(withNull, 2)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      withNull.schema)
    assert(NeighborContext.neighbors(spark, empty, "doc_id", "text",
      numPartitions = 4).count() == 0)
  }

  test("null or non-castable order-key values are a contract error, not an NPE") {
    import spark.implicits._
    val withNullId = Seq((java.lang.Long.valueOf(1L), "a"), (null: java.lang.Long, "b"))
      .toDF("doc_id", "text")
    val e = intercept[org.apache.spark.SparkException] {
      NeighborContext.neighbors(spark, withNullId, "doc_id", "text",
        numPartitions = 2).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("doc_id")))
    // string ids that fail the LongType cast error out too — under ANSI
    // (Spark 4 default) the cast itself throws a clear SparkNumberFormat
    // error; with ANSI off the cast nulls and the guard above fires
    val strIds = Seq(("a17", "x"), ("9", "y")).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      NeighborContext.neighbors(spark, strIds, "doc_id", "text",
        numPartitions = 2).collect()
    }
    assert(causes(e2).exists(c => c.isInstanceOf[IllegalArgumentException] ||
      c.getClass.getName.contains("NumberFormat")))
  }

  test("plan has no single-partition WindowExec; scales with the partition count") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong * 3, s"text $i")).toDF("doc_id", "text")
    val out = NeighborContext.neighbors(spark, df, "doc_id", "text", numPartitions = 16)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "the scale-safe plan must not contain a WindowExec")
    check(df, 16)
  }
}
