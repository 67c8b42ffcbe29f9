package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** J4/W4 neighbor window (the reference's get-context surface,
  * reference/backend/api/search_api.py previous/current/next) as a
  * SCALE-SAFE Spark plan.
  *
  * The declarative spelling — `lag/lead over Window.orderBy(id)` with no
  * partition — is correct but moves the ENTIRE table through one partition
  * (WindowExec warns exactly this); at webtext scale that is a single-task
  * sort of the corpus. This operator keeps the same semantics with a plan
  * that scales with cluster width:
  *
  *  1. range-partition by the order key (partition ranges are globally
  *     ordered by construction of RangePartitioner) and sort within each
  *     partition — ONE exchange, the same cost class as any distributed
  *     sort;
  *  2. every partition computes lag/lead locally;
  *  3. only the EDGE rows need cross-partition context: the first+last row
  *     of each non-empty partition (2 rows per partition — bounded by
  *     cluster width, not data size) are collected, each partition's
  *     prev/next neighbor rows are resolved on the driver skipping empty
  *     partitions, and the tiny map is broadcast back.
  *
  * The boundary pass and the main pass read the SAME shuffle output (the
  * exchange's shuffle files are reused), so the table moves once.
  */
object NeighborContext extends Serializable {

  /** lag(id), lead(id) and a `snippetLen`-char prefix of lag(text) over the
    * global `idCol` order. Output: (idCol, prev_id, next_id, prev_snippet).
    */
  def neighbors(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, snippetLen: Int = 20, numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .select(col(idCol).cast(LongType).as(idCol), col(textCol).cast(StringType).as(textCol))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
    // one EXCHANGE, two reads: the boundary pass and the main pass both run
    // jobs over this RDD — the second re-reads the exchange's shuffle files
    // (stage reuse) and re-pays only the partition-local sort, never a
    // second network pass. Deliberately NOT persisted: caching the full
    // table to save a local re-sort is the wrong trade at corpus scale.
    val rdd = ranged.rdd
    def pair(r: Row): (Long, String) = (r.getLong(0), r.getString(1))
    // boundary pass: (pid, first, last) of every non-empty partition
    val bounds: Array[(Int, (Long, String), (Long, String))] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = pair(it.next())
          var last = first
          while (it.hasNext) last = pair(it.next())
          Iterator.single((pid, first, last))
        }
      }.collect().sortBy(_._1)
    // prev/next edge row per partition, skipping empty partitions
    val edges: Map[Int, (Option[(Long, String)], Option[(Long, String)])] =
      bounds.indices.map { k =>
        val (pid, _, _) = bounds(k)
        val prev = if (k > 0) Some(bounds(k - 1)._3) else None
        val next = if (k < bounds.length - 1) Some(bounds(k + 1)._2) else None
        pid -> (prev, next)
      }.toMap
    val bc = spark.sparkContext.broadcast(edges)
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("prev_id", LongType, nullable = true),
      StructField("next_id", LongType, nullable = true),
      StructField("prev_snippet", StringType, nullable = true)))
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (edgePrev, edgeNext) = bc.value.getOrElse(pid,
        (None: Option[(Long, String)], None: Option[(Long, String)]))
      var prev: Option[(Long, String)] = edgePrev
      var pending: Option[(Long, String)] = if (it.hasNext) Some(pair(it.next())) else None
      new Iterator[Row] {
        def hasNext: Boolean = pending.isDefined
        def next(): Row = {
          val cur = pending.get
          pending = if (it.hasNext) Some(pair(it.next())) else None
          val nextId = pending.map(_._1).orElse(edgeNext.map(_._1))
          // code-POINT prefix, not code units: SQL substr counts characters,
          // and a UTF-16 substring could split a surrogate pair
          val snippet = prev.map(_._2).map { t =>
            if (t == null) null
            else if (t.codePointCount(0, t.length) <= snippetLen) t
            else t.substring(0, t.offsetByCodePoints(0, snippetLen))
          }.orNull
          val out = Row(cur._1,
            prev.map(p => java.lang.Long.valueOf(p._1)).orNull,
            nextId.map(java.lang.Long.valueOf).orNull,
            snippet)
          prev = Some(cur)
          out
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
