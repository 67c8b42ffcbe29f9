package graft.query

import graft.analysis.Analyzer
import graft.index.{PostingListReader, SortedIds}

/** Engine-core pieces shared by every execution surface of the query engine:
  * the Spark paths in [[Bm25Query]] (driver-collected and executor-side
  * cogroup) and the resident serving path in [[InMemoryIndex]]. Pure
  * functions of blobs — no SparkSession.
  */
object QueryCore {

  /** One posting row: (chunk, term, df, blob, posBlob). */
  type PostRow = (Int, String, Long, Array[Byte], Array[Byte])
  /** One facet row: (chunk, key, df, docIdsBlob). */
  type FacetRow = (Int, String, Long, Array[Byte])

  /** Query-wide immutable context derived from the QuerySpec + corpus stats. */
  case class Ctx(
      terms: Array[(String, Int)], // distinct (term, first qPos)
      phrasePlan: Array[(Int, Int)],
      excludeTerms: Array[String],
      facetSel: Seq[(String, Seq[String])],
      n: Long,
      avgdl: Double,
      mode: String,
      phrase: Boolean,
      k: Int,
      cap: Long) {
    val exSet: Set[String] = excludeTerms.toSet
    val nFilters: Int = facetSel.map(_._1).distinct.size
  }

  /** Build the context; None if the analyzed query is empty. */
  def context(q: QuerySpec, n: Long, avgdl: Double): Option[Ctx] = {
    val terms = Bm25Query.queryTerms(q)
    if (terms.isEmpty) return None
    val termIndex = terms.map(_._1).zipWithIndex.toMap
    val phrasePlan: Array[(Int, Int)] =
      if (!q.phrase) Array.empty
      else Analyzer.analyze(q.query, q.lang).map(t => (termIndex(t.term), t.pos))
    val excludeTerms = q.excludeWords
      .flatMap(w => Analyzer.terms(w, q.lang)).distinct.toArray
    val facetSel: Seq[(String, Seq[String])] =
      q.metaFilters.toSeq ++ q.yearRange.map { case (a, b) =>
        "year" -> (a to b).map(_.toString)
      }.toSeq
    Some(Ctx(terms, phrasePlan, excludeTerms, facetSel, n, avgdl,
      q.mode, q.phrase, q.from + q.pageSize, q.trackTotalHits))
  }

  /** termInfo = (term, qPos, idf from GLOBAL df). */
  def termInfo(ctx: Ctx, dfOf: String => Long): Array[(String, Int, Double)] =
    ctx.terms.map { case (t, p) => (t, p, Bm25.idf(ctx.n, dfOf(t))) }

  /** One segment's kernel over its posting/facet rows. */
  def segmentKernel(ctx: Ctx, info: Array[(String, Int, Double)],
      postList: Array[PostRow], facetList: Array[FacetRow]): Iterator[SegmentResult] = {
    val allowed: Option[SortedIdSet] =
      if (ctx.nFilters == 0) None
      else {
        val byKey = facetList.groupBy(_._2)
        if (byKey.size < ctx.nFilters) Some(new SortedIdSet(Array.empty))
        else {
          val lists = byKey.values.map { rowsOfKey =>
            SortedIds.unionAll(rowsOfKey.map(r => SortedIds.decode(r._4, r._3.toInt)).toSeq)
          }.toArray
          Some(new SortedIdSet(SortedIds.intersectAll(lists)))
        }
      }
    val exIts = postList.filter(r => ctx.exSet.contains(r._2)).map { r =>
      val it = new PostingListReader(r._4, null).iterator()
      it.start(); it
    }
    val tsArr = info.flatMap { case (t, qp, idfV) =>
      postList.find(r => r._2 == t && !ctx.exSet.contains(t)).map { r =>
        val reader = new PostingListReader(r._4, r._5)
        val it = reader.iterator(withPositions = ctx.phrase)
        it.start()
        new TermState(t, it, idfV, reader.maxTfNorm(Bm25.K1, Bm25.B, ctx.avgdl), qp)
      }
    }
    if (ctx.mode == "all" && tsArr.length < info.length) Iterator.empty
    else Iterator.single(SearchKernel.run(tsArr, ctx.avgdl, ctx.mode, ctx.phrase,
      exIts, allowed, ctx.k, ctx.cap, ctx.phrasePlan))
  }

  /** Merge per-segment heaps → (page, totalHits, relation). */
  def merge(q: QuerySpec, segResults: Array[SegmentResult]): (Array[ScoredDoc], Long, String) = {
    val merged = new TopK(q.from + q.pageSize)
    segResults.foreach(_.top.foreach(merged.offer))
    val page = merged.toArray
      .sortBy(s => (-s.score, s.docId))
      .slice(q.from, q.from + q.pageSize)
    val total = math.min(segResults.map(_.hitCount).sum, q.trackTotalHits)
    val relation = if (segResults.exists(_.capped)) "gte" else "eq"
    (page, total, relation)
  }
}
