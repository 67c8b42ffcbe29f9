package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.index.{PostingIterator, PostingListReader, SortedIds, VByte}

/** Query request — mirrors the reference SearchRequest surface
  * (backend/api/search_api.py:180-213): query text, language, exact phrase
  * flag, excluded words, metadata terms-filters, year range, pagination.
  */
case class QuerySpec(
    lang: String,
    query: String,
    mode: String = "all", // "all" = match operator:and; "any" = WAND top-k
    phrase: Boolean = false,
    excludeWords: Seq[String] = Nil,
    metaFilters: Map[String, Seq[String]] = Map.empty,
    yearRange: Option[(Int, Int)] = None,
    pageSize: Int = 20,
    from: Int = 0,
    trackTotalHits: Long = 1000L)

case class Hit(docId: Long, score: Double, url: String, lang: String, highlighted: String)

case class SearchResult(hits: Seq[Hit], totalHits: Long, totalRelation: String,
    suggestions: Seq[String])

/** Loaded index metadata. Segments stay on disk (Parquet); only per-query
  * term rows are read, with predicate pushdown on (lang, term).
  */
case class IndexHandle(dir: String, stats: Map[String, (Long, Long)]) {
  def numDocs(lang: String): Long = stats.get(lang).map(_._1).getOrElse(0L)
  def avgdl(lang: String): Double =
    stats.get(lang).map { case (d, t) => if (d == 0) 0.0 else t.toDouble / d }.getOrElse(0.0)
  def segmentsPath: String =
    if (new java.io.File(s"$dir/segments_compact").exists()) s"$dir/segments_compact"
    else s"$dir/segments"
  def facetsPath: String =
    if (new java.io.File(s"$dir/facets_compact").exists()) s"$dir/facets_compact"
    else s"$dir/facets"
}

object IndexHandle {
  def load(dir: String): IndexHandle = {
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/stats.json"))
    val m = java.util.regex.Pattern
      .compile("\"(\\w+)\":\\s*\\{\"docs\":\\s*(\\d+),\\s*\"totalTokens\":\\s*(\\d+)\\}")
      .matcher(txt)
    val b = Map.newBuilder[String, (Long, Long)]
    while (m.find()) b += m.group(1) -> (m.group(2).toLong, m.group(3).toLong)
    IndexHandle(dir, b.result())
  }
}

/** The query engine: replaces the `client.search(...)` boundary of the
  * reference (backend/search/index_searcher.py:368-373) with Spark jobs over
  * the posting segments.
  *
  * Execution: postings/facet rows for the query terms are read with
  * (lang, term) pushdown, grouped by segment (chunk), and each segment runs
  * the [[SearchKernel]] IN AN EXECUTOR TASK — per-segment parallel top-k, then
  * a driver-side k-way merge of the tiny per-segment heaps. No shuffle of
  * postings ever happens at query time; the only data movement is
  * O(#segments × (from+k)) ScoredDocs.
  */
object Bm25Query {

  /** Below this Σdf the query collects its posting blobs and runs the kernel
    * on the driver (one Spark job instead of a cogroup shuffle); above it the
    * per-segment kernels run in executor tasks. ~5M postings ≈ tens of MB.
    * Driver-side config knob (mutable for tests / tuning).
    */
  @volatile var MaxDriverPostings: Long =
    sys.env.getOrElse("GRAFT_MAX_DRIVER_POSTINGS", "5000000").toLong

  /** Analyze query text with the same analyzer as the index (rank parity
    * precondition) → (term, qPos) pairs; duplicates deduped (Lucene would
    * score duplicate terms twice; the reference UI never issues them — we
    * document dedup as our semantics).
    */
  def queryTerms(q: QuerySpec): Array[(String, Int)] = {
    val toks = Analyzer.analyze(q.query, q.lang)
    val seen = scala.collection.mutable.LinkedHashMap[String, Int]()
    toks.foreach(t => if (!seen.contains(t.term)) seen(t.term) = t.pos)
    seen.toArray
  }

  def search(spark: SparkSession, idx: IndexHandle, q: QuerySpec): SearchResult = {
    val n = idx.numDocs(q.lang)
    val avgdl = idx.avgdl(q.lang)
    val ctxOpt = QueryCore.context(q, n, avgdl)
    if (ctxOpt.isEmpty)
      return SearchResult(Nil, 0L, "eq", suggest(spark, idx, q.lang, q.query))
    val ctx = ctxOpt.get
    val terms = ctx.terms

    val allTerms = (terms.map(_._1) ++ ctx.excludeTerms).distinct
    val posCol = if (ctx.phrase) col("posBlob") else lit(null).cast("binary").as("posBlob")
    val rows = spark.read.parquet(idx.segmentsPath)
      .where(col("lang") === q.lang && col("term").isin(allTerms.toSeq: _*))
      .select(col("chunk"), col("term"), col("df"), col("blob"), posCol)

    // facet rows for filters (terms filter Q4 + year range Q5)
    val facetRows: DataFrame =
      if (ctx.facetSel.isEmpty) null
      else {
        val cond = ctx.facetSel.map { case (k, vs) =>
          col("key") === k && col("value").isin(vs: _*)
        }.reduce(_ || _)
        spark.read.parquet(idx.facetsPath)
          .where(col("lang") === q.lang && cond)
          .select(col("chunk"), col("key"), col("df"), col("docIds"))
      }

    // global df per term across segments (for idf + execution-path choice)
    import spark.implicits._
    val dfMap: Map[String, Long] = rows.groupBy("term").agg(sum("df").as("df"))
      .as[(String, Long)].collect().toMap
    if (q.mode == "all" && terms.exists(t => dfMap.getOrElse(t._1, 0L) == 0L))
      return SearchResult(Nil, 0L, "eq", suggest(spark, idx, q.lang, q.query))
    val info = QueryCore.termInfo(ctx, t => dfMap.getOrElse(t, 0L))

    // path choice: total candidate postings ≈ Σ df over the query's terms.
    // Small → collect the blobs and run kernels ON THE DRIVER (one Spark job,
    // Lucene-like latency). Large (head terms at corpus scale) → per-segment
    // kernels in executor tasks via cogroup (no postings ever concentrate on
    // the driver).
    val totalPostings = dfMap.values.sum
    val segResults: Array[SegmentResult] =
      if (totalPostings <= MaxDriverPostings) {
        val postList = rows.as[QueryCore.PostRow].collect()
        val facetList =
          if (facetRows == null) Array.empty[QueryCore.FacetRow]
          else facetRows.as[QueryCore.FacetRow].collect()
        val facetByChunk = facetList.groupBy(_._1)
        postList.groupBy(_._1).iterator.flatMap { case (chunk, posts) =>
          QueryCore.segmentKernel(ctx, info, posts, facetByChunk.getOrElse(chunk, Array.empty))
        }.toArray
      } else {
        val postingRows = rows.as[QueryCore.PostRow]
        val facetRowsDs =
          if (facetRows == null) spark.emptyDataset[QueryCore.FacetRow]
          else facetRows.as[QueryCore.FacetRow]
        postingRows
          .groupByKey(_._1)
          .cogroup(facetRowsDs.groupByKey(_._1)) { (_: Int, posts, facets) =>
            QueryCore.segmentKernel(ctx, info, posts.toArray, facets.toArray)
          }
          .collect()
      }

    val (page, total, relation) = QueryCore.merge(q, segResults)

    // --- payload fetch (J7: semi-join of winner ids against the doc store) ---
    val hits =
      if (page.isEmpty) Seq.empty[Hit]
      else {
        val ids = page.map(_.docId)
        val docs = spark.read.parquet(s"${idx.dir}/docstore")
          .where(col("docId").isin(ids.toSeq: _*))
          .select("docId", "url", "lang", "text")
          .collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getString(3)))
          .toMap
        val qset = terms.map(_._1).toSet
        page.toSeq.map { sd =>
          val (url, text) = docs(sd.docId)
          Hit(sd.docId, sd.score, url, q.lang, highlight(text, q.lang, qset))
        }
      }
    val sugg = if (hits.isEmpty) suggest(spark, idx, q.lang, q.query) else Nil
    SearchResult(hits, total, relation, sugg)
  }

  /** Whole-field highlighter: wrap every query-term occurrence in <em> tags
    * (reference: unified highlighter, number_of_fragments: 0, <em> tags —
    * index_searcher.py:194-204).
    */
  def highlight(text: String, lang: String, queryTerms: Set[String]): String = {
    val toks = Analyzer.analyze(text, lang).filter(t => queryTerms.contains(t.term))
    if (toks.isEmpty) return text
    val sb = new java.lang.StringBuilder(text.length + toks.length * 9)
    var pos = 0
    toks.sortBy(_.startOffset).foreach { t =>
      if (t.startOffset >= pos) {
        sb.append(text, pos, t.startOffset).append("<em>")
          .append(text, t.startOffset, t.endOffset).append("</em>")
        pos = t.endOffset
      }
    }
    sb.append(text, pos, text.length)
    sb.toString
  }

  /** Spelling suggestions from the index's term dictionary — reference term
    * suggester semantics (index_searcher.py:660-674): min_word_length 3,
    * prefix_length 1, candidates within Damerau-Levenshtein ≤ 2, score =
    * 1 − d/maxLen ≥ 0.6, ranked by (score desc, docFreq desc).
    */
  def suggest(spark: SparkSession, idx: IndexHandle, lang: String, query: String,
      size: Int = 5, minScore: Double = 0.6): Seq[String] = {
    import spark.implicits._
    val qTerms = Analyzer.terms(query, lang).filter(_.length >= 3)
    if (qTerms.isEmpty) return Nil
    val dict = spark.read.parquet(idx.segmentsPath)
      .where(col("lang") === lang)
      .groupBy("term").agg(sum("df").as("df"))
      .where(length(col("term")) >= 3)
    qTerms.toSeq.flatMap { w =>
      val prefix = w.substring(0, 1)
      val wB = w
      val cands = dict
        .where(col("term").startsWith(prefix) && col("term") =!= wB)
        .as[(String, Long)]
        .collect()
      cands.iterator
        .map { case (t, dfv) =>
          val d = damerauLevenshtein(wB, t)
          (t, dfv, 1.0 - d.toDouble / math.max(wB.length, t.length))
        }
        .filter(_._3 >= minScore)
        .toSeq
        .sortBy { case (t, dfv, s) => (-s, -dfv, t) }
        .take(size)
        .map(_._1)
    }.distinct
  }

  /** Optimal-string-alignment Damerau-Levenshtein (the variant Lucene's
    * suggester uses).
    */
  def damerauLevenshtein(a: String, b: String): Int = {
    val m = a.length; val nn = b.length
    if (m == 0) return nn
    if (nn == 0) return m
    val d = Array.ofDim[Int](m + 1, nn + 1)
    for (i <- 0 to m) d(i)(0) = i
    for (j <- 0 to nn) d(0)(j) = j
    for (i <- 1 to m; j <- 1 to nn) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) && a.charAt(i - 2) == b.charAt(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + cost)
    }
    d(m)(nn)
  }
}
