package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.index.{PostingListMerger, PostingListReader, SortedIds}

/** Resident serving layer — the analog of the reference's always-on
  * OpenSearch process (its prod serving box is a 2-vCPU/4 GB VM,
  * DEPLOYMENT.md:181): Spark BUILDS the index; a query node loads the
  * segments once and serves top-k lookups at memory latency, no Spark job per
  * query.
  *
  * Load-time work: per-(lang,term) chunk segments are k-way merged into one
  * resident posting list (same [[PostingListMerger]] as the build), facet
  * lists decoded, doc payloads kept for highlighting. Identical results to
  * the Spark paths are gated by RankParitySpec.
  */
final class InMemoryIndex(
    stats: Map[String, (Long, Long)],
    postings: java.util.HashMap[(String, String), (Long, Array[Byte], Array[Byte])],
    facets: Map[(String, String, String), Array[Long]],
    dict: Map[String, Array[(String, Long)]],
    docs: java.util.HashMap[Long, (String, String)]) {

  private def numDocs(lang: String): Long = stats.get(lang).map(_._1).getOrElse(0L)
  private def avgdl(lang: String): Double =
    stats.get(lang).map { case (d, t) => if (d == 0) 0.0 else t.toDouble / d }.getOrElse(0.0)

  def search(q: QuerySpec): SearchResult = {
    val ctxOpt = QueryCore.context(q, numDocs(q.lang), avgdl(q.lang))
    if (ctxOpt.isEmpty) return SearchResult(Nil, 0L, "eq", suggest(q.lang, q.query))
    val ctx = ctxOpt.get
    def dfOf(t: String): Long =
      Option(postings.get((q.lang, t))).map(_._1).getOrElse(0L)
    if (q.mode == "all" && ctx.terms.exists(t => dfOf(t._1) == 0L))
      return SearchResult(Nil, 0L, "eq", suggest(q.lang, q.query))
    val info = QueryCore.termInfo(ctx, dfOf)

    val allTerms = (ctx.terms.map(_._1) ++ ctx.excludeTerms).distinct
    val postList: Array[QueryCore.PostRow] = allTerms.flatMap { t =>
      Option(postings.get((q.lang, t))).map { case (df, blob, posBlob) =>
        (0, t, df, blob, if (ctx.phrase) posBlob else null)
      }
    }
    val metaFacetList: Array[QueryCore.FacetRow] = ctx.facetSel.flatMap { case (key, vs) =>
      vs.flatMap { v =>
        facets.get((q.lang, key, v)).map { ids =>
          // re-encode-free path: wrap as a pre-decoded facet row
          (0, key, ids.length.toLong, encodeIds(ids))
        }
      }
    }.toArray
    // Q5 date-filter rows: relabel matching (key, value) lists with the
    // synthetic keys the kernel's OR-filter consumes (same as the Spark read
    // layer, Bm25Query.facetReadDf)
    val dateFacetList: Array[QueryCore.FacetRow] = ctx.dateSel match {
      case None => Array.empty
      case Some((sOpt, eOpt)) =>
        val rows = scala.collection.mutable.ArrayBuffer[QueryCore.FacetRow]()
        facets.foreach { case ((lang, key, value), ids) =>
          if (lang == q.lang) {
            val label: Option[String] = key match {
              case "date" if sOpt.forall(value >= _) && eOpt.forall(value <= _) =>
                Some(QueryCore.DateInKey)
              case "has_date" if value == "0" => Some(QueryCore.NoDateKey)
              case "series_start_date" if eOpt.exists(value <= _) =>
                Some(QueryCore.SeriesStartOkKey)
              case "series_end_date" if sOpt.exists(value >= _) =>
                Some(QueryCore.SeriesEndOkKey)
              case _ => None
            }
            label.foreach(l => rows += ((0, l, ids.length.toLong, encodeIds(ids))))
          }
        }
        rows.toArray
    }
    val facetList = metaFacetList ++ dateFacetList

    val segResults = QueryCore.segmentKernel(ctx, info, postList, facetList).toArray
    val (page, total, relation) = QueryCore.merge(q, segResults)

    val qset = ctx.terms.map(_._1).toSet
    val hits = page.toSeq.map { sd =>
      val (url, text) = Option(docs.get(sd.docId)).getOrElse(("", ""))
      Hit(sd.docId, sd.score, url, q.lang, Bm25Query.highlight(text, q.lang, qset))
    }
    val sugg = if (hits.isEmpty) suggest(q.lang, q.query) else Nil
    SearchResult(hits, total, relation, sugg)
  }

  private def encodeIds(ids: Array[Long]): Array[Byte] = {
    val deltas = new Array[Long](ids.length)
    var prev = 0L
    var i = 0
    while (i < ids.length) { deltas(i) = ids(i) - prev; prev = ids(i); i += 1 }
    graft.index.VByte.encode(deltas)
  }

  /** Spelling suggestions from the resident term dictionary (Q8 semantics,
    * same scoring as [[Bm25Query.suggest]]).
    */
  def suggest(lang: String, query: String, size: Int = 5, minScore: Double = 0.6): Seq[String] = {
    val qTerms = Analyzer.terms(query, lang).filter(_.length >= 3)
    val d = dict.getOrElse(lang, Array.empty)
    qTerms.toSeq.flatMap { w =>
      val prefix = w.charAt(0)
      d.iterator
        .filter { case (t, _) => t.length >= 3 && t.nonEmpty && t.charAt(0) == prefix && t != w }
        .map { case (t, dfv) =>
          val dist = Bm25Query.damerauLevenshtein(w, t)
          (t, dfv, 1.0 - dist.toDouble / math.max(w.length, t.length))
        }
        .filter(_._3 >= minScore)
        .toSeq
        .sortBy { case (t, dfv, s) => (-s, -dfv, t) }
        .take(size)
        .map(_._1)
    }.distinct
  }
}

object InMemoryIndex {

  /** Term-shard id of a term — must match the `bucket` column written at
    * build time (IndexBuild.toSegment).
    */
  def bucketOf(term: String): Int =
    Math.floorMod(term.hashCode, graft.index.IndexBuild.DefaultBuckets)

  /** Load (and per-term merge) segments of an index into memory.
    *
    * MEMORY BOUND / SHARDING: a resident node's footprint is the posting
    * bytes of the buckets it loads (plus facets + optional doc payloads).
    * Pass `buckets` to load only an assigned TERM-shard subset — the
    * serving-fleet model at scale: terms are hash-sharded by `bucket`, a
    * query routes to the node(s) owning its terms' buckets, and a
    * bucket-subset node returns results identical to a full node for any
    * query whose terms fall inside its shards (gated by RankParitySpec).
    *
    * @param withDocs also load (url, text) payloads for highlighting
    * @param buckets  term-shard subset to load; None = all buckets
    */
  def load(spark: SparkSession, idx: IndexHandle, withDocs: Boolean = true,
      buckets: Option[Set[Int]] = None): InMemoryIndex = {
    import spark.implicits._
    val postings = new java.util.HashMap[(String, String), (Long, Array[Byte], Array[Byte])]()
    val segRead = spark.read.parquet(idx.segmentsPath)
    val segSel = buckets match {
      case Some(bs) => segRead.where(col("bucket").isin(bs.toSeq: _*))
      case None     => segRead
    }
    segSel
      .select("lang", "term", "blob", "posBlob")
      .as[(String, String, Array[Byte], Array[Byte])]
      .collect()
      .groupBy(r => (r._1, r._2))
      .foreach { case (key, rows) =>
        val (blob, posBlob, df, _) =
          PostingListMerger.merge(rows.map(r => (r._3, r._4)).toSeq)
        postings.put(key, (df.toLong, blob, posBlob))
      }
    val facets = spark.read.parquet(idx.facetsPath)
      .select("lang", "key", "value", "df", "docIds")
      .as[(String, String, String, Long, Array[Byte])]
      .collect()
      .groupBy(r => (r._1, r._2, r._3))
      .map { case (key, rows) =>
        val all = rows.flatMap(r => SortedIds.decode(r._5, r._4.toInt))
        java.util.Arrays.sort(all)
        key -> all
      }
    val dict: Map[String, Array[(String, Long)]] = {
      import scala.jdk.CollectionConverters._
      postings.entrySet().asScala.toSeq
        .groupBy(_.getKey._1)
        .map { case (lang, es) =>
          lang -> es.map(e => (e.getKey._2, e.getValue._1)).toArray
        }
    }
    val docs = new java.util.HashMap[Long, (String, String)]()
    if (withDocs) {
      spark.read.parquet(s"${idx.dir}/docstore")
        .select("docId", "url", "text")
        .as[(Long, String, String)]
        .collect()
        .foreach { case (id, url, text) => docs.put(id, (url, text)) }
    }
    new InMemoryIndex(loadStats(idx), postings, facets, dict, docs)
  }

  private def loadStats(idx: IndexHandle): Map[String, (Long, Long)] = {
    // IndexHandle already parsed stats.json
    idx.stats
  }
}
