package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer

/** Obviously-correct full-scan BM25 scorer — the in-repo ORACLE for rank
  * parity (SURVEY §5.2#4): a pure declarative DataFrame plan with the same
  * analyzer and the same formula as the WAND engine, but none of its
  * machinery (no postings, no skips, no pruning). The distributed WAND engine
  * must return identical docIDs and scores (ε) on the reference-style query
  * set. Also serves as the index-free scoring path.
  */
object NaiveBm25 {

  private val tokensUdf = udf((text: String, lang: String) =>
    Analyzer.analyze(text, lang).map(t => (t.term, t.pos)).toSeq)

  /** Score a query against a docstore-shaped DataFrame
    * (docId, lang, text, dl [, meta, year]). Returns (docId, score, matched)
    * rows for ALL matching docs (AND or OR semantics), unsorted.
    */
  def scoreAll(spark: SparkSession, docstore: DataFrame, q: QuerySpec): DataFrame = {
    import spark.implicits._
    val terms = Bm25Query.queryTerms(q)
    require(terms.nonEmpty, "empty analyzed query")
    val termSeq = terms.map(_._1).toSeq

    val corpus = docstore.where(col("lang") === q.lang) // stats over full lang corpus
    val docsF = applyFilters(corpus, q)

    val statsRow = corpus.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).collect()(0)
    val n = statsRow.getLong(0)
    // an empty language corpus has a NULL avgdl — the engine returns an
    // empty page there, so the oracle must yield zero rows, not NPE
    if (n == 0L)
      return corpus.select(col("docId"), lit(0.0).as("score"),
        lit(0L).as("matched")).limit(0)
    val avgdl = statsRow.getDouble(1)

    val toks = corpus
      .select(col("docId"), explode(tokensUdf(col("text"), col("lang"))).as("t"))
      .select(col("docId"), col("t._1").as("term"), col("t._2").as("pos"))
      .where(col("term").isin(termSeq: _*))
    val tf = toks.groupBy("docId", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val k1 = Bm25.K1
    val b = Bm25.B
    val scored = tf
      .join(broadcast(dfT), "term")
      .join(docsF.select(col("docId"), col("dl")), "docId") // filters applied here
      .withColumn("idf", log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("tfn", col("tf") / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
      .withColumn("s", col("idf") * col("tfn"))
      .groupBy("docId")
      .agg(sum(col("s")).as("score"), count(lit(1)).as("matched"))

    val afterMode =
      if (q.mode == "all") scored.where(col("matched") === terms.length)
      else scored

    val afterPhrase =
      if (!q.phrase) afterMode
      else {
        // full analyzed token list — repeated words keep their own positions
        val phraseTokens: Array[(String, Int)] =
          Analyzer.analyze(q.query, q.lang).map(t => (t.term, t.pos))
        val phraseOk = udf((text: String, lang: String) => {
          val toks = Analyzer.analyze(text, lang)
          val posOf = phraseTokens.map { case (t, _) =>
            toks.filter(_.term == t).map(_.pos).toArray.sorted
          }
          val anchor = posOf(0)
          anchor.exists { p0 =>
            val base = p0 - phraseTokens(0)._2
            base >= 0 && phraseTokens.indices.forall { j =>
              java.util.Arrays.binarySearch(posOf(j), base + phraseTokens(j)._2) >= 0
            }
          }
        })
        afterMode.join(corpus.select("docId", "text", "lang"), "docId")
          .where(phraseOk(col("text"), col("lang")))
          .select(col("docId"), col("score"), col("matched"))
      }

    val afterExclude =
      if (q.excludeWords.isEmpty) afterPhrase
      else {
        val exTerms = q.excludeWords.flatMap(w => Analyzer.terms(w, q.lang)).distinct
        val excludedDocs = corpus
          .select(col("docId"), explode(tokensUdf(col("text"), col("lang"))).as("t"))
          .where(col("t._1").isin(exTerms: _*))
          .select("docId").distinct()
        afterPhrase.join(excludedDocs, Seq("docId"), "left_anti")
      }
    afterExclude
  }

  private def applyFilters(docs: DataFrame, q: QuerySpec): DataFrame = {
    var d = docs
    q.metaFilters.foreach { case (k, vs) =>
      // "year"/"has_date" are DERIVED facets (the build rejects them as
      // user meta keys) — the oracle must resolve them the same way the
      // engine's facet index does, not against the meta map (where they
      // are always null)
      val valueCol = k match {
        case "year"     => year(col("warc_ts")).cast("string")
        case "has_date" =>
          when(element_at(col("meta"), "date").isNotNull, "1").otherwise("0")
        case _          => element_at(col("meta"), k)
      }
      d = d.where(valueCol.isin(vs: _*))
    }
    q.yearRange.foreach { case (a, z) =>
      d = d.where(year(col("warc_ts")).between(a, z))
    }
    // Q5 reference date semantics from doc metadata (index_searcher.py:64-150)
    q.dateRange.foreach { case (sOpt, eOpt) =>
      if (sOpt.isDefined || eOpt.isDefined) {
        val s0 = sOpt.map(graft.Fmt.yearStart)
        val e0 = eOpt.map(graft.Fmt.yearEnd)
        val dateCol = element_at(col("meta"), "date")
        val ssCol = element_at(col("meta"), "series_start_date")
        val seCol = element_at(col("meta"), "series_end_date")
        var inRange = dateCol.isNotNull
        s0.foreach(s => inRange = inRange && dateCol >= s)
        e0.foreach(e => inRange = inRange && dateCol <= e)
        var series = dateCol.isNull
        e0.foreach(e => series = series && ssCol.isNotNull && ssCol <= e)
        s0.foreach(s => series = series && seCol.isNotNull && seCol >= s)
        d = d.where(inRange || series)
      }
    }
    d
  }

  /** Full oracle search: top-k page + exact total, same tie-break as the
    * engine (score desc, docId asc).
    */
  def search(spark: SparkSession, docstore: DataFrame, q: QuerySpec): (Seq[ScoredDoc], Long) = {
    val terms = Bm25Query.queryTerms(q)
    if (terms.isEmpty) return (Nil, 0L)
    // persist: count() and the top-k collect would otherwise EACH re-run
    // the corpus-wide tokenize-explode-join scan (the oracle's dominant
    // cost) — persisting halves every rank-parity gate's oracle runtime
    val all = scoreAll(spark, docstore, q)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = all.count()
      val page = all.orderBy(col("score").desc, col("docId").asc)
        .limit(q.from + q.pageSize)
        .collect()
        .map(r => ScoredDoc(r.getLong(0), r.getDouble(1)))
        .toSeq
        .slice(q.from, q.from + q.pageSize)
      (page, total)
    } finally all.unpersist()
  }
}
