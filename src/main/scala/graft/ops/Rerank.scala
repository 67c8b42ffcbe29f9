package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer

/** W2 rerank — reference `backend/common/reranker.py:19-55` +
  * `backend/search/index_searcher.py:441-475`: rescore the top-N lexical
  * candidates with a (query, passage) cross-scorer and reorder.
  *
  * The reference's scorer is an external ONNX cross-encoder
  * (BAAI/bge-reranker) — model-dependent and out of sandbox scope. The
  * PLUMBING here is the real thing with the reference's cost controls
  * (rerank depth 40, 1000-char passage truncation, executor-side batch
  * scoring); the scorer is a deterministic lexical proxy — analyzed-unigram
  * Jaccard between query and truncated passage — swappable for a model UDF
  * at [[scoreUdf]]. Because the proxy is a pure function of the texts, the
  * whole operator is verifiable by an external SQL oracle.
  */
object Rerank {

  /** reference rerank_depth (index_searcher.py:441-443) */
  val Depth = 40
  /** reference passage truncation (reranker.py:19-33) */
  val TruncateChars = 1000

  /** Deterministic cross-score: Jaccard of analyzed unigram sets between the
    * query and the TRUNCATED passage. THE MODEL SWAP POINT — replace with a
    * cross-encoder session call per batch for the reference's semantics.
    */
  def crossScore(queryTerms: Set[String], text: String, lang: String): Double = {
    if (text == null) return 0.0 // a null passage scores 0, never NPEs the job
    val ts = Analyzer.terms(text.take(TruncateChars), lang).toSet
    if (queryTerms.isEmpty || ts.isEmpty) 0.0
    else {
      val inter = queryTerms.intersect(ts).size
      inter.toDouble / (queryTerms.size + ts.size - inter)
    }
  }

  private def scoreUdf(queryTerms: Set[String], lang: String) =
    udf((text: String) => crossScore(queryTerms, text, lang))

  /** Rerank a candidate page: keep the top `Depth` by the retrieval score,
    * rescore each passage in executor tasks, reorder by (rerank score desc,
    * retrieval score desc, doc id asc), return `k`.
    *
    * @param hits (idCol, scoreCol, textCol) candidate rows (already a page —
    *             tiny; the scoring UDF runs where the rows live)
    */
  def rerank(hits: DataFrame, query: String, lang: String, k: Int,
      idCol: String = "doc_id", scoreCol: String = "score",
      textCol: String = "text"): DataFrame = {
    val qTerms = Analyzer.terms(query, lang).toSet
    hits
      .orderBy(col(scoreCol).desc, col(idCol))
      .limit(Depth)
      .withColumn("rerank_score", round(scoreUdf(qTerms, lang)(col(textCol)), 6))
      .orderBy(col("rerank_score").desc, col(scoreCol).desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("rerank_score"), col(scoreCol))
  }
}
