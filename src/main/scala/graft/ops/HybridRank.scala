package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Hybrid result fusion — the reference's result_ranker
  * (backend/search/result_ranker.py:46-104): lexical and vector result sets
  * are FULL OUTER joined on the doc key, each side's scores normalized by its
  * max (A8, :72-78), combined 0.6·lexical + 0.4·vector (W3, :81-104), deduped
  * (U5, :53-57), sorted desc and paginated.
  */
object HybridRank {

  val LexicalWeight = 0.6
  val VectorWeight = 0.4

  /** @param lexical (doc_id, score)   @param vector (doc_id, score) */
  def fuse(lexical: DataFrame, vector: DataFrame, k: Int): DataFrame = {
    // dedup keeps the MAX score per doc (dropDuplicates keeps an arbitrary
    // row — partition-order-dependent ranking); the normalization max rides
    // the same plan as a broadcast cross join, so the whole fusion is ONE
    // Spark action and Catalyst's exchange reuse computes each side's
    // aggregation once (no driver-side collect jobs re-running the inputs)
    def side(df: DataFrame, norm: String): DataFrame = {
      val deduped = df.groupBy("doc_id").agg(max("score").as("score"))
      val m = deduped.agg(max("score").as("m"))
      // the reference's exact guard (result_ranker.py:14-21): max == 0 →
      // every score normalizes to 0; otherwise divide by the REAL max. The
      // old greatest(m, 1e-12) floor corrupted the all-negative case (a
      // vector side anti-correlated with every candidate): dividing by the
      // epsilon exploded scores ~1e12× instead of by the actual max.
      // Residual quirk, kept DELIBERATELY for parity: dividing by a
      // NEGATIVE max (possible only when every candidate on a side scores
      // < 0 — never BM25, only an anti-correlated cosine side) flips that
      // side's order, in our arithmetic and in result_ranker.py's alike.
      // "Fixing" it here would diverge from the reference's ranking.
      deduped.crossJoin(F.broadcast(m))
        .select(col("doc_id"),
          when(coalesce(col("m"), lit(0.0)) === 0.0, lit(0.0))
            .otherwise(col("score") / col("m")).as(norm))
    }
    val l = side(lexical, "l_norm")
    val v = side(vector, "v_norm")
    l.join(v, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(lit(LexicalWeight) * coalesce(col("l_norm"), lit(0.0)) +
          lit(VectorWeight) * coalesce(col("v_norm"), lit(0.0)), 6).as("hybrid_score"))
      .orderBy(col("hybrid_score").desc, col("doc_id"))
      .limit(k)
  }

  /** Lexical-vs-vector routing predicate — reference `is_lexical_query`
    * (backend/search/index_searcher.py:727-743) verbatim: a query routes to
    * the lexical engine unless it contains ANY of Python's
    * `string.punctuation` (all 32 ASCII marks) or the danda/double-danda, or
    * has ≥ 4 whitespace-separated words. An empty query is "lexical" (the
    * reference's `''.split()` is empty → 0 < 4), callers short-circuit it
    * upstream.
    */
  private val RoutingPunct: Set[Char] =
    """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".toSet + '।' + '॥'

  def isLexicalQuery(query: String): Boolean = {
    if (query == null) return true
    if (query.exists(RoutingPunct.contains)) return false
    // (?U): Python's str.split() splits on UNICODE whitespace (NBSP
    // included) — Java's bare \s is ASCII-only and would count an
    // NBSP-separated 4-word query as one word, routing it differently
    // than the reference
    query.trim.split("(?U)\\s+").count(_.nonEmpty) < 4
  }
}
