package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine behind /api/similar-documents/{doc_id} (reference
  * search_api.py:460-485 → index_searcher.py:505-567 find_similar_by_id):
  * fetch the source doc's embedding, kNN for the `size` nearest vectors with
  * the source excluded (the reference's must_not ids clause), return
  * (neighbor docId, cosine) pairs for payload assembly.
  *
  * The ANN path is the oracled IVF structure ([[graft.ops.Similarity.ivfTopK]]
  * — cell equi-join, self-exclusion built in); vectors come from the
  * synthetic embeddings table keyed by doc id. MODEL SWAP POINT (SURVEY
  * §7.0): a production deployment replaces this table with bge-m3 embeddings
  * of the docstore text (reference embedding_models.py:73-83) — every join
  * and the endpoint shape stay identical.
  */
final class SimilarDocs(spark: SparkSession, embeddings: DataFrame,
    nlist: Int = 16, nProbe: Int = 4,
    /** serve from a RESIDENT per-node HNSW graph (the reference's actual
      * structure, opensearch-config.yaml:152-160) instead of the IVF Spark
      * path: memory-latency answers, recall-gated in HnswSpec. On a
      * doc-sharded fleet each node holds the graph of its own shard's
      * vectors — same fan-out/merge as every other serving structure. */
    residentHnsw: Boolean = false) {

  // vectors are served repeatedly — keep the (vec_id, embedding) projection
  // resident like the node's other serving structures
  private val emb = embeddings.select("vec_id", "embedding").cache()

  private lazy val graph: graft.ops.Hnsw.Graph = {
    import spark.implicits._
    val rows = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    // empty embedding table → empty graph (every lookup misses → the
    // reference's ([], 0) shape), not a head-of-empty crash on first request
    val g = new graft.ops.Hnsw.Graph(rows.headOption.map(_._2.length).getOrElse(1))
    rows.foreach { case (id, v) => g.insert(id, v) }
    g // the graph itself serves by-id vector lookup — no second vector copy
  }

  /** Neighbor (docId, cosine) pairs, best first; Nil when the doc has no
    * vector (reference returns ([], 0) for both missing-doc and no-vector).
    */
  def similar(docId: Long, size: Int = 10): Seq[(Long, Double)] = {
    import spark.implicits._
    if (residentHnsw)
      graph.vectorOf(docId).map { v =>
        graph.search(v, size + 1).filter(_._1 != docId).take(size)
      }.getOrElse(Nil)
    else {
      val q = emb.where(col("vec_id") === docId)
      if (q.take(1).isEmpty) Nil
      else graft.ops.Similarity.ivfTopK(emb, q, size, nlist, nProbe)
        .orderBy("rank")
        .select("vec_id", "sim")
        .as[(Long, Double)]
        .collect()
        .toSeq
    }
  }
}
