package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** What the /api/similar-documents endpoint needs from an ANN engine —
  * implemented by a resident [[SimilarDocs]] node and by the fleet scatter
  * ([[FleetSimilar]]), so the endpoint is topology-agnostic like the rest of
  * the serving surface.
  */
trait SimilarEngine {
  /** Neighbor (docId, cosine) pairs, best first; Nil when the doc is unknown
    * or has no vector (the reference returns ([], 0) for both,
    * search_api.py:460-485).
    */
  def similar(docId: Long, size: Int = 10): Seq[(Long, Double)]
}

/** Engine behind /api/similar-documents/{doc_id} (reference
  * search_api.py:460-485 → index_searcher.py:505-567 find_similar_by_id):
  * fetch the source doc's embedding, kNN with the source excluded (the
  * reference's must_not ids clause), return (neighbor docId, cosine) pairs
  * for payload assembly.
  *
  * Serving structure: RESIDENT HNSW — the reference's actual kNN index
  * (opensearch-config.yaml:152-160, method hnsw), answered at memory
  * latency with no Spark job on the request path. ONE GRAPH PER CHUNK
  * (vec_id mod numChunks, the same doc sharding as the inverted index —
  * OpenSearch's graph-per-segment model): a query probes every local graph
  * and merges, so
  *   - a chunk-subset fleet node builds graphs for ITS chunks only (memory
  *     bounded by the shard, never the corpus), and
  *   - a fleet's scatter-merge over per-shard graphs returns EXACTLY what a
  *     single full node returns (disjoint per-chunk graphs + deterministic
  *     (sim desc, id asc) merge) — the same parity argument as the BM25
  *     partials, gated in ProcFleetSpec.
  *
  * MODEL SWAP POINT (SURVEY §7.0): a production deployment replaces the
  * synthetic embeddings table with bge-m3 vectors of the docstore text
  * (reference embedding_models.py:73-83) — graphs, scatter and the endpoint
  * shape stay identical. The Spark-side batch ANN operators (IVF/LSH/HNSW
  * over DataFrames, graft.ops.Similarity + graft.ops.Hnsw) remain the
  * pipeline path; this class is the SERVING path.
  */
final class SimilarDocs(spark: SparkSession, embeddings: DataFrame,
    val numChunks: Int = 1, chunks: Option[Set[Int]] = None) extends SimilarEngine {

  /** This node's chunk ASSIGNMENT (None = the full corpus) — the routing
    * contract for a fleet coordinator. Deliberately the assignment, not
    * `graphs.keySet`: a chunk assigned here but holding zero vectors must
    * still answer "no vector" locally rather than be hunted on peers.
    */
  val servedChunks: Option[Set[Int]] = chunks

  require(numChunks >= 1, s"numChunks must be >= 1, got $numChunks")

  // chunk id → resident graph over that chunk's vectors, built once at boot
  // from THIS node's slice (the embedding read is scoped the same way
  // InMemoryIndex.load scopes the docstore — a shard node never collects
  // the corpus)
  private val graphs: Map[Int, graft.ops.Hnsw.Graph] = {
    import spark.implicits._
    val scoped = chunks match {
      case Some(cs) =>
        embeddings.where(pmod(col("vec_id"), lit(numChunks)).isin(cs.toSeq: _*))
      case None => embeddings
    }
    val rows = scoped.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1) // deterministic insertion
    val dim = rows.headOption.map(_._2.length).getOrElse(1)
    rows.groupBy(r => Math.floorMod(r._1, numChunks.toLong).toInt)
      .map { case (c, rs) =>
        val g = new graft.ops.Hnsw.Graph(dim)
        rs.foreach { case (id, v) => g.insert(id, v) }
        c -> g
      }
  }

  /** By-id vector lookup, routed to the owning chunk's graph (no second
    * vector copy outside the graphs). None when the doc has no vector or
    * its chunk lives on another shard.
    */
  def vectorOf(docId: Long): Option[Array[Float]] =
    graphs.get(Math.floorMod(docId, numChunks.toLong).toInt).flatMap(_.vectorOf(docId))

  /** Top-`size` neighbors of a query VECTOR across this node's graphs —
    * the scatter unit: per-graph top-(size+1), merged by (sim desc, id asc),
    * `excludeId` dropped before the cut so the page is never short.
    */
  def searchVec(v: Array[Float], size: Int, excludeId: Long): Seq[(Long, Double)] =
    graphs.values.toSeq
      .flatMap(_.search(v, size + 1))
      .filter(_._1 != excludeId)
      .sortBy { case (id, sim) => (-sim, id) }
      .take(size)

  def similar(docId: Long, size: Int = 10): Seq[(Long, Double)] =
    vectorOf(docId).map(searchVec(_, size, excludeId = docId)).getOrElse(Nil)
}

/** Fleet-sharded similar-documents: the coordinator resolves the source
  * doc's vector (its own graphs first, else the owning peer over
  * /api/internal/vec), scatters it to every shard's /api/internal/similar,
  * and merges the bounded per-shard top-k — identical to a single full node
  * (disjoint per-chunk graphs, bit-exact vector + score transport via
  * [[graft.query.Wire]]). No Spark job and no whole-corpus collect anywhere
  * on the request path.
  */
final class FleetSimilar(local: SimilarDocs, peers: Seq[String]) extends SimilarEngine {

  // shared bounded-timeout client + one-retry join (graft.query.PeerRpc —
  // the same policy as ProcFleet, by construction). There is no degraded
  // mode here: "shard missing" is indistinguishable from "doc has no
  // vector" in the response shape, and that must never be silent.
  import graft.query.PeerRpc.{postAsync, joinRetry}

  // peer → its served chunk set, resolved ONCE through the same
  // /api/internal/chunks handshake the fleet coverage proof uses (chunk
  // assignments never change across a hot reload, so memoizing is safe; a
  // lazy val whose initializer throws is NOT cached — a fleet whose peers
  // come up late re-resolves on the next request instead of staying broken)
  private lazy val peerChunks: Seq[(String, Set[Int])] = {
    val resolved = peers.map { p =>
      val url = s"$p/api/internal/chunks"
      p -> graft.query.Wire.decodeChunks(joinRetry(url, "{}", postAsync(url, "{}")))
        .getOrElse(sys.error(s"peer $p serves the FULL index — a FleetSimilar " +
          "peer must serve a chunk subset (a full peer double-counts the corpus)"))
    }
    // assembly validation, once per resolution: the coordinator itself must
    // serve a subset when peers exist, and no chunk may be claimed twice —
    // any overlap returns the SAME neighbor twice with identical scores,
    // silently (the exact class of wrongness the contract above forbids)
    val localSet = local.servedChunks.getOrElse {
      if (resolved.nonEmpty)
        sys.error("FleetSimilar local node serves the FULL index while peers " +
          "exist — the coordinator must serve a chunk subset in a fleet")
      Set.empty[Int]
    }
    val dups = (localSet.toSeq ++ resolved.flatMap(_._2))
      .groupBy(identity).collect { case (c, xs) if xs.size > 1 => c }
    if (dups.nonEmpty)
      sys.error(s"fleet chunk assignment overlaps on chunk(s) " +
        s"${dups.toSeq.sorted.mkString(",")} — local=${localSet.toSeq.sorted} " +
        s"peers=${resolved.map(t => t._1 -> t._2.toSeq.sorted)}")
    resolved
  }

  def similar(docId: Long, size: Int = 10): Seq[(Long, Double)] = {
    // phase 1 — resolve the source vector from the ONE shard that owns its
    // chunk (vec ids shard by floorMod exactly like the inverted index):
    // one bounded RPC, not a scatter — a scatter would strictly-join every
    // peer for an answer only the owner can give, making every request
    // wait on the slowest shard's GC pause for the lookup phase
    val owner = Math.floorMod(docId, local.numChunks.toLong).toInt
    val vec =
      if (local.servedChunks.forall(_.contains(owner))) local.vectorOf(docId)
      else peerChunks.collectFirst { case (p, cs) if cs.contains(owner) => p } match {
        case Some(p) =>
          val req = graft.query.Wire.encodeVecReq(docId)
          val url = s"$p/api/internal/vec"
          graft.query.Wire.decodeVec(joinRetry(url, req, postAsync(url, req)))
        case None =>
          // no shard claims the owning chunk: a mis-assembled fleet, not a
          // missing vector — and "shard missing" must never read as "doc
          // has no vector" (the class contract above)
          sys.error(s"no fleet node serves chunk $owner (docId $docId): " +
            s"local=${local.servedChunks} peers=${peerChunks.map(t => t._1 -> t._2.toSeq.sorted)}")
      }
    vec match {
      case None => Nil // unknown doc / no vector → reference's ([], 0)
      case Some(v) =>
        // phase 2 — scatter the vector, merge bounded per-shard heaps.
        // Scatter over peerChunks (not raw `peers`): forcing the memoized
        // resolution HERE makes the subset + disjointness validation run on
        // EVERY request path — previously a local-owner docId never forced
        // it, so a mis-assembled fleet (full-index peer) answered 200s with
        // silently double-counted neighbors until the first remote-owner id
        val req = graft.query.Wire.encodeSimilarReq(v, size, docId)
        val futs = peerChunks.map { case (p, _) =>
          (s"$p/api/internal/similar", postAsync(s"$p/api/internal/similar", req)) }
        val localHits = local.searchVec(v, size, excludeId = docId)
        (localHits ++ futs.flatMap { case (url, f) =>
          graft.query.Wire.decodeSimilarHits(joinRetry(url, req, f)) })
          .sortBy { case (id, sim) => (-sim, id) }
          .take(size)
    }
  }
}
