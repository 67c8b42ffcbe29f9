package graft.query

/** Scatter-gather coordinator over doc-sharded resident nodes — the serving
  * FLEET topology at 10^12 docs: each node loads a chunk subset
  * ([[InMemoryIndex.load]] with `chunks`), the coordinator fans a query out,
  * merges the per-node top-k partials, and materializes one page.
  *
  * Results are IDENTICAL to a single full node (gated by RankParitySpec):
  *  - per-doc BM25 scores match because every node scores with corpus-wide
  *    idf (termdict df) and global N/avgdl (index stats) — the
  *    "DFS query-then-fetch" consistency distributed Lucene only gets with
  *    its two-phase dfs mode, here free because the build already
  *    materializes global term stats;
  *  - the page matches because chunks partition docs, so per-node heaps are
  *    disjoint and [[QueryCore.merge]]'s (score desc, docId asc) order is a
  *    pure interleave;
  *  - totalHits/relation match because hit counts sum across disjoint shards
  *    exactly as they sum across segments on one node.
  *
  * The fan-out is a thread per node here (nodes are in-process objects); on a
  * real fleet it is one RPC per node carrying the ≤ (from + pageSize) heap
  * back — payload text never moves between nodes (the coordinator point-reads
  * the ≤ pageSize winners from the shared docstore).
  */
/** What a serving surface (the HTTP API) needs from a node — implemented by
  * a single resident [[InMemoryIndex]] and by a doc-sharded fleet
  * ([[ShardedServe.Fleet]]), so the API is topology-agnostic.
  */
trait SearchNode {
  def search(q: QuerySpec): SearchResult
  def facetMetadata(fields: Set[String],
      contentKey: String = "category"): Map[String, Map[String, Seq[String]]]
  /** /api/context: (current, previous, next) chunk payloads, None when the
    * chunk id is unknown (reference get_paragraph_context,
    * index_searcher.py:567-628). */
  def context(chunkId: Long): Option[(DocPayload, Option[DocPayload], Option[DocPayload])]
  /** Point-read full docstore rows (for endpoint payload assembly). */
  def docPayloads(ids: Seq[Long]): Map[Long, DocPayload]
  /** This node bound to ONE index snapshot for the duration of a multi-call
    * operation (e.g. the HTTP search endpoint's Pravachan + Granth pair):
    * without pinning, a hot-reload swap landing between the two calls
    * would serve one response mixing two index versions. Default: the node
    * itself — a plain [[InMemoryIndex]] IS an immutable snapshot, and a
    * socket fleet ([[ProcFleet]]) cannot pin remote shards that reload
    * independently (each scatter is snapshot-consistent per shard; the
    * cross-shard mix window is inherent to distributed serving, same as
    * querying a live OpenSearch during its reindex).
    */
  def pinned: SearchNode = this
}

object ShardedServe {

  /** A doc-sharded fleet as one [[SearchNode]]: queries scatter-gather;
    * metadata unions per-shard facet co-occurrences (chunks partition docs,
    * so a (type, key, value) co-occurs globally iff it co-occurs on ≥1
    * shard).
    */
  final class Fleet(nodes: Seq[InMemoryIndex]) extends SearchNode {
    // one long-lived scatter pool per fleet (daemon threads so the JVM can
    // exit) — a pool per query would put thread churn on the serving hot
    // path. CACHED, not fixed-at-nodes.size: under C concurrent queries the
    // scatter needs up to C×(nodes-1) threads; a nodes-sized pool serializes
    // every query's fan-out behind every other's (measured 4.7× qps loss)
    private val pool: java.util.concurrent.ExecutorService =
      java.util.concurrent.Executors.newCachedThreadPool(
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger()
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"fleet-scatter-${n.getAndIncrement()}")
            t.setDaemon(true)
            t
          }
        })
    def search(q: QuerySpec): SearchResult = ShardedServe.search(nodes, q, Some(pool))

    // docstore parquet is shared storage every node can point-read — any
    // node fetches any doc; only the facet-derived NEIGHBOR lookup is
    // shard-local (each node sees its chunks' facet lists)
    def docPayloads(ids: Seq[Long]): Map[Long, DocPayload] = nodes.head.docPayloads(ids)

    /** Context on a doc-sharded fleet: the current chunk's payload is a
      * shared-docstore point-read; neighbor candidates come from every
      * shard's local facet lists and merge as max(prev)/min(next) — chunks
      * partition docs, so in paragraph mode exactly one shard finds each
      * neighbor, and in source mode the per-shard nearest-on-either-side
      * candidates bracket the true neighbors. Result is identical to a
      * single full node's.
      */
    def context(chunkId: Long): Option[(DocPayload, Option[DocPayload], Option[DocPayload])] =
      docPayloads(Seq(chunkId)).get(chunkId).map { cur =>
        val (prev, next) = ShardedServe.mergeNeighbors(
          nodes.map(_.neighborIds(cur.lang, cur.docId, cur.meta)))
        val fetched = docPayloads(prev.toSeq ++ next.toSeq)
        (cur, prev.flatMap(fetched.get), next.flatMap(fetched.get))
      }

    def facetMetadata(fields: Set[String],
        contentKey: String): Map[String, Map[String, Seq[String]]] =
      ShardedServe.unionFacetMeta(nodes.map(_.facetMetadata(fields, contentKey)))
  }

  /** Union of per-shard facet metadata (chunks partition docs, so a
    * (type, key, value) co-occurs globally iff it co-occurs on ≥1 shard) —
    * shared by the thread fleet and the process fleet coordinator.
    */
  def unionFacetMeta(maps: Seq[Map[String, Map[String, Seq[String]]]])
      : Map[String, Map[String, Seq[String]]] =
    maps.foldLeft(Map.empty[String, Map[String, Seq[String]]]) { (acc, m) =>
      (acc.keySet ++ m.keySet).map { ct =>
        val a = acc.getOrElse(ct, Map.empty)
        val b = m.getOrElse(ct, Map.empty)
        ct -> (a.keySet ++ b.keySet).map { k =>
          k -> (a.getOrElse(k, Nil) ++ b.getOrElse(k, Nil)).distinct.sorted
        }.toMap
      }.toMap
    }

  /** Merge per-shard neighbor candidates into the fleet-wide
    * (previous, next): chunks partition docs, so in paragraph mode exactly
    * one shard finds each neighbor, and in source mode the per-shard
    * nearest-on-either-side candidates bracket the true neighbors —
    * max(prev)/min(next) is exact in both. One copy of this argument,
    * shared by the thread fleet and the process fleet.
    *
    * Paragraph-mode exactness RELIES on (document_id, paragraph_id) being
    * unique corpus-wide — the build/reindex contract (reindexDocs deletes
    * the old version of a doc before adding the new). If that invariant is
    * violated (two docIds carrying the same pair on different shards), the
    * single full node returns the SMALLEST intersecting docId while this
    * merge picks max — a parity divergence that signals corpus corruption,
    * not a merge bug; max cannot be changed to min without breaking the
    * source-mode bracketing above.
    */
  def mergeNeighbors(cands: Seq[(Option[Long], Option[Long])]): (Option[Long], Option[Long]) =
    (cands.flatMap(_._1).reduceOption(_ max _), cands.flatMap(_._2).reduceOption(_ min _))

  /** Round-robin chunk assignment for `nNodes` doc shards of an index with
    * `numChunks` chunks (node i serves chunks ≡ i mod nNodes).
    */
  def chunkAssignment(numChunks: Int, nNodes: Int): Seq[Set[Int]] =
    (0 until nNodes).map(i => (0 until numChunks).filter(_ % nNodes == i).toSet)

  def search(nodes: Seq[InMemoryIndex], q: QuerySpec,
      sharedPool: Option[java.util.concurrent.ExecutorService] = None): SearchResult = {
    require(nodes.nonEmpty, "ShardedServe.search needs at least one node")
    // scatter: per-node partials in parallel (in-process stand-in for the
    // fleet RPC; each partial is a bounded heap, never full results)
    val partials: Array[SegmentResult] =
      if (nodes.size == 1) nodes.head.searchPartial(q)
      else {
        val pool = sharedPool.getOrElse(
          java.util.concurrent.Executors.newFixedThreadPool(nodes.size))
        try {
          // tail nodes fan out; the HEAD node runs on the calling thread
          // (one fewer handoff per query — the coordinator thread would
          // otherwise just block on futures)
          val futs = nodes.tail.map(n => pool.submit(
            new java.util.concurrent.Callable[Array[SegmentResult]] {
              def call(): Array[SegmentResult] = n.searchPartial(q)
            }))
          val headPartial = nodes.head.searchPartial(q)
          headPartial ++ futs.flatMap(_.get())
        } finally if (sharedPool.isEmpty) pool.shutdown()
      }
    // gather: merge + materialize on the coordinator (any node can do it —
    // payload fetch is an on-demand docstore point-read, and suggest uses
    // the global termdict dictionary every doc-shard node loads)
    nodes.head.materialize(q, partials)
  }
}
