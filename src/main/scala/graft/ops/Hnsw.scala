package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HNSW ANN — the reference's actual kNN index structure
  * (configs/opensearch-config.yaml:152-160: knn_vector, method hnsw,
  * ef_construction 512, m 16). OpenSearch/Lucene builds ONE GRAPH PER
  * SEGMENT and fans a query out across segments; the Spark-first mapping is
  * the same: one graph per PARTITION built inside `mapPartitions`, queries
  * broadcast, per-partition top-k merged by a window — the corpus never
  * concentrates anywhere, and 100-TB scale means more partitions, not a
  * bigger graph.
  *
  * Determinism (this repo's oracle discipline): level assignment is the
  * standard floor(-ln(u)·mL) with u drawn from a hash of vec_id — not a
  * shared RNG — and partition placement is hash(vec_id)
  * with insertion in vec_id order, so the graph (and therefore the
  * result set) is identical run to run. Correctness is gated by a
  * recall-vs-exact spec (HnswSpec: ≥ 0.95 @ k=10 against cosineTopK), the
  * honest verification for a graph heuristic — rank order inside the graph
  * is ours, so the driver query is rows-only.
  */
object Hnsw {

  /** One in-memory HNSW graph over float vectors, cosine similarity.
    * Insert-only; neighbor arrays capped at M (2M on layer 0) with simple
    * closest-selection (Malkov & Yashunin 2016, Algorithm 1/2 with
    * SELECT-SIMPLE).
    */
  final class Graph(dim: Int, m: Int = 16, efConstruction: Int = 100) {
    private val mL = 1.0 / math.log(m.toDouble)
    private val ids = scala.collection.mutable.ArrayBuffer[Long]()
    private val vecs = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    private val norms = scala.collection.mutable.ArrayBuffer[Double]()
    // per node: neighbors[layer] = growable int array of node indexes
    private val neighbors = scala.collection.mutable.ArrayBuffer[Array[scala.collection.mutable.ArrayBuffer[Int]]]()
    private var entry: Int = -1
    private var maxLevel: Int = -1

    def size: Int = ids.length

    // external id → node index, maintained on insert: a resident server
    // needs by-id vector lookup (similar-documents' source vector) without
    // keeping a second copy of every embedding outside the graph
    private val idxOf = new java.util.HashMap[Long, Integer]()

    def vectorOf(id: Long): Option[Array[Float]] =
      Option(idxOf.get(id)).map(i => vecs(i))

    private def sim(a: Int, q: Array[Float], qNorm: Double): Double = {
      val v = vecs(a)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v(i) * q(i); i += 1 }
      val d = norms(a) * qNorm
      if (d == 0) 0.0 else dot / d
    }

    /** Deterministic level: u from a splitmix of the external id. */
    private def levelOf(id: Long): Int = {
      val z = graft.corpus.Webtext.mix64(id)
      val u = ((z >>> 11).toDouble + 0.5) / (1L << 53).toDouble // (0,1)
      math.min((-math.log(u) * mL).toInt, 31)
    }

    /** Greedy descent on one layer from `start`, returning the local best. */
    private def greedy(q: Array[Float], qNorm: Double, start: Int, layer: Int): Int = {
      var cur = start
      var curSim = sim(cur, q, qNorm)
      var improved = true
      while (improved) {
        improved = false
        val ns = neighbors(cur)
        if (layer < ns.length) {
          val layerNs = ns(layer)
          var i = 0
          while (i < layerNs.length) {
            val cand = layerNs(i)
            val s = sim(cand, q, qNorm)
            if (s > curSim || (s == curSim && ids(cand) < ids(cur))) {
              cur = cand; curSim = s; improved = true
            }
            i += 1
          }
        }
      }
      cur
    }

    /** Beam (ef) search on one layer; returns up to `ef` best node indexes,
      * best-first by (sim desc, id asc).
      */
    private def searchLayer(q: Array[Float], qNorm: Double, start: Int,
        layer: Int, ef: Int): scala.collection.mutable.ArrayBuffer[(Double, Int)] = {
      val visited = new java.util.HashSet[Integer]()
      // candidates: max-heap by sim; results: min-heap by sim capped at ef
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.by[(Double, Int), (Double, Long)](t => (t._1, -ids(t._2)))
      val cand = scala.collection.mutable.PriorityQueue[(Double, Int)]()
      val res = scala.collection.mutable.PriorityQueue[(Double, Int)]()(ord.reverse)
      val s0 = sim(start, q, qNorm)
      cand.enqueue((s0, start)); res.enqueue((s0, start)); visited.add(start)
      while (cand.nonEmpty) {
        val (cs, c) = cand.dequeue()
        val worst = res.head._1
        if (cs < worst && res.size >= ef) { cand.clear() }
        else {
          val ns = neighbors(c)
          if (layer < ns.length) {
            val layerNs = ns(layer)
            var i = 0
            while (i < layerNs.length) {
              val e = layerNs(i)
              if (visited.add(e)) {
                val es = sim(e, q, qNorm)
                if (res.size < ef || es > res.head._1) {
                  cand.enqueue((es, e))
                  res.enqueue((es, e))
                  if (res.size > ef) res.dequeue()
                }
              }
              i += 1
            }
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[(Double, Int)]()
      res.foreach(out += _)
      out.sortBy(t => (-t._1, ids(t._2)))
    }

    def insert(id: Long, vec: Array[Float]): Unit = {
      require(vec.length == dim, s"dim mismatch: ${vec.length} != $dim")
      val idx = ids.length
      ids += id
      idxOf.put(id, idx)
      vecs += vec
      var n = 0.0
      var i = 0
      while (i < dim) { n += vec(i) * vec(i); i += 1 }
      norms += math.sqrt(n)
      val level = levelOf(id)
      neighbors += Array.fill(level + 1)(scala.collection.mutable.ArrayBuffer[Int]())
      if (entry < 0) { entry = idx; maxLevel = level; return }
      val qNorm = norms(idx)
      var ep = entry
      // descend through layers above the new node's level
      var l = maxLevel
      while (l > level) { ep = greedy(vec, qNorm, ep, l); l -= 1 }
      // connect on each shared layer
      l = math.min(level, maxLevel)
      while (l >= 0) {
        val cands = searchLayer(vec, qNorm, ep, l, efConstruction)
        val cap = if (l == 0) 2 * m else m
        val selected = cands.take(cap)
        selected.foreach { case (_, c) =>
          neighbors(idx)(l) += c
          val back = neighbors(c)(l)
          back += idx
          if (back.length > cap) {
            // shrink: keep the cap closest to c (SELECT-SIMPLE, ties by id)
            val cv = vecs(c); val cn = norms(c)
            val kept = back.sortBy(x => (-sim(x, cv, cn), ids(x))).take(cap)
            back.clear(); back ++= kept
          }
        }
        if (selected.nonEmpty) ep = selected.head._2
        l -= 1
      }
      if (level > maxLevel) { maxLevel = level; entry = idx }
    }

    /** Top-k (id, cosine) best-first; ef = max(efSearch, k). */
    def search(q: Array[Float], k: Int, efSearch: Int = 100): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      // a mismatched query would AIOOBE (shorter) or silently score on a
      // truncated prefix (longer) deep inside an executor task
      require(q.length == dim, s"query dim ${q.length} != corpus dim $dim")
      var n = 0.0
      var i = 0
      while (i < q.length) { n += q(i) * q(i); i += 1 }
      val qNorm = math.sqrt(n)
      var ep = entry
      var l = maxLevel
      while (l > 0) { ep = greedy(q, qNorm, ep, l); l -= 1 }
      searchLayer(q, qNorm, ep, 0, math.max(efSearch, k))
        .take(k).map { case (s, idx) => (ids(idx), s) }.toSeq
    }
  }

  /** Distributed ANN over per-partition HNSW graphs: hash-partition the
    * corpus on vec_id (deterministic placement), build one graph per
    * partition, answer every broadcast query from every graph, merge with a
    * window — identical scale shape to the oracled IVF/LSH paths (bounded
    * per-task state, no corpus concentration; `partitions` tracks cluster
    * parallelism the way segment counts do).
    */
  /** Deterministic subcell salt for [[hnswRoutedTopK]]'s cell balancing —
    * splitmix64 ([[graft.corpus.Webtext.mix64]], the repo's one copy of the
    * constants) with an input xor that decorrelates it from the level hash
    * of the same id.
    */
  private[graft] def subcellSalt(id: Long): Long =
    graft.corpus.Webtext.mix64(id ^ 0xA5A5A5A5A5A5A5A5L)

  /** Build one graph over `items` (vec_id-sorted insertion — the
    * determinism contract) and answer every query, excluding each query's
    * own vector (hence k+1 candidates). Shared by the per-partition
    * ([[hnswTopK]]) and per-cell ([[hnswRoutedTopK]]) paths so the two
    * can never drift.
    */
  private def buildAndSearch(itemsRaw: Array[(Long, Array[Float])],
      qs: Iterable[(Long, Array[Float])], k: Int, m: Int,
      efConstruction: Int, efSearch: Int): Iterator[(Long, Long, Double)] = {
    val items = itemsRaw.sortBy(_._1)
    if (items.isEmpty) Iterator.empty
    else {
      val g = new Graph(items.head._2.length, m, efConstruction)
      items.foreach { case (id, v) => g.insert(id, v) }
      qs.iterator.flatMap { case (qid, qv) =>
        g.search(qv, k + 1, efSearch) // +1: the query's own vector may win
          .collect { case (id, s) if id != qid => (qid, id, s) }
      }
    }
  }

  def hnswTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 16, efConstruction: Int = 100, efSearch: Int = 100,
      partitions: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val qB = spark.sparkContext.broadcast(qRows)
    val perPart = corpus.select(col("vec_id"), col("embedding"))
      // hash-repartition on vec_id, NOT repartitionByRange: range bounds
      // come from a sampling pass whose seed varies per RDD id, so range
      // partition contents (and therefore graph edges near boundaries)
      // would differ run to run — hash placement is a pure function of
      // vec_id, keeping the determinism contract real
      .repartition(partitions, col("vec_id"))
      .as[(Long, Array[Float])]
      .mapPartitions(it => buildAndSearch(it.toArray, qB.value, k, m, efConstruction, efSearch))
      .toDF("query_id", "vec_id", "sim")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    val out = perPart.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
    // Materialize the bounded result (≤ k rows per query) WITH ITS LINEAGE
    // CUT — localCheckpoint keeps the data distributed across executors (no
    // driver collect, the "no corpus concentration" contract holds) while
    // making it safe to destroy the query broadcast immediately: a lazily-
    // returned plan would pin qB's blocks on every executor until GC,
    // leaking broadcast memory across repeated calls in a long session.
    // try/finally like hnswRoutedTopK: a failed checkpoint job must not
    // leak the broadcast either.
    try out.localCheckpoint(true)
    finally qB.destroy()
  }

  /** IVF-routed HNSW — the partition router for [[hnswTopK]]'s one open
    * scale question (every query probes every partition graph, fine at
    * segment counts, wasteful at thousands of partitions). Structure is
    * FAISS's IVF-HNSW / OpenSearch's ANN alternative: the corpus is
    * partitioned into `nlist` data-adaptive CELLS around the same
    * deterministic centroids the oracled [[Similarity.ivfTopK]] uses, one
    * HNSW graph is built PER CELL, and a query walks only the graphs of its
    * `nProbe` nearest cells.
    *
    * Scale shape: cell ASSIGNMENT is a pure map against the broadcast
    * centroid table (no corpus×centroids window — the one exchange is the
    * groupByKey on the computed cell+subcell key), bounded per-task state
    * (one subcell's graph), and — the router's point — graph construction
    * and search happen ONLY in cells some query probes; unprobed cells'
    * vectors are dropped BEFORE the exchange and never build a graph.
    * At 1000 executors a query touches nProbe cells instead of every
    * partition, and cost scales with nProbe, not cluster width.
    *
    * Voronoi cells are skewed, and graph build is the dominant cost, so an
    * unbalanced cell would straggle its stage (measured ~2× on uniform
    * vectors): cells above the mean probed size split into mean-sized
    * SUBCELLS by a deterministic vec_id hash, each with its own graph —
    * hnswTopK's per-partition move applied inside a cell. The probed
    * subset is persisted internally so the nlist-cosine assignment runs
    * once; the exact per-cell counts are then a map-side agg over it
    * (output ≤ nlist rows) — no second corpus scan, nothing for the
    * caller to cache.
    *
    * Determinism: cell assignment is the rounded-cosine argmax with cid
    * tie-break (oracled via ann_ivf_topk), insertion is vec_id-sorted,
    * levels are hashed — identical run to run. Verification: HnswSpec gates
    * agreement vs the ORACLED exact-scoring IVF at the same (nlist,
    * nProbe), probed-cell containment, and determinism; the graph-walk
    * candidate order itself is rows-only for the same reason as
    * [[hnswTopK]].
    */
  def hnswRoutedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nProbe: Int = 4, m: Int = 16,
      efConstruction: Int = 100, efSearch: Int = 100): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // centroids are nlist rows — collected once, sorted for determinism,
    // and broadcast; corpus cell assignment is then a pure MAP (zero
    // pre-shuffle), spec-gated identical to the window-based oracled
    // assignment (Similarity.nearestCellsLocal)
    val cents = Similarity.sampleCentroids(corpus, nlist)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    if (cents.isEmpty) // no centroids (over-filtered corpus) — empty result,
      return spark.emptyDataset[(Long, Long, Double, Int)] // like ivfTopK
        .toDF("query_id", "vec_id", "sim", "rank")
    // every mid-run resource (the persisted probed subset + four
    // broadcasts) is released in the finally below — a failed job (executor
    // OOM, task abort) must not leak cached corpus copies into a long-lived
    // session across repeated calls
    val toDestroy = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.broadcast.Broadcast[_]]
    var keyed: Dataset[(Long, Long, Array[Float])] = null
    try {
    val cB = spark.sparkContext.broadcast(cents)
    toDestroy += cB
    // queries are few and broadcast (hnswTopK's existing contract); routing
    // happens on the driver with the same arithmetic
    val routed: Map[Long, Seq[(Long, Array[Float])]] =
      queries.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
        .flatMap { case (qid, qv) =>
          Similarity.nearestCellsLocal(qv, cents, nProbe).map(c => (c, qid, qv))
        }
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val rB = spark.sparkContext.broadcast(routed)
    toDestroy += rB
    keyed = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (Similarity.nearestCellsLocal(v, cB.value, 1).head, id, v) }
      // unprobed cells are dropped BEFORE the exchange — only the nProbe
      // cells' vectors are ever shuffled; the cost really is ∝ probed data.
      // Persisted because BOTH the balance-count pass and the build pass
      // consume it: the nlist-cosine assignment (the router's one per-row
      // cost) runs once, not twice — measured ~2× on the AnnLadder
      .filter(t => rB.value.contains(t._1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Voronoi cells are SKEWED (a dense direction's cell can be several ×
    // the mean — measured 2× wall on uniform vectors), and the slowest
    // cell's graph build straggles the whole stage. Balance: split any cell
    // above the mean probed size into mean-sized SUBCELLS by a hash of
    // vec_id (deterministic), each building its own graph and answering the
    // cell's queries — the same per-partition-graph move hnswTopK makes
    // globally, applied inside a cell. Union of subcell top-k's merges in
    // the same window; subcells still partition the corpus, so no dedupe.
    // The count pass is a map-side agg over ≤ nlist keys.
    val cellCounts = keyed.groupByKey(_._1).count().collect().toMap
    val target = math.max(256L,
      cellCounts.values.sum / math.max(1, cellCounts.size))
    val nSub: Map[Long, Int] =
      cellCounts.map { case (c, n) => c -> math.max(1, ((n + target - 1) / target).toInt) }
    val sB = spark.sparkContext.broadcast(nSub)
    toDestroy += sB
    // EXACT one-graph-per-task placement: the probed (cell, subcell) groups
    // are known on the driver, so each gets its own shuffle partition —
    // groupByKey would hash ~P groups onto spark.sql.shuffle.partitions and
    // balls-into-bins hands some tasks 2–3 graphs built sequentially (the
    // stage then waits on their SUM; measured as the routed path losing to
    // hnswTopK, whose repartition(P) has the per-task property for free)
    val groupIds: Map[(Long, Int), Int] = nSub.toSeq.sortBy(_._1)
      .flatMap { case (c, s) => (0 until s).map(i => (c, i)) }
      .zipWithIndex.toMap
    val gB = spark.sparkContext.broadcast(groupIds)
    toDestroy += gB
    val part = new org.apache.spark.Partitioner {
      def numPartitions: Int = math.max(1, gB.value.size)
      def getPartition(key: Any): Int = gB.value(key.asInstanceOf[(Long, Int)])
    }
    val hitsRdd = keyed.rdd
      .map { case (cell, id, v) =>
        ((cell, Math.floorMod(Hnsw.subcellSalt(id), sB.value(cell).toLong).toInt), (id, v))
      }
      .partitionBy(part)
      .mapPartitions { it =>
        val buf = it.toArray
        if (buf.isEmpty) Iterator.empty
        else buildAndSearch(buf.map(_._2), rB.value(buf.head._1._1),
          k, m, efConstruction, efSearch)
      }
    val hits = spark.createDataset(hitsRdd).toDF("query_id", "vec_id", "sim")
    // (sub)cells PARTITION the corpus (n=1 placement + disjoint salts), so a
    // vector reaches a query through at most one group — merge needs no dedupe
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    val out = hits.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
    out.localCheckpoint(true) // same broadcast-release rationale as hnswTopK
    } finally {
      if (keyed != null) keyed.unpersist()
      toDestroy.foreach(_.destroy())
    }
  }
}
