package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.corpus.Webtext.mix64

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *  - brute-force cosine top-k: exact baseline. The query side is broadcast
  *    (tiny), the corpus side streams — one pass, no shuffle of the corpus;
  *    per-query top-k via window rank over the scored rows.
  *  - LSH-bucketed ANN (random hyperplanes): corpus hashed once to B-bit
  *    bucket codes; queries probe their own bucket (+ multiprobe neighbors),
  *    turning ANN into an equi-join on bucket — the scale path (an IVF index
  *    would replace the hash with learned centroids; same join shape).
  */
object Similarity {

  /** Cosine similarity of two float vectors, accumulated left-to-right in
    * double (deterministic order — matches the DuckDB oracle's list functions).
    *
    * Dimension mismatch TRUNCATES to the shorter vector — a deliberate,
    * oracle-pinned convention shared bit-exactly with [[graft.functions
    * .CosineSimExpr]] (a per-row require would also break whole-stage
    * codegen fusion). The cost: a ragged embedding (bad ingest, schema
    * drift) scores on a prefix instead of failing. Pipelines that cannot
    * trust their ingest should gate dimensions ONCE up front (one agg over
    * `size(embedding)`), not per row; the resident HNSW path, which builds
    * a fixed-dim structure, does fail fast (Hnsw.Graph.search's require).
    */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // codegen'd native expression (graft.functions.CosineSimExpr) — identical
  // arithmetic to `cosine` above, but stays inside whole-stage codegen
  private def cosineUdf(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.CosineSimExpr.cosineSim(a, b)

  /** Map-side partial top-k before the per-query ranking window (guide §2.3,
    * "aggregate before you shuffle"): the window's Exchange(query_id) has as
    * many useful partitions as there are QUERIES, so without this every
    * scored (query, corpus-vector) row funnels through a handful of window
    * tasks — the one genuine scale-killer in the scored-candidates shape.
    * Keeping each partition's top-k per query first bounds the exchange at
    * k × partitions × queries rows and leaves the window a formality.
    *
    * Bit-identical results: the global top-k is contained in the union of
    * per-partition top-k's (any row ranked above a global winner is itself a
    * global winner, hence a partition winner), and the surviving rows' ranks
    * over the reduced set equal their global ranks. The comparator is
    * EXACTLY the window's order — sim desc with NaN FIRST (Spark sorts NaN
    * greatest; java.lang.Double.compare agrees), vec_id asc on ties.
    */
  private[ops] def partialTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val ord: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
      // "better" = smaller: sim desc (NaN greatest-first), then vec_id asc
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = -java.lang.Double.compare(a._2, b._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    scored.select(col("query_id"), col("vec_id"), col("sim"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        // per-query bounded heap of the k best rows seen in this partition
        val heaps = scala.collection.mutable.Map[Long,
          scala.collection.mutable.PriorityQueue[(Long, Double)]]()
        it.foreach { case (q, v, s) =>
          val h = heaps.getOrElseUpdate(q,
            scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord))
          if (h.size < k) h.enqueue((v, s))
          else if (ord.compare((v, s), h.head) < 0) { h.dequeue(); h.enqueue((v, s)) }
        }
        heaps.iterator.flatMap { case (q, h) => h.iterator.map(e => (q, e._1, e._2)) }
      }
      .toDF("query_id", "vec_id", "sim")
  }

  /** Exact top-k nearest neighbors for each query vector.
    * @param corpus  (vec_id, embedding)
    * @param queries (query_id, embedding) — small; broadcast
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .crossJoin(broadcast(queries.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("embedding", "q_embedding")).as("q"))
      .filter(col("c.vec_id") =!= col("query_id"))
      .select(col("query_id"), col("c.vec_id").as("vec_id"),
        cosineUdf(col("c.embedding"), col("q_embedding")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    partialTopK(scored, k)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
  }

  /** Deterministic random hyperplane for (seed, plane, dim) — unit-free sign
    * hash; components in {-1, +1} derived from splitmix64 (no RNG state).
    */
  def planeComponent(seed: Long, plane: Int, dim: Int): Double =
    if ((mix64(mix64(seed ^ plane.toLong) ^ dim.toLong) & 1L) == 0L) -1.0 else 1.0

  /** B-bit sign-hash bucket code of a vector. */
  def lshCode(v: Seq[Float], bits: Int, seed: Long): Long = {
    var code = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * planeComponent(seed, p, i); i += 1 }
      if (dot >= 0) code |= (1L << p)
      p += 1
    }
    code
  }

  /** Shared body of every sign-hash ANN variant: bucket the corpus with
    * `code`, explode each query into its multiprobe bucket set (own code
    * plus all codes within `probeHamming` flips), broadcast-join on bucket,
    * score, dedupe probes by max, rank per query. The hash FUNCTION is the
    * only thing the variants differ in — one body keeps them in lockstep.
    */
  private def bucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      code: Seq[Float] => Long, bits: Int, probeHamming: Int): DataFrame = {
    val b = bits
    val ph = probeHamming
    val codeUdf = udf((v: Seq[Float]) => code(v))
    val probesUdf = udf { (v: Seq[Float]) =>
      val c = code(v)
      var codes = Set(c)
      for (_ <- 1 to ph) codes = codes ++ codes.flatMap(x => (0 until b).map(i => x ^ (1L << i)))
      codes.toSeq.sorted
    }
    val bucketed = corpus.withColumn("bucket", codeUdf(col("embedding")))
    val qProbes = queries.withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_embedding")
      .withColumn("bucket", explode(probesUdf(col("q_embedding"))))
    val scored = bucketed.join(broadcast(qProbes), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineUdf(col("embedding"), col("q_embedding")).as("sim"))
      .groupBy("query_id", "vec_id").agg(max("sim").as("sim")) // dedupe multiprobe
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    partialTopK(scored, k)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
  }

  private def bucketedNearDupPairs(corpus: DataFrame, threshold: Double,
      code: Seq[Float] => Long): DataFrame = {
    val codeUdf = udf((v: Seq[Float]) => code(v))
    val bucketed = corpus.select(col("vec_id"), col("embedding"),
      codeUdf(col("embedding")).as("bucket"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosineUdf(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** LSH-bucketed approximate NN: corpus bucketed by sign-hash; each query
    * probes its own bucket plus all buckets within `probeHamming` bit flips
    * (multiprobe — trades probe fan-out for recall without growing the index).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 10, seed: Long = 7L, probeHamming: Int = 1): DataFrame = {
    val b = bits
    val s = seed
    bucketedTopK(corpus, queries, k, v => lshCode(v, b, s), b, probeHamming)
  }

  /** ±1 hyperplane component derived from md5("seed:plane:dim") — the same
    * random-sign-projection LSH family as [[planeComponent]], with md5 as
    * the shared primitive so an external SQL oracle can re-derive the
    * PLANES THEMSELVES (the dedup_simhash recipe): sign = parity of the
    * digest's last hex nibble.
    */
  def md5PlaneComponent(seed: Long, plane: Int, dim: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$plane:$dim".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((d(15) & 1) == 1) 1.0 else -1.0
  }

  /** [[lshTopK]] with md5-derived hyperplanes — FULLY ORACLED: buckets
    * (planes included), multiprobe expansion, cosine and ranking are all
    * recomputed from scratch by the DuckDB oracle. Dot products accumulate
    * left-to-right in double on both engines (±1 components make each term
    * exact), so the sign — and therefore every bucket — is bit-identical.
    */
  def lshTopKMd5(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 6, seed: Long = 7L, probeHamming: Int = 2): DataFrame = {
    val b = bits
    val s = seed
    // plane components depend only on (seed, plane, dim) — memoize per task
    // instead of paying bits×dims md5 calls per ROW
    val cache = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Double]()
    def comp(p: Int, i: Int): Double =
      cache.computeIfAbsent((p.toLong << 32) | i.toLong,
        _ => md5PlaneComponent(s, p, i)).doubleValue()
    def code(v: Seq[Float]): Long = {
      var c = 0L
      var p = 0
      while (p < b) {
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * comp(p, i); i += 1 }
        if (dot >= 0) c |= (1L << p)
        p += 1
      }
      c
    }
    bucketedTopK(corpus, queries, k, code, b, probeHamming)
  }

  /** Axis-aligned sign code: bit i = sign of dimension i. A degenerate but
    * valid cosine-LSH family (hyperplanes = coordinate axes) whose buckets an
    * external SQL oracle can recompute exactly — the correctness gate for the
    * bucketed join SHAPE, while [[lshCode]] (random hyperplanes) remains the
    * production hash (better-spread buckets).
    */
  def axisCode(v: Seq[Float], bits: Int): Long = {
    var code = 0L
    var i = 0
    val n = math.min(bits, v.length)
    while (i < n) {
      if (v(i) >= 0) code |= (1L << i)
      i += 1
    }
    code
  }

  /** [[lshTopK]] with the oracle-reproducible axis-sign hash.
    *
    * Filtered kNN (the reference's `knn.filter`, index_searcher.py:282-289):
    * pass the metadata predicate as `corpus.where(pred)` — the filter lands
    * on the corpus SCAN, before bucketing and the bucket equi-join, so the
    * query returns k MATCHING neighbors (never a post-filtered short page)
    * and the join never touches excluded vectors.
    */
  def lshTopKAxis(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 6, probeHamming: Int = 1): DataFrame = {
    val b = bits
    bucketedTopK(corpus, queries, k, v => axisCode(v, b), b, probeHamming)
  }

  /** The deterministic IVF centroid table: embeddings of a fixed corpus
    * sample (`vec_id < nlist`) — shared by [[ivfTopK]] and the routed HNSW
    * ([[graft.ops.Hnsw.hnswRoutedTopK]]) so both structures agree on cells.
    */
  private[graft] def sampleCentroids(corpus: DataFrame, nlist: Int): DataFrame =
    corpus.where(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  /** Nearest-centroid cell assignment (`n` = 1 for corpus placement,
    * nProbe for query routing). 6-decimal rounding before the argmax so
    * assignment is stable across engines' last-bit float differences
    * (ties broken by cid).
    */
  private[graft] def nearestCells(df: DataFrame, cents: DataFrame,
      idCol: String, n: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(cents))
      .select(col(idCol), col("cid"),
        round(cosineUdf(col("embedding"), col("cvec")), 6).as("csim"))
    val w = Window.partitionBy(idCol).orderBy(col("csim").desc, col("cid").asc)
    scored.withColumn("crank", row_number().over(w)).where(col("crank") <= n)
      .select(col(idCol), col("cid").as("cell"))
  }

  /** Spark `round(DoubleType, 6)` exactly: HALF_UP via the decimal string
    * rep, with the same NaN/Infinity passthrough (Catalyst's RoundBase
    * guards them; BigDecimal would throw).
    */
  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (csim desc, cid asc) exactly as the [[nearestCells]] window orders:
    * Spark sorts NaN greatest, so desc puts NaN FIRST — TotalOrdering
    * reversed reproduces that.
    */
  private val cellOrd: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), Double](_._1)(Ordering.Double.TotalOrdering.reverse)
      .orElseBy(_._2)

  /** Map-side analog of [[nearestCells]] against a collected centroid
    * array: IDENTICAL arithmetic (left-to-right double cosine →
    * HALF_UP 6-decimal round, exactly Spark's `round(DoubleType)` → argmax
    * with cid tie-break, NaN ranking first like the window's desc), but
    * zero shuffle — at corpus scale cell assignment is a pure map over
    * broadcast centroids instead of a corpus×centroids window. Returns the
    * n best cell ids, best first; empty when `cents` is empty. Parity with
    * the window version is spec-gated (HnswSpec). n=1 (the per-corpus-row
    * hot path) is a sort-free scan whose only allocation is one raw-score
    * buffer; the BigDecimal round runs only on near-tie candidates.
    */
  private[graft] def nearestCellsLocal(v: Seq[Float],
      cents: Array[(Long, Array[Float])], n: Int): Seq[Long] = {
    def scored(i: Int): (Double, Long) = (round6(cosine(v, cents(i)._2)), cents(i)._1)
    if (cents.isEmpty) Seq.empty
    else if (n == 1) {
      // The hot path (once per corpus row): raw-cosine scan with an EXACT
      // tie window. Rounding is monotone and two raws > 2e-6 apart can
      // never round equal at 6 decimals, so the argmax over rounded values
      // lies among candidates within 2e-6 of the raw max — the BigDecimal
      // round (an allocation per centroid per row if done eagerly; measured
      // seconds per pass at nlist=512 × 200k rows) runs only on that
      // near-tie set, usually a singleton.
      val raws = new Array[Double](cents.length)
      var bestRaw = Double.NegativeInfinity
      var hasNaN = false
      var i = 0
      while (i < cents.length) {
        val c = cosine(v, cents(i)._2)
        raws(i) = c
        if (c.isNaN) hasNaN = true else if (c > bestRaw) bestRaw = c
        i += 1
      }
      if (hasNaN) {
        // NaN ranks first (the window's desc semantics); ties → min cid
        var j = 0; var best = Long.MaxValue
        while (j < raws.length) {
          if (raws(j).isNaN && cents(j)._1 < best) best = cents(j)._1
          j += 1
        }
        Seq(best)
      } else {
        var j = 0; var bestR = Double.NegativeInfinity; var bestCid = Long.MaxValue
        while (j < raws.length) {
          if (raws(j) >= bestRaw - 2e-6) {
            val r = round6(raws(j))
            if (r > bestR || (r == bestR && cents(j)._1 < bestCid)) {
              bestR = r; bestCid = cents(j)._1
            }
          }
          j += 1
        }
        Seq(bestCid)
      }
    } else
      cents.indices.map(scored).sorted(cellOrd).take(n).map(_._2)
  }

  /** IVF-style ANN (inverted-file index, the structure behind FAISS IVF and
    * OpenSearch's ANN alternatives to HNSW): the corpus is partitioned into
    * `nlist` CELLS around centroid vectors; a query scores only the vectors
    * of its `nProbe` nearest cells — an equi-join on cell id, the same scale
    * shape as the LSH path but with data-adaptive partitions.
    *
    * Centroids here are the embeddings of a fixed deterministic corpus sample
    * (`vec_id < nlist`) rather than k-means iterates — that makes every step
    * (assignment = argmax cosine with (sim desc, cid asc) tie-break, probing,
    * scoring) recomputable by an external SQL oracle, while keeping the exact
    * production join shape; swapping in trained centroids changes only the
    * centroid table. Two broadcast passes (corpus×centroids assignment,
    * queries×centroids probes) + one cell equi-join — no shuffle of the
    * corpus beyond the cell join.
    *
    * Contract note: a corpus with NO `vec_id < nlist` rows (ids start above
    * nlist, or a filter removed them) has no centroids and the result is
    * EMPTY for every query — hnswRoutedTopK codes the same branch. That is
    * indistinguishable from "no neighbors" downstream, so the case is
    * detected up front (one tiny limit-1 job against the centroid scan,
    * negligible next to the ANN join) and warned loudly here. For filtered
    * kNN, filter the QUERY side or use the *FilteredTopK variants — they
    * filter after bucketing precisely so centroids survive.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = sampleCentroids(corpus, nlist)
    if (cents.isEmpty)
      System.err.println(s"[similarity] WARN ivfTopK: no centroid rows " +
        s"(no vec_id < nlist=$nlist in the corpus) — every query returns " +
        "empty; supply ids covering [0, nlist) or raise nlist")
    def nearestCells(df: DataFrame, idCol: String, n: Int): DataFrame =
      Similarity.nearestCells(df, cents, idCol, n)
    val assigned = corpus.join(nearestCells(corpus, "vec_id", 1), "vec_id")
      .select("vec_id", "embedding", "cell")
    val qProbes = queries.withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_embedding")
    val probes = qProbes.join(
      nearestCells(qProbes.withColumnRenamed("q_embedding", "embedding"), "query_id", nProbe),
      "query_id")
      .select("query_id", "q_embedding", "cell")
    val scored = assigned.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineUdf(col("embedding"), col("q_embedding")).as("sim"))
      .groupBy("query_id", "vec_id").agg(max("sim").as("sim")) // dedupe probes
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    partialTopK(scored, k)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
  }

  /** Bucketed near-dup pairs with the oracle-reproducible axis-sign hash —
    * same equi-join shape as [[embeddingNearDupPairs]], fully verifiable by
    * an external SQL engine (bucket, join, cosine, threshold all recomputable).
    */
  def embeddingNearDupPairsAxis(corpus: DataFrame, threshold: Double,
      bits: Int = 6): DataFrame = {
    val b = bits
    bucketedNearDupPairs(corpus, threshold, v => axisCode(v, b))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (bucketed the
    * same way to avoid the n² cross join at scale).
    */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double,
      bits: Int = 8, seed: Long = 7L): DataFrame = {
    val b = bits
    val s = seed
    bucketedNearDupPairs(corpus, threshold, v => lshCode(v, b, s))
  }

  /** Exact near-dup pairs (n² — oracle/baseline at small scale only). */
  def embeddingNearDupPairsExact(corpus: DataFrame, threshold: Double): DataFrame = {
    corpus.as("a").join(corpus.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosineUdf(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
