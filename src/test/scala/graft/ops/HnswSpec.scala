package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.SparkTestSession

/** HNSW verification: a graph heuristic has no SQL oracle, so the gates are
  * (1) recall against the exact brute-force top-k, (2) run-to-run
  * determinism (seeded levels + HASH partitioning on vec_id — range
  * partitioning samples with a per-RDD seed and would break this gate —
  * + vec_id insertion order), (3) single-graph sanity on a constructed
  * corpus.
  */
class HnswSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")

  test("recall >= 0.95 @ k=10 vs exact cosine top-k over the synthetic embeddings") {
    val queries = emb.where(col("vec_id") < 50)
    val k = 10
    val exact = Similarity.cosineTopK(emb, queries, k)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = Hnsw.hnswTopK(emb, queries, k)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, truth) =>
      got.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(recalls.size == 50)
    assert(mean >= 0.95, f"mean recall $mean%.3f < 0.95")
  }

  test("routed: agreement >= 0.95 vs the ORACLED exact-scoring IVF at the same cells") {
    val queries = emb.where(col("vec_id") < 50)
    val k = 10
    // ivfTopK scores its probed cells EXACTLY and its routing layer is
    // fully SQL-oracled (ann_ivf_topk) — so agreement isolates the one
    // unoracled piece, the within-cell graph walk
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = sets(Similarity.ivfTopK(emb, queries, k, nlist = 16, nProbe = 4))
    val routed = sets(Hnsw.hnswRoutedTopK(emb, queries, k, nlist = 16, nProbe = 4))
    val agree = ivf.map { case (qid, truth) =>
      routed.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = agree.sum / agree.size
    assert(agree.size == 50)
    assert(mean >= 0.95, f"mean agreement $mean%.3f < 0.95")
  }

  test("routed: every neighbor lies in one of the query's probed cells") {
    import spark.implicits._
    val queries = emb.where(col("vec_id") < 20)
    val cents = Similarity.sampleCentroids(emb, 16)
    val corpusCell = Similarity.nearestCells(emb, cents, "vec_id", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the router's MAP-side assignment must equal the window-based (oracled)
    // assignment on every corpus vector — same cosine, same HALF_UP round,
    // same cid tie-break
    val centArr = cents.as[(Long, Array[Float])].collect().sortBy(_._1)
    emb.as[(Long, Array[Float])].collect().foreach { case (id, v) =>
      assert(Similarity.nearestCellsLocal(v, centArr, 1).head == corpusCell(id),
        s"map/window assignment diverged for vec $id")
    }
    val probed = Similarity.nearestCells(
        queries.withColumnRenamed("vec_id", "query_id"), cents, "query_id", 4)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rows = Hnsw.hnswRoutedTopK(emb, queries, 10, nlist = 16, nProbe = 4)
      .select("query_id", "vec_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, vid) = (r.getLong(0), r.getLong(1))
      assert(probed(qid).contains(corpusCell(vid)),
        s"qid=$qid got vid=$vid from unprobed cell ${corpusCell(vid)}")
    }
  }

  test("routed cell balancing: a skewed cell splits into subcells, results exact on separable data") {
    import spark.implicits._
    // two separable clusters; cluster A is 1200 vectors (forces nSub >= 2
    // at target = max(256, mean=750)), cluster B 300 — centroids are
    // vec_id 0 (in A) and 1 (in B)
    // NOT unique per i: i and i+997 collide (exact-duplicate vectors), so
    // the recall gate below stays >= 8, not == 10 — ties among duplicates
    // are resolved by vec_id and tightening the gate would test tie order
    def jig(base: Array[Float], i: Long): Array[Float] =
      base.zipWithIndex.map { case (x, j) => x + 1e-4f * (i % 997) * (j + 1) }
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    val corpus = ((0L until 1200L).map(i => (i * 2, jig(a, i))) ++ // even ids: cluster A (incl. 0)
      (0L until 300L).map(i => (i * 2 + 1, jig(b, i))))           // odd ids: cluster B (incl. 1)
      .toDF("vec_id", "embedding")
    val queries = Seq((9000L, a), (9001L, b)).toDF("vec_id", "embedding")
    val got = Hnsw.hnswRoutedTopK(corpus, queries, 10, nlist = 2, nProbe = 1)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got(9000L).size == 10 && got(9000L).forall(_ % 2 == 0),
      s"cluster-A query leaked: ${got(9000L)}")
    assert(got(9001L).size == 10 && got(9001L).forall(_ % 2 == 1),
      s"cluster-B query leaked: ${got(9001L)}")
    // the subcell union must still recover (nearly) the exact top-k within
    // the probed cell — splitting must not cost recall
    val exact = Similarity.cosineTopK(corpus.where(col("vec_id") % 2 === 0),
      queries.where(col("vec_id") === 9000L), 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got(9000L).intersect(exact).size >= 8,
      s"split recall too low: got ${got(9000L)} vs exact $exact")
    // and splitting is deterministic
    val again = Hnsw.hnswRoutedTopK(corpus, queries, 10, nlist = 2, nProbe = 1)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val again2 = Hnsw.hnswRoutedTopK(corpus, queries, 10, nlist = 2, nProbe = 1)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(again == again2)
  }

  test("routed edge cases: empty centroid table, NaN vectors") {
    import spark.implicits._
    // corpus with no vec_id < nlist rows → no centroids → empty result,
    // matching ivfTopK's degradation instead of an executor crash
    val high = emb.where(col("vec_id") >= 100 && col("vec_id") < 200)
    val out = Hnsw.hnswRoutedTopK(high, high.limit(3), 5, nlist = 16)
    assert(out.columns.toSeq == Seq("query_id", "vec_id", "sim", "rank"))
    assert(out.count() == 0)
    // NaN cosine must not throw and must rank FIRST, matching the window's
    // NaN-greatest desc ordering (Spark round passes NaN through)
    val cents = Array((0L, Array(Float.NaN, 1f)), (1L, Array(1f, 0f)))
    assert(Similarity.nearestCellsLocal(Seq(1f, 0f), cents, 1) == Seq(0L))
    assert(Similarity.nearestCellsLocal(Seq(1f, 0f), cents, 2) == Seq(0L, 1L))
    assert(Similarity.nearestCellsLocal(Seq(1f, 0f), Array.empty, 1).isEmpty)
  }

  test("routed deterministic: two runs return identical rows") {
    val queries = emb.where(col("vec_id") < 20)
    def run(): Seq[(Long, Long, Long)] =
      Hnsw.hnswRoutedTopK(emb, queries, 10)
        .select(col("query_id"), col("vec_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
        .toSeq.sorted
    assert(run() == run())
  }

  test("deterministic: two runs return identical rows") {
    val queries = emb.where(col("vec_id") < 20)
    def run(): Seq[(Long, Long, Long)] =
      Hnsw.hnswTopK(emb, queries, 10)
        .select(col("query_id"), col("vec_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
        .toSeq.sorted
    assert(run() == run())
  }

  test("single graph: exact on a separable corpus, self excluded, best-first") {
    // two tight clusters far apart — any reasonable ANN must be exact
    val g = new Hnsw.Graph(dim = 4, m = 4, efConstruction = 32)
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    def jitter(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (v, j) => v + 0.01f * ((i + j) % 3) }
    (0 until 20).foreach(i => g.insert(i.toLong, jitter(a, i)))
    (100 until 120).foreach(i => g.insert(i.toLong, jitter(b, i)))
    val near = g.search(a, 5)
    assert(near.size == 5)
    assert(near.forall(_._1 < 20), s"cluster-a query leaked cluster-b ids: $near")
    assert(near.map(_._2) == near.map(_._2).sorted.reverse, "best-first order")
    val nearB = g.search(b, 5)
    assert(nearB.forall(_._1 >= 100), s"cluster-b query leaked cluster-a ids: $nearB")
  }

  test("resident-HNSW SimilarDocs: memory-latency neighbors, recall vs exact, self excluded") {
    val full = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sd = new graft.api.SimilarDocs(spark, full, numChunks = 2)
    val exact = Similarity.cosineTopK(emb, emb.where(col("vec_id") === 5), 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = sd.similar(5L, 10)
    assert(got.size == 10 && !got.exists(_._1 == 5L))
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, "best-first")
    assert(got.map(_._1).count(exact) >= 9, s"resident recall too low: $got")
    assert(sd.similar(100000L).isEmpty)
  }

  test("empty and tiny graphs") {
    val g = new Hnsw.Graph(dim = 2)
    assert(g.search(Array(1f, 0f), 3).isEmpty)
    g.insert(7L, Array(1f, 0f))
    assert(g.search(Array(1f, 0f), 3).map(_._1) == Seq(7L))
  }
}
