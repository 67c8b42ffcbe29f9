package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.SparkTestSession

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("exact dedup finds exactly the planted copies") {
    val planted = Dedup.withPlantedDups(docs, dupEvery = 17, exactEvery = 23)
    val dups = Dedup.exactDuplicates(planted).collect()
    val expected = docs.filter(pmod($"doc_id", lit(23)) === 0)
      .select($"doc_id").as[Long].collect().toSet
    assert(dups.map(_.getLong(1)).toSet == expected) // canonical = original id
    assert(dups.map(_.getLong(0)).toSet == expected.map(_ + 2000000L))
  }

  test("ngram jaccard finds near-dups (planted suffix copies) with high sim") {
    val planted = Dedup.withPlantedDups(docs, dupEvery = 17, exactEvery = 1000001)
    val pairs = Dedup.ngramJaccardPairs(planted, n = 3, threshold = 0.7).collect()
    val expectedA = docs.filter(pmod($"doc_id", lit(17)) === 0)
      .select($"doc_id").as[Long].collect().toSet
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted near-pair found
    expectedA.foreach { a =>
      assert(found.contains((a, a + 1000000L)), s"missing planted pair $a")
    }
  }

  test("minhash LSH candidates ⊇ high-jaccard pairs (recall vs exact)") {
    val planted = Dedup.withPlantedDups(docs, dupEvery = 17, exactEvery = 1000001)
    val exact = Dedup.ngramJaccardPairs(planted, n = 3, threshold = 0.85)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshCandidates(planted, n = 3, numHashes = 64, bands = 16,
      estThreshold = 0.5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("recomputable minhash scheme: exact dups est 1.0, recall matches default scheme") {
    // the oracle-recomputable hash plug (md5 mod 2^31-1 + fixed linear
    // permutations) must behave like a minhash: identical text ⇒ identical
    // signatures ⇒ est exactly 1.0, and near-dup recall at the same bar as
    // the production splitmix scheme
    val planted = Dedup.withPlantedDups(docs)
    val lsh = Dedup.minhashLshCandidates(planted, n = 3, numHashes = 64, bands = 16,
      estThreshold = 0.5, recomputable = true)
      .select("id_a", "id_b", "est_jaccard").as[(Long, Long, Double)].collect()
    val byPair = lsh.map { case (a, b, e) => ((a, b), e) }.toMap
    val exactIds = docs.filter(pmod($"doc_id", lit(23)) === 0)
      .select($"doc_id").as[Long].collect().toSet
    assert(exactIds.nonEmpty)
    exactIds.foreach { a =>
      assert(byPair.get((a, a + 2000000L)).contains(1.0), s"exact dup $a not est=1.0")
    }
    val truePairs = Dedup.ngramJaccardPairs(planted, n = 3, threshold = 0.85)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = lsh.map { case (a, b, _) => (a, b) }.toSet
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.95, s"recomputable LSH recall $recall over ${truePairs.size}")
  }

  test("simhash pairs catch planted near-dups; hamming sane") {
    val planted = Dedup.withPlantedDups(docs, dupEvery = 17, exactEvery = 1000001)
    val pairs = Dedup.simhashPairs(planted, maxHamming = 6).collect()
    val expectedA = docs.filter(pmod($"doc_id", lit(17)) === 0)
      .select($"doc_id").as[Long].collect().toSet
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = expectedA.count(a => found.contains((a, a + 1000000L))).toDouble / expectedA.size
    assert(recall >= 0.8, s"simhash recall $recall")
    pairs.foreach(r => assert(r.getAs[Number]("hamming").intValue <= 6))
  }

  test("degenerate docs (empty/punct-only/short) never pair in minhash or simhash sketches") {
    // token-free and shingle-free docs used to share one sentinel sketch —
    // every pair of them came back as a hamming-0 / est_jaccard-1.0 "dup"
    // with no shared content, at quadratic join cost
    val weird = Seq(
      (1L, "!!!"), (2L, "???"), (3L, ""), (4L, "   "),
      (5L, "one two"), (6L, "three four"), // < n=3 words: no shingles
      (7L, "alpha beta gamma delta epsilon zeta"),
      (8L, "alpha beta gamma delta epsilon zeta")) // the one REAL dup pair
      .toDF("doc_id", "text")
    val sim = Dedup.simhashPairs(weird, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sim == Set((7L, 8L)), s"simhash paired degenerate docs: $sim")
    val mh = Dedup.minhashLshCandidates(weird, n = 3, estThreshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh == Set((7L, 8L)), s"minhash paired degenerate docs: $mh")
  }

  test("F4 prefix strips trim BETWEEN strips and match at the regex position (base.py:211-213)") {
    def strip(input: String, prefixes: Seq[String]): String =
      Seq(input).toDF("t")
        .select(HeaderFooter.stripPrefixes(col("t"), prefixes).as("s"))
        .as[String].collect().head
    // interim trim: stripping "X-" leaves " Y: content"; the reference trims
    // before trying the anchored second prefix, so "^Y:" must still match
    assert(strip("X- Y: content", Seq("X-", "^Y:")) == "content")
    // first-MATCH-position semantics: the matched text ("bb") also occurs
    // before the actual regex match of "b+$" — the tail occurrence must go
    assert(strip("bb a bb", Seq("b+$")) == "bb a")
    // unmatched prefixes leave the text untrimmed (reference trims only
    // inside the if-match branch)
    assert(strip("  keep  ", Seq("^ZZZ")) == "  keep  ")
    // a matched strip trims its result
    assert(strip("Page 3 rest", Seq("^Page \\d+")) == "rest")
    // >MaxColumnPrefixes lists switch to the compiled-regex UDF path — same
    // semantics as the Column path on every shape above
    val many = Seq("X-", "^Y:", "b+$", "^ZZZ", "^Page \\d+")
    assert(many.length > HeaderFooter.MaxColumnPrefixes)
    assert(strip("X- Y: Page 7 content bb", many) == "content")
    assert(strip("  untouched  ", Seq("^A", "^B", "^C", "^D")) == "  untouched  ")
    // non-space whitespace at the strip boundary: both paths \s-trim like
    // Python .strip() (SQL trim would keep the tab)
    assert(strip("Page 3\trest\n", Seq("^Page \\d+")) == "rest")
    assert(strip("Page 3\trest\n", Seq("^Page \\d+", "^Z", "^Z2", "^Z3")) == "rest")
  }

  test("F5 confidence filter drops conf<=10 and null-text OCR rows (advanced_pdf_processor.py:111-112)") {
    val rows = Seq(
      (1L, "good line", 88),
      (2L, "boundary", 10),    // conf == 10 is rejected (strict >)
      (3L, "just above", 11),
      (4L, null.asInstanceOf[String], 95), // dropna(subset=['text'])
      (5L, "junk", 7))
      .toDF("id", "text", "conf")
    val kept = AdvancedParagraphs.confidenceFilter(rows)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("near-dup canonicalization: connected components, canonical = component min") {
    val pairs = Seq(
      (10L, 20L, 0.9), (20L, 30L, 0.8),   // chain 10-20-30 → canonical 10
      (40L, 50L, 0.95),                    // pair → canonical 40
      (61L, 60L, 0.9), (62L, 60L, 0.9), (63L, 61L, 0.85)) // star+chain → canonical 60
      .toDF("id_a", "id_b", "jaccard")
    val got = Dedup.canonicalizeNearDups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      40L -> 40L, 50L -> 40L,
      60L -> 60L, 61L -> 60L, 62L -> 60L, 63L -> 60L))
  }

  test("IVF ANN recall@10 vs brute force is usable at nProbe=4/nlist=16") {
    import org.apache.spark.sql.functions._
    val queries = emb.where(col("vec_id") < 20)
    val exact = Similarity.cosineTopK(emb, queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = exact.map { case (q, truth) =>
      val got = ivf.getOrElse(q, Array.empty).map(_._2).toSet
      truth.count(t => got.contains(t._2)).toDouble / truth.length
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"IVF mean recall@10 = $mean (16 cells, 4 probes = 25% of corpus scanned)")
  }

  test("native cosine expression == Scala reference, bit-identical") {
    import graft.functions.CosineSimExpr
    val rows = emb.as("a").crossJoin(emb.limit(5).withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("embedding", "qe").as("q"))
      .select($"vec_id", $"qid", $"embedding", $"qe",
        CosineSimExpr.cosineSim($"embedding", $"qe").as("sim"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = Similarity.cosine(r.getSeq[Float](2), r.getSeq[Float](3))
      assert(r.getDouble(4) == expect, s"${r.getLong(0)} vs ${r.getLong(1)}")
    }
    // null input → null out
    val n = spark.sql("SELECT 1").select(
      CosineSimExpr.cosineSim(lit(null).cast("array<float>"), lit(null).cast("array<float>")))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("brute-force cosine topk: deterministic, self-excluded, ordered") {
    val queries = emb.filter($"vec_id" < 3)
    val top = Similarity.cosineTopK(emb, queries, k = 5).collect()
    assert(top.length == 15)
    top.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"q=$q not sorted")
      assert(!rows.exists(_.getLong(1) == q), "self not excluded")
    }
  }

  test("LSH ANN recall@5 vs brute force is reasonable") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, queries, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, k = 5, bits = 6, probeHamming = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall@5 = $recall") // 6 bits, probe≤2 → ~1/3 corpus probed
  }

  test("embedding near-dup pairs: bucketed ⊆ exact, both above threshold") {
    val exact = Similarity.embeddingNearDupPairsExact(emb, 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Similarity.embeddingNearDupPairs(emb, 0.95, bits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(exact))
  }

  test("minhash verified near-dup == exact ngram-jaccard pair set (oracled scale path)") {
    val planted = Dedup.withPlantedDups(docs, dupEvery = 17, exactEvery = 23)
    val exact = Dedup.ngramJaccardPairs(planted, n = 3, threshold = 0.7, maxShingleDf = Long.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val viaMinhash = Dedup.minhashNearDupPairs(planted, n = 3, numHashes = 64,
      bands = 32, threshold = 0.7).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(viaMinhash == exact,
      s"missed=${(exact -- viaMinhash).take(5)} extra=${(viaMinhash -- exact).take(5)}")
  }

  test("axis-sign bucketed near-dup: ⊆ exact; planted duplicates always found") {
    val exact = Similarity.embeddingNearDupPairsExact(emb, 0.40)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Similarity.embeddingNearDupPairsAxis(emb, 0.40, bits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision 1.0 by construction (verification is exact cosine)
    assert(bucketed.subsetOf(exact) && bucketed.nonEmpty)
    // recall gate on what bucketing GUARANTEES: identical vectors share the
    // bucket, so planted duplicate vectors must all be found
    val planted = emb.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val withDups = emb.select("vec_id", "embedding").union(planted)
    val found = Similarity.embeddingNearDupPairsAxis(withDups, 0.9999, bits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = emb.filter($"vec_id" % 10 === 0).select("vec_id").as[Long].collect()
      .map(id => (id, id + 100000L)).toSet
    assert(expected.forall(found.contains),
      s"missing planted pairs: ${(expected -- found).take(5)}")
  }

  test("text analysis columns: ranges and determinism") {
    val out = TextAnalysis.analyzeDocs(docs).collect()
    out.foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Int]("n_tokens") > 0)
      assert(r.getAs[String]("lang_pred") == "en") // corpus is ASCII words
      assert(r.getAs[String]("fingerprint_md5").length == 32)
    }
  }

  test("langId detects scripts on real multilingual strings") {
    val df = Seq(
      ("यह एक हिंदी वाक्य है और इसमें देवनागरी है", "hi"),
      ("આ એક ગુજરાતી વાક્ય છે અને તેમાં લિપિ છે", "gu"),
      ("this is plainly an english sentence", "en"),
      ("12345 67890 ---", "und")).toDF("text", "expected")
    df.select(TextAnalysis.langIdExpr($"text").as("got"), $"expected").collect()
      .foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("winnowing fingerprints: deterministic, shift-robust") {
    val a = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog repeatedly")
    val b = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog repeatedly")
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    // shared content → shared fingerprints even with a prefix shift
    val c = TextAnalysis.winnow("PREFIX then the quick brown fox jumps over the lazy dog repeatedly")
    assert(a.intersect(c).length > 0)
  }

  test("chunkByTokens: overlapping windows; contained tails skipped; empty doc skipped") {
    val fixture = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b c"),                          // <= overlap → one window
      (3L, "")                                // empty → no rows
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(fixture, maxTokens = 8, overlap = 4)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out.toSeq == Seq(
      (1L, 0, 8, "t0 t1 t2 t3 t4 t5 t6 t7"),
      (1L, 1, 6, "t4 t5 t6 t7 t8 t9"),        // tail window keeps uncovered t8 t9
      (2L, 0, 3, "a b c")))
    // a doc whose would-be second window adds nothing emits only one window
    val covered = Seq((4L, "x0 x1 x2 x3 x4 x5 x6 x7")).toDF("doc_id", "text") // n == maxTokens
    assert(TextAnalysis.chunkByTokens(covered, 8, 4).count() == 1)
  }

  test("packChunks: shard-local streaming packing, pack = floor(cum_before/budget)") {
    val chunks = Seq(
      (0L, 0, 6), (0L, 1, 6), (2L, 0, 5), // shard 0: cum 0, 6, 12 → packs 0, 0, 1
      (1L, 0, 4)                          // shard 1: pack 0
    ).toDF("doc_id", "chunk_id", "n_tokens")
    val out = TextAnalysis.packChunks(chunks, budget = 10, nShards = 2)
      .select("shard", "doc_id", "chunk_id", "pack_id")
      .orderBy("shard", "doc_id", "chunk_id")
      .as[(Int, Long, Int, Int)].collect()
    assert(out.toSeq == Seq(
      (0, 0L, 0, 0), (0, 0L, 1, 0), (0, 2L, 0, 1),
      (1, 1L, 0, 0)))
  }

  test("multimodal: synth → decode stub roundtrip + feature shape") {
    val withMedia = MultiModal.withMediaColumn(docs.limit(100))
    val decoded = MultiModal.decodeMedia(spark, withMedia).collect()
    assert(decoded.length == 100)
    decoded.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 1920 + 16).toInt, "width")
      assert(r.getInt(2) == (id % 1080 + 16).toInt, "height")
      assert(Seq("rgb8", "gray8", "rgba8").contains(r.getString(3)))
      assert(r.getInt(4) == 64)
      val feats = r.getSeq[Float](5)
      assert(feats.length == 8 && math.abs(feats.sum - 1.0f) < 1e-3)
    }
  }

  test("multimodal: corrupt blob → graceful invalid row") {
    val bad = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "media")
    val out = MultiModal.decodeMedia(spark, bad).collect()
    out.foreach { r => assert(r.getString(3) == "invalid" && r.getInt(1) == -1) }
  }

  test("dedup + winnow: NULL text rows drop out instead of NPE-ing the job") {
    val withNull = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    // each of these paths previously called text.toLowerCase inside a UDF
    assert(Dedup.shingles(withNull, 3).filter($"doc_id" >= 3L).count() == 0)
    assert(Dedup.minhashNearDupPairs(withNull, n = 3, numHashes = 16, bands = 8,
      threshold = 0.7).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val sh = Dedup.simhashPairs(withNull, maxHamming = 6).collect()
    assert(sh.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val fp = withNull.select($"doc_id", TextAnalysis.winnowUdf($"text").as("fp"))
      .filter($"doc_id" === 3L).collect()
    assert(fp.length == 1 && fp(0).getSeq[Long](1).isEmpty)
  }
}
