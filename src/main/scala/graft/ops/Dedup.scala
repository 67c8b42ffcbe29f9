package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Webtext.mix64

/** Large-scale training-data deduplication operators.
  *
  * Scale design notes (the point of each variant at 100 TB):
  *  - exact: one hash-shuffle on sha256(text) — partial agg combines map-side.
  *  - ngram-Jaccard: candidate generation via a shingle inverted index
  *    (self-join on shingle), with frequent-shingle pruning so the join fans
  *    out on rare shingles only; exact Jaccard on candidates.
  *  - MinHash+LSH: constant-size signatures (numHashes ints/doc) replace the
  *    full shingle sets; banding turns near-dup search into an equi-join on
  *    (band, bucketHash) — the only shuffle key — no pairwise blowup.
  *  - SimHash: one 60-bit fingerprint/doc (md5-derived, oracle-
  *    recomputable); candidates share one of four 15-bit blocks, again an
  *    equi-join.
  */
object Dedup {

  /** Deterministic 64-bit string hash (FNV-1a-then-mix) shared by all
    * sketches; NOT Spark's xxhash64 so that behavior is pinned by our code.
    */
  def stringHash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Exact duplicates by content hash: returns one row per duplicate doc
    * (docs whose text equals an earlier doc's), with the canonical (min) id.
    */
  def exactDuplicates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // NULL text is UNKNOWN content, not identical content: sha2(NULL)=NULL
    // and the window would cluster every NULL-text doc as a "duplicate" of
    // the min-id one — a dedup pipeline would then delete docs whose text
    // is merely absent. Dropped here, matching the sketch paths (shingles/
    // minhash/simhash all make NULL text contribute nothing).
    val hashed = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), sha2(col(textCol), 256).as("content_hash"))
    // one window over the hash shuffle, not groupBy + self-join: the join
    // shape scans (and sha256-hashes) the corpus TWICE — the agg subtree and
    // the probe side differ physically, so the exchange isn't reused. A
    // doc alone in its group is its own canonical and drops out.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("content_hash")
    hashed.withColumn("canonical_id", min("doc_id").over(w))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "canonical_id", "content_hash")
  }

  /** The ONE tokenizer every Dedup path shares. Candidate GENERATION
    * (shingles, minhash signatures, simhash sketches) and candidate
    * VERIFICATION (exactJaccard) must tokenize identically — "candidates
    * verified with the exact Jaccard" silently loses recall if an edit to
    * one copy's regex drifts from the others, with no test signal. A single
    * definition makes that drift impossible. NULL-safe: null → no tokens
    * (a NULL-text row contributes nothing anywhere in this file).
    */
  private[graft] def tokens(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Word n-gram shingle set per doc (distinct shingles). */
  def shingles(docs: DataFrame, n: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toShingles = udf { (text: String) =>
      val w = tokens(text)
      if (w.length < n) Seq.empty[String]
      else w.sliding(n).map(_.mkString(" ")).toSeq.distinct
    }
    docs.select(col(idCol).as("doc_id"), explode(toShingles(col(textCol))).as("shingle"))
  }

  /** n-gram Jaccard near-duplicates: CANDIDATES from the shingle inverted
    * index (pairs sharing ≥1 rare shingle; maxShingleDf prunes head shingles
    * whose O(df²) pair blowup is the classic skew bomb), then each candidate
    * VERIFIED with the exact full-set Jaccard — the reported score is always
    * the true Jaccard, never an artifact of the pruning. Recall caveat
    * (inherent to df-pruned candidate generation): a pair whose EVERY shared
    * shingle is corpus-frequent produces no candidate; near-dup pairs share
    * long runs of rare shingles, so this is the standard trade.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Long = 1000): DataFrame = {
    val sh = shingles(docs, n)
    // per-shingle corpus df via ONE window over the shingle exchange, not a
    // groupBy + join-back: the join shape planned the df aggregation as a
    // broadcast side, so NO exchange was shared between the three consumers
    // below and the shingle UDF + explode re-ran once per subtree (5 full
    // corpus re-tokenizations in the round-5 plan). With the window, every
    // consumer hangs off the same Exchange(shingle) — the tokenize/shingle
    // map side runs ONCE and ReusedExchange serves the other subtrees; the
    // window output is already partitioned AND sorted by shingle, so the
    // candidate self-join below needs no further exchange or sort.
    val withDf = sh.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
    // per-doc stats in ONE aggregation: total distinct-shingle count plus
    // the doc's own FREQUENT shingles as a set (few per doc — a shingle is
    // frequent only when its corpus df exceeds maxShingleDf, so the global
    // frequent vocabulary is ≤ totalShingleRows/maxShingleDf)
    val sizes = withDf.groupBy("doc_id").agg(
      count(lit(1)).as("set_size"),
      collect_set(when(col("df") > maxShingleDf, col("shingle"))).as("freq_sh"))
    val rare = withDf.filter(col("df") <= maxShingleDf).select("doc_id", "shingle")
    // shared RARE shingles per pair — direct partial-aggregated count over
    // the pruned self-join (also the candidate set itself)
    val interRare = rare.as("a").join(rare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter_rare"))
    // exactness correction: each candidate pair's shared FREQUENT shingles
    // (the ones the pruning excluded) come from array_intersect of the two
    // docs' frequent-shingle sets, riding the size joins we pay anyway —
    // no extra join/shuffle, and free when nothing exceeds maxShingleDf
    // (both arrays empty). Never the df² blowup, never a per-pair
    // re-tokenization (measured 8x slower).
    interRare
      .join(sizes.select(col("doc_id").as("id_a"), col("set_size").as("size_a"),
        col("freq_sh").as("freq_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("set_size").as("size_b"),
        col("freq_sh").as("freq_b")), "id_b")
      .withColumn("inter",
        col("inter_rare") + size(array_intersect(col("freq_a"), col("freq_b"))))
      .withColumn("jaccard", col("inter") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: numHashes permutations, min over the doc's shingle
    * hashes. Returns (doc_id, sig array<long>).
    *
    * Two hash schemes, same signature/banding/estimate machinery:
    *  - default (`recomputable = false`): h_i(x) = mix64(x ^ seed_i) over
    *    splitmix shingle hashes — one cheap 64-bit mix per permutation, the
    *    production path ([[minhashLshCandidates]] / the bench's
    *    `dedup_minhash`).
    *  - `recomputable = true`: one md5 per shingle ([[md5Low60]], the same
    *    primitive behind the oracled simhash), reduced mod the Mersenne
    *    prime P = 2^31-1, then the classic linear family
    *    h_i(x) = (a_i·x + b_i) mod P with fixed constants — every step
    *    recomputable from scratch by the DuckDB oracle (`dedup_minhash_est`),
    *    so the WHOLE estimate chain (shingles → permutation mins → banding →
    *    equal-position estimate) is hash-verified, not rows-only. Products
    *    stay under 2^62 (a_i, x < 2^31), so plain Long/BIGINT arithmetic
    *    agrees exactly on both sides.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
      recomputable: Boolean = false): DataFrame = {
    val nh = numHashes
    val ng = n
    val recomp = recomputable
    // a doc with no shingles has NO signature (empty array), not the
    // all-Long.MaxValue sentinel: that sentinel is identical across every
    // short doc, so each LSH band would put all of them in one bucket —
    // the exact quadratic candidate blowup banding exists to avoid, plus
    // est_jaccard=1.0 "duplicates" between unrelated docs
    // permutation constants depend only on numHashes — computed once in the
    // driver and shipped in the closure, not rebuilt per document row
    val P = 2147483647L // 2^31 - 1 (Mersenne prime)
    // a_i = ((i+1)·(2654435761 mod P) + 12345) mod P — all 64 values
    // nonzero and distinct (checked offline); b_i any fixed residue
    val as = Array.tabulate(nh)(i => ((i + 1).toLong * 506952114L + 12345L) % P)
    val bs = Array.tabulate(nh)(i => (i.toLong * 40503L + 271828183L) % P)
    // the splitmix path's per-permutation seeds honor the same "computed
    // once in the driver" rule as as/bs — recomputing mix64(0x5EED0000+i)
    // inside the shingle loop doubled the hash work of the dominant pass
    val seeds = Array.tabulate(nh)(i => mix64(0x5EED0000L + i))
    val sigUdf = udf { (text: String) =>
      // NULL text → no signature (row drops out), same convention as shingles
      val w = tokens(text)
      if (w.length < ng) Seq.empty[Long]
      else {
        val sig = Array.fill(nh)(Long.MaxValue)
        if (recomp) {
          val md = java.security.MessageDigest.getInstance("MD5")
          w.sliding(ng).foreach { g =>
            val x = md5Low60(g.mkString(" "), md) % P
            var i = 0
            while (i < nh) {
              val v = (as(i) * x + bs(i)) % P
              if (v < sig(i)) sig(i) = v
              i += 1
            }
          }
        } else {
          // index loop over the token array, hashing the shingle's CHARS
          // (word chars + single separating spaces) straight into FNV-1a —
          // byte-identical to stringHash64(g.mkString(" ")) without the
          // per-window Seq + String allocations of sliding/mkString on the
          // dominant signature pass
          var s0 = 0
          while (s0 + ng <= w.length) {
            var h = 0xcbf29ce484222325L
            var wi = 0
            while (wi < ng) {
              if (wi > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
              val word = w(s0 + wi)
              var ci = 0
              while (ci < word.length) {
                h ^= word.charAt(ci).toLong
                h *= 0x100000001b3L
                ci += 1
              }
              wi += 1
            }
            val x = mix64(h)
            var i = 0
            while (i < nh) {
              val v = mix64(x ^ seeds(i))
              if (v < sig(i)) sig(i) = v
              i += 1
            }
            s0 += 1
          }
        }
        sig.toSeq
      }
    }
    docs.select(col("doc_id"), sigUdf(col("text")).as("sig"))
  }

  /** LSH banding over minhash signatures: docs sharing any band bucket are
    * candidates; candidates verified by signature similarity (estimated
    * Jaccard = fraction of equal minhashes).
    */
  def minhashLshCandidates(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, estThreshold: Double = 0.7,
      recomputable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    // ONE explicit doc_id exchange under the signature UDF: the banding
    // explode and the two per-side signature joins below all hang off this
    // same canonical subplan, so ReusedExchange makes the (dominant)
    // signature computation run ONCE — without it the plan computed the
    // UDF once for the bucket exchange and again for the candidate-pair
    // signature joins. The exchange itself carries numHashes longs per doc
    // (constant-size), orders of magnitude below the token stream it hashes.
    val sigs = minhashSignatures(docs, n, numHashes, recomputable)
      .repartition(col("doc_id"))
    val bandUdf = udf { (sig: Seq[Long]) =>
      if (sig.isEmpty) Seq.empty[(Int, Long)] // shingle-free doc: no buckets
      else (0 until bands).map { b =>
        var h = 0xcbf29ce484222325L ^ b.toLong
        (0 until rows).foreach { r => h = mix64(h ^ sig(b * rows + r)) }
        (b, h)
      }
    }
    // SLIM self-join: the (band, bucket) exchange carries only
    // (doc_id, band, bucket) — shipping the sig column through explode would
    // duplicate every 512-byte signature `bands` times on BOTH join sides,
    // dominating the exchange payload at corpus scale. Signatures join back
    // onto the (far smaller) distinct candidate-pair set, once per side.
    val buckets = sigs.select(col("doc_id"), explode(bandUdf(col("sig"))).as("bk"))
      .select(col("doc_id"), col("bk._1").as("band"), col("bk._2").as("bucket"))
    val estUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    }
    val candPairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct() // est_jaccard is pair-deterministic: the old per-band
                  // max() over identical values is just dedup
    candPairs
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        estUdf(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= estThreshold)
  }

  /** Exact word-n-gram Jaccard of two texts (distinct shingles). */
  def exactJaccard(ta: String, tb: String, n: Int): Double = {
    def set(t: String): Set[String] = {
      val w = tokens(t)
      if (w.length < n) Set.empty[String]
      else w.sliding(n).map(_.mkString(" ")).toSet
    }
    val a = set(ta); val b = set(tb)
    val inter = a.intersect(b).size
    val union = a.size + b.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Production near-dup path, ORACLE-VERIFIABLE end to end: MinHash+LSH
    * banding generates candidates (the scale step — one equi-join on
    * (band, bucket), no pairwise blowup), then candidates are VERIFIED with
    * the exact n-gram Jaccard, so the output is a deterministic function of
    * the texts alone (an external SQL engine recomputes it without knowing
    * our hashes). Band geometry is chosen so candidate-generation recall at
    * `threshold` is ~1: with rows = numHashes/bands = 2, a pair at j = 0.7
    * collides in ≥1 of 32 bands with prob 1 − (1 − 0.49)^32 ≈ 1 − 4e-10.
    */
  def minhashNearDupPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
      bands: Int = 32, threshold: Double = 0.7): DataFrame = {
    // loose estimated-jaccard prefilter: est ~ Binomial(numHashes, j)/numHashes,
    // so est ≥ threshold−0.3 is ≥5σ below the mean for true pairs — prunes
    // bucket-collision noise without endangering recall
    val cands = minhashLshCandidates(docs, n, numHashes, bands,
      estThreshold = math.max(0.0, threshold - 0.3))
    val ng = n
    val jUdf = udf((ta: String, tb: String) => exactJaccard(ta, tb, ng))
    cands
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", jUdf(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Canonicalize near-dup PAIRS into clusters: connected components over
    * the pair graph, canonical id = the minimum doc_id of each component —
    * the step a dedup pipeline actually needs after pair generation (keep
    * the canonical, drop the rest). Returns (doc_id, canonical_id) for every
    * doc that appears in a pair.
    *
    * Spark-first: iterative min-label propagation — each round joins the
    * edge list against current labels and takes the per-vertex minimum; the
    * loop is DRIVER-CONTROLLED but all data stays distributed (labels and
    * edges never collect). Converges in O(component diameter) rounds; dup
    * clusters are shallow (near-dup similarity is near-transitive), so a
    * handful of rounds suffice — at web scale the same loop is the standard
    * label-propagation CC (GraphX's connectedComponents is this plus
    * star-contraction for pathological diameters).
    */
  def canonicalizeNearDups(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    // unpersist must target the DataFrame persist() was CALLED on — a
    // projection over it is a different plan and unpersisting that is a
    // silent no-op (cascade=false), leaking one cached label table per round
    var cached = labels
    // try/finally over the whole loop: the non-convergence throw and any
    // mid-loop job failure must release the edge list and the last label
    // cache — a long-lived session retrying failed calls would otherwise
    // pin one edge-list + label-table cache per attempt
    try {
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIter) {
        val nbrMin = edges.join(labels.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(min("label").as("nlabel"))
        val next = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("label").as("prev"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
          .persist()
        // materialize `next` BEFORE dropping its parents — unpersisting first
        // would make every later round recompute the whole join chain
        changed = next.where(col("label") < col("prev")).count()
        cached.unpersist()
        cached = next
        labels = next.select("id", "label") // backed by the cached `next`
        iter += 1
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"canonicalizeNearDups did not converge in $maxIter rounds " +
            "(component diameter exceeds maxIter) — raise maxIter")
      // hand the CALLER a releasable result: materialize the (much smaller)
      // final label table into its own cache, then drop the last iteration
      // table — returning a projection over it would leak one cached
      // iteration-sized DataFrame per call that unpersist() on the returned
      // handle could never release (projection unpersist is a no-op)
      val result = labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
        .persist()
      result.count()
      result
    } finally {
      edges.unpersist()
      cached.unpersist()
    }
  }

  /** Low 60 bits of md5(token) — the token hash behind [[simhash60]].
    * md5 (not FNV/xxhash) so an external SQL engine recomputes the identical
    * sketch (same discipline as the oracled axis-sign LSH and the md5
    * fingerprint); a deployment free of the oracle contract can swap in any
    * 64-bit hash — every downstream bit-count/block/join is unchanged.
    */
  def md5Low60(s: String): Long =
    md5Low60(s, java.security.MessageDigest.getInstance("MD5"))

  /** Same, with a caller-owned digest — [[simhash60]] hoists the JCA
    * provider lookup out of its per-token loop (digest() resets the
    * instance, so reuse is safe).
    */
  def md5Low60(s: String, md: java.security.MessageDigest): Long = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = top 7.5 bytes of the digest
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = d(i) & 0xff
      if (i < 7) v = (v << 8) | b
      else v = (v << 4) | (b >>> 4) // 15th hex digit = high nibble of byte 7
      i += 1
    }
    v
  }

  /** 60-bit SimHash over terms weighted by tf (md5-derived bit vectors —
    * fully recomputable by the DuckDB oracle, see [[md5Low60]]).
    */
  def simhash60(text: String): Long =
    simhash60Tokens(tokens(text))

  /** Token-array form of [[simhash60]] — callers that already tokenized
    * (e.g. [[simhashPairs]]'s emptiness gate) skip a second pass.
    */
  def simhash60Tokens(w: Array[String]): Long = {
    val acc = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    w.foreach { t =>
      val h = md5Low60(t, md)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup candidates: 4 blocks of 15 bits; pairs sharing a block
    * verified by full Hamming distance ≤ maxHamming.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // token-free docs (empty, punctuation-only) have no sketch: they would
    // all hash to the same value and pair up as hamming-0 "duplicates"
    // with no shared content, at quadratic join cost
    val shUdf = udf { (text: String) =>
      // tokenize ONCE via THE shared tokenizer (tokens() is null-safe): the
      // emptiness gate and the sketch share the pass, and the sketch here
      // cannot drift from the verification tokenization
      val w = tokens(text)
      if (w.isEmpty) None else Some(simhash60Tokens(w))
    }
    val sh = docs.select(col("doc_id"), shUdf(col("text")).as("simhash"))
      .where(col("simhash").isNotNull)
    val blockUdf = udf((h: Long) => (0 until 4).map(b => (b, (h >>> (15 * b)) & 0x7fffL)))
    val blocks = sh.select(col("doc_id"), col("simhash"), explode(blockUdf(col("simhash"))).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk._1").as("block"), col("bk._2").as("value"))
    blocks.as("a").join(blocks.as("b"),
        col("a.block") === col("b.block") && col("a.value") === col("b.value") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Planted-near-dup corpus used by SparkEntry/oracle queries: every doc with
    * doc_id % dupEvery == 0 gets a near-copy (id + 1,000,000, text + suffix)
    * and every doc with doc_id % exactEvery == 0 an exact copy (id + 2,000,000).
    * Pure column arithmetic so DuckDB can rebuild it identically.
    * Precondition: base doc_ids must be < 1,000,000 (the planted id spaces),
    * or a planted copy silently shares an id with an unrelated base doc —
    * callers with synthetic corpora guard this (see ScaleLadder.docsAt).
    */
  def withPlantedDups(docs: DataFrame, dupEvery: Int = 17, exactEvery: Int = 23): DataFrame = {
    val near = docs.filter(pmod(col("doc_id"), lit(dupEvery)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" near dup suffix")).as("text"))
    val exact = docs.filter(pmod(col("doc_id"), lit(exactEvery)) === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    docs.select("doc_id", "text").union(near).union(exact)
  }
}
