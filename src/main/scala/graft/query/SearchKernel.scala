package graft.query

import graft.index.{PostingIterator, PostingListReader}

/** BM25 with Lucene/OpenSearch defaults — the reference does not override
  * `similarity` (configs/opensearch-config.yaml:1-5), so k1=1.2, b=0.75 and
  *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   tfNorm   = tf / (tf + k1·(1 − b + b·dl/avgdl))
  *   score(d) = Σ_t idf(t)·tfNorm(tf_td, dl_d)
  * We use exact dl (no 1-byte norm quantization); rank parity is gated
  * against the in-repo oracle scorer with the same formula (SURVEY §5.2#4).
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75
  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))
  def tfNorm(tf: Int, dl: Int, avgdl: Double): Double =
    tf / (tf + K1 * (1 - B + B * dl / avgdl))
  def score(tf: Int, dl: Int, avgdl: Double, idfV: Double): Double =
    idfV * tfNorm(tf, dl, avgdl)
}

/** One scored hit inside a segment. */
case class ScoredDoc(docId: Long, score: Double)

/** Kernel result for one segment: top-(from+k) heap content (unsorted) and the
  * hit count, exact up to `trackTotalHits` (reference `track_total_hits: 1000`,
  * backend/search/index_searcher.py:227).
  */
case class SegmentResult(top: Array[ScoredDoc], hitCount: Long, capped: Boolean)

/** A query term with its posting iterator and query-global statistics. */
final class TermState(val term: String, val it: PostingIterator,
    val idf: Double, val maxTfNorm: Double, val qPos: Int) {
  def maxScore: Double = idf * maxTfNorm
}

/** Bounded min-heap of (score, docId) with deterministic tie-break:
  * higher score wins; equal score → LOWER docId wins (Lucene doc-order ties).
  */
final class TopK(k: Int) {
  // initial capacity capped: k may be "unbounded" (return-all consumers);
  // the queue grows dynamically past 4096 if needed
  private val heap = new java.util.PriorityQueue[ScoredDoc](math.min(math.max(k, 1), 4096),
    (a: ScoredDoc, b: ScoredDoc) => {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.docId, a.docId) // min-heap: "worst" first
    })
  def size: Int = heap.size
  // k <= 0 (pageSize 0 = count-only, like OpenSearch size:0) keeps nothing
  // but must not PRUNE: the heap never fills, the threshold stays -inf so
  // WAND scores every match and hit counts stay exact, and offer is a no-op
  // — heap.peek() on the empty heap would otherwise NPE on the first match
  def threshold: Double =
    if (k <= 0 || heap.size < k) Double.NegativeInfinity else heap.peek().score
  def offer(d: ScoredDoc): Unit = {
    if (k <= 0) ()
    else if (heap.size < k) heap.add(d)
    else {
      val w = heap.peek()
      if (d.score > w.score || (d.score == w.score && d.docId < w.docId)) {
        heap.poll(); heap.add(d)
      }
    }
  }
  def toArray: Array[ScoredDoc] = {
    val a = new Array[ScoredDoc](heap.size)
    heap.toArray(a)
  }
}

/** Sorted-docId membership testers for filters. */
final class SortedIdSet(ids: Array[Long]) {
  private var p = 0
  /** Targets must be queried in non-decreasing order.
    *
    * Galloping advance, not a linear scan: a SPARSE candidate stream (rare
    * term) against a corpus-sized allowed list (has_date covers most docs)
    * would otherwise walk the whole array one element at a time — O(|ids|)
    * per query instead of O(matches · log gap).
    */
  def contains(target: Long): Boolean = {
    if (p >= ids.length) return false
    if (ids(p) >= target) return ids(p) == target
    // gallop: double the step until we overshoot, then binary-search the
    // bracketed window [p+step/2, min(p+step, len))
    var step = 1
    var hi = p + 1
    while (hi < ids.length && ids(hi) < target) {
      p = hi // everything below hi is < target — cursor never re-reads it
      step <<= 1
      hi = p + step
    }
    if (hi >= ids.length) hi = ids.length - 1
    // invariant: ids(p) < target; binary search in (p, hi]
    var lo = p
    var h = hi
    while (h - lo > 1) {
      val mid = (lo + h) >>> 1
      if (ids(mid) < target) lo = mid else h = mid
    }
    p = if (ids(h) < target) h + 1 else h
    p < ids.length && ids(p) == target
  }
  def isEmpty: Boolean = ids.isEmpty
}

/** Per-segment scoring kernel: conjunctive (AND) intersection with skip
  * pointers, disjunctive (OR) Block-Max WAND, optional phrase verification,
  * exclusion postings and filter sets. Plain Scala — runs either on the
  * driver (low-latency path) or inside an executor task (distributed
  * per-segment search).
  */
object SearchKernel {

  /** @param terms      query term states (posting iterators already started),
    *                   one per DISTINCT term
    * @param avgdl      corpus average doc length for the language
    * @param mode       All = reference `match` with operator:"and"
    *                   (index_searcher.py:184-191); Any = WAND top-k
    * @param phrase     verify exact consecutive positions (match_phrase, slop 0)
    * @param phrasePlan full analyzed query token list as (index into `terms`,
    *                   qPos) — repeated words map to the same TermState but
    *                   distinct positions ("batch batch" must match two
    *                   adjacent occurrences, not one)
    * @param excluded   iterators of excluded terms (must_not, :211-221)
    * @param allowed    docId whitelist from facet filters (terms/date filters)
    * @param k          heap size = from + pageSize
    * @param trackTotalHits count cap; WAND pruning only engages once the
    *                   count passes the cap (Lucene track_total_hits semantics)
    */
  def run(
      terms: Array[TermState],
      avgdl: Double,
      mode: String,
      phrase: Boolean,
      excluded: Array[PostingIterator],
      allowed: Option[SortedIdSet],
      k: Int,
      trackTotalHits: Long,
      phrasePlan: Array[(Int, Int)] = Array.empty): SegmentResult = {
    if (terms.isEmpty || terms.exists(t => mode == "all" && t.it.exhausted))
      return SegmentResult(Array.empty, 0L, capped = false)
    val live = terms.filter(!_.it.exhausted)
    if (live.isEmpty) return SegmentResult(Array.empty, 0L, capped = false)
    // (mode == "all" with any exhausted iterator already returned above)
    val plan =
      if (!phrase) Array.empty[(Int, Int)]
      else {
        // a plan synthesized from DEDUPED terms would drop repeated-word
        // occurrences ("a b a" would verify only "a b") — phrase callers
        // must pass the full analyzed plan (QueryCore always does)
        require(phrasePlan.nonEmpty,
          "phrase = true requires an explicit phrasePlan (one entry per " +
            "analyzed occurrence, repeated words included)")
        phrasePlan
      }
    if (mode == "all") runAnd(terms, avgdl, phrase, plan, excluded, allowed, k, trackTotalHits)
    else runWand(live, avgdl, excluded, allowed, k, trackTotalHits)
  }

  private def passesFilters(doc: Long, excluded: Array[PostingIterator],
      allowed: Option[SortedIdSet]): Boolean = {
    allowed match {
      case Some(s) if !s.contains(doc) => return false
      case _ =>
    }
    var e = 0
    while (e < excluded.length) {
      val it = excluded(e)
      if (!it.exhausted) {
        it.advance(doc)
        if (it.docId == doc) return false
      }
      e += 1
    }
    true
  }

  /** Leapfrog conjunction ordered by df asc, with skip-pointer advance. */
  private def runAnd(terms: Array[TermState], avgdl: Double, phrase: Boolean,
      phrasePlan: Array[(Int, Int)],
      excluded: Array[PostingIterator], allowed: Option[SortedIdSet],
      k: Int, cap: Long): SegmentResult = {
    // leapfrog order: rarest term first = highest idf first
    val ts = terms.sortBy(-_.idf)
    val top = new TopK(k)
    var hits = 0L
    var cand = ts(0).it.docId
    while (cand != Long.MaxValue) {
      // leapfrog all iterators to cand
      var agreed = true
      var maxDoc = cand
      var j = 0
      while (j < ts.length) {
        val it = ts(j).it
        it.advance(maxDoc)
        if (it.docId != maxDoc) {
          agreed = false
          maxDoc = it.docId
          j = ts.length // restart from max
        } else j += 1
      }
      if (maxDoc == Long.MaxValue) cand = Long.MaxValue
      else if (!agreed) cand = maxDoc
      else {
        // all at maxDoc == cand
        var ok = passesFilters(maxDoc, excluded, allowed)
        if (ok && phrase) ok = phraseMatch(terms, phrasePlan)
        if (ok) {
          var s = 0.0
          var m = 0
          while (m < ts.length) {
            s += Bm25.score(ts(m).it.tf, ts(m).it.dl, avgdl, ts(m).idf)
            m += 1
          }
          if (hits < cap) hits += 1
          top.offer(ScoredDoc(maxDoc, s))
          // count-only query (k <= 0) with the count saturated: nothing
          // downstream can change — stop scanning (Lucene's early-terminated
          // counting); with k > 0 the heap still needs every match
          if (k <= 0 && hits >= cap)
            return SegmentResult(top.toArray, hits, capped = true)
        }
        ts(0).it.next()
        cand = ts(0).it.docId
      }
    }
    SegmentResult(top.toArray, hits, capped = hits >= cap)
  }

  /** Exact consecutive-position verification (slop 0): some base position b
    * exists with token_j at position b + qPos_j for EVERY analyzed query
    * token (repeated words included via phrasePlan). Anchored on the first
    * token's positions.
    */
  private def phraseMatch(terms: Array[TermState], plan: Array[(Int, Int)]): Boolean = {
    val (aIdx, aPos) = plan(0)
    val anchorPos = terms(aIdx).it.positions
    var a = 0
    while (a < anchorPos.length) {
      val base = anchorPos(a) - aPos
      var j = 1
      var ok = base >= 0
      while (ok && j < plan.length) {
        val (tIdx, qp) = plan(j)
        ok = java.util.Arrays.binarySearch(terms(tIdx).it.positions, base + qp) >= 0
        j += 1
      }
      if (ok) return true
      a += 1
    }
    false
  }

  /** WAND with block-max refinement. Pruning by threshold engages only after
    * `cap` hits are counted, so hitCount is exact up to the cap.
    */
  private def runWand(terms: Array[TermState], avgdl: Double,
      excluded: Array[PostingIterator], allowed: Option[SortedIdSet],
      k: Int, cap: Long): SegmentResult = {
    val top = new TopK(k)
    var hits = 0L
    val ts = terms.clone()
    def sortByDoc(): Unit = java.util.Arrays.sort(ts,
      (x: TermState, y: TermState) => java.lang.Long.compare(x.it.docId, y.it.docId))
    sortByDoc()
    var continue = true
    while (continue) {
      val theta = if (hits >= cap) top.threshold else Double.NegativeInfinity
      // find pivot: smallest prefix with Σ maxScore > theta
      var acc = 0.0
      var p = 0
      var pivotFound = false
      while (p < ts.length && !pivotFound) {
        acc += ts(p).maxScore
        if (acc > theta && !ts(p).it.exhausted) pivotFound = true else p += 1
      }
      if (!pivotFound || ts(p).it.exhausted) continue = false
      else {
        val pivotDoc = ts(p).it.docId
        if (ts(0).it.docId == pivotDoc) {
          // extend the pivot over docId ties: iterators beyond p sitting on
          // pivotDoc contribute to the doc's true score, so the shallow bound
          // must include their block maxima too (standard BMW pivot widening;
          // without it a doc can be wrongly pruned once hits >= cap)
          while (p + 1 < ts.length && ts(p + 1).it.docId == pivotDoc) p += 1
          // block-max shallow check over iterators at pivotDoc
          var bm = 0.0
          var j = 0
          while (j <= p) {
            bm += ts(j).idf * ts(j).it.currentBlockMaxTfNorm(Bm25.K1, Bm25.B, avgdl)
            j += 1
          }
          if (bm > theta) {
            if (passesFilters(pivotDoc, excluded, allowed)) {
              var s = 0.0
              var m = 0
              while (m < ts.length && ts(m).it.docId == pivotDoc) {
                s += Bm25.score(ts(m).it.tf, ts(m).it.dl, avgdl, ts(m).idf)
                m += 1
              }
              if (hits < cap) hits += 1
              top.offer(ScoredDoc(pivotDoc, s))
              // count-only early exit, same as runAnd: with k <= 0 the heap
              // threshold stays -inf (never prunes), so without this a
              // saturated count would still walk every remaining posting
              if (k <= 0 && hits >= cap)
                return SegmentResult(top.toArray, hits, capped = true)
            }
            // advance all iterators sitting on pivotDoc
            var m2 = 0
            while (m2 < ts.length && ts(m2).it.docId == pivotDoc) {
              ts(m2).it.next()
              m2 += 1
            }
            sortByDoc()
          } else {
            // TRUE block-max skip (this branch used to advance ONE posting,
            // so a failed shallow check still walked every posting of a head
            // term one-by-one): every candidate in (pivotDoc, target) is
            // supported only by the tied iterators, whose contribution in
            // their CURRENT blocks is bounded by exactly the bm that just
            // failed, so none of those docs would be scored by the one-step
            // walk either — jump the whole tied group past the range via the
            // skip table. target = earliest tied block end + 1, capped at
            // the first untied iterator's docId (a doc at or past that
            // iterator could draw support from outside the tied group and
            // must be re-evaluated normally). theta > -inf only once the
            // count cap is reached, so exact counting below the cap — and
            // the count-only k <= 0 mode, whose theta stays -inf — are
            // untouched.
            var minBlockEnd = Long.MaxValue
            var j2 = 0
            while (j2 <= p) {
              val e = ts(j2).it.currentBlockLastDoc
              if (e < minBlockEnd) minBlockEnd = e
              j2 += 1
            }
            var target = minBlockEnd + 1
            if (p + 1 < ts.length && ts(p + 1).it.docId < target)
              target = ts(p + 1).it.docId
            if (target <= pivotDoc) target = pivotDoc + 1 // always progress
            var m2 = 0
            while (m2 < ts.length && ts(m2).it.docId == pivotDoc) {
              ts(m2).it.advance(target)
              m2 += 1
            }
            sortByDoc()
          }
        } else {
          // advance the largest-maxScore iterator sitting STRICTLY BEFORE
          // pivotDoc (a docId tie can straddle the pivot index: an iterator
          // already at pivotDoc must not be the advance candidate — its
          // advance(pivotDoc) is a no-op and the loop would never progress)
          var end = 0
          while (end < ts.length && ts(end).it.docId < pivotDoc) end += 1
          var best = 0
          var j = 1
          while (j < end) {
            if (ts(j).maxScore > ts(best).maxScore) best = j
            j += 1
          }
          ts(best).it.advance(pivotDoc)
          sortByDoc()
        }
      }
    }
    SegmentResult(top.toArray, hits, capped = hits >= cap)
  }
}
