package graft.index

/** Posting-list block format.
  *
  * Re-implements, from scratch and Spark-side, the storage layer the reference
  * delegates to Lucene (rajatjain/cataloguesearch configs/opensearch-config.yaml:1-5):
  * per term a docID-sorted list split into blocks of [[Postings.BlockSize]]
  * documents, docID gaps + term frequencies PFor-compressed, with a skip table
  * (one entry per block: first/last docID + payload offsets) and per-block
  * max-score metadata (maxTf, minDl) enabling Block-Max WAND pruning.
  *
  * Positions (for phrase queries, reference `match_phrase`
  * backend/search/index_searcher.py:175-181) are stored in a PARALLEL byte
  * stream (`posBlob`) so non-phrase queries never read them — in Parquet that
  * is a separate column pruned away unless selected.
  *
  * blob layout:
  *   [numBlocks:vb][df:vb][cf:vb]
  *   skip section, one entry per block:
  *     [firstDoc - prevLastDoc :vb][lastDoc - firstDoc :vb][count:vb]
  *     [payloadLen:vb][posLen:vb][maxTf:vb][minDl:vb]
  *   payload section, per block:
  *     PFor(docGaps, count-1)   -- gaps between consecutive docIDs
  *     PFor(tf-1, count)
  *     PFor(dl, count)          -- exact doc length (BM25 norm; Lucene keeps a
  *                                 quantized norms file — we keep exact dl,
  *                                 and rank-parity is defined on exact dl, §5)
  *
  * posBlob layout, per block, per doc (tf positions each):
  *   vbyte delta-coded positions (first raw, then gaps).
  */
object Postings {
  val BlockSize = 128
}

/** Accumulates (docId, tf, dl, positions) in strictly increasing docId order
  * and emits the compressed blob + posBlob. Single-threaded; runs inside one
  * Spark task (mapPartitions over sorted runs, or the k-way merge).
  */
final class PostingListWriter {
  import Postings.BlockSize

  private val docIds = new Array[Long](BlockSize)
  private val tfsMinus1 = new Array[Long](BlockSize)
  private val dls = new Array[Long](BlockSize)
  private var minDl = Int.MaxValue
  private var maxTf = 0
  private var n = 0

  private var df = 0
  private var cf = 0L
  private var prevLastDoc = 0L
  private var lastDocAdded = -1L
  private var withPositions = false // latched by the first add

  private val skips = new ByteBuilder(64)
  private val payload = new ByteBuilder(256)
  private val posPayload = new ByteBuilder(256)
  private val posBlock = new ByteBuilder(128)
  private var numBlocks = 0

  def add(docId: Long, tf: Int, dl: Int, positions: Array[Int]): Unit = {
    require(docId > lastDocAdded,
      s"postings must be added in strictly increasing docId order ($docId after $lastDocAdded)")
    require(tf >= 1, s"tf must be >= 1, got $tf")
    lastDocAdded = docId
    docIds(n) = docId
    tfsMinus1(n) = (tf - 1).toLong
    dls(n) = dl.toLong
    if (dl < minDl) minDl = dl
    if (tf > maxTf) maxTf = tf
    n += 1
    df += 1
    cf += tf
    // positions are ALL-OR-NOTHING per list: the reader consumes exactly
    // tf positions per doc, so one positionless doc among positions-bearing
    // ones would silently shift the stream off-frame for every later doc —
    // the same corruption class the length require below stops. Latched on
    // the first add (df was bumped above, so first-add df == 1).
    if (df == 1) withPositions = positions != null
    else require((positions != null) == withPositions,
      s"doc $docId: ${if (withPositions) "missing" else "unexpected"} " +
        "positions — a posting list stores positions for all docs or none")
    if (positions != null) {
      // the reader consumes exactly tf positions per doc — a length mismatch
      // would shift the position stream off-frame for every LATER doc in the
      // list, corrupting phrase verification with no error
      require(positions.length == tf,
        s"doc $docId: positions.length ${positions.length} != tf $tf")
      var prev = 0
      var i = 0
      while (i < positions.length) {
        VByte.encodeOne((positions(i) - prev).toLong, posBlock)
        prev = positions(i)
        i += 1
      }
    }
    if (n == BlockSize) flushBlock()
  }

  private def flushBlock(): Unit = {
    if (n == 0) return
    val firstDoc = docIds(0)
    val lastDoc = docIds(n - 1)
    val gaps = new Array[Long](math.max(n - 1, 0))
    var i = 1
    while (i < n) { gaps(i - 1) = docIds(i) - docIds(i - 1); i += 1 }
    val payloadStart = payload.size
    PFor.encode(gaps, n - 1, payload)
    PFor.encode(tfsMinus1, n, payload)
    PFor.encode(dls, n, payload)
    val payloadLen = payload.size - payloadStart
    val posBytes = posBlock.result()
    posPayload.addAll(posBytes)

    VByte.encodeOne(firstDoc - prevLastDoc, skips)
    VByte.encodeOne(lastDoc - firstDoc, skips)
    VByte.encodeOne(n.toLong, skips)
    VByte.encodeOne(payloadLen.toLong, skips)
    VByte.encodeOne(posBytes.length.toLong, skips)
    VByte.encodeOne(maxTf.toLong, skips)
    VByte.encodeOne(minDl.toLong, skips)

    prevLastDoc = lastDoc
    numBlocks += 1
    n = 0
    minDl = Int.MaxValue
    maxTf = 0
    posBlock.reset()
  }

  /** @return (blob, posBlob, df, cf) */
  def finish(): (Array[Byte], Array[Byte], Int, Long) = {
    flushBlock()
    val head = new ByteBuilder(16 + skips.size + payload.size)
    VByte.encodeOne(numBlocks.toLong, head)
    VByte.encodeOne(df.toLong, head)
    VByte.encodeOne(cf, head)
    head.addAll(skips.result())
    head.addAll(payload.result())
    (head.result(), posPayload.result(), df, cf)
  }
}

/** Decodes the skip table eagerly (numBlocks = df/128 entries — small) and
  * block payloads lazily on demand.
  */
final class PostingListReader(blob: Array[Byte], posBlob: Array[Byte]) {
  private val c0 = new Cursor(0)
  val numBlocks: Int = VByte.decodeOne(blob, c0).toInt
  val df: Int = VByte.decodeOne(blob, c0).toInt
  val cf: Long = VByte.decodeOne(blob, c0)

  val firstDocs = new Array[Long](numBlocks)
  val lastDocs = new Array[Long](numBlocks)
  val counts = new Array[Int](numBlocks)
  val payloadOffs = new Array[Int](numBlocks)
  val posOffs = new Array[Int](numBlocks)
  val posLens = new Array[Int](numBlocks)
  val maxTfs = new Array[Int](numBlocks)
  val minDls = new Array[Int](numBlocks)

  private val payloadBase: Int = { // decode skip section
    val c = c0
    var prevLast = 0L
    var payOff = 0
    var posOff = 0
    var i = 0
    while (i < numBlocks) {
      val first = prevLast + VByte.decodeOne(blob, c)
      val last = first + VByte.decodeOne(blob, c)
      counts(i) = VByte.decodeOne(blob, c).toInt
      val payLen = VByte.decodeOne(blob, c).toInt
      val posLen = VByte.decodeOne(blob, c).toInt
      maxTfs(i) = VByte.decodeOne(blob, c).toInt
      minDls(i) = VByte.decodeOne(blob, c).toInt
      firstDocs(i) = first
      lastDocs(i) = last
      payloadOffs(i) = payOff
      posOffs(i) = posOff
      posLens(i) = posLen
      prevLast = last
      payOff += payLen
      posOff += posLen
      i += 1
    }
    c.pos
  }

  /** Decode block i into (docIds, tfs, dls). Fresh arrays each call. */
  def decodeBlock(i: Int): (Array[Long], Array[Int], Array[Int]) = {
    val c = new Cursor(payloadBase + payloadOffs(i))
    val gaps = PFor.decode(blob, c)
    val tfm1 = PFor.decode(blob, c)
    val dlsL = PFor.decode(blob, c)
    val cnt = counts(i)
    val ids = new Array[Long](cnt)
    val tfs = new Array[Int](cnt)
    val dls = new Array[Int](cnt)
    ids(0) = firstDocs(i)
    var k = 1
    while (k < cnt) { ids(k) = ids(k - 1) + gaps(k - 1); k += 1 }
    k = 0
    while (k < cnt) { tfs(k) = tfm1(k).toInt + 1; dls(k) = dlsL(k).toInt; k += 1 }
    (ids, tfs, dls)
  }

  /** Decode positions of block i; positions(j) holds the tf(j) positions of
    * the j-th doc of the block. Requires posBlob to have been loaded.
    */
  def decodePositions(i: Int, tfs: Array[Int]): Array[Array[Int]] = {
    // null OR empty: a storePositions=false segment row carries an EMPTY
    // posBlob (parquet never yields null) — without this the first decode
    // would AIOOBE deep in a task instead of raising the designed error
    require(posBlob != null && posBlob.length > 0,
      "positions were not loaded for this posting list")
    val c = new Cursor(posOffs(i))
    val out = new Array[Array[Int]](tfs.length)
    var j = 0
    while (j < tfs.length) {
      val m = tfs(j)
      val ps = new Array[Int](m)
      var prev = 0
      var t = 0
      while (t < m) {
        prev += VByte.decodeOne(posBlob, c).toInt
        ps(t) = prev
        t += 1
      }
      out(j) = ps
      j += 1
    }
    out
  }

  /** Upper bound on BM25 tf-normalization for block i:
    * tfNorm(tf, dl) = tf / (tf + k1·(1 − b + b·dl/avgdl)) is increasing in tf
    * and decreasing in dl, so (maxTf, minDl) bound every posting in the block.
    */
  def blockMaxTfNorm(i: Int, k1: Double, b: Double, avgdl: Double): Double = {
    val tf = maxTfs(i).toDouble
    val dl = minDls(i).toDouble
    tf / (tf + k1 * (1 - b + b * dl / avgdl))
  }

  def maxTfNorm(k1: Double, b: Double, avgdl: Double): Double = {
    var m = 0.0
    var i = 0
    while (i < numBlocks) {
      val v = blockMaxTfNorm(i, k1, b, avgdl)
      if (v > m) m = v
      i += 1
    }
    m
  }

  def iterator(withPositions: Boolean = false): PostingIterator =
    new PostingIterator(this, withPositions)
}

object PostingListReader {
  /** Every docId of a posting blob, decoded — THE shared drain loop for
    * callers that want the id set rather than a live iterator (the
    * IndexAccessRule candidate generator, Bm25Query's exclude-terms
    * semi-join side). One definition keeps the start/exhausted/next
    * protocol in one place; kernels that drive skip pointers keep using
    * the raw iterator. NULL-safe: null blob → no ids.
    */
  def docIds(blob: Array[Byte]): Array[Long] = {
    if (blob == null) return Array.empty[Long]
    val r = new PostingListReader(blob, null)
    val out = new Array[Long](r.df)
    val it = r.iterator()
    it.start()
    var i = 0
    while (!it.exhausted) {
      // a corrupt blob whose actual posting count exceeds its encoded df
      // must fail with a diagnosis, not a bare ArrayIndexOutOfBoundsException
      if (i >= out.length)
        throw new IllegalStateException(
          s"posting blob df mismatch: encoded df=${r.df} but the blob decodes more postings")
      out(i) = it.docId; i += 1; it.next()
    }
    if (i == out.length) out else java.util.Arrays.copyOf(out, i)
  }
}

/** Forward-only iterator with skip-based advance. `advance(target)` uses the
  * skip table (lastDocs) to jump whole blocks — the skip-pointer semantics of
  * the north rule — then scans within the block.
  */
final class PostingIterator(r: PostingListReader, withPositions: Boolean) {
  private var blockIdx = -1
  private var ids: Array[Long] = null
  private var tfs: Array[Int] = null
  private var dls: Array[Int] = null
  private var poss: Array[Array[Int]] = null
  private var i = 0

  var docId: Long = -1L
  var tf: Int = 0

  def exhausted: Boolean = docId == Long.MaxValue

  def dl: Int = dls(i)

  def positions: Array[Int] = if (poss == null) null else poss(i)

  private def loadBlock(b: Int): Unit = {
    blockIdx = b
    val (a, t, d) = r.decodeBlock(b)
    ids = a
    tfs = t
    dls = d
    poss = if (withPositions) r.decodePositions(b, t) else null
    i = 0
    docId = ids(0)
    tf = tfs(0)
  }

  /** Move to first posting; call once before use. Returns false if empty. */
  def start(): Boolean = {
    if (r.numBlocks == 0) { docId = Long.MaxValue; false }
    else { loadBlock(0); true }
  }

  def next(): Unit = {
    i += 1
    if (i < ids.length) { docId = ids(i); tf = tfs(i) }
    else if (blockIdx + 1 < r.numBlocks) loadBlock(blockIdx + 1)
    else docId = Long.MaxValue
  }

  /** Advance to the first posting with docId >= target. */
  def advance(target: Long): Unit = {
    if (docId >= target) return
    // skip whole blocks via skip table
    if (blockIdx < 0 || r.lastDocs(blockIdx) < target) {
      var b = math.max(blockIdx, 0)
      while (b < r.numBlocks && r.lastDocs(b) < target) b += 1
      if (b >= r.numBlocks) { docId = Long.MaxValue; return }
      if (b != blockIdx) loadBlock(b)
    }
    while (i < ids.length && ids(i) < target) i += 1
    if (i < ids.length) { docId = ids(i); tf = tfs(i) }
    else if (blockIdx + 1 < r.numBlocks) { loadBlock(blockIdx + 1); advance(target) }
    else docId = Long.MaxValue
  }

  /** For block-max traversal: upper bound of current block's tfNorm. */
  def currentBlockMaxTfNorm(k1: Double, b: Double, avgdl: Double): Double =
    r.blockMaxTfNorm(blockIdx, k1, b, avgdl)

  /** Last docId of current block (block-max pivot arithmetic). */
  def currentBlockLastDoc: Long = r.lastDocs(blockIdx)
}

/** K-way sort-merge of posting-list runs with pairwise-disjoint doc sets
  * (salted sub-partitions of one term, or per-chunk segments — the
  * "merge via sort-merge across salted term partitions" clause of the north
  * rule). Streaming: memory O(BlockSize · k).
  */
object PostingListMerger {

  def merge(runs: Seq[(Array[Byte], Array[Byte])]): (Array[Byte], Array[Byte], Int, Long) = {
    if (runs.size == 1) {
      // fast path: single run is already in final format
      val (b, p) = runs.head
      val r = new PostingListReader(b, p)
      return (b, p, r.df, r.cf)
    }
    // positions-free runs (storePositions = false builds) have EMPTY posBlobs:
    // decoding positions from them would misread; merge without positions and
    // emit an equally positions-free result
    val withPos = runs.forall { case (_, p) => p != null && p.nonEmpty }
    val its = runs.map { case (b, p) => new PostingIterator(new PostingListReader(b, p), withPositions = withPos) }
      .filter(_.start())
      .toArray
    val heap = new java.util.PriorityQueue[PostingIterator](
      math.max(its.length, 1),
      (a: PostingIterator, b: PostingIterator) => java.lang.Long.compare(a.docId, b.docId))
    its.foreach(heap.add)
    val w = new PostingListWriter
    while (!heap.isEmpty) {
      val it = heap.poll()
      w.add(it.docId, it.tf, it.dl, it.positions)
      it.next()
      if (!it.exhausted) heap.add(it)
    }
    w.finish()
  }
}
