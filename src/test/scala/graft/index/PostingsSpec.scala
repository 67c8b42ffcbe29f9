package graft.index

import org.scalatest.funsuite.AnyFunSuite

class PostingsSpec extends AnyFunSuite {

  case class P(docId: Long, tf: Int, dl: Int, positions: Array[Int])

  private def genPostings(n: Int, seed: Long, maxGap: Int = 1000): Array[P] = {
    val rnd = new scala.util.Random(seed)
    var doc = rnd.nextInt(100).toLong
    Array.fill(n) {
      val tf = 1 + rnd.nextInt(20)
      val dl = tf + rnd.nextInt(500)
      var pos = 0
      val positions = Array.fill(tf) { pos += 1 + rnd.nextInt(30); pos }
      val p = P(doc, tf, dl, positions)
      doc += 1 + rnd.nextInt(maxGap)
      p
    }
  }

  private def encode(ps: Array[P]): (Array[Byte], Array[Byte], Int, Long) = {
    val w = new PostingListWriter
    ps.foreach(p => w.add(p.docId, p.tf, p.dl, p.positions))
    w.finish()
  }

  test("roundtrip: docIds, tfs, positions across many block boundaries") {
    for (n <- Seq(1, 5, 127, 128, 129, 1000, 5000)) {
      val ps = genPostings(n, seed = n)
      val (blob, posBlob, df, cf) = encode(ps)
      assert(df == n)
      assert(cf == ps.map(_.tf.toLong).sum)
      val r = new PostingListReader(blob, posBlob)
      assert(r.df == n && r.cf == cf)
      val it = r.iterator(withPositions = true)
      assert(it.start())
      ps.foreach { p =>
        assert(it.docId == p.docId, s"n=$n")
        assert(it.tf == p.tf)
        assert(it.dl == p.dl)
        assert(it.positions.toSeq == p.positions.toSeq)
        it.next()
      }
      assert(it.exhausted)
    }
  }

  test("mixed positions presence within one list is refused, not silently mis-framed") {
    // the reader consumes exactly tf positions per doc, so one positionless
    // doc among positions-bearing ones would shift the stream off-frame for
    // every later doc — phrase verification reading garbage with no error.
    // The writer latches positions presence on the first add.
    val w1 = new PostingListWriter
    w1.add(1L, 2, 10, Array(1, 5))
    val e1 = intercept[IllegalArgumentException](w1.add(2L, 1, 8, null))
    assert(e1.getMessage.contains("positions"), e1.getMessage)
    val w2 = new PostingListWriter
    w2.add(1L, 1, 10, null)
    val e2 = intercept[IllegalArgumentException](w2.add(2L, 1, 8, Array(3)))
    assert(e2.getMessage.contains("positions"), e2.getMessage)
    // all-positions and no-positions lists both stay legal
    val w3 = new PostingListWriter
    w3.add(1L, 1, 10, Array(2)); w3.add(2L, 1, 8, Array(4)); w3.finish()
    val w4 = new PostingListWriter
    w4.add(1L, 1, 10, null); w4.add(2L, 1, 8, null); w4.finish()
  }

  test("advance lands on first docId >= target, matching a linear scan") {
    val ps = genPostings(4000, seed = 99)
    val (blob, posBlob, _, _) = encode(ps)
    val r = new PostingListReader(blob, posBlob)
    val rnd = new scala.util.Random(1)
    val docs = ps.map(_.docId)
    for (_ <- 1 to 300) {
      val target = rnd.between(docs.head - 10, docs.last + 10)
      val it = r.iterator()
      it.start()
      it.advance(target)
      val expected = docs.find(_ >= target)
      expected match {
        case Some(d) => assert(it.docId == d, s"target=$target")
        case None    => assert(it.exhausted, s"target=$target")
      }
    }
    // monotone sequence of advances on a single iterator
    val it = r.iterator()
    it.start()
    var t = docs.head
    while (t < docs.last) {
      it.advance(t)
      assert(it.docId == docs.find(_ >= t).get)
      t += 1 + rnd.nextInt(5000)
    }
  }

  test("block-max invariant: blockMaxTfNorm bounds every posting's tfNorm") {
    val ps = genPostings(3000, seed = 5)
    val (blob, posBlob, _, _) = encode(ps)
    val r = new PostingListReader(blob, posBlob)
    val (k1, b, avgdl) = (1.2, 0.75, 200.0)
    def tfNorm(tf: Int, dl: Int) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    var i = 0
    var blockIdx = 0
    var inBlock = 0
    while (i < ps.length) {
      val bound = r.blockMaxTfNorm(blockIdx, k1, b, avgdl)
      assert(tfNorm(ps(i).tf, ps(i).dl) <= bound + 1e-12)
      inBlock += 1
      if (inBlock == Postings.BlockSize) { inBlock = 0; blockIdx += 1 }
      i += 1
    }
  }

  test("k-way merge of disjoint salted runs == single-run encode (determinism)") {
    val ps = genPostings(2500, seed = 13)
    val (wholeBlob, wholePos, _, _) = encode(ps)
    for (k <- Seq(2, 3, 7)) {
      // salt assignment: hash of docId — interleaved doc ranges, like salted builds
      val runs = (0 until k).map { s =>
        ps.filter(p => Math.floorMod(java.lang.Long.hashCode(p.docId * 2654435761L), k) == s)
      }.filter(_.nonEmpty).map(encode).map { case (b, p, _, _) => (b, p) }
      val (mBlob, mPos, mdf, mcf) = PostingListMerger.merge(runs)
      assert(mdf == ps.length)
      assert(mcf == ps.map(_.tf.toLong).sum)
      // merged doc/tf/positions sequence identical to single-run build
      val a = new PostingListReader(mBlob, mPos).iterator(withPositions = true)
      val e = new PostingListReader(wholeBlob, wholePos).iterator(withPositions = true)
      a.start(); e.start()
      while (!e.exhausted) {
        assert(a.docId == e.docId && a.tf == e.tf)
        assert(a.positions.toSeq == e.positions.toSeq)
        a.next(); e.next()
      }
      assert(a.exhausted)
    }
  }

  test("merge fast path: single run passes through byte-identically") {
    val ps = genPostings(500, seed = 21)
    val (blob, pos, _, _) = encode(ps)
    val (mBlob, mPos, _, _) = PostingListMerger.merge(Seq((blob, pos)))
    assert(java.util.Arrays.equals(mBlob, blob) && java.util.Arrays.equals(mPos, pos))
  }
}
