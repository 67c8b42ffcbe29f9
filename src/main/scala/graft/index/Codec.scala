package graft.index

/** Low-level integer codecs for posting lists.
  *
  * The reference (rajatjain/cataloguesearch) delegates postings storage to
  * OpenSearch/Lucene (configs/opensearch-config.yaml:1-5); per the north rule
  * we build the codec layer from scratch: docID-delta + variable-byte and
  * PForDelta-style bit-packed blocks.
  *
  * All kernels are allocation-light, array-based plain Scala — they run inside
  * Spark tasks (mapPartitions / mapGroups) on the hot path.
  */
object VByte {

  /** Append one non-negative long as VByte (7 data bits/byte, MSB = continue). */
  def encodeOne(v: Long, out: ByteBuilder): Unit = {
    require(v >= 0, s"VByte requires non-negative value, got $v")
    var x = v
    while ((x & ~0x7fL) != 0L) {
      out.add(((x & 0x7f) | 0x80).toByte)
      x >>>= 7
    }
    out.add(x.toByte)
  }

  def encode(values: Array[Long]): Array[Byte] = {
    val out = new ByteBuilder(values.length * 2 + 8)
    var i = 0
    while (i < values.length) { encodeOne(values(i), out); i += 1 }
    out.result()
  }

  /** Decode one value starting at cursor.pos; advances cursor. */
  def decodeOne(bytes: Array[Byte], cursor: Cursor): Long = {
    var x = 0L
    var shift = 0
    var b = bytes(cursor.pos)
    cursor.pos += 1
    while ((b & 0x80) != 0) {
      x |= (b & 0x7fL) << shift
      shift += 7
      b = bytes(cursor.pos)
      cursor.pos += 1
    }
    x | ((b & 0x7fL) << shift)
  }

  def decode(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    val c = new Cursor(0)
    var i = 0
    while (i < n) { out(i) = decodeOne(bytes, c); i += 1 }
    out
  }
}

/** Mutable decode cursor (avoids tuple allocation in hot loops). */
final class Cursor(var pos: Int)

/** Growable byte array (like ByteArrayOutputStream without sync). */
final class ByteBuilder(initial: Int = 64) {
  private var buf = new Array[Byte](math.max(initial, 16))
  private var n = 0
  def size: Int = n
  def add(b: Byte): Unit = {
    if (n == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
    buf(n) = b
    n += 1
  }
  def addAll(bs: Array[Byte]): Unit = {
    if (n + bs.length > buf.length) {
      var cap = buf.length * 2
      while (cap < n + bs.length) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
    System.arraycopy(bs, 0, buf, n, bs.length)
    n += bs.length
  }
  def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  def reset(): Unit = { n = 0 }
}

/** Fixed-width bit packing: n values, each `bits` (≤32) wide, little-endian
  * bit stream. Foundation of the PFor block codec. The ≤32 invariant keeps the
  * 64-bit accumulator overflow-free (max in-flight bits = 7 + 32 < 64 on pack,
  * 31 + 8 < 64 on unpack); values wider than 32 bits are stored as PFor
  * exceptions instead.
  */
object BitPack {
  val MaxBits = 32

  def bytesNeeded(n: Int, bits: Int): Int = ((n.toLong * bits + 7) / 8).toInt

  /** Pack values(0..n-1) (each masked to `bits`) into out starting at outOff. */
  def pack(values: Array[Long], n: Int, bits: Int, out: Array[Byte], outOff: Int): Unit = {
    require(bits >= 0 && bits <= MaxBits, s"bits out of range: $bits")
    if (bits == 0) return
    val mask = (1L << bits) - 1L
    var acc = 0L
    var accBits = 0
    var o = outOff
    var i = 0
    while (i < n) {
      acc |= (values(i) & mask) << accBits
      accBits += bits
      while (accBits >= 8) {
        out(o) = acc.toByte
        o += 1
        acc >>>= 8
        accBits -= 8
      }
      i += 1
    }
    if (accBits > 0) out(o) = acc.toByte
  }

  /** Unpack n values of `bits` width from in(inOff..) into out(0..n-1). */
  def unpack(in: Array[Byte], inOff: Int, n: Int, bits: Int, out: Array[Long]): Unit = {
    require(bits >= 0 && bits <= MaxBits, s"bits out of range: $bits")
    if (bits == 0) { java.util.Arrays.fill(out, 0, n, 0L); return }
    val mask = (1L << bits) - 1L
    var acc = 0L
    var accBits = 0
    var p = inOff
    var i = 0
    while (i < n) {
      while (accBits < bits) {
        acc |= (in(p) & 0xffL) << accBits
        p += 1
        accBits += 8
      }
      out(i) = acc & mask
      acc >>>= bits
      accBits -= bits
      i += 1
    }
  }
}

/** PForDelta-style block codec: choose a bit width `b` (≤32) that covers most
  * values; values needing more bits keep their low `b` bits in the packed
  * stream and store their high bits as (indexDelta, highBits) exceptions
  * (VByte-coded).
  *
  * Layout: [n:vbyte][b:1byte][nExc:vbyte][packed: bytesNeeded(n,b)]
  *         [exceptions: (idxDelta:vbyte, highBits:vbyte)*]
  */
object PFor {
  private val ExceptionCostBytes = 3 // heuristic avg bytes per exception

  private def bitsFor(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v | 1L)

  /** Choose width minimizing estimated size with ≤25% exceptions. */
  def chooseBits(values: Array[Long], n: Int): Int = {
    if (n == 0) return 0
    val hist = new Array[Int](65)
    var i = 0
    var maxBits = 0
    while (i < n) {
      val b = bitsFor(values(i))
      hist(b) += 1
      if (b > maxBits) maxBits = b
      i += 1
    }
    val cap = math.min(maxBits, BitPack.MaxBits)
    var best = cap
    var cum = 0
    var b = maxBits
    while (b > cap) { cum += hist(b); b -= 1 } // values wider than cap are forced exceptions
    var bestCost = BitPack.bytesNeeded(n, cap).toLong + cum.toLong * ExceptionCostBytes
    var nExc = cum
    b = cap - 1
    while (b >= 0) {
      nExc += hist(b + 1)
      val cost = BitPack.bytesNeeded(n, b).toLong + nExc.toLong * ExceptionCostBytes
      if (cost < bestCost && nExc <= n / 4 + 1) { bestCost = cost; best = b }
      b -= 1
    }
    best
  }

  def encode(values: Array[Long], n: Int, out: ByteBuilder): Unit = {
    VByte.encodeOne(n.toLong, out)
    if (n == 0) return
    val bits = chooseBits(values, n)
    out.add(bits.toByte)
    var nExc = 0
    var i = 0
    while (i < n) { if (bitsFor(values(i)) > bits) nExc += 1; i += 1 }
    VByte.encodeOne(nExc.toLong, out)
    val packed = new Array[Byte](BitPack.bytesNeeded(n, bits))
    BitPack.pack(values, n, bits, packed, 0)
    out.addAll(packed)
    var prevIdx = 0
    i = 0
    while (i < n) {
      if (bitsFor(values(i)) > bits) {
        VByte.encodeOne((i - prevIdx).toLong, out)
        VByte.encodeOne(values(i) >>> bits, out)
        prevIdx = i
      }
      i += 1
    }
  }

  def encode(values: Array[Long]): Array[Byte] = {
    val out = new ByteBuilder(values.length * 2 + 8)
    encode(values, values.length, out)
    out.result()
  }

  /** Decode a PFor block at cursor; returns fresh array. Advances cursor. */
  def decode(bytes: Array[Byte], cursor: Cursor): Array[Long] = {
    val n = VByte.decodeOne(bytes, cursor).toInt
    if (n == 0) return Array.emptyLongArray
    val bits = bytes(cursor.pos).toInt & 0xff
    cursor.pos += 1
    val nExc = VByte.decodeOne(bytes, cursor).toInt
    val out = new Array[Long](n)
    BitPack.unpack(bytes, cursor.pos, n, bits, out)
    cursor.pos += BitPack.bytesNeeded(n, bits)
    var idx = 0
    var k = 0
    while (k < nExc) {
      idx += VByte.decodeOne(bytes, cursor).toInt
      val hi = VByte.decodeOne(bytes, cursor)
      out(idx) = out(idx) | (hi << bits)
      k += 1
    }
    out
  }

  def decode(bytes: Array[Byte]): Array[Long] = decode(bytes, new Cursor(0))
}
