package graft.index

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  // seeded-random "property" loops (scalatest+scalacheck bridge not in the
  // offline cache, so properties are hand-rolled but deterministic)
  private def randomArrays(seed: Long, rounds: Int): Iterator[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    Iterator.tabulate(rounds) { _ =>
      val n = rnd.nextInt(600)
      Array.fill(n) {
        rnd.nextInt(4) match {
          case 0 => rnd.nextLong(256L)
          case 1 => rnd.nextLong(65536L)
          case 2 => rnd.nextLong(1L << 28)
          case _ => rnd.nextLong(Long.MaxValue)
        }
      }
    }
  }

  test("vbyte roundtrip (property)") {
    randomArrays(seed = 101, rounds = 200).foreach { arr =>
      val enc = VByte.encode(arr)
      assert(VByte.decode(enc, arr.length).toSeq == arr.toSeq)
    }
  }

  test("vbyte rejects negative") {
    intercept[IllegalArgumentException] { VByte.encode(Array(-1L)) }
  }

  test("bitpack roundtrip all widths 0..32") {
    val rnd = new scala.util.Random(42)
    for (bits <- 0 to 32; n <- Seq(0, 1, 7, 8, 127, 128, 1000)) {
      val mask = if (bits == 0) 0L else (1L << bits) - 1
      val vals = Array.fill(n)(rnd.nextLong() & mask)
      val out = new Array[Byte](BitPack.bytesNeeded(n, bits))
      BitPack.pack(vals, n, bits, out, 0)
      val back = new Array[Long](n)
      BitPack.unpack(out, 0, n, bits, back)
      assert(back.toSeq == vals.toSeq, s"bits=$bits n=$n")
    }
  }

  test("pfor roundtrip (property)") {
    randomArrays(seed = 202, rounds = 200).foreach { arr =>
      assert(PFor.decode(PFor.encode(arr)).toSeq == arr.toSeq)
    }
  }

  test("pfor roundtrip skewed: many small values + few huge outliers") {
    val rnd = new scala.util.Random(7)
    val arr = Array.tabulate(10000)(i => if (i % 97 == 0) Long.MaxValue - rnd.nextInt(1000) else rnd.nextInt(100).toLong)
    val enc = PFor.encode(arr)
    assert(PFor.decode(enc).toSeq == arr.toSeq)
    // the encoding should be far smaller than 8 bytes/value thanks to packing
    assert(enc.length < arr.length * 3, s"pfor too large: ${enc.length}")
  }

  test("pfor compresses small gaps well") {
    val gaps = Array.fill(128)(3L)
    val enc = PFor.encode(gaps)
    assert(enc.length <= 128 / 8 * 2 + 8, s"expected ~2 bits/value, got ${enc.length} bytes")
  }
}
