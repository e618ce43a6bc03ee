package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** SipHash-2-4 correctness against the published reference test vectors
  * (Aumasson & Bernstein's C reference implementation `vectors_sip64`:
  * key = 00 01 .. 0f, messages = [], [00], [00 01], ...), plus canonical
  * encoding consistency. Hash stability across JVMs is the correctness
  * anchor for every distributed sketch (SURVEY.md §7 "Hard parts").
  */
class SipHashSpec extends AnyFunSuite {

  // key bytes 000102...0f little-endian
  val k0 = 0x0706050403020100L
  val k1 = 0x0f0e0d0c0b0a0908L

  // vectors_sip64 from the SipHash reference implementation, as LE uint64
  val expected64: Seq[Long] = Seq(
    0x726fdb47dd0e0e31L, 0x74f839c593dc67fdL, 0x0d6c8009d9a94f5aL,
    0x85676696d7fb7e2dL, 0xcf2794e0277187b7L, 0x18765564cd99a68dL,
    0xcbc9466e58fee3ceL, 0xab0200f58b01d137L, 0x93f5f5799a932462L,
    0x9e0082df0ba9e4b0L, 0x7a5dbbc594ddb9f3L, 0xf4b32f46226bada7L,
    0x751e8fbc860ee5fbL, 0x14ea5627c0843d90L, 0xf723ca908e7af2eeL,
    0xa129ca6149be45e5L
  )

  test("matches the published SipHash-2-4 64-bit test vectors") {
    for (len <- expected64.indices) {
      val msg = Array.tabulate[Byte](len)(_.toByte)
      assert(SipHash.hash64(k0, k1, msg) === expected64(len),
        s"vector mismatch at message length $len")
    }
  }

  test("hashInt/hashLong agree with hash64 over canonical LE encodings") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val x = rnd.nextInt()
      assert(SipHash.hashInt(k0, k1, x) === SipHash.hash64(k0, k1, SipHash.encodeInt(x)))
      val y = rnd.nextLong()
      assert(SipHash.hashLong(k0, k1, y) === SipHash.hash64(k0, k1, SipHash.encodeLong(y)))
    }
  }

  test("hash128 short-input fast paths agree with the byte-array path") {
    val rnd = new scala.util.Random(43)
    for (_ <- 0 until 2000) {
      val x = rnd.nextInt()
      assert(SipHash.hash128Int(k0, k1, x) === SipHash.hash128(k0, k1, SipHash.encodeInt(x)))
      val y = rnd.nextLong()
      assert(SipHash.hash128Long(k0, k1, y) === SipHash.hash128(k0, k1, SipHash.encodeLong(y)))
    }
  }

  test("hash128IntInto agrees with the tuple-returning hash128Int") {
    val rnd = new scala.util.Random(45)
    val out = new Array[Long](2)
    for (_ <- 0 until 2000) {
      val x = rnd.nextInt()
      val (hi, lo) = SipHash.hash128Int(k0, k1, x)
      SipHash.hash128IntInto(k0, k1, x, out)
      assert(out(0) === hi && out(1) === lo)
    }
  }

  test("hash64 over long arbitrary byte arrays is deterministic and length-sensitive") {
    val rnd = new scala.util.Random(44)
    for (_ <- 0 until 200) {
      val n = rnd.nextInt(200)
      val msg = Array.fill[Byte](n)(rnd.nextInt().toByte)
      assert(SipHash.hash64(k0, k1, msg) === SipHash.hash64(k0, k1, msg.clone()))
      // appending a zero byte must change the hash (length is mixed in)
      assert(SipHash.hash64(k0, k1, msg) !== SipHash.hash64(k0, k1, msg :+ 0.toByte))
    }
  }

  test("different keys give different hashes (keyed-ness)") {
    val collisions = (0 until 1000).count { i =>
      SipHash.hashInt(k0, k1, i) == SipHash.hashInt(k0 + 1, k1, i)
    }
    assert(collisions === 0)
  }

  test("hashString is UTF-8 canonical") {
    assert(SipHash.hashString(k0, k1, "héllo") ===
      SipHash.hash64(k0, k1, "héllo".getBytes("UTF-8")))
  }

  test("128-bit output: halves are distinct and deterministic") {
    val (hi1, lo1) = SipHash.hash128String(k0, k1, "graft")
    val (hi2, lo2) = SipHash.hash128String(k0, k1, "graft")
    assert(hi1 === hi2 && lo1 === lo2)
    assert(hi1 !== lo1)
  }

  test("uniformity smoke: bit balance of hashInt over sequential ints") {
    val counts = new Array[Int](64)
    val n = 20000
    for (i <- 0 until n) {
      val h = SipHash.hashInt(k0, k1, i)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1; b += 1 }
    }
    counts.zipWithIndex.foreach { case (c, b) =>
      assert(math.abs(c.toDouble / n - 0.5) < 0.02, s"bit $b unbalanced: $c/$n")
    }
  }
}
