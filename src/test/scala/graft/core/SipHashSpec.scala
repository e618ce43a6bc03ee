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

  // vectors_sip128 from the SipHash reference implementation (same key,
  // same messages), as 16-byte LE output: first 8 bytes = `lo`, next 8 =
  // `hi` of graft's (hi, lo). Anchors the 128-bit finalization constants
  // (0xee init/first-half, 0xdd second-half) that CMS and the 128-bit
  // Bloom path depend on.
  val expected128: Seq[String] = Seq(
    "a3817f04ba25a8e66df67214c7550293",
    "da87c1d86b99af44347659119b22fc45",
    "8177228da4a45dc7fca38bdef60affe4",
    "9c70b60c5267a94e5f33b6b02985ed51",
    "f88164c12d9c8faf7d0f6e7c7bcd5579",
    "1368875980776f8854527a07690e9627",
    "14eeca338b208613485ea0308fd7a15e",
    "a1f1ebbed8dbc153c0b84aa61ff08239"
  )

  test("matches the published SipHash-2-4 128-bit test vectors") {
    def le64(hex: String): Long =
      java.lang.Long.reverseBytes(java.lang.Long.parseUnsignedLong(hex, 16))
    for (len <- expected128.indices) {
      val msg = Array.tabulate[Byte](len)(_.toByte)
      val (hi, lo) = SipHash.hash128(k0, k1, msg)
      assert(lo === le64(expected128(len).substring(0, 16)),
        s"128-bit lo-half mismatch at message length $len")
      assert(hi === le64(expected128(len).substring(16)),
        s"128-bit hi-half mismatch at message length $len")
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
