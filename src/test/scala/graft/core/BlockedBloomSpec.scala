package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's algorithm-property test matrix
  * (reference `tests/Main.hs`) to the Spark-side core:
  * param validation, no false negatives, FPR vs analytic bound,
  * union/intersection across sizes, fold, serialization roundtrip.
  */
class BlockedBloomSpec extends AnyFunSuite {

  val k0 = 0x5eedf00ddeadbeefL
  val k1 = 0x0123456789abcdefL

  def build(k: Int, log2l: Int, elems: Iterable[Int]): (BloomConfig, Array[Long]) = {
    val cfg = BloomConfig(k0, k1, k, log2l)
    val words = new Array[Long](cfg.l)
    elems.foreach(BlockedBloom.insertInt(words, cfg, _))
    (cfg, words)
  }

  test("invalid params throw (mirrors tests/Main.hs:108-122)") {
    assertThrows[IllegalArgumentException](BloomConfig(k0, k1, 0, 5))
    assertThrows[IllegalArgumentException](BloomConfig(k0, k1, -1, 5))
    assertThrows[IllegalArgumentException](BloomConfig(k0, k1, 1, -1))
    assertThrows[IllegalArgumentException](BloomConfig(k0, k1, 1, 65))
    assertThrows[IllegalArgumentException](BloomConfig(k0, k1, 21, 10)) // 126+10 > 128
    assertThrows[IllegalArgumentException](BloomConfig(k0, k1, 3, 28)) // 8*2^28+64 > byte-array max
    // valid edge cases construct fine
    BloomConfig(k0, k1, 1, 0)
    BloomConfig(k0, k1, 21, 2)   // 126 + 2 = 128
    BloomConfig(k0, k1, 3, 27)
  }

  test("hash64Enough selection matches the <=64-bit budget rule") {
    assert(BloomConfig(k0, k1, 3, 12).hash64Enough)      // 18+12 = 30
    assert(BloomConfig(k0, k1, 9, 10).hash64Enough)      // 54+10 = 64
    assert(!BloomConfig(k0, k1, 10, 10).hash64Enough)    // 60+10 = 70
    assert(!BloomConfig(k0, k1, 13, 20).hash64Enough)
  }

  test("no false negatives across the reference param grid (tests/Main.hs:537-584 grid)") {
    val grid = Seq((2, 1, 2), (4, 1, 3), (500, 8, 3), (1000, 8, 10), (500, 8, 15), (500, 8, 20))
    for ((n, log2l, k) <- grid) {
      val payload = (1 to n).map(_ * 2)
      val (cfg, words) = build(k, log2l, payload)
      payload.foreach { e =>
        assert(BlockedBloom.containsInt(words, cfg, e),
          s"false negative for $e at (n=$n, log2l=$log2l, k=$k)")
      }
    }
  }

  test("saturation: tiny filter stays correct (tests/Main.hs:125-139)") {
    val (cfg, words) = build(2, 2, 1 to 500)
    (1 to 500).foreach(e => assert(BlockedBloom.containsInt(words, cfg, e)))
    assert(BlockedBloom.loadFactor(words) > 0.9)
  }

  test("empirical FPR within 0.005 of analytic fpr() (tests/Main.hs:537-584)") {
    val grid = Seq(
      (10000, 12, 3),  // the README's ~0.3% config
      (50000, 16, 3),
      (20000, 14, 5),
      (100000, 17, 4)
    )
    for ((n, log2l, k) <- grid) {
      val payload = (1 to n).map(_ * 2) // evens
      val (cfg, words) = build(k, log2l, payload)
      val antiN = 10000
      val anti = (0 until antiN).map(_ * 2 + 1) // odds — disjoint
      val fp = anti.count(BlockedBloom.containsInt(words, cfg, _))
      val measured = fp.toDouble / antiN
      val analytic = Fpr.bloom1(n.toLong, cfg.l.toLong, k)
      assert(math.abs(measured - analytic) < 0.005,
        s"(n=$n, log2l=$log2l, k=$k): measured $measured vs analytic $analytic")
    }
  }

  test("reference's largest grid point: n=5M, log2l=22, k=3 (tests/Main.hs:537-584)") {
    val n = 5000000
    val cfg = BloomConfig(k0, k1, 3, 22)
    val words = new Array[Long](cfg.l)
    var i = 2
    while (i <= 2 * n) { BlockedBloom.insertInt(words, cfg, i); i += 2 }
    // spot-check no false negatives on a stride (full scan is covered at
    // smaller sizes; this is the scale fidelity point)
    i = 2
    while (i <= 2 * n) {
      assert(BlockedBloom.containsInt(words, cfg, i), s"false negative at $i")
      i += 2000
    }
    val anti = (0 until 10000).map(_ * 2 + 1)
    val measured = anti.count(BlockedBloom.containsInt(words, cfg, _)).toDouble / anti.size
    val analytic = Fpr.bloom1(n.toLong, cfg.l.toLong, 3)
    assert(math.abs(measured - analytic) < 0.005,
      s"measured $measured vs analytic $analytic at the 5M point")
  }

  test("128-bit hash path: no false negatives + sane FPR (k=13, log2l=20)") {
    val n = 20000
    val payload = (1 to n).map(_ * 2)
    val (cfg, words) = build(13, 20, payload)
    assert(!cfg.hash64Enough)
    payload.foreach(e => assert(BlockedBloom.containsInt(words, cfg, e)))
    val anti = (0 until 10000).map(_ * 2 + 1)
    val measured = anti.count(BlockedBloom.containsInt(words, cfg, _)).toDouble / anti.size
    val analytic = Fpr.bloom1(n.toLong, cfg.l.toLong, 13)
    assert(math.abs(measured - analytic) < 0.005, s"measured $measured vs analytic $analytic")
  }

  test("union ≡ inserting both element sets (tests/Main.hs:290-317)") {
    val a = 200 to 600
    val b = 400 to 800
    val (cfg, wa) = build(3, 10, a)
    val (_, wb) = build(3, 10, b)
    val (_, direct) = build(3, 10, (a ++ b).distinct)
    val union = BlockedBloom.unionInPlace(wa.clone(), wb)
    assert(union.sameElements(direct), "union must be word-identical to direct insertion")
    (a ++ b).foreach(e => assert(BlockedBloom.containsHash64(union, cfg, SipHash.hashInt(k0, k1, e))))
  }

  test("union across different sizes via fold (tests/Main.hs:319-382)") {
    for (k <- Seq(3, 10, 13); smallLog2l <- Seq(10, 12, 14)) {
      val bigLog2l = 14
      val a = 200 to 600   // into the big filter
      val b = 400 to 800   // into the small filter
      val cfgBig = BloomConfig(k0, k1, k, bigLog2l)
      val cfgSmall = BloomConfig(k0, k1, k, smallLog2l)
      val wBig = new Array[Long](cfgBig.l)
      a.foreach(BlockedBloom.insertInt(wBig, cfgBig, _))
      val wSmall = new Array[Long](cfgSmall.l)
      b.foreach(BlockedBloom.insertInt(wSmall, cfgSmall, _))
      // fold the big one down and union into the small
      val folded = BlockedBloom.fold(wBig, smallLog2l)
      val union = BlockedBloom.unionInPlace(wSmall.clone(), folded)
      // lossless: equals direct insertion of both sets into the small config
      val direct = new Array[Long](cfgSmall.l)
      (a ++ b).foreach(BlockedBloom.insertInt(direct, cfgSmall, _))
      assert(union.sameElements(direct), s"fold-union not lossless at k=$k, $bigLog2l->$smallLog2l")
      (a ++ b).foreach(e => assert(BlockedBloom.containsInt(union, cfgSmall, e)))
    }
  }

  test("intersection: contains common elements, mostly rejects exclusive ones (tests/Main.hs:386-404)") {
    val a = 200 to 600
    val b = 400 to 800
    val (cfg, wa) = build(3, 12, a)
    val (_, wb) = build(3, 12, b)
    val inter = BlockedBloom.intersectInPlace(wa.clone(), wb)
    (400 to 600).foreach(e => assert(BlockedBloom.containsInt(inter, cfg, e),
      s"intersection lost common element $e"))
    // intersection is lossy but should reject the vast majority of exclusives
    val exclusives = (0 to 199) ++ (1000 to 1199)
    val fp = exclusives.count(BlockedBloom.containsInt(inter, cfg, _))
    assert(fp.toDouble / exclusives.size < 0.05, s"intersection FP rate too high: $fp/${exclusives.size}")
  }

  test("serialization roundtrip (tests/Main.hs:461-487)") {
    val (cfg, words) = build(3, 7, 1 to 300)
    val bytes = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
    assert(bytes.length === 8 * cfg.l + 64)
    val (cfg2, words2, tag) = BlockedBloom.fromBytes(k0, k1, bytes)
    assert(cfg2 === cfg)
    assert(tag === BlockedBloom.TypeTag.Int)
    assert(words2.sameElements(words))
    (1 to 300).foreach(e => assert(BlockedBloom.containsInt(words2, cfg2, e)))
  }

  test("deserialize rejects wrong key / mangled metadata (Internal.hs:781-800)") {
    val (cfg, words) = build(3, 4, 1 to 50)
    val bytes = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
    assertThrows[IllegalArgumentException](BlockedBloom.fromBytes(k0 + 1, k1, bytes))
    assertThrows[IllegalArgumentException](BlockedBloom.fromBytes(k0, k1, bytes.drop(8)))
    val mangled = bytes.clone()
    mangled(8 * cfg.l + 7) = 99 // version field low byte
    assertThrows[IllegalArgumentException](BlockedBloom.fromBytes(k0, k1, mangled))
  }

  test("deserialize rejects a filter serialized under a different word size (Internal.hs:796-798)") {
    // The reference refuses cross-word-size blobs outright ("Serialized bloom
    // filters are not currently cross-architecture compatible"); a w=32 tag in
    // the metadata tail must be rejected here too, not reinterpreted.
    val (cfg, words) = build(3, 4, 1 to 50)
    val bytes = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
    val w32 = bytes.clone()
    w32(8 * cfg.l + 24 + 7) = 32 // wordSize field low byte: 64 -> 32 (BE)
    val err = intercept[IllegalArgumentException](BlockedBloom.fromBytes(k0, k1, w32))
    assert(err.getMessage.contains("word size"), s"wrong rejection path: ${err.getMessage}")
  }

  test("golden serialized bytes are stable across runs") {
    // the analogue of the reference's tests/serialized/*.bytestring golden
    // files: fixed key + payload must serialize to identical bytes forever.
    val (cfg, words) = build(3, 2, 1 to 16)
    val bytes = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
    val hex = bytes.map("%02x".format(_)).mkString
    val again = BlockedBloom.toBytes(build(3, 2, 1 to 16)._2, cfg, BlockedBloom.TypeTag.Int)
    assert(hex === again.map("%02x".format(_)).mkString)
    assert(bytes.length === 8 * 4 + 64)
  }

  test("mask64 sets between 1 and k bits, all within one word") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 5000; k <- Seq(1, 3, 5, 10)) {
      val h = rnd.nextLong()
      val m = BlockedBloom.mask64(h, k)
      val bits = java.lang.Long.bitCount(m)
      assert(bits >= 1 && bits <= k)
    }
  }

  test("insert returns true only when new bits were set (Internal.hs:449-454)") {
    val cfg = BloomConfig(k0, k1, 3, 10)
    val words = new Array[Long](cfg.l)
    assert(BlockedBloom.insertInt(words, cfg, 42))
    assert(!BlockedBloom.insertInt(words, cfg, 42), "re-insert must report not-new")
  }

  test("fpr() analytic sanity: monotone in n, in [0,1]") {
    val f1 = Fpr.bloom1(1000, 1 << 12, 3)
    val f2 = Fpr.bloom1(10000, 1 << 12, 3)
    val f3 = Fpr.bloom1(100000, 1 << 12, 3)
    assert(f1 > 0 && f3 <= 1.0)
    assert(f1 < f2 && f2 < f3)
    // README's cited configuration: ~0.3% at 10k elements, k=3, log2l=12
    assert(math.abs(Fpr.bloom1(10000, 1 << 12, 3) - 0.003) < 0.002)
  }
}
