package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden serialized-sketch files (the analogue of the reference's
  * tests/serialized fixtures, `tests/Main.hs:433-459`): committed
  * bytes must equal a fresh build forever — any drift in hashing, bit
  * layout, or the serialization format is a breaking change that must be
  * caught here, not by a reader of old checkpoints. */
class GoldenFilesSpec extends AnyFunSuite {

  val k0 = Keys.DefaultK0
  val k1 = Keys.DefaultK1

  private def golden(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/serialized/$name")
    assert(in != null, s"missing golden file $name")
    try in.readAllBytes() finally in.close()
  }

  test("bloom golden files: byte-identical rebuild, deserialize, probe") {
    for ((k, log2l) <- Seq((1, 0), (2, 1), (3, 2), (3, 7), (4, 10))) {
      val cfg = BloomConfig(k0, k1, k, log2l)
      val words = new Array[Long](cfg.l)
      (1 to 2 * cfg.sizeBytes).foreach(BlockedBloom.insertInt(words, cfg, _))
      val fresh = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
      val stored = golden(s"bloom_${k}_$log2l.bin")
      assert(java.util.Arrays.equals(fresh, stored),
        s"golden drift at (k=$k, log2l=$log2l) — serialization or hash layout changed")
      val (cfg2, w2, tag) = BlockedBloom.fromBytes(k0, k1, stored)
      assert(cfg2 === cfg && tag === BlockedBloom.TypeTag.Int)
      (1 to 2 * cfg.sizeBytes).foreach(e =>
        assert(BlockedBloom.containsInt(w2, cfg2, e), s"golden filter lost element $e"))
    }
  }

  test("hll golden file: byte-identical rebuild and stable estimate") {
    val regs = Hll.empty(10)
    (1 to 5000).foreach(i => Hll.addHash(regs, 10, SipHash.hashInt(k0, k1, i)))
    val fresh = Hll.toBytes(regs, 10, BlockedBloom.TypeTag.Int, SipHash.hashLong(k0, k1, k0 ^ k1))
    val stored = golden("hll_10.bin")
    assert(java.util.Arrays.equals(fresh, stored), "HLL golden drift")
    val est = Hll.estimate(Hll.fromBytes(stored)._2)
    assert(math.abs(est - 5000) <= 4 * Hll.stdError(10) * 5000)
  }

  test("frequent-items golden file: byte-identical rebuild, guarantees hold") {
    val hh = new FrequentItems.Summary(16)
    (0 until 12000).foreach(i => hh.add(if (i % 2 == 0) (i / 2) % 8 else 100L + i % 3000))
    val fresh = FrequentItems.toBytes(hh)
    val stored = golden("freqitems_16.bin")
    assert(java.util.Arrays.equals(fresh, stored), "FrequentItems golden drift")
    val back = FrequentItems.fromBytes(stored)
    assert(back.total === 12000L)
    assert(back.decremented * back.capacity <= back.total)
    // the 8 planted heavies (each 750 occurrences > D <= 375) must all be present
    (0L until 8L).foreach(k => assert(back.contains(k), s"planted heavy $k missing"))
  }

  test("bottomk golden file: byte-identical rebuild, sample stable forever") {
    val (h, v) = BottomK.emptyBuffers(32)
    var s = 0
    (1L to 5000L).foreach(x => s = BottomK.add(h, v, s, SipHash.hashLong(k0, k1, x), x))
    val fresh = BottomK.toBytes(h, v, s, BlockedBloom.TypeTag.Long, SipHash.hashLong(k0, k1, k0 ^ k1))
    val stored = golden("bottomk_32.bin")
    assert(java.util.Arrays.equals(fresh, stored), "BottomK golden drift")
    // determinism-across-versions is the operator's whole point: the
    // committed sample must decode to the same 32 values forever
    val (h2, v2, s2, tag, _) = BottomK.fromBytes(stored)
    assert(tag === BlockedBloom.TypeTag.Long && s2 === 32)
    assert(v2.take(s2).forall(x => x >= 1L && x <= 5000L))
    (0 until s2).foreach(i => assert(h2(i) === SipHash.hashLong(k0, k1, v2(i))))
  }

  test("kmv golden file: byte-identical rebuild, estimator inside bound") {
    val h = Kmv.emptyHashes(64)
    var s = 0
    (1 to 5000).foreach(i => s = Kmv.add(h, s, SipHash.hashInt(k0, k1, i)))
    val fresh = Kmv.toBytes(h, s, BlockedBloom.TypeTag.Int, SipHash.hashLong(k0, k1, k0 ^ k1))
    val stored = golden("kmv_64.bin")
    assert(java.util.Arrays.equals(fresh, stored), "KMV golden drift")
    val (h2, s2, tag, _) = Kmv.fromBytes(stored)
    assert(tag === BlockedBloom.TypeTag.Int && s2 === 64)
    assert(math.abs(Kmv.estimate(h2, s2) - 5000) <= 4 * Kmv.stdError(64) * 5000)
  }

  test("cms golden file: byte-identical rebuild and exact point estimates") {
    val cms = CmsConfig(k0, k1, 4, 8)
    val buf = CountMin.empty(cms)
    (1 to 3000).foreach(i => CountMin.addInt(buf, cms, i % 100))
    val fresh = CountMin.toBytes(buf, cms, BlockedBloom.TypeTag.Int)
    val stored = golden("cms_4_8.bin")
    assert(java.util.Arrays.equals(fresh, stored), "CMS golden drift")
    val (_, _, buf2, _) = CountMin.fromBytes(stored)
    assert(CountMin.totalCount(buf2, cms) === 3000L)
    assert(CountMin.estimateInt(buf2, cms, 5) >= 30L)
  }
}
