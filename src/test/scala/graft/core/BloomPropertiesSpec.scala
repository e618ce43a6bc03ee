package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties over arbitrary valid configurations and payloads —
  * the generator-driven counterpart of the reference's QuickCheck suite
  * (`tests/Main.hs:46-104`). */
object BloomPropertiesSpec extends Properties("BlockedBloom") {

  val k0 = Keys.DefaultK0
  val k1 = Keys.DefaultK1

  val genCfg: Gen[BloomConfig] = for {
    k <- Gen.choose(1, 16)
    log2l <- Gen.choose(0, 12) suchThat (l => 6 * 16 + l <= 128)
  } yield BloomConfig(k0, k1, k, log2l)

  val genPayload: Gen[List[Int]] = Gen.listOfN(200, Gen.choose(Int.MinValue, Int.MaxValue))

  property("no false negatives for any config and payload") =
    Prop.forAll(genCfg, genPayload) { (cfg, xs) =>
      val words = new Array[Long](cfg.l)
      xs.foreach(BlockedBloom.insertInt(words, cfg, _))
      xs.forall(BlockedBloom.containsInt(words, cfg, _))
    }

  property("union is commutative, associative, idempotent (word-exact)") =
    Prop.forAll(genCfg, genPayload, genPayload) { (cfg, xs, ys) =>
      def build(zs: List[Int]) = {
        val w = new Array[Long](cfg.l)
        zs.foreach(BlockedBloom.insertInt(w, cfg, _))
        w
      }
      val a = build(xs); val b = build(ys)
      val ab = BlockedBloom.unionInPlace(a.clone(), b)
      val ba = BlockedBloom.unionInPlace(b.clone(), a)
      val aa = BlockedBloom.unionInPlace(a.clone(), a)
      ab.sameElements(ba) && aa.sameElements(a) &&
        ab.sameElements(build(xs ++ ys))
    }

  property("fold preserves membership from any larger size") =
    Prop.forAll(Gen.choose(1, 8), Gen.choose(0, 6), Gen.choose(0, 6), genPayload) {
      (k, small, extra, xs) =>
        val big = small + extra
        val cfgBig = BloomConfig(k0, k1, k, big)
        val w = new Array[Long](cfgBig.l)
        xs.foreach(BlockedBloom.insertInt(w, cfgBig, _))
        val folded = BlockedBloom.fold(w, small)
        val cfgSmall = BloomConfig(k0, k1, k, small)
        xs.forall(BlockedBloom.containsInt(folded, cfgSmall, _))
    }

  property("serialization roundtrip is exact for any config") =
    Prop.forAll(genCfg, genPayload) { (cfg, xs) =>
      val words = new Array[Long](cfg.l)
      xs.foreach(BlockedBloom.insertInt(words, cfg, _))
      val (cfg2, words2, tag) = BlockedBloom.fromBytes(
        k0, k1, BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int))
      cfg2 == cfg && tag == BlockedBloom.TypeTag.Int && words2.sameElements(words)
    }

  property("cross-size combine: union keeps every element, intersection keeps common ones") =
    Prop.forAll(Gen.choose(1, 8), Gen.choose(0, 6), Gen.choose(0, 6), genPayload, genPayload) {
      (k, la, lb, xs, ys) =>
        val cfgA = BloomConfig(k0, k1, k, la)
        val cfgB = BloomConfig(k0, k1, k, lb)
        val wa = new Array[Long](cfgA.l)
        xs.foreach(BlockedBloom.insertInt(wa, cfgA, _))
        val wb = new Array[Long](cfgB.l)
        ys.foreach(BlockedBloom.insertInt(wb, cfgB, _))
        val (wu, cu) = BlockedBloom.unionFold(wa, cfgA, wb, cfgB)
        val (wi, ci) = BlockedBloom.intersectFold(wa, cfgA, wb, cfgB)
        val common = xs.toSet intersect ys.toSet
        (xs ++ ys).forall(BlockedBloom.containsInt(wu, cu, _)) &&
          common.forall(BlockedBloom.containsInt(wi, ci, _)) &&
          cu.log2l == math.min(la, lb) && ci.log2l == math.min(la, lb)
    }

  property("mask64 always sets between 1 and k bits") =
    Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(1, 10)) { (h, k) =>
      val bits = java.lang.Long.bitCount(BlockedBloom.mask64(h, k))
      bits >= 1 && bits <= k
    }
}
