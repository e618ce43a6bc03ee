package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** KMV (bottom-k) sketch properties — exactness below saturation, the
  * Beyer et al. estimator bound at saturation, the merge monoid (split ≡
  * single build, any split, any order), cross-capacity fold-down,
  * intersection/Jaccard estimates, and serialization validation (the KMV
  * analogues of the reference's deserialize checks, Internal.hs:781-800).
  */
class KmvSpec extends AnyFunSuite {

  val k0 = 0x5eedf00ddeadbeefL
  val k1 = 0x0123456789abcdefL

  private def build(k: Int, elems: Iterable[Int]): (Array[Long], Int) = {
    val h = Kmv.emptyHashes(k)
    var s = 0
    elems.foreach(e => s = Kmv.add(h, s, SipHash.hashInt(k0, k1, e)))
    (h, s)
  }

  test("exact below saturation; duplicates never grow the sketch") {
    val (h, s) = build(256, (1 to 100) ++ (1 to 100) ++ (50 to 150))
    assert(s === 150)
    assert(Kmv.estimate(h, s) === 150.0)
    // strict ascending invariant
    (1 until s).foreach(i =>
      assert(java.lang.Long.compareUnsigned(h(i - 1), h(i)) < 0))
  }

  test("estimate within 4 relative-sigma at saturation, across n and k") {
    for (k <- Seq(64, 256, 1024); n <- Seq(5000, 50000, 300000)) {
      val (h, s) = build(k, 1 to n)
      assert(s === k)
      val est = Kmv.estimate(h, s)
      val tol = 4 * Kmv.stdError(k) * n
      assert(math.abs(est - n) <= tol, s"KMV(k=$k) n=$n est=$est outside $tol")
    }
  }

  test("split-then-merge equals single build, any split point and order") {
    val n = 20000
    val (single, ss) = build(256, 1 to n)
    for (cut <- Seq(1, 137, n / 2, n - 1)) {
      val (a, as) = build(256, 1 to cut)
      val (b, bs) = build(256, (cut + 1) to n)
      val (m1, m1s) = Kmv.merge(a, as, b, bs)
      val (m2, m2s) = Kmv.merge(b, bs, a, as)
      assert(m1s === ss && m2s === ss)
      assert(m1.take(m1s).sameElements(single.take(ss)), s"cut=$cut merge != single")
      assert(m2.take(m2s).sameElements(single.take(ss)), "merge not commutative")
    }
  }

  test("merge is associative and idempotent") {
    val (a, as) = build(128, 1 to 3000)
    val (b, bs) = build(128, 2000 to 6000)
    val (c, cs) = build(128, 5000 to 9000)
    val (ab, abs_) = Kmv.merge(a, as, b, bs)
    val (l, ls) = Kmv.merge(ab, abs_, c, cs)
    val (bc, bcs) = Kmv.merge(b, bs, c, cs)
    val (r, rs) = Kmv.merge(a, as, bc, bcs)
    assert(ls === rs && l.take(ls).sameElements(r.take(rs)))
    val (self, selfS) = Kmv.merge(a, as, a, as)
    assert(selfS === as && self.take(selfS).sameElements(a.take(as)))
  }

  test("cross-capacity merge folds down to the smaller k (reference cross-size unionInto analogue)") {
    val (big, bigS) = build(1024, 1 to 50000)
    val (small, smallS) = build(128, 40000 to 90000)
    val (m, ms) = Kmv.merge(big, bigS, small, smallS)
    assert(m.length === 128 && ms === 128)
    // result must be the true bottom-128 of the combined hash multiset
    // restricted to what both sketches retained — i.e. still a valid KMV:
    // every retained hash <= the new kth min, strictly ascending
    (1 until ms).foreach(i =>
      assert(java.lang.Long.compareUnsigned(m(i - 1), m(i)) < 0))
    val est = Kmv.estimate(m, ms)
    val union = 90000
    assert(math.abs(est - union) <= 5 * Kmv.stdError(128) * union)
  }

  test("jaccard/intersection exact when both below saturation") {
    val (a, as) = build(1024, 1 to 600)
    val (b, bs) = build(1024, 401 to 1000)
    val (j, inter) = Kmv.jaccardAndIntersection(a, as, b, bs)
    assert(inter === 200.0)
    assert(math.abs(j - 200.0 / 1000.0) < 1e-12)
  }

  test("jaccard/intersection within bound at saturation") {
    val n = 60000
    val overlap = 20000 // A = 1..60k, B = 40001..100k -> |A∩B|=20k, |A∪B|=100k
    val (a, as) = build(1024, 1 to n)
    val (b, bs) = build(1024, (n - overlap + 1) to (2 * n - overlap))
    val (j, inter) = Kmv.jaccardAndIntersection(a, as, b, bs)
    val trueJ = overlap.toDouble / (2 * n - overlap)
    val sigmaJ = math.sqrt(trueJ * (1 - trueJ) / 1024)
    assert(math.abs(j - trueJ) <= 5 * sigmaJ, s"jaccard $j vs $trueJ (sigma $sigmaJ)")
    assert(math.abs(inter - overlap) <= 0.15 * overlap, s"intersection $inter vs $overlap")
  }

  test("difference exact below saturation; asymmetric; consistent with the algebra") {
    val (a, as) = build(1024, 1 to 600)
    val (b, bs) = build(1024, 401 to 1000)
    assert(Kmv.difference(a, as, b, bs) === 400.0) // |A \ B| = 1..400
    assert(Kmv.difference(b, bs, a, as) === 400.0) // |B \ A| = 601..1000
    val (c, cs) = build(1024, 1 to 100)
    assert(Kmv.difference(c, cs, a, as) === 0.0) // C ⊆ A
    assert(Kmv.difference(a, as, c, cs) === 500.0)
    // empty edge cases
    val (e, es) = build(1024, Nil)
    assert(Kmv.difference(e, es, a, as) === 0.0)
    assert(Kmv.difference(a, as, e, es) === 600.0)
  }

  test("difference within bound at saturation; diff + intersection ≈ |A|") {
    val n = 60000
    val overlap = 20000
    val (a, as) = build(1024, 1 to n)
    val (b, bs) = build(1024, (n - overlap + 1) to (2 * n - overlap))
    val d = Kmv.difference(a, as, b, bs)
    val trueD = n - overlap
    assert(math.abs(d - trueD) <= 0.15 * trueD, s"difference $d vs $trueD")
    // algebra consistency on the SAME union sample: diff(A,B) + inter = est(A-side of union)
    val (_, inter) = Kmv.jaccardAndIntersection(a, as, b, bs)
    assert(math.abs((d + inter) - n) <= 0.15 * n, s"diff+inter ${d + inter} vs |A|=$n")
  }

  test("serialization roundtrip preserves capacity, prefix, tag, key hash") {
    val (h, s) = build(256, 1 to 5000)
    val keyHash = SipHash.hashLong(k0, k1, k0 ^ k1)
    val bytes = Kmv.toBytes(h, s, BlockedBloom.TypeTag.Int, keyHash)
    assert(bytes.length === 40 + 8 * s)
    val (h2, s2, tag, kh) = Kmv.fromBytes(bytes)
    assert(s2 === s && tag === BlockedBloom.TypeTag.Int && kh === keyHash)
    assert(h2.length === 256)
    assert(h2.take(s2).sameElements(h.take(s)))
  }

  test("deserialize rejects bad version, bad length, unsorted payload") {
    val (h, s) = build(64, 1 to 1000)
    val bytes = Kmv.toBytes(h, s, BlockedBloom.TypeTag.Int, 42L)
    val badVersion = bytes.clone(); badVersion(7) = 99
    assertThrows[IllegalArgumentException](Kmv.fromBytes(badVersion))
    assertThrows[IllegalArgumentException](Kmv.fromBytes(bytes.dropRight(8)))
    assertThrows[IllegalArgumentException](Kmv.fromBytes(bytes.take(20)))
    val unsorted = bytes.clone()
    // swap the first two hash entries (offsets 40..47 and 48..55)
    for (i <- 0 until 8) {
      val t = unsorted(40 + i); unsorted(40 + i) = unsorted(48 + i); unsorted(48 + i) = t
    }
    assertThrows[IllegalArgumentException](Kmv.fromBytes(unsorted))
  }

  test("estimator is deterministic for a fixed key (oracle-gate precondition)") {
    val (h1, s1) = build(256, 1 to 12345)
    val (h2, s2) = build(256, (1 to 12345).reverse)
    assert(s1 === s2 && h1.take(s1).sameElements(h2.take(s2)),
      "insert order must not affect the retained bottom-k")
  }
}
