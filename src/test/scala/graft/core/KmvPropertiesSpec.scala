package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the KMV bottom-k sketch: for ARBITRARY
  * element multisets, capacities, partition splits, and insertion orders,
  * the retained prefix must equal the true bottom-k of the distinct hash
  * set (the defining invariant every estimate derives from), merges must
  * be order-insensitive, and serialization must be lossless. */
object KmvPropertiesSpec extends Properties("Kmv") {

  private val k0 = 0x5eedf00ddeadbeefL
  private val k1 = 0x0123456789abcdefL

  private val genK: Gen[Int] = Gen.oneOf(4, 8, 16, 64, 256)

  // multiset with duplicates: values from a range comparable to list size
  private val genElems: Gen[List[Int]] = for {
    n <- Gen.choose(0, 3000)
    xs <- Gen.listOfN(n, Gen.choose(0, 2000))
  } yield xs

  private def truth(xs: Seq[Int], k: Int): Seq[Long] =
    xs.distinct.map(SipHash.hashInt(k0, k1, _))
      .sorted(Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0))
      .take(k)

  private def build(xs: Seq[Int], k: Int): (Array[Long], Int) = {
    val h = Kmv.emptyHashes(k)
    var s = 0
    xs.foreach(x => s = Kmv.add(h, s, SipHash.hashInt(k0, k1, x)))
    (h, s)
  }

  property("retained prefix IS the bottom-k of the distinct hash set, any input") =
    Prop.forAll(genK, genElems) { (k, xs) =>
      val (h, s) = build(xs, k)
      val expect = truth(xs, k)
      Prop(s == expect.length && h.take(s).sameElements(expect)) :| s"k=$k n=${xs.size}"
    }

  property("split + merge + byte roundtrip equals single build, any split count") =
    Prop.forAll(genK, genElems, Gen.choose(1, 9)) { (k, xs, parts) =>
      val keyHash = SipHash.hashLong(k0, k1, k0 ^ k1)
      val partials = xs.zipWithIndex.groupBy(_._2 % parts).toSeq.sortBy(_._1).map { case (_, chunk) =>
        val (h, s) = build(chunk.map(_._1), k)
        // shuffle-boundary analogue: partials survive serialization
        val (h2, s2, _, _) = Kmv.fromBytes(Kmv.toBytes(h, s, BlockedBloom.TypeTag.Int, keyHash))
        (h2, s2)
      }
      val (mh, ms) = partials.reduceOption { (a, b) => Kmv.merge(a._1, a._2, b._1, b._2) }
        .getOrElse((Kmv.emptyHashes(k), 0))
      val expect = truth(xs, k)
      Prop(ms == expect.length && mh.take(ms).sameElements(expect)) :| s"k=$k parts=$parts"
    }

  property("insertion order never changes the sketch") =
    Prop.forAll(genK, genElems, Gen.choose(Long.MinValue, Long.MaxValue)) { (k, xs, seed) =>
      val (h1, s1) = build(xs, k)
      val (h2, s2) = build(new scala.util.Random(seed).shuffle(xs), k)
      Prop(s1 == s2 && h1.take(s1).sameElements(h2.take(s2)))
    }

  property("estimate is exact below saturation; cross-capacity merge = smaller-k truth") =
    Prop.forAll(genK, genK, genElems) { (ka, kb, xs) =>
      val (half1, half2) = xs.splitAt(xs.length / 2)
      val (ha, sa) = build(half1, ka)
      val (hb, sb) = build(half2, kb)
      val (mh, ms) = Kmv.merge(ha, sa, hb, sb)
      val kMin = math.min(ka, kb)
      val expect = truth(xs, kMin)
      val exactWhenSmall =
        if (xs.distinct.size < kMin && sa < ka && sb < kb)
          Prop(Kmv.estimate(mh, ms) == xs.distinct.size.toDouble) :| "exact below saturation"
        else Prop.passed
      Prop.all(
        Prop(mh.length == kMin) :| "folds to smaller capacity",
        Prop(ms == expect.length && mh.take(ms).sameElements(expect)) :| "bottom-kMin of union",
        exactWhenSmall)
    }
}
