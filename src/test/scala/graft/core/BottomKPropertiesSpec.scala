package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the bottom-k value sample: for ARBITRARY
  * element multisets, capacities, splits, and orders, the retained
  * (hash, value) pairs must be exactly the bottom-k of the distinct set
  * keyed by hash (the invariant that makes the sample uniform AND
  * deterministic), merges must be order-insensitive, and serialization
  * lossless. */
object BottomKPropertiesSpec extends Properties("BottomK") {

  private val k0 = 0x5eedf00ddeadbeefL
  private val k1 = 0x0123456789abcdefL

  private val genK: Gen[Int] = Gen.oneOf(1, 4, 16, 64, 256)

  private val genElems: Gen[List[Long]] = for {
    n <- Gen.choose(0, 3000)
    xs <- Gen.listOfN(n, Gen.choose(0L, 2000L))
  } yield xs

  private def truth(xs: Seq[Long], k: Int): Seq[(Long, Long)] =
    xs.distinct.map(x => (SipHash.hashLong(k0, k1, x), x))
      .sortBy(_._1)(Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0))
      .take(k)

  private def build(xs: Seq[Long], k: Int): (Array[Long], Array[Long], Int) = {
    val (h, v) = BottomK.emptyBuffers(k)
    var s = 0
    xs.foreach(x => s = BottomK.add(h, v, s, SipHash.hashLong(k0, k1, x), x))
    (h, v, s)
  }

  property("retained pairs ARE the hash-bottom-k of the distinct set, any input") =
    Prop.forAll(genK, genElems) { (k, xs) =>
      val (h, v, s) = build(xs, k)
      val expect = truth(xs, k)
      Prop(s == expect.length &&
        h.take(s).sameElements(expect.map(_._1)) &&
        v.take(s).sameElements(expect.map(_._2))) :| s"k=$k n=${xs.size}"
    }

  property("split + merge + byte roundtrip equals single build, any split count") =
    Prop.forAll(genK, genElems, Gen.choose(1, 9)) { (k, xs, parts) =>
      val keyHash = SipHash.hashLong(k0, k1, k0 ^ k1)
      val partials = xs.zipWithIndex.groupBy(_._2 % parts).toSeq.sortBy(_._1).map { case (_, chunk) =>
        val (h, v, s) = build(chunk.map(_._1), k)
        val (h2, v2, s2, _, _) =
          BottomK.fromBytes(BottomK.toBytes(h, v, s, BlockedBloom.TypeTag.Long, keyHash))
        (h2, v2, s2)
      }
      val (mh, mv, ms) = partials
        .reduceOption { (a, b) => BottomK.merge(a._1, a._2, a._3, b._1, b._2, b._3) }
        .getOrElse { val (h, v) = BottomK.emptyBuffers(k); (h, v, 0) }
      val expect = truth(xs, k)
      Prop(ms == expect.length &&
        mh.take(ms).sameElements(expect.map(_._1)) &&
        mv.take(ms).sameElements(expect.map(_._2))) :| s"k=$k parts=$parts"
    }

  property("insertion order never changes the sample") =
    Prop.forAll(genK, genElems, Gen.choose(Long.MinValue, Long.MaxValue)) { (k, xs, seed) =>
      val (h1, v1, s1) = build(xs, k)
      val (h2, v2, s2) = build(new scala.util.Random(seed).shuffle(xs), k)
      Prop(s1 == s2 && h1.take(s1).sameElements(h2.take(s2)) &&
        v1.take(s1).sameElements(v2.take(s2)))
    }

  property("the sample is a subset of the inserted distinct values") =
    Prop.forAll(genK, genElems) { (k, xs) =>
      val (_, v, s) = build(xs, k)
      val set = xs.toSet
      Prop(v.take(s).forall(set.contains))
    }
}
