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

  // -------------------------------------------- ES-weighted sample (v2)

  private def buildWeighted(elems: Seq[(Long, Double)], k: Int,
      kk0: Long): (Array[Long], Array[Long], Int) = {
    val (h, v) = BottomK.emptyBuffers(k)
    var s = 0
    elems.foreach { case (x, w) =>
      s = BottomK.addW(h, v, s, BottomK.esKey(SipHash.hashLong(kk0, k1, x), w), x,
        BottomK.cmpLong)
    }
    (h, v, s)
  }

  private val genWeighted: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(0, 400)
    xs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 300L), Gen.choose(1, 20).map(_.toDouble)))
  } yield xs.distinctBy(_._1) // weight is a function of the value

  property("weighted retained pairs ARE the es-key bottom-k of the distinct set") =
    Prop.forAll(genK, genWeighted) { (k, xs) =>
      val (h, v, s) = buildWeighted(xs, k, k0)
      val expect = xs
        .map { case (x, w) => (BottomK.esKey(SipHash.hashLong(k0, k1, x), w), x) }
        .sorted // (key, value) pair order; keys are non-negative double bits
        .take(k)
      Prop(s == expect.length &&
        h.take(s).sameElements(expect.map(_._1)) &&
        v.take(s).sameElements(expect.map(_._2))) :| s"k=$k n=${xs.size}"
    }

  property("weighted k=1 inclusion tracks w/sum(w) within 5 sigma, any weight vector") =
    Prop.forAll(Gen.listOfN(5, Gen.choose(1, 10).map(_.toDouble))) { ws =>
      val trials = 1500
      val wins = new Array[Int](ws.length)
      var t = 0
      while (t < trials) {
        val kk0 = k0 + (t + 1) * 0x9e3779b97f4a7c15L
        val (_, v, s) = buildWeighted(ws.indices.map(i => (i.toLong, ws(i))), 1, kk0)
        if (s == 1) wins(v(0).toInt) += 1
        t += 1
      }
      val total = ws.sum
      Prop(ws.indices.forall { i =>
        val p = ws(i) / total
        val sigma = math.sqrt(p * (1 - p) / trials)
        math.abs(wins(i).toDouble / trials - p) <= 5 * sigma + 0.005
      }) :| s"ws=$ws wins=${wins.toSeq}"
    }

  property("weighted insertion order and split/merge never change the sample") =
    Prop.forAll(genK, genWeighted, Gen.choose(1, 7)) { (k, xs, parts) =>
      val (h1, v1, s1) = buildWeighted(xs, k, k0)
      val partials = xs.zipWithIndex.groupBy(_._2 % parts).toSeq.sortBy(_._1).map { case (_, c) =>
        buildWeighted(c.map(_._1), k, k0)
      }
      val (mh, mv, ms) = partials
        .reduceOption { (a, b) => BottomK.merge(a._1, a._2, a._3, b._1, b._2, b._3) }
        .getOrElse { val (h, v) = BottomK.emptyBuffers(k); (h, v, 0) }
      Prop(s1 == ms && h1.take(s1).sameElements(mh.take(ms)) &&
        v1.take(s1).sameElements(mv.take(ms))) :| s"k=$k parts=$parts"
    }
}
