package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the Misra-Gries summary: the guarantee
  * invariants must hold for ARBITRARY streams, capacities, and partition
  * splits (they are what the driver gate asserts; content itself is
  * order-dependent and deliberately unconstrained). */
object FrequentItemsPropertiesSpec extends Properties("FrequentItems") {

  private val genCapacity: Gen[Int] = Gen.choose(1, 128)

  // skewed stream: a few hot keys + a long tail
  private val genStream: Gen[List[Long]] = for {
    n <- Gen.choose(0, 4000)
    xs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.choose(0L, 5L),
      2 -> Gen.choose(0L, 50L),
      1 -> Gen.choose(0L, 100000L)))
  } yield xs

  private def checkInvariants(s: FrequentItems.Summary, xs: Seq[Long]): Prop = {
    val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val d = s.decremented
    Prop.all(
      Prop(s.size <= s.capacity) :| "capacity respected",
      Prop(s.total == xs.size.toLong) :| "N exact",
      Prop(d * s.capacity <= s.total) :| "D*cap <= N",
      Prop(s.entries.forall { case (k, est) =>
        val t = exact.getOrElse(k, 0L)
        est <= t && t <= est + d
      }) :| "est <= true <= est + D",
      Prop(exact.forall { case (k, t) => t <= d || s.contains(k) }) :| "true > D => present")
  }

  property("single-stream invariants at arbitrary capacity") =
    Prop.forAll(genCapacity, genStream) { (cap, xs) =>
      val s = new FrequentItems.Summary(cap)
      xs.foreach(s.add(_))
      checkInvariants(s, xs)
    }

  // weighted stream: (key, weight >= 0); N = total weight
  private val genWeighted: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 2000)
    xs <- Gen.listOfN(n, Gen.zip(
      Gen.frequency(3 -> Gen.choose(0L, 5L), 1 -> Gen.choose(0L, 50000L)),
      Gen.choose(0L, 500L)))
  } yield xs

  private def checkWeighted(s: FrequentItems.Summary, xs: Seq[(Long, Long)]): Prop = {
    val exact = xs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val d = s.decremented
    Prop.all(
      Prop(s.size <= s.capacity) :| "capacity respected",
      Prop(s.total == xs.map(_._2).sum) :| "N = total WEIGHT, exact",
      Prop(d * s.capacity <= s.total) :| "D*cap <= N",
      Prop(s.entries.forall { case (k, est) =>
        val t = exact.getOrElse(k, 0L)
        est <= t && t <= est + d
      }) :| "weighted sandwich",
      Prop(exact.forall { case (k, t) => t <= d || s.contains(k) }) :| "mass > D => present")
  }

  property("WEIGHTED invariants hold for arbitrary (key, weight) streams and splits") =
    Prop.forAll(genCapacity, genWeighted, Gen.choose(1, 6)) { (cap, xs, parts) =>
      val single = new FrequentItems.Summary(cap)
      xs.foreach { case (k, w) => single.add(k, w) }
      val partials = xs.zipWithIndex.groupBy(_._2 % parts).toSeq.sortBy(_._1).map { case (_, chunk) =>
        val s = new FrequentItems.Summary(cap)
        chunk.foreach { case ((k, w), _) => s.add(k, w) }
        FrequentItems.fromBytes(FrequentItems.toBytes(s))
      }
      val merged = partials.reduceOption((a, b) => a.mergeInPlace(b))
        .getOrElse(new FrequentItems.Summary(cap))
      checkWeighted(single, xs) && checkWeighted(merged, xs)
    }

  property("negative weights are rejected; zero weights are no-ops") =
    Prop.forAll(Gen.choose(1L, 100L)) { k =>
      val s = new FrequentItems.Summary(4)
      s.add(k, 0L)
      val zeroOk = s.total == 0L && s.size == 0
      val rejected = scala.util.Try(s.add(k, -1L)).isFailure
      Prop(zeroOk && rejected)
    }

  property("invariants survive arbitrary splits + merges + serialization roundtrips") =
    Prop.forAll(genCapacity, genStream, Gen.choose(1, 9)) { (cap, xs, parts) =>
      val partials = xs.zipWithIndex.groupBy(_._2 % parts).toSeq.sortBy(_._1).map { case (_, chunk) =>
        val s = new FrequentItems.Summary(cap)
        chunk.foreach { case (x, _) => s.add(x) }
        // shuffle-boundary analogue: every partial survives a byte roundtrip
        FrequentItems.fromBytes(FrequentItems.toBytes(s))
      }
      val merged = partials.reduceOption((a, b) => a.mergeInPlace(b))
        .getOrElse(new FrequentItems.Summary(cap))
      checkInvariants(merged, xs)
    }
}
