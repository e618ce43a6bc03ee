package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries frequent-items summary: exact guarantee invariants on
  * skewed streams, mergeability under arbitrary splits, serialization. */
class FrequentItemsSpec extends AnyFunSuite {

  /** Deterministic Zipf-ish stream over a universe far larger than any
    * capacity used in the tests. */
  private def stream(n: Int): Seq[Long] =
    (0 until n).map { i =>
      val h = SipHash.hashLong(0x5eedL, 0xf00dL, i.toLong)
      // rank r with probability ~ 1/(r+1): fold hash into a skewed key
      val u = (h & 0xffffffffL).toDouble / (1L << 32).toDouble
      (1.0 / (u + 1e-9)).toLong % 5000L
    }

  private def invariants(s: FrequentItems.Summary, exact: Map[Long, Long]): Unit = {
    val d = s.decremented
    assert(s.size <= s.capacity)
    assert(s.total === exact.values.sum)
    s.entries.foreach { case (k, est) =>
      val t = exact.getOrElse(k, 0L)
      assert(est <= t, s"est($k)=$est > true=$t")
      assert(t <= est + d, s"true($k)=$t > est+$d")
    }
    exact.foreach { case (k, t) =>
      if (t > d) assert(s.contains(k), s"key $k with true=$t > D=$d missing")
    }
    assert(d * s.capacity <= s.total, s"D=$d * cap=${s.capacity} > N=${s.total}")
  }

  test("single-stream invariants at several capacities") {
    val xs = stream(50000)
    val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (cap <- Seq(4, 16, 64, 256)) {
      val s = new FrequentItems.Summary(cap)
      xs.foreach(s.add(_))
      invariants(s, exact)
    }
  }

  test("merge of arbitrary splits keeps every invariant") {
    val xs = stream(40000)
    val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(2, 7, 32)) {
      val partials = xs.zipWithIndex.groupBy(_._2 % parts).toSeq.sortBy(_._1).map { case (_, chunk) =>
        val s = new FrequentItems.Summary(64)
        chunk.foreach { case (x, _) => s.add(x) }
        s
      }
      val merged = partials.reduce((a, b) => a.mergeInPlace(b))
      invariants(merged, exact)
    }
  }

  test("exact below capacity: no decrements, counts are exact") {
    val s = new FrequentItems.Summary(100)
    val xs = (0 until 1000).map(i => (i % 50).toLong)
    xs.foreach(s.add(_))
    assert(s.decremented === 0L)
    (0L until 50L).foreach(k => assert(s.estimate(k) === 20L))
    assert(s.topK(3).map(_._1) === Seq(0L, 1L, 2L), "ties must break by key ascending")
  }

  test("serialization roundtrips and is byte-deterministic") {
    val s = new FrequentItems.Summary(32)
    stream(10000).foreach(s.add(_))
    val bytes = FrequentItems.toBytes(s)
    val back = FrequentItems.fromBytes(bytes)
    assert(back.capacity === s.capacity)
    assert(back.decremented === s.decremented)
    assert(back.total === s.total)
    assert(back.entries.toMap === s.entries.toMap)
    assert(FrequentItems.toBytes(back).sameElements(bytes))
    // truncation rejected
    intercept[IllegalArgumentException](FrequentItems.fromBytes(bytes.take(bytes.length - 1)))
    intercept[IllegalArgumentException](FrequentItems.fromBytes(bytes.take(16)))
    // corrupt Long header fields rejected BEFORE Int narrowing (a capacity
    // of 2^32+16 must not silently truncate to 16), negatives rejected too
    def withHeader(field: Int, v: Long): Array[Byte] = {
      val b = bytes.clone()
      java.nio.ByteBuffer.wrap(b).putLong(field * 8, v)
      b
    }
    intercept[IllegalArgumentException](FrequentItems.fromBytes(withHeader(1, (1L << 32) + 32L)))
    intercept[IllegalArgumentException](FrequentItems.fromBytes(withHeader(1, 0L)))
    intercept[IllegalArgumentException](FrequentItems.fromBytes(withHeader(2, -1L)))
    intercept[IllegalArgumentException](FrequentItems.fromBytes(withHeader(3, -5L)))
    intercept[IllegalArgumentException](FrequentItems.fromBytes(withHeader(4, (1L << 33) + s.size)))
  }

  test("a true heavy hitter (> N/cap mass) always survives with a tight estimate") {
    val cap = 16
    val s = new FrequentItems.Summary(cap)
    // 30% of the stream is key 7, the rest spreads over 10k keys
    val xs = (0 until 30000).map { i =>
      if (i % 10 < 3) 7L
      else 100L + (SipHash.hashLong(1L, 2L, i.toLong) & 0x1fffL)
    }
    xs.foreach(s.add(_))
    val trueCount = xs.count(_ == 7L).toLong
    assert(s.contains(7L))
    assert(s.estimate(7L) <= trueCount && trueCount <= s.estimate(7L) + s.decremented)
    assert(s.topK(1).head._1 === 7L, "the dominant key must rank first")
  }
}
