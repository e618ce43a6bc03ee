package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** KLL quantile sketch over doubles (Karnin–Lang–Liberty, FOCS 2016; see
  * also KLL± VLDB 2021 in PAPERS.md). Mergeable: per-partition sketches
  * combine by concatenating compactor levels then re-compacting — an
  * associative/commutative merge matching the aggregation monoid shape of
  * the rest of the family.
  *
  * Level h holds items of weight 2^h. Level capacities decay geometrically
  * (c = 2/3) from `k` at the top; a full level sorts itself and promotes
  * every other item (deterministic alternation seeded from `k` so runs are
  * reproducible) to level h+1.
  *
  * Published accuracy (Apache DataSketches' empirically-fit constant for
  * the same construction): normalized rank error ≈ 2.446 / k^0.9433 at
  * ~99% confidence. [[Kll.normalizedRankError]].
  */
final class KllSketch(val k: Int) extends Serializable {
  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  private[core] var levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  private[core] var count: Long = 0L
  // deterministic compaction-offset generator (xorshift64*)
  private[core] var rng: Long = 0x9e3779b97f4a7c15L ^ k.toLong

  private def nextBit(): Int = {
    var x = rng
    x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
    rng = x
    (((x * 0x2545f4914f6cdd1dL) >>> 63) & 1L).toInt
  }

  /** Capacity of level h given current height. */
  private def capacity(h: Int): Int = {
    val depth = levels.length - 1 - h // 0 for the top level
    math.max(math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt, 8)
  }

  def n: Long = count

  def add(x: Double): Unit = {
    levels(0) += x
    count += 1L
    compressIfNeeded()
  }

  private def totalItems: Int = { var s = 0; var i = 0; while (i < levels.length) { s += levels(i).length; i += 1 }; s }
  private def totalCapacity: Int = { var s = 0; var h = 0; while (h < levels.length) { s += capacity(h); h += 1 }; s }

  private def compressIfNeeded(): Unit = {
    // totalItems > totalCapacity implies some level exceeds its capacity,
    // so the first-over-capacity scan always finds a target
    while (totalItems > totalCapacity) {
      var h = 0
      while (h < levels.length - 1 && levels(h).length <= capacity(h)) h += 1
      compactLevel(h)
    }
  }

  private def compactLevel(h: Int): Unit = {
    val lvl = levels(h)
    if (lvl.length < 2) return
    val sorted = lvl.toArray
    java.util.Arrays.sort(sorted)
    // compact an even count; an odd straggler stays at this level so total
    // weight is preserved exactly: (m/2)*2^(h+1) + straggler*2^h = n*2^h
    val m = sorted.length - (sorted.length % 2)
    val off = nextBit()
    if (levels.length == h + 1) levels += ArrayBuffer.empty[Double]
    val up = levels(h + 1)
    var i = off
    while (i < m) { up += sorted(i); i += 2 }
    lvl.clear()
    if (sorted.length % 2 == 1) lvl += sorted(sorted.length - 1)
  }

  /** Merge `other` into this (levelwise concat + recompact). */
  def merge(other: KllSketch): KllSketch = {
    require(other.k == k, s"KLL merge: k mismatch $k vs ${other.k}")
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    var h = 0
    while (h < other.levels.length) { levels(h) ++= other.levels(h); h += 1 }
    count += other.count
    rng ^= java.lang.Long.rotateLeft(other.rng, 17)
    compressIfNeeded()
    this
  }

  /** Weighted rank of x: estimated count of items <= x. */
  def rank(x: Double): Long = {
    var r = 0L
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      val lvl = levels(h)
      var i = 0
      while (i < lvl.length) { if (lvl(i) <= x) r += w; i += 1 }
      h += 1
    }
    r
  }

  /** Quantile estimate for q in [0,1]. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile q=$q")
    if (count == 0L) return Double.NaN
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * count).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def toBytes: Array[Byte] = {
    val numItems = totalItems
    val bb = ByteBuffer.allocate(8 * 5 + 4 * levels.length + 8 * numItems).order(ByteOrder.BIG_ENDIAN)
    bb.putLong(Kll.SerialVersion).putLong(k.toLong).putLong(count).putLong(levels.length.toLong)
    bb.putLong(rng) // compaction-offset state survives ser/de (resume/merge)
    levels.foreach(l => bb.putInt(l.length))
    levels.foreach(_.foreach(bb.putDouble))
    bb.array()
  }
}

object Kll {
  final val SerialVersion = 1L

  def fromBytes(bytes: Array[Byte]): KllSketch = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val version = bb.getLong()
    require(version == SerialVersion, s"KLL serialized version $version")
    val k = bb.getLong().toInt
    val count = bb.getLong()
    val nLevels = bb.getLong().toInt
    val rng = bb.getLong()
    val sizes = Array.fill(nLevels)(bb.getInt())
    val s = new KllSketch(k)
    s.rng = rng
    s.levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Double])
    var h = 0
    while (h < nLevels) {
      var i = 0
      while (i < sizes(h)) { s.levels(h) += bb.getDouble(); i += 1 }
      h += 1
    }
    s.count = count
    s
  }

  /** Published (DataSketches-fit) normalized rank error at ~99% confidence. */
  def normalizedRankError(k: Int): Double = 2.446 / math.pow(k.toDouble, 0.9433)
}
