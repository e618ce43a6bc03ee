package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Bottom-k uniform VALUE sample — the mergeable distributed answer to
  * "give me k uniformly random distinct elements per group".
  *
  * The KMV sketch ([[Kmv]]) keeps the k smallest keyed-SipHash values of
  * the inserted elements; because the hash is a uniform random function of
  * the element, those k hashes identify a UNIFORM random sample of the
  * distinct elements (Beyer et al. 2007 §2 — the bottom-k sample is the
  * estimator's foundation). This sketch additionally RETAINS the element
  * alongside its hash, turning the cardinality sketch into a sampling
  * operator: per-partition partials keep k (hash, value) pairs, merge
  * keeps the k smallest of the union — associative, commutative,
  * idempotent, deterministic for a fixed SipHash key. Contrast with the
  * naive Spark formulation (`row_number() OVER (ORDER BY rand())` per
  * group): that shuffles EVERY row and is nondeterministic; this shuffles
  * one <= k-entry summary per (partition, group) and always returns the
  * same sample for the same input set — resumable-job friendly and
  * oracle-checkable.
  *
  * Distinct semantics: duplicate elements hash identically and are
  * dropped, so the sample is over the distinct-element set (sampling
  * WITHOUT replacement). Values are stored as longs (element typeTag
  * recorded, mirroring the Bloom/KMV type enforcement).
  */
object BottomK {

  /** Parallel buffers of capacity k: ascending-unsigned hashes + their
    * source values. `size` valid entries. */
  def emptyBuffers(k: Int): (Array[Long], Array[Long]) = {
    require(k >= 1 && k <= (1 << 20), s"BottomK k must be in [1, 2^20], got $k")
    (new Array[Long](k), new Array[Long](k))
  }

  // unsigned compare + binary search shared with Kmv (identical prefix
  // invariant; one definition so the two cannot drift)
  @inline private def lt(a: Long, b: Long): Boolean = Kmv.lt(a, b)
  @inline private def search(hashes: Array[Long], size: Int, h: Long): Int =
    Kmv.search(hashes, size, h)

  /** Insert one (hash, value); mutates both arrays, returns the new size.
    * Saturated inserts fast-reject on one unsigned compare, like KMV. */
  def add(hashes: Array[Long], values: Array[Long], size: Int, h: Long, v: Long): Int = {
    val k = hashes.length
    if (size == k && !lt(h, hashes(k - 1))) return size
    val pos = search(hashes, size, h)
    if (pos >= 0) return size // duplicate element (same hash): distinct semantics
    val ins = -pos - 1
    val newSize = if (size < k) size + 1 else size
    val moved = newSize - 1 - ins
    if (moved > 0) {
      System.arraycopy(hashes, ins, hashes, ins + 1, moved)
      System.arraycopy(values, ins, values, ins + 1, moved)
    }
    hashes(ins) = h
    values(ins) = v
    newSize
  }

  /** Union-merge, capacity min(kA, kB) (cross-capacity folds down exactly
    * like [[Kmv.merge]]). Returns (hashes, values, size). */
  def merge(aH: Array[Long], aV: Array[Long], aSize: Int,
      bH: Array[Long], bV: Array[Long], bSize: Int): (Array[Long], Array[Long], Int) = {
    val k = math.min(aH.length, bH.length)
    val outH = new Array[Long](k)
    val outV = new Array[Long](k)
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < aSize || j < bSize)) {
      val takeA = j >= bSize || (i < aSize && lt(aH(i), bH(j)))
      val (h, v) = if (takeA) { val p = (aH(i), aV(i)); i += 1; p }
                   else { val p = (bH(j), bV(j)); j += 1; p }
      if (n == 0 || outH(n - 1) != h) { outH(n) = h; outV(n) = v; n += 1 }
    }
    (outH, outV, n)
  }

  // --- serialization: [version, typeTag, keyHash, k, size] BE header +
  //     hashes[size] + values[size] ---
  final val SerialVersion = 1L

  def toBytes(hashes: Array[Long], values: Array[Long], size: Int,
      typeTag: Long, keyHash: Long): Array[Byte] = {
    val bb = ByteBuffer.allocate(40 + 16 * size).order(ByteOrder.BIG_ENDIAN)
    bb.putLong(SerialVersion).putLong(typeTag).putLong(keyHash)
      .putLong(hashes.length.toLong).putLong(size.toLong)
    var i = 0
    while (i < size) { bb.putLong(hashes(i)); i += 1 }
    i = 0
    while (i < size) { bb.putLong(values(i)); i += 1 }
    bb.array()
  }

  /** Returns (hashes[k], values[k], size, typeTag, keyHash). Validates
    * version, ranges BEFORE narrowing, declared-vs-actual length, and
    * strict ascending unsigned hash order (the structural invariant). */
  def fromBytes(bytes: Array[Byte]): (Array[Long], Array[Long], Int, Long, Long) = {
    require(bytes.length >= 40, s"BottomK serialized size ${bytes.length} < header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val version = bb.getLong()
    require(version == SerialVersion, s"BottomK serialized version $version")
    val typeTag = bb.getLong()
    val keyHash = bb.getLong()
    val k64 = bb.getLong()
    val size64 = bb.getLong()
    require(k64 >= 1L && k64 <= (1L << 20), s"BottomK serialized k=$k64 out of range")
    require(size64 >= 0L && size64 <= k64, s"BottomK serialized size=$size64 for k=$k64")
    val k = k64.toInt
    val size = size64.toInt
    require(bytes.length == 40 + 16 * size,
      s"BottomK serialized length ${bytes.length}, expected ${40 + 16 * size}")
    val hashes = new Array[Long](k)
    val values = new Array[Long](k)
    var i = 0
    while (i < size) {
      hashes(i) = bb.getLong()
      require(i == 0 || lt(hashes(i - 1), hashes(i)),
        s"BottomK serialized hashes not strictly ascending at $i")
      i += 1
    }
    i = 0
    while (i < size) { values(i) = bb.getLong(); i += 1 }
    (hashes, values, size, typeTag, keyHash)
  }
}
