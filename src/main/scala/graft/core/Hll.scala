package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Dense HyperLogLog (Flajolet–Furet–Gandouet–Meunier 2007) with the
  * standard small-range linear-counting correction.
  *
  * Part of the mergeable sketch family the reference's Bloom filter
  * generalizes into (BASELINE.json north_rule): same monoid shape —
  * `add` is the per-row reduce, `merge` is an elementwise register max
  * (associative, commutative, idempotent), so per-partition partials
  * combine under Catalyst partial/final aggregation exactly like the
  * Bloom word-OR (reference union, `Internal.hs:488-491`).
  *
  * Registers are a bare `Array[Byte]` of `2^p` entries so the Spark
  * aggregation buffer is a native binary array. Hash = keyed SipHash-2-4
  * (see [[SipHash]]) for cross-executor determinism.
  *
  * Standard error: sigma = 1.04 / sqrt(2^p).
  */
object Hll {

  def numRegisters(p: Int): Int = {
    require(p >= 4 && p <= 18, s"HLL precision p must be in [4,18], got $p")
    1 << p
  }

  def empty(p: Int): Array[Byte] = new Array[Byte](numRegisters(p))

  /** Update registers with a 64-bit hash of one element. Top p bits pick the
    * register; rho = 1 + leading zeros of the remaining 64-p bits. */
  @inline def addHash(regs: Array[Byte], p: Int, h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rho = (if (w == 0L) (64 - p) + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (rho > regs(idx)) regs(idx) = rho
  }

  /** Elementwise max merge — the HLL monoid. */
  def merge(dst: Array[Byte], src: Array[Byte]): Array[Byte] = {
    require(dst.length == src.length, s"HLL merge: ${dst.length} vs ${src.length} registers")
    var i = 0
    while (i < dst.length) { if (src(i) > dst(i)) dst(i) = src(i); i += 1 }
    dst
  }

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Cardinality estimate with linear-counting small-range correction. */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      invSum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r exactly
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha(m) * m.toDouble * m.toDouble / invSum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else e
  }

  /** Published relative standard error for precision p. */
  def stdError(p: Int): Double = 1.04 / math.sqrt((1 << p).toDouble)

  // --- serialization: [version, typeTag, keyHash, p] big-endian header + registers ---
  final val SerialVersion = 1L

  def toBytes(regs: Array[Byte], p: Int, typeTag: Long, keyHash: Long): Array[Byte] = {
    val bb = ByteBuffer.allocate(32 + regs.length).order(ByteOrder.BIG_ENDIAN)
    bb.putLong(SerialVersion).putLong(typeTag).putLong(keyHash).putLong(p.toLong)
    bb.put(regs)
    bb.array()
  }

  /** Returns (p, registers, typeTag, keyHash). Validates version and size;
    * callers merging sketches must also require equal keyHash — registers
    * populated under different SipHash keys max-merge into garbage. */
  def fromBytesFull(bytes: Array[Byte]): (Int, Array[Byte], Long, Long) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val version = bb.getLong()
    require(version == SerialVersion, s"HLL serialized version $version")
    val typeTag = bb.getLong()
    val keyHash = bb.getLong()
    val p = bb.getLong().toInt
    require(bytes.length == 32 + numRegisters(p), s"HLL serialized size ${bytes.length} for p=$p")
    val regs = new Array[Byte](1 << p)
    bb.get(regs)
    (p, regs, typeTag, keyHash)
  }

  /** Returns (p, registers, typeTag) — estimate-only callers. */
  def fromBytes(bytes: Array[Byte]): (Int, Array[Byte], Long) = {
    val (p, regs, tag, _) = fromBytesFull(bytes)
    (p, regs, tag)
  }
}
