package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

import graft.core._

/** Typed Dataset `Aggregator`s wrapping the core sketch family.
  *
  * This is THE architectural translation of the reference (SURVEY.md §1.2):
  * the reference shares one mutable filter across threads and synchronizes
  * with an atomic fetch-or (reference `Internal.hs:449-454`); under Spark,
  * each task owns its aggregation buffer, Catalyst runs partial aggregation
  * per partition (`reduce`) and merges partials after the shuffle (`merge`)
  * — contention-free, and it sidesteps the reference's documented negative
  * write-scaling across threads (reference `README.md:24-29`).
  *
  * All buffers are native arrays or compact objects; `reduce`/`merge`
  * mutate and return their left argument (Spark owns the buffer). Register
  * with `functions.udaf(agg, inputEncoder)` or use via `Dataset.select` on
  * typed columns.
  */
object SketchAggs {

  private def longArrayEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  private def byteArrayEnc: Encoder[Array[Byte]] = Encoders.BINARY

  // ------------------------------------------------------------- Bloom

  /** Bloom over a column of token arrays (`tokens: array<int>`): every
    * element of every array is inserted. OUT = serialized filter bytes. */
  final class BloomTokensAgg(cfg: BloomConfig) extends Aggregator[Array[Int], Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](cfg.l)
    override def reduce(buf: Array[Long], tokens: Array[Int]): Array[Long] = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) { BlockedBloom.insertInt(buf, cfg, tokens(i)); i += 1 }
      }
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      BlockedBloom.unionInPlace(b1, b2)
    override def finish(buf: Array[Long]): Array[Byte] =
      BlockedBloom.toBytes(buf, cfg, BlockedBloom.TypeTag.Int)
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** Bloom over a scalar int column. */
  final class BloomIntAgg(cfg: BloomConfig) extends Aggregator[Int, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](cfg.l)
    override def reduce(buf: Array[Long], x: Int): Array[Long] = {
      BlockedBloom.insertInt(buf, cfg, x); buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      BlockedBloom.unionInPlace(b1, b2)
    override def finish(buf: Array[Long]): Array[Byte] =
      BlockedBloom.toBytes(buf, cfg, BlockedBloom.TypeTag.Int)
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** Bloom over a long column (e.g. doc ids, join keys for runtime filters). */
  final class BloomLongAgg(cfg: BloomConfig) extends Aggregator[Long, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](cfg.l)
    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      BlockedBloom.insertLong(buf, cfg, x); buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      BlockedBloom.unionInPlace(b1, b2)
    override def finish(buf: Array[Long]): Array[Byte] =
      BlockedBloom.toBytes(buf, cfg, BlockedBloom.TypeTag.Long)
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** Bloom over a string column (UTF-8 canonical encoding). */
  final class BloomStringAgg(cfg: BloomConfig) extends Aggregator[String, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](cfg.l)
    override def reduce(buf: Array[Long], s: String): Array[Long] = {
      if (s != null) BlockedBloom.insertString(buf, cfg, s)
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      BlockedBloom.unionInPlace(b1, b2)
    override def finish(buf: Array[Long]): Array[Byte] =
      BlockedBloom.toBytes(buf, cfg, BlockedBloom.TypeTag.String)
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** Merges already-serialized Bloom filters (second-level aggregation:
    * e.g. per-(source,salt) partials -> per-source, or per-source -> global).
    * Accepts mixed sizes by folding larger filters down to the smallest —
    * the distributed analogue of the reference's different-size `unionInto`
    * (`Internal.hs:509-550`). Filters must share key, k and hash width. */
  final class BloomMergeAgg(k0: Long, k1: Long) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    private def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val (cfgA, wa, tagA) = BlockedBloom.fromBytes(k0, k1, a)
      val (cfgB, wb, tagB) = BlockedBloom.fromBytes(k0, k1, b)
      require(cfgA.k == cfgB.k, s"bloom merge: k mismatch ${cfgA.k} vs ${cfgB.k}")
      require(tagA == tagB, s"bloom merge: element type mismatch $tagA vs $tagB")
      require(cfgA.hash64Enough == cfgB.hash64Enough,
        "bloom merge: hash-width mismatch (different-size filters must share the hash path)")
      val target = math.min(cfgA.log2l, cfgB.log2l)
      val fa = if (cfgA.log2l == target) wa else BlockedBloom.fold(wa, target)
      val fb = if (cfgB.log2l == target) wb else BlockedBloom.fold(wb, target)
      val cfg = if (cfgA.log2l == target) cfgA else cfgB
      BlockedBloom.toBytes(BlockedBloom.unionInPlace(fa, fb), cfg, tagA)
    }
    override def reduce(buf: Array[Byte], x: Array[Byte]): Array[Byte] = mergeBytes(buf, x)
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = mergeBytes(b1, b2)
    override def finish(buf: Array[Byte]): Array[Byte] = buf
    override def bufferEncoder: Encoder[Array[Byte]] = byteArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  // --------------------------------------------------------------- HLL

  /** HLL distinct-count over token arrays (distinct token ids). */
  final class HllTokensAgg(k0: Long, k1: Long, p: Int) extends Aggregator[Array[Int], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Hll.empty(p)
    override def reduce(buf: Array[Byte], tokens: Array[Int]): Array[Byte] = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) { Hll.addHash(buf, p, SipHash.hashInt(k0, k1, tokens(i))); i += 1 }
      }
      buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = Hll.merge(b1, b2)
    override def finish(buf: Array[Byte]): Array[Byte] =
      Hll.toBytes(buf, p, BlockedBloom.TypeTag.Int, SipHash.hashLong(k0, k1, k0 ^ k1))
    override def bufferEncoder: Encoder[Array[Byte]] = byteArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** HLL distinct-count over a string column (e.g. distinct doc_id per source). */
  final class HllStringAgg(k0: Long, k1: Long, p: Int) extends Aggregator[String, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Hll.empty(p)
    override def reduce(buf: Array[Byte], s: String): Array[Byte] = {
      if (s != null) Hll.addHash(buf, p, SipHash.hashString(k0, k1, s))
      buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = Hll.merge(b1, b2)
    override def finish(buf: Array[Byte]): Array[Byte] =
      Hll.toBytes(buf, p, BlockedBloom.TypeTag.String, SipHash.hashLong(k0, k1, k0 ^ k1))
    override def bufferEncoder: Encoder[Array[Byte]] = byteArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** HLL over a long column. */
  final class HllLongAgg(k0: Long, k1: Long, p: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Hll.empty(p)
    override def reduce(buf: Array[Byte], x: Long): Array[Byte] = {
      Hll.addHash(buf, p, SipHash.hashLong(k0, k1, x)); buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = Hll.merge(b1, b2)
    override def finish(buf: Array[Byte]): Array[Byte] =
      Hll.toBytes(buf, p, BlockedBloom.TypeTag.Long, SipHash.hashLong(k0, k1, k0 ^ k1))
    override def bufferEncoder: Encoder[Array[Byte]] = byteArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  // --------------------------------------------------------- count-min

  /** Count-min over token arrays: one increment per token occurrence. */
  final class CmsTokensAgg(cfg: CmsConfig) extends Aggregator[Array[Int], Array[Long], Array[Byte]] {
    override def zero: Array[Long] = CountMin.empty(cfg)
    override def reduce(buf: Array[Long], tokens: Array[Int]): Array[Long] = {
      if (tokens != null) {
        val scratch = new Array[Long](2) // one alloc per row, not per token
        var i = 0
        while (i < tokens.length) {
          SipHash.hash128IntInto(cfg.k0, cfg.k1, tokens(i), scratch)
          CountMin.addHash(buf, cfg, scratch(1), scratch(0) | 1L)
          i += 1
        }
      }
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = CountMin.merge(b1, b2)
    override def finish(buf: Array[Long]): Array[Byte] =
      CountMin.toBytes(buf, cfg, BlockedBloom.TypeTag.Int)
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** Count-min over a string column. */
  final class CmsStringAgg(cfg: CmsConfig) extends Aggregator[String, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = CountMin.empty(cfg)
    override def reduce(buf: Array[Long], s: String): Array[Long] = {
      if (s != null) CountMin.addString(buf, cfg, s)
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = CountMin.merge(b1, b2)
    override def finish(buf: Array[Long]): Array[Byte] =
      CountMin.toBytes(buf, cfg, BlockedBloom.TypeTag.String)
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  // ----------------------------------------------------------- fused

  /** All-in-one buffer for the fused build (arrays encode natively). */
  final case class FusedBuf(bloom: Array[Long], hll: Array[Byte], cms: Array[Long])

  /** Finished fused sketches (each independently deserializable and
    * merge-compatible with the single-sketch aggregators). */
  final case class FusedSketch(bloom: Array[Byte], hll: Array[Byte], cms: Array[Byte])

  /** Fused Bloom + HLL + CMS build in ONE pass: the token array is decoded
    * once per row and each token is hashed exactly twice (one 64-bit value
    * shared by Bloom and HLL — the same value the individual aggregators
    * use, so results are byte-identical and cross-mergeable — plus one
    * 128-bit value for CMS), instead of 3 input decodes + 3 hashes with
    * three separate UDAFs. This is the flagship-scale build path.
    *
    * Requires `bloomCfg.hash64Enough` (the fused fast path shares the
    * 64-bit hash; large k+log2l configs should use the individual aggs). */
  final class FusedTokensAgg(bloomCfg: BloomConfig, hllP: Int, cmsCfg: CmsConfig)
      extends Aggregator[Array[Int], FusedBuf, FusedSketch] {
    require(bloomCfg.hash64Enough,
      "FusedTokensAgg requires a 64-bit-hash bloom config (6k + log2l <= 64)")
    require(bloomCfg.k0 == cmsCfg.k0 && bloomCfg.k1 == cmsCfg.k1,
      "FusedTokensAgg: bloom and cms must share the SipKey")
    private val k0 = bloomCfg.k0
    private val k1 = bloomCfg.k1

    override def zero: FusedBuf =
      FusedBuf(new Array[Long](bloomCfg.l), Hll.empty(hllP), CountMin.empty(cmsCfg))

    override def reduce(buf: FusedBuf, tokens: Array[Int]): FusedBuf = {
      if (tokens != null) {
        val scratch = new Array[Long](2) // one alloc per row, not per token
        var i = 0
        while (i < tokens.length) {
          val t = tokens(i)
          val h64 = SipHash.hashInt(k0, k1, t)
          BlockedBloom.insertHash64(buf.bloom, bloomCfg, h64)
          Hll.addHash(buf.hll, hllP, h64)
          SipHash.hash128IntInto(k0, k1, t, scratch)
          CountMin.addHash(buf.cms, cmsCfg, scratch(1), scratch(0) | 1L)
          i += 1
        }
      }
      buf
    }

    override def merge(b1: FusedBuf, b2: FusedBuf): FusedBuf = {
      BlockedBloom.unionInPlace(b1.bloom, b2.bloom)
      Hll.merge(b1.hll, b2.hll)
      CountMin.merge(b1.cms, b2.cms)
      b1
    }

    override def finish(buf: FusedBuf): FusedSketch = FusedSketch(
      BlockedBloom.toBytes(buf.bloom, bloomCfg, BlockedBloom.TypeTag.Int),
      Hll.toBytes(buf.hll, hllP, BlockedBloom.TypeTag.Int, SipHash.hashLong(k0, k1, k0 ^ k1)),
      CountMin.toBytes(buf.cms, cmsCfg, BlockedBloom.TypeTag.Int))

    override def bufferEncoder: Encoder[FusedBuf] = ExpressionEncoder[FusedBuf]()
    override def outputEncoder: Encoder[FusedSketch] = ExpressionEncoder[FusedSketch]()
  }

  // ----------------------------------------------------------- quantiles

  /** KLL quantile sketch over a double column. Buffer is the sketch object
    * (kryo-encoded across shuffles; compactor state is compact by design). */
  final class KllDoubleAgg(k: Int) extends Aggregator[Double, KllSketch, Array[Byte]] {
    override def zero: KllSketch = new KllSketch(k)
    override def reduce(buf: KllSketch, x: Double): KllSketch = { buf.add(x); buf }
    override def merge(b1: KllSketch, b2: KllSketch): KllSketch = b1.merge(b2)
    override def finish(buf: KllSketch): Array[Byte] = buf.toBytes
    override def bufferEncoder: Encoder[KllSketch] = Encoders.kryo[KllSketch]
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }

  /** Merging t-digest over a double column. */
  final class TDigestDoubleAgg(compression: Double) extends Aggregator[Double, TDigest, Array[Byte]] {
    override def zero: TDigest = new TDigest(compression)
    override def reduce(buf: TDigest, x: Double): TDigest = { buf.add(x); buf }
    override def merge(b1: TDigest, b2: TDigest): TDigest = b1.merge(b2)
    override def finish(buf: TDigest): Array[Byte] = buf.toBytes
    override def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    override def outputEncoder: Encoder[Array[Byte]] = byteArrayEnc
  }
}
