package graft.tools

import graft.core._

/** End-to-end smoke drive of the core sketch library through its public
  * API: build → serialize → reload → probe, plus failure-path probes.
  * Run: `sbt "runMain graft.tools.Smoke"`. Exits non-zero on any failure.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    var failed = false
    def check(ok: Boolean, msg: String): Unit = {
      println((if (ok) "OK  " else "FAIL") + " " + msg)
      if (!ok) failed = true
    }

    val cfg = BloomConfig(0x5eedL, 0xf00dL, k = 3, log2l = 12)
    val words = new Array[Long](cfg.l)
    val tokens = (1 to 10000).map(_ * 2)
    tokens.foreach(t => BlockedBloom.insertInt(words, cfg, t))
    val bytes = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
    check(bytes.length == 8 * cfg.l + 64, s"serialized ${bytes.length} bytes")
    val (cfg2, back, _) = BlockedBloom.fromBytes(0x5eedL, 0xf00dL, bytes)
    val misses = tokens.count(t => !BlockedBloom.containsInt(back, cfg2, t))
    check(misses == 0, s"false negatives after roundtrip: $misses")
    val fpr = (1 to 10000 by 2).count(t => BlockedBloom.containsInt(back, cfg2, t)) / 5000.0
    val analytic = Fpr.bloom1(10000, cfg.l.toLong, 3)
    check(math.abs(fpr - analytic) < 0.005, f"FPR anti-set $fpr%.4f vs analytic $analytic%.4f")

    check(
      try { BlockedBloom.fromBytes(0xbadL, 0xf00dL, bytes); false }
      catch { case _: IllegalArgumentException => true }, "wrong key rejected")
    check(
      try { BlockedBloom.fromBytes(0x5eedL, 0xf00dL, bytes.take(100)); false }
      catch { case _: IllegalArgumentException => true }, "truncated bytes rejected")
    check(
      try { BloomConfig(1, 2, 0, 5); false }
      catch { case _: IllegalArgumentException => true }, "k=0 config rejected")

    val p = 12
    val regs = Hll.empty(p)
    (1 to 50000).foreach(i => Hll.addHash(regs, p, SipHash.hashInt(1, 2, i)))
    val hllEst = Hll.estimate(regs)
    check(math.abs(hllEst - 50000) < 4 * Hll.stdError(p) * 50000,
      f"HLL estimate for 50000 distinct: $hllEst%.0f")

    val cms = CmsConfig(1, 2, 5, 11)
    val cb = CountMin.empty(cms)
    (1 to 1000).foreach(_ => CountMin.addInt(cb, cms, 7))
    val cmsEst = CountMin.estimateInt(cb, cms, 7)
    check(cmsEst == 1000, s"CMS estimate for 1000 x token7: $cmsEst")

    val kll = new KllSketch(200)
    (1 to 100000).foreach(x => kll.add(x.toDouble))
    val med = kll.quantile(0.5)
    check(math.abs(med / 100000.0 - 0.5) < 0.02, s"KLL median of 1..100000: $med")

    val td = new TDigest(100)
    (1 to 100000).foreach(x => td.add(x.toDouble))
    val p99 = td.quantile(0.99)
    check(math.abs(p99 / 100000.0 - 0.99) < 0.005, s"t-digest p99 of 1..100000: $p99")

    if (failed) sys.exit(1)
    println("SMOKE PASS")
  }
}
