package graft.tools
import graft.core._
/** One-time generator for the golden serialized-sketch files
  * (src/test/resources/serialized), mirroring the reference's
  * tests/serialized bytestring fixtures. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("src/test/resources/serialized")
    java.nio.file.Files.createDirectories(outDir)
    val k0 = Keys.DefaultK0; val k1 = Keys.DefaultK1
    // (k, log2l) grid from FIXTURES.md §2, payload = [1 .. 2*dataBytes]
    for ((k, log2l) <- Seq((1, 0), (2, 1), (3, 2), (3, 7), (4, 10))) {
      val cfg = BloomConfig(k0, k1, k, log2l)
      val words = new Array[Long](cfg.l)
      (1 to 2 * cfg.sizeBytes).foreach(BlockedBloom.insertInt(words, cfg, _))
      val bytes = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
      java.nio.file.Files.write(outDir.resolve(s"bloom_${k}_$log2l.bin"), bytes)
    }
    val hll = Hll.empty(10)
    (1 to 5000).foreach(i => Hll.addHash(hll, 10, SipHash.hashInt(k0, k1, i)))
    java.nio.file.Files.write(outDir.resolve("hll_10.bin"),
      Hll.toBytes(hll, 10, BlockedBloom.TypeTag.Int, SipHash.hashLong(k0, k1, k0 ^ k1)))
    val cms = CmsConfig(k0, k1, 4, 8)
    val buf = CountMin.empty(cms)
    (1 to 3000).foreach(i => CountMin.addInt(buf, cms, i % 100))
    java.nio.file.Files.write(outDir.resolve("cms_4_8.bin"),
      CountMin.toBytes(buf, cms, BlockedBloom.TypeTag.Int))
    // Misra-Gries: fixed serial insertion order -> deterministic content;
    // serialization sorts entries by key -> byte-deterministic
    val hh = new FrequentItems.Summary(16)
    (0 until 12000).foreach(i => hh.add(if (i % 2 == 0) (i / 2) % 8 else 100L + i % 3000))
    java.nio.file.Files.write(outDir.resolve("freqitems_16.bin"), FrequentItems.toBytes(hh))
    // KMV bottom-k: fixed key + payload -> deterministic retained hashes
    val kmv = Kmv.emptyHashes(64)
    var kmvSize = 0
    (1 to 5000).foreach(i => kmvSize = Kmv.add(kmv, kmvSize, SipHash.hashInt(k0, k1, i)))
    java.nio.file.Files.write(outDir.resolve("kmv_64.bin"),
      Kmv.toBytes(kmv, kmvSize, BlockedBloom.TypeTag.Int, SipHash.hashLong(k0, k1, k0 ^ k1)))
    println("golden files written")
  }
}
