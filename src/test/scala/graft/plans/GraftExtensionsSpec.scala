package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BlockedBloom, BloomConfig, Keys}

/** The `spark.sql.extensions=graft.plans.GraftExtensions` injection path:
  * a session built with the extensions (no GraftFunctions.register call)
  * must resolve the native expressions from pure SQL — the deployment mode
  * a cluster operator uses (`--conf spark.sql.extensions=...`). */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("injected functions resolve from SQL without manual registration") {
    val h = spark.sql("SELECT graft_sip_hash64('alpha')").head().getLong(0)
    assert(h === graft.core.SipHash.hashString(Keys.DefaultK0, Keys.DefaultK1, "alpha"))

    val cfg = BloomConfig(Keys.DefaultK0, Keys.DefaultK1, 3, 8)
    val words = new Array[Long](cfg.l)
    Seq(7, 8, 9).foreach(BlockedBloom.insertInt(words, cfg, _))
    val sketch = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int)
    val hex = sketch.map("%02x".format(_)).mkString
    val hit = spark.sql(s"SELECT graft_bloom_might_contain(X'$hex', 7)").head().getBoolean(0)
    assert(hit, "injected graft_bloom_might_contain must probe correctly")
    val miss = spark.sql(s"SELECT graft_bloom_might_contain(X'$hex', 1000000)").head().getBoolean(0)
    assert(!miss || BlockedBloom.containsInt(words, cfg, 1000000))
  }

  test("graft_double_bits: injected, bit-exact, order-preserving, type-checked") {
    val b = spark.sql("SELECT graft_double_bits(CAST(1.5 AS DOUBLE))").head().getLong(0)
    assert(b === java.lang.Double.doubleToLongBits(1.5))
    // non-negative doubles order like their bits — the property the
    // weighted mixture scan's shard key relies on
    val rows = spark.sql(
      "SELECT graft_double_bits(CAST(x AS DOUBLE)) FROM VALUES (0.0), (1e-300), (0.5), (1.0), (2.0), (1e300) t(x)")
      .collect().map(_.getLong(0))
    assert(rows.sameElements(rows.sorted))
    assert(rows.forall(_ >= 0L))
    // analysis-time type rejection, not runtime garbage
    val e = intercept[Exception](spark.sql("SELECT graft_double_bits('nope')").collect())
    assert(e.getMessage.contains("not supported") || e.getMessage.contains("DATATYPE"))
  }

  test("round-3 injected functions: set ops, readers, cosine resolve from pure SQL") {
    val cfg = BloomConfig(Keys.DefaultK0, Keys.DefaultK1, 3, 8)
    val words = new Array[Long](cfg.l)
    Seq(7, 8, 9).foreach(BlockedBloom.insertInt(words, cfg, _))
    val hex = BlockedBloom.toBytes(words, cfg, BlockedBloom.TypeTag.Int).map("%02x".format(_)).mkString
    val u = spark.sql(
      s"SELECT graft_bloom_might_contain(graft_bloom_union(X'$hex', X'$hex'), 8)").head().getBoolean(0)
    assert(u, "injected graft_bloom_union must preserve members")
    val i = spark.sql(
      s"SELECT graft_bloom_might_contain(graft_bloom_intersect(X'$hex', X'$hex'), 9)").head().getBoolean(0)
    assert(i, "injected graft_bloom_intersect must preserve common members")

    val hllBytes = {
      val regs = graft.core.Hll.empty(10)
      (1 to 1000).foreach(x => graft.core.Hll.addHash(regs, 10,
        graft.core.SipHash.hashInt(Keys.DefaultK0, Keys.DefaultK1, x)))
      graft.core.Hll.toBytes(regs, 10, BlockedBloom.TypeTag.Int,
        graft.core.SipHash.hashLong(Keys.DefaultK0, Keys.DefaultK1, Keys.DefaultK0 ^ Keys.DefaultK1))
    }
    val hexHll = hllBytes.map("%02x".format(_)).mkString
    val est = spark.sql(s"SELECT graft_hll_estimate(X'$hexHll')").head().getDouble(0)
    assert(math.abs(est - 1000.0) < 100.0, s"injected graft_hll_estimate: $est")

    val cos = spark.sql(
      "SELECT graft_cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("injected KMV readers resolve from pure SQL; cross-key pair rejected") {
    import graft.core.{Kmv, SipHash}
    val keyHash = SipHash.hashLong(Keys.DefaultK0, Keys.DefaultK1, Keys.DefaultK0 ^ Keys.DefaultK1)
    def sketchHex(elems: Range): String = {
      val h = Kmv.emptyHashes(64)
      var s = 0
      elems.foreach(e => s = Kmv.add(h, s, SipHash.hashInt(Keys.DefaultK0, Keys.DefaultK1, e)))
      Kmv.toBytes(h, s, BlockedBloom.TypeTag.Int, keyHash).map("%02x".format(_)).mkString
    }
    val a = sketchHex(1 to 30)
    val b = sketchHex(21 to 50)
    val row = spark.sql(
      s"SELECT graft_kmv_estimate(X'$a'), graft_kmv_jaccard(X'$a', X'$b'), " +
        s"graft_kmv_intersect(X'$a', X'$b'), " +
        s"graft_kmv_estimate(graft_kmv_union(X'$a', X'$b'))").head()
    assert(row.getDouble(0) === 30.0) // below saturation: exact
    assert(math.abs(row.getDouble(1) - 10.0 / 50.0) < 1e-12)
    assert(row.getDouble(2) === 10.0)
    assert(row.getDouble(3) === 50.0) // union also below saturation: exact
    // a sketch serialized under a different key must be rejected by the pair op
    val otherKeyHash = keyHash + 1
    val c = {
      val h = Kmv.emptyHashes(64)
      var s = 0
      (1 to 30).foreach(e => s = Kmv.add(h, s, SipHash.hashInt(Keys.DefaultK0, Keys.DefaultK1, e)))
      Kmv.toBytes(h, s, BlockedBloom.TypeTag.Int, otherKeyHash).map("%02x".format(_)).mkString
    }
    val err = intercept[Exception](
      spark.sql(s"SELECT graft_kmv_jaccard(X'$a', X'$c')").head())
    assert(err.getMessage.contains("different SipHash keys") ||
      Option(err.getCause).exists(_.getMessage.contains("different SipHash keys")))
  }
}
