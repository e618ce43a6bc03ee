package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.operators.SketchAggs._

/** Edge cases through the Spark surface: null/empty token arrays, empty
  * relations, single rows, cross-size filter merging. */
class EdgeCaseSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-edge-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import SketchQueries.{K0, K1}
  val cfg = BloomConfig(K0, K1, 3, 8)

  val schema = StructType(Seq(
    StructField("source", StringType),
    StructField("tokens", ArrayType(IntegerType))))

  def df(rows: Seq[Row], parts: Int = 2) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)

  test("null and empty token arrays are no-ops, not errors") {
    val d = df(Seq(
      Row("a", Seq(1, 2, 3)),
      Row("a", null),
      Row("a", Seq.empty[Int]),
      Row("b", null)))
    val bloomU = udaf(new BloomTokensAgg(cfg), ExpressionEncoder[Array[Int]]())
    val out = d.groupBy(col("source")).agg(bloomU(col("tokens")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val (c, w, _) = BlockedBloom.fromBytes(K0, K1, out("a"))
    Seq(1, 2, 3).foreach(t => assert(BlockedBloom.containsInt(w, c, t)))
    // source b saw only nulls: its sketch is the empty filter
    val (_, wb, _) = BlockedBloom.fromBytes(K0, K1, out("b"))
    assert(wb.forall(_ == 0L))
  }

  test("aggregating an empty relation yields the empty sketch") {
    val d = df(Seq.empty)
    val bloomU = udaf(new BloomTokensAgg(cfg), ExpressionEncoder[Array[Int]]())
    val bytes = d.agg(bloomU(col("tokens"))).head().getAs[Array[Byte]](0)
    val (c, w, _) = BlockedBloom.fromBytes(K0, K1, bytes)
    assert(w.forall(_ == 0L) && c == cfg)
  }

  test("BloomMergeAgg folds mixed filter sizes to the smallest, losslessly") {
    import spark.implicits._
    val big = BloomConfig(K0, K1, 3, 12)
    val small = BloomConfig(K0, K1, 3, 8)
    def build(c: BloomConfig, toks: Seq[Int]): Array[Byte] = {
      val w = new Array[Long](c.l)
      toks.foreach(BlockedBloom.insertInt(w, c, _))
      BlockedBloom.toBytes(w, c, BlockedBloom.TypeTag.Int)
    }
    val sketches = Seq(build(big, 1 to 100), build(small, 200 to 300)).toDF("sk")
    val mergeU = udaf(new BloomMergeAgg(K0, K1), ExpressionEncoder[Array[Byte]]())
    val merged = sketches.agg(mergeU(col("sk"))).head().getAs[Array[Byte]](0)
    val (mc, mw, _) = BlockedBloom.fromBytes(K0, K1, merged)
    assert(mc.log2l === 8, "merge must fold down to the smallest size")
    ((1 to 100) ++ (200 to 300)).foreach(t =>
      assert(BlockedBloom.containsInt(mw, mc, t), s"lost element $t in cross-size merge"))
    // lossless: equals direct build at the small config
    val direct = build(small, (1 to 100) ++ (200 to 300))
    assert(java.util.Arrays.equals(merged, direct))
  }

  test("KLL/t-digest aggs on empty and single-value input") {
    import spark.implicits._
    val kllU = udaf(new KllDoubleAgg(64), ExpressionEncoder[Double]())
    val one = Seq(42.0).toDF("x").agg(kllU(col("x"))).head().getAs[Array[Byte]](0)
    assert(Kll.fromBytes(one).quantile(0.5) === 42.0)
    val tdU = udaf(new TDigestDoubleAgg(50), ExpressionEncoder[Double]())
    val oneTd = Seq(42.0).toDF("x").agg(tdU(col("x"))).head().getAs[Array[Byte]](0)
    assert(TDigest.fromBytes(oneTd).quantile(0.5) === 42.0)
    val emptyKll = spark.emptyDataset[Double].toDF("x").agg(kllU(col("x"))).head().getAs[Array[Byte]](0)
    assert(Kll.fromBytes(emptyKll).n === 0L)
    assert(Kll.fromBytes(emptyKll).quantile(0.5).isNaN)
  }

  test("HLL merge rejects mismatched precision; bloom merge rejects mismatched k") {
    val a = Hll.empty(10)
    val b = Hll.empty(12)
    assertThrows[IllegalArgumentException](Hll.merge(a, b))
    val m = new graft.jobs.HllBytesMergeAgg()
    assertThrows[IllegalArgumentException](
      m.merge(Hll.toBytes(a, 10, 1L, 0L), Hll.toBytes(b, 12, 1L, 0L)))
    val mergeAgg = new BloomMergeAgg(K0, K1)
    val s1 = BlockedBloom.toBytes(new Array[Long](1 << 8), BloomConfig(K0, K1, 3, 8), 1L)
    val s2 = BlockedBloom.toBytes(new Array[Long](1 << 8), BloomConfig(K0, K1, 4, 8), 1L)
    assertThrows[IllegalArgumentException](mergeAgg.merge(s1, s2))
  }
}
