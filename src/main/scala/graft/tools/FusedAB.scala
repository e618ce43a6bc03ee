package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.SketchAggs._
import graft.SketchQueries.{K0, K1}

/** A/B: fused vs three separate sketch aggregators, same session/input. */
object FusedAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/tmp/graft_bench_tokens_16000000.parquet")
    println("rows=" + df.count())
    val enc = ExpressionEncoder[Array[Int]]()
    val cfg = BloomConfig(K0, K1, 3, 14)
    val cms = CmsConfig(K0, K1, 5, 11)
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def separate(): Unit = {
      val b = udaf(new BloomTokensAgg(cfg), enc); val h = udaf(new HllTokensAgg(K0,K1,12), enc); val c = udaf(new CmsTokensAgg(cms), enc)
      df.groupBy(col("source")).agg(b(col("tokens")), h(col("tokens")), c(col("tokens"))).collect()
    }
    def fused(): Unit = {
      val f = udaf(new FusedTokensAgg(cfg, 12, cms), enc)
      df.groupBy(col("source")).agg(f(col("tokens"))).collect()
    }
    def bloomOnly(): Unit = {
      val b = udaf(new BloomTokensAgg(cfg), enc)
      df.groupBy(col("source")).agg(b(col("tokens"))).collect()
    }
    graft.plans.NativeAggs.register(spark, bloomK = 3, bloomLog2l = 14)
    def nativeBloom(): Unit =
      df.groupBy(col("source")).agg(graft.plans.NativeAggs.bloomTokensNative(col("tokens"))).collect()
    def nativeFused(): Unit =
      df.groupBy(col("source")).agg(graft.plans.NativeAggs.fusedTokensNative(col("tokens"))).collect()
    separate(); fused(); bloomOnly(); nativeBloom(); nativeFused() // warm all
    for (_ <- 1 to 2) {
      t("separate")(separate()); t("fused")(fused()); t("bloomOnly")(bloomOnly())
      t("nativeBloom")(nativeBloom()); t("nativeFused")(nativeFused())
    }
    spark.stop()
  }
}
