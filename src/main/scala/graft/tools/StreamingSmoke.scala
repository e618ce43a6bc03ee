package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{BlockedBloom, BloomConfig, Keys}
import graft.streaming.StreamingSketch

/** End-to-end streaming drive: rate-source -> token synthesis -> watermarked
  * windowed sketch aggregation -> memory sink. Exercises the streaming
  * surface outside tests. `sbt "runMain graft.tools.StreamingSmoke"` */
object StreamingSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = BloomConfig(Keys.DefaultK0, Keys.DefaultK1, 3, 10)
    val genTokens = udf { (v: Long) => Array.tabulate(8)(j => (v * 8 + j).toInt % 1000) }
    val tokens = spark.readStream
      .format("rate").option("rowsPerSecond", "500").load()
      .select(
        col("timestamp").as("ts"),
        concat(lit("src"), (col("value") % 3).cast("string")).as("source"),
        genTokens(col("value")).as("tokens"))

    val out = StreamingSketch.perSourceWindowedSketches(
      tokens, "ts", "10 seconds", "10 seconds", cfg, hllP = 10)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("smoke_sketches").start()
    Thread.sleep(6000)
    q.processAllAvailable()
    val rows = spark.table("smoke_sketches")
      .select(col("source"), col("bloom"), col("n_tokens")).collect()
    q.stop()
    var failed = false
    if (rows.isEmpty) { println("FAIL no windows emitted"); failed = true }
    else {
      println(s"OK   ${rows.length} (window, source) sketch rows emitted")
      val r = rows.head
      val (c, w, _) = BlockedBloom.fromBytes(cfg.k0, cfg.k1, r.getAs[Array[Byte]]("bloom"))
      println(s"OK   sketch deserializes: log2l=${c.log2l} n_tokens=${r.getAs[Long]("n_tokens")}")
    }
    spark.stop()
    if (failed) sys.exit(1)
    println("STREAMING SMOKE PASS")
  }
}
