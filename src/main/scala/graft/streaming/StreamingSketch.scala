package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.core.{BloomConfig, CmsConfig}
import graft.operators.SketchAggs._

/** Structured Streaming surface: the sketch Aggregators are associative +
  * commutative monoids, so they drop straight into watermarked windowed
  * `groupBy().agg()` — per-micro-batch partials reduce into the state
  * store's buffer exactly like per-partition partials reduce in batch.
  * This realizes the reference's concurrency story (order-insensitive
  * inserts, non-linearizable union — reference `Internal.hs:443-454,
  * 485-487`) as event-time streaming (SURVEY.md §2.2 "Streaming").
  */
object StreamingSketch {

  /** Per-(event-time window, source) Bloom + HLL sketches over a streaming
    * token table with columns (tsCol timestamp, source string,
    * tokens array<int>). Late rows beyond the watermark are dropped by
    * Spark's standard semantics. */
  def perSourceWindowedSketches(
      tokens: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      bloomCfg: BloomConfig,
      hllP: Int): DataFrame = {
    val tokensEnc = ExpressionEncoder[Array[Int]]()
    val bloomU = udaf(new BloomTokensAgg(bloomCfg), tokensEnc)
    val hllU = udaf(new HllTokensAgg(bloomCfg.k0, bloomCfg.k1, hllP), tokensEnc)
    tokens
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col("source"))
      .agg(
        bloomU(col("tokens")).as("bloom"),
        hllU(col("tokens")).as("hll"),
        count(lit(1)).as("n_rows"),
        sum(expr("size(tokens)")).as("n_tokens"))
  }

  /** Streaming heavy-hitter sketches: count-min per (window, source). */
  def windowedCountMin(
      tokens: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      cmsCfg: CmsConfig): DataFrame = {
    val tokensEnc = ExpressionEncoder[Array[Int]]()
    val cmsU = udaf(new CmsTokensAgg(cmsCfg), tokensEnc)
    tokens
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col("source"))
      .agg(cmsU(col("tokens")).as("cms"))
  }
}
