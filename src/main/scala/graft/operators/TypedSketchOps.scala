package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

import graft.core.{BloomConfig, CmsConfig, Keys}
import graft.sources.Tokens.TokenRow

/** Typed `Dataset[TokenRow]` façade over the sketch builds — compile-time
  * field checking for pipelines that model the input-hint row as a case
  * class (SURVEY.md §1.2: `Dataset[T]` where type safety helps, `DataFrame`
  * where schema is dynamic). Same physical plans as the DataFrame surface.
  */
object TypedSketchOps {

  final case class SourceSketches(
      source: String,
      bloom: Array[Byte],
      hll: Array[Byte],
      cms: Array[Byte],
      n_rows: Long,
      n_tokens: Long)

  /** Per-source fused sketches from a typed token Dataset. */
  def perSourceSketches(
      tokens: Dataset[TokenRow],
      bloomCfg: BloomConfig = BloomConfig(Keys.DefaultK0, Keys.DefaultK1, 3, 12),
      hllP: Int = 12,
      cmsCfg: CmsConfig = CmsConfig(Keys.DefaultK0, Keys.DefaultK1, 5, 11)): Dataset[SourceSketches] = {
    val spark = tokens.sparkSession
    implicit val outEnc = ExpressionEncoder[SourceSketches]()
    val fusedU = udf0(spark, bloomCfg, hllP, cmsCfg)
    tokens.toDF()
      .groupBy(col("source"))
      .agg(
        fusedU(col("tokens")).as("sk"),
        count(lit(1)).as("n_rows"),
        sum(col("n_tok")).cast("long").as("n_tokens"))
      .select(
        col("source"),
        col("sk.bloom").as("bloom"),
        col("sk.hll").as("hll"),
        col("sk.cms").as("cms"),
        col("n_rows"),
        col("n_tokens"))
      .as[SourceSketches]
  }

  private def udf0(spark: org.apache.spark.sql.SparkSession,
      bloomCfg: BloomConfig, hllP: Int, cmsCfg: CmsConfig) =
    udaf(new SketchAggs.FusedTokensAgg(bloomCfg, hllP, cmsCfg), ExpressionEncoder[Array[Int]]())

  /** Typed probe: which of each row's tokens are present in its source's
    * sketch (demonstrates joining typed results back onto typed input). */
  def probeOwnSource(tokens: Dataset[TokenRow], sketches: Dataset[SourceSketches]): DataFrame = {
    import graft.functions.SketchFunctions
    tokens.toDF()
      .join(broadcast(sketches.toDF().select(col("source"), col("bloom"))), "source")
      .withColumn("n_present",
        SketchFunctions.bloomCountContainedTokens(Keys.DefaultK0, Keys.DefaultK1)(
          col("bloom"), col("tokens")))
      .select(col("doc_id"), col("source"), col("n_tok"), col("n_present"))
  }
}
