package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.SipHash

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The DECODE STEP IS A STUB: real image/audio codecs are not in this
  * container, so `decodeStub` derives deterministic fake features from the
  * bytes (clearly marked). Everything around it — the schema, the typed
  * Dataset plumbing, `mapPartitions` batching (the Scala analogue of a
  * pandas-UDF `mapInPandas` batch shape), partition sizing — is real and
  * tested, so a real codec drops into `decodeStub`'s slot unchanged.
  */
object Multimodal {

  /** Media row: opaque payload + type tag + source-side metadata. */
  final case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte], source: String)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      mean_intensity: Double,
      frames_sampled: Int,
      source: String)

  /** Deterministic synthetic media table (payload bytes from SipHash). */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int): Dataset[MediaRow] = {
    import spark.implicits._
    val gen = udf { (id: Long) =>
      val len = 256 + ((SipHash.hashLong(7L, 9L, id) >>> 1) % 768L).toInt
      Array.tabulate[Byte](len)(j => (SipHash.hashLong(7L, 11L + j, id) & 0xff).toByte)
    }
    val typeOf = udf { (id: Long) =>
      Seq("image", "audio", "video")(((SipHash.hashLong(7L, 13L, id) >>> 1) % 3L).toInt)
    }
    spark.range(0, n, 1, partitions)
      .select(
        col("id").as("media_id"),
        typeOf(col("id")).as("media_type"),
        gen(col("id")).as("payload"),
        concat(lit("src"), (col("id") % 4).cast("string")).as("source"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake features derived from the payload.
    * A real implementation would decode the image/audio/video here; the
    * signature (bytes in, features out, pure function) is the contract. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    val h = SipHash.hash64(3L, 5L, bytes)
    val width = 16 + ((h >>> 3) & 0x3ff).toInt        // ??? real: decoded width
    val height = 16 + ((h >>> 13) & 0x3ff).toInt      // ??? real: decoded height
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val frames = row.media_type match {
      case "video" => 1 + ((h >>> 23) & 0x1f).toInt   // ??? real: frame sampling
      case _ => 1
    }
    MediaFeatures(row.media_id, row.media_type, bytes.length, width, height,
      sum.toDouble / math.max(1, bytes.length), frames, row.source)
  }

  /** STUB batch decoder — receives the WHOLE batch (the contract a real
    * vectorized codec/model consumes); currently maps the stub over it. */
  def decodeBatchStub(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map(decodeStub)

  /** Batched feature extraction: one decoder invocation PER BATCH per
    * partition (the mapInPandas batch shape — a real vectorized decoder
    * slots into decodeBatchStub; per-task init lives before the loop). */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition init slot (a real codec/model would be opened here,
      // once per task, and shared across batches)
      rows.grouped(batchSize).flatMap(decodeBatchStub)
    }
  }

  /** Per-(source, media_type) feature aggregates — the downstream shape a
    * training-data pipeline consumes. */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("source"), col("media_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        avg(col("mean_intensity")).as("avg_intensity"),
        sum(col("frames_sampled")).as("total_frames"))
}
