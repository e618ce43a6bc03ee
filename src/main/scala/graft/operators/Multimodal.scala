package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column pipeline: media as opaque `binary` columns with typed
  * metadata, decoded in partition-sized batches.
  *
  * The decode step is REAL (round 2; it was a stub in round 1):
  *  - images are actual PNGs decoded with `javax.imageio` (JDK built-in —
  *    width/height/mean intensity come from decoded pixels);
  *  - audio is actual WAV/PCM decoded with `javax.sound.sampled`;
  *  - video is a length-prefixed container of PNG frames ("GFTV"), each
  *    frame decoded with ImageIO (the frame-sampling path).
  *
  * The synthetic generator writes REAL encoded payloads whose decoded
  * features are simple closed-form functions of `media_id` — which is what
  * lets a DuckDB oracle check the whole decode pipeline end-to-end: if any
  * encode/decode step is wrong, the aggregated features stop matching the
  * closed form.
  *
  * Scale shape: generation and decode are map-side (`mapPartitions`) with
  * per-batch decoder invocation — the Scala analogue of a `mapInPandas`
  * batch — and the only shuffle is the final (source, media_type) rollup.
  */
object Multimodal {

  /** Media row: opaque payload + type tag + source-side metadata. */
  final case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte], source: String)

  /** Decoded features. `width`/`height` are 0 for audio. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      mean_intensity: Double,
      frames_sampled: Int,
      source: String)

  // ---- deterministic media parameters (closed-form, SQL-expressible; the
  //      DuckDB oracle recomputes exactly these) ----
  def typeOf(id: Long): String = (id % 3) match {
    case 0 => "image"; case 1 => "audio"; case _ => "video"
  }
  def sourceOf(id: Long): String = s"src${id % 4}"
  def widthOf(id: Long): Int = 16 + (id % 13).toInt
  def heightOf(id: Long): Int = 16 + (id % 7).toInt
  def grayOf(id: Long): Int = (id % 256).toInt
  def framesOf(id: Long): Int = 1 + (id % 5).toInt
  def samplesOf(id: Long): Int = 64 + (id % 97).toInt

  // ------------------------------------------------------------ encoders

  /** Real PNG: w x h 8-bit grayscale, every pixel = `gray`. */
  def encodePng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", out), "JDK PNG writer unavailable")
    out.toByteArray
  }

  /** Real WAV: 8-bit unsigned PCM mono 8 kHz, n samples all = `value`. */
  def encodeWav(n: Int, value: Int): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val samples = Array.fill[Byte](n)(value.toByte)
    val ais = new AudioInputStream(new ByteArrayInputStream(samples), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private val VideoMagic = 0x47465456 // "GFTV"

  /** Frame container: magic, frame count, then (length, PNG bytes) per
    * frame — every frame is a real PNG. */
  def encodeVideo(frames: Int, w: Int, h: Int, gray: Int): Array[Byte] = {
    val png = encodePng(w, h, gray) // identical frames: encode once, repeat
    val out = ByteBuffer.allocate(8 + frames * (4 + png.length))
    out.putInt(VideoMagic)
    out.putInt(frames)
    var i = 0
    while (i < frames) { out.putInt(png.length); out.put(png); i += 1 }
    out.array()
  }

  def payloadOf(id: Long): Array[Byte] = typeOf(id) match {
    case "image" => encodePng(widthOf(id), heightOf(id), grayOf(id))
    case "audio" => encodeWav(samplesOf(id), grayOf(id))
    case _ => encodeVideo(framesOf(id), widthOf(id), heightOf(id), grayOf(id))
  }

  /** Deterministic synthetic media table with REAL encoded payloads.
    * Generation is map-side over `spark.range` (scales with partitions). */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int): Dataset[MediaRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    spark.range(0, n, 1, partitions).map { id =>
      MediaRow(id, typeOf(id), payloadOf(id), sourceOf(id))
    }
  }

  // ------------------------------------------------------------ decoders

  /** Decode one PNG; returns (width, height, mean gray sample). */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, sum.toDouble / (w.toLong * h))
  }

  /** Decode a WAV; returns mean unsigned sample value. */
  def decodeAudio(bytes: Array[Byte]): Double = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val data = ais.readAllBytes()
      require(data.nonEmpty, "empty audio payload")
      var sum = 0L
      var i = 0
      while (i < data.length) { sum += data(i) & 0xff; i += 1 }
      sum.toDouble / data.length
    } finally ais.close()
  }

  /** Decode the frame container; returns (width, height, mean intensity
    * over all sampled frames, frames decoded). */
  def decodeVideo(bytes: Array[Byte]): (Int, Int, Double, Int) = {
    val bb = ByteBuffer.wrap(bytes)
    require(bb.getInt() == VideoMagic, "bad video magic")
    val frames = bb.getInt()
    require(frames > 0, "empty video")
    var w = 0; var h = 0
    var sum = 0.0
    var i = 0
    while (i < frames) {
      val len = bb.getInt()
      val png = new Array[Byte](len)
      bb.get(png)
      val (fw, fh, mean) = decodeImage(png)
      if (i == 0) { w = fw; h = fh }
      sum += mean
      i += 1
    }
    (w, h, sum / frames, frames)
  }

  def decodeOne(row: MediaRow): MediaFeatures = row.media_type match {
    case "image" =>
      val (w, h, mean) = decodeImage(row.payload)
      MediaFeatures(row.media_id, row.media_type, row.payload.length, w, h, mean, 1, row.source)
    case "audio" =>
      val mean = decodeAudio(row.payload)
      MediaFeatures(row.media_id, row.media_type, row.payload.length, 0, 0, mean, 1, row.source)
    case "video" =>
      val (w, h, mean, frames) = decodeVideo(row.payload)
      MediaFeatures(row.media_id, row.media_type, row.payload.length, w, h, mean, frames, row.source)
    case other => throw new IllegalArgumentException(s"unknown media_type $other")
  }

  /** Batch decoder — receives the WHOLE batch (the contract a vectorized
    * codec/model consumes; a GPU decoder would process `batch` in one go). */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map(decodeOne)

  /** Batched feature extraction: one decoder invocation PER BATCH per
    * partition (the mapInPandas batch shape); per-task init slot before
    * the loop. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition init slot (a real codec/model would be opened here,
      // once per task, and shared across batches)
      rows.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  /** Per-(source, media_type) rollup of DECODED features. Every aggregated
    * column except `total_bytes` is integer-exact and reproducible in
    * closed form from media_id — the oracle contract. */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("source"), col("media_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        sum(col("width")).cast("long").as("total_width"),
        sum(col("height")).cast("long").as("total_height"),
        sum(col("frames_sampled")).cast("long").as("total_frames"),
        // decoded mean intensity is an exact integer (constant-intensity
        // fixtures); cast BEFORE summing for cross-engine portability
        sum(col("mean_intensity").cast("long")).as("sum_intensity"))
}
