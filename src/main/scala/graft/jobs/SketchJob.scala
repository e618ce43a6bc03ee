package graft.jobs

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core._
import graft.operators.SketchAggs._

/** Production-shape sketch-build job (north rule: "resumable from checkpoint
  * with per-partition lineage + metrics, salt-based skew mitigation").
  *
  * The input is bucketed deterministically by `doc_id` (SipHash — stable
  * across executors/JVMs/runs, so a bucket always contains the same docs;
  * the sandbox stand-in for Iceberg snapshot+partition lineage). Each run:
  *
  *   1. reads the checkpoint dir, determines which buckets already have
  *      committed partial sketches,
  *   2. aggregates ONLY the missing buckets into per-(bucket, source)
  *      partial sketch rows with lineage + metrics columns
  *      (rows/tokens/build wall-clock/commit timestamp),
  *   3. appends them to the checkpoint (bucket = the commit unit),
  *   4. `finalize` merges all partials per source — pure sketch merges,
  *      the same monoid the aggregation itself uses.
  *
  * Because merge is associative+commutative and buckets are disjoint,
  * resume-then-finalize is byte-identical to a single uninterrupted build
  * (tested in SketchJobSpec).
  *
  * The bucket level doubles as salt-based skew mitigation: a hot source is
  * split across all buckets, so no single task aggregates a whole hot
  * source — two-level aggregation (bucket,source) -> (source), the explicit
  * form of the salting SURVEY.md §4 calls for.
  */
object SketchJob {

  final case class JobConfig(
      k0: Long,
      k1: Long,
      bloomK: Int,
      bloomLog2l: Int,
      hllP: Int,
      cmsDepth: Int,
      cmsLog2Width: Int,
      numBuckets: Int) {
    def bloomCfg: BloomConfig = BloomConfig(k0, k1, bloomK, bloomLog2l)
    def cmsCfg: CmsConfig = CmsConfig(k0, k1, cmsDepth, cmsLog2Width)
  }

  val DefaultConfig: JobConfig = JobConfig(
    k0 = graft.SketchQueries.K0, k1 = graft.SketchQueries.K1,
    bloomK = 3, bloomLog2l = 12, hllP = 12, cmsDepth = 5, cmsLog2Width = 11,
    numBuckets = 64)

  /** Deterministic bucket id from doc_id via the NATIVE SipHash expression
    * (codegen, no UDF encoder boundary). Same value as the previous UDF:
    * `(hashString(coalesce(doc_id, "")) >>> 1) % buckets` — the shifted hash
    * is non-negative, so `%` == `pmod`. Requires expressions registered on
    * the session (runIncrement does). */
  private def bucketCol(k0: Long, k1: Long, buckets: Int) =
    (shiftrightunsigned(
      graft.plans.GraftFunctions.sipHash64(coalesce(col("doc_id"), lit("")), k0, k1), 1)
      % buckets).cast("int")

  /** Run directories with a completed (_SUCCESS-marked) parquet commit.
    * Each runIncrement writes its own run dir, so commits are atomic at
    * run granularity: a crashed run leaves no _SUCCESS and is ignored
    * entirely on resume (no partially-visible buckets). Hadoop FS APIs so
    * checkpoints can live on HDFS/S3, not only the local FS. */
  private def committedRunDirs(spark: SparkSession, ckptDir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(ckptDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else
      fs.listStatus(path).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("run_"))
        .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .map(_.getPath.toString)
  }

  /** All committed partial-sketch rows across run dirs. */
  private def committedPartials(spark: SparkSession, ckptDir: String): Option[org.apache.spark.sql.DataFrame] = {
    val dirs = committedRunDirs(spark, ckptDir)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Buckets already committed to the checkpoint. */
  def committedBuckets(spark: SparkSession, ckptDir: String): Set[Int] =
    committedPartials(spark, ckptDir)
      .map(_.select("bucket").distinct().collect().map(_.getInt(0)).toSet)
      .getOrElse(Set.empty)

  /** Run one (resumable) pass: aggregate partial sketches for every bucket
    * not yet in the checkpoint. Returns the number of buckets processed. */
  def runIncrement(spark: SparkSession, tokens: DataFrame, ckptDir: String,
      cfg: JobConfig = DefaultConfig,
      failAfterBuckets: Option[Int] = None): Int = {
    graft.plans.GraftFunctions.registerExpressions(spark)
    val done = committedBuckets(spark, ckptDir)
    val tokensEnc = ExpressionEncoder[Array[Int]]()
    val bloomU = udaf(new BloomTokensAgg(cfg.bloomCfg), tokensEnc)
    val hllU = udaf(new HllTokensAgg(cfg.k0, cfg.k1, cfg.hllP), tokensEnc)
    val cmsU = udaf(new CmsTokensAgg(cfg.cmsCfg), tokensEnc)

    val withBucket = tokens.withColumn("bucket", bucketCol(cfg.k0, cfg.k1, cfg.numBuckets))
    val todoAll = (0 until cfg.numBuckets).filterNot(done)
    // simulate a mid-job crash for resume tests: only commit a prefix
    val todo = failAfterBuckets.fold(todoAll)(n => todoAll.take(n))
    if (todo.isEmpty) return 0

    val t0 = System.currentTimeMillis()
    val partials = withBucket
      .where(col("bucket").isin(todo: _*))
      .groupBy(col("bucket"), col("source"))
      .agg(
        bloomU(col("tokens")).as("bloom"),
        hllU(col("tokens")).as("hll"),
        cmsU(col("tokens")).as("cms"),
        count(lit(1)).as("n_rows"),
        sum(col("n_tok")).cast("long").as("n_tokens"))
      .withColumn("committed_at_ms", lit(t0))
      .withColumn("build_host", lit(java.net.InetAddress.getLocalHost.getHostName))
    // fresh run dir per increment: the parquet job writes _SUCCESS only on
    // full commit, so a crash mid-run leaves an ignorable junk dir instead
    // of partially-visible buckets in a shared append
    partials.write.mode(SaveMode.ErrorIfExists).parquet(s"$ckptDir/run_${t0}_${todo.min}")
    todo.size
  }

  /** Merge the checkpointed per-(bucket,source) partials into final
    * per-source sketches (plus rolled-up lineage metrics). */
  def finalizeSketches(spark: SparkSession, ckptDir: String,
      cfg: JobConfig = DefaultConfig): DataFrame = {
    val binEnc = ExpressionEncoder[Array[Byte]]()
    val bloomMergeU = udaf(new BloomMergeAgg(cfg.k0, cfg.k1), binEnc)
    val hllMergeU = udaf(new HllBytesMergeAgg(), binEnc)
    val cmsMergeU = udaf(new CmsBytesMergeAgg(), binEnc)
    committedPartials(spark, ckptDir)
      .getOrElse(throw new IllegalStateException(s"no committed runs under $ckptDir"))
      .groupBy(col("source"))
      .agg(
        bloomMergeU(col("bloom")).as("bloom"),
        hllMergeU(col("hll")).as("hll"),
        cmsMergeU(col("cms")).as("cms"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("bucket")).as("n_buckets"))
  }

  /** Per-bucket lineage view (what resumed, when, how much). */
  def lineage(spark: SparkSession, ckptDir: String): DataFrame =
    committedPartials(spark, ckptDir)
      .getOrElse(throw new IllegalStateException(s"no committed runs under $ckptDir"))
      .groupBy(col("bucket"))
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("committed_at_ms")).as("committed_at_ms"),
        first(col("build_host")).as("build_host"))
      .orderBy(col("bucket"))
}

/** Merge aggregators over already-serialized HLL / CMS sketch bytes
  * (second-level aggregation; the Bloom analogue lives in SketchAggs). */
final class HllBytesMergeAgg extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  import org.apache.spark.sql.{Encoder, Encoders}
  private def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val (p1, r1, tag1, kh1) = Hll.fromBytesFull(a)
    val (p2, r2, tag2, kh2) = Hll.fromBytesFull(b)
    require(p1 == p2 && tag1 == tag2, s"HLL merge: precision/type mismatch ($p1/$tag1 vs $p2/$tag2)")
    require(kh1 == kh2, "HLL merge: sketches built under different SipHash keys")
    Hll.toBytes(Hll.merge(r1, r2), p1, tag1, kh1)
  }
  def zero: Array[Byte] = Array.emptyByteArray
  def reduce(b: Array[Byte], x: Array[Byte]): Array[Byte] = mergeBytes(b, x)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeBytes(a, b)
  def finish(b: Array[Byte]): Array[Byte] = b
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

final class CmsBytesMergeAgg()
    extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  import org.apache.spark.sql.{Encoder, Encoders}
  private def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val (d1, w1, c1, tag1, kh1) = CountMin.fromBytesFull(a)
    val (d2, w2, c2, tag2, kh2) = CountMin.fromBytesFull(b)
    require(d1 == d2 && w1 == w2 && tag1 == tag2, "CMS merge: shape/type mismatch")
    require(kh1 == kh2, "CMS merge: sketches built under different SipHash keys")
    // stamp the INPUT sketches' key hash (merging under config defaults
    // would silently relabel the key, defeating the cross-key rejection)
    CountMin.toBytesWithKeyHash(CountMin.merge(c1, c2), d1, w1, tag1, kh1)
  }
  def zero: Array[Byte] = Array.emptyByteArray
  def reduce(b: Array[Byte], x: Array[Byte]): Array[Byte] = mergeBytes(b, x)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeBytes(a, b)
  def finish(b: Array[Byte]): Array[Byte] = b
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
