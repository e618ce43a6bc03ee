package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of the flagship queries for plan-shape
  * review (pushdown, pruning, codegen spans, shuffle count). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"========== $name ==========")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    show("perSourceBloom(tokens)", graft.SketchQueries.perSourceBloom(graft.sources.Tokens.table(spark, dir)))
    show("bloomProbeExact", graft.SketchQueries.bloomProbeExact(spark, dir))
    show("tokenCountExact", graft.SketchQueries.tokenCountExact(spark, dir))
    // round-2 additions: the LSH pipelines, the runtime-filter join, and
    // the stored-IVF search (partition-pruning evidence)
    locally {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("string").as("doc_id"), col("text"))
      show("minHashNearDups", graft.operators.TextPipeline.minHashNearDups(
        docs, "doc_id", "text", shingleN = 3, numHashes = 128, bands = 32, threshold = 0.8))
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      show("srpNearDups(b=64, 8x8-bit)", graft.operators.Similarity.srpNearDups(
        emb, "vec_id", "embedding", b = 64, chunks = 8, threshold = 0.9))
      // the public query materializes + unpersists internally (cache-release
      // gate), so capture the underlying distributed plan via the Lazy split
      val (bjlPlan, bjlBuild) = graft.SketchQueries.bloomJoinLineitemLazy(spark,
        spark.read.parquet(s"$dir/orders.parquet"),
        spark.read.parquet(s"$dir/lineitem.parquet"))
      show("bloomJoinLineitem (lazy inner plan)", bjlPlan)
      bjlBuild.unpersist()
      val index = graft.operators.Similarity.ivfBuild(
        emb.where(col("vec_id") =!= 0), "vec_id", "embedding", numClusters = 16)
      val store = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_plancheck"
      graft.operators.Similarity.ivfWrite(index, store)
      val loaded = graft.operators.Similarity.ivfLoad(spark, store)
      val query = emb.where(col("vec_id") === 0)
        .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
      show("ivfSearch(stored, nProbe=4)", graft.operators.Similarity.ivfSearch(loaded, query, 10, 4))
    }
    // round-3 additions: salted two-level build and the KMV estimate path
    show("saltedBuildEquiv", graft.SketchQueries.saltedBuildEquiv(spark, dir))
    show("kmvIntersectBound", graft.SketchQueries.kmvIntersectBound(spark, dir))
    // round-4 addition: the bottom-k sample gate (partial-agg monoid +
    // native sample reader + serialized merge level)
    show("sampleBottomK", graft.SketchQueries.sampleBottomK(spark, dir))
    // round-5 additions: the weighted (ES) sample and the mixture
    // accounting frame (the dedup-clusters query materializes internally,
    // so its per-round shape is documented in TextPipeline scaladoc)
    show("sampleWeighted", graft.SketchQueries.sampleWeighted(spark, dir))
    show("sketchRollup", graft.SketchQueries.sketchRollup(spark, dir))
    show("embeddingNearDups", graft.PipelineQueries.embeddingNearDups(spark, dir))
    show("winnowFps", graft.operators.TextPipeline.withWinnowFingerprints(
      spark.read.parquet(s"$dir/documents.parquet")))
    show("samplingFrame", graft.PipelineQueries.samplingFramePlan(spark, dir))
    // round-5 additions: decontamination (Bloom prefilter + broadcast
    // semi-join; the public query materializes internally, so capture the
    // lazy split) and the bigram MG gate
    locally {
      val (decon, evalGrams) = graft.operators.Decontamination.decontaminateLazy(
        graft.sources.Tokens.table(spark, dir), "src0", 4, graft.SketchQueries.bloomCfg)
      show("ngramContamination (lazy inner plan)", decon)
      evalGrams.unpersist()
    }
    show("bigramHeavyHitters", graft.SketchQueries.bigramHeavyHitters(spark, dir))
    show("seqPacking", graft.PipelineQueries.seqPacking(spark, dir))
    show("mixtureSelect", graft.PipelineQueries.mixtureSelect(spark, dir))
    // round-6 additions: packed sequence content (same single range
    // exchange as the assignment), the ES-weighted budget scan, and the
    // BPE merge-application projection
    show("seqPackContent", graft.PipelineQueries.seqPackContent(spark, dir))
    show("mixtureSelectWeighted", graft.PipelineQueries.mixtureSelectWeighted(spark, dir))
    show("bpeTokenize", graft.PipelineQueries.bpeTokenize(spark, dir))
    show("textToSequences", graft.PipelineQueries.textToSequences(spark, dir))
    show("piiRedact", graft.PipelineQueries.piiRedact(spark, dir))
    spark.stop()
  }
}
