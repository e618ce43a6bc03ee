package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Stage-level timing of the SRP-LSH pipeline (perf diagnosis harness). */
object SrpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cosineCols resolves graft_cosine_sim by name — register once up front
    graft.plans.GraftFunctions.registerExpressions(spark)
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[srp] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      a
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val banded = time("band") {
        val chunkUdf = udf(new Similarity.SrpChunkerPublic(32, 8, 4))
        emb.select(col("vec_id").as("id"), posexplode(chunkUdf(col("embedding"))).as(Seq("band", "key")))
          .persist()
      }
      time("band.count")(println("  banded rows: " + banded.count()))
      val cands = time("bucket self-join + distinct") {
        val c = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().persist()
        println("  candidates: " + c.count())
        c
      }
      val e = emb.select(col("vec_id").as("id"), col("embedding").as("emb"))
      time("verify join + cosine") {
        val v = cands
          .join(e.withColumnRenamed("id", "id_a").withColumnRenamed("emb", "emb_a"), "id_a")
          .join(e.withColumnRenamed("id", "id_b").withColumnRenamed("emb", "emb_b"), "id_b")
          .withColumn("cos", Similarity.cosineCols(col("emb_a"), col("emb_b")))
          .where(col("cos") >= 0.6)
        println("  verified pairs: " + v.count())
      }
      time("full srpNearDups")(
        println("  pairs: " + Similarity.srpNearDups(emb, "vec_id", "embedding", 32, 8, 0.6).count()))
      banded.unpersist(); cands.unpersist()
    }

    // ---- banding-kernel head-to-head at scale: SrpChunker UDF vs the native
    // graft_srp_bands expression (round-3 VERDICT #8: "measure first").
    // The sf embedding fixtures are thousands of rows — far too small to see
    // the per-row encoder-copy cost — so this phase synthesizes
    // SPARK_SRP_PROBE_VECS (default 2M) dim-64 vectors deterministically.
    val nVecs = sys.env.getOrElse("SPARK_SRP_PROBE_VECS", "2000000").toLong
    val dim = 64
    val genUdf = udf { (id: Long) =>
      Array.tabulate(dim) { j =>
        val h = graft.core.SipHash.hashLong(0x5eedL, id, j.toLong)
        ((h & 0xffff).toFloat / 0xffff - 0.5f)
      }
    }
    val big = spark.range(0, nVecs, 1, 32)
      .select(col("id"), genUdf(col("id")).as("emb"))
      .persist()
    big.count() // materialize the input once so both paths read cached rows
    val chunkUdf = udf(new Similarity.SrpChunkerPublic(64, 8, 8))
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(element_at(col("bands"), 1).cast("long"))).head().getLong(0)
    for (round <- 1 to 3) {
      println(s"--- banding kernel round $round ($nVecs vecs, dim $dim, b=64, chunks=8) ---")
      val u = time("udf banding")(agg(big.select(chunkUdf(col("emb")).as("bands"))))
      val n = time("native banding")(agg(
        big.select(graft.plans.VectorFunctions.srpBands(col("emb"), 64, 8).as("bands"))))
      require(u == n, s"udf/native band checksum mismatch: $u vs $n")
    }
    // ---- IVF-assignment boundary probe (round-4 VERDICT #4): ivfBuild's
    // final full-table pass assigns each vector to its nearest of 16
    // centroids through a per-row UDF. Same question as the text kernels:
    // does the UDF encoder boundary dominate (nativize) or the kernel
    // (numClusters x dim multiply-adds — record and keep the UDF)?
    // boundary-only twin: the SAME Array[Float] crosses the SAME encoder,
    // trivial body.
    val centroids = Array.tabulate(16) { c =>
      Array.tabulate(dim) { j =>
        val h = graft.core.SipHash.hashLong(0xce27L, c.toLong, j.toLong)
        ((h & 0xffff).toFloat / 0xffff - 0.5f)
      }
    }
    val assignUdf = udf(new Similarity.NearestClusterFn(centroids))
    val vecBoundaryUdf = udf { (e: Array[Float]) => e.length }
    for (round <- 1 to 3) {
      println(s"--- ivf assign round $round ($nVecs vecs, dim $dim, 16 centroids) ---")
      val uSum = time("ivf assign udf")(
        big.select(sum(assignUdf(col("emb")).cast("long"))).head().getLong(0))
      time("vector boundary-only udf")(
        big.select(sum(vecBoundaryUdf(col("emb")).cast("long"))).head())
      val nSum = time("native ivf assign")(
        big.select(sum(graft.plans.VectorFunctions.ivfAssign(col("emb"), centroids)
          .cast("long"))).head().getLong(0))
      require(uSum == nSum, s"udf/native assignment checksum mismatch: $uSum vs $nSum")
    }
    big.unpersist()

    // ---- text-kernel boundary probe: is the MinHash-signature UDF's cost
    // the KERNEL (shingling + 128 minhash per doc) or the UDF encoder
    // boundary? Compare the real signature UDF against a boundary-only UDF
    // (same String argument crossing the same encoder, trivial body). If
    // the boundary-only lap is a small fraction, converting the text
    // kernels to native expressions buys nothing (contrast: banding above,
    // where the boundary WAS the cost).
    val nDocs = sys.env.getOrElse("SPARK_SRP_PROBE_DOCS", "200000").toLong
    val texts = graft.Bench.lshStressCorpus(spark, nDocs, 32).persist()
    texts.count()
    val sigUdf = udf { (t: String) =>
      val words = t.split(' ').filter(_.nonEmpty)
      graft.core.MinHash.signature(graft.core.Keys.DefaultK0, graft.core.Keys.DefaultK1,
        graft.core.MinHash.wordShingles(words, 3), 128)
    }
    val boundaryUdf = udf { (t: String) => t.length }
    for (round <- 1 to 3) {
      println(s"--- text kernel round $round ($nDocs docs) ---")
      // pmod keeps the consuming sum from overflowing (signature components
      // span the full 64-bit range)
      time("minhash signature udf")(
        texts.select(sum(pmod(element_at(sigUdf(col("text")), 1), lit(1000000L)))).head())
      time("boundary-only udf")(
        texts.select(sum(boundaryUdf(col("text")).cast("long"))).head())
    }
    texts.unpersist()
    spark.stop()
  }
}
