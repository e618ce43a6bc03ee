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
    spark.stop()
  }
}
