package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch diagnostic: IVF recall@10 at nProbe=4/16 vs Lloyd iteration
  * count on the sf0.01 embeddings fixture. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val query = emb.where(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val candidates = emb.where(col("vec_id") =!= 0).cache()
    val exact = Similarity.bruteForceTopK(candidates, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    for (iters <- Seq(0, 2, 4, 8, 12)) {
      val index = Similarity.ivfBuild(candidates, "vec_id", "embedding", 16, lloydIters = iters)
      index.indexed.persist()
      val r4 = Similarity.ivfSearch(index, query, 10, nProbe = 4)
        .collect().map(_.getLong(0)).count(exact.contains) / 10.0
      val r8 = Similarity.ivfSearch(index, query, 10, nProbe = 8)
        .collect().map(_.getLong(0)).count(exact.contains) / 10.0
      val sizes = index.indexed.groupBy("cluster").count().collect().map(_.getLong(1)).sorted
      index.indexed.unpersist()
      println(s"ITERS=$iters recall@10 nProbe4=$r4 nProbe8=$r8 clusterSizes=${sizes.mkString(",")}")
    }
    spark.stop()
  }
}
