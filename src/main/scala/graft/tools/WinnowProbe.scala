package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dump per-doc winnowing fingerprints (and the overlap pair
  * set) for cross-engine diffing against the DuckDB oracle recomputation.
  * Usage: runMain graft.tools.WinnowProbe <sfDir> <outParquet> */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, out) = args
    val spark = SparkSession.builder()
      .appName("winnow-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val fp = graft.operators.TextPipeline.withWinnowFingerprints(docs)
      .select(col("doc_id"), col("source"), col("fps"))
    fp.select(col("doc_id"), array_sort(col("fps")).as("fps"))
      .coalesce(1).write.mode("overwrite").parquet(out)
    val ex = fp.select(col("doc_id"), col("source"), explode(col("fps")).as("fp"))
    val exA = ex.select(col("doc_id").as("da"), col("source").as("sa"), col("fp").as("fpa"))
    val exB = ex.select(col("doc_id").as("db"), col("fp").as("fpb"))
    exA.join(exB, col("fpa") === col("fpb") && col("da") < col("db"))
      .groupBy(col("sa"), col("da"), col("db"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 2)
      .coalesce(1).write.mode("overwrite").parquet(out + "_pairs")
    spark.stop()
  }
}
