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
      .select(col("doc_id"), col("source"), col("fps")).persist()
    try {
      fp.select(col("doc_id"), array_sort(col("fps")).as("fps"))
        .coalesce(1).write.mode("overwrite").parquet(out)
      // the SAME pair operator the production query runs — shared helper,
      // so the probe can never validate stale semantics
      graft.operators.TextPipeline.winnowOverlapPairs(fp, "doc_id", "source")
        .coalesce(1).write.mode("overwrite").parquet(out + "_pairs")
    } finally fp.unpersist()
    spark.stop()
  }
}
