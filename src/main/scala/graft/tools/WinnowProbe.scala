package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dump per-doc winnowing fingerprints (and the overlap pair
  * set) for cross-engine diffing against the DuckDB oracle recomputation.
  * Usage: runMain graft.tools.WinnowProbe <sfDir> <outParquet> */
object WinnowProbe {

  /** Head-to-head kernel measurement (the SrpProbe pattern): HOF
    * expression pipeline vs imperative-kernel UDF on the deterministic
    * LSH stress corpus. Usage: runMain graft.tools.WinnowProbe bench
    * <nDocs> [cpus]. Prints per-lap seconds and the fingerprint totals
    * (which must be equal — value-identity riding the timing). */
  private def benchMode(nDocs: Long, cpus: Int): Unit = {
    val spark = SparkSession.builder()
      .appName("winnow-probe-bench").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/tmp/graft_winnow_probe_$nDocs.parquet"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      graft.Bench.lshStressCorpus(spark, nDocs, cpus * 4)
        .write.mode("overwrite").parquet(path)
    }
    val docs = spark.read.parquet(path)
    def lap(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val total = df.agg(sum(size(col("fps"))).cast("long")).head().getLong(0)
      (total, (System.nanoTime() - t0) / 1e9)
    }
    (1 to 3).foreach { i =>
      val (tU, sU) = lap(graft.operators.TextPipeline.withWinnowFingerprints(docs))
      val (tH, sH) = lap(graft.operators.TextPipeline.withWinnowFingerprintsHof(docs))
      println(f"[winnow-probe] lap $i: udf $sU%.3f s, hof $sH%.3f s, totals udf=$tU hof=$tH ${if (tU == tH) "EQUAL" else "MISMATCH"}")
    }
    spark.stop()
  }

  /** Hot-fingerprint stress (the df-cap evidence): every doc carries the
    * SAME boilerplate sentence (>= w + k - 1 shared words => >= 1 shared
    * fingerprint with df == nDocs) plus unique filler. The inverted-index
    * self-join is O(df^2) PER fingerprint, so uncapped candidate volume is
    * ~hotFps * nDocs^2/2 — the quadratic the maxDf cap exists to remove.
    * Prints both volumes (computed from the df histogram, not by running
    * the uncapped join) and times the CAPPED pair join end to end.
    * Usage: runMain graft.tools.WinnowProbe hotfp <nDocs> [cpus]. */
  private def hotFpMode(nDocs: Long, cpus: Int): Unit = {
    val spark = SparkSession.builder()
      .appName("winnow-probe-hotfp").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val boiler = "copyright header all rights reserved do not remove this notice ever"
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"), lit("src0").as("source"),
      concat_ws(" ",
        concat_ws(" ", transform(sequence(lit(1), lit(30)),
          i => format_string("u%d_%d", col("id"), i))),
        lit(boiler)).as("text"))
    val fp = graft.operators.TextPipeline.withWinnowFingerprints(docs)
      .select(col("doc_id"), col("source"), col("fps")).persist()
    try {
      val maxDf = 1000L
      val dfHist = fp.select(explode(col("fps")).as("f"))
        .groupBy(col("f")).agg(count(lit(1)).as("df"))
        .agg(
          max(col("df")).as("max_df"),
          sum(col("df") * (col("df") - 1) / 2).cast("long").as("vol_uncapped"),
          sum(when(col("df") <= maxDf, col("df") * (col("df") - 1) / 2).otherwise(0L))
            .cast("long").as("vol_capped"),
          count(when(col("df") > maxDf, lit(1))).as("n_hot_fps"))
        .head()
      val t0 = System.nanoTime()
      val pairs = graft.operators.TextPipeline
        .winnowOverlapPairs(fp, "doc_id", "source", minShared = 1, maxDf = maxDf)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[winnow-hotfp] docs=$nDocs max_df=${dfHist.getLong(0)} " +
        f"hot_fps=${dfHist.getLong(3)} candidate_volume_uncapped=${dfHist.getLong(1)} " +
        f"candidate_volume_capped=${dfHist.getLong(2)} capped_pairs=$pairs " +
        f"capped_join_sec=$sec%.2f")
    } finally fp.unpersist()
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("bench")) {
      benchMode(args(1).toLong, if (args.length > 2) args(2).toInt else 8)
      return
    }
    if (args.headOption.contains("hotfp")) {
      hotFpMode(args(1).toLong, if (args.length > 2) args(2).toInt else 8)
      return
    }
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
