package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.BloomConfig
import graft.operators.Decontamination
import graft.sources.Tokens

/** Decontamination kernel measurement (the SrpProbe/WinnowProbe pattern):
  * (a) gram construction head-to-head — imperative-kernel UDF vs the
  * value-identical pure-HOF expression pipeline — on the deterministic
  * synthetic token corpus; (b) the full decontaminate operator timed
  * end-to-end against a ~0.1% relabeled eval slice (the realistic shape:
  * tiny eval set, huge train side, near-zero true hit rate, the Bloom
  * prefilter carrying the selectivity).
  * Usage: runMain graft.tools.DeconProbe [nDocs] [cpus] */
object DeconProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 500000L
    val cpus = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .appName("decon-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/tmp/graft_decon_probe_$nDocs.parquet"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      Tokens.synthetic(spark, nDocs, avgTokens = 64, vocabSize = 50000,
        numSources = 16, partitions = cpus * 4)
        .write.mode("overwrite").parquet(path)
    }
    val t = spark.read.parquet(path)
    def lap(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val total = df.agg(count(col("gram"))).head().getLong(0)
      (total, (System.nanoTime() - t0) / 1e9)
    }
    (1 to 3).foreach { i =>
      val (tU, sU) = lap(Decontamination.gramRows(t, 4))
      val (tH, sH) = lap(Decontamination.gramRowsHof(t, 4))
      println(f"[decon-probe] gram lap $i: udf $sU%.3f s, hof $sH%.3f s, " +
        f"totals udf=$tU hof=$tH ${if (tU == tH) "EQUAL" else "MISMATCH"}")
    }
    // full operator: relabel a deterministic ~1/1024 slice as the eval set
    graft.plans.GraftFunctions.register(spark)
    val relabeled = t.withColumn("source",
      when(graft.plans.GraftFunctions.sipHash64(col("doc_id")) % 1024 === 0,
        lit("evalset")).otherwise(col("source")))
    val cfg = BloomConfig(graft.SketchQueries.K0, graft.SketchQueries.K1, k = 3, log2l = 17)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val rep = Decontamination.decontaminate(relabeled, "evalset", 4, cfg)
        .agg(sum(col("n_docs")), sum(col("n_contam_docs")), sum(col("n_hits"))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[decon-probe] decontaminate lap $i: $sec%.3f s, " +
        s"train_docs=${rep.getLong(0)}, contam_docs=${rep.getLong(1)}, hits=${rep.getLong(2)}")
    }
    spark.stop()
  }
}
