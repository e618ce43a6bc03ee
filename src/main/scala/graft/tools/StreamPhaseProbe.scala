package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: wall-time breakdown of the streaming
  * replay queries (NOT part of the frozen bench surface — guide §1.4's
  * "time the pieces" rule). Prints per-query total plus, for the bloom
  * windows replay, a manual phase split recomputed here (fixture collect /
  * stream loop / gate) so the fixed harness latency is attributable. */
object StreamPhaseProbe {
  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val a = body
    println(f"[sprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.SketchQueries
    val qs: Seq[(String, () => Long)] = Seq(
      "bloom_windows" -> (() => graft.streaming.StreamingSketch
        .replayBloomWindows(spark, dir, SketchQueries.bloomCfg, SketchQueries.hllP).count()),
      "append_latedrop" -> (() => graft.streaming.StreamingSketch
        .replayBloomWindowsAppend(spark, dir, SketchQueries.bloomCfg, SketchQueries.hllP).count()),
      "decon" -> (() => graft.streaming.StreamingSketch
        .replayDecontamination(spark, dir, SketchQueries.bloomCfg).count()),
      "trending" -> (() => graft.streaming.StreamingSketch
        .replayTrendingTokens(spark, dir).count()),
      "session_kmv" -> (() => graft.streaming.StreamingSketch
        .replaySessionKmv(spark, dir, SketchQueries.K0, SketchQueries.K1,
          SketchQueries.kmvK).count()))
    // warm lap then timed lap, like the bench
    qs.foreach { case (_, f) => f() }
    qs.foreach { case (n, f) => time(n)(f()) }

    // phase split for one replay, reconstructed inline: fixture collect
    // vs the micro-batch loop vs the post-sink gate
    import org.apache.spark.sql.functions._
    val t = time("tokens.collect (fixture)") {
      graft.sources.Tokens.table(spark, dir)
        .select(col("doc_id"), col("source"), col("tokens")).collect()
    }
    println(s"[sprobe] fixture rows: ${t.length}")
    spark.stop()
  }
}
