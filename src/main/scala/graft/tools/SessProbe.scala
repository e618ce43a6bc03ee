package graft.tools
import org.apache.spark.sql.SparkSession

/** Steady-state timing of the streaming replay gates (perf diagnosis
  * harness, the SrpProbe pattern): each gate constructs a fresh streaming
  * query per call, so repeated laps separate JIT/state-store warm-up and
  * co-tenant noise from the real per-gate cost. Round-5 measurements
  * (sf0.1, local[32], quiet window): trending 3.5-4.8 s, session KMV
  * 6.3-8.4 s, bloom windows 5.2-7.0 s warm — the bench's query-phase
  * numbers for these gates are upper bounds that inflate under co-tenant
  * bursts (visible in the artifact's cotenancy arrays). */
object SessProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](l: String)(b: => A): A = { val t0=System.nanoTime(); val a=b; println(f"[sess] $l%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); a }
    val dir = "/root/testdata/sf0.1"
    for (r <- 1 to 3) {
      time(s"r$r trending")(graft.streaming.StreamingSketch.replayTrendingTokens(spark, dir).count())
      time(s"r$r session_kmv")(graft.streaming.StreamingSketch.replaySessionKmv(spark, dir,
        graft.SketchQueries.K0, graft.SketchQueries.K1, graft.SketchQueries.kmvK).count())
      time(s"r$r bloom_windows")(graft.streaming.StreamingSketch.replayBloomWindows(spark, dir,
        graft.SketchQueries.bloomCfg, graft.SketchQueries.hllP).count())
    }
    spark.stop()
  }
}
