package graft.tools

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a named subset of the declared query
  * surface into `plans/r07/<query>_<suffix>.txt` — the optimization round's
  * before/after plan evidence (guide §1: capture the plan shape for every
  * query you touch).
  *
  * Usage: `sbt "runMain graft.tools.PlanDump <suffix> [query ...]"`
  * with no query args, dumps the round's default target list.
  *
  * Queries that materialize internally (collect + LocalRelation result)
  * still show their internal distributed plan in the jobs they run; for
  * those the dumped text of the RETURNED frame is a LocalRelation and the
  * interesting evidence is the inner build — `q_source_overlap` dumps the
  * lazy inner frame via [[graft.PipelineQueries.sourceOverlapMatrixLazy]].
  */
object PlanDump {

  val DefaultTargets: Seq[String] = Seq(
    "q_bloom_probe_exact", "q_bloom128_probe_exact", "q_fused_native_probe_exact",
    "q_salted_build_equiv", "q_sketchjob_resume_probe_exact",
    "q_streaming_bloom_windows", "q_streaming_append_latedrop",
    "q_source_overlap", "q_minhash_lsh_dups", "q_dedup_clusters",
    "q_bigram_heavyhitters", "q_winnow_fingerprints")

  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val targets = if (args.length > 1) args.drop(1).toSeq else DefaultTargets
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new File("plans/r07")
    outDir.mkdirs()
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val text =
        try {
          // q_source_overlap's public query returns a LocalRelation (it
          // materializes internally); dump the lazy inner frame instead
          val df =
            if (name == "q_source_overlap")
              graft.PipelineQueries.sourceOverlapMatrixLazy(spark, dir)
            else fn(spark, dir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch {
          case e: Throwable => s"PLAN DUMP FAILED: ${e.getClass.getName}: ${e.getMessage}"
        }
      val f = new File(outDir, s"${name}_$suffix.txt")
      val w = new PrintWriter(f, "UTF-8")
      try w.println(text) finally w.close()
      println(s"[plandump] wrote $f")
    }
    spark.stop()
  }
}
