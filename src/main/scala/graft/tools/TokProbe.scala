package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round diagnostic (guide §1.4): cost of ONE evaluation of
  * the fixture tokenization vs the explode pipeline that evaluates it
  * repeatedly (filter-inference + projection substitution), and an
  * explode_outer variant that evaluates it once. */
object TokProbe {
  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val a = body
    println(f"[tokprobe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-tok-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.sources.Tokens.table(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    noop(t)
    time("tokens once (noop full table)")(noop(t))
    time("tokens once again")(noop(t))
    val ex = t.select(col("source"), explode(col("tokens")).as("token"))
    noop(ex)
    time("explode(tokens) [dup evals]")(noop(ex))
    val exOuter = t.select(col("source"), explode_outer(col("tokens")).as("token"))
      .where(col("token").isNotNull)
    noop(exOuter)
    time("explode_outer + notnull [1 eval]")(noop(exOuter))
    println(ex.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Filter") || l.contains("Generate") || l.contains("Project"))
      .map(_.take(120)).mkString("[tokprobe] plan explode:\n", "\n", ""))
    spark.stop()
  }
}
