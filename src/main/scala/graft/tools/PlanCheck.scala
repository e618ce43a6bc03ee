package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of the flagship queries for plan-shape
  * review (pushdown, pruning, codegen spans, shuffle count). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"========== $name ==========")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    show("perSourceBloom(tokens)", graft.SketchQueries.perSourceBloom(graft.sources.Tokens.table(spark, dir)))
    show("bloomProbeExact", graft.SketchQueries.bloomProbeExact(spark, dir))
    show("tokenCountExact", graft.SketchQueries.tokenCountExact(spark, dir))
    spark.stop()
  }
}
