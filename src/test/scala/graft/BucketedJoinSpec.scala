package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the storage-layout half of the scale
  * story: two tables bucketed by the join key join WITHOUT any shuffle
  * exchange (each bucket pair is joined in place). At 100 TB this is the
  * difference between a full-table shuffle per join and none; the sketch
  * checkpoint tables (per-bucket partials) and the token corpus are the
  * natural bucketed candidates. Plan-asserted here.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucketed-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${java.util.UUID.randomUUID}")
    // force a sort-merge join so the exchange-elision is what's tested
    // (a broadcast join would hide whether bucketing removed the shuffle)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps the physical plan in AdaptiveSparkPlanExec, whose inner
    // plan is not reachable via TreeNode.collect — disable it so the
    // exchange assertions inspect the real operators (the control
    // assertion below proves the assertions are not vacuous)
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("join of two tables bucketed on the key runs with zero shuffle exchanges") {
    import spark.implicits._
    val left = (0L until 2000L).map(i => (i, s"doc-$i")).toDF("doc_id", "payload")
    val right = (0L until 2000L by 2L).map(i => (i, i * 10)).toDF("doc_id", "score")
    left.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_bucketed_left")
    right.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_bucketed_right")

    val joined = spark.table("graft_bucketed_left")
      .join(spark.table("graft_bucketed_right"), "doc_id")
    assert(joined.count() === 1000L)

    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed join must not shuffle; found ${exchanges.size} exchange(s) in:\n" +
        joined.queryExecution.executedPlan)

    // contrast: the same join over unbucketed data shuffles both sides
    val unbucketed = left.join(right, "doc_id")
    val unbucketedExchanges = unbucketed.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(unbucketedExchanges.nonEmpty, "control: unbucketed SMJ should shuffle")
  }

  test("per-source sketch aggregation over a source-bucketed table needs no exchange") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import graft.operators.SketchAggs.BloomTokensAgg
    val t = sources.Tokens.synthetic(spark, numDocs = 4000, avgTokens = 8,
      vocabSize = 100, numSources = 8, partitions = 4)
    t.write.mode("overwrite").bucketBy(8, "source").saveAsTable("graft_bucketed_tokens")
    val agg = spark.table("graft_bucketed_tokens")
      .groupBy(col("source"))
      .agg(udaf(new BloomTokensAgg(SketchQueries.bloomCfg), ExpressionEncoder[Array[Int]]())(col("tokens"))
        .as("sketch"))
    assert(agg.count() === 8L)
    val exchanges = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"groupBy over the bucketing key must not shuffle; plan:\n${agg.queryExecution.executedPlan}")
  }
}
