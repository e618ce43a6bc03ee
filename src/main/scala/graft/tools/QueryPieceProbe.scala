package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round diagnostic: piecewise wall times inside the two
  * slowest non-streaming queries (embedding near-dups, source overlap) —
  * NOT part of the frozen bench surface. */
object QueryPieceProbe {
  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val a = body
    println(f"[qprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    a
  }

  /** Pure-JVM A/B of the BPE string kernel vs the compiled id kernel
    * (no Spark): same word stream, same merge table, ns/word. */
  private def bpeKernelAB(): Unit = {
    import graft.operators.Bpe
    val ranks = new java.util.HashMap[String, Integer]()
    Bpe.FixtureMerges.zipWithIndex.foreach { case ((a, b), r) =>
      ranks.put(a + " " + b, Integer.valueOf(r)) }
    val compiled = new Bpe.CompiledMerges(Bpe.FixtureMerges)
    val rnd = new scala.util.Random(41)
    val chars = "theinandorst"
    val words = Array.fill(200000)(
      (0 until 3 + rnd.nextInt(10)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    var sink = 0L
    def lapString(): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < words.length) { sink += Bpe.encodeWord(words(i), ranks).length; i += 1 }
      (System.nanoTime() - t0) / 1e3 / words.length
    }
    def lapCompiled(): Double = {
      val buf = new scala.collection.mutable.ArrayBuffer[String]()
      val t0 = System.nanoTime()
      var i = 0
      while (i < words.length) { buf.clear(); compiled.encodeInto(words(i), buf); sink += buf.length; i += 1 }
      (System.nanoTime() - t0) / 1e3 / words.length
    }
    // warm both, then 3 alternating laps each
    lapString(); lapCompiled(); lapString(); lapCompiled()
    val s = (0 until 3).map(_ => lapString())
    val c = (0 until 3).map(_ => lapCompiled())
    println(f"[qprobe] bpe kernel us/word: string=${s.min}%.3f compiled=${c.min}%.3f (sink=$sink)")
  }

  def main(args: Array[String]): Unit = {
    bpeKernelAB()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-piece-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.registerExpressions(spark)
    import graft.operators.Similarity

    // ---- embedding near-dups pieces ----
    val threshold = 0.9
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val planted = base.where(col("vec_id") % 5 === 0)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") + lit(0.01) * sin(col("vec_id") + i + lit(1))).cast("float"))
          .as("embedding"))
    val aug = base.unionByName(planted)
    // warm
    aug.count()
    time("emb: aug count")(aug.count())
    val found = Similarity.srpNearDups(aug, "vec_id", "embedding",
      b = 64, chunks = 8, threshold = threshold).select(col("id_a"), col("id_b"))
    found.count()
    time("emb: srpNearDups count")(found.count())
    val e = aug.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val exact = e.as("a").join(broadcast(e.as("b")), col("a.id") < col("b.id"))
      .where(Similarity.cosineCols(col("a.emb"), col("b.emb")) >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    exact.count()
    time("emb: exact brute-force count")(exact.count())
    time("emb: full query")(graft.PipelineQueries.embeddingNearDups(spark, dir).count())

    // ---- source overlap pieces ----
    val t = graft.sources.Tokens.table(spark, dir)
    val grams = graft.operators.Decontamination.gramRows(t, 4)
      .select(col("source"), col("gram")).distinct()
    grams.count()
    time("ovl: grams distinct count")(grams.count())
    val kmvU = udaf(new graft.operators.SketchAggs.KmvStringAgg(
      graft.core.Keys.DefaultK0, graft.core.Keys.DefaultK1, 256),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val sk = grams.groupBy(col("source")).agg(kmvU(col("gram")).as("sk"))
    sk.count()
    time("ovl: kmv build count")(sk.count())
    time("ovl: full query")(graft.PipelineQueries.sourceOverlapMatrix(spark, dir).count())

    time("dedup_clusters: full query")(graft.PipelineQueries.dedupClusters(spark, dir).count())
    time("sketchjob: full query")(graft.SketchQueries.sketchJobResumeProbeExact(spark, dir).count())

    // ---- text->sequences pieces (noop-sink isolation, guide §1.4) ----
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docsT = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
    noop(docsT)
    time("t2s: doc scan only")(noop(docsT))
    val bpe = graft.operators.Bpe.withBpeTokens(docsT)
    noop(bpe)
    time("t2s: bpe kernel")(noop(bpe))
    time("t2s: bpe kernel again")(noop(bpe))
    time("t2s: full query")(graft.PipelineQueries.textToSequences(spark, dir).count())
    spark.stop()
  }
}
