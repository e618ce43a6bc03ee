package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.jobs.SketchJob

/** Checkpoint/resume semantics (north rule): a job killed mid-way and
  * resumed must produce final sketches byte-identical to an uninterrupted
  * run, with per-bucket lineage rows recording what was committed when. */
class SketchJobSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-job-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val cfg = SketchJob.DefaultConfig.copy(numBuckets = 16)

  def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ckpt_").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("interrupted build + resume == uninterrupted build (byte-identical sketches)") {
    val tokens = graft.sources.Tokens.table(spark, "/root/testdata/sf0.001")

    // uninterrupted reference run
    val ckptA = freshDir()
    assert(SketchJob.runIncrement(spark, tokens, ckptA, cfg) === 16)
    val a = SketchJob.finalizeSketches(spark, ckptA, cfg)
      .orderBy("source").collect()

    // crash after 5 buckets, then resume twice
    val ckptB = freshDir()
    assert(SketchJob.runIncrement(spark, tokens, ckptB, cfg, failAfterBuckets = Some(5)) === 5)
    assert(SketchJob.committedBuckets(spark, ckptB).size === 5)
    assert(SketchJob.runIncrement(spark, tokens, ckptB, cfg, failAfterBuckets = Some(7)) === 7)
    assert(SketchJob.runIncrement(spark, tokens, ckptB, cfg) === 4)
    assert(SketchJob.runIncrement(spark, tokens, ckptB, cfg) === 0, "idempotent when complete")
    val b = SketchJob.finalizeSketches(spark, ckptB, cfg)
      .orderBy("source").collect()

    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getString(0) === rb.getString(0))
      for (i <- 1 to 3) // bloom, hll, cms
        assert(java.util.Arrays.equals(ra.getAs[Array[Byte]](i), rb.getAs[Array[Byte]](i)),
          s"sketch column $i differs for source ${ra.getString(0)}")
      assert(ra.getLong(4) === rb.getLong(4), "n_rows differs")
      assert(ra.getLong(5) === rb.getLong(5), "n_tokens differs")
    }
  }

  test("a crashed (no _SUCCESS) run dir is ignored; its buckets re-run on resume") {
    val tokens = graft.sources.Tokens.table(spark, "/root/testdata/sf0.001")
    val ckpt = freshDir()
    assert(SketchJob.runIncrement(spark, tokens, ckpt, cfg, failAfterBuckets = Some(6)) === 6)
    // simulate a crashed second run: parquet files present, no _SUCCESS
    val junk = new java.io.File(s"$ckpt/run_9999999999999_99")
    junk.mkdirs()
    java.nio.file.Files.writeString(junk.toPath.resolve("part-00000.parquet"), "garbage")
    assert(SketchJob.committedBuckets(spark, ckpt).size === 6,
      "uncommitted run dir must not contribute buckets")
    // resume completes the remaining buckets and finalize matches a clean run
    assert(SketchJob.runIncrement(spark, tokens, ckpt, cfg) === 10)
    val resumed = SketchJob.finalizeSketches(spark, ckpt, cfg).orderBy("source").collect()
    val cleanCkpt = freshDir()
    SketchJob.runIncrement(spark, tokens, cleanCkpt, cfg)
    val clean = SketchJob.finalizeSketches(spark, cleanCkpt, cfg).orderBy("source").collect()
    resumed.zip(clean).foreach { case (r, c) =>
      for (i <- 1 to 3)
        assert(java.util.Arrays.equals(r.getAs[Array[Byte]](i), c.getAs[Array[Byte]](i)))
    }
  }

  test("finalized sketches have no false negatives and coherent lineage") {
    val tokens = graft.sources.Tokens.table(spark, "/root/testdata/sf0.001")
    val ckpt = freshDir()
    SketchJob.runIncrement(spark, tokens, ckpt, cfg)
    val fin = SketchJob.finalizeSketches(spark, ckpt, cfg).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    // every (source, token) must probe present in its source's final bloom
    val bySource = tokens.collect()
      .groupBy(_.getString(3))
      .map { case (s, rows) => s -> rows.flatMap(_.getSeq[Int](1)) }
    bySource.foreach { case (source, toks) =>
      val (bCfg, words, _) = BlockedBloom.fromBytes(cfg.k0, cfg.k1, fin(source))
      toks.foreach(t => assert(BlockedBloom.containsInt(words, bCfg, t),
        s"false negative in resumed sketch for source=$source token=$t"))
    }
    val lin = SketchJob.lineage(spark, ckpt).collect()
    assert(lin.map(_.getInt(0)).toSet.size === lin.length, "one lineage row per bucket")
    assert(lin.map(_.getLong(1)).sum === tokens.count(), "lineage row counts must sum to input rows")
  }
}
